"""pde_policylearning_tpu — TPU-native framework for neural-operator observers
and policies for PDE control.

A ground-up JAX/XLA/Pallas/pjit re-design with the capabilities of the
reference `neuraloperator/pde-policylearning` codebase (see SURVEY.md):

- ``ops``       spectral convolution cores, factorized complex weights,
                domain padding, Fourier resampling, losses, normalizers
- ``models``    operator zoo: FNO/TFNO/UNO/SFNO/RNO, observers, Galerkin
                transformer, PINO models, DINo INR forecaster
- ``envs``      pure-JAX turbulent channel-flow DNS control environments
- ``data``      channel-flow / Kolmogorov-flow / Darcy / Burgers pipelines
- ``training``  jitted trainers, optimizers, checkpointing
- ``parallel``  device-mesh sharding, multigrid patching over the mesh
- ``control``   closed-loop control drivers and policies
"""

__version__ = "0.1.0"

# Restore the documented JAX_PLATFORMS env-var contract for everything that
# imports this package: some images force the remote-TPU platform through a
# sitecustomize config write that silently overrides the env var, which
# makes `JAX_PLATFORMS=cpu python <driver>` initialize (and potentially
# hang on) the remote backend.  No-op unless the env var disagrees with
# the configured priority platform.
from .utils.misc import apply_env_platform as _apply_env_platform  # noqa: E402

_apply_env_platform()
del _apply_env_platform
