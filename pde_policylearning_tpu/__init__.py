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
