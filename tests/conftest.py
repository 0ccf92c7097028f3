"""Test configuration: force an 8-device virtual CPU platform.

This is the JAX-native way to exercise multi-chip sharding logic (mesh
construction, shard_map collectives, pjit partitioning) without TPU pods:
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` (SURVEY.md §4).

Must run before `import jax` anywhere — pytest imports conftest first.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The image's sitecustomize imports jax at interpreter start (before this
# file runs), so JAX_PLATFORMS from the outer env may already point at the
# TPU plugin.  Backends are created lazily, so flipping the config here —
# before any jax.devices() call — still lands us on the virtual 8-CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# CI-speed knob: XLA optimization passes dominate wall-clock on the 1-core
# CI host (compile-bound suite; ~45% faster with them off).  Numerics are
# unaffected at test tolerances; TPU verification never uses this.
jax.config.update("jax_disable_most_optimizations", True)

# Persistent compilation cache: the suite recompiles the same executables
# every run on this 1-core host; cache hits cut repeat-run wall-clock
# roughly in half.  Safe to delete the directory at any time.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
