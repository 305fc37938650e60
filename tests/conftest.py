"""Test configuration: force an 8-device virtual CPU platform.

This is the fake-backend trick the reference lacks (SURVEY.md §4): every
multi-device test runs on `xla_force_host_platform_device_count=8` CPU
devices, so sharding/collective code paths are exercised without TPU pods.
Must run before jax is imported anywhere.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmayolo_tpu.cpu_mesh_flags import apply_cpu_mesh_flags  # noqa: E402

apply_cpu_mesh_flags(n_devices=8)

import jax  # noqa: E402

# NB: the JAX_PLATFORMS env var is ignored when the axon TPU plugin is
# present — config.update is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
