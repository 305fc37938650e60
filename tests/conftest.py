"""Test configuration: force an 8-device virtual CPU platform.

This is the fake-backend trick the reference lacks (SURVEY.md §4): every
multi-device test runs on `xla_force_host_platform_device_count=8` CPU
devices, so sharding/collective code paths are exercised without TPU pods.
Must run before jax is imported anywhere.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA CPU in-process collectives ship a 20s-warn/40s-TERMINATE rendezvous
# watchdog; 8 device threads timesharing this host's core(s) can skew past
# 40s inside the heavier mesh tests, which would kill the pytest process.
for _f, _v in (("xla_cpu_collective_call_warn_stuck_timeout_seconds", 600),
               ("xla_cpu_collective_call_terminate_timeout_seconds", 7200),
               ("xla_cpu_collective_timeout_seconds", 7200)):
    if _f not in flags:
        flags += f" --{_f}={_v}"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

# NB: the JAX_PLATFORMS env var is ignored when the axon TPU plugin is
# present — config.update is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
