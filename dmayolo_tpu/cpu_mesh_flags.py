"""XLA_FLAGS setup for virtual multi-device CPU meshes (stdlib-only).

Single source of truth for tests/conftest.py and __graft_entry__.py —
both must set these BEFORE jax is first imported, so this module imports
nothing heavy (dmayolo_tpu/__init__.py is docstring-only).

XLA CPU's in-process collectives default to a 20s warn / 40s TERMINATE
rendezvous watchdog (rendezvous.cc).  With N device threads timesharing
few host cores and deployed-width programs doing minutes of conv work
between halo-exchange ppermutes, arrival skew at a rendezvous legitimately
exceeds 40s — the watchdog then kills the process mid-collective.  Raise
the timeouts; slow is fine, dead is not.
"""
import os

RENDEZVOUS_TIMEOUTS = (
    ("xla_cpu_collective_call_warn_stuck_timeout_seconds", 600),
    ("xla_cpu_collective_call_terminate_timeout_seconds", 7200),
    ("xla_cpu_collective_timeout_seconds", 7200),
)


def apply_cpu_mesh_flags(n_devices=None):
    """Idempotently extend XLA_FLAGS; existing user-set values win."""
    flags = os.environ.get("XLA_FLAGS", "")
    if n_devices and "xla_force_host_platform_device_count" not in flags:
        flags = (flags + f" --xla_force_host_platform_device_count={n_devices}").strip()
    for flag, val in RENDEZVOUS_TIMEOUTS:
        if flag not in flags:
            flags += f" --{flag}={val}"
    os.environ["XLA_FLAGS"] = flags.strip()
