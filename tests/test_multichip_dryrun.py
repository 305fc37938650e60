"""The driver-visible multi-chip artifact, exercised in-process.

`__graft_entry__.dryrun_multichip(8)` must self-host an 8-device virtual
CPU mesh (the fake-backend trick, SURVEY.md §4) and run ONE full training
step over a (data x spatial) mesh. Round 1's MULTICHIP artifact was red
because the function inherited whatever platform the process had; this
test pins the self-hosting contract.
"""
import jax


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    # conftest already forced cpu+8 — the function must cope with a process
    # where backends are initialised, as long as they are CPU.
    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


def test_dryrun_multichip_odd_device_count():
    # n_spatial falls back to 1 for odd counts; exercise the pure-data mesh.
    import __graft_entry__ as ge

    ge.dryrun_multichip(7)
