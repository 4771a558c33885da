"""16/32-device virtual meshes (VERDICT r4 #6): wider-than-suite topologies
run in fresh child interpreters with their own
`--xla_force_host_platform_device_count` (the suite's conftest pins 8; the
device count is fixed at backend init, so wider meshes need a new process).
Each child runs `voxtpu.dist.dryrun_multichip`, which asserts every
exact-mode topology equal to a per-file serial reference.
"""

import os

import pytest

import __graft_entry__ as ge


@pytest.mark.parametrize(
    "n_devices,topologies",
    [
        (16, [(1, 16), (4, 4), (2, 8)]),
        (32, [(4, 8)]),
    ],
    ids=["16dev-1x16-4x4-2x8", "32dev-4x8"],
)
def test_wide_virtual_mesh_in_child(n_devices, topologies):
    if os.environ.get("VOXTPU_SHARDED_SUBTEST"):
        pytest.skip("already in a sharded child")
    ge._dryrun_child(n_devices, topologies=topologies, timeout=1500)
