"""The driver's entry points must work as shipped.

`dryrun_multichip` must self-force a virtual CPU mesh (round-1 failure:
it initialized whatever backend jax picked — the axon TPU — and died on a
libtpu version mismatch; see MULTICHIP_r01.json).
"""

import sys

sys.path.insert(0, "/root/repo")

import pytest

import __graft_entry__ as graft


def test_entry_jits(rng):
    import jax

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1024, 3)


@pytest.mark.slow
def test_dryrun_multichip_forces_cpu_mesh():
    # Parent process already has jax initialized (on CPU in tests, on the
    # axon TPU under the driver); the subprocess must succeed regardless.
    graft.dryrun_multichip(8)
