"""Driver-contract checks (__graft_entry__) on the CPU mesh."""

import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_entry_compiles_and_runs():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 527)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_dryrun_multichip_two_devices():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(2)
