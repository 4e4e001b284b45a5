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


@pytest.mark.slow
def test_bf16_drift_probe_is_not_vacuous():
    """r4's drift probe read exactly 0.0 because untrained host_init
    weights gave ~5e-10 logits — both dtypes sigmoided to 0.5 and the
    honesty check on the bf16 serving row could never move. The probe now
    runs on realistic-scale converted weights; pin that its fp32 logits
    stay O(0.1+) so it can never silently go vacuous again (VERDICT r4
    next #3)."""
    import jax.numpy as jnp

    import bench
    from efficientat_tpu.models import MN

    cfg, variables = bench.realistic_mn_variables()
    model = MN(cfg)
    rng = np.random.default_rng(7)
    mel = jnp.asarray(rng.normal(size=(2, 128, 100, 1)).astype(np.float32))
    logits, _ = jax.jit(lambda v, x: model.apply(v, x))(variables, mel)
    assert float(jnp.max(jnp.abs(logits))) >= 0.1
