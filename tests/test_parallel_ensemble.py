"""Member-parallel ensemble over a virtual CPU mesh == sequential mean."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientat_tpu.models import MN, MNConfig
from efficientat_tpu.parallel import make_mesh, shard_batch
from efficientat_tpu.parallel.ensemble import (
    make_member_parallel_ensemble,
    shard_member_params,
    stack_member_params,
)


@pytest.mark.parametrize("n_dev,model_axis,n_members", [(4, 4, 4), (4, 2, 4)])
@pytest.mark.slow
def test_member_parallel_matches_sequential(n_dev, model_axis, n_members):
    cfg = MNConfig(width_mult=0.4, num_classes=17)
    model = MN(cfg)
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(4, 128, 100, 1)).astype(np.float32))
    members = [model.init(jax.random.PRNGKey(i), x[:1]) for i in range(n_members)]

    want = np.mean([np.asarray(model.apply(v, x)[0]) for v in members], axis=0)

    mesh = make_mesh(n_dev, model_axis=model_axis)
    stacked = shard_member_params(stack_member_params(members), mesh)
    xs = shard_batch({"x": x}, mesh)["x"]
    fn = jax.jit(make_member_parallel_ensemble(
        lambda v, xx: model.apply(v, xx)[0], mesh, n_members))
    got = np.asarray(fn(stacked, xs))

    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_member_count_must_divide():
    mesh = make_mesh(4, model_axis=4)
    with pytest.raises(ValueError):
        make_member_parallel_ensemble(lambda v, x: x, mesh, 3)
