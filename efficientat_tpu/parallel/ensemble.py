"""Member-parallel ensemble serving over a 2D (data, model) mesh.

The reference's best published quality is a 9-member mn40 ensemble
(mAP 49.8, 615.87M params, README.md:113-116) whose members all share one
architecture. On TPU that maps onto a second mesh axis: stack the member
parameter pytrees along a leading axis, shard that axis over ``model``,
and let each device run its members on the (data-sharded) batch; the
member mean is one ``psum`` over ICI. Heterogeneous ensembles (different
architectures per member, models/ensemble.py) stay on the replicated
path — they cannot share one stacked pytree.

Scaling story: a 9x mn40 ensemble is ~2.5 GB of fp32 parameters and 9x
the FLOPs of one model; member-parallel serving is the natural way to
keep per-chip parameter memory flat and scale throughput linearly with
chips, with a single all-reduce of (B, classes) logits as the only
communication.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def stack_member_params(variables_list):
    """Stack per-member variable pytrees along a new leading member axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *variables_list)


def make_member_parallel_ensemble(apply_fn, mesh, n_members: int):
    """Build fn(stacked_variables, x) -> mean member logits, member-sharded.

    ``apply_fn(member_variables, x) -> logits`` runs ONE member (e.g.
    ``lambda v, x: model.apply(v, x)[0]``). ``mesh`` must carry
    ``("data", "model")`` axes (parallel.make_mesh(n, model_axis=m));
    ``n_members`` must be a multiple of the model-axis size. Inputs:
    stacked variables sharded ``P('model')`` on the member axis, ``x``
    sharded ``P('data')`` on the batch axis (each member device sees the
    full per-data-shard batch). Output: mean logits, sharded ``P('data')``.
    """
    msize = mesh.shape["model"]
    if n_members % msize:
        raise ValueError(
            f"n_members={n_members} must divide over model axis size {msize}")
    per_dev = n_members // msize

    def local(svars, x):
        def member(i):
            v = jax.tree.map(
                lambda p: jax.lax.dynamic_index_in_dim(p, i, 0, keepdims=False),
                svars)
            return apply_fn(v, x)

        acc = member(0)
        if per_dev > 1:
            acc = jax.lax.fori_loop(1, per_dev,
                                    lambda i, a: a + member(i), acc)
        return jax.lax.psum(acc, "model") / n_members

    return jax.shard_map(local, mesh=mesh,
                         in_specs=(P("model"), P("data")),
                         out_specs=P("data"))


def shard_member_params(stacked, mesh):
    """Place stacked member params on the mesh, member axis over 'model'."""
    from jax.sharding import NamedSharding

    s = NamedSharding(mesh, P("model"))
    return jax.tree.map(lambda x: jax.device_put(x, s), stacked)
