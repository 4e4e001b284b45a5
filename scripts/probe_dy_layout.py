"""Probe: how much of the dynamic-depthwise fold's cost is the LAYOUT
round trip, not the conv?

The fold (models/dymn.py::_dynamic_depthwise_fold) physically relayouts
the expanded tensor twice per depthwise conv: (B,F,T,C) -> transpose to
(F,T,B,C) -> conv with feature_group_count=B*C -> transpose back. The r4
attribution charged the whole 3.7x dyconv overhead to "K=4 weight banks"
(models/dymn.py:31-53); this probe separates:

  static     shared-kernel depthwise, NHWC (the no_dyconv cost)
  fold       the current lowering: transpose + grouped conv + transpose
  fold_pre   grouped conv only, input already (F,T,B,C), output left there
             (what a (F,T,B,C)-resident DY block would pay)
  pw_bnc     pointwise dynamic conv, (B,N,C) batched einsum (current)
  pw_ftbc    pointwise dynamic conv, (F*T,B,C) layout ('nbi,bio->nbo')

Shapes: the dymn10 depthwise shapes at B=120 (width 1.0 block table).

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_dy_layout.py [B]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.join("/root/repo", "scripts"))

import jax
import jax.numpy as jnp

from efficientat_tpu.models.dymn import _dynamic_depthwise_fold
from efficientat_tpu.models.mn import mn_block_table


def slope_ms(run, args, iters=64):
    """ms per op via scripts/_bench_util.time_device (this probe's original
    two-point slope timer mis-tracked its tripled iteration count and
    reported 0.0 for every row — superseded; the whole-model verdict lives
    in scripts/probe_dymn_layout.py)."""
    from _bench_util import time_device

    def fn(*a):
        *xs, eps = a
        return jnp.sum(run(xs[0] + eps, *xs[1:]))

    return time_device(fn, *args, iters=iters) * 1e3


def loop(fn):
    return fn


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    table, _ = mn_block_table(1.0)
    f, t = 64, 500  # after stem s2
    shapes = []
    for cnf in table:
        stride = 1 if cnf.dilation > 1 else cnf.stride
        shapes.append((cnf.expanded_channels, f, t, cnf.kernel, stride,
                       cnf.dilation))
        f = (f + 2 * ((cnf.kernel - 1) // 2) - cnf.kernel) // stride + 1
        t = (t + 2 * ((cnf.kernel - 1) // 2) - cnf.kernel) // stride + 1
    # dedupe identical probe shapes
    seen, uniq = set(), []
    for s in shapes:
        if s not in seen:
            seen.add(s)
            uniq.append(s)

    rng = np.random.default_rng(0)
    tot = {"static": 0.0, "fold": 0.0, "fold_pre": 0.0}
    for c, f, t, k, s, d in uniq:
        x = jnp.asarray(rng.normal(size=(b, f, t, c)).astype(np.float32))
        xp = jnp.transpose(x, (1, 2, 0, 3))  # (F,T,B,C) resident
        wstat = jnp.asarray(rng.normal(size=(k, k, 1, c)).astype(np.float32))
        wdyn = jnp.asarray(rng.normal(size=(b, k, k, c)).astype(np.float32))
        p = (k - 1) // 2 * d

        def static_dw(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (s, s), [(p, p), (p, p)], rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)

        def fold(x, w):
            return _dynamic_depthwise_fold(x, w, k, s, d)

        def fold_pre(xp, w):
            fo = (xp.shape[0] + 2 * p - d * (k - 1) - 1) // s + 1
            to = (xp.shape[1] + 2 * p - d * (k - 1) - 1) // s + 1
            lhs = xp.reshape(1, xp.shape[0], xp.shape[1], b * c)
            rhs = jnp.transpose(w, (1, 2, 0, 3)).reshape(k, k, 1, b * c)
            out = jax.lax.conv_general_dilated(
                lhs, rhs, (s, s), [(p, p), (p, p)], rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=b * c)
            return out.reshape(fo, to, b, c)

        r = {
            "static": slope_ms(loop(static_dw), (x, wstat)),
            "fold": slope_ms(loop(fold), (x, wdyn)),
            "fold_pre": slope_ms(loop(fold_pre), (xp, wdyn)),
        }
        for key in tot:
            tot[key] += r[key] * shapes.count((c, f, t, k, s, d))
        print(json.dumps({"shape": [c, f, t, k, s, d],
                          **{k2: round(v, 3) for k2, v in r.items()}}),
              flush=True)

    print(json.dumps({"total_ms": {k2: round(v, 2) for k2, v in tot.items()},
                      "batch": b}), flush=True)

    # pointwise layout comparison at two representative shapes
    for (ci, co, f, t) in [(16, 16, 64, 500), (240, 80, 16, 125),
                           (672, 160, 8, 63)]:
        x = jnp.asarray(rng.normal(size=(b, f, t, ci)).astype(np.float32))
        xn = x.reshape(b, f * t, ci)
        xf = jnp.transpose(xn, (1, 0, 2))  # (N,B,C)
        wb = jnp.asarray(rng.normal(size=(b, ci, co)).astype(np.float32))

        pw_bnc = lambda xn, wb: jnp.einsum("bni,bio->bno", xn, wb)
        pw_nbc = lambda xf, wb: jnp.einsum("nbi,bio->nbo", xf, wb)
        print(json.dumps({
            "pw_shape": [ci, co, f, t],
            "pw_bnc": round(slope_ms(loop(pw_bnc), (xn, wb)), 3),
            "pw_nbc": round(slope_ms(loop(pw_nbc), (xf, wb)), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
