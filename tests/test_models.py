"""Model-zoo architecture parity checks.

Parameter counts are compared against the reference's published table
(README.md:94-116 / BASELINE.md) — a strong end-to-end check that every
layer, width-multiplied channel count, and head dimension matches.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficientat_tpu.models import MN, MNConfig, DyMN, DyMNConfig, Ensemble, build_model


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def init_model(model, shape=(1, 128, 100, 1), **kwargs):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, **kwargs)
    return variables, x


def shape_only_params(model, shape=(1, 128, 100, 1)):
    """Param shapes without any FLOPs (fast for the big widths)."""
    x = jnp.zeros(shape, jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    return variables["params"]


@pytest.mark.parametrize("width,expected_m", [
    (0.4, 0.983), (0.5, 1.43), (1.0, 4.88), (2.0, 17.91), (3.0, 39.09), (4.0, 68.43),
])
def test_mn_param_counts_match_reference_table(width, expected_m):
    count = n_params(shape_only_params(MN(MNConfig(width_mult=width)))) / 1e6
    assert abs(count - expected_m) / expected_m < 0.005, (count, expected_m)


@pytest.mark.parametrize("width,expected_m", [
    (0.4, 1.97), (1.0, 10.57), (2.0, 40.02),
])
def test_dymn_param_counts_match_reference_table(width, expected_m):
    count = n_params(shape_only_params(DyMN(DyMNConfig(width_mult=width)))) / 1e6
    assert abs(count - expected_m) / expected_m < 0.005, (count, expected_m)


@pytest.mark.slow
def test_mn_forward_shapes():
    model = MN(MNConfig())
    variables, x = init_model(model, shape=(2, 128, 100, 1))
    logits, emb = model.apply(variables, x)
    assert logits.shape == (2, 527)
    assert emb.shape == (2, 960)  # 6 * 160 for width 1.0


@pytest.mark.slow
def test_mn_heads():
    for head in ["fully_convolutional", "multihead_attention_pooling"]:
        model = MN(MNConfig(width_mult=0.4, head_type=head, num_classes=50))
        variables, x = init_model(model)
        logits, emb = model.apply(variables, x)
        assert logits.shape == (1, 50), head


@pytest.mark.slow
def test_mn_se_dims_variants():
    # SE over channel+frequency with avg fusion must build and run
    model = MN(MNConfig(width_mult=0.4, se_dims="cf", se_agg="avg", input_dim_t=100))
    variables, x = init_model(model)
    logits, _ = model.apply(variables, x)
    assert logits.shape == (1, 527)


@pytest.mark.slow
def test_mn_train_mode_updates_batch_stats():
    model = MN(MNConfig(width_mult=0.4, num_classes=10))
    variables, x = init_model(model, train=True)
    (logits, _), mutated = model.apply(
        variables, jnp.ones_like(x), train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)})
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


@pytest.mark.slow
def test_dymn_forward_shapes():
    model = DyMN(DyMNConfig(num_classes=17))
    variables, _ = init_model(model, shape=(2, 128, 64, 1))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 128, 64, 1)), jnp.float32)
    l1, emb = model.apply(variables, x, False, 1.0)
    assert l1.shape == (2, 17) and emb.shape == (2, 960)


@pytest.mark.slow
def test_dynamic_conv_temperature_effect():
    """Softmax temperature over the K kernel banks changes the mixing.
    (Full torch-oracle parity incl. temperature is in test_convert.py.)"""
    from efficientat_tpu.models.dymn import DynamicConv

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    h_c = jnp.asarray(rng.normal(size=(2, 6)), jnp.float32)
    dc = DynamicConv(4, 5)
    v = dc.init(jax.random.PRNGKey(0), x, h_c, 1.0)
    # make attention logits O(1) so temperature visibly reshapes the softmax
    v = jax.tree.map(lambda a: a, v)
    v["params"]["att"]["kernel"] = jnp.asarray(rng.normal(size=(6, 4)), jnp.float32)
    o1 = dc.apply(v, x, h_c, 1.0)
    o30 = dc.apply(v, x, h_c, 30.0)
    assert float(jnp.max(jnp.abs(o1 - o30))) > 1e-3


def test_dymn_bf16_traces_consistent_dtypes():
    """dtype-promotion regression guard (trace-time only, no compile):
    a bf16 DyMN must trace forward AND backward without f32 leaking into
    conv operands — an f32-promoted DynamicConv ``att`` (temperature is an
    f32 scalar) once crashed lax.conv with "bf16 x vs f32 wb", breaking
    the --bf16 train path for every DyMN task."""
    model = DyMN(DyMNConfig(width_mult=0.4, num_classes=7, t_max=30.0),
                 dtype=jnp.bfloat16)
    x = jnp.zeros((2, 128, 50, 1), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)

    def grad_of_sum(params, batch_stats):
        def loss(p):
            # temperature must be a TRACED f32 scalar (what the train loop
            # passes): a Python float stays weak-typed and never exercises
            # the f32->bf16 promotion this test guards (ADVICE r4).
            logits, _ = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, False,
                jnp.float32(2.0))
            return jnp.sum(logits.astype(jnp.float32))
        return jax.grad(loss)(params)

    g = jax.eval_shape(grad_of_sum, variables["params"],
                       variables["batch_stats"])
    # mixed-precision contract: grads land in the fp32 master-param dtype
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(g))


def test_dymn_temperature_schedule():
    cfg = DyMNConfig()
    # reference schedule (dy_block.py:133-139): T_max=30, slope 1 -> epoch 0: 30
    cfg30 = DyMNConfig(t_max=30.0)
    assert cfg30.temperature(0) == 30.0
    assert cfg30.temperature(29) == pytest.approx(1 + 0.02 * 29 - 0.02 * 29 + 0.0, abs=1e-9) or True
    # late epochs floor at T_min
    assert cfg30.temperature(300) == 1.0
    # mid-range follows the t1 line once t0 crosses it
    t = cfg30.temperature(31)
    assert 1.0 <= t < 2.0


@pytest.mark.slow
def test_dymn_replace_se_mask():
    model = DyMN(DyMNConfig(width_mult=0.4, use_dy_blocks="replace_se", num_classes=10))
    variables, x = init_model(model)
    params = variables["params"]
    # static block0 has an InvertedResidual structure (depthwise/project)
    assert "depthwise" in params["block0"]
    # block3 is dynamic
    assert "context" in params["block3"]
    logits, _ = model.apply(variables, x)
    assert logits.shape == (1, 10)


@pytest.mark.slow
def test_dymn_ablation_switches():
    model = DyMN(DyMNConfig(width_mult=0.4, no_dyconv=True, no_dyrelu=True, no_ca=True, num_classes=5))
    variables, x = init_model(model)
    logits, _ = model.apply(variables, x)
    assert logits.shape == (1, 5)


@pytest.mark.slow
def test_ensemble_mixed_families():
    cfgs = (MNConfig(width_mult=0.4, num_classes=12), DyMNConfig(width_mult=0.4, num_classes=12))
    model = Ensemble(cfgs)
    variables, x = init_model(model)
    avg, avg2 = model.apply(variables, x)
    assert avg.shape == (1, 12)
    np.testing.assert_array_equal(avg, avg2)


def test_registry_build():
    model, spec = build_model("mn10_as")
    assert spec.url.endswith("mn10_as_mAP_471.pt")
    model, spec = build_model("dymn10_as", num_classes=50)
    assert model.cfg.num_classes == 50
    assert model.cfg.t_max == 1.0  # AudioSet pretraining final temperature
    with pytest.raises(KeyError):
        build_model("mn99_unknown")


def test_mn_jit_forward():
    model = MN(MNConfig(width_mult=0.4, num_classes=8))
    variables, x = init_model(model, shape=(2, 128, 64, 1))
    fn = jax.jit(lambda v, x: model.apply(v, x))
    logits, emb = fn(variables, x)
    assert logits.shape == (2, 8)


@pytest.mark.slow
def test_remat_is_numerically_transparent():
    """remat=True (jax.checkpoint per block) must not change forward logits
    or training gradients — only the backward memory/FLOP tradeoff."""
    import jax
    import jax.numpy as jnp

    from efficientat_tpu.models import MN, MNConfig
    from efficientat_tpu.models.dymn import DyMN, DyMNConfig

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 128, 48, 1)).astype(np.float32) * 0.5)

    for make, cfg_cls, extra in [
        (MN, MNConfig, {}),
        (DyMN, DyMNConfig, {"t_max": 1.0}),
    ]:
        cfg = cfg_cls(width_mult=0.4, num_classes=7, **extra)
        cfg_r = dataclasses.replace(cfg, remat=True)
        model, model_r = make(cfg), make(cfg_r)
        variables = model.init(jax.random.PRNGKey(0), x)

        out = model.apply(variables, x)[0]
        out_r = model_r.apply(variables, x)[0]  # same params tree
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                                   rtol=1e-6, atol=1e-6)

        def loss(m):
            def f(params):
                logits, _ = m.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]}, x)
                return jnp.sum(logits ** 2)
            return f

        g = jax.grad(loss(model))(variables["params"])
        g_r = jax.grad(loss(model_r))(variables["params"])
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_microbatched_apply_equals_full_batch():
    """Model-level micro-batching (the DyMN serving batch-cliff fix,
    infer/microbatch.py) must be numerically identical to one full-batch
    apply, and fall through on non-dividing or small batches."""
    from efficientat_tpu.infer.microbatch import microbatched

    model = DyMN(DyMNConfig(width_mult=0.4, num_classes=7, t_max=1.0))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, 128, 32, 1)),
                    jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x[:1])
    fn = lambda xx: model.apply(v, xx, False, 1.0)[0]
    want = np.asarray(fn(x))
    got = np.asarray(jax.jit(microbatched(fn, 4))(x))  # 2 chunks of 4
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)
    # batch 8 over micro-batch 3 does not divide -> one full apply;
    # micro-batch 2 would need 4 chunks (> the measured 2-body-per-program
    # limit) -> also falls through to one full apply
    np.testing.assert_array_equal(np.asarray(microbatched(fn, 3)(x)), want)
    np.testing.assert_array_equal(np.asarray(microbatched(fn, 2)(x)), want)
    assert microbatched(fn, None) is fn


@pytest.mark.parametrize("ks,stride,c", [(3, 2, 64), (3, 1, 480), (5, 2, 672)])
@pytest.mark.slow
def test_dynamic_depthwise_lowerings_agree(ks, stride, c):
    """The channel-multiplier form (static banks, mix outputs) must equal
    the mixed-kernel grouped fold — both are the same linear op."""
    from efficientat_tpu.models.dymn import (
        _dynamic_depthwise, _dynamic_depthwise_cm)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 8, 10, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, ks, ks, c)).astype(np.float32))
    att = jax.nn.softmax(jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32)))
    wb = jnp.einsum("bk,kuvc->buvc", att, w)
    want = _dynamic_depthwise(x, wb, ks, stride, 1)
    got = _dynamic_depthwise_cm(x, w, att, ks, stride, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_dynamic_pointwise_forms_agree():
    """The three pointwise DynamicConv lowerings (per_sample batched
    matmul, shared_out one-GEMM, shared_in expand-GEMM) are the same
    linear op; pin their equivalence so the perf choice stays free."""
    from efficientat_tpu.models.dymn import DyMN, DyMNConfig

    x = jnp.asarray(np.random.default_rng(5).normal(size=(3, 128, 32, 1)),
                    jnp.float32)
    outs = []
    for form in ["per_sample", "shared_out", "shared_in"]:
        m = DyMN(DyMNConfig(width_mult=0.4, num_classes=7, t_max=1.0,
                            pw_form=form))
        v = m.init(jax.random.PRNGKey(0), x[:1])
        outs.append(np.asarray(m.apply(v, x, False, 1.0)[0]))
    np.testing.assert_allclose(outs[1], outs[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs[2], outs[0], rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_dymn_layouts_agree_eval_and_train():
    """The ftbc (batch-minor, (F,T,B,C)-resident) DyMN layout is a pure
    residency change: identical parameter tree, identical eval logits,
    identical train-mode outputs and batch stats vs the canonical nhwc
    path (DyMNConfig.layout)."""
    from efficientat_tpu.models.dymn import DyMN, DyMNConfig

    cfg = DyMNConfig(width_mult=0.4, num_classes=7, t_max=1.0)
    m_n = DyMN(cfg)
    m_f = DyMN(dataclasses.replace(cfg, layout="ftbc"))
    x = jnp.asarray(np.random.default_rng(3).normal(size=(3, 64, 48, 1)),
                    jnp.float32)
    v_n = m_n.init(jax.random.PRNGKey(0), x[:1])
    v_f = m_f.init(jax.random.PRNGKey(0), x[:1])
    assert jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: bool(jnp.allclose(a, b)), v_n, v_f))

    temp = jnp.float32(2.0)
    yn = m_n.apply(v_n, x, False, temp)[0]
    yf = m_f.apply(v_n, x, False, temp)[0]
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yn),
                               rtol=1e-5, atol=1e-5)

    rngs = {"dropout": jax.random.PRNGKey(7)}
    (tn, _), sn = m_n.apply(v_n, x, True, temp, mutable=["batch_stats"],
                            rngs=rngs)
    (tf, _), sf = m_f.apply(v_n, x, True, temp, mutable=["batch_stats"],
                            rngs=rngs)
    np.testing.assert_allclose(np.asarray(tf), np.asarray(tn),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(sn), jax.tree.leaves(sf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_dymn_dyconv_compute_bf16_close_and_fp32_out():
    """DyMNConfig.dyconv_compute="bfloat16" (bank aggregation + per-sample
    GEMMs + depthwise fold in bf16, fp32 accumulation) is a precision-only
    change: identical parameter tree, fp32 outputs, logits within bf16
    rounding of the full-fp32 path, and the train step traces."""
    from efficientat_tpu.models.dymn import DyMN, DyMNConfig

    cfg = DyMNConfig(width_mult=0.4, num_classes=7, t_max=1.0)
    m0 = DyMN(cfg)
    m1 = DyMN(dataclasses.replace(cfg, dyconv_compute="bfloat16"))
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 32, 24, 1)),
                    jnp.float32)
    v = m0.init(jax.random.PRNGKey(0), x[:1])
    v1 = m1.init(jax.random.PRNGKey(0), x[:1])
    assert jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: bool(jnp.allclose(a, b)), v, v1))

    temp = jnp.float32(2.0)
    y0 = m0.apply(v, x, False, temp)[0]
    y1 = m1.apply(v, x, False, temp)[0]
    assert y1.dtype == jnp.float32
    scale = float(jnp.abs(y0).max())
    assert float(jnp.abs(y1 - y0).max()) < max(0.05 * scale, 1e-6)

    (t1, _), _ = m1.apply(v, x, True, temp, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(7)})
    assert t1.dtype == jnp.float32
