"""Independent torch-functional oracle for checkpoint-parity tests.

Implements the reference architectures' *math* directly with
``torch.nn.functional`` ops over a reference-style state_dict (NCHW), so the
flax/NHWC implementation + converter can be validated end-to-end without
torchvision or downloadable checkpoints. Written from the documented
behavior (SURVEY.md §2 #2-8); functional style, not a module tree.

Also provides synthesizers that create random state_dicts with the exact
key naming/shapes of the reference checkpoints.
"""

import numpy as np
import torch
import torch.nn.functional as F


# ---------------------------------------------------------------- synthesis

def _t(rng, *shape):
    return torch.tensor(rng.normal(scale=0.5, size=shape).astype(np.float32))


def _bn_entries(sd, rng, prefix, c):
    sd[f"{prefix}.weight"] = _t(rng, c) * 0.2 + 1.0
    sd[f"{prefix}.bias"] = _t(rng, c) * 0.1
    sd[f"{prefix}.running_mean"] = _t(rng, c) * 0.1
    sd[f"{prefix}.running_var"] = torch.abs(_t(rng, c)) + 0.5
    sd[f"{prefix}.num_batches_tracked"] = torch.tensor(7)


def _cna_entries(sd, rng, prefix, c_in, c_out, k, groups=1):
    sd[f"{prefix}.0.weight"] = _t(rng, c_out, c_in // groups, k, k) * 0.3
    _bn_entries(sd, rng, f"{prefix}.1", c_out)


def make_mn_state_dict(cfg, seed=0):
    """Random reference-style MN state_dict for an MNConfig."""
    rng = np.random.default_rng(seed)
    table, last_channel = cfg.block_table()
    sd = {}
    _cna_entries(sd, rng, "features.0", cfg.in_channels, table[0].input_channels,
                 cfg.in_conv_kernel)
    from efficientat_tpu.utils.common import make_divisible

    for i, cnf in enumerate(table):
        p = f"features.{i+1}.block"
        j = 0
        if cnf.expanded_channels != cnf.input_channels:
            _cna_entries(sd, rng, f"{p}.{j}", cnf.input_channels,
                         cnf.expanded_channels, 1)
            j += 1
        _cna_entries(sd, rng, f"{p}.{j}", cnf.expanded_channels,
                     cnf.expanded_channels, cnf.kernel, groups=cnf.expanded_channels)
        j += 1
        if cnf.use_se and cfg.se_dims != "none":
            dims = {"c": cnf.expanded_channels}
            # f/t SE sizes would come from feature_map_sizes; only 'c' used here
            for si, letter in enumerate(cfg.se_dims):
                d = dims[letter]
                sq = make_divisible(d // cfg.se_r, 8)
                sd[f"{p}.{j}.conc_se_layers.{si}.fc1.weight"] = _t(rng, sq, d) * 0.2
                sd[f"{p}.{j}.conc_se_layers.{si}.fc1.bias"] = _t(rng, sq) * 0.1
                sd[f"{p}.{j}.conc_se_layers.{si}.fc2.weight"] = _t(rng, d, sq) * 0.2
                sd[f"{p}.{j}.conc_se_layers.{si}.fc2.bias"] = _t(rng, d) * 0.1
            j += 1
        _cna_entries(sd, rng, f"{p}.{j}", cnf.expanded_channels, cnf.out_channels, 1)
    c_tail = 6 * table[-1].out_channels
    _cna_entries(sd, rng, "features.16", table[-1].out_channels, c_tail, 1)
    if cfg.head_type == "mlp":
        sd["classifier.2.weight"] = _t(rng, last_channel, c_tail) * 0.1
        sd["classifier.2.bias"] = _t(rng, last_channel) * 0.1
        sd["classifier.5.weight"] = _t(rng, cfg.num_classes, last_channel) * 0.1
        sd["classifier.5.bias"] = _t(rng, cfg.num_classes) * 0.1
    elif cfg.head_type == "fully_convolutional":
        sd["classifier.0.weight"] = _t(rng, cfg.num_classes, c_tail, 1, 1) * 0.1
        _bn_entries(sd, rng, "classifier.1", cfg.num_classes)
    elif cfg.head_type == "multihead_attention_pooling":
        heads = cfg.multihead_attention_heads
        sd["classifier.subspace_proj.weight"] = _t(
            rng, cfg.num_classes * 2 * heads, c_tail) * 0.1
        sd["classifier.subspace_proj.bias"] = _t(rng, cfg.num_classes * 2 * heads) * 0.1
        sd["classifier.head_weight"] = (
            torch.full((1, heads, 1), 1.0 / heads) + _t(rng, 1, heads, 1) * 0.05)
    return sd


def make_dymn_state_dict(cfg, seed=0):
    """Random reference-style DyMN state_dict for a DyMNConfig."""
    rng = np.random.default_rng(seed)
    table, last_channel = cfg.block_table()
    sd = {}
    _cna_entries(sd, rng, "in_c", cfg.in_channels, table[0].input_channels,
                 cfg.in_conv_kernel)
    k = cfg.dyconv_k
    for i, cnf in enumerate(table):
        p = f"layers.{i}"
        if not cfg.dy_mask()[i]:
            j = 0
            if cnf.expanded_channels != cnf.input_channels:
                _cna_entries(sd, rng, f"{p}.block.{j}", cnf.input_channels,
                             cnf.expanded_channels, 1)
                j += 1
            _cna_entries(sd, rng, f"{p}.block.{j}", cnf.expanded_channels,
                         cnf.expanded_channels, cnf.kernel,
                         groups=cnf.expanded_channels)
            j += 1
            _cna_entries(sd, rng, f"{p}.block.{j}", cnf.expanded_channels,
                         cnf.out_channels, 1)
            continue
        from efficientat_tpu.models.dymn import DYBlock

        h = DYBlock(cnf, cfg.width_mult, cfg.context_ratio, cfg.max_context_size,
                    cfg.min_context_size).context_dim
        sd[f"{p}.context_gen.joint_conv.weight"] = _t(rng, h, cnf.input_channels, 1, 1) * 0.3
        _bn_entries(sd, rng, f"{p}.context_gen.joint_norm", h)
        sd[f"{p}.context_gen.conv_f.weight"] = _t(rng, cnf.expanded_channels, h, 1, 1) * 0.2
        sd[f"{p}.context_gen.conv_f.bias"] = _t(rng, cnf.expanded_channels) * 0.1
        sd[f"{p}.context_gen.conv_t.weight"] = _t(rng, cnf.expanded_channels, h, 1, 1) * 0.2
        sd[f"{p}.context_gen.conv_t.bias"] = _t(rng, cnf.expanded_channels) * 0.1

        def dyconv(prefix, c_in, c_out, ks, groups):
            sd[f"{prefix}.residuals.0.weight"] = _t(rng, k, h) * 0.5
            sd[f"{prefix}.residuals.0.bias"] = _t(rng, k) * 0.5
            sd[f"{prefix}.weight"] = _t(rng, 1, 1, k, c_out * (c_in // groups) * ks * ks) * 0.3

        if cnf.expanded_channels != cnf.input_channels:
            dyconv(f"{p}.exp_conv", cnf.input_channels, cnf.expanded_channels, 1, 1)
            _bn_entries(sd, rng, f"{p}.exp_norm", cnf.expanded_channels)
        dyconv(f"{p}.depth_conv", cnf.expanded_channels, cnf.expanded_channels,
               cnf.kernel, cnf.expanded_channels)
        _bn_entries(sd, rng, f"{p}.depth_norm", cnf.expanded_channels)
        if not cfg.no_dyrelu:
            sd[f"{p}.depth_act.coef_net.0.weight"] = _t(
                rng, 2 * cfg.dyrelu_k * cnf.expanded_channels, h) * 0.2
            sd[f"{p}.depth_act.coef_net.0.bias"] = _t(
                rng, 2 * cfg.dyrelu_k * cnf.expanded_channels) * 0.1
        dyconv(f"{p}.proj_conv", cnf.expanded_channels, cnf.out_channels, 1, 1)
        _bn_entries(sd, rng, f"{p}.proj_norm", cnf.out_channels)
    c_tail = 6 * table[-1].out_channels
    _cna_entries(sd, rng, "out_c", table[-1].out_channels, c_tail, 1)
    sd["classifier.2.weight"] = _t(rng, last_channel, c_tail) * 0.1
    sd["classifier.2.bias"] = _t(rng, last_channel) * 0.1
    sd["classifier.5.weight"] = _t(rng, cfg.num_classes, last_channel) * 0.1
    sd["classifier.5.bias"] = _t(rng, cfg.num_classes) * 0.1
    return sd


# ---------------------------------------------------------------- forward

def _cna_fwd(x, sd, p, stride=1, groups=1, dilation=1, act="hs"):
    w = sd[f"{p}.0.weight"]
    pad = (w.shape[-1] - 1) // 2 * dilation
    x = F.conv2d(x, w, None, stride, pad, dilation, groups)
    x = F.batch_norm(x, sd[f"{p}.1.running_mean"], sd[f"{p}.1.running_var"],
                     sd[f"{p}.1.weight"], sd[f"{p}.1.bias"], False, 0.0, 1e-3)
    if act == "hs":
        x = F.hardswish(x)
    elif act == "relu":
        x = F.relu(x)
    return x


def _se_fwd(x, sd, p, n_layers):
    outs = []
    for si in range(n_layers):
        scale = x.mean(dim=(2, 3))
        scale = F.relu(F.linear(scale, sd[f"{p}.conc_se_layers.{si}.fc1.weight"],
                                sd[f"{p}.conc_se_layers.{si}.fc1.bias"]))
        scale = torch.sigmoid(F.linear(scale, sd[f"{p}.conc_se_layers.{si}.fc2.weight"],
                                       sd[f"{p}.conc_se_layers.{si}.fc2.bias"]))
        outs.append(x * scale[:, :, None, None])
    return torch.stack(outs, 0).max(0)[0]


def torch_mn_forward(sd, x, cfg):
    """Reference-math MN forward. x: NCHW. Returns (logits, embedding)."""
    table, _ = cfg.block_table()
    x = _cna_fwd(x, sd, "features.0", stride=cfg.in_conv_stride)
    for i, cnf in enumerate(table):
        p = f"features.{i+1}.block"
        act = "hs" if cnf.activation == "HS" else "relu"
        inp = x
        j = 0
        if cnf.expanded_channels != cnf.input_channels:
            x = _cna_fwd(x, sd, f"{p}.{j}", act=act)
            j += 1
        stride = 1 if cnf.dilation > 1 else cnf.stride
        x = _cna_fwd(x, sd, f"{p}.{j}", stride=stride, groups=cnf.expanded_channels,
                     dilation=cnf.dilation, act=act)
        j += 1
        if cnf.use_se and cfg.se_dims != "none":
            x = _se_fwd(x, sd, f"{p}.{j}", len(cfg.se_dims))
            j += 1
        x = _cna_fwd(x, sd, f"{p}.{j}", act=None)
        if cnf.use_res:
            x = x + inp
    x = _cna_fwd(x, sd, "features.16")
    emb = x.mean(dim=(2, 3))
    if cfg.head_type == "mlp":
        h = F.hardswish(F.linear(emb, sd["classifier.2.weight"], sd["classifier.2.bias"]))
        logits = F.linear(h, sd["classifier.5.weight"], sd["classifier.5.bias"])
    elif cfg.head_type == "fully_convolutional":
        z = F.conv2d(x, sd["classifier.0.weight"])
        z = F.batch_norm(z, sd["classifier.1.running_mean"], sd["classifier.1.running_var"],
                         sd["classifier.1.weight"], sd["classifier.1.bias"], False, 0.0, 1e-5)
        logits = z.mean(dim=(2, 3))
    elif cfg.head_type == "multihead_attention_pooling":
        # PSLA-style pooling (models/mn/attention_pooling.py:9-56): mean-pool
        # freq, sigmoid attention clamped + normalized over time, per-head
        # weighted sum.
        heads = cfg.multihead_attention_heads
        z = x.mean(dim=2).transpose(1, 2)  # (B, T, C)
        b, n, _ = z.shape
        out_dim = sd["classifier.subspace_proj.weight"].shape[0] // (2 * heads)
        p = F.linear(z, sd["classifier.subspace_proj.weight"],
                     sd["classifier.subspace_proj.bias"])
        p = p.reshape(b, n, 2, heads, out_dim).permute(2, 0, 3, 1, 4)
        att, val = p[0], p[1]
        att = torch.clamp(torch.sigmoid(att), 1e-7, 1.0 - 1e-7)
        att = att / att.sum(dim=2, keepdim=True)
        out = (att * val).sum(dim=2) * sd["classifier.head_weight"]
        logits = out.sum(dim=1)
    return logits, emb


def _dyconv_fwd(x, sd, p, h_c, temperature, ks, stride, groups, c_out):
    b = x.shape[0]
    k = sd[f"{p}.residuals.0.weight"].shape[0]
    logits = F.linear(h_c, sd[f"{p}.residuals.0.weight"], sd[f"{p}.residuals.0.bias"])
    att = F.softmax(logits / temperature, dim=-1)  # (B, K)
    flat = sd[f"{p}.weight"][0, 0]  # (K, D)
    c_in = x.shape[1]
    banks = flat.reshape(k, c_out, c_in // groups, ks, ks)
    pad = (ks - 1) // 2
    outs = []
    for bi in range(b):
        w_b = (att[bi] @ banks.reshape(k, -1)).reshape(c_out, c_in // groups, ks, ks)
        outs.append(F.conv2d(x[bi:bi + 1], w_b, None, stride, pad, 1, groups))
    return torch.cat(outs, 0)


def _context_fwd(x, sd, p, stride):
    b = x.shape[0]
    cf = x.mean(dim=3, keepdim=True)  # (B,C,F,1)
    ct = x.mean(dim=2, keepdim=True).permute(0, 1, 3, 2)  # (B,C,T,1)
    f, t = cf.shape[2], ct.shape[2]
    cat = torch.cat([cf, ct], dim=2)
    cat = F.conv2d(cat, sd[f"{p}.joint_conv.weight"])
    cat = F.batch_norm(cat, sd[f"{p}.joint_norm.running_mean"],
                       sd[f"{p}.joint_norm.running_var"], sd[f"{p}.joint_norm.weight"],
                       sd[f"{p}.joint_norm.bias"], False, 0.0, 1e-3)
    cat = F.hardswish(cat)
    h_cf, h_ct = torch.split(cat, [f, t], dim=2)
    h_ct = h_ct.permute(0, 1, 3, 2)  # (B,H,1,T)
    h_c = cat.mean(dim=2, keepdim=True)  # (B,H,1,1)
    if stride > 1:
        h_cf = F.avg_pool2d(h_cf, (3, 1), (stride, 1), (1, 0))
        h_ct = F.avg_pool2d(h_ct, (1, 3), (1, stride), (0, 1))
    g_cf = F.conv2d(h_cf, sd[f"{p}.conv_f.weight"], sd[f"{p}.conv_f.bias"])
    g_ct = F.conv2d(h_ct, sd[f"{p}.conv_t.weight"], sd[f"{p}.conv_t.bias"])
    return h_c.reshape(b, -1), g_cf, g_ct


def _dyrelu_fwd(x, sd, p, h_c, m=2):
    b, c = x.shape[0], x.shape[1]
    theta = F.linear(h_c, sd[f"{p}.coef_net.0.weight"], sd[f"{p}.coef_net.0.bias"])
    theta = 2 * torch.sigmoid(theta) - 1
    lambdas = torch.tensor([1.0] * m + [0.5] * m)
    init_v = torch.tensor([1.0] + [0.0] * (2 * m - 1))
    coefs = theta.reshape(b, c, 1, 1, 2 * m) * lambdas + init_v
    x_m = x.unsqueeze(-1) * coefs[..., :m] + coefs[..., m:]
    return x_m.max(dim=-1)[0]


def _bn_fwd(x, sd, p, eps=1e-3):
    return F.batch_norm(x, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
                        sd[f"{p}.weight"], sd[f"{p}.bias"], False, 0.0, eps)


def torch_dymn_forward(sd, x, cfg, temperature=1.0):
    """Reference-math DyMN forward. x: NCHW. Returns (logits, embedding)."""
    table, _ = cfg.block_table()
    x = _cna_fwd(x, sd, "in_c", stride=cfg.in_conv_stride)
    for i, cnf in enumerate(table):
        p = f"layers.{i}"
        act = F.hardswish if cnf.activation == "HS" else F.relu
        if not cfg.dy_mask()[i]:
            inp = x
            j = 0
            a = "hs" if cnf.activation == "HS" else "relu"
            if cnf.expanded_channels != cnf.input_channels:
                x = _cna_fwd(x, sd, f"{p}.block.{j}", act=a)
                j += 1
            x = _cna_fwd(x, sd, f"{p}.block.{j}", stride=cnf.stride,
                         groups=cnf.expanded_channels, act=a)
            j += 1
            x = _cna_fwd(x, sd, f"{p}.block.{j}", act=None)
            if cnf.use_res:
                x = x + inp
            continue
        inp = x
        stride = 1 if cnf.dilation > 1 else cnf.stride
        h_c, g_cf, g_ct = _context_fwd(x, sd, f"{p}.context_gen", stride)
        if cnf.expanded_channels != cnf.input_channels:
            x = _dyconv_fwd(x, sd, f"{p}.exp_conv", h_c, temperature, 1, 1, 1,
                            cnf.expanded_channels)
            x = _bn_fwd(x, sd, f"{p}.exp_norm")
            x = act(x)
        x = _dyconv_fwd(x, sd, f"{p}.depth_conv", h_c, temperature, cnf.kernel,
                        stride, cnf.expanded_channels, cnf.expanded_channels)
        x = _bn_fwd(x, sd, f"{p}.depth_norm")
        if cfg.no_dyrelu:
            x = act(x)
        else:
            x = _dyrelu_fwd(x, sd, f"{p}.depth_act", h_c, cfg.dyrelu_k)
        if not cfg.no_ca:
            x = x * torch.sigmoid(g_cf) * torch.sigmoid(g_ct)
        x = _dyconv_fwd(x, sd, f"{p}.proj_conv", h_c, temperature, 1, 1, 1,
                        cnf.out_channels)
        x = _bn_fwd(x, sd, f"{p}.proj_norm")
        if cnf.use_res:
            x = x + inp
    x = _cna_fwd(x, sd, "out_c")
    emb = x.mean(dim=(2, 3))
    h = F.hardswish(F.linear(emb, sd["classifier.2.weight"], sd["classifier.2.bias"]))
    logits = F.linear(h, sd["classifier.5.weight"], sd["classifier.5.bias"])
    return logits, emb
