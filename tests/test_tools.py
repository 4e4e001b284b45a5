"""Analysis-tool checks against the reference's published complexity table."""

import numpy as np
import pytest

from efficientat_tpu.models.dymn import DyMNConfig
from efficientat_tpu.models.mn import MNConfig
from efficientat_tpu.ops.melspec import MelConfig
from efficientat_tpu.tools.macs import count_macs
from efficientat_tpu.tools.peak_memory import peak_memory_cnn, peak_memory_mnv3
from efficientat_tpu.tools.receptive_field import receptive_field


# README.md:96-112 — MACs in billions for a 10 s clip (128 x 1000 input)
@pytest.mark.parametrize("width,macs_b", [
    (0.4, 0.11), (0.5, 0.16), (1.0, 0.54), (2.0, 2.06), (3.0, 4.55), (4.0, 8.03),
])
def test_mn_macs_match_reference_table(width, macs_b):
    got = count_macs(MNConfig(width_mult=width)) / 1e9
    assert abs(got - macs_b) <= 0.013, (got, macs_b)


@pytest.mark.parametrize("n_mels,macs_b", [(40, 0.21), (64, 0.27), (256, 1.08)])
def test_mn_macs_mel_variants(n_mels, macs_b):
    got = count_macs(MNConfig(), input_f=n_mels) / 1e9
    assert abs(got - macs_b) <= 0.012, (got, macs_b)


@pytest.mark.parametrize("hop,macs_b", [(480, 0.36), (640, 0.27), (800, 0.22)])
def test_mn_macs_hop_variants(hop, macs_b):
    frames = MelConfig(hopsize=hop).num_frames(320000)
    got = count_macs(MNConfig(), input_t=frames) / 1e9
    assert abs(got - macs_b) <= 0.012, (got, macs_b)


@pytest.mark.parametrize("width,macs_b,tol", [
    (0.4, 0.12, 0.015), (1.0, 0.58, 0.03), (2.0, 2.20, 0.1),
])
def test_dymn_macs_match_reference_table(width, macs_b, tol):
    got = count_macs(DyMNConfig(width_mult=width)) / 1e9
    assert abs(got - macs_b) <= tol, (got, macs_b)


def test_receptive_field_reasonable():
    rf_f, rf_t = receptive_field(MNConfig())
    # MobileNetV3-Large RF is several hundred input cells on each axis
    assert 200 < rf_f < 1500 and 200 < rf_t < 1500
    assert receptive_field(MNConfig()) == receptive_field(MNConfig())
    # fewer downsampling strides shrink the receptive field
    rf_f2, _ = receptive_field(MNConfig(strides=(2, 2, 1, 1)))
    assert rf_f2 < rf_f
    # DyMN plan also works (context convs are 1x1 and don't change RF)
    rff, rft = receptive_field(DyMNConfig())
    assert (rff, rft) == (rf_f, rf_t)


def test_peak_memory_estimates():
    cfg = MNConfig()
    full = peak_memory_cnn(cfg)
    efficient = peak_memory_mnv3(cfg)
    assert efficient < full  # sliced inference must reduce the peak
    assert 100 < efficient < 10000  # plausible kB range for 10 s fp16
    # larger width -> more memory
    assert peak_memory_cnn(MNConfig(width_mult=2.0)) > full
    # fp32 doubles
    np.testing.assert_allclose(peak_memory_cnn(cfg, bits_per_elem=32), full * 2)


def test_complexity_report_runs(capsys):
    from efficientat_tpu.tools.complexity import report_complexity

    total = report_complexity("mn04_as", measure="macs")
    out = capsys.readouterr().out
    assert "0.11 billion multiply-accumulate" in out
    assert "0.98 million parameters" in out
    report_complexity("mn04_as", measure="memory")
    out = capsys.readouterr().out
    assert "peak memory" in out


def test_transformer_macs_match_torch_hook_oracle():
    """count_macs_transformer's static formula must reproduce what the
    reference's hook-based counter (helpers/flop_count.py:72-162) measures
    on an actual tiny PaSST-shaped torch model: patch-embed Conv2d, per
    block a fused qkv Linear + attention (2*E*N^2) + proj + 2-layer MLP,
    pooled classification head."""
    import torch
    import torch.nn as nn

    from efficientat_tpu.tools.macs import TransformerSpec, count_macs_transformer

    spec = TransformerSpec(input_f=32, input_t=50, embed_dim=16, depth=2,
                           num_heads=2, patch_size=8, stride_f=4, stride_t=4,
                           mlp_ratio=4.0, num_classes=5, extra_tokens=2)

    class MultiHeadAttention(nn.Module):  # class NAME is what the hook keys on
        def __init__(self, e):
            super().__init__()
            self.qkv = nn.Linear(e, 3 * e)
            self.proj = nn.Linear(e, e)

        def forward(self, x):
            b, n, e = x.shape
            q, k, v = self.qkv(x).chunk(3, dim=-1)
            att = torch.softmax(q @ k.transpose(1, 2) / e ** 0.5, -1)
            return self.proj(att @ v)

    class Block(nn.Module):
        def __init__(self, e, h):
            super().__init__()
            self.attn = MultiHeadAttention(e)
            self.fc1, self.fc2 = nn.Linear(e, h), nn.Linear(h, e)

        def forward(self, x):
            x = x + self.attn(x)
            return x + self.fc2(torch.relu(self.fc1(x)))

    class TinyPasst(nn.Module):
        def __init__(self, s):
            super().__init__()
            e = s.embed_dim
            self.patch = nn.Conv2d(1, e, s.patch_size, (s.stride_f, s.stride_t))
            self.tokens = nn.Parameter(torch.zeros(1, s.extra_tokens, e))
            self.blocks = nn.ModuleList(
                [Block(e, int(e * s.mlp_ratio)) for _ in range(s.depth)])
            self.head = nn.Linear(e, s.num_classes)

        def forward(self, x):
            x = self.patch(x).flatten(2).transpose(1, 2)
            x = torch.cat([self.tokens.expand(x.shape[0], -1, -1), x], 1)
            for b in self.blocks:
                x = b(x)
            return self.head(x.mean(1))

    model = TinyPasst(spec)
    conv_macs, linear_macs, att_macs = [], [], []

    def conv_hook(m, inp, out):
        _, _, ho, wo = out.shape
        kops = m.kernel_size[0] * m.kernel_size[1] * (m.in_channels // m.groups)
        bops = 1 if m.bias is not None else 0
        conv_macs.append(m.out_channels * (kops + bops) * ho * wo)

    def linear_hook(m, inp, out):
        wops = m.weight.nelement()
        bops = m.bias.nelement() if m.bias is not None else 0
        seq = inp[0].shape[1] if inp[0].dim() == 3 else 1
        linear_macs.append((wops + bops) * seq)

    def att_hook(m, inp, out):
        _, n, e = inp[0].shape
        att_macs.append(2 * e * n * n)

    for m in model.modules():
        if isinstance(m, nn.Conv2d):
            m.register_forward_hook(conv_hook)
        elif isinstance(m, nn.Linear):
            m.register_forward_hook(linear_hook)
        elif type(m).__name__ == "MultiHeadAttention":
            m.register_forward_hook(att_hook)
    with torch.no_grad():
        model(torch.zeros(1, 1, spec.input_f, spec.input_t))

    want = sum(conv_macs) + sum(linear_macs) + sum(att_macs)
    assert count_macs_transformer(spec) == want


def test_transformer_macs_passt_scale():
    """PaSST-S defaults: seq len and total in the published ballpark."""
    from efficientat_tpu.tools.macs import TransformerSpec, count_macs_transformer

    s = TransformerSpec()
    assert s.seq_len == 12 * 99 + 2
    total = count_macs_transformer(s)
    assert 100e9 < total < 160e9  # PaSST-S stride 10 is ~1.2e2 GMACs


def test_receptive_field_generic_layers():
    from efficientat_tpu.tools.receptive_field import (
        parse_layer_spec, receptive_field_from_layers)

    # single conv: rf == effective kernel
    assert receptive_field_from_layers([(3, 1, 1)]) == (3, 3)
    assert receptive_field_from_layers([(3, 1, 2)]) == (5, 5)
    # classic: two stride-2 k3 convs -> rf 7
    assert receptive_field_from_layers([(3, 2, 1), (3, 2, 1)]) == (7, 7)
    # anisotropic via the parser
    layers = parse_layer_spec("3x1:2x1,3:1:2")
    assert layers == [((3, 1), (2, 1), 1), (3, 1, 2)]
    rf_f, rf_t = receptive_field_from_layers(layers)
    assert (rf_f, rf_t) == (2 * 5 + (3 - 2), 5)  # f: k3s2 over k3d2; t: k1 over k3d2
    with pytest.raises(ValueError):
        parse_layer_spec("3")


def test_receptive_field_cli_manual_config(capsys):
    """The reference receptive_field_cnn.py stride-study mode: manual
    width/strides changes the reported RF."""
    from efficientat_tpu.tools.receptive_field import report_receptive_field

    rf_a = report_receptive_field("mn10_as", model_width=1.0,
                                  strides=[2, 2, 2, 2])
    rf_b = report_receptive_field("mn10_as", model_width=1.0,
                                  strides=[1, 1, 1, 1])
    out = capsys.readouterr().out
    assert "strides [2, 2, 2, 2]" in out and "strides [1, 1, 1, 1]" in out
    assert rf_b[0] < rf_a[0] and rf_b[1] < rf_a[1]
