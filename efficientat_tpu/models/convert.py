"""Checkpoint conversion: reference torch ``state_dict`` -> flax variables.

The reference distributes ~45 ``.pt`` checkpoints on GitHub releases
(models/mn/model.py:24-70, models/dymn/model.py:18-33). This module maps
their parameter naming/layout onto the NHWC flax modules in this package:

- Conv2d weight  (O, I/g, kh, kw)  -> flax Conv kernel (kh, kw, I/g, O)
- Linear weight  (O, I)            -> flax Dense kernel (I, O)
- BatchNorm weight/bias            -> params .../bn {scale, bias}
  running_mean/var                 -> batch_stats .../bn {mean, var}
- DynamicConv flat bank (1, 1, K, O*I/g*ks*ks) (dy_block.py:90-94)
  -> pointwise: (K, I, O); depthwise: (K, ks, ks, C)

Classifier-head surgery matches the reference loaders: when the checkpoint's
class count differs from the requested one, the final (mlp) or all (fc)
classifier weights are dropped and the head keeps its fresh init
(models/mn/model.py:292-310, models/dymn/model.py:270-278).
"""

from __future__ import annotations

import os
import urllib.request
from typing import Any, Dict, Optional, Tuple, Union

import numpy as np

from efficientat_tpu.models.dymn import DyMNConfig
from efficientat_tpu.models.mn import MNConfig
from efficientat_tpu.models.registry import MODEL_DIR, get_model_config


def _conv_w(w):  # (O, I/g, kh, kw) -> (kh, kw, I/g, O)
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _dense_w(w):  # (O, I) -> (I, O)
    return np.transpose(np.asarray(w), (1, 0))


class _TorchDict:
    """Typed accessor over a torch state_dict (as numpy) that tracks usage."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.used = set()

    def __call__(self, key: str) -> np.ndarray:
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    def unused(self):
        return sorted(set(self.sd) - self.used)


def _cna(t: _TorchDict, prefix: str):
    """ConvNormActivation: <prefix>.0 conv, <prefix>.1 bn."""
    params = {
        "conv": {"kernel": _conv_w(t(f"{prefix}.0.weight"))},
        "bn": {"scale": t(f"{prefix}.1.weight"), "bias": t(f"{prefix}.1.bias")},
    }
    stats = {"bn": {"mean": t(f"{prefix}.1.running_mean"),
                    "var": t(f"{prefix}.1.running_var")}}
    return params, stats


def _bn(t: _TorchDict, prefix: str):
    params = {"scale": t(f"{prefix}.weight"), "bias": t(f"{prefix}.bias")}
    stats = {"mean": t(f"{prefix}.running_mean"), "var": t(f"{prefix}.running_var")}
    return params, stats


def _dense(t: _TorchDict, prefix: str, bias: bool = True):
    d = {"kernel": _dense_w(t(f"{prefix}.weight"))}
    if bias:
        d["bias"] = t(f"{prefix}.bias")
    return d


def _mlp_head(t: _TorchDict, params, surgery: bool):
    """torch classifier: 2=hidden Linear, 5=out Linear (models/mn/model.py:186-194)."""
    head = {"hidden": _dense(t, "classifier.2")}
    if not surgery:
        head["out"] = _dense(t, "classifier.5")
    params["head"] = head


def _fc_head(t: _TorchDict, params, stats, surgery: bool):
    if surgery:
        return
    params["head"] = {
        "conv": {"kernel": _conv_w(t("classifier.0.weight"))},
    }
    bn_p, bn_s = _bn(t, "classifier.1")
    params["head"]["bn"] = bn_p
    stats["head"] = {"bn": bn_s}


def convert_mn(sd: Dict[str, np.ndarray], cfg: MNConfig,
               drop_head: bool = False) -> Dict[str, Any]:
    """Convert a reference MN state_dict to flax variables for MNConfig."""
    t = _TorchDict(sd)
    table, _ = cfg.block_table()
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["stem"], stats["stem"] = _cna(t, "features.0")

    for i, cnf in enumerate(table):
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        j = 0
        if cnf.expanded_channels != cnf.input_channels:
            bp["expand"], bs["expand"] = _cna(t, f"features.{i+1}.block.{j}")
            j += 1
        bp["depthwise"], bs["depthwise"] = _cna(t, f"features.{i+1}.block.{j}")
        j += 1
        if cnf.use_se and cfg.se_dims != "none":
            se: Dict[str, Any] = {}
            for si, letter in enumerate(cfg.se_dims):
                pre = f"features.{i+1}.block.{j}.conc_se_layers.{si}"
                se[f"se_{letter}"] = {
                    "fc1": _dense(t, f"{pre}.fc1"),
                    "fc2": _dense(t, f"{pre}.fc2"),
                }
            bp["se"] = se
            j += 1
        bp["project"], bs["project"] = _cna(t, f"features.{i+1}.block.{j}")
        params[f"block{i}"] = bp
        stats[f"block{i}"] = bs

    params["tail"], stats["tail"] = _cna(t, "features.16")

    if cfg.head_type == "mlp":
        _mlp_head(t, params, drop_head)
    elif cfg.head_type == "fully_convolutional":
        _fc_head(t, params, stats, drop_head)
    elif cfg.head_type == "multihead_attention_pooling":
        if not drop_head and t.has("classifier.subspace_proj.weight"):
            params["head"] = {
                "subspace_proj": _dense(t, "classifier.subspace_proj"),
                "head_weight": t("classifier.head_weight"),
            }
    return {"params": params, "batch_stats": stats}


def _dynamic_conv(t: _TorchDict, prefix: str, pointwise: bool, channels: int,
                  ks: int = 1, k: int = 4):
    """DynamicConv: flat bank + attention Linear (dy_block.py:76-94)."""
    flat = t(f"{prefix}.weight")  # (1, att_groups=1, K, O*I/g*ks*ks)
    att = _dense(t, f"{prefix}.residuals.0")
    if pointwise:
        out_ch = flat.size // (k * channels)
        banks = flat.reshape(k, out_ch, channels)  # (K, O, I)
        w = np.transpose(banks, (0, 2, 1))  # (K, I, O)
    else:
        banks = flat.reshape(k, channels, 1, ks, ks)  # (K, C, 1, ks, ks)
        w = np.transpose(banks[:, :, 0], (0, 2, 3, 1))  # (K, ks, ks, C)
    return {"att": att, "weight": w}


def convert_dymn(sd: Dict[str, np.ndarray], cfg: DyMNConfig,
                 drop_head: bool = False) -> Dict[str, Any]:
    """Convert a reference DyMN state_dict to flax variables for DyMNConfig."""
    t = _TorchDict(sd)
    table, _ = cfg.block_table()
    dy_mask = cfg.dy_mask()
    k = cfg.dyconv_k
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["stem"], stats["stem"] = _cna(t, "in_c")

    for i, cnf in enumerate(table):
        pre = f"layers.{i}"
        if not dy_mask[i]:
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            j = 0
            if cnf.expanded_channels != cnf.input_channels:
                bp["expand"], bs["expand"] = _cna(t, f"{pre}.block.{j}")
                j += 1
            bp["depthwise"], bs["depthwise"] = _cna(t, f"{pre}.block.{j}")
            j += 1
            bp["project"], bs["project"] = _cna(t, f"{pre}.block.{j}")
            params[f"block{i}"] = bp
            stats[f"block{i}"] = bs
            continue

        bp = {}
        bs = {}
        # ContextGen (dy_block.py:214-233)
        joint_bn_p, joint_bn_s = _bn(t, f"{pre}.context_gen.joint_norm")
        jw = t(f"{pre}.context_gen.joint_conv.weight")  # (H, C, 1, 1)
        bp["context"] = {
            "joint": {"kernel": _dense_w(jw[:, :, 0, 0])},
            "joint_bn": joint_bn_p,
            "proj_f": {"kernel": _dense_w(t(f"{pre}.context_gen.conv_f.weight")[:, :, 0, 0]),
                       "bias": t(f"{pre}.context_gen.conv_f.bias")},
            "proj_t": {"kernel": _dense_w(t(f"{pre}.context_gen.conv_t.weight")[:, :, 0, 0]),
                       "bias": t(f"{pre}.context_gen.conv_t.bias")},
        }
        bs["context"] = {"joint_bn": joint_bn_s}

        if cnf.expanded_channels != cnf.input_channels:
            if cfg.no_dyconv:
                bp["exp_conv"] = {"kernel": _conv_w(t(f"{pre}.exp_conv.module.weight"))}
            else:
                bp["exp_conv"] = _dynamic_conv(t, f"{pre}.exp_conv", True,
                                               cnf.input_channels, k=k)
            bp["exp_bn"], bs["exp_bn"] = _bn(t, f"{pre}.exp_norm")

        if cfg.no_dyconv:
            bp["depth_conv"] = {"kernel": _conv_w(t(f"{pre}.depth_conv.module.weight"))}
        else:
            bp["depth_conv"] = _dynamic_conv(t, f"{pre}.depth_conv", False,
                                             cnf.expanded_channels, ks=cnf.kernel, k=k)
        bp["depth_bn"], bs["depth_bn"] = _bn(t, f"{pre}.depth_norm")

        if not cfg.no_dyrelu:
            bp["dyrelu"] = {"coef": _dense(t, f"{pre}.depth_act.coef_net.0")}

        if cfg.no_dyconv:
            bp["proj_conv"] = {"kernel": _conv_w(t(f"{pre}.proj_conv.module.weight"))}
        else:
            bp["proj_conv"] = _dynamic_conv(t, f"{pre}.proj_conv", True,
                                            cnf.expanded_channels, k=k)
        bp["proj_bn"], bs["proj_bn"] = _bn(t, f"{pre}.proj_norm")

        params[f"block{i}"] = bp
        stats[f"block{i}"] = bs

    params["tail"], stats["tail"] = _cna(t, "out_c")

    if cfg.head_type == "mlp":
        _mlp_head(t, params, drop_head)
    elif cfg.head_type == "fully_convolutional":
        _fc_head(t, params, stats, drop_head)
    return {"params": params, "batch_stats": stats}


def convert(sd: Dict[str, np.ndarray], cfg: Union[MNConfig, DyMNConfig],
            drop_head: bool = False) -> Dict[str, Any]:
    if isinstance(cfg, DyMNConfig):
        return convert_dymn(sd, cfg, drop_head)
    return convert_mn(sd, cfg, drop_head)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pt checkpoint into numpy (torch stays a test/convert dep)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {key: value.numpy() for key, value in sd.items()}


def _merge_fresh_head(variables, fresh, cfg) -> None:
    """Graft freshly initialized head params over converted ones (surgery)."""
    if cfg.head_type == "mlp":
        # keep converted hidden layer if present; only 'out' was dropped
        head = variables["params"].setdefault("head", {})
        fresh_head = fresh["params"]["head"]
        for name, value in fresh_head.items():
            head.setdefault(name, value)
    else:
        variables["params"]["head"] = fresh["params"]["head"]
        if "head" in fresh.get("batch_stats", {}):
            variables["batch_stats"]["head"] = fresh["batch_stats"]["head"]


def checkpoint_classes(sd: Dict[str, np.ndarray], head_type: str) -> int:
    """Class count stored in a reference checkpoint (models/mn/model.py:285-291).

    The reference returns -1 (always-drop) for attention-pooling heads; here
    the class count is recovered from the projection/head-weight shapes so an
    MHA checkpoint reloaded with the same class count keeps its head.
    """
    if head_type == "mlp" and "classifier.5.bias" in sd:
        return sd["classifier.5.bias"].shape[0]
    if head_type == "fully_convolutional" and "classifier.1.bias" in sd:
        return sd["classifier.1.bias"].shape[0]
    if (head_type == "multihead_attention_pooling"
            and "classifier.head_weight" in sd
            and "classifier.subspace_proj.weight" in sd):
        heads = sd["classifier.head_weight"].shape[1]
        return sd["classifier.subspace_proj.weight"].shape[0] // (2 * heads)
    return -1


def ensure_checkpoint(name: str, model_dir: str = MODEL_DIR) -> str:
    """Download (if missing) and return the path of a registry name's .pt.

    If ``<model_dir>/checkpoints.sha256`` exists (lines of
    ``<sha256>  <filename>``, the sha256sum format), the file's digest is
    verified against it — the first networked parity run can pin the
    release artifacts once and every later run cross-checks them
    (scripts/parity_check.py records the digest either way)."""
    import hashlib

    spec = get_model_config(name)
    path = os.path.join(model_dir, spec.file)
    if not os.path.isfile(path):
        os.makedirs(model_dir, exist_ok=True)
        urllib.request.urlretrieve(spec.url, path)
    manifest = os.path.join(model_dir, "checkpoints.sha256")
    if os.path.isfile(manifest):
        want = None
        with open(manifest) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2 and parts[1].lstrip("*") == spec.file:
                    want = parts[0].lower()
        if want is not None:
            h = hashlib.sha256()
            with open(path, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
            got = h.hexdigest()
            if got != want:
                raise ValueError(
                    f"checksum mismatch for {spec.file}: manifest {want}, "
                    f"file {got} — delete the file to re-download")
    return path


def load_pretrained(
    name: str,
    num_classes: Optional[int] = None,
    model_dir: str = MODEL_DIR,
    dtype=None,
) -> Tuple[Any, Dict[str, Any], Any]:
    """Build a model + converted pretrained variables for a registry name.

    Downloads the torch checkpoint to ``model_dir`` if missing (requires
    network; in an air-gapped environment place the .pt there manually).
    Returns (module, variables, spec).
    """
    import jax
    import jax.numpy as jnp

    from efficientat_tpu.models.registry import build_model

    spec = get_model_config(name)
    model, _ = build_model(name, num_classes=num_classes, dtype=dtype)
    cfg = model.cfg

    path = ensure_checkpoint(name, model_dir)
    sd = load_torch_state_dict(path)

    ckpt_classes = checkpoint_classes(sd, cfg.head_type)
    drop_head = ckpt_classes != cfg.num_classes
    variables = convert(sd, cfg, drop_head=drop_head)
    if drop_head:
        from efficientat_tpu.utils.common import host_init

        fresh = host_init(model, jax.random.PRNGKey(0),
                          jnp.zeros((1, 128, 64, cfg.in_channels), jnp.float32))
        fresh = jax.tree.map(np.asarray, fresh)
        _merge_fresh_head(variables, fresh, cfg)
    variables = jax.tree.map(jnp.asarray, variables)
    return model, variables, spec
