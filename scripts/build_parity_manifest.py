"""Parity evidence manifest over the FULL checkpoint registry.

The build environment is air-gapped, so real released ``.pt`` files cannot
be fetched. This script makes the first networked parity run a pure diff:
for EVERY registry name (models/registry.py, mirroring the reference zoo in
models/mn/model.py:24-70 and models/dymn/model.py:18-33) it

1. synthesizes a reference-style torch state_dict with the exact key
   naming/shapes of the published checkpoint (tests/torch_oracle.py),
2. converts it with efficientat_tpu.models.convert (the same code path a
   real checkpoint takes),
3. runs the converted flax model AND the independent torch-functional
   oracle on one fixed deterministic log-mel input (built with the model's
   own mel config), and
4. records per name: converted-param census, mel config, fp32 logits
   digest (sum / crc32 / first-8), and max|flax - oracle| parity error.

Windowed (infer/windowed.py) and ensemble (infer/tag.py multi-member) path
rows ride the same synthetic weights on the committed demo asset.

Usage (CPU by default — deterministic across runs on one host):

    python scripts/build_parity_manifest.py                 # all names
    python scripts/build_parity_manifest.py --names mn10_as dymn10_as

Output: parity_manifest.json (committed). Once networked, run
``scripts/parity_check.py`` per name with the real weights and diff against
the reference goldens (README.md:131-146 demo top-10, :185-191 mAP/ROC);
this manifest proves the converter + forward path for every name ahead of
that run, so any real-weight mismatch is isolated to the weights themselves.
"""

import argparse
import dataclasses
import json
import os
import sys
import time
import zlib

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, "tests"))

# CPU + persistent compile cache before first backend use (same reasoning as
# tests/conftest.py: the sitecustomize registers the remote TPU plugin AND
# presets JAX_PLATFORMS=axon, so a setdefault is not enough — the manifest
# must force CPU explicitly. On the TPU backend fp32 convs run as bf16
# passes (~1e-3 relative), which would drown the fp32 parity signal this
# manifest exists to record (measured: mn10_as_fc logits move 8e-3 on TPU
# vs 7e-7 on CPU against the float64 torch oracle).
_BACKEND = os.environ.get("EAT_MANIFEST_BACKEND", "cpu")
os.environ["JAX_PLATFORMS"] = _BACKEND

import jax  # noqa: E402

jax.config.update("jax_platforms", _BACKEND)
if _BACKEND != "cpu":
    # persistent cache only off-CPU: XLA:CPU's serialized-executable
    # reload can abort() on programs this very host cached (see
    # tests/conftest.py); a CPU manifest rebuild recompiles instead
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402

from efficientat_tpu.models.convert import convert  # noqa: E402
from efficientat_tpu.models.dymn import DyMNConfig  # noqa: E402
from efficientat_tpu.models.registry import REGISTRY, build_model  # noqa: E402
from efficientat_tpu.ops.melspec import log_mel_spectrogram  # noqa: E402

from torch_oracle import (  # noqa: E402
    make_dymn_state_dict, make_mn_state_dict,
    torch_dymn_forward, torch_mn_forward)

WAVE_SECONDS = 1.0
WAVE_SEED = 2026


def _digest(arr: np.ndarray) -> dict:
    a = np.asarray(arr, dtype=np.float32)
    return {
        "shape": list(a.shape),
        "sum": round(float(a.sum()), 4),
        "crc32": zlib.crc32(a.tobytes()),
        "first8": [round(float(v), 5) for v in a.reshape(-1)[:8]],
    }


def _param_census(variables) -> dict:
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})
    p_leaves = jax.tree.leaves(params)
    s_leaves = jax.tree.leaves(stats)
    return {
        "param_leaves": len(p_leaves),
        "param_count": int(sum(int(np.size(x)) for x in p_leaves)),
        "batch_stat_leaves": len(s_leaves),
    }


def _fixed_mel(mel_cfg) -> np.ndarray:
    """One deterministic log-mel input per mel config: (1, n_mels, T)."""
    n = int(WAVE_SECONDS * mel_cfg.sr)
    wave = np.random.default_rng(WAVE_SEED).normal(size=(1, n)).astype(np.float32) * 0.25
    return np.asarray(log_mel_spectrogram(jnp.asarray(wave), mel_cfg))


def check_name(name: str) -> dict:
    spec = REGISTRY[name]
    cfg = spec.model_cfg
    is_dymn = isinstance(cfg, DyMNConfig)
    seed = zlib.crc32(name.encode()) & 0x7FFF

    sd = (make_dymn_state_dict if is_dymn else make_mn_state_dict)(cfg, seed=seed)
    np_sd = {k: v.numpy() for k, v in sd.items()}
    variables = convert(np_sd, cfg)

    mel = _fixed_mel(spec.mel_cfg)  # (1, n_mels, T)
    x_nhwc = jnp.asarray(mel)[..., None]
    x_nchw = torch.tensor(mel[:, None, :, :])

    model, _ = build_model(name)
    v = jax.tree.map(jnp.asarray, variables)
    if is_dymn:
        fwd = jax.jit(lambda vv, xx: model.apply(vv, xx, False, cfg.t_max)[0])
        with torch.no_grad():
            want, _ = torch_dymn_forward(sd, x_nchw, cfg, cfg.t_max)
    else:
        fwd = jax.jit(lambda vv, xx: model.apply(vv, xx)[0])
        with torch.no_grad():
            want, _ = torch_mn_forward(sd, x_nchw, cfg)
    got = np.asarray(fwd(v, x_nhwc))
    want = want.numpy()
    err = float(np.max(np.abs(got - want)))
    # relative metric: the synthetic weights (scale 0.5, torch_oracle._t)
    # blow width-4.0 activations up to O(1e8), so an absolute tolerance is
    # meaningless across the zoo; fp32 reassociation through ~60 layers at
    # width 4 measures up to ~5e-4 relative (worst observed 4.6e-4,
    # mn40_as_ext(3)) while real-magnitude nets sit at ~1e-6
    scale = float(np.max(np.abs(want)))
    rel = err / (scale + 1.0)

    return {
        "name": name,
        "file": spec.file,
        "url": spec.url,
        "synth_seed": seed,
        "mel_cfg": dataclasses.asdict(spec.mel_cfg),
        "census": _param_census(variables),
        "flax_logits": _digest(got),
        "oracle_max_abs_diff": round(err, 6),
        "oracle_logits_scale": round(scale, 4),
        "oracle_rel_diff": float(f"{rel:.3g}"),
        "parity_ok": bool(rel <= 2e-3),
    }


def _tagger_with_synth_weights(names):
    """A Tagger whose members carry converter-produced synthetic weights."""
    import warnings

    from efficientat_tpu.infer.tag import Tagger

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tagger = Tagger(list(names), pretrained=False)
    for i, name in enumerate(names):
        cfg = REGISTRY[name].model_cfg
        is_dymn = isinstance(cfg, DyMNConfig)
        seed = zlib.crc32(name.encode()) & 0x7FFF
        sd = (make_dymn_state_dict if is_dymn else make_mn_state_dict)(cfg, seed=seed)
        variables = jax.tree.map(
            jnp.asarray, convert({k: vv.numpy() for k, vv in sd.items()}, cfg))
        tagger.members[i] = (tagger.members[i][0], variables)
    return tagger


def check_windowed(audio_path: str) -> dict:
    """infer/windowed.py path on the committed demo asset (synthetic mn04)."""
    from efficientat_tpu.infer.windowed import tag_audio_window

    tagger = _tagger_with_synth_weights(["mn04_as"])
    rows = tag_audio_window(tagger, audio_path, window_size=2.0,
                            hop_length=1.0, top_k=3)
    probs = np.asarray([[p for _, p in r["tags"]] for r in rows], np.float32)
    return {
        "name": "__windowed__[mn04_as]",
        "audio": os.path.relpath(audio_path, _HERE),
        "n_windows": len(rows),
        "top3_probs": _digest(probs),
        "first_window_tags": [[l, round(p, 5)] for l, p in rows[0]["tags"]],
    }


def check_ensemble() -> dict:
    """Multi-member averaged path of infer/tag.py (reference ensemble.py)."""
    tagger = _tagger_with_synth_weights(["mn04_as", "mn05_as"])
    n = int(WAVE_SECONDS * tagger.mel_cfg.sr)
    wave = np.random.default_rng(WAVE_SEED).normal(size=(2, n)).astype(np.float32) * 0.25
    probs = tagger.predict(wave)

    # the averaged ensemble must equal the mean of its members' sigmoids'
    # pre-sigmoid logits — check against per-member predictions
    singles = []
    for name in ["mn04_as", "mn05_as"]:
        t1 = _tagger_with_synth_weights([name])
        singles.append(t1.predict(wave))
    return {
        "name": "__ensemble__[mn04_as+mn05_as]",
        "probs": _digest(probs),
        "member_probs_mean_note": "ensemble averages logits, not probs",
        "members": [_digest(s) for s in singles],
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--names", nargs="*", default=None,
                   help="subset of registry names (default: all)")
    p.add_argument("--out", default=os.path.join(_HERE, "parity_manifest.json"))
    p.add_argument("--skip_paths", action="store_true",
                   help="skip the windowed/ensemble path rows")
    args = p.parse_args()

    names = args.names or sorted(REGISTRY)
    rows, failures = [], []
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            row = check_name(name)
        except Exception as e:  # record, keep going — partial evidence > none
            row = {"name": name, "error": f"{type(e).__name__}: {e}"}
            failures.append(name)
        rows.append(row)
        dt = time.perf_counter() - t0
        status = ("ERROR" if "error" in row else
                  ("ok" if row["parity_ok"] else
                   f"REL-DIFF {row['oracle_rel_diff']}"))
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({dt:.1f}s)", flush=True)
        if "error" not in row and not row["parity_ok"]:
            failures.append(name)

    path_rows = []
    if not args.skip_paths:
        demo = os.path.join(_HERE, "assets", "demo_scene.wav")
        for fn, arg in ((check_windowed, (demo,)), (check_ensemble, ())):
            try:
                path_rows.append(fn(*arg))
                print(f"path row {path_rows[-1]['name']}: ok", flush=True)
            except Exception as e:
                path_rows.append({"name": fn.__name__, "error": repr(e)})
                failures.append(fn.__name__)

    manifest = {
        "schema": 1,
        "backend": jax.devices()[0].platform,
        "jax_version": jax.__version__,
        "torch_version": torch.__version__,
        "wave": {"seconds": WAVE_SECONDS, "seed": WAVE_SEED, "scale": 0.25},
        "tolerance_rel": 2e-3,
        "n_names": len(names),
        "n_parity_ok": sum(1 for r in rows if r.get("parity_ok")),
        "models": rows,
        "paths": path_rows,
    }
    with open(args.out, "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"manifest -> {args.out} "
          f"({manifest['n_parity_ok']}/{len(names)} parity ok)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
