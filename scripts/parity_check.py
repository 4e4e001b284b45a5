"""Checkpoint-parity harness: converted flax model vs reference expectations.

One-command flow the moment a networked machine supplies the ``.pt`` files
(download from the EfficientAT GitHub release into ``resources/``):

    python scripts/parity_check.py --model_name dymn10_as          # demo clip
    python scripts/parity_check.py --model_name mn10_as \
        --eval_hdf5 /data/audioset/eval_segments_mp3.hdf            # full mAP

Exit code 0 iff every available golden for the model passes:
- demo-clip top-10 tags (published for dymn10_as, README.md:131-146)
- AudioSet-eval mAP/ROC (README.md:185-191 and the mAP encoded in each
  checkpoint filename, models/mn/model.py:41-69, models/dymn/model.py:25-32)

Also dumps ``parity_<model>.json`` with the raw top-10, an fp32 logits
checksum (sum + crc32 of the logit bytes), and pass/fail per check, so
parity evidence can be diffed across machines/runs.
"""

import argparse
import json
import sys
import zlib

import numpy as np

# reference README.md:131-146 — dymn10_as on resources/metro_station-paris.wav
EXPECTED_DEMO = {
    "dymn10_as": [
        ("Train", 0.747), ("Subway, metro, underground", 0.599),
        ("Rail transport", 0.493), ("Railroad car, train wagon", 0.445),
        ("Vehicle", 0.360), ("Clickety-clack", 0.105), ("Speech", 0.053),
        ("Outside, urban or manmade", 0.050), ("Sliding door", 0.033),
        ("Music", 0.017),
    ],
}

# AudioSet eval goldens: README.md:185-191 transcript (dymn10_as) and the
# README model table / checkpoint-filename mAPs (mn10_as -> 0.471).
EXPECTED_EVAL = {
    "dymn10_as": {"mAP": 0.478, "ROC": 0.981},
    "mn10_as": {"mAP": 0.471},
}


def check_demo(tagger, args, report):
    # one decode + one forward: top-10 and the checksum come from the same
    # probability vector
    from efficientat_tpu.data.audio_io import load_waveform

    wave = load_waveform(args.audio_path, target_sr=tagger.mel_cfg.sr)
    probs = tagger.predict(wave[None, :])[0].astype(np.float32)
    order = np.argsort(probs)[::-1][:10]
    tags = [(tagger.labels[i], float(probs[i])) for i in order]
    report["top10"] = [[l, round(float(p), 4)] for l, p in tags]
    report["probs_sum"] = float(probs.sum())
    report["probs_crc32"] = zlib.crc32(probs.tobytes())

    expected = EXPECTED_DEMO.get(args.model_name)
    print(f"{'label':<40} {'got':>7} {'expected':>9}")
    ok = True
    for i, (label, prob) in enumerate(tags):
        want = expected[i] if expected and i < len(expected) else ("", None)
        mark = ""
        if want[1] is not None:
            close = label == want[0] and abs(prob - want[1]) <= args.tolerance
            ok &= close
            mark = "  OK" if close else "  MISMATCH"
        print(f"{label:<40} {prob:>7.3f} "
              f"{'' if want[1] is None else f'{want[1]:>9.3f}'}{mark}")
    if expected is None:
        print(f"(no published demo-clip golden for {args.model_name}; "
              "top-10 + checksum recorded for manual comparison)")
        return None
    report["demo_pass"] = ok
    return ok


def check_eval(tagger, args, report):
    """Full AudioSet-eval mAP/ROC against the published goldens."""
    from efficientat_tpu.data.hdf5 import open_audio_hdf5
    from efficientat_tpu.train.metrics import macro_metrics

    ds = open_audio_hdf5(args.eval_hdf5, resample_rate=tagger.mel_cfg.sr,
                         num_classes=527)
    bs = args.batch_size
    probs, targets = [], []
    for start in range(0, len(ds), bs):
        idx = range(start, min(start + bs, len(ds)))
        items = [ds.get(i, np.random.default_rng(0)) for i in idx]
        waves = np.stack([it["wave"] for it in items])
        if len(items) < bs:  # pad to the compiled batch shape
            waves = np.concatenate(
                [waves, np.zeros((bs - len(items),) + waves.shape[1:], np.float32)])
        probs.append(tagger.predict(waves)[: len(items)])
        targets.append(np.stack([it["target"] for it in items]))
    probs = np.concatenate(probs)
    targets = np.concatenate(targets)
    m_ap, m_roc = macro_metrics(targets > 0.5, probs)
    want = EXPECTED_EVAL.get(args.model_name, {})
    ok = True
    print(f"AudioSet eval: mAP={m_ap:.4f} ROC={m_roc:.4f}")
    if "mAP" in want:
        ok &= abs(m_ap - want["mAP"]) <= args.map_tolerance
        print(f"  golden mAP {want['mAP']:.3f} ± {args.map_tolerance}: "
              f"{'OK' if ok else 'MISMATCH'}")
    if "ROC" in want:
        roc_ok = abs(m_roc - want["ROC"]) <= args.map_tolerance
        ok &= roc_ok
        print(f"  golden ROC {want['ROC']:.3f} ± {args.map_tolerance}: "
              f"{'OK' if roc_ok else 'MISMATCH'}")
    report["eval"] = {"mAP": round(float(m_ap), 4), "ROC": round(float(m_roc), 4),
                      "pass": bool(ok)}
    return ok if want else None


def run(argv=None) -> int:
    """Full parity flow for one name; returns the exit code (0 = pass or
    no-golden). Kept callable so the offline dry-run test can exercise the
    complete download(skip)->checksum->convert->demo->report path with a
    local fake release file (tests/test_convert.py)."""
    import hashlib

    p = argparse.ArgumentParser()
    p.add_argument("--model_name", default="dymn10_as")
    p.add_argument("--audio_path", default="resources/metro_station-paris.wav")
    p.add_argument("--model_dir", default="resources")
    p.add_argument("--tolerance", type=float, default=0.02,
                   help="per-tag probability tolerance for the demo golden")
    p.add_argument("--map_tolerance", type=float, default=0.002,
                   help="mAP/ROC tolerance (BASELINE: parity within 0.2 pp)")
    p.add_argument("--eval_hdf5", default=None,
                   help="AudioSet eval_segments HDF5 for full mAP parity")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--out", default=None,
                   help="report path (default parity_<model>.json)")
    args = p.parse_args(argv)

    from efficientat_tpu.infer.tag import Tagger
    from efficientat_tpu.models.convert import ensure_checkpoint

    # download (or find) the release file FIRST and record its digest, so
    # the report pins exactly which artifact produced the numbers; an
    # optional <model_dir>/checkpoints.sha256 manifest is enforced inside
    path = ensure_checkpoint(args.model_name, args.model_dir)
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    report = {"model_name": args.model_name,
              "checkpoint_file": path,
              "checkpoint_sha256": h.hexdigest()}
    print(f"checkpoint {path} sha256={report['checkpoint_sha256']}")

    tagger = Tagger(args.model_name, pretrained=True, model_dir=args.model_dir)
    results = [check_demo(tagger, args, report)]
    if args.eval_hdf5:
        results.append(check_eval(tagger, args, report))

    out = args.out or f"parity_{args.model_name}.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report -> {out}")

    graded = [r for r in results if r is not None]
    if not graded:
        print("PARITY: NO GOLDEN (recorded only)")
        return 0
    ok = all(graded)
    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(run())
