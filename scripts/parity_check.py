"""Checkpoint-parity harness: converted flax model vs reference expectations.

Usage (requires the reference .pt checkpoints in resources/ — download them
on a networked machine from the EfficientAT GitHub release):

    python scripts/parity_check.py --model_name dymn10_as \
        --audio_path resources/metro_station-paris.wav

Checks the top-10 tag printout against the reference's published output for
dymn10_as on the demo clip (README.md:131-146: Train 0.747, Subway 0.599,
..., Music 0.017) and prints a side-by-side table. With --expected absent it
just prints the predictions for manual comparison.

This is the offline stand-in for full AudioSet-eval mAP parity
(dymn10_as -> mAP 0.478 / ROC 0.981, reference README.md:185-191), which
needs the eval HDF5.
"""

import argparse
import sys

# reference README.md:131-146 — dymn10_as on resources/metro_station-paris.wav
EXPECTED_DYMN10 = [
    ("Train", 0.747), ("Subway, metro, underground", 0.599),
    ("Rail transport", 0.493), ("Railroad car, train wagon", 0.445),
    ("Vehicle", 0.360), ("Clickety-clack", 0.105), ("Speech", 0.053),
    ("Outside, urban or manmade", 0.050), ("Sliding door", 0.033),
    ("Music", 0.017),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", default="dymn10_as")
    p.add_argument("--audio_path", default="resources/metro_station-paris.wav")
    p.add_argument("--model_dir", default="resources")
    p.add_argument("--tolerance", type=float, default=0.02)
    args = p.parse_args()

    from efficientat_tpu.infer.tag import Tagger

    tagger = Tagger(args.model_name, pretrained=True, model_dir=args.model_dir)
    tags = tagger.tag(args.audio_path, top_k=10)

    expected = EXPECTED_DYMN10 if args.model_name == "dymn10_as" else None
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
    if expected:
        print("PARITY:", "PASS" if ok else "FAIL")
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
