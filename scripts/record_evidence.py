"""Record per-round verification evidence into TESTS.md (VERDICT r4 #9).

Runs the fast and slow test tiers (serially — one JAX process at a time on
this host), captures pass counts + durations, picks up the newest bench
JSON line if a log is supplied, and rewrites TESTS.md. Meant to run before
the end-of-round snapshot commit:

    make evidence                      # both tiers (slow tier ~50 min)
    python scripts/record_evidence.py --skip-slow   # fast tier only
    python scripts/record_evidence.py --bench-log /tmp/bench.log
"""

import argparse
import datetime
import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_tier(marker: str) -> dict:
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "-m", marker],
        cwd=HERE, capture_output=True, text=True)
    dt = time.perf_counter() - t0
    tail = (proc.stdout or "").strip().splitlines()
    summary = tail[-1] if tail else ""
    m = re.search(r"(\d+) passed", summary)
    f = re.search(r"(\d+) failed", summary)
    return {"marker": marker, "rc": proc.returncode,
            "passed": int(m.group(1)) if m else 0,
            "failed": int(f.group(1)) if f else 0,
            "duration_s": round(dt, 1), "summary": summary}


def last_bench_line(path: str):
    try:
        with open(path) as fh:
            lines = [l for l in fh if l.startswith('{"metric"')]
        return json.loads(lines[-1]) if lines else None
    except OSError:
        return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip-slow", action="store_true")
    p.add_argument("--skip-fast", action="store_true")
    p.add_argument("--bench-log", default=None,
                   help="bench stdout log to lift the headline line from")
    args = p.parse_args()

    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=HERE,
                          capture_output=True, text=True).stdout.strip()
    tiers = []
    if not args.skip_fast:
        tiers.append(run_tier("not slow"))
        print(tiers[-1]["summary"])
    if not args.skip_slow:
        tiers.append(run_tier("slow"))
        print(tiers[-1]["summary"])

    bench = last_bench_line(args.bench_log) if args.bench_log else None

    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%MZ")
    out = [
        "# TESTS.md — per-round verification evidence",
        "",
        "Written by `make evidence` (scripts/record_evidence.py) before the",
        "round snapshot, so the committed artifact proves the tiers ran green",
        "and what the bench said, without a judge re-run.",
        "",
        f"- recorded: {stamp} at `{head}` (evidence commit follows this hash)",
        "",
        "| tier | passed | failed | duration |",
        "|---|---|---|---|",
    ]
    for t in tiers:
        out.append(f"| `{t['marker']}` | {t['passed']} | {t['failed']} | "
                   f"{t['duration_s']} s |")
    out.append("")
    if bench:
        out.append("Bench headline (last emitted line of the supplied log):")
        out.append("")
        out.append("```json")
        out.append(json.dumps(bench))
        out.append("```")
        out.append("")
    with open(os.path.join(HERE, "TESTS.md"), "w") as fh:
        fh.write("\n".join(out))
    print("TESTS.md written")
    if any(t["rc"] != 0 for t in tiers):
        sys.exit(1)


if __name__ == "__main__":
    main()
