"""Per-query bench regression compare.

Usage::

    python tools/bench_compare.py BASE.json NEW.json [--threshold 1.5]

Each file is a bench.py output line ({"queries": {name: sec}}). Prints
per-query deltas, flags regressions beyond the threshold ratio, and
exits 1 if any query regressed (new queries and removed queries are
reported but never fail the check — machine noise on this box is
±40%, so the default threshold is deliberately loose; see memory
round1-status).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="fail if new/base exceeds this ratio (default 1.5)")
    ap.add_argument("--min-sec", type=float, default=1.0,
                    help="ignore queries faster than this in BOTH runs "
                         "(sub-second timings are pure noise)")
    args = ap.parse_args()

    with open(args.base) as f:
        base = json.load(f)["queries"]
    with open(args.new) as f:
        new = json.load(f)["queries"]

    regressions = []
    for name in sorted(set(base) | set(new)):
        b, n = base.get(name), new.get(name)
        if b is None:
            print(f"  {name:35s} NEW       {n:8.2f}s")
            continue
        if n is None:
            print(f"  {name:35s} REMOVED   (was {b:.2f}s)")
            continue
        ratio = n / b if b > 0 else float("inf")
        flag = ""
        if max(b, n) >= args.min_sec and ratio > args.threshold:
            flag = f"  REGRESSED {ratio:.2f}x"
            regressions.append(name)
        elif max(b, n) >= args.min_sec and ratio < 1 / args.threshold:
            flag = f"  improved {ratio:.2f}x"
        print(f"  {name:35s} {b:8.2f}s -> {n:8.2f}s{flag}")

    tb, tn = sum(base.values()), sum(new.values())
    print(f"TOTAL {tb:.1f}s -> {tn:.1f}s "
          f"({len(regressions)} regression(s) past {args.threshold}x)")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
