"""Bench regression guard (ADVICE r2 item 8).

Compares a fresh bench.py output against the last good recorded bench
(default BENCH_LOCAL.json) and fails loudly on:

- DNF: the new bench is missing queries the baseline had, or carries
  an ``errors`` map (bench.py records per-query failures there);
- regression: total ratio > ``--max-ratio`` (default 1.5), or any
  single query > ``--query-ratio`` (default 2.0) slower AND above an
  absolute floor (``--floor-sec``, default 2.0 s). Calibration note:
  this box shows up to ~3x first-run jitter on sub-2s queries under
  load (measured: multimodal_meta 0.26 s steady vs 1.2-2.9 s cold),
  so per-query thresholds are deliberately loose; the total (noise-
  averaged) and the heavy tail are the trustworthy signals.

Usage::

    SPARK_GRAFT_SF_DIR=... python bench.py > /tmp/bench_new.json
    python tools/bench_compare.py /tmp/bench_new.json [BENCH_LOCAL.json]
"""

from __future__ import annotations

import argparse
import json
import sys


def compare(
    new: dict,
    base: dict,
    max_ratio: float = 1.5,
    floor_sec: float = 2.0,
    query_ratio: float = 2.0,
) -> list[str]:
    """Return a list of human-readable violations (empty = pass)."""
    problems: list[str] = []
    nq, bq = new.get("queries", {}), base.get("queries", {})
    for err_name, err in (new.get("errors") or {}).items():
        problems.append(f"DNF: {err_name}: {err}")
    missing = sorted(set(bq) - set(nq))
    if missing:
        problems.append(f"DNF: missing queries vs baseline: {missing}")
    base_total, new_total = base.get("value"), new.get("value")
    if base_total and new_total and new_total > base_total * max_ratio:
        problems.append(
            f"total regression: {new_total:.1f}s vs baseline "
            f"{base_total:.1f}s ({new_total / base_total:.2f}x)"
        )
    for name, sec in nq.items():
        b = bq.get(name)
        if b and sec > max(b * query_ratio, floor_sec):
            problems.append(
                f"query regression: {name} {sec:.2f}s vs {b:.2f}s "
                f"({sec / b:.2f}x)"
            )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("new_bench")
    ap.add_argument("baseline", nargs="?", default="BENCH_LOCAL.json")
    ap.add_argument("--max-ratio", type=float, default=1.5)
    ap.add_argument("--floor-sec", type=float, default=2.0)
    ap.add_argument("--query-ratio", type=float, default=2.0)
    args = ap.parse_args()
    with open(args.new_bench) as f:
        new = json.load(f)
    with open(args.baseline) as f:
        base = json.load(f)
    problems = compare(new, base, args.max_ratio, args.floor_sec, args.query_ratio)
    for p in problems:
        print(p)
    print("PASS" if not problems else f"{len(problems)} PROBLEMS")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
