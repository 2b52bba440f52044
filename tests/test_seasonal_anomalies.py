"""seasonal_anomalies: plain-Python reference parity on sf0.001 (dense
spine with zero-filled gap hours, leave-one-out integer flagging) plus
the LOO property that motivates the design: an included-point 2σ rule
is near-blind at monthly n, the LOO rule is not.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from datetime import timedelta

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.timeseries import (
    ANOM_SIGMA,
    seasonal_anomalies,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
    load_table,
)


def _reference(ts_list):
    floor_h = lambda t: t.replace(minute=0, second=0, microsecond=0)
    counts = Counter(floor_h(t) for t in ts_list)
    h, h1 = floor_h(min(ts_list)), floor_h(max(ts_list))
    dense = []
    while h <= h1:
        dense.append((h, counts.get(h, 0)))
        h += timedelta(hours=1)
    cells = defaultdict(lambda: [0, 0, 0])  # n, s, q
    for b, c in dense:
        cell = cells[b.hour]
        cell[0] += 1
        cell[1] += c
        cell[2] += c * c
    out = {}
    for b, c in dense:
        n, s, q = cells[b.hour]
        dev = c * (n - 1) - (s - c)
        thr = ANOM_SIGMA * ANOM_SIGMA * (
            (n - 1) * (q - c * c) - (s - c) * (s - c)
        )
        if dev * dev > thr:
            out[b.strftime("%Y-%m-%d %H:%M:%S")] = (
                c,
                dev * dev,
                thr,
                1 if dev > 0 else -1,
            )
    return out


def test_matches_python_reference(spark, sf_dir):
    ts_list = [
        r["ts"]
        for r in load_table(spark, "events", sf_dir)
        .select("ts")
        .collect()
    ]
    want = _reference(ts_list)
    got = {
        r["bucket_hour"]: (
            r["cnt"],
            r["dev_sq"],
            r["thr"],
            r["direction"],
        )
        for r in seasonal_anomalies(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) > 0  # the sf0.001 feed does contain 2σ-LOO hours


def test_loo_beats_included_point_rule(spark, sf_dir):
    """With the candidate included in its own cell, z is bounded by
    sqrt(n-1); verify the LOO flags we emit include at least one hour
    an included-point 2σ rule would miss at this n (the blindness the
    docstring claims)."""
    ts_list = [
        r["ts"]
        for r in load_table(spark, "events", sf_dir)
        .select("ts")
        .collect()
    ]
    floor_h = lambda t: t.replace(minute=0, second=0, microsecond=0)
    counts = Counter(floor_h(t) for t in ts_list)
    h, h1 = floor_h(min(ts_list)), floor_h(max(ts_list))
    dense = []
    while h <= h1:
        dense.append((h, counts.get(h, 0)))
        h += timedelta(hours=1)
    cells = defaultdict(lambda: [0, 0, 0])
    for b, c in dense:
        cell = cells[b.hour]
        cell[0] += 1
        cell[1] += c
        cell[2] += c * c

    def included_flag(b, c):
        # (c - s/n)^2 > k^2 * (q/n - (s/n)^2), cross-multiplied by n^2:
        # dev^2 > k^2 * (n*q - s^2) — the same algebra as the LOO rule
        # but with the candidate INSIDE its own baseline
        n, s, q = cells[b.hour]
        dev = c * n - s
        thr = ANOM_SIGMA * ANOM_SIGMA * (n * q - s * s)
        return dev * dev > thr

    loo_flags = set(
        r["bucket_hour"]
        for r in seasonal_anomalies(spark, sf_dir).collect()
    )
    included = {
        b.strftime("%Y-%m-%d %H:%M:%S")
        for b, c in dense
        if included_flag(b, c)
    }
    assert loo_flags - included, (
        "LOO found nothing beyond the included-point rule"
    )
