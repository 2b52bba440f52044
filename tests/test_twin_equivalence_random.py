"""Randomized (seeded) equivalence nets for the r8 scale twins: the
histogram-Gini and sharded-burstiness rewrites must equal their
rank/ordered-lag anchors on corpora built to stress exactly the seams
where a rewrite could diverge — heavy value ties (block rank sums),
same-second events (t_s tie order), day-boundary straddles and empty
days (the stitch), tiny groups (k = n DIV 10 = 0).

Deterministic LCG corpora (no hypothesis: Spark's per-example cost
makes shrinking pathological); five seeds per twin, each a different
tie/boundary mix. Equality is full-row, sorted."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.stats import (
    revenue_gini,
    revenue_gini_grid,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.surveillance import (
    user_cohorts_onepass,
    user_cohorts_setops,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.timeseries import (
    interarrival_burstiness,
    interarrival_burstiness_sharded,
)


def _lcg(seed: int):
    s = seed & 0x7FFFFFFF

    def nxt(mod: int) -> int:
        nonlocal s
        s = (1103515245 * s + 12345) % 2**31
        return s % mod

    return nxt


def _write_events(path: str, seed: int, n: int) -> None:
    """Adversarial synthetic events table:

    - values drawn from a SMALL grid (heavy cents ties → many-row
      rank blocks for the Gini identity);
    - timestamps clustered in bursts with same-second repeats and
      multi-day jumps (stitch seams + empty days);
    - a 'tiny' type with < 10 rows (k = 0 NULL-share edge);
    - negative event-time deltas never occur, but tie ORDER between
      event_id and ts is shuffled (event_id not monotone in ts).
    """
    rng = _lcg(seed)
    base_us = 1_700_000_000_000_000
    rows = []
    t = base_us
    types = ("click", "purchase", "signup", "error")
    for i in range(n):
        etype = types[rng(4)]
        # bursty clock: 40% same second as previous, 10% day jump
        r = rng(10)
        if r < 4:
            t += rng(900_000)  # sub-second micro-jitter, same second
        elif r < 9:
            t += (1 + rng(7200)) * 1_000_000
        else:
            t += (1 + rng(3)) * 86_400_000_000  # 1-3 day gap
        value = (1 + rng(25)) / 4.0  # 25 distinct cents values → ties
        rows.append((i * 7919 % (10 * n), t, rng(50), etype, value))
    # the tiny type: 4 rows → n DIV 10 = 0
    for j in range(4):
        rows.append((10 * n + j, base_us + j * 1_000_000, 1, "tiny", 2.5))
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, path)


@pytest.mark.parametrize("seed", [11, 23, 47, 83, 151])
def test_gini_grid_equals_anchor_on_random_corpus(spark, tmp_path, seed):
    _write_events(str(tmp_path / "events.parquet"), seed, 400)
    sf = str(tmp_path)
    grid = sorted(tuple(r) for r in revenue_gini_grid(spark, sf).collect())
    anchor = sorted(tuple(r) for r in revenue_gini(spark, sf).collect())
    assert grid == anchor
    # the adversarial corpus really has rank blocks: some type must
    # carry fewer distinct cents than rows
    by_type = {r[0]: r for r in anchor}
    assert any(r[1] > 25 for r in anchor), by_type  # n > distinct cents


@pytest.mark.parametrize("seed", [11, 23, 47, 83, 151])
def test_cohort_onepass_equals_anchor_on_random_corpus(
    spark, tmp_path, seed
):
    _write_events(str(tmp_path / "events.parquet"), seed, 400)
    sf = str(tmp_path)
    one = sorted(tuple(r) for r in user_cohorts_onepass(spark, sf).collect())
    anchor = sorted(
        tuple(r) for r in user_cohorts_setops(spark, sf).collect()
    )
    assert one == anchor
    assert anchor  # non-vacuous


@pytest.mark.parametrize("seed", [11, 23, 47, 83, 151])
def test_sharded_burstiness_equals_anchor_on_random_corpus(
    spark, tmp_path, seed
):
    _write_events(str(tmp_path / "events.parquet"), seed, 400)
    sf = str(tmp_path)
    tw = sorted(
        tuple(r) for r in interarrival_burstiness_sharded(spark, sf).collect()
    )
    anchor = sorted(
        tuple(r) for r in interarrival_burstiness(spark, sf).collect()
    )
    assert tw == anchor
    assert anchor  # non-vacuous
