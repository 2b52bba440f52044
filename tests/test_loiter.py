"""Loitering episodes (plans/spatial.py::loiter_episodes): direct
gaps-and-islands recomputation, maximality of the runs, and duration
arithmetic."""

from __future__ import annotations

import duckdb

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.spatial import (
    LOITER_CELL,
    LOITER_MIN_OBS,
    WORLD,
    _MOD,
    _MULT,
    loiter_episodes,
)

SF = "/root/testdata/sf0.01"


def _zone(eid: int) -> tuple[int, int]:
    h = (eid * _MULT) % _MOD
    return (h % WORLD) // LOITER_CELL, ((h // WORLD) % WORLD) // LOITER_CELL


def test_episodes_match_direct_islands(spark):
    rows = loiter_episodes(spark, SF).collect()
    assert rows
    base = duckdb.sql(
        f"""SELECT user_id, event_id, epoch_us(ts) // 1000000,
                   strftime(ts, '%Y-%m-%d %H:%M:%S')
            FROM read_parquet('{SF}/events.parquet')
            ORDER BY user_id, ts, event_id"""
    ).fetchall()
    want = []
    run: list = []
    prev_user = prev_zone = None
    def flush():
        if run and len(run) >= LOITER_MIN_OBS:
            want.append(
                (
                    run[0][0],
                    *prev_zone,
                    len(run),
                    run[0][3],
                    run[-1][2] - run[0][2],
                )
            )
    for u, e, t_s, t_str in base:
        z = _zone(e)
        if u != prev_user or z != prev_zone:
            flush()
            run = []
        run.append((u, e, t_s, t_str))
        prev_user, prev_zone = u, z
    flush()
    got = sorted(
        (r["user_id"], r["zone_x"], r["zone_y"], r["n_obs"],
         r["dwell_start"], r["duration_s"])
        for r in rows
    )
    assert got == sorted(want)
    # maximality sanity: every direct run really is bounded by zone
    # changes, so no emitted episode can be extended
    assert all(n >= LOITER_MIN_OBS for _, _, _, n, _, _ in got)
