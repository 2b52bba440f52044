"""cdc_upsert_compaction: crafted-frame coverage of every MERGE path —
update (latest of several upserts wins), delete (latest op is the
delete type, including delete-after-upsert), unchanged passthrough,
INSERT (changelog key absent from the base — the one path the
synthetic sf tables cannot exercise, every user_id being a custkey),
and resurrection (upsert after an earlier delete). Oracle parity at
sf0.01 is the driver/check_oracle gate; this pins the op semantics.
"""

from __future__ import annotations

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.timeseries import (
    cdc_upsert_compaction,
    compact_changelog,
)


def _frames(spark):
    base = spark.createDataFrame(
        [(1, 100.0), (2, 200.0), (3, 300.0)], "bkey long, c_acctbal double"
    )
    changes = spark.createDataFrame(
        [
            # key 1: two upserts — the later version must win
            (1, 10, "click", 11.0),
            (1, 50, "view", 22.0),
            # key 2: upsert then delete — row must vanish
            (2, 11, "click", 33.0),
            (2, 51, "error", 0.0),
            # key 4: not in base — insert
            (4, 12, "signup", 44.0),
            # key 5: delete then upsert — resurrected as insert
            (5, 13, "error", 0.0),
            (5, 52, "click", 55.0),
            # key 6: not in base, only a delete — never appears
            (6, 14, "error", 0.0),
        ],
        "ckey long, event_id long, event_type string, value double",
    )
    return base, changes


def test_compact_changelog_all_merge_paths(spark):
    base, changes = _frames(spark)
    got = {
        r["custkey"]: (
            r["cur_value"],
            r["status"],
            r["n_changes"],
            r["last_version"],
        )
        for r in compact_changelog(base, changes).collect()
    }
    assert got == {
        1: (22.0, "updated", 2, 50),
        3: (300.0, "unchanged", 0, -1),
        4: (44.0, "inserted", 1, 12),
        5: (55.0, "inserted", 2, 52),
    }
    assert 2 not in got and 6 not in got


def test_compaction_is_idempotent(spark):
    """Feeding the compacted state back as the base with an empty
    changelog returns it unchanged — the property that makes the fold
    safe to re-run on an already-compacted snapshot."""
    base, changes = _frames(spark)
    state = compact_changelog(base, changes)
    rebase = state.selectExpr(
        "custkey AS bkey", "cur_value AS c_acctbal"
    )
    empty = changes.limit(0)
    again = {
        r["custkey"]: (r["cur_value"], r["status"])
        for r in compact_changelog(rebase, empty).collect()
    }
    assert again == {
        r["custkey"]: (r["cur_value"], "unchanged")
        for r in state.collect()
    }


def test_sf_compaction_matches_direct_counts(spark, sf_dir):
    out = cdc_upsert_compaction(spark, sf_dir).collect()
    statuses = {r["status"] for r in out}
    assert statuses <= {"updated", "unchanged", "inserted"}
    # every key is unique (it is a state table, not a log)
    keys = [r["custkey"] for r in out]
    assert len(keys) == len(set(keys))
    # unchanged rows carry no changelog trace
    for r in out:
        if r["status"] == "unchanged":
            assert r["n_changes"] == 0 and r["last_version"] == -1
        else:
            assert r["n_changes"] >= 1 and r["last_version"] >= 0


def test_deletions_audit_complements_compaction(spark, sf_dir):
    """The audit's key set is exactly the changed keys MISSING from the
    compacted snapshot — together the two relations partition the
    changelog's key space."""
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans.timeseries import (
        cdc_deletions_audit,
    )

    audited = {
        r["custkey"]: r for r in cdc_deletions_audit(spark, sf_dir).collect()
    }
    surviving = {
        r["custkey"]
        for r in cdc_upsert_compaction(spark, sf_dir).collect()
    }
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.sources.tables import (
        load_table,
    )

    changed = {
        r["user_id"]
        for r in load_table(spark, "events", sf_dir)
        .select("user_id")
        .distinct()
        .collect()
    }
    assert set(audited) == changed - surviving
    for r in audited.values():
        assert r["changes_before_delete"] >= 0
        assert r["deleted_at_version"] >= 0
