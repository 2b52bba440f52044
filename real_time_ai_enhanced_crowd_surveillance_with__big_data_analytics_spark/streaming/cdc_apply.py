"""Streaming CDC apply — maintain the compacted snapshot of
``plans/timeseries.py::cdc_upsert_compaction`` UNDER the changelog
stream, exactly-once across restarts: the lakehouse "MERGE INTO as a
continuous query" piece, pairing with the batch fold the way
``rollup.py`` pairs with ``state_merge_rollup``.

Pattern: ``foreachBatch`` → versioned snapshot directories +
an atomically-renamed manifest. Each micro-batch full-outer-joins the
current snapshot with the batch's per-key latest change and writes
snapshot v+1; the tiny JSON manifest (current version + last applied
batch id) is renamed into place only after the snapshot completes, so
a crash anywhere leaves the previous snapshot current and the retried
batch simply rewrites v+1 (idempotent). A replayed batch id is
skipped outright — exactly-once without a transactional format (the
ingest.py manifest discipline applied to row state).

Out-of-order correctness: rows carry ``last_version`` and a change
applies only if its version is NEWER (the standard CDC version guard),
and deletes are retained as TOMBSTONES rather than removed — a
late-arriving OLDER upsert after a delete must lose, which is only
decidable if the delete's version is still on disk. Under the guard,
sequential application converges to the one-shot batch compaction for
ANY partitioning of the changelog into micro-batches (the parity the
tests pin); :func:`read_state` filters tombstones and derives the
same public columns as the batch query.

At 100 TB each apply is one key equi-join (snapshot ⋈ batch-latest,
both hash-partitioned on the key — the MERGE shuffle shape); snapshot
turnover is the standard copy-on-write table cost, amortized by
micro-batch sizing, and old versions are pruned to a short tail.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.timeseries import CDC_DELETE_TYPE

KEEP_SNAPSHOTS = 2  # pruned tail of superseded snapshot versions

_MANIFEST = "MANIFEST.json"


def _read_manifest(out_dir: str) -> dict | None:
    path = os.path.join(out_dir, _MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def _write_manifest(out_dir: str, version: int, batch_id: int) -> None:
    tmp = os.path.join(out_dir, f"._manifest_tmp_{version}")
    with open(tmp, "w") as fh:
        json.dump({"version": version, "batch_id": batch_id}, fh)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))  # atomic


def _snap_dir(out_dir: str, version: int) -> str:
    return os.path.join(out_dir, f"snapshot_v{version}")


def init_state(base: DataFrame, out_dir: str) -> None:
    """Materialize snapshot v0 from the base table:
    ``base(bkey, c_acctbal)`` → the internal row-state schema."""
    os.makedirs(out_dir, exist_ok=True)
    (
        base.select(
            F.col("bkey").alias("custkey"),
            F.col("c_acctbal").cast("double").alias("cur_value"),
            F.lit(0).cast("long").alias("n_changes"),
            F.lit(-1).cast("long").alias("last_version"),
            F.lit(True).alias("in_base"),
            F.lit(False).alias("deleted"),
        ).write.mode("overwrite").parquet(_snap_dir(out_dir, 0))
    )
    _write_manifest(out_dir, 0, -1)


def apply_batch(spark: SparkSession, out_dir: str):
    """foreachBatch callable: merge one changelog micro-batch
    (user_id, event_id, event_type, value) into the snapshot."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        man = _read_manifest(out_dir)
        if man is None:
            raise ValueError(
                f"{out_dir} has no manifest — call init_state first"
            )
        if batch_id <= man["batch_id"]:
            return  # replayed batch after restart: already applied
        latest = (
            batch.groupBy(F.col("user_id").alias("ckey"))
            .agg(
                F.max(
                    F.struct("event_id", "event_type", "value")
                ).alias("last"),
                F.count(F.lit(1)).alias("bn"),
            )
            .select(
                "ckey",
                F.col("last.event_id").alias("bver"),
                (F.col("last.event_type") == CDC_DELETE_TYPE).alias(
                    "bdel"
                ),
                F.col("last.value").alias("bval"),
                "bn",
            )
        )
        snap = spark.read.parquet(_snap_dir(out_dir, man["version"]))
        newer = F.col("bver") > F.col("last_version")
        merged = (
            snap.join(latest, snap.custkey == latest.ckey, "full_outer")
            .select(
                F.coalesce("custkey", "ckey").alias("custkey"),
                F.when(
                    F.col("bver").isNotNull()
                    & (F.col("last_version").isNull() | newer)
                    & ~F.col("bdel"),
                    F.round(F.col("bval"), 2),
                )
                .otherwise(F.col("cur_value"))
                .alias("cur_value"),
                (
                    F.coalesce("n_changes", F.lit(0))
                    + F.coalesce("bn", F.lit(0))
                ).alias("n_changes"),
                F.greatest(
                    F.coalesce("last_version", F.lit(-1)),
                    F.coalesce("bver", F.lit(-1)),
                ).alias("last_version"),
                F.coalesce("in_base", F.lit(False)).alias("in_base"),
                F.when(
                    F.col("bver").isNotNull()
                    & (F.col("last_version").isNull() | newer),
                    F.col("bdel"),
                )
                .otherwise(F.coalesce("deleted", F.lit(False)))
                .alias("deleted"),
            )
        )
        nxt = man["version"] + 1
        merged.write.mode("overwrite").parquet(_snap_dir(out_dir, nxt))
        _write_manifest(out_dir, nxt, batch_id)  # the commit point
        # sweep EVERY superseded version outside the keep tail — a
        # crash between commit and prune would otherwise orphan that
        # round's stale snapshot forever (later applies only removed
        # their own nxt-KEEP)
        for entry in os.listdir(out_dir):
            if entry.startswith("snapshot_v") and entry[10:].isdigit():
                if int(entry[10:]) <= nxt - KEEP_SNAPSHOTS:
                    shutil.rmtree(
                        os.path.join(out_dir, entry), ignore_errors=True
                    )

    return apply


def read_state(spark: SparkSession, out_dir: str) -> DataFrame:
    """The public view of the maintained snapshot: tombstones filtered,
    same columns and semantics as the batch cdc_upsert_compaction
    query."""
    man = _read_manifest(out_dir)
    snap = spark.read.parquet(_snap_dir(out_dir, man["version"]))
    return snap.filter(~F.col("deleted")).select(
        "custkey",
        F.round("cur_value", 2).alias("cur_value"),
        F.when(F.col("n_changes") == 0, F.lit("unchanged"))
        .when(~F.col("in_base"), F.lit("inserted"))
        .otherwise(F.lit("updated"))
        .alias("status"),
        "n_changes",
        "last_version",
    )
