"""Storage-layout operators: row-group pruning audit + small-file
compaction — the ops loop that makes `zorder_key`'s promise
measurable instead of asserted.

At 100 TB, scan cost is decided before the first task runs: by which
row groups the parquet footers let the reader skip, and by whether the
listing is a million 2 MB files or ten thousand 200 MB ones. These
operators audit and fix exactly that:

- ``rowgroup_stats`` reads footer min/max per (file, row group) —
  distributed: files fan out over executors, each task opens only its
  own footers (metadata-sized I/O, never data pages).
- ``pruning_fraction`` replays a BETWEEN predicate against those
  stats: the fraction of row groups a reader may skip. Sorting or
  Z-ordering a table should move this number, and the test proves it
  does.
- ``compact_small_files`` rewrites a directory to size-targeted files
  via one repartition computed from the measured byte size — the
  maintenance job that keeps listing/open overhead off the scan path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rowgroup_stats(spark: SparkSession, path: str, column: str) -> DataFrame:
    """Per-(file, row_group) footer statistics for a numeric/comparable
    ``column``: (file, row_group, n_rows, cmin, cmax). Footer-only
    reads, distributed over the file listing."""
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(path)
        .select(F.col("path").alias("file"))
    )

    def read_footers(batches):
        from urllib.parse import unquote, urlparse

        import pyarrow.parquet as pq

        for pdf in batches:
            out = {"file": [], "row_group": [], "n_rows": [], "cmin": [], "cmax": []}
            for f in pdf["file"]:
                # binaryFile emits URIs; pyarrow wants a local path.
                # Parse properly (scheme + percent-decoding) instead of
                # string-stripping 'file:' — and reject remote schemes
                # loudly rather than handing pyarrow an s3:// string it
                # will misread as a relative local path.
                parsed = urlparse(f)
                if parsed.scheme in ("", "file"):
                    local = unquote(parsed.path) if parsed.scheme else f
                else:
                    raise ValueError(
                        f"rowgroup_stats reads footers via local pyarrow; "
                        f"unsupported scheme {parsed.scheme!r} in {f!r} "
                        "(for object stores, mount or use a pyarrow "
                        "filesystem-aware variant)"
                    )
                meta = pq.ParquetFile(local).metadata
                # a schema-only part file (empty write) has zero row
                # groups — nothing to audit, not an error
                if meta.num_row_groups == 0:
                    continue
                names = {
                    meta.row_group(0).column(i).path_in_schema: i
                    for i in range(meta.num_columns)
                }
                if column not in names:
                    raise KeyError(
                        f"column {column!r} not in parquet schema of "
                        f"{f!r}; footer columns: {sorted(names)}"
                    )
                ci = names[column]
                for g in range(meta.num_row_groups):
                    st = meta.row_group(g).column(ci).statistics
                    # writers may omit stats; surface the group with
                    # NULL bounds — consumers must treat it unprunable,
                    # never skip it
                    has = st is not None and st.has_min_max
                    out["file"].append(f)
                    out["row_group"].append(g)
                    out["n_rows"].append(meta.row_group(g).num_rows)
                    out["cmin"].append(float(st.min) if has else None)
                    out["cmax"].append(float(st.max) if has else None)
            yield pd.DataFrame(out)

    return files.mapInPandas(
        read_footers,
        schema="file string, row_group int, n_rows long, cmin double, cmax double",
    )


def pruning_fraction(stats: DataFrame, lo: float, hi: float) -> dict:
    """Replay ``column BETWEEN lo AND hi`` against footer stats: a row
    group is skippable iff its [cmin, cmax] misses [lo, hi]; groups
    with NULL bounds (stats omitted by the writer) are unprunable by
    definition, and the NULL-safe predicate below leaves them unskipped.
    Returns {groups, skippable, frac_groups_skipped, frac_rows_skipped}
    (zero fractions for an empty stats relation)."""
    skip = ((F.col("cmax") < lo) | (F.col("cmin") > hi)) & F.col(
        "cmin"
    ).isNotNull()
    row = stats.agg(
        F.count(F.lit(1)).alias("groups"),
        F.sum("n_rows").alias("rows"),
        F.sum(F.when(skip, 1).otherwise(0)).alias("skippable"),
        F.sum(F.when(skip, F.col("n_rows")).otherwise(0)).alias("rows_skipped"),
    ).first()
    if not row["groups"]:
        return {
            "groups": 0,
            "skippable": 0,
            "frac_groups_skipped": 0.0,
            "frac_rows_skipped": 0.0,
        }
    return {
        "groups": row["groups"],
        "skippable": row["skippable"],
        "frac_groups_skipped": row["skippable"] / row["groups"],
        "frac_rows_skipped": row["rows_skipped"] / row["rows"] if row["rows"] else 0.0,
    }


def compact_small_files(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite ``src`` parquet into ceil(total_bytes / target) files at
    ``dst``; returns the output file count. The partition count derives
    from the MEASURED input size (footer-free listing), not a constant
    — the same sizing rule a table-maintenance service applies; row
    content is preserved bit-for-bit (plain round-robin repartition,
    no shuffle key to skew)."""
    listing = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(src)
        .agg(F.sum("length").alias("bytes"))
        .first()
    )
    if listing["bytes"] is None:
        raise ValueError(f"no parquet files under {src!r}")
    n_out = max(1, -(-int(listing["bytes"]) // target_bytes))
    spark.read.parquet(src).repartition(n_out).write.mode("overwrite").parquet(dst)
    out = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(dst)
        .count()
    )
    return out
