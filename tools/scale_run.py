"""r10 scaling datapoint (VERDICT r9 #9): run the heavy queries on the
10x-amplified dataset (tools/make_scale_data.py — multi-file parquet,
so scans parallelize) at a given core count and print one JSON line.

The sf0.1 bench cannot measure parallelism: every query is 0.2-5 s and
overhead-bound, so 8-vs-32-core ratios read ~1 for everything. The
amplified corpus gives each heavy enough work to swamp fixed costs;
the committed artifact is SCALE_r10.json + SCALE.md rows.

Usage::

    SPARK_GRAFT_CPUS=32 python tools/scale_run.py /dev/shm/sf_amp10
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVIES = [
    "dedup_containment_prefix",
    "dedup_jaccard_prefix",
    "neardup_neighborhood_function",
    "kcore_decomposition",
    "dedup_ngram_jaccard_capped",
    "column_profile",
    "fk_integrity_audit",
    "spatial_two_hop_reach_approx",
    "dedup_cluster_sizes",
    "release_readiness",
]


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or HEAVIES
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark import (
        get_spark,
    )
    from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans import (
        QUERIES,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("scale_run")
    spark.range(1000).selectExpr("sum(id)").collect()
    out = {}
    for name in names:
        times = []
        for _ in range(2):
            gc.collect()
            spark.catalog.clearCache()
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            times.append(round(time.time() - t0, 3))
        out[name] = min(times)
        print(f"# {name}: {times}", file=sys.stderr, flush=True)
    print(json.dumps({"cpus": cpus, "sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
