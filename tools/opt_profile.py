"""Optimization-round profiler: for each named query, dump the
formatted physical plan to ``plans/$SPARK_GRAFT_PLANS_ROUND/<name>_<tag>.txt``
(round defaults to r10) and time the
noop-sink execution (N warm iterations, min kept — same methodology as
bench.py's re-run pass).

Usage::

    python tools/opt_profile.py <tag> <query> [query ...] [--iters N]
    python tools/opt_profile.py before label_propagation neardup_pagerank
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark import (  # noqa: E402
    get_spark,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans import (  # noqa: E402
    QUERIES,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r10"),
)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    iters = 2
    if "--iters" in args:
        i = args.index("--iters")
        iters = int(args[i + 1])
        del args[i : i + 2]
    tag, names = args[0], args[1:]
    spark = get_spark("opt_profile")
    spark.range(1000).selectExpr("sum(id)").collect()
    os.makedirs(OUT_DIR, exist_ok=True)
    results = {}
    import gc

    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        buf = io.StringIO()
        df = QUERIES[name](spark, SF_DIR)
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        # drop the explain frame's localCheckpoint blocks before timing
        del df
        spark.catalog.clearCache()
        gc.collect()
        time.sleep(0.2)
        times = []
        for _ in range(iters):
            t0 = time.time()
            QUERIES[name](spark, SF_DIR).write.mode("overwrite").format(
                "noop"
            ).save()
            times.append(round(time.time() - t0, 3))
            # bench.py parity: clear caches/checkpoints BETWEEN runs
            spark.catalog.clearCache()
            gc.collect()
            time.sleep(0.2)
        results[name] = {"min": min(times), "all": times}
        print(f"{name:40s} min={min(times):7.3f}  {times}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
