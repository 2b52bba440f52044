"""Round-10 measurement harness: time a named set of queries with the
bench's own methodology (noop sink, clearCache+gc between runs), plus a
per-stage breakdown of the shared dedup substrate, so optimization
claims rest on numbers rather than plan aesthetics.

Usage: python tools/profile_family.py q1 q2 ... [--reps N]
"""

from __future__ import annotations

import gc
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


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    spark.range(1000).selectExpr("sum(id)").collect()
    out: dict[str, list[float]] = {}
    for name in args:
        times = []
        for _ in range(reps):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
            time.sleep(0.2)
        out[name] = times
        print(f"{name}: {times} min={min(times)}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
