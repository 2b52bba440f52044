"""Plan audit: dump the formatted physical plan of every registered
query and flag scale red-flags (SURVEY.md §4; the '.explain and
iterate' loop made repeatable).

Flags:
- CartesianProduct            unbounded cross join (broadcast NLJ with a
                              tiny build side is fine and NOT flagged)
- row-at-a-time PythonUDF     BatchEvalPython outside Arrow
- missing PushedFilters       a parquet scan with filters in the plan
                              but none pushed

Usage: python tools/explain_audit.py [query ...]
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark import (  # noqa: E402
    get_spark,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.plans import (  # noqa: E402
    QUERIES,
)

SF = "/root/testdata/sf0.01"


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("explain_audit")
    flagged = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, SF).explain("formatted")
        plan = buf.getvalue()
        flags = []
        if "CartesianProduct" in plan:
            flags.append("cartesian-product")
        if "BatchEvalPython" in plan:
            flags.append("row-at-a-time-python-udf")
        if "PushedFilters: []" in plan and "Filter (" in plan:
            flags.append("scan-without-pushdown")
        status = "FLAG " + ",".join(flags) if flags else "ok"
        print(f"  {name:32s} {status}")
        flagged += bool(flags)
    print("CLEAN" if not flagged else f"{flagged} queries flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
