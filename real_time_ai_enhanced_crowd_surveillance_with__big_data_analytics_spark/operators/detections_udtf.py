"""Python UDTF route for the detection parser (Spark 4
``pyspark.sql.functions.udtf``) — the literal shape of the reference's
per-row loop (main.py:105-122: walk raw rows, maybe emit a parsed
detection), exposed through Spark's table-function seam.

This exists for API-surface parity, not speed: the hot path stays the
whole-stage-codegen route in operators/detections.py::parse_detections
(array expressions, zero Python). The UDTF twin is the escape hatch
for parser logic that genuinely can't be a Column expression (e.g. a
variable-length decode loop emitting 0..N rows per record), and the
test pins its output identical to the codegen route so either can
serve.

Used via LATERAL join so source columns pass through:
``SELECT s.*, p.* FROM raw s, LATERAL parse_detections_udtf(...) p``.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from .detections import CONFIDENCE_THRESHOLD

_SIX_DP = Decimal("0.000001")


def _round_half_up6(x: float) -> float:
    """Match Spark's F.round exactly: Spark rounds HALF_UP on
    ``BigDecimal.valueOf(double)`` — the SHORTEST-roundtrip decimal
    string, not the exact binary expansion — and Python's ``repr``
    produces that same shortest string. Built-in round() half-to-even
    diverges on ties (0.1015625 → 0.101562 vs Spark's 0.101563), and
    ``Decimal(x)`` (exact binary) diverges the other way on values
    like 0.5156255 whose binary expansion falls just below the tie."""
    return float(Decimal(repr(x)).quantize(_SIX_DP, rounding=ROUND_HALF_UP))


@udtf(returnType="class_id int, confidence double, x int, y int, w int, h int")
class ParseDetectionsUDTF:
    """0-or-1 output rows per raw candidate: argmax class, confidence
    gate, center→corner integer box — same order and arithmetic as the
    reference loop (slice → argmax → threshold → box math)."""

    def eval(self, scores, cx, cy, bw, bh):  # noqa: D102
        if not scores:
            return
        best, class_id = scores[0], 0
        for i in range(1, len(scores)):  # first-max ties like np.argmax
            if scores[i] > best:
                best, class_id = scores[i], i
        if best <= CONFIDENCE_THRESHOLD:
            return
        yield (
            class_id,
            _round_half_up6(best),
            math.floor(cx - bw / 2),
            math.floor(cy - bh / 2),
            int(bw),
            int(bh),
        )


def parse_detections_via_udtf(spark: SparkSession, raw: DataFrame) -> DataFrame:
    """The UDTF route end-to-end: register, lateral-join, project to
    the parse_detections output schema."""
    spark.udtf.register("parse_detections_udtf", ParseDetectionsUDTF)
    raw.createOrReplaceTempView("_raw_detections")
    return spark.sql(
        """
        SELECT s.camera_id, s.frame_id, s.event_id,
               p.class_id, p.confidence, p.x, p.y, p.w, p.h
        FROM _raw_detections s,
             LATERAL parse_detections_udtf(s.scores, s.cx, s.cy, s.bw, s.bh) p
        """
    )
