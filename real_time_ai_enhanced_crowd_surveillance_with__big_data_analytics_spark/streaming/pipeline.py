"""The reference's full live loop in streaming form (SURVEY.md EP1 →
Spark): frame stream → detection parse → greedy NMS → per-frame person
count → crowd flag → alert sink.

NMS is a grouped-map pandas op, which Structured Streaming only admits
inside ``foreachBatch`` — each micro-batch is a bounded DataFrame, so
the batch NMS operator composes unchanged (batch/stream unification at
the operator level). Frames are assumed not to straddle micro-batches
(true for file-per-trigger replay; a camera feed partitions frames by
arrival). Were late detections possible, the count would move to a
watermarked windowed aggregate downstream of NMS.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.detections import parse_detections, synthesize_raw
from ..operators.nms import PERSON_IOU, nms

CROWD_THRESHOLD = 3  # reference main.py:232


def streaming_crowd_alerts(
    events_stream: DataFrame,
    on_batch: Callable[[DataFrame, int], None],
):
    """Wire the full pipeline onto an unbounded events stream; each
    micro-batch's crowded-frame rows go to ``on_batch``."""
    det = parse_detections(synthesize_raw(events_stream))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        kept = nms(batch_df, ["camera_id", "frame_id"], PERSON_IOU)
        crowded = (
            kept.groupBy("camera_id", "frame_id")
            .agg(F.count("*").alias("n_persons"))
            .withColumn("crowded", F.col("n_persons") > CROWD_THRESHOLD)
        )
        on_batch(crowded, batch_id)

    return det.writeStream.outputMode("append").foreachBatch(process).start()
