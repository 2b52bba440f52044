"""The reference's full live loop in streaming form (SURVEY.md EP1 →
Spark): frame stream → detection parse → greedy NMS → per-frame person
count → crowd flag → alert sink.

Greedy NMS needs ALL of a frame's boxes together, but a real stream
may deliver a frame's detections across micro-batches (retries,
multi-part uploads, shuffled replay). The operator is therefore
STATEFUL: ``applyInPandasWithState`` keyed by (camera_id, frame_id)
accumulates each frame's candidate boxes in the state store and
re-emits the frame's current NMS verdict every time new boxes arrive
(update semantics — the last emission per frame equals batch NMS over
the complete set, however arrivals were split). State per key is the
frame's candidate list — tens of boxes, O(frame), hash-partitioned by
the high-cardinality frame key; at 100 TB scale an event-time timeout
(watermark TTL) evicts completed frames, which is exactly the
reference's per-frame lifetime (main.py:188-233) made explicit.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.detections import parse_detections, synthesize_raw
from ..operators.nms import PERSON_IOU, nms_pandas

CROWD_THRESHOLD = 3  # reference main.py:232

_CROWD_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("camera_id", T.LongType(), False),
        T.StructField("frame_id", T.LongType(), False),
        T.StructField("n_persons", T.LongType(), False),
        T.StructField("crowded", T.BooleanType(), False),
    ]
)

# accumulated candidate boxes for one frame (parallel arrays)
_CROWD_STATE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.ArrayType(T.LongType()), True),
        T.StructField("confidence", T.ArrayType(T.DoubleType()), True),
        T.StructField("x", T.ArrayType(T.LongType()), True),
        T.StructField("y", T.ArrayType(T.LongType()), True),
        T.StructField("w", T.ArrayType(T.LongType()), True),
        T.StructField("h", T.ArrayType(T.LongType()), True),
    ]
)

_BOX_COLS = ("event_id", "confidence", "x", "y", "w", "h")


def _crowd_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    camera_id, frame_id = key
    acc: dict[str, list] = (
        dict(zip(_BOX_COLS, (list(v) for v in state.get)))
        if state.exists
        else {c: [] for c in _BOX_COLS}
    )
    for pdf in pdfs:
        for c in _BOX_COLS:
            acc[c].extend(pdf[c].tolist())
    state.update(tuple(acc[c] for c in _BOX_COLS))
    # canonical order: event_id (the batch twin's order_cols), then
    # nms_pandas' stable confidence sort — identical tie-breaks
    frame = pd.DataFrame(acc).sort_values("event_id", ignore_index=True)
    kept = nms_pandas(frame, PERSON_IOU)
    n = len(kept)
    yield pd.DataFrame(
        {
            "camera_id": [camera_id],
            "frame_id": [frame_id],
            "n_persons": [n],
            "crowded": [n > CROWD_THRESHOLD],
        }
    )


def streaming_crowd_alerts(
    events_stream: DataFrame,
    on_batch: Callable[[DataFrame, int], None],
):
    """Wire the full pipeline onto an unbounded events stream. Each
    micro-batch emits the CURRENT verdict for every frame that received
    boxes (update semantics); ``on_batch`` sinks them — a keyed upsert
    sink (or the test's dict) naturally keeps the latest."""
    det = parse_detections(synthesize_raw(events_stream))
    crowded = (
        det.select("camera_id", "frame_id", *(c for c in _BOX_COLS if c != "frame_id"))
        .groupBy("camera_id", "frame_id")
        .applyInPandasWithState(
            _crowd_fn,
            outputStructType=_CROWD_OUTPUT_SCHEMA,
            stateStructType=_CROWD_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return crowded.writeStream.outputMode("update").foreachBatch(on_batch).start()
