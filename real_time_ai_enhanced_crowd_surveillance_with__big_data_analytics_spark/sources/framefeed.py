"""Deterministic camera frame-feed as a Spark 4 Python STREAMING
DataSource (SURVEY.md S1).

The reference's input is an imperative webcam loop (``while True: ret,
frame = cv2.VideoCapture(...).read()``, main.py:143-150) — state that
lives in one process and dies with it. This re-expresses the feed as a
replayable streaming SOURCE with real offset semantics: the engine
asks for ``latestOffset``, plans rowid-sliced partitions per
micro-batch, and checkpoint restart resumes from the committed offset
with no loss or re-emission — the property the reference's loop
fundamentally cannot have.

Frames are a pure function of the global frame index (camera id,
event time, and a synthetic detection score all derive from it), so
any (start, end] range re-reads identically — the requirement for
exactly-once replay after failure.

Options: ``cameras`` (key count), ``framesPerBatch`` (offset advance
per trigger), ``maxFrames`` (cap so tests drain), ``startTs`` (epoch
seconds of frame 0), ``fps``.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

FRAME_SCHEMA = StructType(
    [
        StructField("camera_id", LongType(), False),
        StructField("frame_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("score", DoubleType(), False),
    ]
)

_MOD = 1_000_003  # deterministic pseudo-score base


def frame_row(i: int, cameras: int, start_ts: float, fps: float) -> tuple:
    """Frame index → row; pure and stable across processes."""
    import datetime as dt

    score = ((i * 2654435761) % _MOD) / _MOD
    return (
        i % cameras,
        i,
        dt.datetime.fromtimestamp(start_ts + i / fps, dt.timezone.utc).replace(
            tzinfo=None
        ),
        round(score, 6),
    )


class _FrameRange(InputPartition):
    def __init__(self, start: int, end: int, cameras: int, start_ts: float,
                 fps: float):
        self.start, self.end = start, end
        self.cameras, self.start_ts, self.fps = cameras, start_ts, fps


class FrameFeedStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.cameras = int(options.get("cameras", 4))
        self.per_batch = int(options.get("framesperbatch", 32))
        self.max_frames = int(options.get("maxframes", 1 << 40))
        self.start_ts = float(options.get("startts", 1704067200.0))
        self.fps = float(options.get("fps", 30.0))
        self.n_parts = int(options.get("numpartitions", 4))
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"frame": 0}

    def latestOffset(self) -> dict:
        # each trigger exposes one more batch of frames (bounded by the
        # cap); monotone regardless of restarts because planning always
        # restarts from the committed checkpoint offset
        self._latest = min(self._latest + self.per_batch, self.max_frames)
        return {"frame": self._latest}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["frame"], end["frame"]
        # planning may resume past this reader's local counter after a
        # checkpoint restart — trust the engine's offsets, they are the
        # durable truth
        self._latest = max(self._latest, hi)
        n = max(1, min(self.n_parts, hi - lo))
        step = (hi - lo + n - 1) // n if hi > lo else 1
        return [
            _FrameRange(
                lo + i * step,
                min(hi, lo + (i + 1) * step),
                self.cameras,
                self.start_ts,
                self.fps,
            )
            for i in range(n)
            if lo + i * step < hi
        ] or [_FrameRange(lo, lo, self.cameras, self.start_ts, self.fps)]

    def read(self, partition: _FrameRange) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield frame_row(
                i, partition.cameras, partition.start_ts, partition.fps
            )

    def commit(self, end: dict) -> None:
        pass  # nothing external to clean up — frames are synthesized

    def stop(self) -> None:
        pass


class FrameFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "framefeed"

    def schema(self) -> StructType:
        return FRAME_SCHEMA

    def streamReader(self, schema: StructType) -> FrameFeedStreamReader:
        return FrameFeedStreamReader(dict(self.options))


def register_framefeed_source(spark) -> None:
    spark.dataSource.register(FrameFeedDataSource)
