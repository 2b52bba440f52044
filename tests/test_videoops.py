"""Scene-cut detection (operators/videoops.py): synthetic videos built
from real encoded frames (the zero-dep BMP/JPEG codecs) with known
scene boundaries — cuts must land exactly there, compression noise
must stay under the threshold, and the segmentation must reproduce
the planted scene spans."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.imagecodec import (
    encode_bmp,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.jpegcodec import (
    encode_jpeg,
)
from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark.operators.videoops import (
    gray_histogram,
    scene_cuts,
    scene_segments,
)


def _frame(level: int, jitter: int, seed: int) -> np.ndarray:
    """A frame around a brightness level with mild texture — consecutive
    same-scene frames differ by compression/noise only."""
    rng = np.random.RandomState(seed)
    base = np.full((24, 32, 3), level, dtype=np.int16)
    noise = rng.randint(-jitter, jitter + 1, size=base.shape)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def _video(encoder) -> tuple[list[tuple[int, int, bytes]], list[int]]:
    """Three scenes (dark / bright / mid) of 5 frames each; returns
    (video rows, expected cut frame indexes)."""
    rows = []
    idx = 0
    for level in (40, 200, 120):
        for _ in range(5):
            rows.append((1, idx, encoder(_frame(level, 6, idx))))
            idx += 1
    return rows, [5, 10]


@pytest.mark.parametrize(
    "encoder",
    [encode_bmp, lambda im: encode_jpeg(im, quality=85)],
    ids=["bmp", "jpeg-q85"],
)
def test_cuts_at_scene_boundaries_only(spark, encoder):
    rows, want_cuts = _video(encoder)
    frames = spark.createDataFrame(
        pd.DataFrame(rows, columns=["video_id", "frame_idx", "frame_png"])
    )
    out = {r.frame_idx: r for r in scene_cuts(frames).collect()}
    got_cuts = sorted(i for i, r in out.items() if r.is_cut)
    assert got_cuts == want_cuts
    assert out[0].hist_delta is None  # first frame: no predecessor
    # same-scene deltas stay well under threshold; cuts far above
    same = [r.hist_delta for i, r in out.items() if i not in (0, *want_cuts)]
    assert max(same) < 0.3
    cut_deltas = [out[i].hist_delta for i in want_cuts]
    assert min(cut_deltas) > 0.8


def test_scene_segments_reproduce_planted_spans(spark):
    rows, _ = _video(encode_bmp)
    frames = spark.createDataFrame(
        pd.DataFrame(rows, columns=["video_id", "frame_idx", "frame_png"])
    )
    segs = sorted(
        (r.scene_id, r.first_frame, r.last_frame, r.n_frames)
        for r in scene_segments(frames).collect()
    )
    assert segs == [(0, 0, 4, 5), (1, 5, 9, 5), (2, 10, 14, 5)]


def test_multiple_videos_partition_independence(spark):
    """Per-video windows: the first frame of EACH video is delta-null;
    cuts in one video never leak into another."""
    rows_a, _ = _video(encode_bmp)
    rows_b = [(2, i, encode_bmp(_frame(90, 6, 100 + i))) for i in range(6)]
    frames = spark.createDataFrame(
        pd.DataFrame(rows_a + rows_b, columns=["video_id", "frame_idx", "frame_png"])
    )
    out = scene_cuts(frames)
    firsts = out.filter(F.col("hist_delta").isNull()).collect()
    assert sorted((r.video_id, r.frame_idx) for r in firsts) == [(1, 0), (2, 0)]
    assert out.filter((F.col("video_id") == 2) & F.col("is_cut")).count() == 0


def test_histogram_is_normalized_and_stable():
    img = _frame(120, 6, 0)
    h = gray_histogram(img)
    assert len(h) == 16
    assert abs(sum(h) - 1.0) < 1e-6
    assert h == gray_histogram(img)  # deterministic
