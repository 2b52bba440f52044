"""Batched model-inference surface (SURVEY.md §4.3, S2).

Reference: YOLO/CLIP weights load once at startup and score one frame
per call (main.py:26-44,71) — batch-of-1 is the anti-pattern to fix.
Spark mapping: ``pyspark.ml.functions.predict_batch_udf`` — the model
factory runs once per executor (the load-once semantics), batches are
Arrow-sized (``batch_size``), and the returned UDF is a plain column
expression usable in any plan.

Models are pluggable so tests inject a deterministic stub instead of
real weights (SURVEY.md §7.3 step 7); a real YOLO/CLIP factory drops in
unchanged where the libs exist.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

try:
    from pyspark.ml.functions import predict_batch_udf
    from pyspark.sql import types as T

    HAS_PREDICT_BATCH = True
except ImportError:  # pragma: no cover
    HAS_PREDICT_BATCH = False


def make_stub_scorer(n_classes: int = 10) -> Callable:
    """Deterministic stand-in 'model': maps a feature vector to class
    scores via fixed trigonometric projections. Shape-compatible with a
    real classifier head (batch float32 in, batch scores out)."""

    def predict(inputs: np.ndarray) -> np.ndarray:
        # inputs: (batch, dim) float; outputs (batch, n_classes)
        idx = np.arange(1, inputs.shape[1] + 1, dtype="float64")
        out = np.stack(
            [
                np.abs(np.sin(inputs.astype("float64") @ (idx * (k + 1)))) % 1.0
                for k in range(n_classes)
            ],
            axis=1,
        )
        return out

    return predict


def scores_udf(
    n_classes: int = 10,
    dim: int = 2,
    batch_size: int = 1024,
    factory: Callable | None = None,
):
    """predict_batch_udf wrapper: per-executor model cache + Arrow
    batching (the fix for the reference's batch-of-1 inference).
    Array (tensor) inputs require a declared shape — ``dim`` is the
    feature-vector length.

    ``factory`` is the pluggable model loader (runs ONCE per executor,
    must return a ``(batch, dim) -> (batch, n_classes)`` callable);
    default is the deterministic stub. A real YOLO/CLIP/torch factory
    drops in unchanged — tests/test_inference_torch.py proves the
    closure against an actual ``torch.nn`` module where torch exists.
    """
    if not HAS_PREDICT_BATCH:  # pragma: no cover
        raise ImportError("pyspark.ml not available")

    if factory is None:
        def factory():
            return make_stub_scorer(n_classes)

    return predict_batch_udf(
        factory,
        return_type=T.ArrayType(T.DoubleType()),
        batch_size=batch_size,
        input_tensor_shapes=[[dim]],
    )
