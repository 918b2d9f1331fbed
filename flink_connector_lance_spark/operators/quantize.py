"""Scalar (int8) embedding quantization: 4-8x storage compression for
vector columns, with measured recall preservation.

At 100 TB, the embedding column dominates storage (a 768-dim float32
vector is 3 KB/row — often larger than the text it embeds). Symmetric
per-vector int8 quantization (the standard scalar-quantization scheme
used by FAISS's SQ8 and Lance's scalar quantizer — public designs)
stores ``round(x / scale)`` with ``scale = max|x| / 127`` as
``array<tinyint>`` plus one float, cutting the column ~4x with
near-lossless cosine/L2 ranking (verified by
``tests/test_quantize.py`` via ``evaluation.recall_at_k``).

Everything is pure Catalyst column expressions — quantization is a
zero-shuffle projection, dequantization composes with every existing
distance/KNN operator (they cast to ``array<double>`` internally).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

INT8_MAX = 127


def quantize_scale_of(vector_col) -> Column:
    """Per-vector symmetric scale ``max|x| / 127``; all-zero vectors get
    scale 1.0 so their codes stay 0 without a divide-by-zero."""
    c = F.col(vector_col) if isinstance(vector_col, str) else vector_col
    mx = F.array_max(F.transform(c.cast("array<double>"), lambda x: F.abs(x)))
    return F.when(mx > 0, mx / F.lit(float(INT8_MAX))).otherwise(F.lit(1.0))


def quantize_codes_of(vector_col, scale_col) -> Column:
    """``round(x / scale)`` clamped to [-127, 127] as array<tinyint>."""
    c = F.col(vector_col) if isinstance(vector_col, str) else vector_col
    s = F.col(scale_col) if isinstance(scale_col, str) else scale_col
    return F.transform(
        c.cast("array<double>"),
        lambda x: F.greatest(
            F.lit(-INT8_MAX), F.least(F.lit(INT8_MAX), F.round(x / s, 0))
        ).cast("tinyint"),
    )


def dequantize_of(codes_col, scale_col) -> Column:
    """``code * scale`` back to array<double> — composes directly with
    the knn/distance operators (they cast to double arrays anyway)."""
    c = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    s = F.col(scale_col) if isinstance(scale_col, str) else scale_col
    return F.transform(c, lambda x: x.cast("double") * s)


def quantize_embeddings(
    df: DataFrame,
    vector_col: str,
    codes_col: str = "codes",
    scale_col: str = "scale",
    keep_vector: bool = False,
) -> DataFrame:
    """Replace (or augment) a vector column with its int8 codes + scale.

    Zero shuffle: one projection. With ``keep_vector=False`` (default)
    the float column is dropped — the compressed relation is what you
    persist; ``write_dataset`` stores tinyint arrays ~4x smaller than
    float32 (and ~8x smaller than the cast-to-double form).
    """
    out = df.withColumn(scale_col, quantize_scale_of(vector_col)).withColumn(
        codes_col, quantize_codes_of(vector_col, scale_col)
    )
    return out if keep_vector else out.drop(vector_col)


def dequantize_embeddings(
    df: DataFrame,
    codes_col: str = "codes",
    scale_col: str = "scale",
    vector_col: str = "embedding",
    keep_codes: bool = False,
) -> DataFrame:
    """Inverse projection: reconstruct an approximate float vector column
    from codes + scale (max abs error is scale/2 per component)."""
    out = df.withColumn(vector_col, dequantize_of(codes_col, scale_col))
    return out if keep_codes else out.drop(codes_col, scale_col)
