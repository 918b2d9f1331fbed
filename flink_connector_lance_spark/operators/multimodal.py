"""Multimodal (binary) column plumbing.

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, processed through Arrow-batched ``mapInPandas`` — the Spark-side
schema, partitioning, UDF signature and batch shapes are real and tested.
``decode_image`` soft-imports PIL: with Pillow installed it runs a real
decode (grayscale-resize intensity features); without it (this container)
it raises ``NotImplementedError`` unless ``fake=True``, which substitutes
a deterministic md5-derived feature vector so the pipeline shape is
exercisable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("payload", BinaryType(), True),
    StructField("mime", StringType(), True),
    StructField("byte_len", LongType(), True),
    StructField("digest", StringType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("byte_len", LongType(), True),
    StructField("digest", StringType(), True),
    # double (not float32): feature values must round-trip exactly through
    # Arrow/python so oracle comparison is bit-stable
    StructField("features", ArrayType(DoubleType()), True),
])


def to_media_table(df: DataFrame, id_col: str, payload_col, mime: str = "application/octet-stream") -> DataFrame:
    """Wrap an arbitrary binary column as a typed media table with metadata.

    Metadata (length + sha256) is computed JVM-side — no Python in the
    scan path; only the (stubbed) decode step pays the Arrow hop."""
    payload = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.lit(mime).alias("mime"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.sha2(payload, 256).alias("digest"),
    )


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: md5-seeded values."""
    h = hashlib.md5(payload).digest()
    return [round(((h[i % 16] << 8 | h[(i + 1) % 16]) % 1000) / 1000.0, 6) for i in range(dim)]


def _pil_features(payload: bytes, dim: int) -> list[float]:
    """Real image decode behind the soft import: grayscale-resize to a
    dim-pixel strip and return its normalized intensities — a
    deterministic, library-backed feature vector (not a learned
    embedding; the plumbing contract is the same either way)."""
    import io

    from PIL import Image  # soft import — caller verified availability

    with Image.open(io.BytesIO(payload)) as img:
        strip = img.convert("L").resize((dim, 1))
        return [round(px / 255.0, 6) for px in strip.getdata()]


def have_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(payload: bytes, fake: bool = False, dim: int = 8) -> list[float]:
    """Decode one image payload into a dim-float feature vector.

    Soft-imports PIL: when Pillow is installed, the REAL decode runs
    (grayscale-resize intensities). Without it, ``fake=True`` substitutes
    the deterministic md5 stub (pipeline-shape testing); ``fake=False``
    refuses loudly naming the missing library."""
    if not fake:
        if have_pil():
            return _pil_features(payload, dim)
        raise NotImplementedError(
            "image decoding requires Pillow (PIL), which is not present "
            "in this environment; pip install pillow for real decodes or "
            "pass fake=True for the deterministic test stub"
        )
    return _fake_features(payload, dim)


def extract_features(media_df: DataFrame, dim: int = 8, fake: bool = True,
                     batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` keeps the transfer columnar (one Arrow batch per
    ~batch_hint rows); at scale this is the canonical shape for any
    Python-side media op: payload-only projection in, fixed-width
    feature vectors out."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [
                decode_image(p, fake=fake, dim=dim) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "byte_len": pdf["byte_len"],
                "digest": pdf["digest"],
                "features": feats,
            })

    return media_df.select("media_id", "payload", "byte_len", "digest").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(media_df: DataFrame, every_n: int = 10,
                      bytes_per_frame: int = 4096) -> DataFrame:
    """Video frame-sampling *plan* shape: one row per sampled frame index.

    The decode itself is stubbed; the explode/partition arithmetic —
    which is the part Spark owns — is real: frames =
    byte_len/bytes_per_frame heuristic, sampled every ``every_n``."""
    n_frames = F.greatest((F.col("byte_len") / bytes_per_frame).cast("long"), F.lit(1))
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return media_df.select("media_id", F.explode(idx).alias("frame_idx"))
