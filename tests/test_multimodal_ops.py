"""Multimodal plumbing unit tests: media-table metadata, the stubbed
decoder contract, and the frame-sampling plan arithmetic."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from flink_connector_lance_spark.operators import multimodal as M


@pytest.fixture()
def media(spark):
    df = spark.createDataFrame(
        [(1, b"a" * 4096 * 25), (2, b"b" * 4096 * 3), (3, b"c" * 100), (4, None)],
        ["mid", "payload"],
    )
    return M.to_media_table(df, "mid", "payload", mime="video/x-fake")


def test_media_table_metadata_jvm_side(media):
    rows = {r.media_id: r for r in media.collect()}
    assert rows[1].byte_len == 4096 * 25
    assert rows[3].digest == hashlib.sha256(b"c" * 100).hexdigest()
    assert rows[4].byte_len is None and rows[4].digest is None
    assert rows[2].mime == "video/x-fake"


def test_decode_stub_contract():
    if not M.have_pil():
        with pytest.raises(NotImplementedError, match="Pillow"):
            M.decode_image(b"payload")  # soft import: no PIL here
    feats = M.decode_image(b"payload", fake=True, dim=4)
    assert len(feats) == 4 and feats == M.decode_image(b"payload", fake=True, dim=4)


@pytest.mark.skipif(not __import__(
    "flink_connector_lance_spark.operators.multimodal",
    fromlist=["have_pil"]).have_pil(), reason="Pillow not installed")
def test_decode_real_pil_when_available():
    """The soft-import branch: with Pillow present, decode_image runs a
    REAL decode (grayscale-resize intensities in [0, 1])."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (16, 16), (255, 0, 0)).save(buf, format="PNG")
    feats = M.decode_image(buf.getvalue(), dim=4)
    assert len(feats) == 4 and all(0.0 <= v <= 1.0 for v in feats)


def test_frame_sample_plan_arithmetic(media):
    out = M.frame_sample_plan(media.filter(F.col("payload").isNotNull()), every_n=10)
    by_id = {}
    for r in out.collect():
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    # 25 frames sampled every 10 -> indices 0, 10, 20
    assert sorted(by_id[1]) == [0, 10, 20]
    # 3 frames -> only frame 0
    assert by_id[2] == [0]
    # sub-frame payload clamps to >= 1 frame
    assert by_id[3] == [0]


def test_frame_sample_is_pure_plan(spark, media):
    # no Python in the explode path: plan stays JVM-side (Generate node,
    # no Arrow eval / Python UDF nodes)
    plan = (
        M.frame_sample_plan(media)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Generate explode" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
