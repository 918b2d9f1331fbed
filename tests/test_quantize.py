"""int8 embedding quantization (operators/quantize.py): numpy-verified
codes/scales, reconstruction error bound, storage shrinkage, and top-k
recall preservation through the KNN operator."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from flink_connector_lance_spark.evaluation import recall_at_k
from flink_connector_lance_spark.io import load_table
from flink_connector_lance_spark.operators.knn import knn
from flink_connector_lance_spark.operators.quantize import (
    INT8_MAX,
    dequantize_embeddings,
    quantize_embeddings,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_codes_and_scale_match_numpy(spark, emb):
    q = quantize_embeddings(emb, "embedding", keep_vector=True)
    rows = q.orderBy("vec_id").limit(20).collect()
    for r in rows:
        v = np.asarray(r.embedding, dtype=np.float64)
        mx = np.abs(v).max()
        scale = mx / INT8_MAX if mx > 0 else 1.0
        assert r.scale == pytest.approx(scale, rel=1e-12)
        exp = np.clip(np.round(v / scale), -INT8_MAX, INT8_MAX).astype(int)
        assert list(r.codes) == exp.tolist()


def test_reconstruction_error_bounded_by_half_scale(spark, emb):
    q = quantize_embeddings(emb, "embedding", keep_vector=True)
    d = dequantize_embeddings(q, vector_col="recon", keep_codes=True)
    err = d.select(
        F.array_max(
            F.zip_with("embedding", "recon", lambda a, b: F.abs(a.cast("double") - b))
        ).alias("maxerr"),
        F.col("scale"),
    )
    bad = err.filter(F.col("maxerr") > F.col("scale") * 0.5 + 1e-12).count()
    assert bad == 0


def test_zero_vector_roundtrips(spark):
    df = spark.createDataFrame([(0, [0.0] * 8)], "id bigint, embedding array<double>")
    q = quantize_embeddings(df, "embedding")
    r = q.collect()[0]
    assert r.scale == 1.0 and list(r.codes) == [0] * 8
    back = dequantize_embeddings(q).collect()[0]
    assert list(back.embedding) == [0.0] * 8


def test_codes_column_is_tinyint_and_smaller_on_disk(spark, emb, tmp_path):
    q = quantize_embeddings(emb, "embedding")
    assert dict(q.dtypes)["codes"] == "array<tinyint>"
    import os

    p_full = str(tmp_path / "full")
    p_q = str(tmp_path / "quant")
    emb.select(F.col("embedding").cast("array<float>").alias("embedding")).write.mode(
        "overwrite").parquet(p_full)
    q.select("codes", "scale").write.mode("overwrite").parquet(p_q)

    def size(p):
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(p) for f in fs if f.endswith(".parquet")
        )

    # int8 codes must be well under the float32 column's footprint
    assert size(p_q) < 0.55 * size(p_full)


def test_knn_recall_preserved_after_quantization(spark, emb):
    queries = [list(r.embedding) for r in emb.orderBy("vec_id").limit(5).collect()]
    recon = dequantize_embeddings(
        quantize_embeddings(emb, "embedding", keep_vector=False).select(
            "vec_id", "codes", "scale"
        ),
        vector_col="embedding",
    )
    recalls = []
    for qv in queries:
        exact = [r.vec_id for r in knn(emb, "embedding", qv, k=10, metric="cosine",
                                       tiebreak_cols=["vec_id"], round_digits=6)
                 .select("vec_id").collect()]
        approx = [r.vec_id for r in knn(recon, "embedding", qv, k=10, metric="cosine",
                                        tiebreak_cols=["vec_id"], round_digits=6)
                  .select("vec_id").collect()]
        recalls.append(recall_at_k(approx, exact))
    assert sum(recalls) / len(recalls) >= 0.9  # int8 is near-lossless for ranking
