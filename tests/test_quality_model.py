"""Model-based quality classifier (operators/quality.py): deterministic
training on a labeled seed set, zero-shuffle JVM scoring, and exact
agreement between the fit-time numpy math and the Spark scoring
expression — the contract that lets a fitted model ride the same
oracle-gated expression as the fixed demo model."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from flink_connector_lance_spark.operators import quality as Q

_CLEAN = "the quick brown fox jumps over the lazy dog near a quiet river"
_SPAM = "buy cheap pills now click here free winner casino jackpot bonus"


def _seed_df(spark, n_per_class=40):
    rows = []
    for i in range(n_per_class):
        rows.append((i, f"{_CLEAN} sample {i}", 1))
        rows.append((n_per_class + i, f"{_SPAM} offer {i}", 0))
    return spark.createDataFrame(rows, "id long, text string, label int")


def _py_bucket(tok: str, dim: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim


def _py_score(text: str, model: Q.QualityModel) -> float:
    ws = text.split(" ")
    total = sum(model.weights[_py_bucket(t, model.dim)] for t in ws)
    z = model.bias + (total / len(ws) if ws else 0.0)
    return 1.0 / (1.0 + math.exp(-z))


def test_fit_separates_and_is_deterministic(spark):
    df = _seed_df(spark)
    m1 = Q.fit_quality_classifier(df, "text", "label", "id", dim=64)
    m2 = Q.fit_quality_classifier(df, "text", "label", "id", dim=64)
    assert m1 == m2  # bitwise-identical refit (zero init, full batch)
    scored = Q.score_quality(df, "text", m1).select("label", "model_quality")
    correct = scored.filter(
        ((F.col("model_quality") >= 0.5) & (F.col("label") == 1))
        | ((F.col("model_quality") < 0.5) & (F.col("label") == 0))
    ).count()
    assert correct / scored.count() >= 0.95


def test_spark_score_matches_fit_time_math(spark):
    # the scoring expression must reproduce the training-side math
    # exactly (same bucket hash, same frequency normalization) or a
    # fitted threshold means nothing at scoring time
    df = _seed_df(spark, n_per_class=5)
    model = Q.fit_quality_classifier(df, "text", "label", "id", dim=32)
    got = {r["id"]: r["model_quality"]
           for r in Q.score_quality(df, "text", model).collect()}
    for r in df.collect():
        assert got[r["id"]] == pytest.approx(_py_score(r["text"], model), abs=1e-12)


def test_demo_model_matches_python_reference(spark):
    model = Q.demo_model(dim=32)
    df = spark.createDataFrame([(0, _CLEAN)], "id long, text string")
    got = Q.score_quality(df, "text", model).first()["model_quality"]
    assert got == pytest.approx(_py_score(_CLEAN, model), abs=1e-12)


def test_scoring_is_zero_shuffle_projection(spark, sf_dir):
    from flink_connector_lance_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    plan = Q.score_quality(d, "text", Q.demo_model()) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_large_dim_routes_agree(spark):
    """dim > MAX_INLINE_DIM switches scoring to the Arrow-batched pandas
    fallback; on a shared dim-512 model it must reproduce the inline JVM
    route (forced via max_inline_dim) to the last ulp — the sequential
    left-fold in _model_quality_pandas mirrors F.aggregate's fold, so
    only libm-vs-Math.exp sigmoid rounding may differ."""
    model = Q.demo_model(dim=512)
    assert model.dim > Q.MAX_INLINE_DIM
    rows = [(i, f"{_CLEAN} {_SPAM} doc {i} tok{i % 97}") for i in range(60)]
    rows.append((60, None))  # null doc: both routes must score sigmoid(bias)
    df = spark.createDataFrame(rows, "id long, text string")
    inline = {r["id"]: r["model_quality"]
              for r in Q.score_quality(df, "text", model,
                                       max_inline_dim=1024).collect()}
    fallback = {r["id"]: r["model_quality"]
                for r in Q.score_quality(df, "text", model).collect()}
    assert set(inline) == set(fallback)
    for i in inline:
        assert fallback[i] == pytest.approx(inline[i], abs=1e-12), i
    assert inline[60] == pytest.approx(1.0 / (1.0 + math.exp(-model.bias)),
                                       abs=1e-12)
    # and against the python reference, per doc
    for r in df.filter("id < 60").collect():
        assert fallback[r["id"]] == pytest.approx(
            _py_score(r["text"], model), abs=1e-12)


def test_pandas_route_null_token_matches_jvm(spark):
    """A null element inside the token array: the JVM route propagates
    null (md5(null) poisons the aggregate fold); the pandas fallback
    must do the same rather than crash on None.encode."""
    model = Q.demo_model(dim=512)
    df = spark.createDataFrame(
        [(0, ["good", None, "doc"]), (1, ["clean", "doc"])],
        "id long, ts array<string>")
    got = {r["id"]: r["s"] for r in df.select(
        "id", Q.model_quality_of(F.col("ts"), model).alias("s")).collect()}
    jvm = {r["id"]: r["s"] for r in df.select(
        "id", Q.model_quality_of(F.col("ts"), model,
                                 max_inline_dim=1024).alias("s")).collect()}
    assert got[0] is None and jvm[0] is None
    assert got[1] == pytest.approx(jvm[1], abs=1e-12)


def test_fit_sorts_null_ids_safely(spark):
    """A null id in the seed set must not abort training (the
    determinism sort is None-safe)."""
    df = spark.createDataFrame(
        [(None, _CLEAN, 1), (1, _SPAM, 0), (2, _CLEAN, 1), (3, _SPAM, 0)],
        "id long, text string, label int")
    m = Q.fit_quality_classifier(df, "text", "label", "id", dim=16)
    assert m.dim == 16


def test_guards(spark):
    df = _seed_df(spark, n_per_class=3)
    with pytest.raises(ValueError, match="empty seed set"):
        Q.fit_quality_classifier(df.filter(F.lit(False)), "text", "label", "id")
    with pytest.raises(ValueError, match="max_train_rows"):
        Q.fit_quality_classifier(df, "text", "label", "id", max_train_rows=2)
    with pytest.raises(ValueError, match="dim must be positive"):
        Q.bucket_counts(df, "text", "id", dim=0)
    with pytest.raises(ValueError, match="weights length"):
        Q.QualityModel(dim=4, weights=(0.0,), bias=0.0)


def test_bucket_counts_sparse_and_complete(spark):
    df = _seed_df(spark, n_per_class=2)
    bc = Q.bucket_counts(df, "text", "id", dim=16).collect()
    per_doc = {}
    for r in bc:
        per_doc.setdefault(r["id"], 0)
        per_doc[r["id"]] += r["cnt"]
    for r in df.collect():
        assert per_doc[r["id"]] == len(r["text"].split(" "))
