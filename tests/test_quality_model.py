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
