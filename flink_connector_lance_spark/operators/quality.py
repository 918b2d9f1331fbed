"""Model-based quality scoring: a fasttext-style linear classifier over
hashed bag-of-token features — the learned quality filter every LLM
pre-training pipeline runs after the heuristic ones (GPT-3 / LLaMA /
CCNet-style "does this look like the reference corpus" scoring).

The reference connector has no model surface (it is an IO connector);
this is beyond-reference training-pipeline capability, a sibling of
operators.text.quality_score (the heuristic twin).

Scale design (the asymmetry is the whole point):
- TRAINING runs on a labeled *seed set* (thousands of docs: e.g.
  wiki=positive vs raw-crawl=negative) — small by construction. We
  densify the seed set's hashed features and fit with deterministic
  full-batch gradient descent on the driver. The collect is bounded by
  ``max_train_rows`` so a mislabeled 100 TB corpus cannot OOM the
  driver; featurization itself is distributed.
- SCORING is the 100 TB path: one zero-shuffle JVM projection per
  document (token -> md5 bucket -> literal-array weight lookup ->
  sigmoid). No Python in the loop, no shuffle, no model broadcast —
  the weights ride inside the expression tree.

The md5 bucket hash (operators.text.token_hash32 % dim) is mirrored
exactly by DuckDB (queries/pipeline._H32), so scoring is oracle-gated
like every other operator.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import token_hash32, tokens


@dataclass(frozen=True)
class QualityModel:
    """A fitted linear quality classifier: ``sigmoid(bias + sum over
    tokens of weights[md5_32(token) % dim])``."""

    dim: int
    weights: tuple
    bias: float

    def __post_init__(self):
        if len(self.weights) != self.dim:
            raise ValueError(
                f"weights length {len(self.weights)} != dim {self.dim}")


def token_bucket(tok: Column, dim: int) -> Column:
    """Deterministic feature bucket of one token: md5-derived 32-bit hash
    mod ``dim`` (mirrored in SQL as ``('0x'||substr(md5(t),1,8))::BIGINT
    % dim``)."""
    return (token_hash32(tok) % F.lit(dim)).cast("int")


def bucket_counts(df: DataFrame, text_col: str, id_col: str,
                  dim: int = 64) -> DataFrame:
    """Distributed hashed featurization: ``(id, bucket, cnt)`` — one
    explode + partial+final count per document. Sparse by construction
    (<= tokens-per-doc rows per document), so the shuffle carries
    feature triples, never texts."""
    if dim <= 0:
        raise ValueError("dim must be positive")
    ws = tokens(text_col)
    return (
        df.select(F.col(id_col), F.explode(ws).alias("__tok"))
        .select(id_col, token_bucket(F.col("__tok"), dim).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def fit_quality_classifier(
    df: DataFrame,
    text_col: str,
    label_col: str,
    id_col: str,
    dim: int = 64,
    lr: float = 0.5,
    iterations: int = 300,
    l2: float = 1e-3,
    max_train_rows: int = 100_000,
) -> QualityModel:
    """Fit the classifier on a labeled seed set (``label_col`` in {0,1}).

    Featurization (explode + count) is distributed; the dense seed-set
    feature matrix is then collected — guarded by ``max_train_rows``
    because seed sets are small by construction (label acquisition, not
    compute, is the bottleneck). Optimization is deterministic full-batch
    gradient descent from zero init: same data -> bitwise-same model,
    which the scoring gate depends on.
    """
    import numpy as np

    n_docs = df.count()
    if n_docs == 0:
        raise ValueError("cannot fit on an empty seed set")
    if n_docs > max_train_rows:
        raise ValueError(
            f"seed set has {n_docs} rows > max_train_rows={max_train_rows}; "
            "quality classifiers train on small labeled seed sets — "
            "sample first (operators.sampling) or raise the guard")
    feats = bucket_counts(df, text_col, id_col, dim)
    labels = df.select(F.col(id_col), F.col(label_col).cast("double").alias("__y"))
    rows = (
        feats.groupBy(id_col)
        .agg(F.map_from_arrays(F.collect_list("bucket"),
                               F.collect_list("cnt")).alias("__f"))
        .join(labels, on=id_col, how="right")
        .select(id_col, "__f", "__y")
        .collect()
    )
    # collect() order after the groupBy+join shuffle depends on the
    # partitioning config; the float gradient sums (X.T @ g) depend on
    # row order — sort by id so "same data -> bitwise-same model" holds
    # across shuffle-partition counts and cluster layouts
    rows.sort(key=lambda r: (r[id_col] is None, r[id_col]))
    X = np.zeros((len(rows), dim))
    y = np.zeros(len(rows))
    for i, r in enumerate(rows):
        y[i] = r["__y"]
        for b, c in (r["__f"] or {}).items():
            X[i, b] = float(c)
    # normalize counts to frequencies so long docs don't dominate
    norms = X.sum(axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    X = X / norms
    w = np.zeros(dim)
    b = 0.0
    for _ in range(iterations):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g / len(rows) + l2 * w)
        b -= lr * float(g.mean())
    return QualityModel(dim=dim, weights=tuple(float(v) for v in w), bias=float(b))


# Literal-array scoring inlines ``dim`` double literals into the
# expression tree; past a few hundred that stresses janino/codegen the
# same way unbounded histogram bins would (sources/rollup._MAX_HIST_BINS
# is the sibling guard). Above the cap, scoring falls back to an
# Arrow-batched pandas UDF with the weights shipped once per task in the
# closure — same math, same hash, still no shuffle.
MAX_INLINE_DIM = 256


def model_quality_of(ts: Column, model: QualityModel,
                     max_inline_dim: int = MAX_INLINE_DIM) -> Column:
    """Scoring expression over a materialized token array.

    ``dim <= max_inline_dim``: pure JVM projection, weights inlined as
    an array literal (no broadcast, no shuffle, no Python). Token counts
    are frequency-normalized exactly as in training.

    ``dim > max_inline_dim``: a real fasttext-style classifier carries
    1e5-1e6 buckets — far past what a literal array in the expression
    tree can hold — so scoring switches to an Arrow-batched pandas UDF
    over the same token array (weights as a numpy closure, one md5 per
    DISTINCT token per batch). The fallback sums weights in the same
    left-to-right token order as the JVM ``F.aggregate`` fold, so the
    two routes agree to the last ulp (any residual difference is libm
    vs Java ``Math.exp`` rounding of the final sigmoid);
    ``tests/test_quality_model.py::test_large_dim_routes_agree`` pins
    them equal on a shared dim-512 model."""
    if model.dim <= max_inline_dim:
        from ..functions.vector import vec_literal

        # one constant-folded from_json parse instead of a py4j round
        # trip per weight (identical literal; see vec_literal)
        arr = vec_literal(model.weights)
        contribs = F.transform(
            ts, lambda t: F.element_at(arr, token_bucket(t, model.dim) + F.lit(1)))
        total = F.aggregate(contribs, F.lit(0.0), lambda a, v: a + v)
        n = F.size(ts)
        z = F.lit(float(model.bias)) + F.when(n > 0, total / n.cast("double")) \
            .otherwise(F.lit(0.0))
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return _model_quality_pandas(model)(ts)


def _model_quality_pandas(model: QualityModel):
    """Large-dim scoring route: pandas UDF with the weight vector as a
    numpy closure. Hash parity with token_bucket (first 8 md5 hex chars
    as a 32-bit int, mod dim); a per-batch distinct-token cache keeps
    the Python md5 cost at O(vocab-of-batch), not O(tokens). Weight
    contributions are summed with a sequential left-fold in token order
    — the exact float operator tree of the JVM route's ``F.aggregate``
    — and a null token propagates a null score, matching the JVM route
    (``md5(null)`` -> null poisons the fold)."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    w = np.asarray(model.weights, dtype=np.float64)
    dim, bias = model.dim, float(model.bias)

    @pandas_udf("double")
    def _score(ts_s):  # pandas Series of token lists
        import hashlib
        import math

        cache: dict = {}

        def bucket(tok: str) -> int:
            b = cache.get(tok)
            if b is None:
                b = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8],
                        16) % dim
                cache[tok] = b
            return b

        import pandas as pd

        out: list = [None] * len(ts_s)
        for i, toks in enumerate(ts_s):
            if toks is None or len(toks) == 0:
                z = bias
            else:
                # sequential left-fold in token order: bit-identical to
                # the JVM F.aggregate fold (np.sum pairwise-sums and can
                # differ in the last ulp); a None token poisons the fold
                # to null exactly like md5(null) does JVM-side
                total = 0.0
                for t in toks:
                    if t is None:
                        total = None
                        break
                    total += w[bucket(t)]
                if total is None:
                    continue
                z = bias + total / len(toks)
            out[i] = 1.0 / (1.0 + math.exp(-z))
        return pd.Series(pd.array(out, dtype="Float64"))

    return _score


def score_quality(df: DataFrame, text_col: str, model: QualityModel,
                  out_col: str = "model_quality",
                  max_inline_dim: int = MAX_INLINE_DIM) -> DataFrame:
    """Append the model score to every document — the 100 TB path: one
    zero-shuffle projection (JVM codegen below ``max_inline_dim``,
    Arrow-batched pandas above it)."""
    return df.withColumn(
        out_col, model_quality_of(tokens(text_col), model,
                                  max_inline_dim=max_inline_dim))


def demo_model(dim: int = 32) -> QualityModel:
    """A fixed deterministic model for gates/demos: weight of bucket b is
    ((b * 37 + 11) % 101 - 50) / 100 — reproducible in any engine without
    shipping a artifact file."""
    return QualityModel(
        dim=dim,
        weights=tuple(((b * 37 + 11) % 101 - 50) / 100.0 for b in range(dim)),
        bias=0.1,
    )


def model_quality_sql(ws_expr: str, model: QualityModel, h32_fmt: str) -> str:
    """The DuckDB mirror of model_quality_of: same literal weights
    (repr round-trip so both engines parse identical doubles), same
    md5 bucket hash, same frequency normalization and sigmoid."""
    warr = "[" + ", ".join(repr(float(w)) for w in model.weights) + "]"
    bucket = h32_fmt.format(x="t") + f" % {model.dim}"
    total = (f"COALESCE(list_sum(list_transform({ws_expr}, "
             f"t -> ({warr})[({bucket}) + 1])), 0.0)")
    z = (f"({repr(float(model.bias))} + CASE WHEN len({ws_expr}) > 0 THEN "
         f"{total} / CAST(len({ws_expr}) AS DOUBLE) ELSE 0.0 END)")
    return f"1.0 / (1.0 + exp(-{z}))"
