"""Deduplication operators for training-data pipelines.

Four families, each shuffle-aware for 100 TB scale:

- exact:        hash-groupBy on a content digest (one shuffle on the
                digest; partial aggregation map-side).
- minhash_lsh:  shingle -> H minhash signatures -> banded LSH keys ->
                candidate pairs via equi-join on (band, key). The join is
                an equi-shuffle on band keys — candidates only, never the
                O(n^2) cross product.
- simhash:      per-doc 60-bit signature (no shuffle), then pair
                generation; at scale, pair via banding the signature into
                chunks (equi-join) rather than the all-pairs fallback.
- ngram_jaccard:shingle-explode + equi-join on shingle -> exact Jaccard
                on candidate pairs (classic inverted-index join).
- embedding:    cosine near-dup; all-pairs locally, LSH-bucketed at scale
                (see operators/ann.py for the bucketing primitive).

Hashing is md5-hex based so the DuckDB oracle can reproduce every
signature bit-for-bit (Spark murmur3 `hash()` has no DuckDB equivalent).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from . import text as T


def shingles_of(ws: Column, k: int = 3) -> Column:
    """Distinct word k-grams over an already-materialized token array.

    Pass an *attribute* (a real column), not the split expression —
    otherwise codegen re-splits the text for every element access and the
    operator degrades to O(tokens^2) per row."""
    n = F.size(ws)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(ws, (i + j + 1).cast("int")) for j in range(k)]),
    )
    return F.array_distinct(gram)


def with_shingles(df: DataFrame, text_col: str, id_col: str, k: int = 3,
                  out_col: str = "shingles") -> DataFrame:
    """(id, shingles) in two stacked projections: tokens materialize in the
    first, shingles in the second. Catalyst's CollapseProject keeps
    multiply-referenced non-cheap expressions un-inlined, so each is
    computed exactly once per row."""
    toks = df.select(F.col(id_col), T.tokens(text_col).alias("__ws"))
    return toks.select(F.col(id_col), shingles_of(F.col("__ws"), k).alias(out_col))


def shingles(text_col, k: int = 3) -> Column:
    """Expression form (single use only — see with_shingles for hot paths)."""
    return shingles_of(T.tokens(text_col), k)


def minhash_signature(shingle_col: Column, num_hashes: int = 16) -> list[Column]:
    """H independent min-hashes: min over shingles of md5(f"{h}~{shingle}").

    min() over the hex string is order-isomorphic to min over the integer
    hash value, and both engines compare ASCII hex identically."""

    def _salted(h: int):
        # closure, not a default arg: pyspark infers lambda arity and a
        # second parameter would be bound to the array index
        prefix = f"{h}~"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    return [
        F.array_min(F.transform(shingle_col, _salted(h))).alias(f"mh{h}")
        for h in range(num_hashes)
    ]


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep-lowest-id exact dedup by content digest."""
    return (
        df.groupBy(F.md5(F.col(content_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing >=1 LSH band.

    Plan shape: project signatures (no shuffle) -> explode to (band, key)
    rows -> equi-join on (band, key) -> distinct pairs. The only shuffles
    are the join on band keys and the final distinct — both on candidate
    volume, not corpus volume."""
    rows_per_band = num_hashes // bands
    sh = with_shingles(df, text_col, id_col, shingle_k)
    sig = sh.select(F.col(id_col), *minhash_signature(F.col("shingles"), num_hashes))
    band_structs = []
    for b in range(bands):
        parts = [F.col(f"mh{h}") for h in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_structs.append(F.struct(F.lit(b).alias("band"), F.md5(F.concat(*parts)).alias("key")))
    bands_df = sig.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = bands_df.alias("a")
    b_ = bands_df.alias("b")
    return (
        a.join(b_, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs from an inverted-index
    equi-join on shingles (never the cross product)."""
    sh = with_shingles(df, text_col, id_col, shingle_k).select(
        F.col(id_col),
        F.explode("shingles").alias("sh"),
        F.size("shingles").alias("n_sh"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = inter.withColumn(
        "jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6)
    )
    return jac.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 32,
    max_hamming: int = 6,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance.

    Local/test path: all-pairs on the (tiny) signature relation. Scale
    path (100 TB): band the signature into (max_hamming+1) chunks — by
    pigeonhole any pair within the radius shares an exact chunk — and
    equi-join on chunks; the all-pairs form here is the correctness
    baseline on the signature table only (n rows, not n^2 texts)."""
    hs = df.select(
        F.col(id_col),
        F.transform(T.tokens(text_col), lambda t: T.token_hash64(t)).alias("__hs"),
    )
    sig = hs.select(F.col(id_col), T.simhash_of(F.col("__hs"), bits).alias("sig"))
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    a = sig.repartition(n_parts, id_col).alias("a")
    b = sig.alias("b")
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(F.broadcast(b), F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_cosine_pairs(
    df: DataFrame,
    vector_col: str,
    id_col: str,
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding near-dup pairs with cosine similarity >= threshold.

    All-pairs with a<b locally; at 100 TB pre-bucket with
    operators.ann.lsh_signature and join bucket-to-bucket."""
    from ..functions import vector as V

    # parallelism of a broadcast nested-loop join == left-side partitions;
    # force an explicit count (exempt from AQE byte-based coalescing) so the
    # O(n^2/2) similarity arithmetic spreads across all cores
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    a = df.select(F.col(id_col).alias("id_a"), F.col(vector_col).alias("va")).repartition(n_parts, "id_a")
    b = df.select(F.col(id_col).alias("id_b"), F.col(vector_col).alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(
        F.zip_with(F.col("va").cast("array<double>"), F.col("vb").cast("array<double>"),
                   lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    na = V.norm(F.col("va"))
    nb = V.norm(F.col("vb"))
    sim = F.round(dot / (na * nb), 6)
    return pairs.select("id_a", "id_b", sim.alias("cosine")).filter(F.col("cosine") >= threshold)
