"""Approximate nearest-neighbor scale paths.

The reference delegates ANN to Lance's native IVF/PQ/HNSW indexes
(ref LanceIndexBuilder.java:117-179, LanceVectorSearch.java:146-163).
Without the native library we provide the two classic distributed ANN
strategies as pure DataFrame plans:

- ``lsh``: random-hyperplane signatures -> bucket equi-filter. Signature
  computation is a projection (no shuffle); candidate selection is a
  partition-local filter; only the candidate top-k merge crosses the
  wire. Multi-probe (hamming-1 buckets) trades recall for candidates.
- ``ivf_coarse``: coarse quantizer from per-label centroids (at scale:
  k-means centroids broadcast to executors), probe the nearest
  ``nprobes`` cells, exact search inside probed cells only.

Both mirror what Lance's IVF does conceptually: prune the search space
to a small number of cells, then exact-score the survivors.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions import vector as V


def make_planes(num_planes: int = 4, dim: int = 64, seed: int = 7) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (shared with oracles).

    Gaussian, not sinusoid: a sin-lattice plane is smooth across
    dimensions, which correlates with smooth structure in real embedding
    corpora — measured on the test corpus it collapsed 2000 vectors into
    16 of 256 buckets (max occupancy 147). i.i.d. Gaussian rows are the
    textbook choice for sign-random-projection LSH and spread the same
    corpus over 253 buckets (max 26). Values are rounded and embedded as
    literals on both the Spark and oracle sides, so determinism — not the
    distribution — is what correctness depends on. A fixed seed makes
    ``make_planes(4, d)`` a prefix of ``make_planes(8, d)``."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return [
        [round(float(x), 6) for x in rng.standard_normal(dim)]
        for _ in range(num_planes)
    ]


def auto_num_planes(
    n: int, target_bucket: int = 32, lo: int = 8, hi: int = 24
) -> int:
    """Signature width for an n-row corpus: enough planes that the
    expected bucket occupancy stays ~``target_bucket``.

    Bucketed candidate generation is O(sum over buckets of |bucket|^2) =
    O(n^2 / 2^P) under uniform spread — quadratic for any FIXED plane
    count. Growing P with log2(n / target) pins expected occupancy, so
    candidate volume stays ~n * target * (P + 1): linear-with-log in the
    corpus. This is the knob that makes the 100 TB path hold; callers
    with distribution knowledge can still pass explicit planes."""
    if n <= 0:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(max(n / target_bucket, 1.0)))))


def lsh_signature(vector_col, planes: Sequence[Sequence[float]]) -> Column:
    """Bit p of the signature = 1 iff dot(v, plane_p) > 0.

    Uses the compact HOF dot on purpose: one dot per plane in a single
    projection — unrolled chains here exceed janino's 64 KB method limit
    and drop the whole stage out of codegen (see functions.vector).

    For a string column the whole signature is assembled as ONE SQL parse:
    the per-plane Column loop costs ~12 py4j round trips per plane
    (~0.45 s of driver time at 8 planes), the parse costs one. The SQL
    form is the same expression tree — CAST(col AS ARRAY<DOUBLE>),
    from_json plane literal (constant-folded), identical zip_with /
    aggregate lambdas — so the per-row evaluation and results are
    unchanged."""
    import json as _json

    if isinstance(vector_col, str):
        dots = " + ".join(
            "(CASE WHEN aggregate(zip_with(CAST(`{c}` AS ARRAY<DOUBLE>), "
            "from_json('{js}', 'array<double>'), (x, y) -> x * y), 0.0D, "
            "(acc, v) -> acc + v) > 0 THEN CAST({bit} AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END)".format(
                c=vector_col,
                js=_json.dumps([float(v) for v in plane], allow_nan=False),
                bit=1 << p)
            for p, plane in enumerate(planes)
        )
        return F.expr(f"CAST(0 AS BIGINT) + {dots}")
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        dot = V.dot_product_hof(vector_col, plane)
        sig = sig + F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def query_signature(q: Sequence[float], planes: Sequence[Sequence[float]]) -> int:
    sig = 0
    for p, plane in enumerate(planes):
        if sum(x * y for x, y in zip(q, plane)) > 0:
            sig |= 1 << p
    return sig


def probe_signatures(q: Sequence[float], planes: Sequence[Sequence[float]],
                     multiprobe: bool = True, nprobes: int | None = None) -> list[int]:
    """Query bucket + (optionally) all hamming-1 neighbor buckets.

    ``nprobes`` caps how many buckets are probed (ref vector.nprobes,
    config/LanceOptions.java:215-219, threaded into every native query at
    LanceVectorSearch.java:146-163): the exact bucket first, then ham-1
    neighbors in plane order — fewer probes = fewer candidates = faster,
    lower recall."""
    qs = query_signature(q, planes)
    out = [qs]
    if multiprobe:
        out += [qs ^ (1 << p) for p in range(len(planes))]
    deduped = list(dict.fromkeys(out))  # preserve probe priority order
    if nprobes is not None:
        if nprobes <= 0:
            raise ValueError("nprobes must be positive")
        deduped = deduped[:nprobes]
    return deduped


def lsh_candidates(
    df: DataFrame,
    vector_col: str,
    query: Sequence[float],
    planes: Sequence[Sequence[float]],
    multiprobe: bool = True,
    nprobes: int | None = None,
) -> DataFrame:
    """The candidate set an LSH search scores: rows in the probed buckets."""
    probes = probe_signatures(query, planes, multiprobe, nprobes=nprobes)
    return df.filter(lsh_signature(vector_col, planes).isin(probes))


def lsh_candidate_pool(
    df: DataFrame,
    vector_col: str,
    query: Sequence[float],
    planes: Sequence[Sequence[float]],
    multiprobe: bool = True,
    nprobes: int | None = None,
    ef: int | None = None,
    k: int = 1,
    metric: str = "l2",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """The candidate pool an LSH search exact-scores: rows in the probed
    buckets, optionally bounded to the ``max(ef, k)`` coarse-nearest —
    ``vector.ef`` as the candidate-pool cap, HNSW's dynamic-list analog
    (ref config/LanceOptions.java:224-228, threaded at
    LanceVectorSearch.java:146-163). The cap is a distributed TakeOrdered
    on a 2-decimal coarse distance, so larger ef = wider pool = better
    recall at linear extra cost, exactly the native knob's contract."""
    cand = lsh_candidates(df, vector_col, query, planes, multiprobe, nprobes)
    if ef is not None:
        from .knn import knn

        if ef <= 0:
            raise ValueError("ef must be positive")
        cand = knn(cand, vector_col, query, k=max(int(ef), k), metric=metric,
                   tiebreak_cols=tiebreak_cols, round_digits=2,
                   distance_col="_coarse").drop("_coarse")
    return cand


def lsh_knn(
    df: DataFrame,
    vector_col: str,
    query: Sequence[float],
    k: int = 10,
    metric: str = "l2",
    planes: Sequence[Sequence[float]] | None = None,
    multiprobe: bool = True,
    nprobes: int | None = None,
    ef: int | None = None,
    refine_factor: int | None = None,
    tiebreak_cols: Sequence[str] = (),
    round_digits: int | None = None,
    options=None,
) -> DataFrame:
    """ANN top-k: filter to the query's (multi-probe) LSH buckets, then
    exact top-k among candidates.

    Search-time knobs (ref config/LanceOptions.java:215-237, threaded as
    in LanceVectorSearch.java:146-163; defaults resolved from
    ``options: DatasetOptions`` when given):
    - ``nprobes`` caps probed buckets (see probe_signatures);
    - ``ef`` bounds the candidate pool (see lsh_candidate_pool);
    - ``refine_factor`` over-fetches k*refine_factor candidates by a
      coarse (2-decimal) distance, then re-ranks them exactly — the
      read-wider-then-refine contract of Lance's refine stage."""
    from .knn import knn

    if options is not None:
        nprobes = nprobes if nprobes is not None else options.vector_nprobes
        ef = ef if ef is not None else options.vector_ef
        refine_factor = (refine_factor if refine_factor is not None
                         else options.vector_refine_factor)
    planes = planes if planes is not None else make_planes(dim=len(query))
    candidates = lsh_candidate_pool(df, vector_col, query, planes, multiprobe,
                                    nprobes, ef, k, metric, tiebreak_cols)
    if refine_factor is not None and refine_factor > 1:
        coarse = knn(candidates, vector_col, query, k=k * refine_factor, metric=metric,
                     tiebreak_cols=tiebreak_cols, round_digits=2,
                     distance_col="_coarse")
        candidates = coarse.drop("_coarse")
    return knn(candidates, vector_col, query, k=k, metric=metric,
               tiebreak_cols=tiebreak_cols, round_digits=round_digits)


def centroids_by(df: DataFrame, vector_col: str, cell_col: str) -> DataFrame:
    """Per-cell mean vector via posexplode + two-level aggregation.

    Shuffle profile: one partial+final agg on (cell, pos) — fully
    map-side combinable — then a tiny (cells x dim) relation collapsed
    per cell. At 100 TB this is the standard distributed centroid step."""
    pe = df.select(F.col(cell_col), F.posexplode(F.col(vector_col)).alias("pos", "val"))
    per_dim = pe.groupBy(cell_col, "pos").agg(F.avg("val").alias("c"))
    return per_dim.groupBy(cell_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("centroid")
    )


def ivf_coarse_knn(
    df: DataFrame,
    vector_col: str,
    cell_col: str,
    query: Sequence[float],
    k: int = 10,
    nprobes: int | None = 2,
    tiebreak_cols: Sequence[str] = (),
    round_digits: int | None = None,
    options=None,
) -> DataFrame:
    """IVF-style coarse search: probe the nprobes nearest cells, exact
    L2 top-k within them (ref IVF semantics, LanceIndexBuilder.java:125-138;
    nprobes default ref config/LanceOptions.java:215-219 — resolved from
    ``options: DatasetOptions.vector_nprobes`` when given)."""
    from .knn import knn

    if nprobes is None:
        nprobes = options.vector_nprobes if options is not None else 2
    if nprobes <= 0:
        raise ValueError("nprobes must be positive")
    q = V.validate_query_vector(query)
    cent = centroids_by(df, vector_col, cell_col)
    d2 = F.round(V.l2_distance("centroid", q), 6)
    chosen = cent.select(F.col(cell_col), d2.alias("cd")).orderBy("cd", cell_col).limit(nprobes)
    candidates = df.join(F.broadcast(chosen.select(cell_col)), on=cell_col, how="left_semi")
    return knn(candidates, vector_col, q, k=k, metric="l2",
               tiebreak_cols=tiebreak_cols, round_digits=round_digits)
