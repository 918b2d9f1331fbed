"""Emulated product-quantization (PQ) index: the IVF_PQ scale path.

The reference's default index type is IVF_PQ (ref config/LanceOptions.java
:123-163 — ``index.num-sub-vectors`` 16, ``index.num-bits`` 8) built natively
by Lance (ref LanceIndexBuilder.java:125-138). Without the native library we
re-express both halves as DataFrame plans over the fragment-backed dataset:

- **codebooks** (train): the vector is split into ``num_sub_vectors``
  contiguous sub-vectors; each sub-space gets its own ``2**num_bits``-entry
  codebook via distributed Lloyd k-means. All sub-spaces train
  SIMULTANEOUSLY in one DataFrame: rows explode into (row, sub, subvec),
  the assignment step is an equi-join on ``sub`` against the broadcast
  codebook relation (m * k rows — tiny at any corpus size), and the update
  step is one map-side-combinable (sub, code, pos) average. Iteration count
  is fixed, seeds are the lowest-id rows — deterministic given the data.
- **codes** (encode): every row stores ``num_sub_vectors`` uint8-sized
  codes — 16 bytes/vector at the reference defaults vs 256 bytes for a
  float64[64] — the 16x memory compression that lets a 100 TB embedding
  corpus's index fit in cluster RAM.
- **ADC search**: the query is split the same way; a lookup table
  ``lut[sub][code] = ||q_sub - centroid||^2`` (m * k floats) is computed
  driver-side and embedded as literal arrays, so the approximate distance
  of a row is ``sqrt(sum_s lut_s[codes[s]])`` — m array lookups inside
  whole-stage codegen, NO vector arithmetic per row. Top
  ``k * refine_factor`` by ADC distance (TakeOrderedAndProject over the
  skinny codes relation), then an exact re-rank on the fetched vectors —
  Lance's refine stage (ref config/LanceOptions.java:232-237).
- **IVF coarse pruning** composes: when the dataset also carries the
  emulated IVF index (index.py), ``nprobes`` restricts the ADC scan to the
  probed cells' codes before scoring (static partition pruning on the
  cell-partitioned assignments).

On-disk layout: ``<dataset>/_indexes/<column>/pq/`` with
``codebooks.parquet`` (sub, code, centroid), ``codes.parquet``
(id, codes array), ``index_meta.json``.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .index import (
    INDEXES_DIR,
    _idx_load_remote,
    _idx_meta_remote,
    _idx_store_remote,
    _index_dir as _ivf_dir,
    _remote_subdir,
    has_index as has_ivf_index,
)
from .functions import vector as V
from .io import read_parquet_memo


def _pq_dir(path: str, column: str) -> str:
    from .sources.fs import is_remote

    if is_remote(path):
        return _remote_subdir(path, INDEXES_DIR, column, "pq")
    return os.path.join(path, INDEXES_DIR, column, "pq")


def has_pq_index(path: str, column: str, storage: dict | None = None) -> bool:
    from .sources.fs import is_remote

    if is_remote(path):
        return _idx_meta_remote(
            _remote_subdir(_pq_dir(path, column), "codebooks"),
            storage) is not None
    return os.path.exists(os.path.join(_pq_dir(path, column), "index_meta.json"))


def read_pq_meta(path: str, column: str,
                 storage: dict | None = None) -> dict:
    """PQ index metadata: local JSON or (s3://) the codebooks dataset's
    commit meta."""
    from .sources.fs import is_remote

    if is_remote(path):
        meta = _idx_meta_remote(
            _remote_subdir(_pq_dir(path, column), "codebooks"), storage)
        if meta is None:
            raise FileNotFoundError(f"no PQ index on {path}:{column}")
        return meta
    with open(os.path.join(_pq_dir(path, column), "index_meta.json")) as fh:
        return json.load(fh)


def _subvectors(vecs: DataFrame, m: int, subdim: int) -> DataFrame:
    """(rid, vd) -> (rid, sub, sv): explode into m contiguous sub-vectors.

    One projection + explode — no shuffle; sub-space parallelism comes for
    free because downstream joins/aggregates key on (sub, ...)."""
    slices = F.array(*[
        F.struct(F.lit(s).alias("sub"),
                 F.slice("vd", s * subdim + 1, subdim).alias("sv"))
        for s in range(m)
    ])
    return vecs.select("rid", F.explode(slices).alias("x")).select(
        "rid", F.col("x.sub").alias("sub"), F.col("x.sv").alias("sv")
    )


def _sub_l2sq(a: str, b: str, subdim: int | None = None) -> F.Column:
    """Squared L2 between two small array columns. With ``subdim`` known
    the chain unrolls for whole-stage codegen (the join multiplies rows
    m*k-fold, so the per-row distance is THE hot expression — measured
    ~10x over the interpreted zip_with/aggregate fallback); one small
    chain per row keeps janino far from its method limit."""
    if subdim is not None:
        sql = " + ".join(
            f"(element_at(`{a}`, {i}) - element_at(`{b}`, {i})) * "
            f"(element_at(`{a}`, {i}) - element_at(`{b}`, {i}))"
            for i in range(1, subdim + 1)
        )
        return F.expr(sql)
    d = F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, v: acc + v)


def _assign_codes(subs: DataFrame, books: DataFrame, subdim: int | None = None) -> DataFrame:
    """Nearest-codebook-entry per (row, sub): equi-join on sub against the
    broadcast codebooks (m*k rows), argmin via min-over-structs (ties break
    to the lowest code, deterministically). The m*k-fold scored relation
    never shuffles at full size — the min-of-struct groupBy partially
    aggregates map-side, so only (rows x m) survivors cross the wire."""
    scored = subs.join(F.broadcast(books), on="sub").select(
        "rid", "sub", "sv", _sub_l2sq("sv", "centroid", subdim).alias("d"), "code"
    )
    return (
        scored.groupBy("rid", "sub")
        .agg(F.min(F.struct("d", "code")).alias("best"), F.first("sv").alias("sv"))
        .select("rid", "sub", "sv", F.col("best.code").alias("code"))
    )


def build_pq_index(
    spark: SparkSession,
    path: str,
    column: str,
    id_col: str = "id",
    num_sub_vectors: int = 8,
    num_bits: int = 4,
    metric: str = "l2",
    iterations: int = 4,
    replace: bool = False,
    s3=None,
) -> dict:
    """Train per-sub-space codebooks and encode every row; returns the
    index metadata dict. Reference parameter surface:
    ``index.num-sub-vectors`` / ``index.num-bits``
    (ref config/LanceOptions.java:150-163). s3:// datasets train over
    the remote reader and persist codebooks/codes as engine datasets
    under the same ``_indexes/<col>/pq`` prefix."""
    from .sources import fragments as FR
    from .sources.fs import is_remote
    from .sources.reader import read_dataset

    remote = is_remote(path)
    storage = s3.to_storage_options() if (remote and s3) else None
    if has_pq_index(path, column, storage) and not replace:
        raise ValueError(f"PQ index on {column!r} already exists; pass replace=True")
    if num_bits < 1 or num_bits > 8:
        raise ValueError("num_bits must be in [1, 8]")
    if remote:
        from .sources.maintenance import _remote_reader

        df = _remote_reader(spark, path, s3)
    else:
        df = read_dataset(spark, path)
    if column not in df.columns:
        raise ValueError(f"index column {column!r} not in dataset schema {df.columns}")
    # repartition up front: codebook training is CPU-dense and a small
    # local dataset arrives as one file partition; at scale the scan
    # already has many splits and this is a cheap id-hash exchange
    vecs = df.select(
        F.col(id_col).alias("rid"), F.col(column).cast("array<double>").alias("vd")
    ).repartition(spark.sparkContext.defaultParallelism, "rid").localCheckpoint(eager=True)
    n = vecs.count()
    if n == 0:
        raise ValueError("cannot index an empty dataset")
    dim = len(vecs.select("vd").first().vd)
    if dim % num_sub_vectors != 0:
        raise ValueError(
            f"dim {dim} not divisible by num_sub_vectors {num_sub_vectors}"
        )
    subdim = dim // num_sub_vectors
    k = min(1 << num_bits, n)

    subs = _subvectors(vecs, num_sub_vectors, subdim).localCheckpoint(eager=True)
    # deterministic init: each sub-space seeds from its k lowest-rid rows
    w = Window.partitionBy("sub").orderBy("rid")
    books = (
        subs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("sub", (F.col("__rn") - 1).alias("code"), F.col("sv").alias("centroid"))
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        assigned = _assign_codes(subs, books, subdim)
        pe = assigned.select("sub", "code", F.posexplode("sv").alias("pos", "val"))
        per_dim = pe.groupBy("sub", "code", "pos").agg(F.avg("val").alias("c"))
        books = per_dim.groupBy("sub", "code").agg(
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "c"))),
                        lambda s: s["c"]).alias("centroid")
        ).localCheckpoint(eager=True)

    final = _assign_codes(subs, books, subdim)
    # codes array ordered by sub: array_sort on (sub, code) structs
    codes = final.groupBy("rid").agg(
        F.transform(F.array_sort(F.collect_list(F.struct("sub", "code"))),
                    lambda s: s["code"].cast("int")).alias("codes")
    )
    idx_dir = _pq_dir(path, column)
    meta = {
        "index_type": "ivf_pq_emulated",
        "column": column,
        "id_col": id_col,
        "metric": metric,
        "num_sub_vectors": num_sub_vectors,
        "num_bits": num_bits,
        "dim": dim,
        "dataset_version": FR.latest_version(path, storage),
    }
    codes_rel = codes.select(F.col("rid").alias(id_col), "codes")
    if remote:
        # codebooks (m*k rows, collected at search time) carry the meta;
        # codes are the skinny full-scan ADC relation — no clustering
        # needed, the whole point is scanning every row's m small ints.
        # Codes commit FIRST so the meta-bearing codebooks commit is the
        # atomic "index exists" flip (local index_meta.json semantics).
        _idx_store_remote(codes_rel, _remote_subdir(idx_dir, "codes"), s3)
        _idx_store_remote(books, _remote_subdir(idx_dir, "codebooks"),
                          s3, meta=meta)
        return meta
    shutil.rmtree(idx_dir, ignore_errors=True)
    os.makedirs(idx_dir, exist_ok=True)
    books.write.mode("overwrite").parquet(os.path.join(idx_dir, "codebooks.parquet"))
    codes_rel.write.mode("overwrite").parquet(
        os.path.join(idx_dir, "codes.parquet")
    )
    tmp = os.path.join(idx_dir, "index_meta.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(idx_dir, "index_meta.json"))
    return meta


# element_at(<LUT literal>, code+1) must stay in-bounds and positionally
# correct even when Lloyd updates drop empty clusters (code ids then have
# gaps): the LUT is indexed by ACTUAL code value, gaps filled with a
# never-wins sentinel. Finite (not inf) so the repr embeds as a plain SQL
# double literal; any sum containing it still sorts after every real code.
_LUT_GAP = 1.7976931348623157e308


def _adc_lut(books: list, q: list[float], m: int, subdim: int) -> list[list[float]]:
    """Driver-side asymmetric-distance lookup table:
    lut[sub][code] = squared L2 between the query's sub-vector and the
    codebook centroid, indexed by code VALUE (length max_code+1 per sub,
    gaps from dropped empty clusters filled with ``_LUT_GAP``). m*k floats
    — microseconds to build, embedded as literals so the per-row cost is
    m array lookups."""
    lut: dict[int, dict[int, float]] = {}
    for row in books:  # plain dicts (pyarrow to_pylist / Row.asDict)
        sub, code, centroid = row["sub"], row["code"], row["centroid"]
        qs = q[sub * subdim:(sub + 1) * subdim]
        d = 0.0
        for x, y in zip(qs, centroid):
            d += (x - y) * (x - y)
        lut.setdefault(sub, {})[code] = d
    return [
        [lut[s].get(c, _LUT_GAP) for c in range(max(lut[s]) + 1)]
        for s in sorted(lut)
    ]


def pq_search(
    spark: SparkSession,
    path: str,
    column: str,
    query: Sequence[float],
    k: int = 10,
    refine_factor: int = 10,
    nprobes: int | None = None,
    ef: int | None = None,
    tiebreak_cols: Sequence[str] = (),
    round_digits: int | None = None,
    filter=None,
    s3=None,
    _metas: dict | None = None,
) -> DataFrame:
    """ADC search over the PQ codes + exact refine (ref refine-factor,
    config/LanceOptions.java:232-237).

    Plan shape: the codes relation is skinny (id + m small ints); ADC
    distance is a codegen sum of m literal-array lookups; candidate
    selection is TakeOrderedAndProject (per-partition top-R, driver merges
    P*R); ONLY the R = k*refine_factor candidate rows are fetched from the
    dataset (semi-join) for the exact re-rank — ``ef`` bounds R from above
    (``vector.ef`` as the candidate-pool cap, ref
    config/LanceOptions.java:224-228). With ``nprobes`` and a co-existing
    IVF index, the ADC scan first prunes to the probed cells (IVF_PQ
    composition)."""
    from .operators.knn import knn
    from .sources.fs import is_remote
    from .sources.reader import read_dataset

    remote = is_remote(path)
    storage = s3.to_storage_options() if (remote and s3) else None
    # _metas: search_dataset's pre-fetched per-kind metadata — skips the
    # has_pq_index/read_pq_meta re-fetch pair (and the IVF presence GET)
    meta = _metas.get("pq") if _metas is not None else (
        read_pq_meta(path, column, storage)
        if has_pq_index(path, column, storage) else None)
    if meta is None:
        raise FileNotFoundError(f"no PQ index on {path}:{column}; build_pq_index first")
    idx_dir = _pq_dir(path, column)
    q = V.validate_query_vector(query)
    if len(q) != meta["dim"]:
        raise ValueError(f"query dim {len(q)} != indexed dim {meta['dim']}")
    m = meta["num_sub_vectors"]
    subdim = meta["dim"] // m
    id_col = meta["id_col"]

    if remote:
        books = [r.asDict() for r in _idx_load_remote(
            spark, _remote_subdir(idx_dir, "codebooks"), s3).collect()]
        codes = _idx_load_remote(spark, _remote_subdir(idx_dir, "codes"), s3)
    else:
        # codebooks are m*k rows of index metadata: a direct pyarrow read
        # is ~5ms where spark.read+collect is ~150ms AND a driver-blocking
        # Spark job per search (guide §5 — keep jobs off the metadata path)
        import pyarrow.parquet as _pq

        books = _pq.read_table(
            os.path.join(idx_dir, "codebooks.parquet")).to_pylist()
        codes = read_parquet_memo(spark, os.path.join(idx_dir, "codes.parquet"))
    lut = _adc_lut(books, q, m, subdim)

    if nprobes is not None:
        # IVF_PQ composition: restrict the ADC scan to probed cells
        have_ivf = ("ivf" in _metas) if _metas is not None \
            else has_ivf_index(path, column, storage)
        if not have_ivf:
            raise FileNotFoundError(
                f"nprobes given but no IVF index on {path}:{column}; build_index first"
            )
        if remote:
            cents = _idx_load_remote(
                spark, _remote_subdir(_ivf_dir(path, column), "centroids"), s3)
            assigns = _idx_load_remote(
                spark, _remote_subdir(_ivf_dir(path, column), "assignments"),
                s3)
        else:
            cents = read_parquet_memo(spark, os.path.join(_ivf_dir(path, column), "centroids.parquet"))
            assigns = read_parquet_memo(
                spark, os.path.join(_ivf_dir(path, column), "assignments.parquet")
            )
        chosen = [
            r.cell
            for r in cents.select(
                "cell", V.l2_distance("centroid", q).alias("cd")
            ).orderBy("cd", "cell").limit(nprobes).collect()
        ]
        probe_ids = assigns.filter(F.col("cell").isin(chosen)).select(id_col)
        codes = codes.join(probe_ids, on=id_col, how="left_semi")

    # ONE SQL parse for the whole ADC sum (building literals node-by-node
    # costs a py4j round-trip each), and each sub-space's k-entry LUT rides
    # in as a from_json('[...]') STRING literal rather than an inline
    # array(v1..vk): Catalyst analysis walks every literal node, so the
    # m*k inline form cost ~300ms of driver time PER ACTION at 16x256;
    # from_json is 1 node per sub-space and ConstantFolding collapses it
    # to the identical ArrayData literal before codegen (verified: no
    # from_json in the optimized plan, per-row code unchanged, sums
    # bit-identical — json repr round-trips doubles exactly).
    import json as _json

    adc_sql = " + ".join(
        "element_at(from_json('{js}', 'array<double>'), "
        "element_at(`codes`, {idx}) + 1)".format(
            # allow_nan=False: a non-finite codebook distance would emit a
            # bare NaN/Infinity token (invalid JSON) that PERMISSIVE
            # from_json folds to NULL — silently-NULL ADC distances where
            # the old inline-literal form failed loudly at parse. Raise
            # here instead (finite _LUT_GAP keeps gap sentinels valid).
            js=_json.dumps(lut[s], allow_nan=False), idx=s + 1
        )
        for s in range(m)
    )
    approx = codes.select(F.col(id_col), F.sqrt(F.expr(adc_sql)).alias("_adc"))
    r = max(k * refine_factor, k)
    if ef is not None:
        if ef <= 0:
            raise ValueError("ef must be positive")
        r = max(min(r, int(ef)), k)
    cand = approx.orderBy(F.asc("_adc"), F.asc(id_col)).limit(r)

    from .index import split_by_index_coverage

    covered, uncovered = split_by_index_coverage(
        path, meta.get("dataset_version", 0), storage=storage,
        relative=remote)
    if remote:
        from .sources.maintenance import _remote_reader

        df = _remote_reader(spark, path, s3)
    else:
        df = read_dataset(spark, path)
    if not covered:
        survivors = df  # stale beyond recognition: exact brute force
    else:
        # candidate fetch ONLY from index-covered files (an id rewritten
        # into an uncovered file would otherwise be fetched twice)
        if remote:
            from .sources.maintenance import _remote_reader as _rr

            def _files_scan(files):
                return (_rr(spark, path, s3, file_col="__frag")
                        .filter(F.col("__frag").isin(*files))
                        .drop("__frag"))
        else:
            from .sources import fragments as FR
            from .sources.reader import read_fragment_files

            m_now = FR.read_manifest_compat(path)

            def _files_scan(files):
                return read_fragment_files(spark, m_now, files)
        survivors = _files_scan(covered).select(*df.columns).join(
            cand.select(id_col), on=id_col, how="left_semi"
        )
        if uncovered:
            # unindexed tail: exact-scored in full (Lance's
            # unindexed-fraction contract — appends are searchable
            # immediately, the index just covers less until rebuilt)
            survivors = survivors.unionByName(
                _files_scan(uncovered).select(*df.columns)
            )
    return knn(survivors, column, q, k=k, metric=meta.get("metric", "l2"),
               filter=filter, tiebreak_cols=tiebreak_cols, round_digits=round_digits)
