"""ANN index builder (ref LanceIndexBuilder.java).

Two backends behind one ``build_index`` surface, mirroring the dataset
layer's design:

- **native** (import-gated): ``lance.dataset(...).create_index`` for
  IVF_PQ / IVF_HNSW_PQ / IVF_FLAT with the reference's parameter set and
  validation (ref :125-179, defaults ref config/LanceOptions.java:123-190).
- **emulated** (always available): a real IVF index over the
  parquet-fragment backend — distributed Lloyd k-means builds
  ``index.num-partitions`` centroids, every row's cell assignment is
  persisted columnar, and ``ivf_index_knn`` answers queries by probing
  the ``nprobes`` nearest cells only (centroid select is driver-side on
  a tiny relation; candidate fetch is a parquet scan with the cell
  filter pushed down + a broadcast semi-join). This is the same
  prune-then-exact-score shape Lance's IVF uses, expressed as DataFrame
  plans.

Both return ``IndexBuildResult{success, duration, error}`` (ref :380-435).
On-disk layout (emulated): ``<dataset>/_indexes/<column>/ivf/`` with
``centroids.parquet``, ``assignments.parquet``, ``index_meta.json``.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import time
from dataclasses import dataclass

import pyspark.sql.functions as F

from .options import DatasetOptions, DistanceMetric, IndexType
from .io import read_parquet_memo
from .sources import fragments as FR

INDEXES_DIR = "_indexes"

# Commit-meta key carrying an ANN index's metadata when the index lives
# on object storage (the same pattern sources/fts.py uses for BM25
# postings: the index IS a versioned engine dataset under
# ``<dataset>/_indexes/<column>/<kind>/...``, its meta rides the
# manifest, and reads flow through the pushdown format('lance') reader —
# no driver-side file IO, no hadoop-aws dependency).
_ANN_META_KEY = "ann"


def _remote_subdir(path: str, *parts: str) -> str:
    return "/".join([str(path).rstrip("/"), *parts])


def _idx_store_remote(df, idx_path: str, s3, meta: dict | None = None,
                      cluster_cols=None, bloom_cols=None) -> None:
    """Persist one index relation as an engine dataset on object storage
    — executor-direct fragment PUTs + one conditional-PUT commit (the
    write_dataset s3 plane). ``cluster_cols`` range-clusters fragments so
    a pushed equality/IN filter on them prunes whole fragments via zone
    maps; ``meta`` rides the commit (storage-agnostic index_meta)."""
    from .sources.writer import write_dataset

    opts = DatasetOptions(
        path=idx_path, s3=s3,
        sort_columns=list(cluster_cols or []),
        cluster_on_write=bool(cluster_cols),
        bloom_columns=list(bloom_cols or []),
    )
    write_dataset(df, idx_path, mode="overwrite", options=opts,
                  commit_meta={_ANN_META_KEY: meta} if meta is not None
                  else None)


def _idx_load_remote(spark, idx_path: str, s3):
    """The pushdown reader over one remote index relation — filters on
    clustered columns prune fragments at planning time (zone maps), then
    blooms, then parquet row groups."""
    from .sources.datasource import register_lance_datasource

    register_lance_datasource(spark)
    rd = spark.read.format("lance")
    if s3 is not None:
        rd = rd.options(**s3.to_option_map())
    return rd.load(idx_path)


def _idx_meta_remote(idx_path: str, storage: dict | None) -> dict | None:
    """The index metadata from the index dataset's commit meta, or None
    when no index exists at that key prefix. A foreign/native-binary
    manifest chain at the prefix (LanceUnavailableError) also reports
    "no index" rather than crashing has_*/describe — the FTS describe
    loop's contract — but, unlike a genuinely absent index, it warns
    loudly first: "corrupt/unreadable" silently collapsing into "absent"
    would let searches quietly fall back to brute force and let
    ``build_index(replace=False)`` build over a real-but-unreadable
    index (round-12 advice)."""
    try:
        return FR.read_manifest(idx_path, None, storage).meta.get(_ANN_META_KEY)
    except FileNotFoundError:
        return None
    except FR.LanceUnavailableError as e:
        import warnings

        warnings.warn(
            f"index prefix {idx_path!r} holds a manifest chain this "
            f"reader cannot read ({e}); treating it as 'no index' — "
            "searches will fall back to brute force and a rebuild will "
            "overwrite whatever lives there", RuntimeWarning,
            stacklevel=2)
        return None


_KIND_PRIMARY = (("hnsw", "graph"), ("pq", "codebooks"), ("ivf", "centroids"))


def _kind_metas(path: str, column: str,
                storage: dict | None = None) -> dict[str, dict]:
    """Presence AND content of every index kind's meta in one pass —
    on s3:// this is exactly one manifest fetch per kind (the meta rides
    the kind's primary relation), replacing the separate has_* /
    read_*_meta pairs that each re-listed ``_versions/`` and re-fetched
    the manifest. Locally it reads up to three small JSON files."""
    from .sources.fs import is_remote

    out: dict[str, dict] = {}
    if is_remote(path):
        for kind, rel in _KIND_PRIMARY:
            m = _idx_meta_remote(
                _remote_subdir(path, INDEXES_DIR, column, kind, rel), storage)
            if m is not None:
                out[kind] = m
    else:
        for kind, _rel in _KIND_PRIMARY:
            p = os.path.join(path, INDEXES_DIR, column, kind,
                             "index_meta.json")
            if os.path.exists(p):
                with open(p) as fh:
                    out[kind] = json.load(fh)
    return out


@dataclass
class IndexBuildResult:
    """ref LanceIndexBuilder.java:380-435."""

    success: bool
    duration_seconds: float
    error: str | None = None
    index_type: IndexType | None = None
    column: str | None = None


def validate_index_params(opts: DatasetOptions, column: str, schema_names: list[str]) -> None:
    """Column existence (ref LanceIndexBuilder.java:210-218) on top of the
    option-range validation done by DatasetOptions."""
    if column not in schema_names:
        raise ValueError(f"index column {column!r} not in dataset schema {schema_names}")


def _index_dir(path: str, column: str) -> str:
    from .sources.fs import is_remote

    if is_remote(path):
        return _remote_subdir(path, INDEXES_DIR, column, "ivf")
    return os.path.join(path, INDEXES_DIR, column, "ivf")


def has_index(path: str, column: str, storage: dict | None = None) -> bool:
    from .sources.fs import is_remote

    if is_remote(path):
        return _idx_meta_remote(
            _remote_subdir(_index_dir(path, column), "centroids"),
            storage) is not None
    return os.path.exists(os.path.join(_index_dir(path, column), "index_meta.json"))


def _pair_l2_sql(a: str, b: str, dim: int) -> F.Column:
    """Codegen L2 between two array columns, one F.expr parse."""
    return F.sqrt(F.expr(" + ".join(
        f"(element_at(`{a}`, {i}) - element_at(`{b}`, {i})) * "
        f"(element_at(`{a}`, {i}) - element_at(`{b}`, {i}))"
        for i in range(1, dim + 1)
    )))


def _assign_cells(vecs, cents, dim: int, keep_vd: bool = True):
    """Nearest-centroid assignment: rows x broadcast(centroids) -> argmin.

    One shuffle-free broadcast join producing n*k scored pairs, then a
    max_by-style argmin per row — the standard distributed Lloyd step.

    ``keep_vd=False`` drops the vector from the argmin aggregate: min of a
    struct is not hash-aggregable, so Spark plans a SortAggregate — with
    ``vd`` in the buffer the map side sorts and the exchange ships every
    row's full vector (dim doubles) just to emit ``(rid, cell)``. Callers
    that only need assignments (the final IVF assignment, kmeans_assign)
    get a skinny sort+shuffle of (rid, d, cell) instead — same argmin,
    same tie-break, ~20x fewer bytes per row at dim=64 (guide §2.3)."""
    pairs = vecs.crossJoin(F.broadcast(cents))
    d = _pair_l2_sql("vd", "centroid", dim)
    # argmin via min over (d, cell) structs — struct ordering is
    # lexicographic, so ties break on the lowest cell id, deterministically
    if not keep_vd:
        return (
            pairs.select("rid", "cell", d.alias("d"))
            .groupBy("rid")
            .agg(F.min(F.struct("d", "cell")).alias("best"))
            .select("rid", F.col("best.cell").alias("cell"))
        )
    scored = pairs.select("rid", "vd", "cell", d.alias("d"))
    return (
        scored.groupBy("rid")
        .agg(F.min(F.struct("d", "cell")).alias("best"), F.first("vd").alias("vd"))
        .select("rid", "vd", F.col("best.cell").alias("cell"))
    )


def lloyd_kmeans_centroids(vecs, k: int, dim: int, iterations: int):
    """Distributed Lloyd iteration shared by the IVF index build and
    operators.semantic: deterministic seeding (the k lowest-id vectors),
    broadcast-centroid argmin assignment (_assign_cells), posexplode
    per-dimension partial-mean update. ``vecs`` is a (rid, vd) relation;
    returns the (cell, centroid) relation, checkpointed."""
    from pyspark.sql import Window

    cents = (
        vecs.orderBy("rid").limit(k)
        .select((F.row_number().over(Window.orderBy("rid")) - 1).alias("cell"),
                F.col("vd").alias("centroid"))
    ).localCheckpoint(eager=False)  # lazy: truncates lineage without a
    # blocking driver job at plan time; materializes inside the first action
    for _ in range(iterations):
        assigned = _assign_cells(vecs, cents, dim)
        # centroid update: per-(cell, dim) mean via posexplode — fully
        # map-side-combinable partial aggregation (operators.ann shape)
        pe = assigned.select("cell", F.posexplode("vd").alias("pos", "val"))
        per_dim = pe.groupBy("cell", "pos").agg(F.avg("val").alias("c"))
        cents = per_dim.groupBy("cell").agg(
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "c"))),
                        lambda s: s["c"]).alias("centroid")
        ).localCheckpoint(eager=True)
    # loud empty-input contract (kmeans_assign docstring): with dim= passed
    # the _first_dim probe is skipped, so an empty relation would otherwise
    # silently yield empty assignments. The check is ~free here: after the
    # loop cents is an eager-checkpointed <=k-row relation (isEmpty is a
    # take(1) over local blocks); iterations=0 materializes the lazy seed
    # limit(k) early, which no hot path uses.
    if cents.isEmpty():
        raise ValueError("cannot cluster an empty DataFrame / NULL vectors")
    return cents


def _emulated_ivf_build(spark, path: str, column: str, id_col: str,
                        opts: DatasetOptions, metric: DistanceMetric,
                        replace: bool, iterations: int = 4) -> None:
    from .sources.fs import is_remote
    from .sources.reader import read_dataset

    remote = is_remote(path)
    storage = opts.s3.to_storage_options() if (remote and opts.s3) else None
    idx_dir = _index_dir(path, column)
    if has_index(path, column, storage) and not replace:
        # ref LanceIndexBuilder.java:173-179 replace flag semantics
        raise ValueError(f"index on {column!r} already exists; pass replace=True")
    if remote:
        from .sources.maintenance import _remote_reader

        df = _remote_reader(spark, path, opts.s3)
    else:
        df = read_dataset(spark, path)
    validate_index_params(opts, column, df.columns)
    vecs = df.select(
        F.col(id_col).alias("rid"),
        F.col(column).cast("array<double>").alias("vd"),
    ).localCheckpoint(eager=True)
    n = vecs.count()
    if n == 0:
        raise ValueError("cannot index an empty dataset")
    first = vecs.select("vd").first()
    dim = len(first.vd)
    k = min(opts.index_num_partitions, n)

    cents = lloyd_kmeans_centroids(vecs, k, dim, iterations)
    final = _assign_cells(vecs, cents, dim, keep_vd=False)
    meta = {
        "index_type": "ivf_flat_emulated",
        "column": column,
        "id_col": id_col,
        "metric": metric.value,
        "num_partitions": k,
        "dim": dim,
        "dataset_version": FR.latest_version(path, storage),
    }
    assigns = final.select(F.col("rid").alias(id_col), "cell")
    if remote:
        # object-storage plane: both relations are engine datasets under
        # the same _indexes/<col>/ivf prefix; the assignments cluster on
        # `cell` so a probe's `cell IN (...)` prunes whole fragments via
        # zone maps (the remote twin of partitionBy static pruning), with
        # cell blooms as the second skip level. Meta rides the centroids
        # dataset's commit — no driver-side JSON file on s3. The
        # meta-bearing relation commits LAST (the remote twin of the local
        # atomic index_meta.json rename): a crash mid-build leaves
        # has_index() False, never a half-index that searches would open.
        _idx_store_remote(assigns, _remote_subdir(idx_dir, "assignments"),
                          opts.s3, cluster_cols=["cell"],
                          bloom_cols=["cell"])
        _idx_store_remote(cents, _remote_subdir(idx_dir, "centroids"),
                          opts.s3, meta=meta)
        return
    shutil.rmtree(idx_dir, ignore_errors=True)
    os.makedirs(idx_dir, exist_ok=True)
    cents.write.mode("overwrite").parquet(os.path.join(idx_dir, "centroids.parquet"))
    # partitionBy(cell): probing nprobes cells reads ONLY those cells'
    # files (static partition pruning) — at scale the un-probed ~99% of
    # the assignment index is never touched, mirroring how Lance's IVF
    # only opens the probed partitions' row-id lists
    assigns.write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(os.path.join(idx_dir, "assignments.parquet"))
    tmp = os.path.join(idx_dir, "index_meta.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(idx_dir, "index_meta.json"))


def build_index(
    path: str,
    column: str,
    index_type: "str | IndexType" = IndexType.IVF_PQ,
    metric: "str | DistanceMetric" = DistanceMetric.L2,
    replace: bool = False,
    options: DatasetOptions | None = None,
    spark=None,
    id_col: str = "id",
) -> IndexBuildResult:
    """Build an ANN index. Native lance when present; otherwise the
    emulated IVF build (requires ``spark`` + ``id_col``)."""
    opts = options or DatasetOptions(path=path)
    itype = IndexType.parse(index_type)
    metric = DistanceMetric.parse(metric)
    start = time.perf_counter()
    try:
        if FR.HAVE_LANCE:  # native path (exercised via the fake lance in tests)
            import lance

            ds = lance.dataset(path)
            validate_index_params(opts, column, ds.schema.names)
            kwargs = {
                "num_partitions": opts.index_num_partitions,
                "replace": replace,
                "metric": metric.value,
            }
            if itype in (IndexType.IVF_PQ, IndexType.IVF_HNSW_PQ):
                kwargs["num_sub_vectors"] = opts.index_num_sub_vectors or 16
                kwargs["num_bits"] = opts.index_num_bits
            if itype is IndexType.IVF_HNSW_PQ:
                kwargs["m"] = opts.index_m
                kwargs["ef_construction"] = opts.index_ef_construction
            ds.create_index(column, index_type=itype.value.upper(), **kwargs)
            return IndexBuildResult(True, time.perf_counter() - start, None, itype, column)
        if spark is None:
            raise FR.LanceUnavailableError(
                "native ANN index building (pass spark= for the emulated IVF build)"
            )
        _emulated_ivf_build(spark, path, column, id_col, opts, metric, replace)
        if itype is IndexType.IVF_HNSW_PQ:
            # real per-cell HNSW graphs over the IVF cells just built
            # (ref LanceIndexBuilder.java:140-157, params
            # config/LanceOptions.java:166-190). Honest delta vs Lance:
            # traversal scores raw vectors, not PQ codes (hnsw.py docstring).
            from .hnsw import build_hnsw_index

            build_hnsw_index(
                spark, path, column, id_col=id_col,
                m=opts.index_m, ef_construction=opts.index_ef_construction,
                max_level=opts.index_max_level, metric=metric.value,
                replace=replace, s3=opts.s3,
            )
        if itype in (IndexType.IVF_PQ, IndexType.IVF_HNSW_PQ):
            # the PQ half of IVF_PQ: per-sub-space codebooks + compact codes
            # (pq.py)
            from .pq import build_pq_index

            build_pq_index(
                spark, path, column, id_col=id_col,
                num_sub_vectors=opts.index_num_sub_vectors or 16,
                num_bits=min(opts.index_num_bits, 8),
                metric=metric.value, replace=replace, s3=opts.s3,
            )
        return IndexBuildResult(True, time.perf_counter() - start, None, itype, column)
    except Exception as e:  # noqa: BLE001 - result object carries the error (ref :380-435)
        return IndexBuildResult(False, time.perf_counter() - start, str(e), itype, column)


def split_by_index_coverage(path: str, indexed_version: int,
                            storage: dict | None = None,
                            relative: bool = False) -> tuple[list[str], list[str]]:
    """Partition the CURRENT manifest's fragment files into (covered,
    uncovered) by an index built at ``indexed_version``.

    A fragment file present in both manifests is fully covered (fragments
    are immutable); a file added since — appends, compaction output,
    delete/merge survivors — holds rows the index has never seen. Indexed
    search must brute-force exactly the uncovered tail and union it with
    the indexed candidates (Lance's unindexed-fraction contract: an index
    never goes silently stale, it just covers less until rebuilt).
    Deleted rows need no handling: their ids simply match nothing.

    If the indexed version's manifest was vacuumed, every current file is
    conservatively uncovered — the search degrades to exact brute force,
    trading speed for correctness.

    ``relative=True`` returns manifest-relative file names (what the
    remote reader's ``read.file-column`` yields) instead of local joins
    — the s3:// twin of this split."""
    current = FR.read_manifest_compat(path, storage_options=storage)
    try:
        at_build = {f.file for f in FR.read_manifest_compat(
            path, indexed_version, storage_options=storage).fragments}
    except FileNotFoundError:
        at_build = set()
    if relative:
        covered = [f.file for f in current.fragments if f.file in at_build]
        uncovered = [f.file for f in current.fragments
                     if f.file not in at_build]
        return covered, uncovered
    covered = [os.path.join(path, f.file) for f in current.fragments if f.file in at_build]
    uncovered = [os.path.join(path, f.file) for f in current.fragments if f.file not in at_build]
    return covered, uncovered


def ivf_index_knn(
    spark,
    path: str,
    column: str,
    query,
    k: int = 10,
    nprobes: int | None = None,
    ef: int | None = None,
    options: DatasetOptions | None = None,
    tiebreak_cols=(),
    round_digits: int | None = None,
    filter=None,
    _meta: dict | None = None,
):
    """Indexed ANN search over the emulated IVF index: pick the nprobes
    nearest centroids (driver-side on a k_cells-row relation), fetch ONLY
    rows assigned to probed cells (cell filter pushed into the
    assignments parquet scan, broadcast semi-join into the dataset),
    exact top-k on the survivors — the reference's search shape
    (ref LanceVectorSearch.java:146-201) without the native library.
    ``ef`` bounds the scored candidate pool to the max(ef, k)
    coarse-nearest probed rows (``vector.ef``, the same contract as
    lsh_candidate_pool / pq_search). s3:// datasets serve the same plan
    against the ``_indexes/`` object-storage plane: centroids/assignments
    are engine datasets, the probe's cell filter prunes assignment
    fragments via zone maps + blooms (nprobes-bounded GETs), and the
    candidate fetch rides the remote pushdown reader."""
    from .functions import vector as V
    from .operators.knn import knn
    from .sources.fs import is_remote
    from .sources.reader import read_dataset

    opts = options or DatasetOptions(path=path)
    remote = is_remote(path)
    storage = opts.s3.to_storage_options() if (remote and opts.s3) else None
    # _meta: pre-fetched index metadata (search_dataset's single
    # _kind_metas pass) — skips the has_index listing + meta re-fetch
    idx_dir = _index_dir(path, column)
    meta = _meta
    if meta is None:
        if remote:
            meta = _idx_meta_remote(_remote_subdir(idx_dir, "centroids"),
                                    storage)
        elif os.path.exists(os.path.join(idx_dir, "index_meta.json")):
            with open(os.path.join(idx_dir, "index_meta.json")) as fh:
                meta = json.load(fh)
    if meta is None:
        raise FileNotFoundError(f"no IVF index on {path}:{column}; build_index first")
    nprobes = nprobes if nprobes is not None else opts.vector_nprobes
    q = V.validate_query_vector(query)

    if remote:
        cents = _idx_load_remote(spark, _remote_subdir(idx_dir, "centroids"),
                                 opts.s3)
    else:
        cents = read_parquet_memo(spark, os.path.join(idx_dir, "centroids.parquet"))
    # centroid selection is driver-side over a num_partitions-row relation
    # (ref: Lance scans the centroid table in-process too); the chosen
    # cell ids are a handful of ints, so collecting them turns the probe
    # into a static partition filter on the cell-partitioned assignments —
    # only the probed cells' files are ever read
    chosen = [
        r.cell
        for r in cents.select(
            "cell", V.l2_distance("centroid", [float(v) for v in q]).alias("cd")
        ).orderBy("cd", "cell").limit(nprobes).collect()
    ]
    if remote:
        # cell IN (...) is PUSHED into the assignments dataset's scan —
        # fragment zone maps (clustered write) + cell blooms skip every
        # un-probed fragment's GET
        assigns = _idx_load_remote(spark,
                                   _remote_subdir(idx_dir, "assignments"),
                                   opts.s3)
    else:
        assigns = read_parquet_memo(spark, os.path.join(idx_dir, "assignments.parquet"))
    probe_ids = assigns.filter(F.col("cell").isin(chosen))
    id_col = meta["id_col"]
    covered, uncovered = split_by_index_coverage(
        path, meta.get("dataset_version", 0), storage=storage,
        relative=remote)
    if remote:
        from .sources.maintenance import _remote_reader

        df = _remote_reader(spark, path, opts.s3)
    else:
        df = read_dataset(spark, path)
    if not covered:
        candidates = df  # index covers nothing current: exact brute force
    else:
        # no broadcast hint: probed ids can be a few % of the dataset — far
        # too big to broadcast at 100 TB. AQE broadcasts when it IS small.
        if remote:
            def _files_scan(files):
                return (_remote_reader(spark, path, opts.s3,
                                       file_col="__frag")
                        .filter(F.col("__frag").isin(*files))
                        .drop("__frag"))
        else:
            from .sources.reader import read_fragment_files

            m_now = FR.read_manifest_compat(path)

            def _files_scan(files):
                return read_fragment_files(spark, m_now, files)
        candidates = _files_scan(covered).select(*df.columns).join(
            probe_ids.select(id_col), on=id_col, how="left_semi"
        )
        if uncovered:
            # unindexed tail (rows appended/rewritten since the build):
            # exact-scored in full and unioned with the probed candidates
            candidates = candidates.unionByName(
                _files_scan(uncovered).select(*df.columns)
            )
    eff = ef if ef is not None else (options.vector_ef if options is not None else None)
    if eff is not None:
        if eff <= 0:
            raise ValueError("ef must be positive")
        # candidate-pool bound: keep the max(ef, k) coarse-nearest probed
        # rows (2-decimal distance) before the exact top-k
        candidates = knn(candidates, column, q, k=max(int(eff), k),
                         metric=meta.get("metric", "l2"), filter=filter,
                         tiebreak_cols=tiebreak_cols, round_digits=2,
                         distance_col="_coarse").drop("_coarse")
        filter = None  # already applied inside the pool selection
    # filtered ANN (ref LanceVectorSearch.java:166-201): the predicate
    # narrows the probed candidate set before the exact top-k
    return knn(candidates, column, q, k=k, metric=meta.get("metric", "l2"),
               filter=filter, tiebreak_cols=tiebreak_cols, round_digits=round_digits)


def refresh_index(
    path: str,
    column: str,
    spark=None,
    id_col: str = "id",
    max_uncovered_fraction: float = 0.2,
    options: DatasetOptions | None = None,
) -> "IndexBuildResult | None":
    """Rebuild the index when the unindexed tail has grown past
    ``max_uncovered_fraction`` of the table's rows — the maintenance
    counterpart of the staleness-aware search: the tail is always
    CORRECT (exact-scanned), this bounds how much of every query pays
    the brute-force price. Returns None when the index is fresh enough.
    Works against the s3:// index plane too (meta rides the index
    datasets' manifests; the rebuild needs ``options.s3``).

    The rebuild rehydrates the index geometry (num_partitions / m /
    ef_construction / num_sub_vectors / num_bits) from the STORED metas —
    a maintenance-triggered refresh must reproduce what was built, not
    silently reshape the index to whatever the caller's option defaults
    happen to be."""
    from .sources.fs import is_remote

    remote = is_remote(path)
    storage = (options.s3.to_storage_options()
               if (remote and options is not None and options.s3) else None)
    # gather EVERY kind's meta — a compound IVF_HNSW_PQ index spreads its
    # params across the hnsw/pq/ivf sidecars; the first found is primary
    metas = _kind_metas(path, column, storage)
    if not metas:
        raise FileNotFoundError(f"no index on {path}:{column}")
    meta = next(metas[k] for k in ("hnsw", "pq", "ivf") if k in metas)
    covered, uncovered = split_by_index_coverage(
        path, meta.get("dataset_version", 0), storage=storage,
        relative=remote)
    manifest = FR.read_manifest_compat(path, storage_options=storage)
    rows_by_file = {
        (f.file if remote else os.path.join(path, f.file)): f.row_count
        for f in manifest.fragments}
    total = sum(rows_by_file.values()) or 1
    stale = sum(rows_by_file[f] for f in uncovered)
    if stale / total <= max_uncovered_fraction:
        return None
    built = meta.get("index_type", "")
    if built.startswith("ivf_hnsw"):
        itype = IndexType.IVF_HNSW_PQ
    elif built.startswith("ivf_pq"):
        itype = IndexType.IVF_PQ
    else:
        itype = IndexType.IVF_FLAT
    # rehydrate stored geometry over the caller's option defaults
    overrides: dict = {}
    ivf_m = metas.get("ivf") or {}
    if ivf_m.get("num_partitions"):
        overrides["index_num_partitions"] = ivf_m["num_partitions"]
    pq_m = metas.get("pq") or {}
    if pq_m.get("num_sub_vectors"):
        overrides["index_num_sub_vectors"] = pq_m["num_sub_vectors"]
    if pq_m.get("num_bits"):
        overrides["index_num_bits"] = pq_m["num_bits"]
    hnsw_m = metas.get("hnsw") or {}
    if hnsw_m.get("m"):
        overrides["index_m"] = hnsw_m["m"]
    if hnsw_m.get("ef_construction"):
        overrides["index_ef_construction"] = hnsw_m["ef_construction"]
    if hnsw_m.get("max_level"):
        overrides["index_max_level"] = hnsw_m["max_level"]
    base_opts = options if options is not None else DatasetOptions(path=path)
    opts = dataclasses.replace(base_opts, **overrides) if overrides else base_opts
    return build_index(path, column, index_type=itype,
                       metric=meta.get("metric", "l2"), replace=True,
                       options=opts, spark=spark, id_col=meta.get("id_col", id_col))


def search_dataset(
    spark,
    path: str,
    column: str,
    query,
    k: int = 10,
    metric: str = "l2",
    filter=None,
    nprobes: int | None = None,
    ef: int | None = None,
    use_index: bool | None = None,
    options: DatasetOptions | None = None,
    tiebreak_cols=(),
    round_digits: int | None = None,
):
    """Unified dataset vector search: the reference's ``useIndex``
    contract (ref LanceVectorSearch.java:146-163 — Lance takes the ANN
    index when one exists, else scans brute force).

    ``use_index=None`` auto-detects; ``False`` forces the exact
    distributed scan (the recall baseline); ``True`` requires an index
    and raises if absent. The indexed path reads the metric from the
    index metadata — a caller-supplied ``metric`` that disagrees raises
    rather than silently returning distances in the wrong space.

    Routing mirrors Lance: the index type that was BUILT determines the
    search path — an HNSW graph present → ef-driven graph traversal in
    the probed cells (hnsw.hnsw_search); else PQ codes present → ADC +
    refine (pq.pq_search, composing IVF cell pruning when the coarse
    index coexists); IVF only → exact search in probed cells; no index →
    brute force. s3:// datasets route IDENTICALLY through the
    object-storage index plane (``_indexes/<col>/<kind>`` engine
    datasets, ``options.s3`` credentials); an index-less remote dataset
    serves the exact distributed scan through the remote pushdown
    reader."""
    from .hnsw import hnsw_search
    from .operators.knn import knn
    from .pq import pq_search
    from .sources.fs import is_remote
    from .sources.reader import read_dataset

    remote = is_remote(path)
    s3 = options.s3 if options is not None else None
    storage = s3.to_storage_options() if (remote and s3) else None

    # ONE metadata pass over the three kinds (presence + content per
    # _idx_meta_remote call) — on s3:// this is 3 manifest fetches total
    # instead of the ~5-8 separate has_*/read_*_meta round-trips
    metas = _kind_metas(path, column, storage)
    use = bool(metas) if use_index is None else use_index
    if use and "hnsw" in metas:
        h_meta = metas["hnsw"]
        if metric and h_meta.get("metric", metric) != metric:
            raise ValueError(
                f"HNSW index on {path}:{column} was built for metric "
                f"{h_meta['metric']!r}, not {metric!r} — rebuild or search brute-force"
            )
        np_ = nprobes if "ivf" in metas else None
        eff = ef if ef is not None else (options.vector_ef if options is not None else None)
        return hnsw_search(spark, path, column, query, k=k, nprobes=np_, ef=eff,
                           tiebreak_cols=tiebreak_cols, round_digits=round_digits,
                           filter=filter, s3=s3, _metas=metas)
    if use and "pq" in metas:
        pq_meta = metas["pq"]
        if metric and pq_meta.get("metric", metric) != metric:
            raise ValueError(
                f"PQ index on {path}:{column} was built for metric "
                f"{pq_meta['metric']!r}, not {metric!r} — rebuild or search brute-force"
            )
        np_ = nprobes if "ivf" in metas else None
        refine = (options.vector_refine_factor if options is not None
                  and options.vector_refine_factor else 10)
        # vector.ef bounds the ADC candidate pool on the DataFrame path
        # too (ref config/LanceOptions.java:224-228)
        eff = ef if ef is not None else (options.vector_ef if options is not None else None)
        return pq_search(spark, path, column, query, k=k, refine_factor=refine,
                         nprobes=np_, ef=eff, tiebreak_cols=tiebreak_cols,
                         round_digits=round_digits, filter=filter, s3=s3,
                         _metas=metas)
    if use:
        meta = metas.get("ivf")
        if meta is None:
            raise FileNotFoundError(
                f"use_index=True but no ANN index on {path}:{column}; "
                "build_index first")
        if metric and meta.get("metric", metric) != metric:
            raise ValueError(
                f"index on {path}:{column} was built for metric "
                f"{meta['metric']!r}, not {metric!r} — rebuild or search brute-force"
            )
        return ivf_index_knn(spark, path, column, query, k=k, nprobes=nprobes,
                             ef=ef, options=options, tiebreak_cols=tiebreak_cols,
                             round_digits=round_digits, filter=filter,
                             _meta=meta)
    if remote:
        from .sources.maintenance import _remote_reader

        base = _remote_reader(spark, path, s3)
    else:
        base = read_dataset(spark, path)
    return knn(base, column, query, k=k, metric=metric,
               filter=filter, tiebreak_cols=tiebreak_cols, round_digits=round_digits)
