"""Dataset maintenance: incremental version-delta reads and fragment
compaction over the versioned fragment model (sources/fragments.py).

Both are table-maintenance primitives the Lance ecosystem exposes
natively (dataset.optimize / incremental scans); here they run on the
manifest chain, so they work on the emulated backend and translate 1:1
to the native one.

- ``read_version_delta`` reads ONLY the fragments added between two
  versions — the incremental-processing primitive: a downstream pipeline
  checkpoints the version it last processed and consumes appends without
  rescanning the table. File-level semantics: an overwrite commit
  replaces the fragment list, so after an overwrite the delta is the new
  list (there is no row-level diff to recover).

- ``compact_dataset`` rewrites runt fragments into target-sized ones and
  commits the result as a NEW version (old versions keep reading the old
  files — fragments are immutable, MVCC preserved). At 100 TB this is
  the defragmentation pass that keeps scan task counts sane: thousands
  of micro-batch appends otherwise mean thousands of tiny input splits
  per query.

- ``vacuum_dataset`` is the matching garbage collector: retain the last
  N versions, delete older manifests and any fragment file no retained
  version references (crash-safe deletion order: manifests before data).
"""

from __future__ import annotations

import os
import shutil
import uuid

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from . import fragments as FR


def read_version_delta(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Rows in fragments present in ``to_version`` (default: latest) but
    not in ``from_version`` — the appended data between the two commits."""
    m_from = FR.read_manifest(path, from_version)
    m_to = FR.read_manifest(path, to_version)
    if m_to.version < m_from.version:
        raise ValueError(
            f"to_version {m_to.version} precedes from_version {m_from.version}"
        )
    known = {f.file for f in m_from.fragments}
    new_files = [os.path.join(path, f.file) for f in m_to.fragments if f.file not in known]
    if not new_files:
        any_file = os.path.join(path, m_to.fragments[0].file) if m_to.fragments else None
        if any_file is None:
            raise FileNotFoundError(f"dataset {path} has no fragments at v{m_to.version}")
        return spark.read.parquet(any_file).limit(0)
    return spark.read.parquet(*new_files)


def vacuum_dataset(
    path: str,
    keep_versions: int = 2,
    dry_run: bool = False,
) -> dict:
    """MVCC garbage collection: drop manifests older than the newest
    ``keep_versions`` and delete fragment files no retained version
    references. Without this, compaction/appends accrete files forever —
    at 100 TB the dead-file volume quickly exceeds the live table.

    Deletion order is crash-safe: old manifests are removed FIRST, then
    unreferenced data files — a crash mid-vacuum can only leave orphaned
    (invisible) data files, never a manifest pointing at deleted data.
    Readers of retained versions are unaffected (their file sets are
    untouched); readers pinned to a vacuumed version fail fast on the
    missing manifest, the same contract as Lance's own cleanup.

    Returns ``{"kept_versions": [...], "dropped_versions": n,
    "deleted_files": n, "reclaimed_bytes": n}``; ``dry_run`` reports
    without deleting."""
    latest = FR.latest_version(path)
    if latest is None:
        raise FileNotFoundError(f"not a dataset (no {FR.VERSIONS_DIR}/): {path}")
    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    all_versions = sorted(
        int(name.split(".")[0])
        for name in os.listdir(os.path.join(path, FR.VERSIONS_DIR))
        if name.endswith(".manifest.json")
    )
    kept = all_versions[-keep_versions:]
    dropped = [v for v in all_versions if v not in kept]
    live = {f.file for v in kept for f in FR.read_manifest(path, v).fragments}
    data_dir = os.path.join(path, FR.DATA_DIR)
    dead = [
        os.path.join(FR.DATA_DIR, name)
        for name in (os.listdir(data_dir) if os.path.isdir(data_dir) else [])
        if os.path.join(FR.DATA_DIR, name) not in live
    ]
    reclaimed = sum(os.path.getsize(os.path.join(path, f)) for f in dead)
    if not dry_run:
        for v in dropped:  # manifests first: see crash-safety note above
            os.remove(os.path.join(path, FR.VERSIONS_DIR, f"{v}.manifest.json"))
        for f in dead:
            os.remove(os.path.join(path, f))
    return {
        "kept_versions": kept,
        "dropped_versions": len(dropped),
        "deleted_files": len(dead),
        "reclaimed_bytes": reclaimed,
    }


def compact_dataset(
    spark: SparkSession,
    path: str,
    target_rows_per_fragment: int = 1_000_000,
    small_threshold: int | None = None,
) -> FR.Manifest:
    """Merge fragments smaller than ``small_threshold`` (default: half the
    target) into ~``target_rows_per_fragment``-row fragments; commit as a
    new version. No-op (returns the current manifest) when fewer than two
    runt fragments exist."""
    threshold = small_threshold if small_threshold is not None else target_rows_per_fragment // 2
    manifest = FR.read_manifest(path)
    small = [f for f in manifest.fragments if f.row_count < threshold]
    if len(small) < 2:
        return manifest
    keep = [f for f in manifest.fragments if f.row_count >= threshold]

    # executors rewrite the runt rows into target-sized files in a staging
    # dir; the driver promotes them and commits one new version
    stage = os.path.join(path, f"_compact-{uuid.uuid4().hex}")
    data_dir = os.path.join(path, FR.DATA_DIR)
    try:
        (
            spark.read.parquet(*[os.path.join(path, f.file) for f in small])
            .write.option("maxRecordsPerFile", target_rows_per_fragment)
            .mode("overwrite")
            .parquet(stage)
        )
        merged: list[FR.FragmentInfo] = []
        for name in sorted(os.listdir(stage)):
            if not name.endswith(".parquet"):
                continue
            frag_name = FR.new_fragment_name()
            src = os.path.join(stage, name)
            rows = pq.read_metadata(src).num_rows  # footer only
            stats = FR.parquet_fragment_stats(src)
            shutil.move(src, os.path.join(data_dir, frag_name))
            merged.append(
                FR.FragmentInfo(0, os.path.join(FR.DATA_DIR, frag_name), rows, stats)
            )
        fragments = [
            FR.FragmentInfo(i, f.file, f.row_count, f.stats)
            for i, f in enumerate(keep + merged)
        ]
        return FR.commit(
            path,
            fragments,
            mode="overwrite",
            meta={"compaction": {"merged": len(small), "into": len(merged),
                                 "base_version": manifest.version}},
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
