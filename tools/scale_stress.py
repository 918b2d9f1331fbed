"""Scale-stress harness: measure how the scale-sensitive operators behave
when the corpus grows 10x, as direct evidence for the 100 TB design goal.

Usage (each step is a separate process so timings are not contaminated —
never run anything else Spark-sized on the box concurrently):

    python tools/scale_stress.py gen      # synthesize the 10x corpus
    python tools/scale_stress.py run      # time queries at 1x vs 10x

``gen`` replicates the sf0.1 documents/embeddings tables 10x with
realistic duplicate structure: ~10% of replica groups stay exact copies
(duplicate clusters of size 10), the rest get unique perturbations —
so dedup operators see both true clusters and a large distinct mass,
not a degenerate dup-bomb.

Reading the ratios: a clean operator lands near the data growth ONLY if
its *output* also grows linearly. The dup-cluster construction makes
pair outputs grow ~45x per cluster (10 copies -> C(10,2) pairs), so
pair-producing dedup queries are expected somewhat above 10/10 = 1.0x
per-row cost; what the harness guards against is the quadratic cliff
(the all-pairs 34.9x regression this caught in round 2).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from flink_connector_lance_spark.io import load_table  # noqa: E402
from flink_connector_lance_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/stress/sf1x10"
REPL = 10
QUERIES = [
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash", "dedup_embedding_cosine", "ann_lsh",
    "ann_ivf_coarse", "knn_cosine", "text_stats", "text_langid_fingerprint",
    "events_asof_attribution", "events_range_join", "knn_join_batch",
    "train_split_stratified",
    # round-3 operators. ann_ivf_pq's first call per sf dir BUILDS the PQ
    # index (codebook k-means), so its ratio measures build scaling, not
    # steady-state search — read it as the index-build row.
    "ann_ivf_pq", "text_pii_redact", "pack_sequences",
    # round-4: the full maintenance lifecycle (overwrite/append/compact/
    # DELETE/MERGE/vacuum — mutation cost, not scan cost); knn_join_batch
    # above now also carries the LSH corpus-vs-corpus branch, and
    # dedup_ngram_jaccard the decontamination branch.
    "source_version_travel",
    # round-4 additions riding existing entries: text_stats now includes
    # the BM25 branch; source_roundtrip_agg the incremental-rollup
    # lifecycle; source_format_api bloom-filter writes + point lookup.
    "source_roundtrip_agg", "source_format_api",
    # round-5 additions ride existing entries too: dedup_embedding_cosine
    # now runs the quantize (int8 checksum+fidelity) and semantic
    # (seed-centroid SemDeDup) branches; source_version_travel adds the
    # row-level CDC stage (read_changes) and the schema-evolution stages
    # (evolving append, add_column backfill, O(1) drop);
    # source_roundtrip_agg adds the HLL approx_distinct rollup state.
    # round-6: source_roundtrip_agg also carries the fixed-bin histogram
    # rollup state (50 unrolled per-bin sums, element-wise-sum merge);
    # ingest-time clustering is timed via the clustered_write EXTRA below;
    # text_stats adds the model_quality hashed-feature classifier score
    # (one more zero-shuffle projection riding the same corpus pass).
    # round-8: the retrieval family — vector_search_udtf builds an FTS
    # positional index over the corpus EVERY call (build cost scales
    # with rows) then runs six search modalities (vector KNN, BM25,
    # phrase, match_all, indexed hybrid RRF, token-Jaccard rerank) whose
    # search IO is bounded by the query terms' postings / top-k
    # candidates, so the ratio reads as index-build scaling plus
    # near-flat search. source_version_travel also gained the
    # auto-maintenance pass (compact+vacuum policy run + describe).
    # round-9: source_version_travel adds the native_evolve stage
    # (evolving append + metadata-only drop on a REAL Lance v2 binary
    # dataset — O(new rows) write + O(1) drop, so the stage tracks the
    # appended slice, not the table); source_format_api's native branch
    # now rides a struct column through the codec.
    "vector_search_udtf",
]


def _semantic_dedup(spark, sf_dir):
    """Cell size held constant (~64 rows) as n grows — the SemDeDup
    contract: the quadratic within-cell cost scales with n, not n^2."""
    from flink_connector_lance_spark.operators.semantic import semantic_dedup

    e = load_table(spark, sf_dir, "embeddings")
    k = max(8, e.count() // 64)
    return semantic_dedup(e, "vec_id", "embedding", num_clusters=k, eps=0.98,
                          iterations=2)


def _quantize_knn(spark, sf_dir):
    """int8 round-trip + exact top-10 cosine over the reconstruction."""
    from flink_connector_lance_spark.operators.knn import knn
    from flink_connector_lance_spark.operators.quantize import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = [0.1] * 64
    recon = dequantize_embeddings(
        quantize_embeddings(e, "embedding").select("vec_id", "codes", "scale"),
        vector_col="embedding",
    )
    return knn(recon, "embedding", q, k=10, metric="cosine",
               tiebreak_cols=["vec_id"], round_digits=6)


def _clustered_write(spark, sf_dir):
    """Ingest-time clustering (write.sort-by + write.cluster): one range
    shuffle + within-partition sorts — cost must scale with rows written.
    The read-back applies a narrow range filter, so the timing also
    covers the zone-map pruning the clustered layout is for."""
    import os
    import shutil
    import tempfile

    from flink_connector_lance_spark.options import DatasetOptions
    from flink_connector_lance_spark.sources.reader import read_dataset
    from flink_connector_lance_spark.sources.writer import write_dataset

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars", "lang")
    path = os.path.join(tempfile.gettempdir(), "stress-clustered-write")
    shutil.rmtree(path, ignore_errors=True)
    write_dataset(d, path, mode="overwrite",
                  options=DatasetOptions(path=path, sort_columns=["n_chars"],
                                         cluster_on_write=True,
                                         write_max_rows_per_file=100_000))
    return read_dataset(spark, path, filter="n_chars > 100 AND n_chars < 120")


def _fts_hybrid(spark, sf_dir):
    """FTS index build (one explode pass + one range shuffle — must scale
    with corpus rows) + hybrid RRF search with the lexical leg served
    from the postings index (IO bounded by the query terms' postings, so
    the search share of the timing should NOT grow with the corpus)."""
    import os
    import shutil
    import tempfile

    from flink_connector_lance_spark.operators.retrieval import (
        hybrid_search_indexed,
    )
    from flink_connector_lance_spark.queries.knn import QVEC
    from flink_connector_lance_spark.sources.datasource import (
        register_lance_datasource,
    )
    from flink_connector_lance_spark.sources.fts import create_fts_index

    register_lance_datasource(spark)
    path = os.path.join(tempfile.gettempdir(), "stress-fts")
    shutil.rmtree(path, ignore_errors=True)
    (load_table(spark, sf_dir, "documents").select("doc_id", "text")
     .write.format("lance").mode("overwrite").save(path))
    create_fts_index(spark, path, "text", "doc_id")
    e = load_table(spark, sf_dir, "embeddings")
    return hybrid_search_indexed(spark, path, "vector hash join", e,
                                 "embedding", "vec_id", QVEC, k=10)


def _native_codec_roundtrip(spark, sf_dir):
    """REAL-Lance-v2 write + read through the stdlib codec
    (sources/lance_format.py): one .lance fragment per task on write,
    one decode task per fragment on read — both must scale with rows.
    Each fragment single-buffers in memory, so write.max-rows-per-file
    bounds the per-task footprint (the knob that keeps the codec safe at
    100 TB fragment counts)."""
    import os
    import shutil
    import tempfile

    from flink_connector_lance_spark.options import DatasetOptions
    from flink_connector_lance_spark.sources.reader import read_dataset
    from flink_connector_lance_spark.sources.writer import write_native_pure

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    path = os.path.join(tempfile.gettempdir(), "stress-native-codec")
    shutil.rmtree(path, ignore_errors=True)
    write_native_pure(d, path, mode="overwrite",
                      options=DatasetOptions(path=path,
                                             write_max_rows_per_file=50_000))
    return read_dataset(spark, path, columns=["doc_id", "lang"])


def _native_maintenance(spark, sf_dir):
    """Full maintenance lifecycle on a REAL-Lance dataset through the
    stdlib codec: clustered write, runt appends, copy-on-write DELETE
    (probe scan + affected-fragment rewrite — cost must track the
    affected rows, not the table), compaction, vacuum, and a pruned
    read-back. The emulated twin rides source_version_travel; this row
    pins that the binary-format path scales the same way."""
    import os
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from flink_connector_lance_spark.options import DatasetOptions
    from flink_connector_lance_spark.sources.maintenance import (
        compact_dataset,
        delete_rows,
        vacuum_dataset,
    )
    from flink_connector_lance_spark.sources.reader import read_dataset
    from flink_connector_lance_spark.sources.writer import write_native_pure

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = os.path.join(tempfile.gettempdir(), "stress-native-maint")
    shutil.rmtree(path, ignore_errors=True)
    write_native_pure(d, path, mode="overwrite",
                      options=DatasetOptions(path=path, sort_columns=["doc_id"],
                                             cluster_on_write=True,
                                             write_max_rows_per_file=50_000))
    # three runt appends, then a ~1% delete touching few fragments
    for i in range(3):
        write_native_pure(d.filter(F.col("doc_id") % 1000 == i).coalesce(1),
                          path, mode="append")
    delete_rows(spark, path, "doc_id % 100 = 7")
    compact_dataset(spark, path, target_rows_per_fragment=50_000,
                    small_threshold=10_000)
    vacuum_dataset(path, keep_versions=1)
    return read_dataset(spark, path, columns=["doc_id", "lang"],
                        filter="doc_id < 1000")


def _native_codec_21_fsst(spark, sf_dir):
    """The round-12 codec arms under 10x load (round-12 verdict "do
    this" #5): 2.1 structural layout + FSST value compression over a
    string column AND a shredded list<struct<term, pos>> column (the
    recursive Dremel path). The pure-Python planner pays
    ``to_pylist()`` per page — this row is where a super-linear blowup
    in that trade would show up first; per-task cost stays bounded by
    write.max-rows-per-file regardless."""
    import os
    import shutil
    import tempfile

    from flink_connector_lance_spark.options import DatasetOptions
    from flink_connector_lance_spark.sources.reader import read_dataset
    from flink_connector_lance_spark.sources.writer import write_native_pure

    d = (load_table(spark, sf_dir, "documents")
         .select("doc_id", "text", "lang")
         .withColumn(
             "terms",
             F.expr("transform(slice(split(text, ' '), 1, 24), "
                    "(t, i) -> struct(t AS term, i AS pos))")))
    path = os.path.join(tempfile.gettempdir(), "stress-native-21fsst")
    shutil.rmtree(path, ignore_errors=True)
    write_native_pure(
        d, path, mode="overwrite",
        options=DatasetOptions(path=path, write_max_rows_per_file=20_000,
                               native_layout="2.1-miniblock",
                               native_compression="fsst"))
    return read_dataset(spark, path, columns=["doc_id", "terms"])


# operators without a registry entry (not SQL-oracle-expressible / no
# free query slot): timed via direct callables, same protocol
EXTRA = {
    "semantic_dedup": _semantic_dedup,
    "quantize_knn": _quantize_knn,
    "clustered_write": _clustered_write,
    "fts_build_hybrid_search": _fts_hybrid,
    "native_codec_roundtrip": _native_codec_roundtrip,
    "native_maintenance": _native_maintenance,
    "native_codec_21_fsst": _native_codec_21_fsst,
}


def gen() -> None:
    spark = get_spark(app_name="stress-gen")
    spark.sparkContext.setLogLevel("ERROR")
    reps = spark.range(REPL).withColumnRenamed("id", "rep")
    d = load_table(spark, BASE, "documents")
    docs10 = (
        d.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 1_000_000)
        .withColumn(
            "text",
            F.when(
                (F.col("doc_id") % 10 != 0) & (F.col("rep") > 0),
                F.concat("text", F.lit(" variant "), F.col("rep").cast("string"),
                         F.lit("-"), F.col("doc_id").cast("string")),
            ).otherwise(F.col("text")),
        )
        .drop("rep")
    )
    docs10.repartition(32).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")
    e = load_table(spark, BASE, "embeddings")
    emb10 = (
        e.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * 1_000_000)
        .withColumn(
            "embedding",
            F.transform("embedding", lambda x, i: x + (F.col("rep") * 0.001) * ((i % 3) - 1)),
        )
        .withColumn("embedding", F.col("embedding").cast("array<float>"))
        .drop("rep")
    )
    emb10.repartition(16).write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")
    # events: replicas get DISTINCT user ids (10x users at the same per-user
    # event density) so temporal-join outputs grow linearly with the data —
    # replicating onto the same users would densify the timeline and grow
    # in-band pair outputs quadratically, measuring the data not the plan
    ev = load_table(spark, BASE, "events")
    ev10 = (
        ev.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * 10_000_000)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * 1_000)
        .withColumn("ts", F.timestamp_micros(F.unix_micros("ts") + F.col("rep")))
        .drop("rep")
    )
    ev10.repartition(16).write.mode("overwrite").parquet(f"{OUT}/events.parquet")
    print("rows:", spark.read.parquet(f"{OUT}/documents.parquet").count(),
          spark.read.parquet(f"{OUT}/embeddings.parquet").count(),
          spark.read.parquet(f"{OUT}/events.parquet").count())
    spark.stop()


def run() -> None:
    import os as _os

    from flink_connector_lance_spark import registry

    spark = get_spark(app_name="stress-run")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    # settle + warm (round 13): the x1 phase runs FIRST, so a sweep
    # launched right after `gen` (or any other load) charges the decay
    # to x1 and fabricates sub-1.0 "10x was faster" ratios. Wait for
    # the 1-minute loadavg to drain (bounded), then run one cheap query
    # to pay JVM/Python-worker/parquet-footer warmup outside the clock.
    waited = 0.0
    while _os.getloadavg()[0] > 2.0 and waited < 300:
        print(f"stress: waiting for load to drain "
              f"(1m loadavg {_os.getloadavg()[0]:.1f})", file=sys.stderr)
        time.sleep(15)
        waited += 15
    qs["flagship_category_count"](spark, BASE).write.format("noop") \
        .mode("overwrite").save()
    out: dict[str, dict[str, float]] = {}
    for sf_dir, tag in [(BASE, "x1"), (OUT, "x10")]:
        for name in QUERIES + list(EXTRA):
            fn = qs[name] if name in qs else EXTRA[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out.setdefault(name, {})[tag] = round(time.perf_counter() - t0, 2)
    for v in out.values():
        v["ratio"] = round(v["x10"] / v["x1"], 1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    {"gen": gen, "run": run}[sys.argv[1]]()
