"""Source-layer queries: put the fragment dataset read/write path itself
under the correctness gate. Each query materializes a versioned dataset
from a corpus table, reads it back through ``read_dataset``, and the
oracle runs the equivalent SQL on the original table — so any loss or
duplication in the write->commit->read cycle breaks the hash match.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register
from ..sources.reader import read_dataset
from ..sources.writer import write_dataset


def _workdir(tag: str, sf_dir: str) -> str:
    sf = os.path.basename(sf_dir.rstrip("/"))
    root = os.path.join(tempfile.gettempdir(), "fcls_datasets", f"{tag}-{sf}-{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    return root


@register(
    "source_roundtrip_agg",
    oracle="""
    WITH appended AS (
        SELECT doc_id + 30000000 AS doc_id, text, lang, source, n_chars
        FROM documents WHERE lang = 'en'
    ),
    all_rows AS (SELECT * FROM documents UNION ALL SELECT * FROM appended),
    vocab AS (
        SELECT term, count(*) AS df FROM (
            SELECT unnest(string_split(text, ' ')) AS term FROM all_rows)
        GROUP BY term
    )
    SELECT lang, source, count(*) AS cnt,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           ROUND(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars,
           CAST(count(DISTINCT n_chars) AS BIGINT) AS d_chars,
           CAST(sum(LEAST(GREATEST(CAST(FLOOR(n_chars / 10.0) AS BIGINT), 0), 49)
                    + 1) AS BIGINT) AS hist_sig
    FROM all_rows GROUP BY lang, source
    UNION ALL
    SELECT '__vocab__', 'all', count(*),
           CAST(sum(df) AS BIGINT),
           ROUND(CAST(sum(df) AS DOUBLE) / count(*), 4),
           CAST(count(*) FILTER (WHERE df >= 50) AS BIGINT),
           CAST(0 AS BIGINT)
    FROM vocab
    """,
    doc="Lossless write->commit->read PLUS incremental materialized-view "
        "maintenance under the hash gate (sources/rollup.py): write "
        "documents as a fragment dataset, create a (lang, source) rollup "
        "(COUNT/SUM/AVG partial states plus an APPROX_DISTINCT HLL-sketch "
        "state), append the en docs as a version delta, refresh_rollup — "
        "which must take the INCREMENTAL path (delta partial-agg + merge, "
        "never a table rescan; enforced by a hard raise) — then read the "
        "finalized rollup. The oracle recomputes the post-append "
        "aggregate relationally, so a double-count or dropped delta in "
        "the merge algebra breaks the hash; the d_chars column is the "
        "HLL estimate vs the oracle's exact COUNT(DISTINCT) — valid "
        "because at these per-group cardinalities (<100) the Datasketches "
        "HLL is still in its exact sparse mode, so a lossy sketch union "
        "or a double-merged delta shows up as a hash break. The hist_sig "
        "column gates the HISTOGRAM rollup state (exact fixed-bin counts "
        "merged by element-wise sum): sum over bins of count_i*(i+1) "
        "equals the oracle's per-row sum of (bin+1), so a dropped, "
        "shifted, or double-merged bin breaks the hash. The __vocab__ row "
        "gates the PRE-TRANSFORM rollup (the incrementally maintained "
        "inverted index): a per-term document-frequency rollup whose "
        "persisted explode(split(text)) transform is re-applied to the "
        "append delta only, summarized as (distinct terms, total "
        "occurrences, mean df, terms with df>=50) against the oracle's "
        "relational unnest mirror "
        "(sources/writer.py, sources/reader.py; ref "
        "LanceSink.java:133-199 / LanceSource.java).",
)
def source_roundtrip_agg(spark, sf_dir):
    from ..sources.rollup import create_rollup, read_rollup, refresh_rollup

    d = load_table(spark, sf_dir, "documents")
    path = _workdir("roundtrip", sf_dir)
    write_dataset(d, path, mode="overwrite")
    create_rollup(
        spark, path, "by_lang_source", ["lang", "source"],
        {"cnt": "count", "sum_chars": ("sum", "n_chars"),
         "avg_chars": ("avg", "n_chars"),
         "d_chars": ("approx_distinct", "n_chars"),
         "hist_chars": ("histogram", "n_chars", 0, 500, 50)},
    )
    # inverted index as a rollup: the persisted explode(split) transform
    # re-applies to each append delta, so per-term corpus frequencies
    # stay fresh at O(delta) — the BM25 document-frequency half
    create_rollup(spark, path, "terms", ["term"], {"df": "count"},
                  pre_transform=["explode(split(text, ' ')) AS term"])
    appended = d.filter(F.col("lang") == "en").withColumn(
        "doc_id", F.col("doc_id") + 30_000_000
    )
    write_dataset(appended, path, mode="append")
    for name in ("by_lang_source", "terms"):
        res = refresh_rollup(spark, path, name)
        if res["mode"] != "incremental":  # the 100 TB contract: no rescan
            raise RuntimeError(f"expected incremental refresh of {name}, got {res}")
    # histogram signature: sum_i count_i * (i+1) == the oracle's per-row
    # sum of (bin+1) — unrolled element_at terms stay in codegen
    sig = None
    for i in range(50):
        term = F.element_at(F.col("hist_chars"), i + 1) * F.lit(i + 1)
        sig = term if sig is None else (sig + term)
    main = read_rollup(spark, path, "by_lang_source").select(
        "lang", "source", "cnt",
        F.col("sum_chars").cast("bigint").alias("sum_chars"),
        F.round(F.col("avg_chars"), 4).alias("avg_chars"),
        F.col("d_chars").cast("bigint").alias("d_chars"),
        sig.cast("bigint").alias("hist_sig"),
    )
    vocab = read_rollup(spark, path, "terms").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("df").cast("bigint").alias("sum_chars"),
        F.round(F.sum("df").cast("double") / F.count(F.lit(1)), 4).alias("avg_chars"),
        F.sum((F.col("df") >= 50).cast("bigint")).cast("bigint").alias("d_chars"),
    ).select(
        F.lit("__vocab__").alias("lang"), F.lit("all").alias("source"),
        "cnt", "sum_chars", "avg_chars", "d_chars",
        F.lit(0).cast("bigint").alias("hist_sig"),
    )
    return main.unionByName(vocab)


@register(
    "source_version_travel",
    oracle="""
    WITH appended AS (
        SELECT doc_id + 10000000 AS doc_id, text, CAST(NULL AS VARCHAR) AS lang,
               source, n_chars FROM documents WHERE lang = 'en'
        UNION ALL
        SELECT doc_id + 20000000 AS doc_id, text, lang, source, n_chars
        FROM documents WHERE lang = 'de'
    ),
    v1 AS (SELECT * FROM documents UNION ALL SELECT * FROM appended),
    deleted AS (SELECT * FROM v1 WHERE lang IS NULL OR lang <> 'de'),
    upd AS (SELECT doc_id, text, 'xx' AS lang, source, n_chars * 2 + 1 AS n_chars
            FROM documents WHERE doc_id % 5 = 0),
    merged AS (
        SELECT * FROM deleted WHERE doc_id NOT IN (SELECT doc_id FROM upd)
        UNION ALL SELECT * FROM upd
    ),
    appended2 AS (
        SELECT doc_id + 40000000 AS doc_id, text, 'zz' AS lang, source, n_chars,
               n_chars + 7 AS extra
        FROM documents WHERE doc_id % 3 = 0
    ),
    evolved AS (
        SELECT doc_id, text, lang, source, n_chars, CAST(NULL AS INT) AS extra
        FROM merged
        UNION ALL SELECT * FROM appended2
    )
    SELECT 'v0' AS stage, count(*) AS cnt,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM documents
    UNION ALL SELECT 'v1', count(*), CAST(sum(n_chars) AS BIGINT) FROM v1
    UNION ALL SELECT 'v1_meta', count(*), CAST(0 AS BIGINT) FROM v1
    UNION ALL SELECT 'compacted', count(*), CAST(sum(n_chars) AS BIGINT) FROM v1
    UNION ALL SELECT 'deleted', count(*), CAST(sum(n_chars) AS BIGINT) FROM deleted
    UNION ALL SELECT 'merged', count(*), CAST(sum(n_chars) AS BIGINT) FROM merged
    UNION ALL SELECT 'changes', (SELECT count(*) FROM upd),
              (SELECT count(*) FROM deleted
               WHERE doc_id IN (SELECT doc_id FROM upd))
    UNION ALL SELECT 'maint', count(*), CAST(sum(n_chars) AS BIGINT)
    FROM merged
    UNION ALL SELECT 'evolved_append', count(*),
              CAST(sum(coalesce(extra, 0)) AS BIGINT) FROM evolved
    UNION ALL SELECT 'evolved', count(*),
              CAST(sum(n_chars % 97) AS BIGINT) FROM evolved
    UNION ALL SELECT 'dropped', count(*), CAST(sum(n_chars) AS BIGINT) FROM evolved
    UNION ALL SELECT 'vacuumed', count(*), CAST(sum(n_chars) AS BIGINT) FROM evolved
    UNION ALL
    SELECT 'native_evolve', count(*), CAST(sum(coalesce(extra, 0)) AS BIGINT)
    FROM (
        SELECT doc_id, n_chars, CAST(NULL AS BIGINT) AS extra
        FROM documents WHERE doc_id % 11 = 0
        UNION ALL
        SELECT doc_id + 50000000, n_chars, CAST(n_chars + 3 AS BIGINT)
        FROM documents WHERE doc_id % 13 = 0
    )
    UNION ALL
    SELECT 'native_dv_delete', count(*), CAST(sum(n_chars) AS BIGINT)
    FROM (
        SELECT n_chars FROM documents WHERE doc_id % 11 = 0
        UNION ALL
        SELECT n_chars FROM documents WHERE doc_id % 13 = 0
    ) WHERE n_chars >= 100
    """,
    doc="Full MVCC maintenance + schema-evolution lifecycle under the hash "
        "gate: overwrite v0, append v1 (en copies with NULL lang + de "
        "copies, ONE fragment so the later DELETE rewrite must preserve "
        "NULL-predicate rows), metadata-only COUNT(*) (v1_meta; ref "
        "LanceInputFormat.java:117 analog), compact_dataset (merge runts, "
        "rows unchanged), delete_rows `lang = 'de'` (three-valued logic: "
        "NULL-lang rows survive), merge_rows upsert of every 5th doc "
        "(n_chars*2+1, lang 'xx') plus re-insert of deleted upserted keys. "
        "Then one policy-driven auto-maintenance pass "
        "(auto_maintenance.run_maintenance: compact+vacuum evaluated and "
        "executed on the post-merge layout) with describe_dataset's "
        "metadata-only num_rows cross-checked against the data read — "
        "the 'maint' stage hashes (count, sum) that maintenance must "
        "carry through unchanged. Then the row-level CDC read (maintenance.read_changes — the "
        "changefeed the file-level delta cannot express across rewrites): "
        "the 'changes' stage counts insert post-images vs delete "
        "pre-images across the merge, with carried rows cancelling in the "
        "multiset difference, so a rewrite that leaks or drops a carried "
        "row breaks the hash. "
        "Then schema evolution (sources/schema_evolution.py): an EVOLVING "
        "append adds an `extra` column (write.schema-evolution opt-in; "
        "pre-evolution fragments null-fill — 'evolved_append' sums "
        "coalesce(extra,0), so a mis-filled old row breaks the hash); "
        "add_column backfills a computed `bonus = n_chars % 97` over the "
        "whole table ('evolved' sums it); drop_columns('lang') is an O(1) "
        "metadata-only commit ('dropped' re-reads counts, and the query "
        "hard-raises unless lang is GONE from the current schema while "
        "the pre-drop version still time-travels WITH it). Finally "
        "vacuum_dataset keep_versions=1 and a post-vacuum read. The "
        "'native_evolve' stage repeats the evolution lifecycle over a "
        "REAL Lance v2 binary dataset through the stdlib codec: an "
        "evolving append rides a new column after the live schema with "
        "fresh field ids (pre-evolution fragments null-fill through the "
        "per-file descriptor alignment) and a metadata-only native "
        "drop_columns narrows the manifest while the pre-drop version "
        "time-travels intact — every summed value crossed the binary "
        "encoder AND decoder across the evolution. The "
        "'native_dv_delete' stage then runs a deletion-VECTOR DELETE "
        "(lance's own DELETE shape: data files byte-identical, one Arrow "
        "tombstone sidecar per affected fragment, O(deleted rows) IO) — "
        "the hash catches any read route that fails to mask the "
        "tombstones. Each stage's "
        "(count, sum) is reproduced relationally by the DuckDB oracle "
        "(sources/maintenance.py, sources/schema_evolution.py; ref "
        "LanceSink.java:163-189).",
)
def source_version_travel(spark, sf_dir):
    from ..sources import fragments as FR
    from ..sources.maintenance import (
        compact_dataset,
        delete_rows,
        merge_rows,
        read_changes,
        vacuum_dataset,
    )
    from ..sources.reader import count_rows

    d = load_table(spark, sf_dir, "documents")
    path = _workdir("versions", sf_dir)
    write_dataset(d, path, mode="overwrite")  # v0
    appended = (
        d.filter(F.col("lang") == "en")
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
        .withColumn("lang", F.lit(None).cast("string"))
        .unionByName(
            d.filter(F.col("lang") == "de")
            .withColumn("doc_id", F.col("doc_id") + 20_000_000)
        )
    )
    # ONE appended fragment mixing deletable ('de') and NULL-lang rows:
    # the DELETE below must rewrite it and keep the NULL rows
    write_dataset(appended.coalesce(1), path, mode="append")  # v1

    # stages mutate the dataset (vacuum deletes old files), so each
    # snapshot is collected eagerly — one metadata-sized agg row per stage
    def snap(tag: str, version: int | None = None, zero_sum: bool = False):
        r = (
            read_dataset(spark, path, version=version)
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("n_chars").alias("s"))
            .first()
        )
        return (tag, r.cnt, 0 if zero_sum else r.s)

    rows = [snap("v0", version=0), snap("v1", version=1)]
    rows.append(("v1_meta", count_rows(path, version=1), 0))
    compact_dataset(spark, path, target_rows_per_fragment=1_000_000)
    rows.append(snap("compacted"))
    delete_rows(spark, path, "lang = 'de'")
    v_del = FR.latest_version(path)
    rows.append(snap("deleted"))
    upd = (
        d.filter(F.col("doc_id") % 5 == 0)
        .withColumn("lang", F.lit("xx"))
        .withColumn("n_chars", F.col("n_chars") * 2 + 1)
    )
    merge_rows(spark, path, upd, key="doc_id")
    v_mrg = FR.latest_version(path)
    rows.append(snap("merged"))
    # row-level CDC across the merge (maintenance.read_changes): every
    # upserted key appears as its insert post-image; pre-images of keys
    # that EXISTED appear as deletes; rows the rewrite merely carried
    # (same fragments, unchanged bytes) cancel and contribute nothing —
    # cnt = inserts, sum_chars = deletes, both reproduced relationally
    ch = (
        read_changes(spark, path, v_del, v_mrg)
        .agg(
            F.sum(F.when(F.col("_change_type") == "insert", 1).otherwise(0)).alias("ins"),
            F.sum(F.when(F.col("_change_type") == "delete", 1).otherwise(0)).alias("dels"),
        ).first()
    )
    rows.append(("changes", ch.ins, ch.dels))

    # --- auto-maintenance + describe under the hash gate ---
    # one policy-driven run_maintenance pass (auto_maintenance.py) over
    # the post-merge layout: compact/vacuum decisions evaluated and
    # executed, then describe_dataset's metadata-only num_rows is
    # cross-checked against the data read — the 'maint' stage hashes
    # (count, sum) which maintenance must carry through UNCHANGED
    from ..sources.auto_maintenance import MaintenancePolicy, run_maintenance
    from ..sources.maintenance import describe_dataset

    desc = describe_dataset(path)
    report = run_maintenance(
        spark, path,
        MaintenancePolicy(target_rows_per_fragment=1_000_000, keep_versions=2))
    step_names = {s["step"] for s in report["steps"]}
    if not {"compact", "vacuum"} <= step_names:
        raise RuntimeError(f"maintenance pass missing steps: {step_names}")
    desc2 = describe_dataset(path)
    m_snap = snap("maint")
    if desc["num_rows"] != m_snap[1] or desc2["num_rows"] != m_snap[1]:
        raise RuntimeError(
            f"describe_dataset num_rows {desc['num_rows']}/{desc2['num_rows']}"
            f" != read count {m_snap[1]}")
    if desc2["version"] < desc["version"]:
        raise RuntimeError("maintenance moved the version backwards")
    rows.append(m_snap)

    # --- schema evolution stages (sources/schema_evolution.py) ---
    from ..options import DatasetOptions
    from ..sources.schema_evolution import add_column, drop_columns

    appended2 = (
        d.filter(F.col("doc_id") % 3 == 0)
        .withColumn("doc_id", F.col("doc_id") + 40_000_000)
        .withColumn("lang", F.lit("zz"))
        .withColumn("extra", F.col("n_chars") + F.lit(7))
    )
    # evolving append: new `extra` column rides in (write.schema-evolution);
    # every pre-evolution fragment must null-fill it on read
    write_dataset(appended2.coalesce(1), path, mode="append",
                  options=DatasetOptions(path=path, schema_evolution=True))
    r = (
        read_dataset(spark, path)
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum(F.coalesce(F.col("extra"), F.lit(0))).alias("s"))
        .first()
    )
    rows.append(("evolved_append", r.cnt, r.s))
    # computed-column backfill over the whole table as ONE commit
    add_column(spark, path, "bonus", "n_chars % 97")
    r = (
        read_dataset(spark, path)
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("bonus").alias("s"))
        .first()
    )
    rows.append(("evolved", r.cnt, r.s))
    # O(1) metadata-only drop; time travel keeps the old shape
    pre_drop = FR.latest_version(path)
    drop_columns(path, ["lang"])
    cur_cols = read_dataset(spark, path).columns
    if "lang" in cur_cols:  # the evolution contract, hash can't see schemas
        raise RuntimeError(f"drop_columns left 'lang' visible: {cur_cols}")
    if "lang" not in read_dataset(spark, path, version=pre_drop).columns:
        raise RuntimeError("pre-drop version lost 'lang' (time travel broken)")
    rows.append(snap("dropped"))
    vacuum_dataset(path, keep_versions=1)
    rows.append(snap("vacuumed"))

    # --- native binary schema evolution under the hash gate ---
    # the SAME evolution lifecycle over a REAL Lance v2 dataset via the
    # stdlib codec: evolving append (new `extra` column rides after the
    # live schema with fresh field ids; pre-evolution fragments
    # null-fill), then a metadata-only drop_columns whose narrowed
    # schema must hide `lang` from the current read while the pre-drop
    # version still time-travels WITH it — every summed value traveled
    # through the binary encoder AND decoder across the evolution
    from ..options import DatasetOptions
    from ..sources import lance_format as LF
    from ..sources.reader import read_dataset as rd
    from ..sources.schema_evolution import drop_columns as drop_cols
    from ..sources.writer import write_native_pure

    npath = _workdir("versions-native", sf_dir)
    base_nd = d.select("doc_id", "lang", "n_chars").filter(F.col("doc_id") % 11 == 0)
    write_native_pure(base_nd, npath, mode="overwrite")
    add_nd = (
        d.select("doc_id", "lang", "n_chars")
        .filter(F.col("doc_id") % 13 == 0)
        .withColumn("doc_id", F.col("doc_id") + 50_000_000)
        .withColumn("extra", (F.col("n_chars") + 3).cast("long"))
    )
    write_native_pure(add_nd, npath, mode="append",
                      options=DatasetOptions(path=npath, schema_evolution=True))
    pre_drop = LF.read_native_manifest(npath).version
    drop_cols(npath, ["lang"])
    cur_cols = rd(spark, npath).columns
    if "lang" in cur_cols:
        raise RuntimeError(f"native drop_columns left 'lang' visible: {cur_cols}")
    if "lang" not in rd(spark, npath, version=pre_drop).columns:
        raise RuntimeError("native pre-drop version lost 'lang' (time travel broken)")
    r = (rd(spark, npath)
         .agg(F.count(F.lit(1)).alias("cnt"),
              F.sum(F.coalesce(F.col("extra"), F.lit(0))).alias("s"))
         .first())
    rows.append(("native_evolve", r.cnt, r.s))

    # --- deletion-vector DELETE under the hash gate ---
    # lance's own DELETE shape: the data files stay byte-identical, one
    # tiny Arrow tombstone sidecar per affected fragment, O(deleted
    # rows) IO — and every read route must mask the tombstones or the
    # summed value here resurrects them
    delete_rows(spark, npath, "n_chars < 100", use_deletion_vectors=True)
    r = (rd(spark, npath)
         .agg(F.count(F.lit(1)).alias("cnt"),
              F.sum("n_chars").alias("s"))
         .first())
    rows.append(("native_dv_delete", r.cnt, r.s))
    return spark.createDataFrame(rows, "stage string, cnt bigint, sum_chars bigint")


@register(
    "source_format_api",
    oracle="""
    SELECT lang, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(NULL AS BIGINT) AS sum_opt, CAST(NULL AS BIGINT) AS lang_bytes,
           CAST(NULL AS BIGINT) AS extra_hash
    FROM documents WHERE n_chars > 150
    GROUP BY lang
    UNION ALL
    SELECT '__point_lookup__', count(*), CAST(sum(n_chars) AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM documents WHERE doc_id IN (1, 2, 3)
    UNION ALL
    SELECT '__native_codec__', count(*), CAST(sum(n_chars) AS BIGINT),
           CAST(sum(CASE WHEN doc_id % 14 = 0 THEN n_chars END) AS BIGINT),
           CAST(sum(strlen(lang)) AS BIGINT),
           CAST(sum(CAST(floor(doc_id / 350) AS BIGINT))
                + CAST(sum(CAST(n_chars % 16 AS DOUBLE)) AS BIGINT)
                + sum(CASE WHEN doc_id % 3 = 0 THEN 0
                           WHEN doc_id % 5 = 0 THEN 0
                           ELSE (doc_id % 5) + n_chars END) AS BIGINT)
    FROM documents WHERE doc_id % 7 = 0 AND n_chars > 100
    UNION ALL
    SELECT '__native_fsst__', count(*), CAST(sum(n_chars) AS BIGINT),
           CAST(NULL AS BIGINT),
           CAST(sum(strlen('u-' || doc_id || '-' || lang || '-'
                           || n_chars)) AS BIGINT),
           CAST(count(*) * ascii('u')
                + sum(ascii(substr(CAST(n_chars AS VARCHAR),
                                   strlen(CAST(n_chars AS VARCHAR)), 1)))
                + sum(CASE WHEN doc_id % 3 = 0 THEN 0
                           WHEN doc_id % 5 = 0 THEN 0
                           ELSE strlen(lang) + 1
                                + strlen(CAST(doc_id % 13 AS VARCHAR))
                                + CASE WHEN n_chars % 2 = 1 THEN 0
                                       ELSE 1 END END)
                + sum(CASE WHEN doc_id % 4 IN (0, 1) THEN 0
                           ELSE strlen(lang) + (n_chars % 100)
                                + CASE WHEN n_chars % 3 = 0 THEN 13
                                       ELSE doc_id % 7 END END) AS BIGINT)
    FROM documents WHERE doc_id % 9 = 0 AND n_chars > 120
    UNION ALL
    SELECT '__native_deep__', count(*), CAST(sum(n_chars) AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(sum(
             CASE WHEN doc_id % 24 = 0 THEN 11
                  WHEN doc_id % 24 = 6 THEN 7
                  ELSE 2 + (doc_id % 5)
                       + (CASE WHEN n_chars % 2 = 0 THEN n_chars ELSE 0 END)
                       + (CASE WHEN n_chars % 3 = 0 THEN 5 ELSE 2 END) END
             + CASE WHEN doc_id % 30 = 0 THEN 17
                    WHEN doc_id % 30 = 6 THEN 13
                    ELSE strlen(lang)
                         + (CASE WHEN doc_id % 4 = 0 THEN 1
                                 WHEN n_chars % 5 = 0 THEN 3
                                 ELSE 10 + (n_chars % 50)
                                      + (CASE WHEN n_chars % 2 = 1
                                              THEN doc_id % 11
                                              ELSE 0 END) END)
                         + (CASE WHEN n_chars % 4 = 1 THEN 4
                                 ELSE 10 + (doc_id % 9) END) END
           ) AS BIGINT)
    FROM documents WHERE doc_id % 6 = 0 AND n_chars > 110
    """,
    doc="spark.read.format('lance') / df.write.format('lance') — the "
        "registered PySpark DataSource (sources/datasource.py; ref "
        "table/LanceDynamicTableFactory.java:52-237 + SPI registration): "
        "format write with per-fragment bloom filters "
        "(write.bloom-columns=doc_id — sources/bloom.py), format read "
        "(one partition per fragment) with the n_chars predicate pushed "
        "through pushFilters into the fragment scan, plus a point-lookup "
        "branch whose pushed doc_id IN filter consults the bloom sidecars "
        "at planning time (fragments provably missing all three ids are "
        "never scheduled). The __native_codec__ branch drives the REAL "
        "Lance v2 binary format end-to-end with NO lance package: "
        "write_native_pure encodes one .lance file per task + one binary "
        "manifest commit (sources/lance_format.py — byte-identity pinned "
        "against the reference's committed fixtures), then the same "
        "format('lance') reader routes the binary manifest through the "
        "stdlib decoder with the n_chars filter applied over the decoded "
        "batches. The measured columns ride inside a STRUCT column "
        "(SimpleStruct header + member columns, ref "
        "LanceTypeConverter.java:179-186), so the hash gate covers the "
        "struct encoder/decoder too; under the 2.1 layout the integer "
        "members travel the inline-BITPACKED mini-block stream and the "
        "string member the variable-width mini-block stream, with "
        "sum(octet_length(lang)) binding the decoded string BYTES into "
        "the hash. Round 11: the stage also rides an RLE integer stream "
        "(run-heavy 'bucket'), a byte-stream-split + zlib-block double "
        "('score', write.native-compression=zlib), and a nested-repdef "
        "list<long> page ('toks' — null/empty lists + null items on "
        "repetition/definition streams), all bound into 'extra_hash'. "
        "Round 12: a second native dataset written under "
        "write.native-compression=fsst drives the FSST arm "
        "(sources/fsst.py — per-page symbol table, per-string "
        "substitution streams) over a high-cardinality 'uri' string "
        "(dictionary can't fire), a list<string> leaf stream, AND a "
        "list<struct<t,w>> column riding the SHREDDED multi-layer "
        "repdef pages ([list, struct, item] path per member, null "
        "structs vs null members distinguished by definition code); "
        "the __native_fsst__ row binds decoded byte lengths, first/"
        "last character codes, and the struct items' bytes+weights "
        "(null-struct marker 13) into the gate. Round 13, the "
        "__native_deep__ row: the RECURSIVE repdef stacks — a depth-3 "
        "list ([list,list,list,item]) and a list member inside the "
        "shredded struct ([list,struct,list,item] for 'ws') — written "
        "2.1+zlib, with per-level null/empty/value markers folded into "
        "the hash so any mis-assembly at any nesting level breaks it; "
        "maintenance.verify_integrity runs over the written dataset at "
        "build time (every fragment must carry, and match, its "
        "write-time sha256 digest — the mismatch+skip count lands in "
        "the hash and a failure raises).",
)
def source_format_api(spark, sf_dir):
    from ..sources.datasource import register_lance_datasource

    register_lance_datasource(spark)
    d = load_table(spark, sf_dir, "documents")
    path = _workdir("formatapi", sf_dir)
    (
        d.write.format("lance")
        .option("write.bloom-columns", "doc_id")
        .mode("overwrite").save(path)
    )
    base = spark.read.format("lance").load(path)
    agg = (
        base.filter(F.col("n_chars") > 150)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("n_chars").alias("sum_chars"))
        .withColumn("sum_opt", F.lit(None).cast("long"))
        .withColumn("lang_bytes", F.lit(None).cast("long"))
        .withColumn("extra_hash", F.lit(None).cast("long"))
    )
    point = (
        spark.read.format("lance").load(path)
        .filter(F.col("doc_id").isin(1, 2, 3))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("n_chars").alias("sum_chars"))
        .select(F.lit("__point_lookup__").alias("lang"), "cnt", "sum_chars",
                F.lit(None).cast("long").alias("sum_opt"),
                F.lit(None).cast("long").alias("lang_bytes"),
                F.lit(None).cast("long").alias("extra_hash"))
    )
    # REAL Lance v2 round trip (stdlib codec, no lance package): every
    # value that lands in the hash traveled through our binary encoder
    # AND decoder — a corrupted offset/page/manifest byte breaks the gate
    from ..sources.writer import write_native_pure

    npath = _workdir("formatapi-native", sf_dir)
    from ..options import DatasetOptions

    write_native_pure(
        d.filter(F.col("doc_id") % 7 == 0)
        .select("doc_id",
                F.struct(F.col("lang").alias("lang"),
                         F.col("n_chars").alias("n_chars")).alias("m"),
                # NULL-bearing int64 — rides the Nullable.some_nulls
                # page arm (validity bitmap + zero-filled values) so the
                # hash gate covers the nullable fixed-width encoder AND
                # decoder end-to-end
                F.when(F.col("doc_id") % 14 == 0,
                       F.col("n_chars")).alias("opt"),
                # run-heavy int64 (runs of ~50) — rides the RLE value
                # stream ([u16 run count][values][u16 lengths] per chunk)
                F.floor(F.col("doc_id") / 350).cast("long").alias("bucket"),
                # small-domain double — BYTE-STREAM-SPLIT + zlib-block
                # under write.native-compression=zlib
                (F.col("n_chars") % 16).cast("double").alias("score"),
                # list<long> with null lists, empty lists, and null
                # items — rides the NESTED-REPDEF mini-block page
                # (repetition + definition streams, placeholder slots)
                F.when(F.col("doc_id") % 3 == 0,
                       F.array().cast("array<long>"))
                .when(F.col("doc_id") % 5 == 0,
                      F.lit(None).cast("array<long>"))
                .otherwise(F.array(
                    (F.col("doc_id") % 5).cast("long"),
                    F.col("n_chars").cast("long"),
                    F.when(F.col("n_chars") % 2 == 1,
                           F.lit(None).cast("long"))))
                .alias("toks")),
        npath, mode="overwrite",
        # 2.1 mini-block structural pages: doc_id/opt/m.n_chars ride the
        # inline-bitpacked integer stream (per-chunk width word), bucket
        # the RLE stream, score the byte-stream-split + zlib-block
        # stream, toks the nested-repdef list page, m.lang
        # (low-cardinality) the DICTIONARY arm — items buffer + bitpacked
        # index stream; the struct HEADER keeps its 2.0 page (per-page
        # layout mixing) while its members recurse into 2.1 — the hash
        # gate crosses every arm end-to-end
        options=DatasetOptions(path=npath, native_layout="2.1-miniblock",
                               native_compression="zlib"))
    toks_sum = F.aggregate(
        F.coalesce(F.col("toks"), F.array().cast("array<long>")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + F.coalesce(v, F.lit(0).cast("long")))
    native = (
        spark.read.format("lance").load(npath)
        .filter(F.col("m.n_chars") > 100)
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum("m.n_chars").alias("sum_chars"),
             F.sum("opt").alias("sum_opt"),
             F.sum(F.octet_length(F.col("m.lang"))).alias("lang_bytes"),
             (F.sum("bucket") + F.sum("score").cast("long")
              + F.sum(toks_sum)).alias("extra_hash"))
        .select(F.lit("__native_codec__").alias("lang"), "cnt", "sum_chars",
                "sum_opt", "lang_bytes", "extra_hash")
    )
    # FSST arm: a high-cardinality string (dictionary can't fire — every
    # uri is unique) plus a list<string> leaf stream, written under
    # write.native-compression=fsst and read back through the same
    # format('lance') route; decoded byte lengths and first/last
    # character codes bind the substitution decode into the hash
    fpath = _workdir("formatapi-fsst", sf_dir)
    write_native_pure(
        d.filter(F.col("doc_id") % 9 == 0)
        .select("doc_id", "n_chars",
                F.concat_ws("-", F.lit("u"), F.col("doc_id"),
                            F.col("lang"), F.col("n_chars")).alias("uri"),
                F.when(F.col("doc_id") % 3 == 0,
                       F.array().cast("array<string>"))
                .when(F.col("doc_id") % 5 == 0,
                      F.lit(None).cast("array<string>"))
                .otherwise(F.array(
                    F.col("lang"),
                    F.concat(F.lit("c"),
                             (F.col("doc_id") % 13).cast("string")),
                    F.when(F.col("n_chars") % 2 == 0, F.lit("z"))))
                .alias("chars"),
                # list<struct<t,w>> — the SHREDDED multi-layer repdef
                # page ([list, struct, item] path per member; null
                # structs ride definition code 2, null members code 1)
                F.when(F.col("doc_id") % 4 == 0,
                       F.lit(None)
                       .cast("array<struct<t:string,w:bigint>>"))
                .when(F.col("doc_id") % 4 == 1,
                      F.array().cast("array<struct<t:string,w:bigint>>"))
                .otherwise(F.array(
                    F.struct(F.col("lang").alias("t"),
                             (F.col("n_chars") % 100).cast("long")
                             .alias("w")),
                    F.when(F.col("n_chars") % 3 != 0,
                           F.struct(F.lit(None).cast("string").alias("t"),
                                    (F.col("doc_id") % 7).cast("long")
                                    .alias("w")))))
                .alias("st")),
        fpath, mode="overwrite",
        options=DatasetOptions(path=fpath, native_layout="2.1-miniblock",
                               native_compression="fsst"))
    chars_len = F.aggregate(
        F.coalesce(F.col("chars"), F.array().cast("array<string>")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + F.coalesce(F.octet_length(v),
                                        F.lit(0)).cast("long"))
    # null struct contributes a fixed marker (13), a valid struct its
    # member bytes + weight — so a struct/member null confusion in the
    # shredded decode breaks the hash
    st_sum = F.aggregate(
        F.coalesce(F.col("st"),
                   F.array().cast("array<struct<t:string,w:bigint>>")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.when(
            x.isNull(), F.lit(13).cast("long")
        ).otherwise(
            F.coalesce(F.octet_length(x["t"]), F.lit(0)).cast("long")
            + F.coalesce(x["w"], F.lit(0).cast("long"))))
    fsst_stage = (
        spark.read.format("lance").load(fpath)
        .filter(F.col("n_chars") > 120)
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum("n_chars").alias("sum_chars"),
             F.sum(F.octet_length("uri")).alias("lang_bytes"),
             (F.sum(F.ascii(F.substring(F.col("uri"), 1, 1))).cast("long")
              + F.sum(F.ascii(F.substring(F.col("uri"), -1, 1))).cast("long")
              + F.sum(chars_len) + F.sum(st_sum)).alias("extra_hash"))
        .select(F.lit("__native_fsst__").alias("lang"), "cnt", "sum_chars",
                F.lit(None).cast("long").alias("sum_opt"),
                "lang_bytes", "extra_hash")
    )
    # __native_deep__ (round 13): the RECURSIVE repdef stacks — a
    # depth-3 list ([list,list,list,item]) and a struct member that is
    # itself a list ([list,struct,list,item]) — written 2.1+zlib and
    # read back through the same format('lance') route; per-level
    # markers (null vs empty vs values at EVERY nesting level) bind the
    # recursive assembler into the hash. verify_integrity runs over the
    # written dataset at build time: its mismatch+skip count (must be 0
    # — every fragment carries a write-time sha256) is added to the
    # hash, and a digest failure raises, failing the whole query.
    dpath = _workdir("formatapi-deep", sf_dir)
    long3 = "array<array<array<bigint>>>"
    dstype = "array<struct<t:string,ws:array<bigint>>>"
    write_native_pure(
        d.filter(F.col("doc_id") % 6 == 0)
        .select(
            "doc_id", "n_chars",
            F.when(F.col("doc_id") % 24 == 0, F.lit(None).cast(long3))
            .when(F.col("doc_id") % 24 == 6, F.array().cast(long3))
            .otherwise(F.array(
                F.array(F.array(
                    (F.col("doc_id") % 5).cast("long"),
                    F.when(F.col("n_chars") % 2 == 0,
                           F.col("n_chars").cast("long")))),
                F.when(F.col("n_chars") % 3 == 0,
                       F.lit(None).cast("array<array<bigint>>"))
                .otherwise(F.array(F.array().cast("array<bigint>")))))
            .alias("d3"),
            F.when(F.col("doc_id") % 30 == 0, F.lit(None).cast(dstype))
            .when(F.col("doc_id") % 30 == 6, F.array().cast(dstype))
            .otherwise(F.array(
                F.struct(
                    F.col("lang").alias("t"),
                    F.when(F.col("doc_id") % 4 == 0,
                           F.array().cast("array<bigint>"))
                    .when(F.col("n_chars") % 5 == 0,
                          F.lit(None).cast("array<bigint>"))
                    .otherwise(F.array(
                        (F.col("n_chars") % 50).cast("long"),
                        F.when(F.col("n_chars") % 2 == 1,
                               (F.col("doc_id") % 11).cast("long"))))
                    .alias("ws")),
                F.when(F.col("n_chars") % 4 != 1,
                       F.struct(F.lit(None).cast("string").alias("t"),
                                F.array((F.col("doc_id") % 9).cast("long"))
                                .alias("ws")))))
            .alias("ds")),
        dpath, mode="overwrite",
        options=DatasetOptions(path=dpath, native_layout="2.1-miniblock",
                               native_compression="zlib"))
    from ..sources.maintenance import verify_integrity

    rep = verify_integrity(spark, dpath)
    integrity_term = F.lit(len(rep["mismatched"]) + rep["skipped"]).cast("long")
    lit0 = F.lit(0).cast("long")
    d3_hash = (
        F.when(F.col("d3").isNull(), F.lit(11).cast("long"))
        .when(F.size("d3") == 0, F.lit(7).cast("long"))
        .otherwise(F.aggregate(
            "d3", lit0,
            lambda acc, mid: acc + F.when(
                mid.isNull(), F.lit(5).cast("long")
            ).otherwise(
                F.lit(2).cast("long") + F.aggregate(
                    mid, lit0,
                    lambda a2, inner: a2 + F.when(
                        inner.isNull(), F.lit(3).cast("long")
                    ).otherwise(F.aggregate(
                        inner, lit0,
                        lambda a3, v: a3 + F.coalesce(v, lit0))))))))
    ds_hash = (
        F.when(F.col("ds").isNull(), F.lit(17).cast("long"))
        .when(F.size("ds") == 0, F.lit(13).cast("long"))
        .otherwise(F.aggregate(
            "ds", lit0,
            lambda acc, x: acc + F.when(
                x.isNull(), F.lit(4).cast("long")
            ).otherwise(
                F.coalesce(F.octet_length(x["t"]), F.lit(0)).cast("long")
                + F.when(x["ws"].isNull(), F.lit(3).cast("long"))
                .when(F.size(x["ws"]) == 0, F.lit(1).cast("long"))
                .otherwise(F.lit(10).cast("long") + F.aggregate(
                    x["ws"], lit0,
                    lambda a, v: a + F.coalesce(v, lit0)))))))
    deep_stage = (
        spark.read.format("lance").load(dpath)
        .filter(F.col("n_chars") > 110)
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum("n_chars").alias("sum_chars"),
             (F.sum(d3_hash) + F.sum(ds_hash)
              + integrity_term).alias("extra_hash"))
        .select(F.lit("__native_deep__").alias("lang"), "cnt", "sum_chars",
                F.lit(None).cast("long").alias("sum_opt"),
                F.lit(None).cast("long").alias("lang_bytes"),
                "extra_hash")
    )
    return (agg.unionByName(point).unionByName(native)
            .unionByName(fsst_stage).unionByName(deep_stage))


@register(
    "source_pushdown_read",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE lang = 'en' AND n_chars > 200
    """,
    doc="Pushdown forwarding through the dataset reader: configured "
        "read.filter + query filter compose by AND; column pruning to 3 "
        "columns (ref table/LanceDynamicTableSource.java:350-363, §2.2). "
        "The write uses ingest-time clustering (write.sort-by=n_chars + "
        "write.cluster — ONE range shuffle, fragments with disjoint "
        "n_chars ranges), so the pushed range filter prunes fragments at "
        "planning time AND the hash gate proves the clustered layout "
        "loses/duplicates nothing.",
)
def source_pushdown_read(spark, sf_dir):
    from ..options import DatasetOptions

    d = load_table(spark, sf_dir, "documents")
    path = _workdir("pushdown", sf_dir)
    write_dataset(d, path, mode="overwrite",
                  options=DatasetOptions(path=path, sort_columns=["n_chars"],
                                         cluster_on_write=True,
                                         write_max_rows_per_file=500))
    opts = DatasetOptions(path=path, read_filter="lang = 'en'")
    return read_dataset(spark, path, columns=["doc_id", "lang", "n_chars"],
                        filter="n_chars > 200", options=opts)
