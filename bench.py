"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_connector_lance_spark import registry as _registry
from flink_connector_lance_spark.session import get_spark

# Headline set: one per operator family — scan/filter/agg/join/window/knn/dedup.
# The first 12 are the round-1/2 set (kept stable for cross-round
# comparability); the tail was appended in round 3 as those operator
# families landed. ann_ivf_pq's first iteration builds the PQ index
# (cached per process); best-of-2 records the steady-state indexed search.
HEADLINE = [
    "tpch_q1",
    "filter_comparisons",
    "agg_groupby_full",
    "tpch_q3_topk",
    "tpch_q5_region_revenue",
    "window_latest_order",
    "events_tumbling_window",
    "flagship_category_count",
    "knn_cosine",
    "knn_l2_filtered",
    "dedup_minhash_lsh",
    "text_stats",
    "ann_ivf_pq",
    "text_pii_redact",
    "pack_sequences",
    # round-6 append: exact KNN (l2+dot) plus the hybrid-retrieval RRF
    # branch (BM25 leg + cosine leg + rank fusion) in one query — the
    # retrieval family's bench presence. Appending grows the headline
    # total vs earlier rounds by this query's cost; per-query timings
    # stay comparable.
    "knn_l2_dot",
]


def _competing_cpu(sample_sec: float = 0.5) -> float:
    """CPU cores currently burned by OTHER java/python processes on this
    box (two /proc/<pid>/stat samples). The official bench snapshot must
    not share its window with a just-finished-or-running pytest sweep or
    a neighbor's Spark JVM — same-code spread measured across rounds is
    10.8-12.1s purely from this (round-9 verdict, "What's wrong #3")."""
    import time as _t

    def sample() -> dict[int, int]:
        ticks: dict[int, int] = {}
        me = os.getpid()
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == me:
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as fh:
                    cmd = fh.read().decode("utf-8", "replace")
                if "java" not in cmd and "python" not in cmd:
                    continue
                with open(f"/proc/{pid}/stat") as fh:
                    parts = fh.read().rsplit(")", 1)[1].split()
                ticks[int(pid)] = int(parts[11]) + int(parts[12])  # utime+stime
            except (OSError, IndexError, ValueError):
                continue
        return ticks

    a = sample()
    _t.sleep(sample_sec)
    b = sample()
    hz = os.sysconf("SC_CLK_TCK")
    return sum(max(0, b[p] - a[p]) for p in b if p in a) / hz / sample_sec


def _settle_window() -> tuple[float, bool]:
    """Wait (bounded) for competing Spark/pytest load to drain before
    timing. Returns (residual_competing_cores, polluted_flag). Knobs:
    SPARK_GRAFT_BENCH_SETTLE (max wait sec, default 90; 0 disables),
    SPARK_GRAFT_BENCH_BUSY_CORES (threshold, default 2.0)."""
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_SETTLE", "90"))
    thresh = float(os.environ.get("SPARK_GRAFT_BENCH_BUSY_CORES", "2.0"))
    load = _competing_cpu()
    waited = 0.0
    while load > thresh and waited < budget:
        print(f"bench: waiting for quiet window — {load:.1f} competing "
              f"java/python cores (> {thresh})", file=sys.stderr)
        import time as _t

        _t.sleep(5)
        waited += 5.5
        load = _competing_cpu()
    polluted = load > thresh
    if polluted:
        print(f"bench: WARNING — timing window polluted by {load:.1f} "
              "competing cores after settle budget; numbers will read "
              "high (see README bench protocol)", file=sys.stderr)
    return round(load, 2), polluted


def _calibrate() -> tuple[float, float, float]:
    """Fixed-work calibration probe (round-10 verdict, "What's wrong #2"):
    the competing-cores flag only sees guest-visible processes, but the
    dominant noise source is host-neighbor contention OUTSIDE the VM —
    same-code headline totals spanned 9.1–21.5s across rounds. This probe
    times a deterministic workload so any snapshot can be normalized with
    evidence instead of narrative.

    Returns (calib_1c, calib_32c, effective_cores):
      calib_1c  — wall seconds for ONE unit of work on one thread.
      calib_32c — wall seconds for N units on N threads (N =
                  $SPARK_GRAFT_CPUS, default 32). On an idle 32-core box
                  this ≈ calib_1c; contention inflates it linearly.
      effective_cores — calib_1c * N / calib_32c (≈ N when idle).

    The unit is sha256 over a 1 MiB buffer ×300 — hashlib releases the
    GIL for large buffers, so the N-thread leg genuinely exercises N
    cores. To normalize a bench series point-to-point: divide each
    round's headline total by (its calib_32c / the series-min calib_32c).
    """
    import hashlib
    import threading

    buf = b"\x5a" * (1 << 20)
    reps = 300

    def unit() -> None:
        h = hashlib.sha256()
        for _ in range(reps):
            h.update(buf)
        h.digest()

    unit()  # warm: page in the buffer, JIT nothing (CPython), prime caches
    c1 = float("inf")
    for _ in range(3):  # best-of-3, matching the bench's min semantics
        t0 = time.perf_counter()
        unit()
        c1 = min(c1, time.perf_counter() - t0)
    n = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cn = float("inf")
    for _ in range(3):
        threads = [threading.Thread(target=unit) for _ in range(n)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        cn = min(cn, time.perf_counter() - t0)
    eff = round(c1 * n / cn, 1) if cn > 0 else float(n)
    return round(c1, 3), round(cn, 3), eff


def _gated_window() -> tuple[float, bool, float, float, float, bool]:
    """The round-12 verdict's protocol replacement for the retired linear
    ``value_normalized`` rescale (which provably over- AND under-corrected
    — queries are not as contention-sensitive as an all-core sha probe):
    instead of normalizing a bad window's number, GATE on the window
    itself. Settle guest-side load, calibrate, and if the host delivered
    fewer than ``SPARK_GRAFT_BENCH_MIN_EFF`` effective cores (default
    0.375×N — 12 of 32), wait and re-probe within a bounded budget
    (``SPARK_GRAFT_BENCH_WINDOW_BUDGET`` sec, default 300; 0 disables the
    gate's retries). Returns (competing_cores, polluted, calib_1c,
    calib_32c, calib_eff_cores, window_ok). ``window_ok=False`` means the
    budget ran out with the host still contended — the run's numbers must
    be read against the README noise band, never point-to-point."""
    n = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    floor = float(os.environ.get("SPARK_GRAFT_BENCH_MIN_EFF",
                                 str(max(1.0, 0.375 * n))))
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_WINDOW_BUDGET", "300"))
    competing_cores, polluted = _settle_window()
    best = _calibrate()
    waited = 0.0
    while best[2] < floor and waited < budget:
        print(f"bench: window gate — host delivered {best[2]:.1f} of {n} "
              f"effective cores (< floor {floor:g}); re-probing "
              f"({waited:.0f}/{budget:.0f}s budget)", file=sys.stderr)
        time.sleep(10)
        waited += 10
        probe = _calibrate()
        if probe[2] > best[2]:
            best = probe
    window_ok = best[2] >= floor
    if not window_ok:
        print(f"bench: WINDOW UNUSABLE — host never delivered {floor:g} "
              f"effective cores within the {budget:.0f}s gate budget "
              f"(best probe: {best[2]:.1f} of {n}). Raw totals will read "
              "high for reasons unrelated to the engine; compare against "
              "the README noise band only.", file=sys.stderr)
    return competing_cores, polluted, best[0], best[1], best[2], window_ok


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    (competing_cores, polluted, calib_1c, calib_32c, calib_eff_cores,
     window_ok) = _gated_window()
    spark = get_spark(app_name="fcls-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = _registry.queries()
    names = [n for n in HEADLINE if n in qs]

    # Warm the JVM + parquet footer caches with a trivial action.
    qs[names[0]](spark, sf_dir).limit(1).collect()

    # best-of-3 per query, INTERLEAVED as three full sweeps over the
    # list (round 13): three consecutive runs of one query fit inside a
    # single host-contention burst, which then pins that query's
    # minimum high while its neighbors time clean (measured: tpch_q1
    # 5.37 s in a window whose pre- AND post-probes both cleared the
    # floor, vs 0.97 s minutes earlier). Spreading a query's three
    # passes across the whole ~10-minute run means a burst must span
    # the entire window to bias any minimum — and a burst that long
    # fails the bracketing probes instead. Same total work as the
    # per-query loop; C2 still reaches steady state by sweep three
    # (the round-8 best-of-2 -> best-of-3 rationale).
    timings: dict[str, float] = {}
    for _sweep in range(3):
        for name in names:
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            # noop sink materializes every output column (count() would
            # let Catalyst prune the projection and under-report scan
            # cost).
            df.write.format("noop").mode("overwrite").save()
            el = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, float("inf")), el)
    total = round(sum(timings.values()), 3)
    # the round-1..5 comparable set excludes the round-6 knn_l2_dot
    # append, so rounds stay comparable on one stable number
    legacy15 = round(sum(v for n, v in timings.items() if n != "knn_l2_dot"), 3)
    # bracket the window: a second probe AFTER the queries catches
    # contention that arrived mid-run (the pre-gate alone can't). Short
    # settle first — probing in the same second the last noop sink
    # finishes competes with the JVM's wind-down (GC, shuffle cleanup)
    # and reads ~1-2 effective cores low, which is decay of OUR OWN
    # work, not window contention.
    time.sleep(5)
    _, calib_32c_post, calib_eff_post = _calibrate()
    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    floor = float(os.environ.get("SPARK_GRAFT_BENCH_MIN_EFF",
                                 str(max(1.0, 0.375 * n_cpus))))
    if calib_eff_post < floor:
        print(f"bench: post-run probe read {calib_eff_post:.1f} effective "
              f"cores (< floor {floor:g}) — contention arrived during the "
              "run; window_ok downgraded", file=sys.stderr)
        window_ok_final = False
    else:
        window_ok_final = window_ok
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "legacy15_total": legacy15,
        "unit": "sec",
        "queries": timings,  # each is the MIN of runs_per_query passes
        "runs_per_query": 3,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # measurement hygiene: competing java/python cores observed right
        # before timing started, after the bounded settle wait. polluted
        # == true means the window never went quiet — read `value`
        # against the recorded same-code noise band, not point-to-point.
        "competing_cores": competing_cores,
        "polluted": polluted,
        # fixed-work calibration (see _calibrate / _gated_window): the
        # pre-run probe after the window gate, plus a post-run bracket.
        # window_ok means BOTH probes cleared the effective-core floor —
        # only then is `value` comparable point-to-point across rounds.
        # (the round-12 `value_normalized` linear rescale is retired: it
        # over- and under-corrected, judged both ways — gate, don't scale)
        "calib_1c": calib_1c,
        "calib_32c": calib_32c,
        "calib_eff_cores": calib_eff_cores,
        "calib_32c_post": calib_32c_post,
        "calib_eff_cores_post": calib_eff_post,
        "window_ok": window_ok_final,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
