"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line (kept under 1900 chars — the driver parses it
from a 2000-char stdout tail):
  {"metric": "total_headline_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1,
   "probe_sec": p, "sessions": 2, "stress_file": "BENCH_STRESS.json"}

Noise-aware methodology (VERDICT r2 #2 — this host shows co-tenant
steal time that inflates 32-way-parallel queries up to 1.8× while
single-thread work stays bit-stable):

- ``probe_sec``: a single-thread numpy calibration loop recorded IN
  the artifact. If a round's probe matches the last round's but query
  times jumped, the host was loaded, not the code regressed (and vice
  versa: a probe jump discredits the whole run, rerun it).
- ``sessions``: every headline query runs in TWO separate driver
  processes (fresh JVM each), min-of-2 runs per session, recorded
  value = min across sessions. Two time-separated windows make it
  unlikely both caught the same steal-time burst.
- ``stress``: the 10×-docs / 25×-embeddings scale numbers (formerly
  prose in BASELINE.md via tools/stress.py) recorded first-class:
  one pass per scale-diagnostic op on derived fixtures cached in
  .scratch/. Set SPARK_GRAFT_BENCH_STRESS=0 to skip (e.g. quick
  local iteration); SPARK_GRAFT_BENCH_SESSIONS overrides the session
  count.

Execution is forced with the noop sink (full pipeline, no driver
collect cost) except for queries whose results are driver-small by
construction.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline set: the curated driver surface (all 50 qkeys — suites
# union every per-operator query, so this times the full 154-query
# surface). The one-line stdout JSON must fit the driver's 2000-char
# tail buffer (BENCH_r04 lesson: a 4 KB line parsed as null), so the
# per-query dict uses these 50 keys and the stress detail goes to
# BENCH_STRESS.json instead of stdout.
def _bench_all() -> bool:
    # SPARK_GRAFT_BENCH_ALL=1: time the full per-operator registry
    # (queries_all — every per-operator qkey) and write BENCH_ALL.json instead of
    # the driver-facing stdout artifact — per-operator perf evidence,
    # recorded once per round alongside the suite-level headline
    return os.environ.get("SPARK_GRAFT_BENCH_ALL") == "1"


def registry():
    import __spark_entry__ as entrymod
    return entrymod.queries_all() if _bench_all() else entrymod.queries()


def headline_names() -> list[str]:
    return list(registry())




RUNS_PER_SESSION = 2  # recorded value = min over runs × sessions; the
                      # first run per session absorbs JVM/codegen
                      # warmup for that plan shape


def calibration_probe() -> float:
    """Best-of-5 single-thread numpy loop (elementwise int ops — no
    BLAS threading). Bit-identical work every run: any variance is the
    host, which is exactly what it is here to witness."""
    import numpy as np
    x = np.arange(2_000_000, dtype=np.int64)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        y = x
        for _ in range(8):
            y = (y * 2862933555777941757 + 3037000493) % 1000003
        assert int(y[0]) >= 0
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def run_once(spark, fn, sf_dir: str) -> float:
    t0 = time.time()
    df = fn(spark, sf_dir)
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception:
        df.count()
    return time.time() - t0


def child_main(sf_dir: str) -> int:
    """One measurement session: min-of-N per query, one JSON line."""
    import __spark_entry__ as entrymod
    from parallel_svms_spark.session import get_spark
    spark = get_spark("bench")
    qs = registry()
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in headline_names():
        if name not in qs:
            continue
        # per-query isolation (VERDICT r3 #2): one regressed query must
        # not abort the session — record {"err": ...} and keep going so
        # the artifact always has numbers for the healthy 50+ queries
        try:
            t = min(run_once(spark, qs[name], sf_dir)
                    for _ in range(RUNS_PER_SESSION))
        except Exception as exc:  # noqa: BLE001 — harness boundary
            msg = f"{type(exc).__name__}: {exc}"
            errors[name] = msg[:500]
            print(f"  {name}: ERROR {msg[:200]}", file=sys.stderr)
            spark.catalog.clearCache()
            continue
        timings[name] = round(t, 3)
        print(f"  {name}: {t:.3f}s", file=sys.stderr)
        # operators that persist() intermediates (jaccard/minhash) leave
        # CacheManager entries behind; drop them BETWEEN queries so the
        # headline set doesn't accumulate blocks (within a query's runs
        # the cache stays, matching warm-session methodology)
        spark.catalog.clearCache()
    print(json.dumps({"queries": timings, "errors": errors}))
    return 0


def run_stress() -> dict:
    """Scale-diagnostic ops at 10× docs / 25× embeddings (derived,
    cached fixtures — tools/stress.py's build). One timed pass each:
    the question is growth shape, not steady-state microtiming."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    import stress as stress_mod
    mult_docs, mult_emb = 10, 25
    # r11 (VERDICT r10 #1): the stress session honors $SPARK_GRAFT_CPUS
    # like every other leg — the hardcoded local[32]/64-partition
    # builder both broke the scaling contract for this leg and polluted
    # the stdout tail the driver inspects on its low-core run (32-slot
    # stage bars under "cpus": 8 tripped suspect_cpus_ignored).
    # shuffle.partitions = 2× cores, the same ratio the old constants
    # encoded, now derived instead of pinned.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from parallel_svms_spark.session import get_spark
    spark = get_spark("bench_stress", shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs_path, emb_path = stress_mod.build(spark, mult_docs, mult_emb)
        docs = spark.read.parquet(docs_path)
        emb = spark.read.parquet(emb_path)
        n_docs, n_emb = docs.count(), emb.count()
        from parallel_svms_spark.operators import dedup, similarity
        ops = {}

        def timed(name, fn):
            t0 = time.monotonic()
            rows_out = fn()
            ops[name] = {"sec": round(time.monotonic() - t0, 2),
                         "rows_out": rows_out}
            print(f"  stress {name}: {ops[name]['sec']}s", file=sys.stderr)
            spark.catalog.clearCache()

        timed("dedup_exact",
              lambda: dedup.exact_dedup_keys(docs).count())
        timed("dedup_minhash",
              lambda: dedup.minhash_near_dups(docs, threshold=0.5).count())
        # incremental twin at the same 10x docs: 1/7 batch vs the
        # 6/7 corpus's band index (index build included — compare to
        # dedup_minhash for the re-sign saving)
        timed("dedup_minhash_incremental",
              lambda: dedup.minhash_near_dups_incremental(
                  docs.filter("doc_id % 7 != 0"),
                  docs.filter("doc_id % 7 = 0"), threshold=0.5).count())
        timed("ngram_jaccard",
              lambda: dedup.ngram_jaccard_pairs(
                  docs, threshold=0.5, max_doc_freq=200,
                  log_dropped=False).count())
        timed("dedup_embedding_blocked",
              lambda: similarity.cosine_near_dup_blocked(
                  emb, threshold=0.9, n_blocks=16).count())
        # the sub-quadratic SemDeDup path on the same 25× vectors: the
        # blocked/ivf ratio IS the scale argument (n² vs n²/n_lists)
        timed("dedup_embedding_ivf_incremental",
              lambda: similarity.cosine_near_dup_ivf_incremental(
                  emb.filter("vec_id % 9 != 0"),
                  emb.filter("vec_id % 9 = 0"),
                  threshold=0.9, n_lists=64).count())
        timed("dedup_embedding_ivf",
              lambda: similarity.cosine_near_dup_ivf(
                  emb, threshold=0.9, n_lists=64).count())
        timed("topk_batch",
              lambda: similarity.brute_topk_join(
                  emb, emb.limit(8), 10).count())
        from parallel_svms_spark.operators import contamination, text
        timed("decontaminate",
              lambda: contamination.decontaminate(
                  docs.filter("source <> 'src0'"),
                  docs.filter("source = 'src0'"), k=4).count())
        # the bounded-broadcast twin on the same corpus: same output,
        # 8-byte broadcast keys — the side-by-side IS the scale story
        timed("decontaminate_hashed",
              lambda: contamination.decontaminate_hashed(
                  docs.filter("source <> 'src0'"),
                  docs.filter("source = 'src0'"), k=4).count())
        timed("tfidf_topk",
              lambda: text.tfidf_topk(docs, top_n=5).count())
        timed("boilerplate_score",
              lambda: text.boilerplate_score(docs).count())
        # r6: zero-exchange carve + the zlib Python-boundary map at
        # 10x docs — slope evidence for the two new doc-side shapes
        from parallel_svms_spark.operators import sharding as SHOP
        timed("dataset_split",
              lambda: SHOP.dataset_split(docs).count())
        timed("compression_profile",
              lambda: text.compression_profile(docs).count())
        # r6b: zero-exchange chunk explode (rows_out records the
        # amplification), the tokenize+bucket-agg padding audit, and
        # the blocked levenshtein near-dup at 10x docs
        timed("chunk_documents",
              lambda: SHOP.chunk_documents(docs).count())
        timed("padding_stats",
              lambda: SHOP.padding_stats(docs).count())
        timed("dedup_editdist",
              lambda: dedup.editdist_near_dups(docs).count())
        from parallel_svms_spark.operators import events as EV
        ev = spark.read.parquet(stress_mod.build_events(spark, mult_docs))
        if dict(ev.dtypes).get("ts") == "timestamp_ntz":
            from pyspark.sql import functions as F
            ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
        timed("sessionize",
              lambda: EV.sessionize(ev).count())
        timed("asof_join",
              lambda: EV.asof_prev_event(ev).count())
        timed("funnel",
              lambda: EV.funnel(ev).count())
        timed("interval_join",
              lambda: EV.sessions_containing(ev).count())
        # r6: skew diagnostic + burst debounce at 10x events
        from parallel_svms_spark.operators import partitioning as XP
        timed("heavy_keys",
              lambda: XP.heavy_keys(ev, "user_id", k=20).count())
        timed("collapse_bursts",
              lambda: EV.collapse_bursts(ev, gap_seconds=3600).count())
        # r6b: survivorship merge at 10x events (sessionize's
        # exchange shape; output = |users| golden records)
        from pyspark.sql import functions as FF
        from parallel_svms_spark.operators import relational as RL
        timed("merge_survivorship",
              lambda: RL.merge_survivorship(
                  ev.select("user_id", "ts", "event_id",
                            FF.when(FF.col("value") < 0.3, None)
                            .otherwise(FF.col("event_type"))
                            .alias("event_type"),
                            FF.when(FF.col("event_type") == "click",
                                    None)
                            .otherwise(FF.col("value")).alias("value"))
              ).count())
        # warehouse analytics at 10× facts (6M lineitem / 1.5M orders,
        # dims kept at sf0.1 size — the real-warehouse scale shape)
        from parallel_svms_spark.io.sources import load_table
        from parallel_svms_spark.operators import analytics as AN
        li_path, or_path = stress_mod.build_warehouse(spark, mult_docs)
        li = spark.read.parquet(li_path)
        orr = spark.read.parquet(or_path)
        dims = {t: load_table(spark, stress_mod.SF_DIR, t)
                for t in ("customer", "supplier", "nation", "region")}
        timed("pricing_summary",
              lambda: AN.pricing_summary(li).count())
        timed("revenue_by_nation",
              lambda: AN.revenue_by_nation(
                  dims["customer"], orr, li, dims["supplier"],
                  dims["nation"], dims["region"]).count())
        timed("late_order_priority",
              lambda: AN.late_order_priority(orr, li).count())
        timed("top_revenue_orders",
              lambda: AN.top_revenue_orders(
                  dims["customer"], orr, li).count())
        return {"mult_docs": mult_docs, "mult_emb": mult_emb,
                "rows_docs": n_docs, "rows_emb": n_emb, "ops": ops}
    finally:
        spark.stop()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) \
        if "sf" in sf_dir else -1.0
    if os.environ.get("SPARK_GRAFT_BENCH_CHILD") == "1":
        return child_main(sf_dir)

    probe = calibration_probe()
    n_sessions = int(os.environ.get("SPARK_GRAFT_BENCH_SESSIONS", "2"))
    # wall budget: a slow/stolen host must degrade the artifact
    # (fewer sessions, stress skipped), never lose it to an external
    # timeout — the r3 lesson, applied to wall-clock
    budget_s = int(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "1500"))
    t_start = time.monotonic()
    per_session: list[dict[str, float]] = []
    env = dict(os.environ, SPARK_GRAFT_BENCH_CHILD="1")
    errors: dict[str, str] = {}
    sessions_run = 0
    for i in range(n_sessions):
        if i > 0 and time.monotonic() - t_start > budget_s * 0.6:
            print(f"-- budget: skipping session {i + 1}+ "
                  f"({round(time.monotonic() - t_start)}s elapsed)",
                  file=sys.stderr)
            break
        sessions_run += 1
        print(f"-- session {i + 1}/{n_sessions}", file=sys.stderr)
        # a dead/garbled child loses one session, never the artifact
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=3600)
            sys.stderr.write(proc.stderr[-4000:])
            lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
            parsed = json.loads(lines[-1]) if lines else {}
        except Exception as exc:  # noqa: BLE001 — harness boundary
            print(f"-- session {i + 1} failed: {exc}", file=sys.stderr)
            parsed = {}
        if parsed.get("queries"):
            per_session.append(parsed["queries"])
        errors.update(parsed.get("errors") or {})
    all_names = {n for s in per_session for n in s}
    timings = {name: min(s[name] for s in per_session if name in s)
               for name in sorted(all_names)}
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_headline_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "probe_sec": probe,
        "sessions": sessions_run,
    }
    if errors:
        out["errors"] = {k: v[:120] for k, v in errors.items()}
    stress = None
    if _bench_all():
        pass  # BENCH_ALL writes its own artifact below; stress would
              # be discarded — don't spend minutes computing it
    elif os.environ.get("SPARK_GRAFT_BENCH_STRESS", "1") != "1":
        pass
    elif time.monotonic() - t_start > budget_s:
        stress = {"skipped": f"wall budget {budget_s}s exceeded "
                  f"({round(time.monotonic() - t_start)}s) — "
                  "see tools/stress.py runs in BASELINE.md"}
    else:
        stress = run_stress()
    # the driver keeps only the LAST 2000 chars of stdout and parses
    # the final line from that window (BENCH_r04's 4 KB line → parsed
    # null). Stress detail goes to a committed file; the stdout line
    # carries a pointer plus headroom-checked per-query timings.
    here = os.path.dirname(os.path.abspath(__file__))
    if _bench_all():
        with open(os.path.join(here, "BENCH_ALL.json"), "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
        print(json.dumps({"metric": "bench_all_sec", "value": total,
                          "unit": "sec", "n_queries": len(timings),
                          "file": "BENCH_ALL.json"}))
        return 0
    if stress is not None:
        # MERGE into the existing artifact: one-off stress blocks
        # (e.g. stress_20_50_r7) live alongside the per-run refresh
        # and must survive it (ADVICE r7: a wholesale write dropped
        # the 50x cascade recording the docs cite)
        spath = os.path.join(here, "BENCH_STRESS.json")
        try:
            with open(spath) as fh:
                prev = json.load(fh)
        except (OSError, ValueError):
            prev = {}
        prev.update({"sf": sf, "probe_sec": probe, "stress": stress})
        with open(spath, "w") as fh:
            json.dump(prev, fh, indent=1, sort_keys=True)
        out["stress_file"] = "BENCH_STRESS.json"
    line = json.dumps(out)
    if len(line) > 1900:
        # degrade gracefully: full detail to a file, slowest queries
        # inline until the line fits
        with open(os.path.join(here, "BENCH_FULL.json"), "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
        out["queries_file"] = "BENCH_FULL.json"
        ranked = sorted(timings, key=timings.get, reverse=True)
        while len(line) > 1900 and ranked:
            ranked = ranked[:-5]
            out["queries"] = {n: timings[n] for n in sorted(ranked)}
            line = json.dumps(out)
        if len(line) > 1900 and out.get("errors"):
            # a mass-error round can blow the budget on messages alone;
            # the full detail is already in BENCH_FULL.json
            out["errors"] = {"n_errors": len(errors),
                             "see": "BENCH_FULL.json"}
            line = json.dumps(out)
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
