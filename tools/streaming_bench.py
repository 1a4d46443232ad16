"""Live micro-batch throughput for the streaming twins (r11,
VERDICT r10 #7 — the twins are equivalence-pytested but had never been
TIMED under execution).

Drives a representative twin per family shape against the sf fixtures,
as a real file-source stream (4 micro-batches, 1 file per trigger,
memory sink, processAllAvailable — the test harness's execution path),
and merges `{"streaming_r11": ...}` into BENCH_STRESS.json: per twin,
wall seconds, input rows, rows/sec, and output rows.

Usage: python tools/streaming_bench.py
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from parallel_svms_spark.session import get_spark  # noqa: E402
from parallel_svms_spark.io.sources import load_table  # noqa: E402
from parallel_svms_spark.streaming import windows as SW  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_CHUNKS = 4


def _chunked_dir(df, tmp: str, name: str, tail=None) -> tuple[str, int]:
    """Write df as N_CHUNKS single-file parquets with increasing
    mtimes so maxFilesPerTrigger=1 replays them in order."""
    src = os.path.join(tmp, name + "_parts")
    n = df.count()
    (df.withColumn("__c", (F.monotonically_increasing_id() % N_CHUNKS))
       .repartition(N_CHUNKS, "__c").drop("__c")
       .write.mode("overwrite").parquet(src))
    dst = os.path.join(tmp, name)
    os.makedirs(dst)
    i = -1
    for i, p in enumerate(sorted(glob.glob(f"{src}/part-*"))):
        shutil.copy(p, f"{dst}/{i:04d}.parquet")
        os.utime(f"{dst}/{i:04d}.parquet", (1000 + i, 1000 + i))
    if tail is not None:
        tsrc = os.path.join(tmp, name + "_tail")
        tail.coalesce(1).write.mode("overwrite").parquet(tsrc)
        i += 1
        p = sorted(glob.glob(f"{tsrc}/part-*"))[0]
        shutil.copy(p, f"{dst}/{i:04d}.parquet")
        os.utime(f"{dst}/{i:04d}.parquet", (1000 + i, 1000 + i))
    return dst, n


def main() -> int:
    spark = get_spark("streaming_bench")
    spark.sparkContext.setLogLevel("ERROR")
    from parallel_svms_spark.operators import dedup as D

    docs = load_table(spark, SF_DIR, "documents")
    events = load_table(spark, SF_DIR, "events")
    # stream side = the %7 batch (the incremental convention); static
    # corpus = the rest. Docs get a synthetic arrival ts (the fixture
    # has none); events stream in ts order like the tests do.
    corpus = docs.filter("doc_id % 7 != 0")
    # staggered arrival times (1 s apart) so append-mode watermarks
    # advance across micro-batches; a far-future sentinel doc rides
    # the LAST chunk so the final window can close (the test-harness
    # convention — sentinel excluded from rows_out accounting upstream
    # is unnecessary: it emits no spans/pairs and one junk row at most)
    arrivals = (docs.filter("doc_id % 7 = 0")
                .select("doc_id",
                        (F.to_timestamp(F.lit("2026-01-01 00:00:00"))
                         + F.make_interval(secs=F.col("doc_id")))
                        .alias("ts"), "text"))
    sentinel = (docs.sparkSession.createDataFrame(
        [(10**9, "sentinel")], "doc_id long, text string")
        .select("doc_id",
                F.to_timestamp(F.lit("2027-06-01 00:00:00")).alias("ts"),
                "text"))
    results: dict[str, dict] = {}
    with tempfile.TemporaryDirectory() as tmp:
        docs_dir, n_docs = _chunked_dir(arrivals, tmp, "docs",
                                        tail=sentinel)
        ev_dir, n_ev = _chunked_dir(events.orderBy("ts"), tmp, "events")

        def docs_stream():
            return (spark.readStream.schema(SW.DOCS_SCHEMA)
                    .option("maxFilesPerTrigger", 1).parquet(docs_dir))

        def run(name, out_stream, n_in, mode="append"):
            qname = "sb_" + name
            t0 = time.perf_counter()
            q = (out_stream.writeStream.outputMode(mode)
                 .format("memory").queryName(qname).start())
            q.processAllAvailable()
            q.stop()
            wall = time.perf_counter() - t0
            n_out = spark.sql(f"SELECT count(*) c FROM {qname}").first().c
            results[name] = {"sec": round(wall, 2), "rows_in": n_in,
                             "rows_per_sec": int(n_in / wall),
                             "rows_out": int(n_out),
                             "micro_batches": N_CHUNKS}
            print(f"  {name}: {wall:.2f}s  in={n_in} out={n_out}")
            spark.catalog.clearCache()

        # E6: windowed aggregation + custom stateful sessionization
        run("windowed_counts",
            SW.windowed_counts(SW.stream_events_from_dir(spark, ev_dir)),
            n_ev, mode="append")
        run("sessionize_stateful",
            SW.sessionize_stateful(SW.stream_events_from_dir(spark, ev_dir)),
            n_ev, mode="append")
        # E1: bounded-state exact dedup
        run("exact_dedup", SW.streaming_exact_dedup(docs_stream()), n_docs)
        # E2: stream-static minhash near-dup screen vs the corpus index
        idx = SW.static_minhash_index(corpus).persist()
        idx.count()
        run("minhash_near_dups",
            SW.streaming_minhash_near_dups(docs_stream(), idx), n_docs)
        idx.unpersist()
        # E2 substring family: stats + cut decisions vs the gram index
        gidx = D.gram_count_index(corpus).persist()
        gidx.count()
        run("repeated_span_stats",
            SW.streaming_repeated_span_stats(docs_stream(), gidx),
            n_docs, mode="complete")
        run("repeated_span_cuts",
            SW.streaming_repeated_span_cuts(docs_stream(), gidx),
            n_docs, mode="complete")  # the twin's contract (its tests
        # drive it complete-mode: per-doc cut sets re-emit as they grow)
        gidx.unpersist()
        # E5: stateless contamination gate vs the src0 benchmark
        run("decontaminate",
            SW.streaming_decontaminate(
                docs_stream(), docs.filter("source = 'src0'"), k=4),
            n_docs)
        # E4: the zlib Python-boundary gate
        run("compression_screen",
            SW.streaming_compression_screen(docs_stream()), n_docs)

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    spath = os.path.join(here, "BENCH_STRESS.json")
    try:
        with open(spath) as fh:
            prev = json.load(fh)
    except (OSError, ValueError):
        prev = {}
    prev["streaming_r11"] = {"sf_dir": SF_DIR, "chunks": N_CHUNKS,
                             "twins": results}
    with open(spath, "w") as fh:
        json.dump(prev, fh, indent=1, sort_keys=True)
    print(json.dumps({"streaming_twins": len(results),
                      "file": "BENCH_STRESS.json"}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
