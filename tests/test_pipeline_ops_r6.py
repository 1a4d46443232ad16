"""Round-6 pipeline operators: hot-key skew diagnostics
(``partitioning.heavy_keys``), deterministic train/valid/test carve
(``sharding.dataset_split``) and the zlib compressibility signal
(``text.compression_signals`` / ``compression_profile``).

Each operator's CONTRACT is pinned here (exact values against an
independent local recomputation, partition/stability properties, edge
cases) and its SCALE SHAPE is pinned as a plan assertion — the same
two-sided standard as the rest of the suite.
"""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from parallel_svms_spark.io.sources import load_table
from parallel_svms_spark.operators import partitioning as X
from parallel_svms_spark.operators import sharding as SH
from parallel_svms_spark.operators import text as TX


def phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------- heavy_keys

def test_heavy_keys_exact_counts_and_shares(events):
    rows = X.heavy_keys(events, "user_id", k=5).collect()
    pdf = events.groupBy("user_id").count().collect()
    counts = {r["user_id"]: r["count"] for r in pdf}
    total = sum(counts.values())
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["user_id"], r["n_rows"]) for r in rows] == want
    for r in rows:
        assert r["share_ppm"] == (r["n_rows"] * 1000000) // total


def test_heavy_keys_k_larger_than_cardinality(events):
    n_keys = events.select("user_id").distinct().count()
    rows = X.heavy_keys(events, "user_id", k=n_keys + 50).collect()
    assert len(rows) == n_keys
    # shares over the FULL key set sum to ≤ 1e6 (floor rounding) and
    # within |keys| of it
    s = sum(r["share_ppm"] for r in rows)
    assert 1000000 - n_keys <= s <= 1000000


def test_heavy_keys_plan_heap_topk_and_reused_exchange(events):
    out = X.heavy_keys(events, "user_id", k=10)
    out.collect()  # AQE finalizes the plan at runtime
    p = phys(out)
    # top-k is a heap, never a global sort
    assert "TakeOrderedAndProject" in p
    # the total branch must REUSE the per-key count shuffle — the
    # corpus is scanned + partially aggregated exactly once
    assert "ReusedExchange" in p
    # the scalar reattach is a nested-loop join whose BUILD side is
    # the one-row total aggregate — the named SCALAR_REATTACH_OK
    # exemption in tools/plan_audit.py; pin that the broadcast input
    # really is the ungrouped (global) aggregate, not a data relation
    assert "BroadcastNestedLoopJoin" in p
    import re
    bx = re.search(r"BroadcastExchange IdentityBroadcastMode(.*)",
                   p, re.S)
    assert bx and "HashAggregate" in bx.group(1)[:600]


# ------------------------------------------------------------- dataset_split

def test_dataset_split_is_a_partition(docs):
    out = SH.dataset_split(docs).select("doc_id", "split")
    n = docs.count()
    assert out.count() == n  # exhaustive: every row labeled
    assert out.filter(F.col("split").isNull()).count() == 0
    assert set(r["split"] for r in
               out.select("split").distinct().collect()) <= {
                   "train", "valid", "test"}


def test_dataset_split_fractions_approximate(docs):
    n = docs.count()
    got = {r["split"]: r["cnt"] for r in
           SH.dataset_split(docs).groupBy("split")
           .agg(F.count("*").alias("cnt")).collect()}
    # Binomial(n, p): allow 4 sigma around each target fraction
    for name, p in [("train", 0.9), ("valid", 0.05), ("test", 0.05)]:
        sigma = (n * p * (1 - p)) ** 0.5
        assert abs(got.get(name, 0) - n * p) <= 4 * sigma + 1, (name, got)


def test_dataset_split_stable_under_corpus_growth(docs):
    """THE hash-split contract: a document's assignment never changes
    when other documents are added — membership depends only on
    (salt, id, fractions)."""
    full = {r["doc_id"]: r["split"]
            for r in SH.dataset_split(docs).collect()}
    subset = docs.filter(F.col("doc_id") % 3 == 0)
    sub = {r["doc_id"]: r["split"]
           for r in SH.dataset_split(subset).collect()}
    assert sub == {k: v for k, v in full.items() if k % 3 == 0}


def test_dataset_split_salt_redeals(docs):
    a = {r["doc_id"]: r["split"] for r in SH.dataset_split(docs).collect()}
    b = {r["doc_id"]: r["split"]
         for r in SH.dataset_split(docs, salt="v2").collect()}
    assert a != b  # a rotation actually re-deals ...
    assert set(a) == set(b)  # ... without dropping or duplicating rows


def test_dataset_split_custom_fractions_and_single_split(docs):
    two = SH.dataset_split(docs, fractions=[("fit", 0.5), ("holdout", 0.5)])
    assert set(r["split"] for r in
               two.select("split").distinct().collect()) == {
                   "fit", "holdout"}
    one = SH.dataset_split(docs, fractions=[("all", 1.0)])
    assert one.filter(F.col("split") != "all").count() == 0


def test_dataset_split_oracle_thresholds_match_helper():
    """The hand-inlined hex literals in the DuckDB oracle must equal
    _rate_threshold_hex at the default cumulative fractions — the
    drift guard for the oracle's CASE constants."""
    import __spark_entry__ as entrymod

    sql = entrymod.oracle_sql_all()["dataset_split"]
    assert SH._rate_threshold_hex(0.9) == "e6666666"
    assert SH._rate_threshold_hex(0.9 + 0.05) == "f3333333"
    assert "'e6666666'" in sql and "'f3333333'" in sql


def test_dataset_split_plan_zero_exchange(docs):
    p = phys(SH.dataset_split(docs).select("doc_id", "split"))
    assert "Exchange" not in p  # one codegen'd projection, no shuffle
    assert "*(1) Project" in p  # the * marks a WholeStageCodegen span


def test_dataset_split_streaming_twin_shared_code(spark, tmp_path, docs):
    """Stateless ⇒ the batch function IS the streaming operator: run
    dataset_split verbatim over a file stream and require row-for-row
    agreement with the batch result across micro-batch boundaries."""
    src = str(tmp_path / "stream_src")
    docs.select("doc_id").write.parquet(src)
    stream = (spark.readStream.schema("doc_id long")
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = SH.dataset_split(stream, id_col="doc_id")
    from parallel_svms_spark.streaming.windows import run_stream_to_memory
    name = run_stream_to_memory(out, "split_stream")
    got = {r["doc_id"]: r["split"]
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    want = {r["doc_id"]: r["split"]
            for r in SH.dataset_split(docs).collect()}
    assert got == want


# ------------------------------------------------- compression signal family

def test_compression_signals_match_direct_zlib(docs):
    rows = TX.compression_signals(docs).collect()
    texts = {r["doc_id"]: r["text"]
             for r in docs.select("doc_id", "text").collect()}
    assert len(rows) == len(texts)
    for r in rows:
        t = texts[r["doc_id"]]
        comp = len(zlib.compress(t.encode("utf-8"), 6))
        assert r["n_chars"] == len(t)
        assert r["comp_len"] == comp
        assert r["ratio"] == round(comp / max(len(t), 1), 6)


def test_compression_signals_level_changes_output(docs):
    fast = TX.compression_signals(docs, level=1)
    best = TX.compression_signals(docs, level=9)
    sum1 = fast.agg(F.sum("comp_len")).first()[0]
    sum9 = best.agg(F.sum("comp_len")).first()[0]
    assert sum9 <= sum1  # level 9 never compresses worse in total


def test_compression_signal_discriminates_repetition(spark):
    """The reason the signal exists: repeated boilerplate must score a
    clearly lower ratio than high-entropy text of the same length."""
    import random

    rng = random.Random(7)
    junk = "spam ham " * 200
    prose = " ".join("".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                             for _ in range(7)) for _ in range(225))
    df = spark.createDataFrame(
        [(1, junk[:1800]), (2, prose[:1800])], "doc_id long, text string")
    r = {x["doc_id"]: x["ratio"]
         for x in TX.compression_signals(df).collect()}
    assert r[1] < 0.1 < r[2]


def test_compression_profile_consistent_with_signals(docs):
    prof = {r["source"]: r for r in TX.compression_profile(docs).collect()}
    per_doc = (TX.compression_signals(docs, carry=("source",))
               .groupBy("source")
               .agg(F.count("*").alias("n"), F.sum("n_chars").alias("c"),
                    F.sum("comp_len").alias("z")).collect())
    for r in per_doc:
        p = prof[r["source"]]
        assert (p["n_docs"], p["sum_chars"], p["sum_comp"]) == (
            r["n"], r["c"], r["z"])
        assert p["ratio_ppm"] == (r["z"] * 1000000) // r["c"]


def test_compression_plan_single_map_no_shuffle_before_agg(docs):
    p = phys(TX.compression_signals(docs))
    assert "Exchange" not in p  # the per-doc signal is a pure map
    # the rollup adds exactly the one partial-agg shuffle
    p2 = phys(TX.compression_profile(docs))
    assert p2.count("Exchange") == 1


# ------------------------------------------------------ burst debounce family

def test_collapse_bursts_partitions_events(events):
    from parallel_svms_spark.operators import events as EV
    bursts = EV.collapse_bursts(events, gap_seconds=3600)
    assert (bursts.agg(F.sum("n_events")).first()[0]
            == events.count())  # every event in exactly one burst
    # burst bounds are consistent
    assert bursts.filter(F.col("burst_end") < F.col("burst_start")
                         ).count() == 0


def test_burst_starters_are_first_of_each_burst(events):
    from parallel_svms_spark.operators import events as EV
    bursts = EV.collapse_bursts(events, gap_seconds=3600)
    starters = EV.burst_starters(events, gap_seconds=3600)
    assert starters.count() == bursts.count()
    # every starter's ts is its burst's start
    j = starters.join(
        bursts,
        on=[starters["user_id"] == bursts["user_id"],
            starters["event_type"] == bursts["event_type"],
            starters["ts"] == bursts["burst_start"]])
    assert j.count() == bursts.count()


def test_burst_gap_boundary_strictly_greater(spark):
    """Gap EXACTLY equal to the threshold stays in the same burst
    (strict > breaks), matching the sessionize convention and the
    DuckDB oracle."""
    from parallel_svms_spark.operators import events as EV
    rows = [(1, 10, "a", "2024-01-01 00:00:00"),
            (2, 10, "a", "2024-01-01 01:00:00"),   # gap == 3600s
            (3, 10, "a", "2024-01-01 02:00:01"),   # gap 3601s -> new
            (4, 10, "b", "2024-01-01 00:30:00")]   # other type: own burst
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    kept = sorted(r["event_id"] for r in
                  EV.burst_starters(df, gap_seconds=3600).collect())
    assert kept == [1, 3, 4]
    b = {(r["event_type"], r["burst_seq"]): r["n_events"]
         for r in EV.collapse_bursts(df, gap_seconds=3600).collect()}
    assert b == {("a", 1): 2, ("a", 2): 1, ("b", 1): 1}


def test_burst_plan_user_keyed_windows_only(events):
    from parallel_svms_spark.operators import events as EV
    p = phys(EV.burst_starters(events, gap_seconds=3600))
    assert "Exchange SinglePartition" not in p  # never a global window
    assert "CartesianProduct" not in p


# --------------------------------------- normalized dedup + compression gate

def test_exact_dedup_normalized_merges_trivial_variants(spark):
    from parallel_svms_spark.operators import dedup as D
    rows = [(1, "Call 555 please"),
            (2, "call 99 please"),      # same after <num> mask + lower
            (3, "call me maybe"),
            (4, "Email a@b.com now"),
            (5, "email c@d.org  now")]  # same after <email> + ws collapse
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in
                  D.exact_dedup_keys_normalized(df).collect())
    assert kept == [1, 3, 4]
    # plain exact dedup would keep all five — normalization IS the delta
    assert D.exact_dedup_keys(df).count() == 5


def test_compression_screen_gates_junk_keeps_prose(spark):
    import random

    from parallel_svms_spark.operators import text as TXm
    rng = random.Random(11)
    junk = ("na " * 600)[:1800]
    prose = " ".join("".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                             for _ in range(7)) for _ in range(225))[:1800]
    df = spark.createDataFrame(
        [(1, junk, "a"), (2, prose, "b")],
        "doc_id long, text string, source string")
    out = TXm.compression_screen(df, min_ratio=0.25)
    assert [r["doc_id"] for r in out.collect()] == [2]
    # all input columns pass through unchanged
    assert out.columns == df.columns


def test_compression_screen_matches_signals_threshold(docs):
    from parallel_svms_spark.operators import text as TXm
    thr = 0.45
    want = {r["doc_id"] for r in
            TXm.compression_signals(docs).collect()
            if r["comp_len"] / max(r["n_chars"], 1) >= thr}
    got = {r["doc_id"] for r in
           TXm.compression_screen(docs, min_ratio=thr).collect()}
    assert got == want and 0 < len(got) < docs.count()


def test_compression_screen_streaming_twin(spark, tmp_path, docs):
    from parallel_svms_spark.operators.text import compression_screen
    from parallel_svms_spark.streaming.windows import (
        run_stream_to_memory, streaming_compression_screen)
    src = str(tmp_path / "docs_stream")
    docs.select("doc_id", "text").write.parquet(src)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = streaming_compression_screen(stream, min_ratio=0.45)
    name = run_stream_to_memory(out, "comp_screen_stream")
    got = {r["doc_id"]
           for r in spark.sql(f"SELECT doc_id FROM {name}").collect()}
    want = {r["doc_id"]
            for r in compression_screen(
                docs.select("doc_id", "text"), min_ratio=0.45).collect()}
    assert got == want


# ------------------------------------------------ split-decontaminate compose

def test_split_decontaminate_composition(docs):
    """The composed firewall equals decontaminate(train, held) run on
    explicit dataset_split halves, and no surviving train doc shares a
    4-shingle with the held-out side."""
    from parallel_svms_spark.operators.contamination import (
        contaminated_ids, decontaminate, decontaminate_splits)
    from parallel_svms_spark.operators.sharding import dataset_split

    s = dataset_split(docs)
    train = s.filter(F.col("split") == "train").drop("split")
    held = s.filter(F.col("split") != "train").drop("split")
    want = {r.doc_id for r in decontaminate(
        train, held, k=4, broadcast_benchmark=False).collect()}
    got = {r.doc_id
           for r in decontaminate_splits(docs, k=4).collect()}
    assert got == want
    # firewall property: surviving ∩ contaminated = ∅, and the kept
    # set is exactly train minus the contaminated ids
    bad = {r.doc_id for r in contaminated_ids(train, held, k=4).collect()}
    train_ids = {r.doc_id for r in train.select("doc_id").collect()}
    assert got == train_ids - bad and not (got & bad)


def test_split_decontaminate_requests_no_broadcast_path(docs, monkeypatch):
    """The held side is a constant corpus FRACTION, so the composition
    must request decontaminate's broadcast_benchmark=False path — no
    STATIC broadcast hint on a corpus-fraction-sized side (AQE may
    still choose broadcast at runtime from measured sizes, which is
    the correct adaptive behavior at small scale and exactly why the
    assertion is on the CALL contract, not the executed plan)."""
    from parallel_svms_spark.operators import contamination as C

    seen = {}
    orig = C.decontaminate

    def spy(corpus, benchmark, **kw):
        seen.update(kw)
        return orig(corpus, benchmark, **kw)

    monkeypatch.setattr(C, "decontaminate", spy)
    out = C.decontaminate_splits(docs, k=4)
    assert seen.get("broadcast_benchmark") is False
    p = phys(out)
    assert "CartesianProduct" not in p


def test_heavy_keys_approx_equals_exact_in_lossless_regime(events):
    a = X.heavy_keys(events, "user_id", k=10).collect()
    b = X.heavy_keys_approx(events, "user_id", k=10).collect()
    assert a == b


def test_heavy_keys_approx_mg_bound_tiny_capacity(spark):
    """The merged Misra-Gries guarantee: a key whose global frequency
    exceeds n/capacity ALWAYS survives summarization, and its
    recounted value is exact — even at a capacity far below the key
    cardinality."""
    df = (spark.range(10000)
          .select((F.col("id") % 1000).alias("k"))
          .union(spark.range(5000).select(F.lit(7).alias("k"))))
    r = X.heavy_keys_approx(df, "k", k=1, capacity=8).collect()
    assert (r[0]["k"], r[0]["n_rows"]) == (7, 5010)
    assert r[0]["share_ppm"] == (5010 * 1000000) // 15000


def test_heavy_keys_approx_null_keys_and_empty(spark):
    from pyspark.sql import functions as Fn
    rows = ([(None,)] * 6) + ([(3,)] * 2)
    df = spark.createDataFrame(rows, "k int")
    got = [(r["k"], r["n_rows"]) for r in
           X.heavy_keys_approx(df, "k", k=2).collect()]
    assert got == [(None, 6), (3, 2)]
    empty = spark.createDataFrame([], "k long")
    assert X.heavy_keys_approx(empty, "k").count() == 0
    assert Fn is not None


# ----------------------------------------------------- shuffled shard packing

def test_pack_shards_hash_order_is_a_permutation(docs):
    """The pseudo-shuffle repacks the SAME docs/token counts under the
    (md5, id) walk: token totals and doc sets agree with the id-order
    packing, assignments differ, and every shard except the last is
    budget-full in walk order."""
    a = SH.pack_shards(docs, budget_tokens=4096)
    b = SH.pack_shards(docs, budget_tokens=4096, order="hash")
    assert (a.agg(F.sum("n_tokens")).first()[0]
            == b.agg(F.sum("n_tokens")).first()[0])
    assert ({r.doc_id for r in a.collect()}
            == {r.doc_id for r in b.collect()})
    am = {r.doc_id: r.shard for r in a.collect()}
    bm = {r.doc_id: r.shard for r in b.collect()}
    assert am != bm  # the shuffle actually reorders


def test_pack_shards_hash_order_matches_serial_model(docs):
    """Distributed prefix sum under the hash walk equals the serial
    single-threaded recurrence computed in Python."""
    import hashlib

    rows = docs.select("doc_id", "text").collect()
    order = sorted(
        ((hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id,
          len(r.text.split(" "))) for r in rows))
    want, acc = {}, 0
    for _h, did, n in order:
        want[did] = acc // 4096
        acc += n
    got = {r.doc_id: r.shard for r in
           SH.pack_shards(docs, budget_tokens=4096,
                          order="hash").collect()}
    assert got == want


def test_pack_shards_unknown_order_rejected(docs):
    with pytest.raises(ValueError):
        SH.pack_shards(docs, order="random")


def test_pack_sequences_hash_order_contiguous_slices(docs):
    """With order='hash' a sequence concatenates its docs in the same
    (md5, id) walk the shard assignment used — each sequence is a
    contiguous slice of the shuffled stream (serial model check)."""
    import hashlib

    rows = docs.select("doc_id", "text").collect()
    walk = sorted(
        ((hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id,
          r.text) for r in rows))
    acc, shards = 0, {}
    for _h, did, text in walk:
        shards.setdefault(acc // 4096, []).append(text)
        acc += len(text.split(" "))
    want = {s: "\n\n".join(ts) for s, ts in shards.items()}
    got = {r.shard: r.text for r in
           SH.pack_sequences(docs, budget_tokens=4096,
                             order="hash").collect()}
    assert got == want
