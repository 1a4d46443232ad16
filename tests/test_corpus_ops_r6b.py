"""Round-6 second-wave corpus operators: overlapping document
chunking (``sharding.chunk_documents``), k-fold carve + balance audit
(``sharding.kfold_assign``/``fold_balance``), padding-waste accounting
(``sharding.padding_stats``), blocked edit-distance near-dup
(``dedup.editdist_near_dups``), column-level survivorship merge
(``relational.merge_survivorship``) and the mergeSchema evolution
reader (``io.sources.read_evolved``).

Contract (exact values vs an independent local recomputation, edge
cases) + scale shape (plan assertions) — the suite's two-sided
standard.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from parallel_svms_spark.io.sources import load_table
from parallel_svms_spark.operators import dedup as D
from parallel_svms_spark.operators import relational as R
from parallel_svms_spark.operators import sharding as SH


def phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


# ----------------------------------------------------------- chunk_documents

def test_chunk_documents_boundaries_exact(spark):
    text = "abcdefghij" * 10  # 100 chars
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        SH.chunk_documents(df, chunk_chars=40, overlap=10).collect(),
        key=lambda r: r["chunk_ix"])
    # stride 30: starts 0, 30, 60, 90
    assert [r["chunk_start"] for r in rows] == [0, 30, 60, 90]
    assert [r["chunk_ix"] for r in rows] == [0, 1, 2, 3]
    for r in rows:
        s = r["chunk_start"]
        assert r["chunk_text"] == text[s:s + 40]
        assert r["n_chunk_chars"] == len(text[s:s + 40])
    # consecutive chunks share exactly `overlap` characters
    assert rows[0]["chunk_text"][30:] == rows[1]["chunk_text"][:10]


def test_chunk_documents_empty_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "x"), (3, "y" * 224), (4, "z" * 225)],
        "doc_id long, text string")
    out = SH.chunk_documents(df).groupBy("doc_id").count().collect()
    got = {r["doc_id"]: r["count"] for r in out}
    # empty doc: zero chunks (start<n filter); 1..224 chars: one
    # chunk; 225 chars: second chunk starts at stride 224 < 225
    assert got == {2: 1, 3: 1, 4: 2}


def test_chunk_documents_covers_every_character(docs):
    # union of [start, start+len) intervals == [0, n_chars): no gap,
    # no overrun — checked via per-doc max(chunk_start+len)==len(text)
    # and stride <= chunk width (overlap >= 0 → no gaps by arithmetic)
    agg = (SH.chunk_documents(docs)
           .groupBy("doc_id")
           .agg(F.max(F.col("chunk_start") + F.col("n_chunk_chars"))
                .alias("covered"))
           .join(docs.select("doc_id",
                             F.length("text").alias("n")), "doc_id")
           .filter((F.col("covered") != F.col("n")) & (F.col("n") > 0)))
    assert agg.count() == 0


def test_chunk_documents_plan_is_narrow(docs):
    # pure generate+project: no exchange at any corpus size
    assert "Exchange" not in phys(SH.chunk_documents(docs))


# ------------------------------------------------------- kfold / fold_balance

def test_kfold_assign_partitions_exhaustively(docs):
    ids = docs.select(F.col("doc_id").alias("vec_id"))
    out = SH.kfold_assign(ids, k=5)
    n = ids.count()
    assert out.count() == n
    folds = {r["fold"] for r in out.select("fold").distinct().collect()}
    assert folds <= set(range(5))
    # disjoint by construction (one row in, one fold out); stability:
    # same deal on a subset never flips a surviving row
    sub = SH.kfold_assign(ids.filter("vec_id % 2 = 0"), k=5)
    full = {r["vec_id"]: r["fold"] for r in out.collect()}
    for r in sub.collect():
        assert full[r["vec_id"]] == r["fold"]


def test_fold_balance_counts_match_assignment(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    bal = SH.fold_balance(emb, k=5)
    total = sum(r["n_rows"] for r in bal.collect())
    assert total == emb.count()
    # every fold represented at fixture scale
    assert bal.select("fold").distinct().count() == 5


def test_kfold_assign_plan_is_narrow(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    assert "Exchange" not in phys(SH.kfold_assign(emb))


# --------------------------------------------------------------- padding_stats

def test_padding_stats_matches_local_model(docs):
    rows = docs.select("text").collect()
    ctx, bucket = 128, 32
    model: dict[int, list[int]] = {}
    for r in rows:
        n = len(r["text"].split(" "))
        model.setdefault(n // bucket, []).append(n)
    got = {r["len_bucket"]: r for r in SH.padding_stats(docs).collect()}
    assert set(got) == set(model)
    for b, toks in model.items():
        r = got[b]
        assert r["n_docs"] == len(toks)
        assert r["sum_tokens"] == sum(toks)
        assert r["max_tokens"] == max(toks)
        assert r["pad_bucketed"] == max(toks) * len(toks) - sum(toks)
        assert r["pad_fixed"] == sum(max(ctx - t, 0) for t in toks)


def test_padding_stats_bucketed_never_worse_than_fixed(docs):
    # for docs shorter than the context, bucket-padding <= fixed-
    # padding per bucket whenever bucket_max <= context (arithmetic
    # identity the audit relies on); just pin total waste ordering at
    # fixture scale where all buckets sit below the context
    r = (SH.padding_stats(docs)
         .agg(F.sum("pad_bucketed").alias("b"),
              F.sum("pad_fixed").alias("f")).first())
    assert r["b"] <= r["f"]


# -------------------------------------------------------- editdist_near_dups

def test_editdist_verifies_with_levenshtein(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"),
         (2, "the quick brown fax jumps"),   # 1 substitution
         (3, "the quick brown fox leaps"),   # 3 edits from 1
         (4, "a completely different doc")],
        "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"]): r["edit_dist"]
             for r in D.editdist_near_dups(
                 df, max_dist=3, block_prefix=12, length_band=8)
             .collect()}
    assert pairs[(1, 2)] == 1
    assert (1, 3) in pairs  # distance 3 within the same block
    assert all(4 not in p for p in pairs)


def test_editdist_blocking_bounds_candidates(spark):
    # docs in different length bands never pair even if prefixes match
    df = spark.createDataFrame(
        [(1, "same prefix here" + "x" * 10),
         (2, "same prefix here" + "x" * 200)],
        "doc_id long, text string")
    assert D.editdist_near_dups(df, max_dist=64).count() == 0


def test_editdist_max_block_cap_drops_hot_blocks(spark):
    rows = [(i, "boilerplate header " + str(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # all 40 share block → cap 10 drops the whole block
    assert D.editdist_near_dups(df, max_block=10).count() == 0
    uncapped = D.editdist_near_dups(df, max_block=None, max_dist=2)
    assert uncapped.count() > 0


def test_editdist_plan_single_agg_no_join(docs):
    # bucket-local pair expansion: one aggregation, no SortMergeJoin /
    # BroadcastHashJoin — the self-join never materializes
    p = phys(D.editdist_near_dups(docs))
    assert "Join" not in p


# ------------------------------------------------------- merge_survivorship

def test_merge_survivorship_latest_non_null_wins(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1, "signup", 10.0),
        (1, "2024-01-02 00:00:00", 2, None, 20.0),
        (1, "2024-01-03 00:00:00", 3, "purchase", None),
        (2, "2024-01-01 00:00:00", 4, None, None),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, "
              "event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["user_id"]: r for r in R.merge_survivorship(df).collect()}
    # user 1: event_type from the latest non-null (row 3), value from
    # row 2 — the partial update did NOT erase the earlier attribute
    assert got[1]["last_event_type"] == "purchase"
    assert got[1]["last_value"] == 20.0
    # user 2: all-null attributes survive as NULL, row still present
    assert got[2]["last_event_type"] is None
    assert got[2]["last_value"] is None


def test_merge_survivorship_tiebreak_is_deterministic(spark):
    rows = [(1, "2024-01-01 00:00:00", 1, "a", 1.0),
            (1, "2024-01-01 00:00:00", 2, "b", 2.0)]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, "
              "event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = R.merge_survivorship(df).first()
    assert r["last_event_type"] == "b"  # higher event_id wins the tie


def test_merge_survivorship_one_exchange(events):
    changes = events.select("user_id", "ts", "event_id",
                            "event_type", "value")
    p = phys(R.merge_survivorship(changes))
    assert p.count("Exchange hashpartitioning") == 1


# ------------------------------------------------------------- read_evolved

def test_read_evolved_reconciles_generations(spark, docs):
    from parallel_svms_spark.io.sources import (read_evolved,
                                                write_schema_generation)
    tmp = tempfile.mkdtemp(prefix="evolve_test_")
    try:
        write_schema_generation(docs.select("doc_id", "lang"), tmp, 1)
        write_schema_generation(
            docs.select("doc_id", "source", "n_chars"), tmp, 2)
        merged = read_evolved(spark, tmp)
        assert set(merged.columns) == {"doc_id", "lang", "source",
                                       "n_chars"}
        n = docs.count()
        assert merged.count() == 2 * n
        # generation 1 rows carry NULL for the columns it never wrote
        assert merged.filter(F.col("source").isNull()).count() == n
        assert merged.filter(F.col("lang").isNull()).count() == n
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ----------------------------------------------------------------- attribution

def test_attribution_last_vs_first_touch(spark):
    from parallel_svms_spark.operators import events as E
    rows = [
        (1, "2024-01-01 00:00:00", 1, "click"),
        (1, "2024-01-02 00:00:00", 2, "click"),
        (1, "2024-01-03 00:00:00", 3, "purchase"),
        (2, "2024-01-01 00:00:00", 4, "purchase"),  # no touch: organic
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    last = {r["event_id"]: r for r in E.attribution(df, model="last").collect()}
    first = {r["event_id"]: r for r in E.attribution(df, model="first").collect()}
    assert last[3]["touch_event_id"] == 2   # most recent click
    assert first[3]["touch_event_id"] == 1  # earliest click
    assert last[4]["touch_event_id"] is None  # organic bucket kept
    assert last[3]["gap_us"] == 24 * 3600 * 1_000_000


def test_attribution_horizon_gates_on_last_touch(spark):
    from parallel_svms_spark.operators import events as E
    rows = [
        (1, "2024-01-01 00:00:00", 1, "click"),
        (1, "2024-03-01 00:00:00", 2, "purchase"),  # 60 days later
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = E.attribution(df, model="last", horizon_hours=168).first()
    assert got["touch_event_id"] is None  # outside the 7-day lookback
    no_gate = E.attribution(df, model="last", horizon_hours=None).first()
    assert no_gate["touch_event_id"] == 1


def test_attribution_one_exchange(events):
    from parallel_svms_spark.operators import events as E
    p = phys(E.attribution(events))
    assert p.count("Exchange hashpartitioning") == 1


# ------------------------------------------------------ quality_quantile_norm

def test_quality_quantile_norm_is_per_source_percentile(docs):
    from parallel_svms_spark.operators import text as TX
    out = TX.quality_quantile_norm(docs).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src, rows in by_src.items():
        rows.sort(key=lambda r: (r["quality"], r["doc_id"]))
        n = len(rows)
        for i, r in enumerate(rows):
            want = 0.0 if n == 1 else round(i / (n - 1), 6)
            assert abs(r["q_norm"] - want) < 1e-9
    # rank-normalized scores are comparable across sources: every
    # source spans [0, 1]
    for rows in by_src.values():
        assert rows[0]["q_norm"] == 0.0
        assert rows[-1]["q_norm"] == 1.0


# ------------------------------------------------------------- term_postings

def test_term_postings_counts_and_positions(spark):
    from parallel_svms_spark.operators import text as TX
    df = spark.createDataFrame(
        [(1, "a b a c a"), (2, "b c d"), (3, "d d d")],
        "doc_id long, text string")
    out = {(r["token"], r["doc_id"]): (r["n_occ"], r["first_pos"])
           for r in TX.term_postings(df, max_df_frac=None,
                                     max_doc_freq=10).collect()}
    assert out[("a", 1)] == (3, 0)
    assert out[("b", 2)] == (1, 0)
    assert out[("d", 3)] == (3, 0)
    assert out[("c", 2)] == (1, 1)


def test_term_postings_relative_cap_drops_hot_tokens(spark):
    from parallel_svms_spark.operators import text as TX
    # 'x' appears in all 4 docs (df 100%), others in 1 (25%)
    df = spark.createDataFrame(
        [(i, f"x w{i}") for i in range(4)], "doc_id long, text string")
    toks = {r["token"] for r in
            TX.term_postings(df, max_df_frac=0.5).collect()}
    assert "x" not in toks
    assert toks == {f"w{i}" for i in range(4)}


# --------------------------------------------------------------- pack_chunks

def test_pack_chunks_matches_serial_model(docs):
    from parallel_svms_spark.operators import sharding as SH
    got = sorted((r["chunk_id"], r["n_tokens"], r["shard"])
                 for r in SH.pack_chunks(docs, budget_tokens=512).collect())
    chunks = sorted(
        (r["doc_id"] * 1000 + r["chunk_ix"], r["chunk_text"])
        for r in SH.chunk_documents(docs).collect())
    run, want = 0, []
    for cid, text in chunks:
        n = len(text.split(" "))
        want.append((cid, n, run // 512))
        run += n
    assert got == want


def test_pack_chunks_factor_overflow_raises_not_corrupts(spark):
    """ADVICE r6: a document with >= chunk_factor chunks must FAIL
    LOUDLY (raise_error in the id projection), never silently
    collide/mis-order chunk ids."""
    import pytest as _pytest

    from parallel_svms_spark.operators import sharding as SH
    long_doc = spark.createDataFrame(
        [(1, "w " * 3000)], "doc_id long, text string")
    # factor 4 → the ~13 chunks at chunk_chars=512 overflow it
    # (pack_shards' prefix-sum pass is eager, so the guard can fire
    # at construction time already — wrap the whole call)
    with _pytest.raises(Exception, match="chunk_factor"):
        SH.pack_chunks(long_doc, chunk_chars=512, overlap=0,
                       chunk_factor=4).collect()
    # a big-enough factor packs the same doc fine
    ok = SH.pack_chunks(long_doc, chunk_chars=512, overlap=0,
                        chunk_factor=1000)
    assert ok.count() > 4


def test_dataset_split_rejects_invalid_fractions(spark):
    """ADVICE r6: fractions must be validated — leading fractions
    summing to >= 1 starve later splits at the 'ffffffff' clamp, and
    negative fractions are nonsense; both must raise."""
    import pytest as _pytest

    from parallel_svms_spark.operators import sharding as SH
    df = spark.createDataFrame([(1,)], "doc_id long")
    with _pytest.raises(ValueError, match="sum"):
        SH.dataset_split(df, fractions=[("a", 0.7), ("b", 0.4),
                                        ("c", 0.0)])
    with _pytest.raises(ValueError, match="negative"):
        SH.dataset_split(df, fractions=[("a", -0.1), ("b", 0.5)])
    # exactly-1.0 leading sum also starves the residual split
    with _pytest.raises(ValueError, match="sum"):
        SH.dataset_split(df, fractions=[("a", 1.0), ("b", 0.0)])


def test_pack_chunks_keeps_doc_chunks_consecutive(docs):
    from parallel_svms_spark.operators import sharding as SH
    out = SH.pack_chunks(docs, budget_tokens=512)
    # a document's chunks may straddle at most adjacent shards: the
    # (doc, chunk) walk order guarantees shard ids are contiguous
    spread = (out
              .withColumn("doc", (F.col("chunk_id") / 1000).cast("long"))
              .groupBy("doc")
              .agg((F.max("shard") - F.min("shard")).alias("span"),
                   F.count("*").alias("n")))
    bad = spread.filter(F.col("span") >= F.col("n")).count()
    assert bad == 0


def test_term_postings_nested_loop_build_is_one_row(docs):
    # the SCALAR_REATTACH_OK audit exemption's claim: the only
    # BroadcastNestedLoopJoin in the plan reattaches a global
    # (groupless) count — a provably single-row build side
    from parallel_svms_spark.operators import text as TX
    df = TX.term_postings(docs)
    p = phys(df)
    if "BroadcastNestedLoopJoin" in p:
        # the build subtree is the one-row corpus total: a global
        # aggregate with an empty grouping key
        assert "count(1)" in p or "count(*)" in p
        total = docs.agg(F.count("*")).count()
        assert total == 1


# -------------------------------------------------------------- temporal_join

def test_temporal_join_picks_version_effective_at_fact_time(spark):
    from parallel_svms_spark.operators import events as E
    rows = [
        # versions: (user 1) v10 at t0, v11 at t2
        (1, "2024-01-01 00:00:00", 10, "view", 1.5),
        (1, "2024-01-03 00:00:00", 11, "view", 2.5),
        # facts: before any version, between versions, at-tie, after
        (1, "2023-12-31 00:00:00", 100, "purchase", 0.0),
        (1, "2024-01-02 00:00:00", 101, "purchase", 0.0),
        (1, "2024-01-03 00:00:00", 102, "purchase", 0.0),
        (1, "2024-01-04 00:00:00", 103, "purchase", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, "
              "event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["fact_id"]: (r["version_id"], r["version_payload"])
           for r in E.temporal_join(
               df.filter("event_type = 'purchase'"),
               df.filter("event_type = 'view'")).collect()}
    assert got[100] == (None, None)       # before any version
    assert got[101] == (10, 1.5)          # version 10 still effective
    assert got[102] == (11, 2.5)          # version AT fact ts applies
    assert got[103] == (11, 2.5)


def test_temporal_join_one_exchange(events):
    from parallel_svms_spark.operators import events as E
    p = phys(E.temporal_join(events.filter("event_type = 'purchase'"),
                             events.filter("event_type = 'view'")))
    assert p.count("Exchange hashpartitioning") == 1


# ----------------------------------------------------------- winsorize_events

def test_winsorize_matches_local_model(events):
    from parallel_svms_spark.operators import events as E
    got = {r["event_type"]: r for r in E.winsorize_events(events).collect()}
    rows = events.filter(F.col("value").isNotNull()) \
                 .select("event_type", "value").collect()
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(float(r["value"]))
    for etype, vals in by_type.items():
        vals.sort()
        n = len(vals)

        def q(p):
            pos = 1.0 + p * (n - 1)
            import math
            lo, hi = int(math.floor(pos)), int(math.ceil(pos))
            return vals[lo - 1] + (pos - lo) * (vals[hi - 1] - vals[lo - 1])

        t_lo, t_hi = q(0.01), q(0.99)
        r = got[etype]
        assert r["n"] == n
        assert r["thr_lo"] == t_lo and r["thr_hi"] == t_hi
        assert r["n_clipped_lo"] == sum(1 for v in vals if v < t_lo)
        assert r["n_clipped_hi"] == sum(1 for v in vals if v > t_hi)
        wins = [min(max(v, t_lo), t_hi) for v in vals]
        assert abs(r["mean_winsorized"] - round(sum(wins) / n, 6)) < 2e-6
        # winsorized mean bounded by the thresholds
        assert t_lo <= r["mean_winsorized"] <= t_hi


def test_winsorize_bounds_sentinel_influence(spark):
    from parallel_svms_spark.operators import events as E
    # 999 sane readings + one 1e9 sentinel: raw mean explodes, the
    # winsorized mean stays in the sane range — the op's reason to exist
    rows = [(i, "2024-01-01 00:00:00", 1, "m", float(i % 10)) for i in range(999)]
    rows.append((999, "2024-01-01 00:00:00", 1, "m", 1e9))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, "
              "event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = E.winsorize_events(df).first()
    assert r["mean_raw"] > 1000
    assert r["mean_winsorized"] < 15
    assert r["n_clipped_hi"] >= 1
