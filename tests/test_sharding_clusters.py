"""Shard packing, stratified sampling, and near-dup cluster
canonicalization (SURVEY §2.8 extension surface, r3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_svms_spark.io.sources import load_table
from parallel_svms_spark.operators import dedup as D
from parallel_svms_spark.operators import sharding as SH


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_pack_shards_matches_serial_prefix_sum(spark, docs):
    """The two-pass distributed prefix sum must equal the serial
    definition exactly: shard = floor(tokens_before_doc / budget)."""
    budget = 512
    got = {r.doc_id: (r.n_tokens, r.shard)
           for r in SH.pack_shards(docs, budget).collect()}
    rows = sorted((r.doc_id, len(r.text.split(" ")))
                  for r in docs.select("doc_id", "text").collect())
    acc = 0
    for doc_id, n_tok in rows:
        assert got[doc_id] == (n_tok, acc // budget), doc_id
        acc += n_tok
    assert len(got) == len(rows)
    # shard index is non-decreasing in id order (contiguous packing)
    shards_in_order = [got[doc_id][1] for doc_id, _ in rows]
    assert shards_in_order == sorted(shards_in_order)


def test_pack_shards_skewed_partitions(spark):
    """Range partitioning with heavily skewed doc sizes must still
    reproduce the serial assignment (offsets, not per-partition
    restarts)."""
    rows = [(i, "tok " * (1000 if i % 7 == 0 else 3)) for i in range(200)]
    df = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string") \
        .repartition(13)
    budget = 777
    got = {r.doc_id: r.shard for r in SH.pack_shards(df, budget).collect()}
    acc = 0
    for i, t in rows:
        n = len(t.strip().split(" "))
        assert got[i] == acc // budget, i
        acc += n


def test_stratified_sample_deterministic_and_balanced(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    s1 = SH.stratified_sample(emb, n_per_label=7)
    s2 = SH.stratified_sample(emb, n_per_label=7)
    r1 = sorted((r.vec_id, r.label) for r in s1.collect())
    assert r1 == sorted((r.vec_id, r.label) for r in s2.collect())
    counts = {r.label: r.c for r in
              s1.groupBy("label").agg(F.count("*").alias("c")).collect()}
    full = {r.label: r.c for r in
            emb.groupBy("label").agg(F.count("*").alias("c")).collect()}
    for lbl, n in full.items():
        assert counts.get(lbl, 0) == min(7, n)


def test_dedup_clusters_transitive_closure(spark):
    """Chained near-dups must collapse into ONE cluster even when the
    endpoints are not pairwise similar (the property a pair list alone
    cannot express)."""
    # docs 0-2: a chain (0~1, 1~2 similar; 0 vs 2 less so); 10: unrelated
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    toks = base.split(" ")
    d0 = " ".join(toks)
    d1 = " ".join(toks[1:])            # high overlap with d0
    d2 = " ".join(toks[2:])            # high overlap with d1
    d3 = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(0, d0), (1, d1), (2, d2), (10, d3)], "doc_id long, text string")
    got = {r.doc_id: r.cluster_rep
           for r in D.dedup_clusters(df, k=3, threshold=0.5).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 10: 10}
    # canonical filter keeps exactly one doc per cluster
    keep = sorted(i for i, rep in got.items() if i == rep)
    assert keep == [0, 10]


def test_dedup_clusters_long_chain_and_singletons(spark):
    """r10 endpoint-only propagation: a 5-link chain whose edges are
    adjacent-only (label 0 needs 4 propagation rounds to reach the
    last node) plus out-of-pair singletons that must come back as
    their own reps through the final attach join, not the loop."""
    vocab = [f"w{i:02d}" for i in range(16)]
    # windows of 8 tokens at offsets 0,2,4,6,8: adjacent windows share
    # 4 of their 6 3-gram shingles (jaccard 0.5 ≥ t) while offset-4
    # windows share 2 of 6 (jaccard 0.2 < t) — a pure chain
    rows = [(i, " ".join(vocab[off:off + 8]))
            for i, off in enumerate((0, 2, 4, 6, 8))]
    rows += [(100, "aa bb cc dd ee ff gg hh"),
             (101, "ii jj kk ll mm nn oo pp")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.cluster_rep
           for r in D.dedup_clusters(df, k=3, threshold=0.5).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 100: 100, 101: 101}


def test_dedup_clusters_on_fixture_matches_pairs(spark, docs):
    """Every pair's two docs share a rep; reps are component minima."""
    pairs = D.ngram_jaccard_pairs(docs, k=3, threshold=0.5,
                                  log_dropped=False).collect()
    rep = {r.doc_id: r.cluster_rep
           for r in D.dedup_clusters(docs, k=3, threshold=0.5).collect()}
    for p in pairs:
        assert rep[p.doc_a] == rep[p.doc_b]
        assert rep[p.doc_a] <= min(p.doc_a, p.doc_b)
    # docs in no pair are their own rep
    in_pairs = {p.doc_a for p in pairs} | {p.doc_b for p in pairs}
    for doc_id, r in rep.items():
        if doc_id not in in_pairs:
            assert r == doc_id


def test_write_corpus_shards_layout_and_roundtrip(spark, docs, tmp_path):
    from pyspark.sql import functions as F

    path = str(tmp_path / "shards")
    packed = SH.write_corpus_shards(docs, path, budget_tokens=4096)
    assign = {r.doc_id: r.shard for r in packed.collect()}
    # hive layout: one directory per shard
    dirs = sorted(p.name for p in (tmp_path / "shards").iterdir()
                  if p.name.startswith("shard="))
    assert dirs == sorted(f"shard={s}" for s in set(assign.values()))
    # read-back: every doc present, in the shard pack_shards assigned,
    # with full original columns intact
    back = spark.read.parquet(path)
    assert sorted(back.columns) == sorted(docs.columns + ["shard"])
    got = {r.doc_id: r.shard for r in back.select("doc_id", "shard").collect()}
    assert got == assign


def test_pack_shards_property_random_ids_sizes_budgets(spark):
    """Property check over the dimensions the fixture can't vary:
    sparse/negative-gapped ids, degenerate sizes, tiny/large budgets.
    (Bounded explicit cases rather than hypothesis-driven Spark jobs —
    each case is a full Spark round trip, so enumerate deterministic
    seeds instead of minutes of shrinking.)"""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n = rng.randint(1, 120)
        ids = rng.sample(range(-10_000, 10_000), n)
        rows = [(i, " ".join("w" * rng.randint(1, 3)
                             for _ in range(rng.randint(1, 40))))
                for i in ids]
        budget = rng.choice([1, 7, 64, 4096])
        df = spark.createDataFrame(rows, "doc_id long, text string") \
            .repartition(rng.choice([1, 5, 32]))
        got = {r.doc_id: (r.n_tokens, r.shard)
               for r in SH.pack_shards(df, budget).collect()}
        acc = 0
        for i, t in sorted(rows):
            ntok = len(t.split(" "))
            assert got[i] == (ntok, acc // budget), (seed, i)
            acc += ntok


def test_pack_sequences_bounded_and_lossless(spark, sf_dir):
    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators.sharding import (pack_sequences,
                                                        pack_shards)
    docs = load_table(spark, sf_dir, "documents")
    budget = 512
    seqs = pack_sequences(docs, budget_tokens=budget).collect()
    # every shard holds < budget + its last doc's tokens (greedy cut),
    # and all but possibly the last shard reach the budget boundary
    assign = pack_shards(docs, budget_tokens=budget).collect()
    max_doc = max(r.n_tokens for r in assign)
    assert all(r.n_tokens < budget + max_doc for r in seqs)
    # lossless: concatenations contain every document exactly once
    total_tokens = sum(r.n_tokens for r in assign)
    assert sum(r.n_tokens for r in seqs) == total_tokens
    assert sum(r.n_docs for r in seqs) == docs.count()
    # deterministic: a second run builds byte-identical sequences
    again = {r.shard: r.text
             for r in pack_sequences(docs, budget_tokens=budget).collect()}
    assert {r.shard: r.text for r in seqs} == again


def test_pack_shards_matches_serial_reference_tiny_budget(spark):
    # budget SMALLER than most docs: every document straddles shard
    # boundaries, the adversarial case for the two-pass prefix sum
    from pyspark.sql import Row

    from parallel_svms_spark.operators.sharding import (pack_sequences,
                                                        pack_shards)
    docs = [Row(doc_id=i, text=" ".join(f"w{j}" for j in range(n)))
            for i, n in enumerate([5, 40, 1, 13, 8, 27, 2, 2, 31, 9])]
    df = spark.createDataFrame(docs)
    budget = 8
    got = {r.doc_id: (r.n_tokens, r.shard)
           for r in pack_shards(df, budget_tokens=budget).collect()}
    acc = 0
    for i, n in enumerate([5, 40, 1, 13, 8, 27, 2, 2, 31, 9]):
        assert got[i] == (n, acc // budget), (i, got[i], acc)
        acc += n
    seqs = pack_sequences(df, budget_tokens=budget).collect()
    assert sum(r.n_docs for r in seqs) == len(docs)
    assert sum(r.n_tokens for r in seqs) == acc


def test_mixture_sample_tokens_serial_recurrence(spark):
    """The distributed per-group prefix sum reproduces the serial
    greedy walk exactly, including a mega-source spanning many range
    partitions and a source smaller than its budget (kept whole)."""
    import hashlib

    from parallel_svms_spark.operators import sharding as SH
    rows = ([(i, "big", "w " * (i % 7 + 1) + "end") for i in range(600)]
            + [(10_000 + i, "tiny", "a b c") for i in range(3)])
    df = spark.createDataFrame(
        [(i, s, t.strip()) for i, s, t in rows],
        "doc_id long, source string, text string")
    got = {(r.doc_id, r.source, r.n_tokens)
           for r in SH.mixture_sample_tokens(df, budget_tokens=400)
           .collect()}
    # serial model
    want = set()
    for src in ("big", "tiny"):
        docs = [(hashlib.md5(str(i).encode()).hexdigest(), i, t)
                for i, s, t in rows if s == src]
        docs.sort()
        acc = 0
        for h, i, t in docs:
            n = len(t.strip().split(" "))
            if acc < 400:
                want.add((i, src, n))
            acc += n
    assert got == want
    assert {s for _, s, _ in got} == {"big", "tiny"}
    tiny_total = sum(n for _, s, n in got if s == "tiny")
    assert tiny_total == 9          # under-budget source kept whole


def test_mixture_sample_tokens_budget_envelope(spark, docs):
    """On the fixture: every source's sampled token total reaches the
    budget (or the source is exhausted) and overshoots by at most one
    document's tokens."""
    from pyspark.sql import functions as F

    from parallel_svms_spark.operators import sharding as SH
    out = SH.mixture_sample_tokens(docs, budget_tokens=1500)
    per = {r.source: (r.total, r.mx)
           for r in out.groupBy("source")
           .agg(F.sum("n_tokens").alias("total"),
                F.max("n_tokens").alias("mx")).collect()}
    full = {r.source: r.total for r in
            docs.filter("text is not null")
            .groupBy("source")
            .agg(F.sum(F.size(F.split("text", " "))).alias("total"))
            .collect()}
    assert set(per) == set(full)
    for src, (total, mx) in per.items():
        if full[src] <= 1500:
            assert total == full[src]      # exhausted source
        else:
            assert 1500 <= total < 1500 + mx


def test_split_by_cluster_never_straddles(spark, docs):
    """The group-aware guarantee BY CONSTRUCTION: no near-dup cluster
    spans two splits, and every near-dup PAIR co-travels."""
    got = SH.split_by_cluster(docs)
    straddle = (got.groupBy("cluster_rep")
                .agg(F.countDistinct("split").alias("n"))
                .filter("n > 1").count())
    assert straddle == 0
    pairs = D.ngram_jaccard_pairs(docs, k=3, threshold=0.5)
    sa = got.select(F.col("doc_id").alias("doc_a"),
                    F.col("split").alias("split_a"))
    sb = got.select(F.col("doc_id").alias("doc_b"),
                    F.col("split").alias("split_b"))
    assert pairs.count() > 0  # the fixture plants near-dups
    assert (pairs.join(sa, "doc_a").join(sb, "doc_b")
            .filter("split_a <> split_b").count()) == 0


def test_split_by_cluster_vs_plain_coin_leak(spark, docs):
    """Why the operator exists: the plain per-doc coin on the SAME
    fixture deals at least one near-dup pair across two splits (the
    memorized-eval leak); the cluster coin cannot."""
    plain = SH.dataset_split(docs.select("doc_id"))
    pairs = D.ngram_jaccard_pairs(docs, k=3, threshold=0.5)
    sa = plain.select(F.col("doc_id").alias("doc_a"),
                      F.col("split").alias("split_a"))
    sb = plain.select(F.col("doc_id").alias("doc_b"),
                      F.col("split").alias("split_b"))
    leaked = (pairs.join(sa, "doc_a").join(sb, "doc_b")
              .filter("split_a <> split_b").count())
    assert leaked > 0


def test_split_by_cluster_partition_and_singletons(spark, docs):
    """Disjoint-exhaustive over the corpus (one row, one split per
    doc) and singletons inherit their own-coin dataset_split fate —
    the carve only MOVES near-dup members, never reshuffles the
    rest."""
    got = SH.split_by_cluster(docs).cache()
    n = docs.count()
    assert got.count() == n
    assert got.select("doc_id").distinct().count() == n
    assert set(r.split for r in got.select("split").distinct()
               .collect()) <= {"train", "valid", "test"}
    # singletons (cluster_rep == doc_id AND no other member) must
    # match dataset_split keyed on their own id
    sizes = got.groupBy("cluster_rep").count()
    single = (got.join(sizes.filter("count = 1"), "cluster_rep")
              .select("doc_id", "split"))
    plain = SH.dataset_split(docs.select("doc_id")) \
              .select("doc_id", F.col("split").alias("plain_split"))
    assert (single.join(plain, "doc_id")
            .filter("split <> plain_split").count()) == 0
    got.unpersist()


def test_split_by_cluster_day_n_member_inherits(spark):
    """Growth stability, the group-aware form: a NEW document joining
    an EXISTING cluster inherits the cluster's standing split (the
    rep is unchanged, so the coin is unchanged) — the frozen-eval-set
    property."""
    day1 = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog"),
         (20, "an entirely different document about spark plans"),
         (30, "completely unrelated third text body here")],
        "doc_id long, text string")
    # day-2 adds a near-dup of doc 10 with a LARGER id
    day2 = day1.union(spark.createDataFrame(
        [(99, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string"))
    s1 = {r.doc_id: r.split
          for r in SH.split_by_cluster(day1).collect()}
    s2 = {r.doc_id: r.split
          for r in SH.split_by_cluster(day2).collect()}
    for d in (10, 20, 30):
        assert s2[d] == s1[d], d  # standing docs never re-dealt
    assert s2[99] == s2[10]  # the newcomer inherits, not re-deals


def test_kfold_by_cluster_never_crosses_folds(spark, docs):
    got = SH.kfold_by_cluster(docs, k=5)
    bad = (got.groupBy("cluster_rep")
           .agg(F.countDistinct("fold").alias("n"))
           .filter("n > 1").count())
    assert bad == 0
    rows = got.collect()
    assert len(rows) == docs.count()
    assert {r.fold for r in rows} <= set(range(5))
    pairs = D.ngram_jaccard_pairs(docs, k=3, threshold=0.5)
    fa = got.select(F.col("doc_id").alias("doc_a"),
                    F.col("fold").alias("fold_a"))
    fb = got.select(F.col("doc_id").alias("doc_b"),
                    F.col("fold").alias("fold_b"))
    assert (pairs.join(fa, "doc_a").join(fb, "doc_b")
            .filter("fold_a <> fold_b").count()) == 0
