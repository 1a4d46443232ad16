"""BPE subword tokenizer (VERDICT r6 #5): the distributed broadcast
merge-table encode must equal an INDEPENDENT serial Python BPE — the
reimplementation below shares no code with operators/bpe.py — and the
padding budgets must consume the real counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_svms_spark.io.sources import load_table
from parallel_svms_spark.operators import bpe as B


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


# --------------------------- independent serial twin (test-only code)

def _serial_train(texts, n_merges):
    from collections import Counter
    words = Counter()
    for t in texts:
        for w in (t or "").split():
            words[w] += 1
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in words.items()}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        top = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(top)
        nv = Counter()
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == top:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nv[tuple(out)] += c
        vocab = dict(nv)
    return merges


def _serial_encode_len(word, merges):
    sym = list(word) + ["</w>"]
    ranks = {m: i for i, m in enumerate(merges)}
    while True:
        cand = [(ranks[(a, b)], i) for i, (a, b)
                in enumerate(zip(sym, sym[1:])) if (a, b) in ranks]
        if not cand:
            return len(sym)
        rank = min(cand)[0]
        pair = merges[rank]
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
                out.append(sym[i] + sym[i + 1])
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
        if len(sym) == 1:
            return 1


# ------------------------------------------------------------- tests

def test_bpe_train_matches_serial_model(docs):
    sample = (docs.select("text",
                          F.md5(F.col("doc_id").cast("string"))
                          .alias("o"))
              .orderBy("o").limit(2048).collect())
    want = _serial_train([r.text for r in sample], 200)
    got = B.bpe_train_merges(docs, n_merges=200, sample_rows=2048)
    assert got == want
    assert len(got) >= 50  # the fixture supports a real merge table


def test_bpe_train_incremental_matches_naive_at_thousands(docs):
    """r9 (VERDICT r8 missing #3): the incremental pair-statistics
    merge loop must emit the IDENTICAL merge sequence to the naive
    recount form at production-scale merge counts. The parquet
    fixture saturates at ~107 merges (31-word vocabulary), so this
    pins equivalence on a seeded synthetic vocabulary deep enough
    for thousands of merges."""
    import random
    from collections import Counter

    rng = random.Random(7)
    wc = Counter()
    for rank in range(500):
        w = "".join(rng.choice("abcdefghij")
                    for _ in range(rng.randint(3, 12)))
        wc[w] += max(1, 10_000 // (rank + 5))

    def naive(wc, n_merges):
        vocab = {tuple(list(wd) + ["</w>"]): c for wd, c in wc.items()}
        merges = []
        for _ in range(n_merges):
            pc = Counter()
            for sym, c in vocab.items():
                for a, b in zip(sym, sym[1:]):
                    pc[(a, b)] += c
            if not pc:
                break
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append(best)
            nv = Counter()
            for sym, c in vocab.items():
                out, i = [], 0
                while i < len(sym):
                    if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                        out.append(sym[i] + sym[i + 1])
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                nv[tuple(out)] += c
            vocab = dict(nv)
        return merges

    want = naive(wc, 2000)
    got = B._train_merges(wc, 2000)
    assert got == want
    assert len(got) > 1000  # the vocab really is merge-deep


def test_bpe_encode_matches_serial_per_doc(docs):
    merges = B.bpe_train_merges(docs, n_merges=200, sample_rows=2048)
    got = {r.doc_id: r.n_tokens
           for r in B.bpe_token_count(docs, merges).collect()}
    rows = docs.select("doc_id", "text").collect()
    for r in rows:
        want = sum(_serial_encode_len(w, merges)
                   for w in (r.text or "").split())
        assert got[r.doc_id] == want, r.doc_id
    # subword counts sit between word count and char count
    for r in rows[:50]:
        n_words = len((r.text or "").split())
        n_chars = len(r.text or "")
        assert n_words <= got[r.doc_id] <= n_chars + n_words, r.doc_id


def test_bpe_train_is_deterministic(docs):
    a = B.bpe_train_merges(docs, n_merges=80, sample_rows=512)
    b = B.bpe_train_merges(docs, n_merges=80, sample_rows=512)
    assert a == b


def test_bpe_token_count_plan_zero_exchange(docs):
    merges = B.bpe_train_merges(docs, n_merges=50, sample_rows=256)
    p = (B.bpe_token_count(docs, merges)
         ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in p  # broadcast dict + one Arrow map
    assert "MapInPandas" in p


def test_padding_stats_bpe_mode_matches_recount(docs):
    """padding_stats(tokenizer='bpe') must equal the rollup recomputed
    from the per-doc BPE counts — the budget audit consumes the REAL
    subword counts, same algebra as the ws mode."""
    from parallel_svms_spark.operators import sharding as SH
    merges = B.bpe_train_merges(docs)
    got = {r.len_bucket: (r.n_docs, r.sum_tokens, r.max_tokens,
                          r.pad_bucketed, r.pad_fixed)
           for r in SH.padding_stats(docs, context_len=128, bucket=32,
                                     tokenizer="bpe",
                                     merges=merges).collect()}
    per = {r.doc_id: r.n_tokens
           for r in B.bpe_token_count(docs, merges).collect()}
    want: dict = {}
    for n in per.values():
        b = n // 32
        d = want.setdefault(b, [0, 0, 0, 0])
        d[0] += 1
        d[1] += n
        d[2] = max(d[2], n)
        d[3] += max(128 - n, 0)
    assert got == {b: (d[0], d[1], d[2], d[2] * d[0] - d[1], d[3])
                   for b, d in want.items()}
    assert len(got) > 1  # fixture spans multiple length buckets


def test_padding_stats_rejects_unknown_tokenizer(docs):
    from parallel_svms_spark.operators import sharding as SH
    with pytest.raises(ValueError, match="tokenizer"):
        SH.padding_stats(docs, tokenizer="wordpiece")


def test_streaming_bpe_count_matches_batch(spark, docs, tmp_path):
    """The streaming twin is the batch function verbatim — counts must
    agree row-for-row across micro-batch boundaries."""
    import os

    from parallel_svms_spark.streaming import windows as SW

    merges = B.bpe_train_merges(docs, n_merges=80, sample_rows=512)
    batch = {r.doc_id: r.n_tokens
             for r in B.bpe_token_count(docs, merges).collect()}
    src = tmp_path / "src"
    src.mkdir()
    half = docs.count() // 2
    docs.filter(F.col("doc_id") < half).select("doc_id", "text") \
        .coalesce(1).write.parquet(str(src / "a"))
    docs.filter(F.col("doc_id") >= half).select("doc_id", "text") \
        .coalesce(1).write.parquet(str(src / "b"))
    import glob
    import shutil
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, p in enumerate(sorted(glob.glob(f"{src}/*/part-*"))):
        shutil.copy(p, f"{flat}/{i:04d}.parquet")
        os.utime(f"{flat}/{i:04d}.parquet", (1000 + i, 1000 + i))
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(str(flat)))
    feed = SW.streaming_bpe_count(stream, merges)
    q = (feed.writeStream.outputMode("append")
         .format("memory").queryName("stream_bpe").start())
    q.processAllAvailable()
    q.stop()
    got = {r.doc_id: r.n_tokens
           for r in spark.sql("SELECT * FROM stream_bpe").collect()}
    assert got == batch


def test_bpe_encode_ids_size_matches_count(docs):
    """VERDICT r7 #2 done-criterion: size(ids) == n_tokens per doc —
    both paths run the identical encode_word under the same frozen
    artifact."""
    art = B.bpe_train(docs, n_merges=20)
    per = B.bpe_encode_ids(docs, art)
    cnt = B.bpe_token_count(docs, art["merges"])
    j = (per.select("doc_id", F.size("ids").alias("sz"))
         .join(cnt, "doc_id"))
    assert j.filter(F.col("sz") != F.col("n_tokens")).count() == 0
    assert j.count() == docs.count()


def test_bpe_encode_ids_decode_roundtrip(docs):
    """Every id decodes back to its symbol (invert bpe_symbol_ids) and
    the symbols re-join — EOW-stripped — to the original whitespace
    words: the id sequences are lossless for alphabet-covered text."""
    art = B.bpe_train(docs, n_merges=20)
    inv = {i: s for s, i in B.bpe_symbol_ids(art).items()}
    rows = (B.bpe_encode_ids(docs, art)
            .join(docs.select("doc_id", "text"), "doc_id")
            .limit(200).collect())
    assert rows
    for r in rows:
        decoded = "".join(inv[i] for i in r.ids)
        want = "".join(w + B.EOW for w in (r.text or "").split())
        assert decoded == want, r.doc_id


def test_bpe_symbol_ids_layout_and_determinism(docs):
    art = B.bpe_train(docs, n_merges=30)
    ids = B.bpe_symbol_ids(art)
    assert ids[B.UNK] == 0 and ids[B.EOW] == 1
    # alphabet then merges, contiguous, duplicates keep first id
    assert len(ids) <= 2 + len(art["alphabet"]) + len(art["merges"])
    assert ids == B.bpe_symbol_ids(art)


def test_bpe_vocab_save_load_roundtrip(docs, tmp_path):
    """VERDICT r7 #3: train→save→load→encode must equal the in-memory
    path exactly — the committed vocabulary is the whole state."""
    art = B.bpe_train(docs, n_merges=40, sample_rows=512)
    p = str(tmp_path / "vocab.json")
    B.bpe_save_vocab(art, p)
    loaded = B.bpe_load_vocab(p)
    assert loaded == art
    a = sorted((r.doc_id, r.ids)
               for r in B.bpe_encode_ids(docs.limit(50), art).collect())
    b = sorted((r.doc_id, r.ids)
               for r in B.bpe_encode_ids(docs.limit(50),
                                         loaded).collect())
    assert a == b


def test_bpe_two_day_cycle_frozen_vocab(spark, docs, tmp_path):
    """Day-N vocabulary commits once; day-N+1's batch encodes under
    the FROZEN file — including characters day N never saw, which map
    to UNK (id 0) instead of growing the vocab."""
    day1 = docs.filter(F.col("doc_id") % 2 == 0)
    art = B.bpe_train(day1, n_merges=40)
    p = str(tmp_path / "day1_vocab.json")
    B.bpe_save_vocab(art, p)
    day2 = spark.createDataFrame(
        [(900_001, "vector stream ügly ünknown"),
         (900_002, "filter column")],
        "doc_id long, text string")
    frozen = B.bpe_load_vocab(p)
    rows = {r.doc_id: r.ids
            for r in B.bpe_encode_ids(day2, frozen).collect()}
    assert "ü" not in art["alphabet"]
    assert 0 in rows[900_001]      # unseen char -> UNK under day-1 ids
    assert 0 not in rows[900_002]  # covered text never emits UNK
    # and the frozen path equals the in-memory artifact bit-for-bit
    again = {r.doc_id: r.ids
             for r in B.bpe_encode_ids(day2, art).collect()}
    assert rows == again


def test_bpe_string_id_corpus(docs):
    """ADVICE/VERDICT r7 #4: the output id column derives its type
    from the input schema — a string-keyed corpus round-trips without
    a silent Arrow cast."""
    sdocs = docs.select(
        F.concat(F.lit("d"), F.col("doc_id").cast("string"))
        .alias("doc_id"), "text")
    art = B.bpe_train(sdocs, n_merges=20)
    cnt = B.bpe_token_count(sdocs, art["merges"])
    assert dict(cnt.dtypes)["doc_id"] == "string"
    ids = B.bpe_encode_ids(sdocs, art)
    assert dict(ids.dtypes)["doc_id"] == "string"
    r = ids.limit(1).collect()[0]
    assert r.doc_id.startswith("d")


def test_bpe_encode_ids_plan_zero_exchange(docs):
    art = B.bpe_train(docs, n_merges=20, sample_rows=256)
    p = (B.bpe_encode_ids(docs, art)
         ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in p  # broadcast tables + one Arrow map
    assert "MapInPandas" in p


def test_pack_sequences_bpe_ids_matches_serial(docs):
    """pack_sequences(tokenizer='bpe') emits the trainer payload:
    each shard's id arrays concatenated in id order, with
    size(ids) == n_tokens by construction."""
    from parallel_svms_spark.operators import sharding as SH
    art = B.bpe_train(docs, n_merges=20)
    got = SH.pack_sequences(docs, budget_tokens=2048, tokenizer="bpe",
                            vocab=art)
    bad = got.filter(F.size("ids") != F.col("n_tokens")).count()
    assert bad == 0
    # serial model: walk docs in id order, same shard rule, concat ids
    per = {r.doc_id: r.ids
           for r in B.bpe_encode_ids(docs, art).collect()}
    run, want = 0, {}
    for did in sorted(per):
        s = run // 2048
        w = want.setdefault(s, [0, 0, []])
        w[0] += 1
        w[1] += len(per[did])
        w[2].extend(per[did])
        run += len(per[did])
    assert {r.shard: (r.n_docs, r.n_tokens, list(r.ids))
            for r in got.collect()} \
        == {s: (a, b, c) for s, (a, b, c) in want.items()}


def test_pack_shards_bpe_budget_matches_serial_model(docs):
    """pack_shards(tokenizer='bpe') must equal the serial greedy walk
    over the per-doc BPE counts in id order — same prefix-sum shard
    rule, only the counter changes."""
    from parallel_svms_spark.operators import sharding as SH
    # a SMALL merge table: the fixture vocab is tiny enough that the
    # default 200 merges fully fuse every word back to one token
    # (bpe == whitespace counts) — 20 merges keeps words multi-token
    # so the subword budget genuinely differs from the ws budget
    merges = B.bpe_train_merges(docs, n_merges=20)
    got = sorted((r.doc_id, r.n_tokens, r.shard)
                 for r in SH.pack_shards(docs, budget_tokens=2048,
                                         tokenizer="bpe",
                                         merges=merges).collect())
    per = {r.doc_id: r.n_tokens
           for r in B.bpe_token_count(docs, merges).collect()}
    run, want = 0, []
    for did in sorted(per):
        want.append((did, per[did], run // 2048))
        run += per[did]
    assert got == want
    # the BPE budget actually changes the packing vs whitespace
    ws = sorted((r.doc_id, r.shard)
                for r in SH.pack_shards(docs, budget_tokens=2048)
                .collect())
    assert ws != [(d, s) for d, _, s in got]


def test_streaming_bpe_encode_ids_matches_batch(spark, docs, tmp_path):
    """The id-emission streaming twin (r8) is the batch function
    verbatim under a frozen artifact — id sequences must agree
    row-for-row across micro-batch boundaries."""
    import glob
    import os
    import shutil

    from parallel_svms_spark.streaming import windows as SW

    art = B.bpe_train(docs, n_merges=40, sample_rows=512)
    batch = {r.doc_id: list(r.ids)
             for r in B.bpe_encode_ids(docs, art).collect()}
    src = tmp_path / "src"
    src.mkdir()
    half = docs.count() // 2
    docs.filter(F.col("doc_id") < half).select("doc_id", "text") \
        .coalesce(1).write.parquet(str(src / "a"))
    docs.filter(F.col("doc_id") >= half).select("doc_id", "text") \
        .coalesce(1).write.parquet(str(src / "b"))
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, p in enumerate(sorted(glob.glob(f"{src}/*/part-*"))):
        shutil.copy(p, f"{flat}/{i:04d}.parquet")
        os.utime(f"{flat}/{i:04d}.parquet", (1000 + i, 1000 + i))
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(str(flat)))
    feed = SW.streaming_bpe_encode_ids(stream, art)
    q = (feed.writeStream.outputMode("append")
         .format("memory").queryName("stream_bpe_ids").start())
    q.processAllAvailable()
    q.stop()
    got = {r.doc_id: list(r.ids)
           for r in spark.sql("SELECT * FROM stream_bpe_ids").collect()}
    assert got == batch


def test_bpe_train_corpus_exact_parity(spark, docs):
    """sample_rows=None (r10 corpus-exact vocab): when the md5 sample
    would cover the whole corpus anyway (fixture: 500 docs < 2048),
    the distributed word-count path must commit the IDENTICAL
    artifact — same merge sequence, same alphabet."""
    from parallel_svms_spark.operators import bpe as B
    sampled = B.bpe_train(docs, n_merges=200)
    exact = B.bpe_train(docs, n_merges=200, sample_rows=None)
    assert exact["merges"] == sampled["merges"]
    assert exact["alphabet"] == sampled["alphabet"]


def test_bpe_train_corpus_exact_sees_past_sample(spark):
    """The point of the exact path: words BEYOND the sample horizon
    shape the vocabulary. A corpus whose dominant pair lives only in
    the tail rows must merge it under sample_rows=None and miss it
    under a 2-row sample."""
    from parallel_svms_spark.operators import bpe as B
    rows = [(1, "ab"), (2, "cd")]
    # tail rows (md5-late ids chosen by construction: sample takes
    # the 2 md5-smallest) dominated by 'qq'
    rows += [(i, "qqq qqq qqq qqq") for i in range(3, 40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = B.bpe_train(df, n_merges=1, sample_rows=None)
    assert exact["merges"] == [("q", "q")]
    assert "q" in exact["alphabet"]


def test_bpe_decode_ids_roundtrip_corpus_exact(docs):
    """The decode leg (r10): under a corpus-exact artifact every
    document decodes back to its whitespace-run-normalized original —
    alphabet totality makes the round trip lossless, not just
    likely."""
    art = B.bpe_train(docs, n_merges=50, sample_rows=None)
    enc = B.bpe_encode_ids(docs.withColumn("orig", F.col("text")),
                           art, carry=("orig",))
    dec = B.bpe_decode_ids(enc, art, carry=("orig",))
    bad = dec.filter(
        F.col("text") != F.trim(F.regexp_replace(
            F.coalesce("orig", F.lit("")), r"\s+", " "))).count()
    assert bad == 0
    assert dec.count() == docs.count()


def test_bpe_decode_ids_unk_and_truncation(spark):
    """Out-of-alphabet ids decode as the visible <unk> sentinel
    inside the word; a truncated sequence (no closing EOW) still
    yields its partial last word."""
    train = spark.createDataFrame([(1, "abc abc de")],
                                  "doc_id long, text string")
    art = B.bpe_train(train, n_merges=0, sample_rows=None)
    sid = B.bpe_symbol_ids(art)
    probe = spark.createDataFrame([(7, "aZc")],
                                  "doc_id long, text string")
    enc = B.bpe_encode_ids(probe, art)
    [r] = B.bpe_decode_ids(enc, art).collect()
    assert r.text == "a" + B.UNK + "c"  # Z is outside the alphabet
    # truncation: drop the trailing EOW id — partial word survives
    cut = enc.select("doc_id", F.slice("ids", 1, 2).alias("ids"))
    [r2] = B.bpe_decode_ids(cut, art).collect()
    assert r2.text == "a" + B.UNK


def test_bpe_decode_sentinel_caveat(spark):
    """The documented </w> sentinel collision: a merge chain that
    assembles the literal marker string out of TEXT characters — and
    leaves it mid-word — closes the word early on decode. Pinned with
    a hand-built artifact (a trained table greedily re-merges the
    marker onward, which happens to cancel the ambiguity) so the
    caveat stays true-as-documented; the upgrade path is a byte-level
    alphabet, not a silent fix."""
    art = {"merges": [("<", "/"), ("</", "w"), ("</w", ">")],
           "alphabet": sorted("ab</w>")}
    probe = spark.createDataFrame([(1, "a</w>b")],
                                  "doc_id long, text string")
    enc = B.bpe_encode_ids(probe, art)
    [r] = B.bpe_decode_ids(enc, art).collect()
    assert r.text == "a b"  # early word close at the text-built marker


def test_bpe_decode_plan_zero_exchange(docs):
    art = B.bpe_train(docs, n_merges=20, sample_rows=256)
    enc = B.bpe_encode_ids(docs, art)
    p = (B.bpe_decode_ids(enc, art)
         ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in p  # two chained Arrow maps, no shuffle
    assert "MapInPandas" in p


def test_bpe_roundtrip_qkey_lossless(docs):
    """The driver qkey's own claim: n_match == n_docs per source and
    char_sum equals the normalized-length sum (the SQL-oracle
    algebra, asserted engine-side too)."""
    got = B.bpe_roundtrip(docs, n_merges=30).collect()
    assert got
    want_chars = (docs.groupBy("source").agg(F.sum(F.length(F.trim(
        F.regexp_replace(F.coalesce("text", F.lit("")), r"\s+", " "))))
        .alias("c")).collect())
    wc = {r.source: r.c for r in want_chars}
    for r in got:
        assert r.n_match == r.n_docs, r.source
        assert r.char_sum == wc[r.source], r.source


def test_byte_level_roundtrip_tiny_sample_exotic_text(spark):
    """Byte mode's two closed caveats in one: a 2-doc training
    sample, then decode of documents carrying (a) characters the
    sample NEVER saw (unicode beyond the alphabet — char mode would
    emit UNK) and (b) the literal </w> sentinel — both round-trip
    exactly, because the 256-byte alphabet spells everything and the
    byte-mode marker sits outside it."""
    train = spark.createDataFrame(
        [(1, "plain ascii text here"), (2, "more plain words")],
        "doc_id long, text string")
    art = B.bpe_train(train, n_merges=10, sample_rows=None,
                      byte_level=True)
    assert art["byte_level"] and len(art["alphabet"]) == 256
    probe = spark.createDataFrame(
        [(7, "naïve café über łódź 東京"),
         (8, "a</w>b literal </w> marker"),
         (9, "emoji \U0001F600 and ascii")],
        "doc_id long, text string")
    enc = B.bpe_encode_ids(probe, art)
    got = {r.doc_id: r.text
           for r in B.bpe_decode_ids(enc, art).collect()}
    assert got[7] == "naïve café über łódź 東京"
    assert got[8] == "a</w>b literal </w> marker"
    assert got[9] == "emoji \U0001F600 and ascii"
    # and no UNK id (0) anywhere — bytes spell every character
    assert enc.filter(F.array_contains("ids", 0)).count() == 0


def test_byte_level_counts_and_vocab_roundtrip(docs, tmp_path):
    """Byte-mode artifact lifecycle: save/load preserves the mode
    flag, token counts agree between the count and ids paths, and
    the serial python twin reproduces the per-word encoding."""
    art = B.bpe_train(docs, n_merges=30, byte_level=True)
    path = str(tmp_path / "bytes.json")
    B.bpe_save_vocab(art, path)
    art2 = B.bpe_load_vocab(path)
    assert art2["byte_level"] and art2["merges"] == art["merges"]
    cnt = {r.doc_id: r.n_tokens for r in B.bpe_token_count(
        docs, art["merges"], byte_level=True).collect()}
    ids = {r.doc_id: len(r.ids)
           for r in B.bpe_encode_ids(docs, art2).collect()}
    assert cnt == ids
    ranks = {tuple(p): i for i, p in enumerate(art["merges"])}
    [r] = docs.select("doc_id", "text").limit(1).collect()
    want = sum(len(B.encode_word(B._to_byte_repr(w), ranks,
                                 B.EOW_BYTE))
               for w in (r.text or "").split())
    assert cnt[r.doc_id] == want


def test_byte_mapping_is_a_bijection():
    assert len(B._B2C) == 256
    assert len(set(B._B2C.values())) == 256
    assert all(B._C2B[c] == b for b, c in B._B2C.items())
    # the byte-mode marker sits outside the mapped codepoint range
    assert B.EOW_BYTE not in B._C2B
    assert max(ord(c) for c in B._B2C.values()) < ord(B.EOW_BYTE)
