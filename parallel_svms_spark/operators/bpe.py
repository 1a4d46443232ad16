"""Broadcast merge-table BPE subword tokenizer (VERDICT r6 #5).

The packing/padding budgets (``sharding.pack_shards``,
``sharding.padding_stats``) previously counted whitespace tokens —
a heuristic that under-counts what a subword model actually consumes.
This module is the real thing: byte-pair encoding (Sennrich et al.
2016, arXiv:1508.07909) with the classic split — a small merge table
TRAINED once on a deterministic bounded sample (driver-side, the
``ivf_centroids`` pattern: the model is tiny, the sample is
md5-ordered so re-runs and engines agree), then APPLIED corpus-wide as
one broadcast + Arrow-batched map with zero exchange.

Scale shape at 100 TB: training reads ``sample_rows`` documents once
(one small collect — the committed-vocab step a production pipeline
does offline and ships as a file); encoding is embarrassingly parallel
— the merge-ranks dict broadcasts (a few KB), each Arrow batch encodes
its own documents with a per-task word→length memo (Zipf makes the
memo hit rate ≈ 1 after the first few thousand words), and nothing
shuffles until the caller's own rollup.

Oracle story: greedy iterative merging is not SQL-expressible, but the
output is a deterministic pure function of (corpus, n_merges,
sample_rows) — the ``compression_profile`` precedent — so the driver
qkey pins a golden-literal oracle recorded via
``tools/record_goldens.py`` (refuses to write unless independent
fresh-session runs agree); per-word encodings are additionally
equivalence-tested against an independent serial Python BPE in
``tests/test_bpe.py``.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"  # end-of-word marker, its own symbol (train == encode)


UNK = "<unk>"  # reserved id 0: encode-time chars outside the alphabet


def _bytes_unicode() -> dict[int, str]:
    """The GPT-2 byte↔unicode bijection (Radford et al. 2019,
    public byte-level-BPE convention): printable latin bytes map to
    themselves, every other byte to an unused codepoint ≥ 256 —
    yielding a 256-char alphabet with no whitespace/control chars,
    so byte-mapped words tokenize like ordinary strings."""
    bs = (list(range(33, 127)) + list(range(161, 173))
          + list(range(174, 256)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_B2C = _bytes_unicode()
_C2B = {c: b for b, c in _B2C.items()}
# the mapping occupies codepoints up to 323; the byte-mode EOW marker
# sits just past it, OUTSIDE the byte alphabet — the text-built
# sentinel collision of char mode is impossible by construction
EOW_BYTE = chr(324)


def _to_byte_repr(word: str) -> str:
    return "".join(_B2C[b] for b in word.encode("utf-8"))


def _from_byte_repr(sym_text: str) -> str:
    # errors='replace' only fires on a TRUNCATED id sequence that
    # split a multi-byte char; complete encodings round-trip exactly
    return bytes(_C2B.get(c, 0) for c in sym_text).decode(
        "utf-8", errors="replace")


def _artifact_eow(artifact: dict) -> str:
    return EOW_BYTE if artifact.get("byte_level") else EOW


BYTE_ALPHABET = sorted(_B2C.values())  # the FIXED 256-char base set


def bpe_train(documents: DataFrame, n_merges: int = 200,
              sample_rows: int | None = 2048, text_col: str = "text",
              id_col: str = "doc_id", byte_level: bool = False) -> dict:
    """Learn the committed vocabulary ARTIFACT from a deterministic
    corpus sample: ``{'merges': [(a, b), ...], 'alphabet': [chars]}``.

    Greedy BPE over whitespace words (the same split as
    ``dedup.tokens_col``): start from characters + ``EOW``, repeatedly
    merge the most frequent adjacent symbol pair (ties broken
    lexicographically smallest — determinism, not linguistics). The
    merge list order IS the rank table; the alphabet (every character
    seen in the sample, sorted) freezes the base symbol set so the
    id assignment (``bpe_symbol_ids``) is a pure function of the
    artifact — day-N+1 batches encode under day-N ids without the
    day-N corpus (``bpe_save_vocab``/``bpe_load_vocab``).

    The sample is the first ``sample_rows`` documents by
    md5(``id_col``) — stable under corpus growth in distribution and
    exactly reproducible for a fixed corpus, like the IVF centroid
    sample. One driver action by design: this is the offline
    vocabulary-commit step, not the hot path.

    ``sample_rows=None`` (r10 — VERDICT r9 #5) trains CORPUS-EXACT:
    the word count becomes one distributed map-side-combinable
    aggregation whose collect is VOCABULARY-bounded (one (word,
    count) row per distinct word — Zipf keeps web vocabularies in
    the low millions however many documents contribute), removing
    the sample bias from the committed artifact. The driver loop is
    unchanged and post-r9 cheap at any realistic merge count (the
    incremental pair-stats + lazy heap); merge selection depends
    only on the counts, not word order, but the collect is sorted
    anyway so the in-memory walk is bit-reproducible across
    sessions. Parity with the sample path when the sample IS the
    corpus is pytest-pinned.

    ``byte_level=True`` (r10 — the documented upgrade path, GPT-2
    convention): words train over their utf-8 BYTES rendered through
    the ``_bytes_unicode`` bijection, the alphabet is the FIXED
    256-char byte set (not what the sample saw), and the word marker
    is ``EOW_BYTE`` — a codepoint outside the byte alphabet. Two
    consequences, both pytest-pinned: encode can never emit ``UNK``
    (every character of every future document is spelled in bytes,
    even ones the sample never saw), and the ``</w>``
    sentinel-collision caveat of char mode is impossible (no text
    byte maps to the marker). The artifact carries
    ``byte_level: True`` so every downstream consumer (ids, counts,
    decode) picks the mode from the artifact, not a parameter.
    """
    wc: Counter = Counter()
    if sample_rows is None:
        # python str.split() semantics JVM-side: split on whitespace
        # runs, drop empties (a plain split(' ') would keep them)
        rows = (documents
                .filter(F.col(text_col).isNotNull())
                .select(F.explode(F.split(F.col(text_col), r"\s+"))
                        .alias("w"))
                .filter(F.length("w") > 0)
                .groupBy("w").agg(F.count("*").alias("c"))
                .orderBy("w")
                .collect())
        for r in rows:
            wc[r.w] = r.c
    else:
        sample = (documents
                  .select(F.col(text_col).alias("t"),
                          F.md5(F.col(id_col).cast("string")).alias("o"))
                  .orderBy("o").limit(int(sample_rows)).collect())
        for r in sample:
            for w in (r.t or "").split():
                wc[w] += 1
    if byte_level:
        wc = Counter({_to_byte_repr(w): c for w, c in wc.items()})
        return {"merges": _train_merges(wc, int(n_merges), EOW_BYTE),
                "alphabet": list(BYTE_ALPHABET), "byte_level": True}
    alphabet = sorted({c for w in wc for c in w})
    return {"merges": _train_merges(wc, int(n_merges)),
            "alphabet": alphabet}


def _train_merges(wc: Counter, n_merges: int,
                  eow: str = EOW) -> list[tuple[str, str]]:
    """Greedy merge loop with INCREMENTAL pair statistics (r9 —
    VERDICT r8 'What's missing' #3): the r8 loop recounted every
    pair over the whole vocabulary per merge, O(n_merges · Σ|word|),
    which cliffs at production merge counts (measured: the recount
    form is minutes at 4k merges on the fixture sample, the
    incremental form seconds at 32k — BASELINE.md r9 curve).
    This is the standard update scheme from the reference
    implementation of Sennrich et al. 2016 (subword-nmt's
    ``update_pair_statistics``, public): maintain pair→count and
    pair→{word: occurrences}; a merge touches ONLY the words that
    contain the merged pair, subtracting their old adjacencies and
    adding the new. Counts stay exact integers, the selection rule
    is unchanged (max count, ties to the lexicographically smallest
    pair), so the merge sequence is IDENTICAL to the recount form —
    equivalence is pytest-pinned and the golden-literal driver
    oracles (recorded under the r8 loop) still pass bit-for-bit."""
    import heapq
    from collections import defaultdict
    words: list[tuple[str, ...]] = []
    counts: list[int] = []
    for w, c in wc.items():
        words.append(tuple(list(w) + [eow]))
        counts.append(c)
    stats: Counter = Counter()
    where: defaultdict = defaultdict(lambda: defaultdict(int))
    for wi, (sym, c) in enumerate(zip(words, counts)):
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            stats[p] += c
            where[p][wi] += 1
    # lazy max-heap over (-count, pair): selection is O(log H)
    # amortized instead of a full O(|stats|) scan per merge (the scan
    # dominates past ~8k merges — measured 1044 s at 32k merges on a
    # 59k-word sample vs seconds heap-based). Entries go stale when a
    # count changes; a popped entry is valid only if it matches the
    # live count. Ordering (-count, pair) == the recount form's
    # min((-count, pair)) selection, so the merge sequence is still
    # bit-identical.
    heap = [(-c, p) for p, c in stats.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        best = None
        while heap:
            negc, p = heap[0]
            if stats.get(p, 0) != -negc:
                heapq.heappop(heap)        # stale
                continue
            if -negc < 1:
                heap = []                  # only dead pairs remain
                break
            best = p
            heapq.heappop(heap)
            break
        if best is None:
            break                          # == recount "no pairs left"
        merges.append(best)
        merged = best[0] + best[1]
        changed: set = set()
        for wi in list(where[best]):
            if where[best][wi] < 1:
                continue
            old = words[wi]
            c = counts[wi]
            out: list[str] = []
            i = 0
            while i < len(old):
                if i + 1 < len(old) and (old[i], old[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(old[i])
                    i += 1
            new = tuple(out)
            words[wi] = new
            for i in range(len(old) - 1):
                p = (old[i], old[i + 1])
                stats[p] -= c
                where[p][wi] -= 1
                changed.add(p)
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                stats[p] += c
                where[p][wi] += 1
                changed.add(p)
        # greedy left-to-right replacement leaves no adjacent (a, b)
        # anywhere, so the residual entry is exactly zero — drop it
        del stats[best]
        del where[best]
        changed.discard(best)
        for p in changed:
            if stats[p] <= 0:
                # vanished without being merged (r10, VERDICT r9
                # note): drop the entry instead of keeping a
                # zero-count where-index forever — a later merge
                # recreating the adjacency recreates both (Counter /
                # defaultdict semantics), and stale heap entries
                # already discard via the live-count check
                del stats[p]
                del where[p]
            else:
                heapq.heappush(heap, (-stats[p], p))
    return merges


def bpe_train_merges(documents: DataFrame, n_merges: int = 200,
                     sample_rows: int | None = 2048,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> list[tuple[str, str]]:
    """Merge-table-only view of ``bpe_train`` (the original r7
    surface, kept for the count-budget consumers — ``pack_shards``,
    ``padding_stats`` — that never need ids)."""
    return bpe_train(documents, n_merges, sample_rows,
                     text_col, id_col)["merges"]


def bpe_symbol_ids(artifact: dict) -> dict[str, int]:
    """The frozen symbol→id table: a pure function of the artifact,
    so two sessions (or two days) holding the same committed vocab
    assign identical ids. Layout: ``UNK``=0, ``EOW``=1, then the
    sorted base alphabet, then one id per merge in rank order (the
    GPT-2 vocab convention). A string produced by two different merge
    paths keeps its first id (dedupe preserves order)."""
    syms = [UNK, _artifact_eow(artifact)] + list(artifact["alphabet"]) + [
        a + b for a, b in artifact["merges"]]
    ids: dict[str, int] = {}
    for s in syms:
        if s not in ids:
            ids[s] = len(ids)
    return ids


def bpe_save_vocab(artifact: dict, path: str) -> None:
    """Persist the committed vocabulary as a tiny JSON artifact (the
    ``minhash_band_index`` lifecycle applied to the tokenizer: train
    once, commit, every later batch encodes under the frozen file).
    The artifact is a few KB — a driver-side file by design, like any
    shipped tokenizer vocab."""
    import json

    with open(path, "w") as f:
        json.dump({"merges": [list(p) for p in artifact["merges"]],
                   "alphabet": list(artifact["alphabet"]),
                   "byte_level": bool(artifact.get("byte_level"))}, f)


def bpe_load_vocab(path: str) -> dict:
    """Load a ``bpe_save_vocab`` artifact; tuples restored so
    ``bpe_symbol_ids``/``bpe_token_count`` consume it unchanged."""
    import json

    with open(path) as f:
        raw = json.load(f)
    art = {"merges": [tuple(p) for p in raw["merges"]],
           "alphabet": list(raw["alphabet"])}
    if raw.get("byte_level"):
        art["byte_level"] = True
    return art


def encode_word(word: str, ranks: dict[tuple[str, str], int],
                eow: str = EOW) -> list[str]:
    """Apply the merge table to one word: repeatedly merge the
    lowest-rank pair present, left-to-right within a pass (overlaps
    resolve leftmost-first). The canonical greedy-apply loop — the
    serial twin in tests reimplements it independently. Byte-mode
    callers pass the byte-repr word and ``eow=EOW_BYTE``."""
    sym = list(word) + [eow]
    while len(sym) > 1:
        best_rank, best_pair = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (sym[i], sym[i + 1])
        if best_pair is None:
            break
        merged = best_pair[0] + best_pair[1]
        out = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best_pair:
                out.append(merged)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def bpe_token_count(documents: DataFrame,
                    merges: list[tuple[str, str]],
                    text_col: str = "text", id_col: str = "doc_id",
                    carry: tuple[str, ...] = (),
                    byte_level: bool = False) -> DataFrame:
    """Per-document BPE token count under a FROZEN merge table: one
    broadcast (the ranks dict) + one Arrow-batched map — zero
    exchange, no driver action; ``carry`` columns ride the batch
    (the ``compression_signals`` pattern) so no reattach join is ever
    needed. Memoizes word→length per task (Zipf: the memo converges
    after the head of the distribution)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    eow = EOW_BYTE if byte_level else EOW
    bc = documents.sparkSession.sparkContext.broadcast(
        (ranks, eow, byte_level))
    cols = [id_col, text_col, *carry]

    def run(it):
        r, ew, bl = bc.value
        memo: dict[str, int] = {}
        for pdf in it:
            if len(pdf) == 0:
                continue
            counts = []
            for t in pdf[text_col]:
                n = 0
                for w in (t or "").split():
                    if w not in memo:
                        memo[w] = len(encode_word(
                            _to_byte_repr(w) if bl else w, r, ew))
                    n += memo[w]
                counts.append(n)
            out = pdf[[id_col, *carry]].copy()
            out["n_tokens"] = pd.array(counts, dtype="int64")
            yield out

    schema_carry = "".join(
        f", {c} {t}" for c, t in documents.select(*carry).dtypes)
    # id type derives from the input schema (ADVICE r7: a hardcoded
    # LONG silently Arrow-cast string-keyed corpora)
    id_type = dict(documents.dtypes)[id_col]
    return documents.select(*cols).mapInPandas(
        run, schema=f"{id_col} {id_type}{schema_carry}, n_tokens long")


def bpe_encode_ids(documents: DataFrame, artifact: dict,
                   text_col: str = "text", id_col: str = "doc_id",
                   carry: tuple[str, ...] = ()) -> DataFrame:
    """Per-document BPE token-id sequences under a FROZEN artifact —
    the actual payload of a training shard (``ARRAY<INT>``, not a
    count; VERDICT r7 #2). Same plan as ``bpe_token_count``: one
    broadcast (ranks + the symbol→id table, a few KB) + one
    Arrow-batched map, zero exchange; ``carry`` columns ride the
    batch. Memoizes word→ids per task (Zipf convergence). Characters
    outside the committed alphabet encode as ``UNK`` (id 0) — the
    frozen-vocab contract, pinned in tests/test_bpe.py.

    Output: (``id_col``, carry..., ``ids ARRAY<INT>``) with
    ``size(ids)`` equal to ``bpe_token_count``'s ``n_tokens`` for the
    same artifact (pinned in pytest — both run the identical
    ``encode_word``).
    """
    ranks = {tuple(p): i for i, p in enumerate(artifact["merges"])}
    sym_ids = bpe_symbol_ids(artifact)
    unk = sym_ids[UNK]
    eow = _artifact_eow(artifact)
    bl = bool(artifact.get("byte_level"))
    bc = documents.sparkSession.sparkContext.broadcast(
        (ranks, sym_ids, eow, bl))

    def run(it):
        r, sid, ew, byte = bc.value
        memo: dict[str, list[int]] = {}
        for pdf in it:
            if len(pdf) == 0:
                continue
            seqs = []
            for t in pdf[text_col]:
                ids: list[int] = []
                for w in (t or "").split():
                    if w not in memo:
                        memo[w] = [sid.get(s, unk)
                                   for s in encode_word(
                                       _to_byte_repr(w) if byte else w,
                                       r, ew)]
                    ids.extend(memo[w])
                seqs.append(ids)
            out = pdf[[id_col, *carry]].copy()
            out["ids"] = seqs
            yield out

    cols = [id_col, text_col, *carry]
    schema_carry = "".join(
        f", {c} {t}" for c, t in documents.select(*carry).dtypes)
    id_type = dict(documents.dtypes)[id_col]
    return documents.select(*cols).mapInPandas(
        run, schema=f"{id_col} {id_type}{schema_carry}, ids array<int>")


def bpe_decode_ids(encoded: DataFrame, artifact: dict,
                   ids_col: str = "ids", id_col: str = "doc_id",
                   carry: tuple[str, ...] = ()) -> DataFrame:
    """Inverse of ``bpe_encode_ids`` under the same FROZEN artifact —
    the decode leg that closes the tokenizer lifecycle (train / save /
    load / encode / DECODE). Same plan shape as the encoder: one
    broadcast (the id→symbol table, a few KB) + one Arrow-batched
    map, zero exchange; ``carry`` columns ride the batch.

    Decode walks the symbol stream accumulating a word buffer; a
    symbol whose string ends with the ``EOW`` marker closes the word
    (standalone ``EOW`` and merged ``…</w>`` symbols are the same
    case — merges only ever concatenate adjacent in-word symbols, so
    the word-final symbol is exactly the one carrying the marker
    suffix). Words re-join on single spaces.

    Round-trip contract (pinned in tests/test_bpe.py):
    ``decode(encode(t)) == " ".join(t.split())`` — whitespace-run
    normalized, because the encoder's word split discards run shape —
    for every document whose characters are all in the committed
    alphabet (corpus-exact training, ``sample_rows=None``, guarantees
    this) and whose text does not contain the literal marker string
    ``</w>``. The marker collision is the classic sentinel caveat
    (production tokenizers sidestep it with byte-level alphabets);
    out-of-alphabet ids decode as the visible ``<unk>`` sentinel
    inside the current word, mirroring the encoder's UNK contract.
    A truncated id sequence (no final ``EOW``) still yields its
    partial last word rather than dropping it.
    """
    inv = {i: s for s, i in bpe_symbol_ids(artifact).items()}
    eow = _artifact_eow(artifact)
    bl = bool(artifact.get("byte_level"))
    bc = encoded.sparkSession.sparkContext.broadcast((inv, eow, bl))

    def run(it):
        table, ew, byte = bc.value
        ew_n = len(ew)
        for pdf in it:
            if len(pdf) == 0:
                continue
            texts = []
            for ids in pdf[ids_col]:
                words: list[str] = []
                buf: list[str] = []
                for i in ids:
                    s = table.get(int(i), UNK)
                    if s.endswith(ew):
                        buf.append(s[:-ew_n])
                        words.append("".join(buf))
                        buf = []
                    else:
                        buf.append(s)
                if buf:
                    words.append("".join(buf))
                if byte:
                    words = [_from_byte_repr(w) for w in words]
                texts.append(" ".join(words))
            out = pdf[[id_col, *carry]].copy()
            out["text"] = texts
            yield out

    cols = [id_col, *carry, ids_col]
    schema_carry = "".join(
        f", {c} {t}" for c, t in encoded.select(*carry).dtypes)
    id_type = dict(encoded.dtypes)[id_col]
    return encoded.select(*cols).mapInPandas(
        run, schema=f"{id_col} {id_type}{schema_carry}, text string")


def hex8_digest_sql(strexpr: str) -> str:
    """Engine-portable string digest: the first 8 hex nibbles of
    md5(<string expr>) as one bigint (the ``_rowhash`` mix applied to
    a STRING input — md5 / instr / substring behave identically in
    Spark SQL and DuckDB, so both engines can state the same content
    pin). Shared verbatim by the Spark side (``F.expr``) and the
    DuckDB oracle so the digest arithmetic cannot drift."""
    s = f"md5({strexpr})"
    return "+".join(
        f"cast(instr('0123456789abcdef', substring({s},{i + 1},1)) "
        f"as bigint)*{16 ** (7 - i)}"
        for i in range(8))


def bpe_roundtrip(documents: DataFrame, n_merges: int = 200,
                  byte_level: bool = False,
                  sample_rows: int | None = None) -> DataFrame:
    """The decode-leg driver qkey: train CORPUS-EXACT, encode every
    document to ids, DECODE the ids back, and prove losslessness
    against the original corpus — per source: (n_docs, n_match,
    char_sum, digest_sum) where ``n_match`` counts documents whose
    decoded text equals the whitespace-run-normalized original and
    ``digest_sum`` sums an md5 content digest of the DECODED text.

    Unlike the encode rollups (golden-literal by necessity — greedy
    merging has no SQL twin), this qkey carries a REAL SQL oracle:
    lossless decoding must reproduce ``trim(regexp_replace(text,
    '\\s+', ' '))`` exactly, so the oracle computes n_docs == n_match
    and the char/digest sums straight from the original table without
    ever tokenizing. Corpus-exact training (``sample_rows=None``)
    makes the alphabet total, so no UNK can break the guarantee; the
    ``</w>`` sentinel caveat (see ``bpe_decode_ids``) is absent from
    the fixture corpus by inspection and irrelevant to real web text
    at the documented byte-level-alphabet upgrade path.

    Plan shape: one vocabulary-bounded word-count agg (the offline
    vocab commit), then two zero-exchange Arrow maps (encode, decode)
    and one per-source hash agg — text never shuffles.

    ``byte_level=True``: the same proof WITHOUT the alphabet
    condition — the 256-byte alphabet spells every character, so
    losslessness holds even under a tiny ``sample_rows`` training
    sample (the qkey uses sample_rows=64 to demonstrate exactly
    that), and the sentinel caveat is gone (see ``bpe_train``).
    """
    art = bpe_train(documents, n_merges, sample_rows=sample_rows,
                    byte_level=byte_level)
    src = documents.withColumn("orig", F.col("text"))
    enc = bpe_encode_ids(src, art, carry=("source", "orig"))
    dec = bpe_decode_ids(enc, art, carry=("source", "orig"))
    norm = F.trim(F.regexp_replace(
        F.coalesce(F.col("orig"), F.lit("")), r"\s+", " "))
    digest = F.expr(hex8_digest_sql("text"))
    return (dec.select(
                "source",
                (F.col("text") == norm).cast("long").alias("m"),
                F.length("text").cast("long").alias("len"),
                digest.alias("dg"))
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("m").alias("n_match"),
                 F.sum("len").alias("char_sum"),
                 F.sum("dg").alias("digest_sum")))


def bpe_encode(documents: DataFrame, n_merges: int = 200,
               sample_rows: int = 2048) -> DataFrame:
    """The driver qkey for id emission: train on the corpus's own md5
    sample, encode every document to id sequences, and roll up per
    source — (source, n_docs, sum_tokens, id_sum, pos_sum, docw_sum)
    where ``id_sum`` = ΣΣ ids, ``pos_sum`` = ΣΣ (k+1)·ids[k] pins
    every id AND its position through the hash, and ``docw_sum`` =
    Σ doc_id·(Σ ids) pins per-document attribution. Golden-literal
    oracle (the ``tokenize_bpe`` precedent — greedy merging has no
    SQL twin, but the output is a pure function of the corpus)."""
    art = bpe_train(documents, n_merges, sample_rows)
    per = bpe_encode_ids(documents, art, carry=("source",))
    idsum = F.aggregate("ids", F.lit(0).cast("long"),
                        lambda a, x: a + x.cast("long"))
    possum = F.aggregate(
        F.transform("ids",
                    lambda x, i: (i + 1).cast("long") * x.cast("long")),
        F.lit(0).cast("long"), lambda a, x: a + x)
    per = per.select(
        "source", F.col("doc_id"),
        F.size("ids").cast("long").alias("n_tok"),
        idsum.alias("ds"), possum.alias("ps"))
    return (per.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tok").alias("sum_tokens"),
                 F.sum("ds").alias("id_sum"),
                 F.sum("ps").alias("pos_sum"),
                 F.sum(F.col("doc_id") * F.col("ds"))
                 .alias("docw_sum")))


def tokenize_bpe(documents: DataFrame, n_merges: int = 200,
                 sample_rows: int = 2048) -> DataFrame:
    """The driver qkey: train on the corpus's own md5 sample, encode
    the whole corpus, and roll up per source — (source, n_docs,
    sum_tokens, max_tokens, idsum) with ``idsum = Σ doc_id·n_tokens``
    pinning every document's individual count through the hash.
    Golden-literal oracle (see module docstring)."""
    merges = bpe_train_merges(documents, n_merges, sample_rows)
    per = bpe_token_count(documents, merges, carry=("source",))
    return (per.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("sum_tokens"),
                 F.max("n_tokens").alias("max_tokens"),
                 F.sum(F.col("doc_id") * F.col("n_tokens"))
                 .alias("idsum")))
