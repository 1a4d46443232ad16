"""Edge-case hardening: empty inputs, degenerate docs, and a
property-based check of the sparse codec's float round-trip claim
(parse(encode(x)) must reproduce doubles EXACTLY — the parse_sparse
oracle depends on it).
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from parallel_svms_spark.io.sources import parse_sparse_lines, to_sparse_lines
from parallel_svms_spark.operators import dedup as D
from parallel_svms_spark.operators import similarity as S


def test_dedup_family_handles_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert D.exact_dedup_keys(empty).count() == 0
    assert D.ngram_jaccard_pairs(empty, threshold=0.5).count() == 0
    assert D.minhash_near_dups(empty, threshold=0.5).count() == 0
    assert D.simhash_near_dups(empty).count() == 0


def test_similarity_handles_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert S.cosine_near_dup_blocked(empty, threshold=0.5).count() == 0
    one = spark.createDataFrame([(0, [1.0, 0.0])],
                                "vec_id long, embedding array<float>")
    assert S.cosine_near_dup_blocked(one, threshold=0.5).count() == 0
    assert S.topk_cosine(one, [1.0, 0.0], k=10).count() == 1


def test_jaccard_single_and_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string")
    rows = D.ngram_jaccard_pairs(df, k=3, threshold=0.5).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in rows] == [(1, 2, 1.0)]
    single = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    assert D.ngram_jaccard_pairs(single, threshold=0.5).count() == 0


# finite doubles excluding subnormals Spark/py repr edge (they still
# round-trip, but keep the strategy in the range real features live in)
_floats = st.floats(min_value=-1e12, max_value=1e12,
                    allow_nan=False, allow_infinity=False)


@settings(max_examples=20, deadline=None)
@given(st.lists(_floats, min_size=1, max_size=8), st.integers(0, 9))
def test_sparse_codec_roundtrip_property(spark, values, label):
    df = spark.createDataFrame([(label, values)],
                               "label int, embedding array<double>")
    parsed = parse_sparse_lines(to_sparse_lines(df, min_abs=0.0)).first()
    assert parsed.label == float(label)
    got = [parsed.features.get(i + 1, 0.0) for i in range(len(values))]
    for a, b in zip(got, values):
        assert a == b or (math.isnan(a) and math.isnan(b)), (a, b)


def test_exchange_by_bucket_physical_layout(spark, sf_dir, tmp_path):
    from parallel_svms_spark.io.sources import load_table
    from parallel_svms_spark.operators import partitioning as X
    emb = load_table(spark, sf_dir, "embeddings")
    b = X.balanced_buckets(emb, 4)
    out = str(tmp_path / "bybucket")
    X.exchange_by_bucket(b, 4).write.partitionBy("bucket") \
        .mode("overwrite").parquet(out)
    import glob
    dirs = sorted(p.rsplit("=", 1)[1] for p in glob.glob(f"{out}/bucket=*"))
    assert dirs == ["0", "1", "2", "3"]
    back = spark.read.parquet(out)
    assert back.count() == emb.count()


def test_r4_operators_handle_empty_input(spark):
    from parallel_svms_spark.operators import events as E
    from parallel_svms_spark.operators import text as TX

    no_events = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string")
    # funnel on zero events: all stages exist with zero users
    got = {r.step: r.n_users for r in E.funnel(no_events).collect()}
    assert got == {"view": 0, "click": 0, "purchase": 0}
    assert E.retention_cohorts(no_events).count() == 0

    no_docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, "
            "n_chars long")
    assert TX.boilerplate_score(no_docs).count() == 0
    assert TX.quality_filter(no_docs).count() == 0

    from parallel_svms_spark.operators import dedup as D2
    some = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    # empty corpus: everything in the batch is new
    assert D2.dedup_against(no_docs.select("doc_id", "text"),
                            some).count() == 1
    # empty batch: nothing survives, nothing crashes
    assert D2.dedup_against(some, no_docs.select("doc_id", "text")
                            ).count() == 0


def test_ivf_near_dup_single_vector_and_tiny_input(spark):
    one = spark.createDataFrame([(0, [1.0, 0.0])],
                                "vec_id long, embedding array<float>")
    assert S.cosine_near_dup_ivf(one, threshold=0.5).count() == 0
    # n < n_lists: every vector its own (or a shared) cluster — the
    # duplicated pair must still surface
    few = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>")
    got = {(r.vec_a, r.vec_b) for r in
           S.cosine_near_dup_ivf(few, threshold=0.99).collect()}
    assert got == {(0, 1)}


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 60), st.integers(1, 12))
def test_global_ntile_property_vs_sql_window(spark, n, k):
    """global_ntile's two-pass distributed rank must equal the literal
    single-task NTILE window for EVERY (n, k) — including n < k, n = k,
    and every non-divisible split."""
    from pyspark.sql import Window
    from parallel_svms_spark.operators.partitioning import global_ntile
    df = spark.range(n).select(F.col("id").alias("v"))
    got = {r.v: r.b for r in global_ntile(df, ["v"], k=k, out_col="b").collect()}
    want = {r.v: r.b for r in df.select(
        "v", F.ntile(k).over(Window.orderBy("v")).alias("b")).collect()}
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(0, 500), min_size=0, max_size=12),
    st.lists(st.tuples(st.integers(0, 500), st.integers(0, 80)),
             min_size=0, max_size=6),
    st.sampled_from([1, 3, 7]),
)
def test_interval_join_property_vs_naive(spark, points, spans, bucket_min):
    """Bucketized interval_join must equal the naive theta join for
    arbitrary point/interval layouts and bucket widths — exactly once
    per containment, no boundary drift, no duplicate from multi-bucket
    spans."""
    import datetime as dt
    from parallel_svms_spark.operators.events import interval_join
    t0 = dt.datetime(2021, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    pts = spark.createDataFrame(
        [(i, ts(m)) for i, m in enumerate(points)] or
        [(0, ts(0))], "event_id int, ts timestamp")
    if not points:
        pts = pts.limit(0)
    ivs = spark.createDataFrame(
        [(i, ts(s), ts(s + d)) for i, (s, d) in enumerate(spans)] or
        [(0, ts(0), ts(0))],
        "iv int, session_start timestamp, session_end timestamp")
    if not spans:
        ivs = ivs.limit(0)
    got = sorted((r.event_id, r.iv) for r in interval_join(
        pts, ivs, bucket_minutes=bucket_min).collect())
    want = sorted(
        (pi, ii)
        for pi, pm in enumerate(points)
        for ii, (s, d) in enumerate(spans)
        if s <= pm <= s + d)
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.sets(st.integers(0, 30), max_size=12),
    st.sets(st.integers(0, 30), max_size=12),
)
def test_merge_upsert_property(spark, target_keys, update_keys):
    """MERGE semantics for arbitrary key overlaps: result keys =
    target ∪ updates, updates win on collision, survivors untouched,
    no duplicates."""
    from parallel_svms_spark.operators.relational import merge_upsert
    t = spark.createDataFrame(
        [(k, "old") for k in sorted(target_keys)] or [(0, "old")],
        "doc_id long, v string")
    if not target_keys:
        t = t.limit(0)
    u = spark.createDataFrame(
        [(k, "new") for k in sorted(update_keys)] or [(0, "new")],
        "doc_id long, v string")
    if not update_keys:
        u = u.limit(0)
    got = {r.doc_id: r.v for r in merge_upsert(t, u).collect()}
    want = {k: "old" for k in target_keys} | {k: "new" for k in update_keys}
    assert got == want


def test_new_r4_operators_handle_empty_input(spark):
    from parallel_svms_spark.operators import timeseries as TSO
    from parallel_svms_spark.operators.analytics import (profile_table,
                                                         snapshot_diff)
    from parallel_svms_spark.operators.events import (outlier_events,
                                                      value_histogram)
    from parallel_svms_spark.operators.fuzzy import fuzzy_name_pairs

    no_events = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string")
    assert TSO.gap_fill_daily(no_events).count() == 0
    assert TSO.activity_streaks(no_events).count() == 0
    assert value_histogram(no_events).count() == 0
    assert outlier_events(no_events).count() == 0

    no_docs = spark.createDataFrame(
        [], "doc_id long, text string, n_chars long")
    prof = {r.column: r for r in profile_table(no_docs).collect()}
    assert set(prof) == {"doc_id", "text", "n_chars"}
    assert all(r.n_rows == 0 and r.n_distinct == 0
               and r.min_val is None for r in prof.values())
    some = spark.createDataFrame([(1, "a", 1)],
                                 "doc_id long, text string, n_chars long")
    got = {r.status: r.n_keys
           for r in snapshot_diff(no_docs, some).collect()}
    assert got == {"added": 1}
    assert fuzzy_name_pairs(
        spark.createDataFrame([], "p_name string")).count() == 0


@settings(max_examples=12, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 2),      # user
              st.integers(0, 14),     # day offset
              st.integers(0, 1)),     # intra-day slot
    min_size=1, max_size=25))
def test_gap_fill_property_vs_serial(spark, raw):
    """gap_fill_daily must equal a serial forward-fill for arbitrary
    sparse activity patterns (multi-user, same-day ties broken by
    (ts, event_id))."""
    import datetime as dt

    from parallel_svms_spark.operators.timeseries import gap_fill_daily
    base = dt.datetime(2024, 3, 1)
    rows = [(i, base + dt.timedelta(days=d, hours=slot), u, float(i))
            for i, (u, d, slot) in enumerate(raw)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    got = {(r.user_id, r.day.isoformat()): r.value_ff
           for r in gap_fill_daily(df).collect()}
    # serial oracle
    want = {}
    by_user = {}
    for eid, ts, u, v in rows:
        by_user.setdefault(u, []).append((ts, eid, v))
    for u, evs in by_user.items():
        closes = {}
        for ts, eid, v in sorted(evs):
            closes[ts.date()] = v  # sorted by (ts, eid): last wins
        d0, d1 = min(closes), max(closes)
        last = None
        d = d0
        while d <= d1:
            if d in closes:
                last = closes[d]
            want[(u, d.isoformat())] = last
            d += dt.timedelta(days=1)
    assert got == want


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
                min_size=0, max_size=30),
       st.sampled_from([1, 2, 5]))
def test_topk_per_group_property_vs_window(spark, rows, k):
    from pyspark.sql import Window
    from parallel_svms_spark.operators.partitioning import topk_per_group
    if not rows:
        df = spark.createDataFrame([], "g int, v int, uid long")
        assert topk_per_group(df, ["g"], [F.desc("v"), F.asc("uid")],
                              k).count() == 0
        return
    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)], "g int, v int, uid long")
    order = [F.desc("v"), F.asc("uid")]
    got = sorted(map(tuple, topk_per_group(df, ["g"], order, k).collect()))
    w = Window.partitionBy("g").orderBy(*order)
    want = sorted(map(tuple, df.withColumn(
        "rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k).collect()))
    assert got == want


@settings(max_examples=12, deadline=None)
@given(st.sets(st.integers(0, 15), max_size=10),
       st.sets(st.integers(0, 15), max_size=10),
       st.sets(st.integers(0, 15), max_size=10))
def test_snapshot_diff_property(spark, old_keys, new_keys, changed):
    from parallel_svms_spark.operators.analytics import snapshot_diff
    old = spark.createDataFrame([(k, 0) for k in old_keys] or [],
                                "doc_id long, payload long")
    new = spark.createDataFrame(
        [(k, 1 if k in changed else 0) for k in new_keys] or [],
        "doc_id long, payload long")
    got = {r.status: r.n_keys
           for r in snapshot_diff(old, new).collect()}
    want = {
        "added": len(new_keys - old_keys),
        "removed": len(old_keys - new_keys),
        "changed": len(old_keys & new_keys & changed),
        "same": len(old_keys & new_keys - changed),
    }
    assert got == {k: v for k, v in want.items() if v}


def _weighted_keep_model(doc_id: int, w) -> bool:
    """Pure-Python twin of weighted_sample's keep rule (VERDICT r5 #7):
    keep iff md5-prefix(id) < hex8(floor(clamp(w)*(16^8-1))) — same
    IEEE double ops as the Spark expression, so floor boundaries agree
    bit-for-bit."""
    import hashlib
    if w is None or (isinstance(w, float) and math.isnan(w)):
        wc = 0.0
    else:
        wc = min(max(float(w), 0.0), 1.0)
    thr = format(math.floor(wc * float(16 ** 8 - 1)), "08x")
    h8 = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
    return h8 < thr


def test_weighted_sample_boundary_contract(spark):
    """The documented keep-probability statement (VERDICT r5 #7):
    P(keep | weight w) = floor(clamp(w,0,1)*(2^32-1)) / 2^32 under the
    uniform md5 coin — in particular w=1 KEEPS a row unless its md5
    prefix is exactly 'ffffffff' (P = 2^-32: thr renders 'ffffffff'
    and the comparison is strict `<`), and w=0 drops everything.
    Straddle the strict-< boundary per row: w chosen so thr == h8
    (drop) vs thr == h8+1 (keep)."""
    import hashlib
    from parallel_svms_spark.operators.sharding import weighted_sample

    u32 = float(16 ** 8 - 1)
    ids = list(range(40))
    # per-id boundary weights: thr lands exactly ON h8 → strict <
    # drops; one coin-tick above → keeps
    rows = []
    for i in ids:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        rows.append((i, (h + 0.5) / u32, "eq"))       # floor → h: drop
        rows.append((i + 1000, (h + 1.5) / u32, "gt"))  # floor → h+1
    df = spark.createDataFrame(rows, "doc_id long, w double, tag string")
    kept = {r.doc_id for r in
            weighted_sample(df, F.col("w")).collect()}
    for i in ids:
        h_eq = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        assert i not in kept, (i, "thr==h8 must DROP (strict <)")
        h_gt = int(hashlib.md5(str(i + 1000).encode()).hexdigest()[:8], 16)
        # the +1000 row keeps iff ITS OWN h8 < floor-of-its-weight —
        # check against the model rather than assuming
        assert ((i + 1000) in kept) == _weighted_keep_model(
            i + 1000, (h_eq + 1.5) / u32)
    # w=1 keeps everything in a realistic corpus (md5 prefix
    # 'ffffffff' has P=2^-32); w=0 keeps nothing
    base = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    assert weighted_sample(base, F.lit(1.0)).count() == len(ids)
    assert weighted_sample(base, F.lit(0.0)).count() == 0


@settings(max_examples=8, deadline=None)
@given(st.lists(st.one_of(
    st.floats(min_value=-1.0, max_value=2.0, allow_nan=False),
    st.just(float("nan")), st.none(),
    st.floats(min_value=0.0, max_value=1e-9)),
    min_size=1, max_size=30))
def test_weighted_sample_matches_python_model(spark, weights):
    """Property: for ANY weight (incl. NaN/None/negative/>1/denormal-
    tiny), Spark's kept-row set equals the pure-Python model — the
    same invariant the DuckDB oracle relies on."""
    from parallel_svms_spark.operators.sharding import weighted_sample
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    kept = {r.doc_id for r in weighted_sample(df, F.col("w")).collect()}
    want = {i for i, w in rows if _weighted_keep_model(i, w)}
    assert kept == want


def _split_model(doc_id: int, fractions, salt: str = "") -> str:
    """Pure-Python reference of sharding.dataset_split: first 8 md5
    hex chars of (salt + str(id)) against cumulative thresholds."""
    import hashlib

    from parallel_svms_spark.operators.sharding import _rate_threshold_hex
    h8 = hashlib.md5((salt + str(doc_id)).encode()).hexdigest()[:8]
    cum = 0.0
    for name, frac in fractions[:-1]:
        cum += float(frac)
        if h8 < _rate_threshold_hex(cum):
            return name
    return fractions[-1][0]


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(0, 10 ** 12), min_size=1, max_size=40,
                unique=True),
       st.sampled_from([
           [("train", 0.9), ("valid", 0.05), ("test", 0.05)],
           [("a", 0.5), ("b", 0.5)],
           [("x", 0.01), ("y", 0.01), ("z", 0.98)],
           [("all", 1.0)],
           # leading fractions approaching (but under) the full unit
           # interval — the residual split legitimately goes near-empty;
           # OVER-filled layouts now raise by contract (ADVICE r6,
           # tests/test_corpus_ops_r6b.py) instead of silently clamping
           [("big", 0.9), ("near", 0.0999), ("rest", 0.0001)],
       ]))
def test_dataset_split_matches_python_model(spark, ids, fractions):
    """Property: for ANY VALID id set and fraction layout, Spark's
    assignment equals the pure-Python md5 model — the invariant the
    DuckDB oracle and the growth-stability contract both stand on;
    the labels always partition the input."""
    from parallel_svms_spark.operators.sharding import dataset_split
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: r.split
           for r in dataset_split(df, fractions=fractions).collect()}
    assert got == {i: _split_model(i, fractions) for i in ids}


def test_heavy_keys_null_and_tie_behavior(spark):
    """NULL keys count as a real group (a NULL-heavy corpus IS a skew
    hazard — dropping them would hide exactly what the diagnostic
    exists to find), and exact count ties break ascending by key."""
    from pyspark.sql import functions as F  # noqa: F401

    from parallel_svms_spark.operators.partitioning import heavy_keys
    rows = ([(None,)] * 5) + ([(7,)] * 3) + ([(3,)] * 3) + [(9,)]
    df = spark.createDataFrame(rows, "k int")
    got = [(r["k"], r["n_rows"], r["share_ppm"])
           for r in heavy_keys(df, "k", k=3).collect()]
    # NULL sorts first among Spark ascending ties ONLY if reached;
    # here NULL wins outright (5 rows), then the 3-count tie breaks
    # 3 < 7
    assert got == [(None, 5, 416666), (3, 3, 250000), (7, 3, 250000)]


def test_compression_signals_empty_and_unicode(spark):
    """Empty text: n_chars 0, ratio guarded by the max(chars,1) floor
    (zlib of b'' is 8 bytes → ratio 8.0 — the >1 'incompressible'
    extreme, kept by any sane screen threshold). Unicode: n_chars is
    CHARACTERS (Spark length semantics) while zlib sees utf-8 BYTES,
    so multibyte text can legitimately exceed ratio 1."""
    from parallel_svms_spark.operators.text import compression_signals
    df = spark.createDataFrame(
        [(1, ""), (2, "déjà vu ✓ déjà vu ✓")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in compression_signals(df).collect()}
    assert rows[1].n_chars == 0 and rows[1].comp_len == 8
    assert rows[1].ratio == 8.0
    import zlib
    t = "déjà vu ✓ déjà vu ✓"
    assert rows[2].n_chars == len(t)  # 19 characters
    assert rows[2].comp_len == len(zlib.compress(t.encode("utf-8"), 6))


def test_r6_operators_handle_empty_input(spark):
    from parallel_svms_spark.operators.dedup import (
        exact_dedup_keys_normalized)
    from parallel_svms_spark.operators.events import (burst_starters,
                                                      collapse_bursts)
    from parallel_svms_spark.operators.partitioning import heavy_keys
    from parallel_svms_spark.operators.sharding import dataset_split
    from parallel_svms_spark.operators.text import (compression_profile,
                                                    compression_screen,
                                                    compression_signals)

    no_events = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string")
    assert heavy_keys(no_events, "user_id").count() == 0
    assert collapse_bursts(no_events).count() == 0
    assert burst_starters(no_events).count() == 0

    no_docs = spark.createDataFrame(
        [], "doc_id long, text string, source string")
    assert dataset_split(no_docs).count() == 0
    assert compression_signals(no_docs).count() == 0
    assert compression_profile(no_docs).count() == 0
    assert compression_screen(no_docs).count() == 0
    assert exact_dedup_keys_normalized(no_docs).count() == 0


@settings(max_examples=12, deadline=None)
@given(st.text(alphabet="ab c", min_size=0, max_size=120),
       st.integers(8, 40), st.integers(0, 7))
def test_chunk_documents_matches_python_model(spark, text, chunk, overlap):
    """chunk_documents vs the serial Python chunker: identical chunk
    boundaries/text for arbitrary text and (chunk, overlap) params —
    including empty text (zero chunks) and overlap 0 (disjoint)."""
    from parallel_svms_spark.operators.sharding import chunk_documents

    stride = chunk - overlap
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted((r["chunk_ix"], r["chunk_start"], r["chunk_text"])
                 for r in chunk_documents(
                     df, chunk_chars=chunk, overlap=overlap).collect())
    want = []
    s = 0
    while s < len(text):
        want.append((s // stride, s, text[s:s + chunk]))
        s += stride
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.integers(2, 9), st.lists(st.integers(0, 10_000), min_size=1,
                                   max_size=40, unique=True))
def test_kfold_assign_fold_ids_match_hash_intervals(spark, k, ids):
    """kfold_assign vs the hash-interval model: fold i iff the md5
    8-hex prefix lands in [i/k, (i+1)/k) — for arbitrary k and ids
    (the dataset_split coin with integer fold ids)."""
    import hashlib

    from parallel_svms_spark.operators.sharding import kfold_assign

    df = spark.createDataFrame([(i,) for i in ids], "vec_id long")
    got = {r["vec_id"]: r["fold"] for r in kfold_assign(df, k=k).collect()}
    for i in ids:
        h8 = hashlib.md5(str(i).encode()).hexdigest()[:8]
        u = int(h8, 16) / 16 ** 8
        # the engine renders thresholds as floor(frac·(16^8)) hex
        # strings and compares lexicographically; recompute exactly
        fold = k - 1
        for j in range(1, k):
            thr = min(int((j / k) * 16 ** 8), 16 ** 8 - 1)
            if int(h8, 16) < thr:
                fold = j - 1
                break
        assert got[i] == fold, (i, h8, u)


def test_r8_substring_family_edge_inputs(spark):
    """Empty corpus, all-NULL text, single doc, and sub-k docs: the
    substring family degrades to empty/zero outputs without error."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert D.repeated_spans(empty).count() == 0
    assert D.repeated_span_stats(empty).count() == 0
    assert D.scrub_repeated_spans(empty).count() == 0

    nulls = spark.createDataFrame([(1, None), (2, None)],
                                  "doc_id long, text string")
    assert D.repeated_spans(nulls).count() == 0
    assert D.repeated_span_stats(nulls).count() == 0

    single = spark.createDataFrame(
        [(1, "just one lonely document here only")],
        "doc_id long, text string")
    assert D.repeated_spans(single).count() == 0
    st = D.repeated_span_stats(single).first()
    assert (st.dup_tokens, st.n_spans, st.dup_ppm) == (0, 0, 0)
    sc = D.scrub_repeated_spans(single).first()
    assert sc.clean_text == "just one lonely document here only"
    assert sc.n_removed_tokens == 0

    # every doc shorter than k: no grams anywhere
    tiny = spark.createDataFrame([(1, "a b"), (2, "a b"), (3, "c")],
                                 "doc_id long, text string")
    assert D.repeated_spans(tiny).count() == 0
    assert D.scrub_repeated_spans(tiny).filter(
        "n_removed_tokens > 0").count() == 0


def test_r8_mixture_and_surgical_edge_inputs(spark):
    """Empty corpus / empty benchmark / budget-zero-ish degeneracies
    for the r8 sampling and decontamination additions."""
    from parallel_svms_spark.operators import contamination as C
    from parallel_svms_spark.operators import sharding as SH

    empty = spark.createDataFrame([], "doc_id long, source string,"
                                      " text string")
    assert SH.mixture_sample_tokens(empty).count() == 0
    docs = spark.createDataFrame(
        [(1, "a", "w1 w2 w3 w4 w5 w6"), (2, "a", "w7 w8 w9 wa wb")],
        "doc_id long, source string, text string")
    # budget 1: exactly the first doc on the walk per source
    assert SH.mixture_sample_tokens(docs, budget_tokens=1).count() == 1
    # empty benchmark: surgical is the identity rewrite
    bench = spark.createDataFrame([], "doc_id long, text string")
    out = {r.doc_id: (r.clean_text, r.n_removed_tokens)
           for r in C.decontaminate_surgical(docs, bench).collect()}
    assert out == {1: ("w1 w2 w3 w4 w5 w6", 0),
                   2: ("w7 w8 w9 wa wb", 0)}
    # corpus empty against a real benchmark: empty output
    assert C.decontaminate_surgical(
        empty.select("doc_id", "text"), docs).count() == 0


@settings(max_examples=10, deadline=None)
@given(st.lists(st.lists(st.sampled_from("ab"), min_size=0, max_size=10),
                min_size=1, max_size=5))
def test_scrub_repeated_spans_property_vs_python(spark, token_lists):
    """r9 property pin for the keep-first scrub at k=2 over a 2-letter
    token alphabet (forces dense gram collisions — self-overlapping
    periodic runs, cross-doc and intra-doc repeats all arise): the
    engine must match a direct Python model of the contract (witness
    = lexicographically-minimal (doc, pos) per gram with ≥2 global
    occurrences; every token in a non-witness occurrence's [p, p+1]
    is cut)."""
    k = 2
    texts = [" ".join(t) for t in token_lists]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r.doc_id: (r.clean_text, r.n_removed_tokens)
           for r in D.scrub_repeated_spans(df, k=k).collect()}

    toks = {i: t.split(" ") for i, t in enumerate(texts)}
    occ: dict = {}
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            occ.setdefault(tuple(ts[p:p + k]), []).append((i, p))
    cov: dict = {i: set() for i in toks}
    for g, places in occ.items():
        if len(places) < 2:
            continue
        keep = min(places)
        for (i, p) in places:
            if (i, p) != keep:
                cov[i].update(range(p, p + k))
    want = {i: (" ".join(t for j, t in enumerate(ts)
                         if j not in cov[i]), len(cov[i]))
            for i, ts in toks.items()}
    assert got == want
