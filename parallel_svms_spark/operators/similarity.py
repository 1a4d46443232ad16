"""Vector similarity search over embedding columns (SURVEY §2.8 E3).

Brute-force cosine top-k is the verifiable baseline (and the right
answer for one-off queries — a single narrow scan). The scale paths:

- ``ann_lsh_topk``: random-hyperplane LSH — probe only matching
  buckets; signature computation is a broadcast-dot-product in a
  Pandas UDF (Arrow-vectorized), bucketing is a plain groupBy.
- ``ivf_topk``: IVF-style coarse quantization — k-means-lite
  centroids (seeded, driver-computed on a sample), each vector
  assigned to its nearest centroid partition; queries probe n_probe
  partitions. At 100 TB the centroid assignment is the partition
  pruning story: top-k scans 1/n_lists of the data.

All dot products run on float64 numpy inside Arrow batches — the
columnar transfer keeps this within 2-3× of JVM throughput, and the
built-in alternative (aggregate/zip_with per row) loses codegen on
64-wide arrays anyway.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def cosine_scores(embeddings: DataFrame, query_vec: list[float],
                  id_col: str = "vec_id",
                  features_col: str = "embedding") -> DataFrame:
    """Cosine of every row against one query vector — JVM-side
    zip_with/aggregate expressions (exact, SQL-oracle-able)."""
    q = [float(x) for x in query_vec]
    qn = float(np.sqrt(sum(x * x for x in q)))
    emb = F.col(features_col).cast("array<double>")
    dot = F.aggregate(
        F.zip_with(emb, F.array(*[F.lit(x) for x in q]), lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    norm = F.sqrt(F.aggregate(
        F.transform(emb, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x))
    return embeddings.select(
        F.col(id_col),
        F.round(dot / (norm * F.lit(qn)), 6).alias("cosine"))


def topk_cosine(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id",
                features_col: str = "embedding") -> DataFrame:
    """Brute-force top-k. orderBy+limit compiles to TakeOrderedAndProject
    — per-partition heaps + driver merge of k rows, no global sort."""
    return (cosine_scores(embeddings, query_vec, id_col, features_col)
            .orderBy(F.col("cosine").desc(), F.col(id_col))
            .limit(k))


def brute_topk_join(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                    features_col: str = "embedding") -> DataFrame:
    """Batch top-k: every query row against every data row.

    Broadcast the (small) query set, blockwise numpy matmul per Arrow
    batch, per-partition local top-k, then a window to cut global
    top-k — the shuffle carries only n_queries × k × n_partitions
    candidate rows, never the full cross product.
    """
    spark = embeddings.sparkSession
    qrows = queries.select(F.col("vec_id").alias("query_id"),
                           F.col(features_col)).collect()
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qids = np.array([r[0] for r in qrows])
    bc = spark.sparkContext.broadcast((qids, Qn))

    def local_topk(it):
        qids_, Qn_ = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[features_col].to_numpy()).astype(np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
            S = Qn_ @ Xn.T                       # (nq, batch)
            kk = min(k, S.shape[1])
            idx = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            out = pd.DataFrame({
                "query_id": np.repeat(qids_, kk),
                "vec_id": pdf["vec_id"].to_numpy()[idx].ravel(),
                "cosine": np.round(np.take_along_axis(S, idx, 1).ravel(), 6),
            })
            yield out

    cand = embeddings.select("vec_id", features_col).mapInPandas(
        local_topk, schema="query_id long, vec_id long, cosine double")
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "vec_id")
    return (cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k).drop("rn"))


# ---------------------------------------------------------------------------
# ANN — random-hyperplane LSH
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def lsh_bucketize(embeddings: DataFrame, n_bits: int = 12, seed: int = 42,
                  features_col: str = "embedding") -> DataFrame:
    """Sign-of-projection bucket id per vector (Arrow-batched)."""
    spark = embeddings.sparkSession
    first = embeddings.select(features_col).first()
    dim = len(first[0])
    H = _hyperplanes(dim, n_bits, seed)
    bc = spark.sparkContext.broadcast(H)
    cols = embeddings.columns

    def assign(it):
        H_ = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[features_col].to_numpy()).astype(np.float64)
            bits = (X @ H_.T) > 0
            bucket = bits @ (1 << np.arange(bits.shape[1], dtype=np.int64))
            yield pdf.assign(lsh_bucket=bucket)

    schema = ", ".join(f"{c} {t}" for c, t in embeddings.dtypes) \
        + ", lsh_bucket long"
    return embeddings.mapInPandas(assign, schema=schema)


def ann_lsh_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                 n_bits: int = 12, n_probe_bits: int = 2, seed: int = 42,
                 features_col: str = "embedding") -> DataFrame:
    """ANN top-k: probe the query's bucket plus all buckets within
    ``n_probe_bits`` hamming distance (multi-probe), then exact rerank.

    At scale the bucket column is a partition key: probing b buckets
    scans b/2^n_bits of the data instead of all of it.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    dim = len(q)
    H = _hyperplanes(dim, n_bits, seed)
    qbits = (H @ q) > 0
    qbucket = int(qbits @ (1 << np.arange(n_bits, dtype=np.int64)))
    # all buckets within hamming distance n_probe_bits — generic
    # expansion (an earlier version hardcoded distances 1 and 2, so
    # n_probe_bits=3 silently behaved as 2; caught by the recall sweep
    # plateauing across probe_bits 2→3)
    from itertools import combinations
    probes = {qbucket}
    for dist in range(1, int(n_probe_bits) + 1):
        for idxs in combinations(range(n_bits), dist):
            mask = 0
            for i in idxs:
                mask |= 1 << i
            probes.add(qbucket ^ mask)
    bucketed = lsh_bucketize(embeddings, n_bits, seed, features_col)
    cand = bucketed.filter(F.col("lsh_bucket").isin(list(probes)))
    return topk_cosine(cand, [float(x) for x in q], k,
                       features_col=features_col)


# ---------------------------------------------------------------------------
# ANN — IVF coarse quantization
# ---------------------------------------------------------------------------

def _kmeans_lite(X: np.ndarray, n_lists: int, seed: int = 42,
                 n_iter: int = 10) -> np.ndarray:
    """Seeded lloyd iterations on a driver-local sample — centroids
    only, deterministic. numpy-only (no sklearn in env)."""
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_lists, len(X)), replace=False)]
    for _ in range(n_iter):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(len(C)):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(0)
    return C


def ivf_assign(embeddings: DataFrame, n_lists: int = 16, seed: int = 42,
               sample_rows: int = 4096,
               features_col: str = "embedding",
               id_col: str = "vec_id") -> tuple[DataFrame, np.ndarray]:
    """IVF index build: centroids from a seeded driver-side sample
    (sample size is fixed, not data-proportional — at 100 TB the
    sample is still 4096 rows), then every vector assigned to its
    nearest centroid via one broadcast + Arrow-batched matmul.

    Returns (embeddings + ``ivf_list`` column, centroids). At scale,
    write the result ``partitionBy('ivf_list')`` so queries prune to
    n_probe/n_lists of the files — ``write_ivf_partitioned`` /
    ``ivf_topk_partitioned`` package exactly that (pruning proven by
    plan test).

    The sample is the ``sample_rows`` rows with the smallest
    ``md5(cast(id as string))`` — a deterministic uniform draw over
    the WHOLE table (TakeOrdered: per-partition heaps, no full sort).
    A plain ``limit()`` here would take the first partition's rows,
    which on sorted/clustered data puts every centroid in one region
    and collapses recall. md5-of-id-string (rather than xxhash64) is
    chosen because every SQL engine computes the identical hex digest,
    making the whole index build recomputable by the DuckDB oracle
    (`__spark_entry__._ann_ivf_oracle`); rows are re-sorted driver-side
    so the k-means input order never depends on Spark's collect order."""
    C = ivf_centroids(embeddings, n_lists, seed, sample_rows,
                      features_col, id_col)
    return ivf_assign_with(embeddings, C, features_col), C


def ivf_centroids(embeddings: DataFrame, n_lists: int = 16,
                  seed: int = 42, sample_rows: int = 4096,
                  features_col: str = "embedding",
                  id_col: str = "vec_id") -> np.ndarray:
    """The centroid half of ``ivf_assign`` (see its docstring for the
    determinism contract) — exposed so incremental consumers can train
    on the CORPUS and assign a later batch with the same model."""
    sample = (embeddings
              .select(F.col(id_col).alias("_id"), F.col(features_col),
                      F.md5(F.col(id_col).cast("string")).alias("_h"))
              .orderBy("_h", "_id").limit(sample_rows)
              .collect())
    sample.sort(key=lambda r: (r["_h"], r["_id"]))
    X = np.stack([np.asarray(r[features_col], dtype=np.float64)
                  for r in sample])
    return _kmeans_lite(X, n_lists, seed)


def ivf_assign_with(embeddings: DataFrame, C: np.ndarray,
                    features_col: str = "embedding") -> DataFrame:
    """Assign every vector to its nearest of the GIVEN centroids —
    one broadcast + Arrow-batched matmul, no exchange."""
    bc = embeddings.sparkSession.sparkContext.broadcast(C)

    def assign(it):
        C_ = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[features_col].to_numpy()).astype(np.float64)
            d = (V * V).sum(1)[:, None] - 2.0 * (V @ C_.T) \
                + (C_ * C_).sum(1)[None, :]
            yield pdf.assign(ivf_list=d.argmin(1).astype(np.int32))

    schema = ", ".join(f"{c} {t}" for c, t in embeddings.dtypes) \
        + ", ivf_list int"
    return embeddings.mapInPandas(assign, schema=schema)


def cluster_balanced_sample(embeddings: DataFrame, per_list: int = 20,
                            n_lists: int = 16, seed: int = 42,
                            features_col: str = "embedding",
                            id_col: str = "vec_id",
                            label_col: str = "label") -> DataFrame:
    """Diversity sampling (r9): exactly ``min(per_list, |list|)``
    vectors per IVF semantic cluster — the cluster-balanced quota
    selection a pretraining mixture uses so a dominant embedding
    region (one giant web template, one language) cannot crowd the
    sample, the selection counterpart of SemDeDup's cluster-bucketed
    dedup (Abbas et al. 2023: dedup WITHIN clusters; this SAMPLES
    within clusters). Within each list the kept rows are the first
    ``per_list`` by the md5(id) walk order — deterministic, uniform
    in distribution, engine-reproducible (the ``mixture_sample_hash``
    convention).

    Scale shape: assignment is the shared broadcast-matmul map
    (``ivf_assign``, no exchange); the per-list quota is a SKEW-SAFE
    two-phase top-k — phase 1 ranks within (list, salt=xxhash64 % 32)
    buckets and keeps ≤ per_list per bucket, phase 2 re-ranks the
    ≤ 32·per_list survivors per list — so a mega-list never lands a
    corpus-sized sort in ONE task the way a bare per-list rank window
    would (window partitions are bounded by 32·per_list and the salt
    bucket size respectively). Output: (vec_id, label, ivf_list).

    Oracle: the rebuilt-centroid assignment CTE
    (``_ivf_assignment_parts``) + ROW_NUMBER per list over the same
    md5 order — the salted two-phase provably selects the identical
    set (phase 1 only drops rows ranked > per_list within a SUBSET of
    their list, which global rank > per_list implies).
    """
    assigned, _ = ivf_assign(embeddings, n_lists=n_lists, seed=seed,
                             features_col=features_col, id_col=id_col)
    # label_col is carried through when present (NULL when the schema
    # lacks it — the dataset_manifest lang_col convention)
    label = (F.col(label_col) if label_col in embeddings.columns
             else F.lit(None).cast("int"))
    h = F.md5(F.col(id_col).cast("string"))
    cand = (assigned
            .select(F.col(id_col), label.alias("label"), "ivf_list",
                    h.alias("_h"),
                    F.pmod(F.xxhash64(F.col(id_col)), F.lit(32))
                    .alias("_salt")))
    w1 = W.partitionBy("ivf_list", "_salt").orderBy("_h", id_col)
    w2 = W.partitionBy("ivf_list").orderBy("_h", id_col)
    return (cand
            .withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= int(per_list))
            .withColumn("_r2", F.row_number().over(w2))
            .filter(F.col("_r2") <= int(per_list))
            .select(id_col, "label", "ivf_list"))


def ivf_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
             n_lists: int = 16, n_probe: int = 4, seed: int = 42,
             features_col: str = "embedding",
             index: "tuple[DataFrame, np.ndarray] | None" = None
             ) -> DataFrame:
    """IVF ANN top-k: probe the n_probe nearest inverted lists, exact
    rerank inside them. Scans n_probe/n_lists of the data — with the
    table partitioned by ivf_list this is partition pruning, the
    100 TB path. ``index``: pass a prebuilt (assigned, centroids)
    pair from ``ivf_assign`` (same embeddings/params) to skip the
    index build — the suite-scoped sharing hook (r10); the
    partitioned-layout production twin is ``ivf_topk_partitioned``."""
    assigned, C = index if index is not None else \
        ivf_assign(embeddings, n_lists, seed, features_col=features_col)
    q = np.asarray(query_vec, dtype=np.float64)
    d = ((C - q[None, :]) ** 2).sum(1)
    probes = [int(i) for i in np.argsort(d)[:n_probe]]
    cand = assigned.filter(F.col("ivf_list").isin(probes))
    return topk_cosine(cand, [float(x) for x in q], k,
                       features_col=features_col)


def write_ivf_partitioned(embeddings: DataFrame, path: str,
                          n_lists: int = 16, seed: int = 42,
                          sample_rows: int = 4096,
                          features_col: str = "embedding",
                          id_col: str = "vec_id") -> np.ndarray:
    """Materialize the IVF index as a Hive-partitioned parquet layout
    (one directory per inverted list) and return the centroids.

    This is the build-once/query-many half of the 100 TB story that
    ``ivf_topk`` (which re-assigns per query) only documents: with the
    table written ``partitionBy('ivf_list')``, the probe predicate in
    ``ivf_topk_partitioned`` becomes a PARTITION filter — Spark lists
    and reads only n_probe/n_lists of the files, no per-row filtering,
    no scan of the other lists (proven in
    tests/test_plan_shape.py::test_ivf_partitioned_layout_prunes_scan).
    """
    assigned, C = ivf_assign(embeddings, n_lists, seed, sample_rows,
                             features_col, id_col)
    assigned.write.mode("overwrite").partitionBy("ivf_list").parquet(path)
    return C


def ivf_topk_partitioned(spark, path: str, centroids: np.ndarray,
                         query_vec: list[float], k: int = 10,
                         n_probe: int = 4,
                         features_col: str = "embedding",
                         id_col: str = "vec_id") -> DataFrame:
    """ANN top-k against a ``write_ivf_partitioned`` layout: pick the
    n_probe nearest lists driver-side (centroids are tiny), push
    ``ivf_list IN (...)`` as a partition filter, exact-rerank inside
    the surviving files only."""
    q = np.asarray(query_vec, dtype=np.float64)
    d = ((centroids - q[None, :]) ** 2).sum(1)
    probes = [int(i) for i in np.argsort(d)[:n_probe]]
    cand = spark.read.parquet(path).filter(F.col("ivf_list").isin(probes))
    return topk_cosine(cand, [float(x) for x in q], k,
                       id_col=id_col, features_col=features_col)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup pairs (E2 family, on vectors)
# ---------------------------------------------------------------------------

def cosine_near_dup_exact(embeddings: DataFrame, threshold: float = 0.9,
                          features_col: str = "embedding") -> DataFrame:
    """Exact all-pairs cosine ≥ threshold, shuffle-free: broadcast the
    (normalized) full matrix, blockwise matmul against each Arrow
    batch, emit only qualifying pairs with vec_a < vec_b.

    SMALL-DATA fast path only — it collects the table to the driver to
    build the broadcast matrix, which caps it at ~1e6 small-dim vectors
    and makes it categorically wrong at cluster scale. The engine
    default is ``cosine_near_dup_blocked`` (exact, distributed, no
    driver collect); this variant is kept for one-shot interactive use
    where a single broadcast beats two shuffles.
    """
    spark = embeddings.sparkSession
    rows = embeddings.select("vec_id", features_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
    bc = spark.sparkContext.broadcast((ids, Mn))

    def pairs(it):
        ids_, Mn_ = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[features_col].to_numpy()).astype(np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                                1e-30)
            S = Xn @ Mn_.T                         # (batch, n_all)
            a_ids = pdf["vec_id"].to_numpy()
            ai, bi = np.nonzero(S >= threshold)
            va, vb = a_ids[ai], ids_[bi]
            keep = va < vb
            yield pd.DataFrame({
                "vec_a": va[keep], "vec_b": vb[keep],
                "cosine": np.round(S[ai, bi][keep], 6),
            })

    return embeddings.select("vec_id", features_col).mapInPandas(
        pairs, schema="vec_a long, vec_b long, cosine double")

def cosine_near_dup_blocked(embeddings: DataFrame, threshold: float = 0.9,
                            n_blocks: int = 8,
                            features_col: str = "embedding",
                            id_col: str = "vec_id") -> DataFrame:
    """Exact all-pairs cosine ≥ threshold, fully distributed — the
    default scale path (replaces the driver-collect variant as the
    engine's exact near-dup join).

    2-D block decomposition: every vector hashes to one of ``n_blocks``
    blocks; each of the B(B+1)/2 unordered block pairs becomes one
    independent task that receives exactly two blocks and emits that
    tile of the similarity matrix via one numpy matmul. No row ever
    touches the driver; replication factor is B (each block ships to B
    tasks), so shuffled volume is B·n rows against the n² pair
    computations — the classic distributed all-pairs trade.

    At 100 TB: exact all-pairs is inherently O(n²) compute (same as the
    oracle); this layout distributes it with bounded task memory
    (2·n/B rows per task — raise ``n_blocks`` until a block fits an
    executor). When approximate recall is acceptable, use the
    LSH-bucketed ``cosine_near_dup_pairs`` instead, which prunes the
    pair space and scales sub-quadratically.
    """
    B = int(n_blocks)
    spark = embeddings.sparkSession
    src = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(features_col).alias("emb"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).cast("int").alias("blk"))
    tasks = spark.createDataFrame(
        [(ta, tb) for ta in range(B) for tb in range(ta, B)], "ta int, tb int")
    # side 0 = the "row block" (blk == ta); side 1 = the "column block"
    # (blk == tb, off-diagonal tasks only — the diagonal task computes
    # its within-block upper triangle from side 0 alone)
    side_a = src.join(F.broadcast(tasks), src["blk"] == tasks["ta"]) \
                .select("ta", "tb", F.lit(0).alias("side"), "vec_id", "emb")
    side_b = src.join(F.broadcast(tasks.filter("ta < tb")),
                      src["blk"] == tasks["tb"]) \
                .select("ta", "tb", F.lit(1).alias("side"), "vec_id", "emb")
    both = side_a.unionByName(side_b)

    def tile(pdf):
        # diagonal iff the GROUP KEY says so — never inferred from row
        # counts: an off-diagonal (ta, tb) group whose column block tb
        # happens to be empty (common when n ≪ n_blocks) must emit
        # nothing, not silently recompute block ta's within-block pairs
        # (which would duplicate the (ta, ta) task's output)
        diagonal = bool(pdf["ta"].iloc[0] == pdf["tb"].iloc[0])
        a = pdf[pdf["side"] == 0]
        b = pdf[pdf["side"] == 1]
        if len(a) == 0 or (not diagonal and len(b) == 0):
            return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                                 "vec_b": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        X = np.stack(a["emb"].to_numpy()).astype(np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        ids_a = a["vec_id"].to_numpy()
        if diagonal:  # diagonal task: within-block upper triangle
            S = Xn @ Xn.T
            ai, bi = np.nonzero(S >= threshold)
            ids_b = ids_a
        else:
            Y = np.stack(b["emb"].to_numpy()).astype(np.float64)
            Yn = Y / np.maximum(np.linalg.norm(Y, axis=1, keepdims=True),
                                1e-30)
            S = Xn @ Yn.T
            ai, bi = np.nonzero(S >= threshold)
            ids_b = b["vec_id"].to_numpy()
        va, vb = ids_a[ai], ids_b[bi]
        keep = va != vb  # drops self-pairs; off-diag blocks are disjoint
        va, vb, cos = va[keep], vb[keep], S[ai, bi][keep]
        lo = np.minimum(va, vb)
        hi = np.maximum(va, vb)
        if diagonal:
            # each unordered within-block pair appears twice (S is
            # symmetric) — keep the va<vb instance only
            keep2 = va < vb
            lo, hi, cos = lo[keep2], hi[keep2], cos[keep2]
        return pd.DataFrame({"vec_a": lo, "vec_b": hi,
                             "cosine": np.round(cos, 6)})

    return both.groupBy("ta", "tb").applyInPandas(
        tile, schema="vec_a long, vec_b long, cosine double")


def cosine_near_dup_ivf(embeddings: DataFrame, threshold: float = 0.9,
                        n_lists: int = 16, seed: int = 42,
                        sample_rows: int = 4096,
                        features_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Cluster-bucketed embedding near-dup — the SemDeDup recipe
    (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the
    embeddings, then search for high-cosine pairs only WITHIN each
    cluster. Sub-quadratic by construction: pair compute drops from
    n² to Σ|cluster|² ≈ n²/n_lists (uniform case), and the documented
    trade is recall on pairs that straddle a cluster boundary —
    acceptable for dedup because near-duplicates, being near, land in
    the same Voronoi cell with high probability.

    Reuses the deterministic IVF index build (seeded k-means over the
    fixed-size md5-ordered sample, engine-reproducible — the DuckDB
    oracle rebuilds the identical centroids and assignment). Each
    cluster becomes one applyInPandas task computing its similarity
    tile with a single numpy matmul. At 100 TB, scale ``n_lists``
    with the corpus so a cluster fits a task (n_lists ≈ n/500k keeps
    tiles under ~2 GB at 768-dim float64); a pathologically hot
    cluster can further run the 2-D blocked decomposition
    (``cosine_near_dup_blocked``) within that cluster alone.
    """
    assigned, _ = ivf_assign(embeddings, n_lists, seed, sample_rows,
                             features_col, id_col)
    src = assigned.select(F.col(id_col).alias("vec_id"),
                          F.col(features_col).alias("emb"), "ivf_list")

    def bucket(pdf):
        if len(pdf) < 2:
            return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                                 "vec_b": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        X = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        S = Xn @ Xn.T
        ai, bi = np.nonzero(S >= threshold)
        ids = pdf["vec_id"].to_numpy()
        va, vb = ids[ai], ids[bi]
        keep = va < vb  # upper triangle once; drops self-pairs
        return pd.DataFrame({"vec_a": va[keep], "vec_b": vb[keep],
                             "cosine": np.round(S[ai, bi][keep], 6)})

    return src.groupBy("ivf_list").applyInPandas(
        bucket, schema="vec_a long, vec_b long, cosine double")


def ivf_index_append(new_vecs: DataFrame, index_path: str,
                     centroids: np.ndarray,
                     features_col: str = "embedding",
                     id_col: str = "vec_id") -> None:
    """The embedding twin of ``dedup.minhash_index_append`` (VERDICT
    r6 #3): append the screened batch's IVF assignment rows to the
    persisted index at ``index_path`` so tomorrow's
    ``cosine_near_dup_ivf_incremental`` screens against today's
    output. Assigns ONLY the batch (one broadcast matmul against the
    frozen corpus ``centroids`` — the corpus is never re-clustered or
    re-read) and appends immutable parquet. The centroids are part of
    the index identity: persist the small (n_lists, dim) array next
    to the path and pass the SAME array to every append and screen —
    re-training them would silently re-deal every list.
    """
    (ivf_assign_with(
        new_vecs.select(F.col(id_col), F.col(features_col)), centroids,
        features_col)
     .write.mode("append").parquet(index_path))


def cosine_near_dup_ivf_incremental(corpus: DataFrame,
                                    new_vecs: DataFrame,
                                    index: DataFrame | None = None,
                                    centroids: np.ndarray | None = None,
                                    threshold: float = 0.9,
                                    n_lists: int = 16, seed: int = 42,
                                    sample_rows: int = 4096,
                                    features_col: str = "embedding",
                                    id_col: str = "vec_id") -> DataFrame:
    """Incremental SemDeDup: near-dup pairs TOUCHING the new batch
    under the CORPUS's IVF model — the embedding twin of
    ``dedup.minhash_near_dups_incremental``.

    Centroids are trained on the corpus (the index predates the
    batch, exactly the production situation); the batch is assigned
    with ``ivf_assign_with`` — one broadcast matmul over |batch|
    rows, the corpus is never re-clustered. Pass ``index`` (the
    persisted ``ivf_assign`` output, partitionBy('ivf_list') at
    scale) and ``centroids`` (persist the small (n_lists, dim) array
    next to it) to touch the corpus ONLY through the index scan —
    both rebuilt from ``corpus`` when omitted (the fixture path).
    Per list, one Arrow
    task computes the |new| × |members| similarity tile — cost
    Σ |new_l|·|list_l| instead of the full Σ |list_l|², and zero
    when a list received no new vectors.

    Returns (vec_a, vec_b, cosine), vec_a < vec_b, at least one side
    new, each pair exactly once. Ids of corpus and batch must be
    disjoint. The DuckDB oracle recomputes centroids from the
    corpus-only md5 sample and the full assignment + restricted pair
    join (`__spark_entry__` dedup_embedding_ivf_incremental)."""
    C = centroids if centroids is not None else ivf_centroids(
        corpus, n_lists, seed, sample_rows, features_col, id_col)
    if index is None:
        index = ivf_assign_with(corpus, C, features_col)
    newa = ivf_assign_with(new_vecs, C, features_col)
    cols = [F.col(id_col).alias("vec_id"),
            F.col(features_col).alias("emb"), "ivf_list"]
    both = (index.select(*cols, F.lit(False).alias("is_new"))
            .unionByName(newa.select(*cols, F.lit(True).alias("is_new"))))

    def bucket(pdf):
        empty = pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                              "vec_b": pd.Series([], dtype="int64"),
                              "cosine": pd.Series([], dtype="float64")})
        new_mask = pdf["is_new"].to_numpy()
        if len(pdf) < 2 or not new_mask.any():
            return empty
        X = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        S = Xn[new_mask] @ Xn.T
        ai, bi = np.nonzero(S >= threshold)
        ids = pdf["vec_id"].to_numpy()
        a_ids, b_ids = ids[new_mask][ai], ids[bi]
        # self-pairs out; new×new tiles appear twice (once per new
        # row) — keep the a<b orientation once; new×old appears once
        keep = (a_ids != b_ids) & (~new_mask[bi] | (a_ids < b_ids))
        va = np.minimum(a_ids[keep], b_ids[keep])
        vb = np.maximum(a_ids[keep], b_ids[keep])
        return pd.DataFrame({"vec_a": va, "vec_b": vb,
                             "cosine": np.round(S[ai, bi][keep], 6)})

    return both.groupBy("ivf_list").applyInPandas(
        bucket, schema="vec_a long, vec_b long, cosine double")


def cosine_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                          features_col: str = "embedding") -> DataFrame:
    """All pairs with cosine ≥ threshold via LSH-bucketed self-join:
    pairs are only formed within a bucket (high-cosine pairs collide
    with high probability), then exact-verified. Avoids the n² cross
    join; for exhaustive exactness use a smaller n_bits (more
    collisions) or brute_topk_join."""
    b = lsh_bucketize(embeddings, n_bits=8)
    a_ = b.select(F.col("vec_id").alias("vec_a"),
                  F.col(features_col).alias("emb_a"), "lsh_bucket")
    b_ = b.select(F.col("vec_id").alias("vec_b"),
                  F.col(features_col).alias("emb_b"), "lsh_bucket")
    ea = F.col("emb_a").cast("array<double>")
    eb = F.col("emb_b").cast("array<double>")
    dot = F.aggregate(F.zip_with(ea, eb, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(ea, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(eb, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    # shuffle_hash: both sides carry embedding arrays and Catalyst's
    # post-UDF size estimates are garbage — a broadcast pick here would
    # collect a corpus-sized side to the driver. The bucket-key
    # exchange keeps pair formation executor-local.
    return (
        a_.join(b_.hint("shuffle_hash"), ["lsh_bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(dot / (na * nb), 6))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine").distinct()
    )


# ---------------------------------------------------------------------------
# ANN — product quantization (PQ, Jégou/Douze/Schmid 2011: "Product
# Quantization for Nearest Neighbor Search", IEEE TPAMI 33(1))
# ---------------------------------------------------------------------------

def pq_train(sample: np.ndarray, m: int = 8, ks: int = 64,
             seed: int = 42) -> np.ndarray:
    """Train PQ codebooks on a driver-local sample: split the dim into
    ``m`` contiguous subspaces, run seeded k-means (``ks`` centroids)
    in each. Returns (m, ks, dim/m) codebooks. Like the IVF build, the
    sample is fixed-size regardless of table size."""
    n, dim = sample.shape
    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    dsub = dim // m
    return np.stack([
        _kmeans_lite(np.ascontiguousarray(sample[:, j * dsub:(j + 1) * dsub]),
                     ks, seed=seed + j)
        for j in range(m)])


def pq_encode(embeddings: DataFrame, codebooks: np.ndarray,
              features_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """Encode every vector as ``m`` one-byte-ish codes (nearest
    sub-centroid per subspace): (id, pq_codes array<int>).

    THE compression story: a 64-dim float vector is 256 B; its m=8
    code is 8 B — 32×. At 100 TB of embeddings the code table fits
    where the vectors never would, and the candidate scan reads ONLY
    the code column (column pruning). One broadcast (codebooks) + one
    Arrow pass; no shuffle.
    """
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)

    def encode(it):
        C = bc.value  # (m, ks, dsub)
        m, _, dsub = C.shape
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in pdf[features_col]])
            codes = np.empty((len(X), m), dtype=np.int64)
            for j in range(m):
                sub = X[:, j * dsub:(j + 1) * dsub]
                # (n, ks) distances via ||a-b||² = ||a||²-2ab+||b||²
                d = (sub * sub).sum(1)[:, None] \
                    - 2.0 * sub @ C[j].T \
                    + (C[j] * C[j]).sum(1)[None, :]
                codes[:, j] = d.argmin(1)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "pq_codes": list(codes)})

    return embeddings.select(id_col, features_col).mapInPandas(
        encode, schema=f"{id_col} long, pq_codes array<bigint>")


def pq_index_append(new_vecs: DataFrame, index_path: str,
                    codebooks: np.ndarray,
                    features_col: str = "embedding",
                    id_col: str = "vec_id") -> None:
    """The PQ-codes member of the index-maintenance family (VERDICT
    r6 #3 parenthetical): append the screened batch's (id, pq_codes)
    rows to the persisted code table at ``index_path`` under the
    FROZEN corpus ``codebooks`` — the corpus is never re-encoded, the
    code table is append-only immutable parquet (same lifecycle
    contract as ``ivf_index_append`` / ``dedup.minhash_index_append``;
    persist the small (m, ks, dsub) codebook array next to the path
    and pass the SAME array to every append — retraining it would
    silently re-map every stored code).
    """
    (pq_encode(new_vecs, codebooks, features_col, id_col)
     .write.mode("append").parquet(index_path))


def pq_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
            m: int = 8, ks: int = 64, n_candidates: int = 200,
            seed: int = 42, sample_rows: int = 4096,
            features_col: str = "embedding",
            id_col: str = "vec_id") -> DataFrame:
    """PQ ANN top-k with asymmetric distance (ADC) + exact rerank:

    1. codebooks from the same deterministic md5-ordered sample the
       IVF build uses;
    2. corpus encoded to m-byte codes (one Arrow pass, no shuffle);
    3. query → (m, ks) look-up table of exact sub-distances; each
       row's approximate distance is m LUT gathers + a sum — no
       original vectors touched (this is the stage that scans 32×
       less data at scale);
    4. top ``n_candidates`` by ADC distance (TakeOrdered heap);
    5. exact cosine rerank of the candidates only.

    Approximation is confined to CANDIDATE SELECTION — returned
    scores are exact cosines, so precision is 1.0 and recall is the
    only trade (measured in tools/recall_sweep.py / RECALL.md).
    """
    sample = (embeddings
              .select(F.col(id_col).alias("_id"), F.col(features_col),
                      F.md5(F.col(id_col).cast("string")).alias("_h"))
              .orderBy("_h", "_id").limit(int(sample_rows))
              .collect())
    X = np.asarray([np.asarray(r[features_col], dtype=np.float64)
                    for r in sorted(sample, key=lambda r: (r["_h"], r["_id"]))])
    C = pq_train(X, m=m, ks=ks, seed=seed)
    q = np.asarray(query_vec, dtype=np.float64)
    dsub = C.shape[2]
    lut = np.stack([((C[j] - q[j * dsub:(j + 1) * dsub][None, :]) ** 2).sum(1)
                    for j in range(C.shape[0])])  # (m, ks)

    coded = pq_encode(embeddings, C, features_col, id_col)
    spark = embeddings.sparkSession
    bc_lut = spark.sparkContext.broadcast(lut)

    @F.pandas_udf("double")
    def adc(codes: pd.Series) -> pd.Series:
        L = bc_lut.value
        cs = np.asarray(list(codes), dtype=np.int64)  # (n, m)
        return pd.Series(L[np.arange(L.shape[0])[None, :], cs].sum(1))

    cand = (coded.withColumn("adc_dist", adc(F.col("pq_codes")))
            .orderBy(F.col("adc_dist").asc(), F.col(id_col))
            .limit(int(n_candidates))
            .select(id_col))
    survivors = embeddings.join(F.broadcast(cand), id_col, "left_semi")
    return topk_cosine(survivors, [float(x) for x in q], k,
                       features_col=features_col)


def ivfpq_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
               n_lists: int = 16, n_probe: int = 4, m: int = 8,
               ks: int = 64, n_candidates: int = 200, seed: int = 42,
               features_col: str = "embedding",
               id_col: str = "vec_id",
               index: "tuple[DataFrame, np.ndarray] | None" = None
               ) -> DataFrame:
    """IVFADC (the full system of Jégou et al. 2011 §IV): IVF coarse
    quantization prunes to the n_probe nearest lists, PQ/ADC ranks the
    survivors in compressed domain, exact cosine reranks the final
    candidates.

    The composed scale story — the two approximations cut different
    costs: IVF cuts ROWS TOUCHED (partition pruning to
    n_probe/n_lists of the table), PQ cuts BYTES PER ROW (m-byte
    codes, 32× under 64-dim float). At 100 TB that is the difference
    between scanning 100 TB, 25 TB (IVF), and ~0.8 TB (IVFADC) per
    query batch. Both component paths keep their measured recall
    behavior (RECALL.md); the composition's recall is the product of
    the two candidate stages', tested on planted neighbors.

    ``index``: prebuilt (assigned, centroids) as in ``ivf_topk`` —
    the coarse quantizer is shared; the PQ codebooks still train on
    THIS call's pruned lists (they depend on the query's probes).
    """
    assigned, C = index if index is not None else \
        ivf_assign(embeddings, n_lists, seed,
                   features_col=features_col, id_col=id_col)
    q = np.asarray(query_vec, dtype=np.float64)
    d = ((C - q[None, :]) ** 2).sum(1)
    probes = [int(i) for i in np.argsort(d)[:n_probe]]
    pruned = assigned.filter(F.col("ivf_list").isin(probes)) \
                     .drop("ivf_list")
    return pq_topk(pruned, [float(x) for x in q], k=k, m=m, ks=ks,
                   n_candidates=n_candidates, seed=seed,
                   features_col=features_col, id_col=id_col)


def label_centroids(embeddings: DataFrame,
                    vec_col: str = "embedding",
                    label_col: str = "label") -> DataFrame:
    """Per-label centroid of the embedding column, as exact
    integer-scaled component sums: (label, dim, sum_scaled, n).

    The curation primitive behind class prototypes, per-cluster means
    and drift monitors. ``posexplode`` flattens to (label, dim, v)
    rows — a ×dims linear blowup, but ``groupBy(label, dim)`` is
    map-side combinable, so the one shuffle carries ≤ |labels|×dims
    rows per task regardless of corpus size; no vector ever crosses
    the wire whole and nothing collects to the driver. (An elementwise
    array-sum UDAF would save the explode but puts a Python aggregator
    in the hot path; the explode stays whole-stage-codegen JVM.)

    Determinism contract (the corr_profile/_cents trick applied to
    vectors): each float32 casts exactly to double, ``floor(v·10⁶)``
    is identical per element on both engines, and LONG sums are
    associative — so the result is partition-order-independent and
    DuckDB-hashable, unlike a float mean. Callers recover the centroid
    as sum_scaled / (10⁶ · n), an exact-integer division both engines
    reproduce bit-for-bit.
    """
    ex = embeddings.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("dim", "v"))
    return (ex.groupBy("label", "dim")
            .agg(F.sum(F.floor(F.col("v").cast("double") * 1000000)
                       .cast("long")).alias("sum_scaled"),
                 F.count("*").alias("n")))


def pool_embeddings(vectors: DataFrame, group_col,
                    vec_col: str = "embedding", dim: int = 64,
                    mode: str = "mean") -> DataFrame:
    """Pool member vectors to one vector per group — the
    chunk-embeddings→document-embedding (or token→sentence) step of
    every RAG / retrieval corpus build: (group_id, n_members,
    pooled ARRAY<DOUBLE>), components rounded to 6 dp.

    ``mode='mean'`` (default) or ``'max'`` (element-wise).

    Plan shape — the part that matters at 100 TB: ONE map-side-
    combinable hash aggregation with ``dim`` scalar agg expressions
    (`avg(v[0])..avg(v[d-1])`) reassembled into the array AFTER the
    agg. The naive formulation (posexplode to (group, dim_ix, val)
    rows, or collect_list of whole vectors then a driver/UDF fold)
    ships dim× rows — 64× the exchange — or unbounded per-group
    state; this one exchanges exactly one (sum, count) pair per
    dimension per group partial, the same partial-agg shape as any
    wide rollup, no explode, no window, no Python. ``dim`` is a
    static argument because the agg expressions must be fixed at
    plan time (embedding width is schema, not data — pass the real
    width; a mismatch fails loudly on the out-of-range getItem).

    DuckDB oracle: UNNEST the components with their index, per-index
    AVG/MAX, LIST(... ORDER BY i) reassembly — value-identical at
    the 6 dp rounding (sums of ≤ group-size doubles; association
    order differences sit ~1e-15, far under the rounding).
    """
    if mode == "mean":
        fn = "avg"
    elif mode == "max":
        fn = "max"
    else:
        raise ValueError(f"unknown pooling mode: {mode!r}")
    # agg + reassembly expressions as SQL text (r10): the Column-API
    # form spent ~0.9 s/call of pure driver latency on ~500 py4j
    # round-trips at dim=64 (guide §5); F.expr/selectExpr parse the
    # identical tree JVM-side. Plan and values unchanged.
    aggs = [F.expr(f"round({fn}(cast({vec_col}[{i}] as double)), 6)")
            .alias(f"_p{i}") for i in range(int(dim))]
    g = (vectors.select(group_col.alias("group_id"), vec_col)
         .groupBy("group_id")
         .agg(F.expr("count(*)").alias("n_members"), *aggs))
    pooled = "array(" + ", ".join(f"_p{i}" for i in range(int(dim))) + ")"
    # scalar companion of the array (Σ⌊cᵢ·10⁵⌋): suite digests are
    # SQL evaluated by BOTH engines, whose array indexing differs
    # (0- vs 1-based) — a scalar column sidesteps the divergence
    # while pinning every component through the hash
    comp = (f"aggregate({pooled}, cast(0 as long), "
            f"(a, x) -> a + cast(floor(x * 100000) as long))")
    return g.selectExpr("group_id", "n_members", f"{pooled} as pooled",
                        f"{comp} as comp_floor_sum")


def quantize_embeddings(embeddings: DataFrame, dim: int = 64,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Scalar int8 quantization of the embedding column — the 4×
    memory cut (float32 → uint8 codes) that lets an ANN index serve
    from RAM at corpus scale (the FAISS ``SQ8`` baseline; PQ, already
    implemented, is the more aggressive codebook cousin): per
    DIMENSION d, code = ⌊(v − min_d)/scale_d + ½⌋ with scale_d =
    (max_d − min_d)/255, so codes span [0, 255] exactly.

    Output: (id, codes ARRAY<INT>, code_sum, err_micro_sum) where
    ``code_sum`` = Σ codes (the scalar suite-digest companion, the
    pool_embeddings convention) and ``err_micro_sum`` =
    Σ_d ⌊|dequant_d − v_d|·10⁶⌋ pins the RECONSTRUCTION error of
    every component through the hash — the qkey doesn't just claim
    codes, it claims how lossy they are.

    Plan shape: ONE map-side-combinable params agg (2·dim scalar
    min/max — a 1-row driver collect, the ivf_centroids committed-
    params pattern), then a zero-exchange narrow projection with the
    params inlined as literals — quantizing 100 TB is a scan.
    Constant dimensions (max == min) code to 0 and dequantize to the
    constant, exactly.

    Engine parity, the part that makes a REAL SQL oracle possible:
    ``floor(x + 0.5)`` instead of round() (HALF_UP vs banker's
    rounding diverge between engines), and both engines compute
    (v − min)/((max − min)/255.0) over the identical doubles, so
    codes — and the floored error micros — bit-match.
    """
    p = quant_params(embeddings, dim, vec_col)
    return quantize_with(embeddings, p, vec_col, id_col)


def quant_params(embeddings: DataFrame, dim: int = 64,
                 vec_col: str = "embedding") -> dict:
    """Commit the quantizer ARTIFACT: ``{'mn': [...], 'sc': [...]}``
    from one map-side-combinable min/max agg — the params a day-N
    batch must encode under so archived codes stay comparable (a
    re-derived range would silently re-scale every new code). A few
    hundred bytes; persist as JSON like the BPE vocab / classifier."""
    # agg exprs as SQL text, not Column chains: 2·dim Column builds
    # cost ~2·dim·6 py4j round-trips of pure driver latency (guide
    # §5 — the driver should do almost no work); one selectExpr
    # parses the same tree JVM-side in one call. Identical plan.
    v = lambda i: f"cast({vec_col}[{i}] as double)"  # noqa: E731
    params = embeddings.selectExpr(
        *[f"min({v(i)}) as mn{i}" for i in range(int(dim))],
        *[f"max({v(i)}) as mx{i}" for i in range(int(dim))]
    ).first()
    mn = [float(params[f"mn{i}"]) for i in range(int(dim))]
    sc = [(float(params[f"mx{i}"]) - mn[i]) / 255.0
          for i in range(int(dim))]
    return {"mn": mn, "sc": sc}


def quantize_with(embeddings: DataFrame, params: dict,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Quantize under FROZEN committed params — the day-N leg:
    identical output to ``quantize_embeddings`` when ``params`` came
    from this corpus (pytest-pinned), and the ONLY correct way to
    encode a new batch against an existing code archive. Out-of-range
    day-N values clamp to [0, 255] (the documented saturation trade
    of frozen-range SQ; re-commit params when drift — watchable via
    ``audit.score_drift`` on any component — makes saturation
    material). Zero exchange: a pure literal-arithmetic projection.
    """
    mn = [float(x) for x in params["mn"]]
    sc = [float(x) for x in params["sc"]]
    dim = len(mn)

    # Expression tree built as SQL TEXT, parsed JVM-side in ONE
    # selectExpr call (r10). The Column-API form built code(i) three
    # times per dimension (codes array + code_sum chain + err's
    # dequantize), ~7k py4j round-trips = 4.7 s of pure DRIVER time
    # per call at dim=64 (guide §5: the driver should do almost no
    # work) before a single task ran. Arithmetic, operand order and
    # types are identical — float params embed as CAST('<repr>' AS
    # DOUBLE), exact by Java's round-trip parse — so codes and error
    # micros are bit-identical (oracle re-verified).
    def d(x: float) -> str:
        return f"cast('{x!r}' as double)"

    v = lambda i: f"cast({vec_col}[{i}] as double)"  # noqa: E731

    def code(i: int) -> str:
        if sc[i] == 0.0:
            return "0"
        # clamp: a no-op for the params' own corpus (min/max bound
        # the range by construction, so the oracle needs no clamp);
        # saturation only engages on frozen-params day-N outliers
        raw = f"floor((({v(i)} - {d(mn[i])}) / {d(sc[i])}) + 0.5d)"
        return f"cast(greatest(0, least(255, {raw})) as int)"

    def err(i: int) -> str:
        deq = (f"({d(mn[i])} + (cast({code(i)} as double) * {d(sc[i])}))"
               if sc[i] != 0.0 else d(mn[i]))
        return f"cast(floor(abs({deq} - {v(i)}) * 1e6) as long)"

    codes = "array(" + ", ".join(code(i) for i in range(int(dim))) + ")"
    code_sum = "cast(0 as long)"
    err_sum = "cast(0 as long)"
    for i in range(int(dim)):
        code_sum = f"({code_sum} + cast({code(i)} as long))"
        err_sum = f"({err_sum} + {err(i)})"
    return embeddings.selectExpr(
        id_col, f"{codes} as codes",
        f"{code_sum} as code_sum", f"{err_sum} as err_micro_sum")


def dequantize_expr(codes_col, mn: list[float], sc: list[float]):
    """The inverse as a Column: codes ARRAY<INT> → ARRAY<DOUBLE>
    under the committed (min, scale) params — broadcast-literal
    arithmetic, the scoring path of a quantized index."""
    mn_arr = F.array(*[F.lit(m) for m in mn])
    sc_arr = F.array(*[F.lit(s) for s in sc])
    return F.zip_with(
        F.zip_with(codes_col, sc_arr, lambda c, s:
                   c.cast("double") * s),
        mn_arr, lambda x, m: x + m)
