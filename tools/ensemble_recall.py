"""Ensemble consensus precision/recall receipts (r10): each family's
pair set and every vote level scored against the EXHAUSTIVE all-pairs
exact-Jaccard->=-0.5 truth (DuckDB, no blocking) on the fixture plus
a planted near/exact-dup block, where family error modes actually
diverge. Prints a markdown table for RECALL.md.

Usage: python tools/ensemble_recall.py [sf_dir]
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from parallel_svms_spark.io.sources import load_table  # noqa: E402
from parallel_svms_spark.operators import dedup as D  # noqa: E402
from parallel_svms_spark.session import get_spark  # noqa: E402


def truth_pairs(rows: list[tuple[int, str]]) -> set[tuple[int, int]]:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    sql = """
WITH sh AS (
  SELECT doc_id, UNNEST(CASE WHEN len(t) >= 3 THEN list_distinct(
      [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)])
    ELSE [array_to_string(t, ' ')] END) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT a, b FROM pairs
JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5
"""
    return {(r[0], r[1]) for r in con.execute(sql).fetchall()}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ensemble-recall")
    base = load_table(spark, sf, "documents")
    planted = base.limit(40)
    near = planted.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", F.slice(F.split("text", " "), 2, 1 << 20))
        .alias("text"), "lang", "source", "n_chars")
    exact = planted.select((F.col("doc_id") + 2_000_000).alias("doc_id"),
                           "text", "lang", "source", "n_chars")
    docs = base.unionByName(near).unionByName(exact).cache()

    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text")
            .collect()]
    truth = truth_pairs(rows)

    fams = {
        "jaccard (minhash-LSH)": {
            (r.doc_a, r.doc_b)
            for r in D.minhash_near_dups(docs, threshold=0.5).collect()},
        "simhash (hamming<=3)": {
            (r.doc_a, r.doc_b)
            for r in D.simhash_near_dups(docs, max_hamming=3).collect()},
        "editdist (passjoin<=3)": {
            (r.doc_a, r.doc_b)
            for r in D.editdist_passjoin_pairs(docs,
                                               max_dist=3).collect()},
    }
    votes = {(r.doc_a, r.doc_b): r.n_votes
             for r in D.ensemble_near_dups(docs, min_votes=1).collect()}

    def line(name: str, s: set) -> str:
        tp = len(s & truth)
        prec = tp / len(s) if s else 1.0
        rec = tp / len(truth) if truth else 1.0
        return (f"| {name} | {len(s)} | {tp} | {prec:.3f} | {rec:.3f} |")

    print(f"truth pairs (exhaustive exact Jaccard >= 0.5): {len(truth)}")
    print("| detector | pairs | true | precision | recall |")
    print("|---|---|---|---|---|")
    for name, s in fams.items():
        print(line(name, s))
    for v in (1, 2, 3):
        s = {p for p, n in votes.items() if n >= v}
        print(line(f"ensemble votes >= {v}", s))


if __name__ == "__main__":
    main()
