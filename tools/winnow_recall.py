"""Winnow-matcher recall measurement (r10): pair recall of
``winnow_near_dups`` against the exhaustive exact-Jaccard truth, per
window size w, plus the candidate volume each w pays — the
winnowing density/recall trade (Schleimer et al. 2003 §4: expected
fingerprint density 2/(w+1)).

Ground truth: every unordered pair with exact k=3 shingle-set
Jaccard ≥ threshold, computed by DuckDB with NO blocking (the same
all-pairs CTE the qkey oracles use, minus the candidate gate).
MinHash (the probabilistic alternative at the same threshold) is
measured on the same truth for context.

Usage: python tools/winnow_recall.py [sf_dir ...]
Prints a markdown table; paste into RECALL.md.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from parallel_svms_spark.operators import dedup as D  # noqa: E402
from parallel_svms_spark.session import get_spark  # noqa: E402

TRUTH_SQL = """
WITH sh AS (
  SELECT doc_id, UNNEST(CASE WHEN len(t) >= 3 THEN list_distinct(
      [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)])
    ELSE [array_to_string(t, ' ')] END) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS t
        FROM read_parquet('{p}') WHERE text IS NOT NULL)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) >= 0.5
"""


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001",
                               "/root/testdata/sf0.01"]
    spark = get_spark("winnow-recall")
    print("| sf | truth pairs | config | candidates | recall |")
    print("|---|---|---|---|---|")
    for sf in sf_dirs:
        p = f"{sf}/documents.parquet"
        truth = {(a, b) for a, b in
                 duckdb.sql(TRUTH_SQL.format(p=p)).fetchall()}
        docs = spark.read.parquet(p)
        rows = []
        for w in (4, 8, 16):
            fps = D.winnow_index(docs, k=3, w=w)
            cands = D._winnow_bucket_pairs(fps, 1000)
            cset = {(r.doc_a, r.doc_b) for r in cands.collect()}
            got = {(r.doc_a, r.doc_b) for r in D.winnow_near_dups(
                docs, k=3, w=w, threshold=0.5).collect()}
            rows.append((f"winnow w={w}", len(cset),
                         len(got & truth), len(truth)))
        mh = {(r.doc_a, r.doc_b) for r in D.minhash_near_dups(
            docs, threshold=0.5).collect()}
        rows.append(("minhash 64h/16b", "-", len(mh & truth),
                     len(truth)))
        for label, ncand, hit, tot in rows:
            print(f"| {Path(sf).name} | {tot} | {label} | {ncand} "
                  f"| {hit}/{tot} = {hit / tot:.2f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
