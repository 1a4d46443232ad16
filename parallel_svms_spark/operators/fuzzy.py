"""Fuzzy (edit-distance) matching over string columns.

Entity-resolution primitive the token-set family (Jaccard/MinHash in
operators/dedup.py) can't express: those see "red widget" and
"red widgets" as disjoint token sets, edit distance sees distance 1.

Scale shape: the naive formulation is a cross join with a levenshtein
filter — O(N²) and planned as BroadcastNestedLoopJoin, dead at any
scale. This module's formulation is exact-but-blocked:

1. collapse to DISTINCT values first (names repeat heavily in real
   catalogs; candidates are generated between value classes, not rows);
2. length-band equi-join: ``lev(a, b) ≤ d`` implies
   ``|len(a) − len(b)| ≤ d`` (each edit changes length by ≤ 1), so
   exploding one side to its d-neighborhood of lengths and equi-joining
   on length loses NO true pair while giving Catalyst a hash join key;
3. levenshtein refine on the (bounded) candidates — JVM built-in,
   whole-stage codegen, no UDF.

At 100 TB the length band alone is too coarse (all ~10-char names
collide); the documented next exact filter is PassJoin segment
blocking (Li/Deng/Wang/Feng, VLDB 2011): partition each string into
d+1 segments — by pigeonhole, any pair within distance d shares a
whole segment — and equi-join on (segment_no, segment, length_band)
instead of length alone. Same join-refine plan shape, strictly
smaller candidate set; the length-band version here keeps the qkey's
plan honest (hash join, never nested-loop — plan-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_name_pairs(df: DataFrame, col: str = "p_name",
                     max_dist: int = 2) -> DataFrame:
    """All unordered pairs of DISTINCT ``col`` values within
    levenshtein distance ``max_dist``: (name_a, name_b, dist) with
    name_a < name_b.

    The ``a.name < b.name`` canonical ordering halves the candidate
    space and makes the output a set (no (x,y)/(y,x) doubles, no
    self-pairs) — the same contract as dedup.py's candidate emitters.
    """
    names = df.select(F.col(col).alias("name")).distinct()
    left = names.select(
        F.col("name").alias("name_a"),
        F.explode(F.sequence(
            F.length("name") - max_dist,
            F.length("name") + max_dist)).alias("blen"))
    right = names.select(F.col("name").alias("name_b"),
                         F.length("name").alias("blen"))
    return (
        left.join(right, "blen")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist")
    )
