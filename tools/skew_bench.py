"""Skew-join experiment: measure the same join+aggregate three ways on
a deliberately skewed fact table — (1) plain join with AQE skew-join
handling on (Spark's built-in mitigation), (2) plain join with AQE
skew handling off (the naive baseline a mis-configured cluster runs),
(3) the explicit ``salted_join`` rewrite.

Fact: a lineitem derivative (mult × 600k rows) with HALF of all rows
remapped to ONE hot join key — the adversarial "mega-customer" shape.
Dim: 2M synthetic rows (too big to broadcast at default thresholds, so
every variant really exchanges both sides). All three variants are
asserted value-identical before timing is reported. Run at MULTIPLE
multipliers. Measured result (see SKEW.md): AQE's skew split wins at
scale; salting loses at BOTH scales here because replicating a 2M-row
dim 32× costs more than the hot task saves — which is itself the
finding: salting's regime is small-dim or aggregation skew, and the
engine's defaults (AQE on, salted_join opt-in) follow the numbers.

Writes SKEW.md. Usage: python tools/skew_bench.py [mult ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from parallel_svms_spark.operators.partitioning import salted_join

HOT_KEY = 1_000_000_007


def main() -> int:
    mults = [int(a) for a in sys.argv[1:]] or [10, 100]
    out_md = str(Path(__file__).resolve().parent.parent / "SKEW.md")
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    import stress as stress_mod
    dim = (spark.range(2_000_000)
           .select(F.col("id").alias("k"),
                   (F.col("id") % 7).alias("grp"),
                   F.md5(F.col("id").cast("string")).alias("pad"))
           .unionByName(spark.createDataFrame(
               [(HOT_KEY, HOT_KEY % 7, "hot")], "k long, grp long, pad string"))
           .localCheckpoint())
    dim.count()

    def make_fact(mult):
        li_path, _ = stress_mod.build_warehouse(spark, mult)
        li = spark.read.parquet(li_path)
        # deterministic 50% remap to one hot key (even orderkeys → hot)
        f = li.select(
            F.when(F.col("l_orderkey") % 2 == 0, F.lit(HOT_KEY))
             .otherwise(F.col("l_orderkey")).alias("k"),
            "l_partkey", "l_extendedprice").localCheckpoint()
        return f, f.count()

    def agg_of(joined):
        return (joined.groupBy("grp")
                .agg(F.count("*").alias("n"),
                     F.sum(F.floor(F.col("l_extendedprice") * 100))
                     .cast("long").alias("cents")))

    def run(fact, label, skew_flag, salted):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
                       "true" if skew_flag else "false")
        if salted:
            j = salted_join(fact, dim, "k", n_salt=32, row_col="l_partkey")
        else:
            j = fact.join(dim.hint("shuffle_hash"), "k")
        out = agg_of(j)
        t0 = time.monotonic()
        rows = {tuple(r) for r in out.collect()}
        dt = time.monotonic() - t0
        print(f"  {label}: {dt:.2f}s", file=sys.stderr)
        return dt, rows

    tables = []
    for mult in mults:
        print(f"-- mult {mult}", file=sys.stderr)
        fact, n_fact = make_fact(mult)
        t_aqe, r_aqe = run(fact, "plain + AQE skew handling", True, False)
        t_naive, r_naive = run(fact, "plain, AQE skew off", False, False)
        t_salt, r_salt = run(fact, "salted_join n_salt=32", False, True)
        assert r_aqe == r_naive == r_salt, "variants disagree — bug"
        tables.append((mult, n_fact, t_aqe, t_naive, t_salt))
        fact.unpersist()

    lines = [
        "# SKEW — measured skew-join mitigation",
        "",
        "`python tools/skew_bench.py`: one join+aggregate on a fact",
        "with 50% of rows remapped to a single hot key, joined to a",
        "2M-row dim (beyond broadcast threshold). All variants",
        "asserted value-identical before timing. local[32], 64 shuffle",
        "partitions.",
        "",
        "| fact rows | plain+AQE-skew | plain, skew off | salted n=32 |",
        "|---|---|---|---|",
    ]
    for mult, n_fact, t_aqe, t_naive, t_salt in tables:
        lines.append(f"| {n_fact:,} (×{mult}) | {t_aqe:.2f} | "
                     f"{t_naive:.2f} | {t_salt:.2f} |")
    lines += [
        "",
        "Reading — what the numbers actually say: AQE's runtime skew",
        "split is the right DEFAULT — at 60M rows it split the hot",
        "partition and beat everything (it even beats the naive join's",
        "own small-scale time: the split parallelizes the probe). The",
        "naive join degrades linearly with the hot task, as expected.",
        "And `salted_join` LOST at both scales HERE because its fixed",
        "cost — replicating the 2M-row dim 32× — dwarfs what the hot",
        "task saves; with a dim this large, salting is the wrong tool.",
        "Its regime is narrow and real: a dim small enough that",
        "n_salt× replication is cheap but too big (or too",
        "non-equi/opaque) to broadcast, or skewed AGGREGATIONS where",
        "there is no dim at all (salt → partial agg → final agg).",
        "The engine's defaults follow the measurement: AQE skew",
        "handling stays on everywhere, and salted_join is an opt-in",
        "operator with its applicability documented, not a blanket",
        "rewrite.",
    ]
    Path(out_md).write_text("\n".join(lines) + "\n")
    print(f"wrote {out_md}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
