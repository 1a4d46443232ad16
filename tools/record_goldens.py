"""Record (and stability-check) golden outputs for the qkeys whose
oracles are constant-literal VALUES tables rendered from committed
goldens: the five SVM training dataflows and the sketch profile.

Why goldens are legitimate oracles here: the training dataflows are
iterative SMO / hinge-loss solvers (non-SQL-expressible) and the
sketch profile is HLL++ / t-digest estimation (engine-specific), but
BOTH are DETERMINISTIC functions of the input multiset — seeded
solvers with mergesort-stable row ordering; HLL register maxima and
t-digest merges over a fixed partitioning. So the strongest honest
oracle is the pinned output itself, provided determinism is verified
ACROSS INDEPENDENT SESSIONS, which is exactly what this tool does:
every recording runs the qkey in ``--runs`` (default 2) fresh
subprocess SparkSessions and refuses to write a golden whose runs
disagree.

Usage:
    python tools/record_goldens.py sf0.01 [sf0.1 ...] [--runs 2]
        [--only qkey,qkey]

Writes tests/goldens/training_qkeys_<sf>.json (five ML qkeys),
tests/goldens/sketch_profile_<sf>.json and
tests/goldens/compression_profile_<sf>.json (zlib is a pure function
of the bytes, so its rollup is golden-eligible too) and
tests/goldens/tokenize_bpe_<sf>.json (deterministic greedy BPE over an
md5-ordered sample). Only rewrite after an
INTENDED numerics change; tests/test_training_goldens.py pins the
committed values in CI.
"""
from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

ML_QKEYS = ["svm_train", "svm_linear_ovr", "cascade_svm", "bagging_svm",
            "iterative_svm", "quality_classifier",
            "pipeline_model_curate"]

_CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
import __spark_entry__ as em
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
out = {{}}
for qkey in {qkeys!r}:
    df = em.queries_all()[qkey](spark, {sf_dir!r})
    cols = sorted(df.columns)
    rows = sorted([r[c] for c in cols] for r in df.collect())
    out[qkey] = {{"columns": cols, "rows": rows}}
print("GOLDEN_JSON:" + json.dumps(out, sort_keys=True))
"""


def run_once(sf_dir: str, qkeys: list[str]) -> dict:
    code = _CHILD.format(repo=str(REPO), qkeys=qkeys, sf_dir=sf_dir)
    res = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=1800)
    for line in res.stdout.splitlines():
        if line.startswith("GOLDEN_JSON:"):
            return json.loads(line[len("GOLDEN_JSON:"):])
    raise RuntimeError(
        f"no golden output for {sf_dir}:\n{res.stdout[-2000:]}\n"
        f"{res.stderr[-2000:]}")


def main() -> int:
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_names", nargs="+", help="e.g. sf0.01 sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--only", type=lambda s: set(s.split(",")),
                    default=None)
    ns = ap.parse_args()
    runs, only = ns.runs, ns.only
    for sf_name in ns.sf_names:
        sf_dir = f"/root/testdata/{sf_name}"
        qkeys = ML_QKEYS + ["sketch_profile", "compression_profile",
                            "tokenize_bpe", "bpe_encode"]
        if only:
            unknown = only - set(qkeys)
            if unknown:
                print(f"unknown --only qkeys: {sorted(unknown)}")
                return 2
            qkeys = [q for q in qkeys if q in only]
        results = [run_once(sf_dir, qkeys) for _ in range(runs)]
        for r in results[1:]:
            if r != results[0]:
                diff = {q for q in results[0]
                        if results[0][q] != r[q]}
                print(f"UNSTABLE at {sf_name}: {sorted(diff)} — "
                      "refusing to write goldens")
                return 1
        got = results[0]

        def merge_write(path: Path, update: dict) -> None:
            # MERGE into any existing golden: a partial --only refresh
            # must never drop the other members' pinned values (review
            # r6 finding — a subset write would silently erase the
            # rest and collapse the suite oracle)
            data = json.loads(path.read_text()) if path.exists() else {}
            data.update(update)
            path.write_text(json.dumps(data, indent=4, sort_keys=True)
                            + "\n")
            print(f"wrote {path} ({runs} stable runs, "
                  f"{sorted(update)} updated, {len(data)} total)")

        ml = {q: got[q] for q in qkeys if q in ML_QKEYS}
        if ml:
            merge_write(REPO / "tests" / "goldens"
                        / f"training_qkeys_{sf_name}.json", ml)
        if "sketch_profile" in got:
            merge_write(REPO / "tests" / "goldens"
                        / f"sketch_profile_{sf_name}.json",
                        {"sketch_profile": got["sketch_profile"]})
        if "compression_profile" in got:
            merge_write(REPO / "tests" / "goldens"
                        / f"compression_profile_{sf_name}.json",
                        {"compression_profile": got["compression_profile"]})
        if "tokenize_bpe" in got:
            merge_write(REPO / "tests" / "goldens"
                        / f"tokenize_bpe_{sf_name}.json",
                        {"tokenize_bpe": got["tokenize_bpe"]})
        if "bpe_encode" in got:
            merge_write(REPO / "tests" / "goldens"
                        / f"bpe_encode_{sf_name}.json",
                        {"bpe_encode": got["bpe_encode"]})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
