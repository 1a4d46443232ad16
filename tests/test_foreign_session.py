"""Driver-session compatibility guard: the graft driver imports
__spark_entry__ into ITS OWN plain SparkSession (none of session.py's
configs). Round 3 died on exactly this gap — the events family worked
under our session and crashed under the driver's. This test spawns a
subprocess with a bare local[4] session and drives the
timestamp-sensitive and config-sensitive qkeys end-to-end there.
Subprocess because a second, differently-configured SparkSession
cannot coexist with the suite's session in one JVM.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

SCRIPT = textwrap.dedent("""
    import sys
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[4]")
             .appName("foreign").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    q = e.queries_all()
    sf = "/root/testdata/sf0.001"
    # the r3 breakage class: every operator that does timestamp
    # arithmetic, plus one from each runtime-conf-sensitive family
    for k in ("sessionize", "asof_join", "window_tumbling",
              "gap_fill_daily", "event_transitions", "interval_join",
              "daily_revenue_window", "parse_sparse", "length_profile"):
        n = q[k](spark, sf).count()
        assert n >= 0, k
        print("ok", k, n, flush=True)
    # the driver-facing curated surface: suite construction must also
    # survive a bare session (unions of per-member digest rows)
    qc = e.queries()
    for k in ("window_suite", "event_suite", "text_stats_suite"):
        n = qc[k](spark, sf).count()
        assert n == len(dict(e._SUITES)[k]), k
        print("ok", k, n, flush=True)
    df = e.entry(spark)
    assert len(df.collect()) > 0
    print("ok entry", flush=True)
""")

# r6: the golden-literal oracles (training dataflows + sketch) assert
# EXACT value reproduction at the driver, so the values must be
# invariant to the driver's unknown session config — default shuffle
# partitions (200 here vs our 32), no UTC pin, different parallelism.
# This re-derives every sf0.01 golden under the bare session and
# compares byte-for-byte.
GOLDEN_SCRIPT = textwrap.dedent("""
    import json, sys
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[32]")
             .appName("foreign-goldens").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    golden = json.load(open("/root/repo/tests/goldens/training_qkeys_sf0.01.json"))
    golden.update(json.load(
        open("/root/repo/tests/goldens/sketch_profile_sf0.01.json")))
    q = e.queries_all()
    for qkey, g in sorted(golden.items()):
        df = q[qkey](spark, "/root/testdata/sf0.01")
        cols = sorted(df.columns)
        rows = sorted([r[c] for c in cols] for r in df.collect())
        assert cols == g["columns"], qkey
        assert [list(r) for r in rows] == [list(r) for r in g["rows"]], qkey
        print("ok", qkey, flush=True)
    print("ok goldens", flush=True)
""")


def test_qkeys_run_in_plain_driver_session():
    proc = subprocess.run([sys.executable, "-c", SCRIPT],
                          capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ok entry" in proc.stdout


def test_goldens_reproduce_in_plain_driver_session():
    proc = subprocess.run([sys.executable, "-c", GOLDEN_SCRIPT],
                          capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ok goldens" in proc.stdout
