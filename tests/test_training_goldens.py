"""Golden-value regression for the five rows-only training qkeys
(VERDICT r2 #4): they are legitimately non-SQL (SMO / hinge-loss
training), but their outputs are deterministic — seeded solvers,
mergesort-stable row ordering, fixed fixture — verified byte-stable
across independent SparkSessions when the goldens were generated. A
regression in solver numerics now fails HERE naming the qkey, instead
of passing the driver's weaker rows-only check silently.

Regenerate (only after an INTENDED numerics change) by running each
queries()[name] at sf0.01 and rewriting the JSON — see
tests/goldens/training_qkeys_sf0.01.json.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

import __spark_entry__ as entrymod

GOLDEN = json.loads(
    (Path(__file__).parent / "goldens" / "training_qkeys_sf0.01.json")
    .read_text())
SF_001 = "/root/testdata/sf0.01"


@pytest.mark.parametrize("qkey", sorted(GOLDEN))
def test_training_qkey_matches_golden(spark, qkey):
    df = entrymod.queries_all()[qkey](spark, SF_001)
    cols = sorted(df.columns)
    assert cols == GOLDEN[qkey]["columns"]
    rows = sorted([r[c] for c in cols] for r in df.collect())
    want = [tuple(r) for r in GOLDEN[qkey]["rows"]]
    assert [tuple(r) for r in rows] == want


# DuckDB arrow type each declared cast must surface as — anything
# else (esp. decimal128) would hash-diverge at the driver even with
# equal logical values (the r5 interval_join lesson).
_ARROW_OF = {"INTEGER": "int32", "BIGINT": "int64", "DOUBLE": "double"}


def test_ml_golden_oracles_values_and_types(monkeypatch):
    """The driver-facing golden-literal oracles (r6: ml_suite's hash
    path) must reproduce the committed golden values byte-for-byte
    with hash-safe NATIVE types, and must only exist for sfs that
    have a committed golden."""
    import duckdb

    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", SF_001)
    oracles = entrymod._ml_golden_oracles()
    assert sorted(oracles) == sorted(GOLDEN)
    con = duckdb.connect()
    arrow_of = dict(_ARROW_OF, VARCHAR="string")
    for qkey, sql in oracles.items():
        tbl = con.execute(sql).arrow()
        types = entrymod._ML_GOLDEN_TYPES[qkey]
        for f in tbl.schema:
            assert str(f.type) == arrow_of[types[f.name]], (qkey, f)
        cols = GOLDEN[qkey]["columns"]
        got = sorted(tuple(r[c] for c in cols) for r in tbl.to_pylist())
        assert got == sorted(tuple(r) for r in GOLDEN[qkey]["rows"]), qkey
    con.close()
    # an sf with no committed golden → the ML qkeys must stay
    # rows-only there, never guess (goldens now exist for all three
    # fixture sfs, so probe a nonexistent one)
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf9")
    assert entrymod._ml_golden_oracles() == {}


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_sketch_golden_oracle_types(monkeypatch, sf):
    """The sketch_profile golden oracles (r6) carry hash-safe native
    arrow types at every recorded sf — counts as int64, rounded
    percentiles as float64, never DECIMAL. (Value agreement with the
    live Spark result is covered by tests/test_oracles_all.py at
    sf0.001 and selfcheck at the larger sfs.)"""
    import duckdb

    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", f"/root/testdata/{sf}")
    oracles = entrymod._sketch_golden_oracles()
    assert sorted(oracles) == ["sketch_profile"]
    con = duckdb.connect()
    tbl = con.execute(oracles["sketch_profile"]).arrow()
    types = entrymod._SKETCH_GOLDEN_TYPES["sketch_profile"]
    for f in tbl.schema:
        assert str(f.type) == _ARROW_OF[types[f.name]], (sf, f)
    assert tbl.num_rows == 1
    con.close()


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_compression_golden_oracle_types(monkeypatch, sf):
    """compression_profile golden oracles (r6): integer rollup columns
    surface as int64, the source as string — never DECIMAL. Value
    agreement with live Spark is covered by tests/test_oracles_all.py
    (sf0.001) and selfcheck at the larger sfs; per-doc zlib parity by
    tests/test_pipeline_ops_r6.py."""
    import duckdb

    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", f"/root/testdata/{sf}")
    oracles = entrymod._compression_golden_oracles()
    assert sorted(oracles) == ["compression_profile"]
    con = duckdb.connect()
    tbl = con.execute(oracles["compression_profile"]).arrow()
    types = entrymod._COMPRESSION_GOLDEN_TYPES["compression_profile"]
    arrow_of = dict(_ARROW_OF, VARCHAR="string")
    for f in tbl.schema:
        assert str(f.type) == arrow_of[types[f.name]], (sf, f)
    assert tbl.num_rows >= 1
    con.close()


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_bpe_golden_oracle_types(monkeypatch, sf):
    """tokenize_bpe golden oracles (r7): the integer rollup columns
    surface as int64, source as string — never DECIMAL. Value
    agreement with live Spark: tests/test_oracles_all.py (sf0.001) +
    selfcheck at the larger sfs; encode-vs-serial-BPE parity:
    tests/test_bpe.py."""
    import duckdb

    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", f"/root/testdata/{sf}")
    oracles = entrymod._bpe_golden_oracles()
    assert sorted(oracles) == ["bpe_encode", "tokenize_bpe"]
    con = duckdb.connect()
    arrow_of = dict(_ARROW_OF, VARCHAR="string")
    all_types = dict(entrymod._BPE_GOLDEN_TYPES,
                     **entrymod._BPE_ENCODE_GOLDEN_TYPES)
    for qkey in ("tokenize_bpe", "bpe_encode"):
        tbl = con.execute(oracles[qkey]).arrow()
        types = all_types[qkey]
        for f in tbl.schema:
            assert str(f.type) == arrow_of[types[f.name]], (sf, qkey, f)
        assert tbl.num_rows >= 1
    con.close()
