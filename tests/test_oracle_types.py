"""Type-level oracle audit: DuckDB arrow types vs Spark result types.

Why this exists: the driver's value-hash compares typed Arrow values,
so a DuckDB HUGEINT (surfacing as ``decimal128(38,0)``) against a
Spark ``bigint`` hash-mismatches even when every logical value is
identical.  Python-level compares (``Decimal(2) == 2`` is True, and
their hashes agree) make this class INVISIBLE to tools/selfcheck.py
and tests/test_oracles_all.py — exactly how the uncast
window-``SUM`` in ``_INTERVAL_JOIN_ORACLE`` survived five rounds
before the driver flagged it (CORRECTNESS_r05, sole red row).

This test closes the class: for every oracled qkey in the FULL
per-operator registry it executes the oracle with ``LIMIT 0`` (DuckDB
types are static, so a zero-row fetch carries the same schema as the
driver's full run) via ``.arrow()``, takes the Spark query's analyzed
schema (lazy — no collect), and asserts family-level compatibility
per column.  A DuckDB decimal column where Spark emits an integer or
floating type is a hard failure.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pytest
from pyspark.sql import types as T

import __spark_entry__ as em
from parallel_svms_spark.io.sources import TABLES

SF = "/root/testdata/sf0.001"

# covered by test_training_goldens / envelopes; no oracle entries anyway
SKIP = {"svm_train", "svm_linear_ovr", "cascade_svm", "bagging_svm",
        "iterative_svm"}


def _compatible(stype: T.DataType, atype: pa.DataType) -> bool:
    if isinstance(stype, (T.LongType, T.IntegerType, T.ShortType,
                          T.ByteType)):
        return pa.types.is_integer(atype)
    if isinstance(stype, (T.DoubleType, T.FloatType)):
        return pa.types.is_floating(atype)
    if isinstance(stype, T.DecimalType):
        return pa.types.is_decimal(atype)
    if isinstance(stype, T.StringType):
        return pa.types.is_string(atype) or pa.types.is_large_string(atype)
    if isinstance(stype, T.BooleanType):
        return pa.types.is_boolean(atype)
    if isinstance(stype, (T.TimestampType, T.TimestampNTZType)):
        return pa.types.is_timestamp(atype)
    if isinstance(stype, T.DateType):
        return pa.types.is_date(atype)
    if isinstance(stype, T.BinaryType):
        return pa.types.is_binary(atype) or pa.types.is_large_binary(atype)
    if isinstance(stype, T.ArrayType):
        if not (pa.types.is_list(atype) or pa.types.is_large_list(atype)):
            return False
        return _compatible(stype.elementType, atype.value_type)
    return True  # map/struct/unmodeled: out of scope for this audit


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    yield con
    con.close()


_ORACLES = None


def _oracles():
    # oracle construction reads parquet and retrains IVF/PQ models
    # (~0.75 s per full render) — build the dict ONCE for the whole
    # parametrized module instead of once per test (review r6 finding)
    global _ORACLES
    if _ORACLES is None:
        os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", SF)
        _ORACLES = em.oracle_sql_all()
    return _ORACLES


def _oracled_qkeys():
    return sorted(k for k in _oracles() if k not in SKIP)


@pytest.mark.parametrize("qkey", _oracled_qkeys())
def test_oracle_arrow_types_match_spark(spark, duck, qkey):
    sql = _oracles()[qkey]
    atbl = duck.execute(f"SELECT * FROM ({sql}) AS _t LIMIT 0").arrow()
    sschema = em.queries_all()[qkey](spark, SF).schema
    spark.catalog.clearCache()
    sfields = {f.name: f.dataType for f in sschema.fields}
    afields = {f.name: f.type for f in atbl.schema}
    assert sorted(sfields) == sorted(afields), (sorted(sfields),
                                                sorted(afields))
    bad = [(name, str(sfields[name]), str(afields[name]))
           for name in sfields if not _compatible(sfields[name],
                                                  afields[name])]
    assert not bad, f"driver-hash-unsafe oracle column types: {bad}"
