"""Timestamp-encoding robustness for the events family (VERDICT r3 #7).

Round 3 broke because the fixture's ``events.ts`` is parquet
``timestamp[us]`` with no timezone — Spark 4 reads that as
TIMESTAMP_NTZ, which ``unix_millis``/``unix_micros`` reject — and
``load_table`` only normalized the legacy nanos-as-long layout. This
test writes the same events in BOTH encodings (naive µs and
UTC-adjusted µs) and asserts every event operator runs on each and
produces identical values, so the next Spark parquet-inference flip
cannot silently re-break the family.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parallel_svms_spark.io.sources import load_table
from parallel_svms_spark.operators import events as E


def _events_arrays():
    t0 = datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for user in (1, 2):
        for mins in (0, 5, 10, 75, 80, 200):
            etype = "error" if eid % 3 == 0 else "click"
            rows.append((eid, t0 + timedelta(minutes=mins, seconds=user),
                         user, etype, float(eid) / 4, '{"k": %d}' % (eid % 7)))
            eid += 1
    cols = list(zip(*rows))
    return {
        "event_id": pa.array(cols[0], pa.int64()),
        "user_id": pa.array(cols[2], pa.int64()),
        "event_type": pa.array(cols[3], pa.string()),
        "value": pa.array(cols[4], pa.float64()),
        "props": pa.array(cols[5], pa.string()),
    }, list(cols[1])


def _write_events(path: str, ts_type: pa.DataType) -> None:
    named, ts = _events_arrays()
    table = pa.table({
        "event_id": named["event_id"],
        "ts": pa.array(ts, ts_type),
        "user_id": named["user_id"],
        "event_type": named["event_type"],
        "value": named["value"],
        "props": named["props"],
    })
    pq.write_table(table, path)


OPERATORS = {
    "json_extract": E.json_extract,
    "window_tumbling": E.window_tumbling,
    "window_hopping": E.window_hopping,
    "session_stats": E.session_stats,
    "asof_prev_event": E.asof_prev_event,
}


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("ts_enc")
    variants = {
        "ntz": pa.timestamp("us"),            # what the fixtures ship
        "utc": pa.timestamp("us", tz="UTC"),  # tz-adjusted twin
    }
    dirs = {}
    for name, ts_type in variants.items():
        d = base / name
        d.mkdir()
        _write_events(str(d / "events.parquet"), ts_type)
        dirs[name] = str(d)
    return dirs


@pytest.mark.parametrize("op_name", sorted(OPERATORS))
def test_event_operators_encoding_invariant(spark, encoded_dirs, op_name):
    op = OPERATORS[op_name]
    results = {}
    for variant, d in encoded_dirs.items():
        df = load_table(spark, d, "events")
        # the loader must always hand operators a plain TIMESTAMP
        assert dict(df.dtypes)["ts"] == "timestamp", variant
        out = op(df)
        results[variant] = sorted(map(tuple, out.collect()))
        assert results[variant], f"{op_name} empty on {variant}"
    assert results["ntz"] == results["utc"]


def test_fixture_events_load_as_timestamp(spark, sf_dir):
    # the real fixture, not a synthetic twin: ts must arrive usable
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert E.session_stats(df).count() > 0
