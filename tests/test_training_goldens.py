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
