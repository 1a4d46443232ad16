"""Privacy / governance operators.

The reference has no governance surface at all — its records carry
bare numeric ids end-to-end (cascade_svm/Precascade1.java:27 keys
records by raw class/row ids). A training-data pipeline at corpus
scale cannot ship raw identifiers into a lake that outlives consent:
the standard mitigation (GDPR pseudonymisation, Art. 4(5)) is a
keyed one-way token per identifier.

``pseudonymize`` replaces identifier columns with
``md5(salt || ':' || value)``:

* deterministic — equal values map to equal tokens under the same
  salt, so joins, group-bys, sessionization, and dedup keep working
  on the tokenized tables (the property naive redaction destroys);
* one-way — recovering the raw id needs the salt AND a dictionary
  attack over the id space; rotating the salt severs linkability
  between releases;
* NULL-transparent — NULL in, NULL out (concat and md5 are both
  null-propagating in Spark and DuckDB, so the oracle shares the
  semantics for free).

Scale shape: a pure codegen'd projection — zero exchange, zero state,
zero Python; the scan stays whole-stage-compiled, so tokenizing a
100 TB table costs exactly one read+write pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pseudonymize(df: DataFrame, cols: list[str],
                 salt: str = "s") -> DataFrame:
    """Replace each column in ``cols`` with its salted md5 token
    (lowercase hex string). Non-string columns are cast to their
    canonical decimal string first, so the token is stable across the
    column's physical type (int32 vs int64 ingests tokenize alike)."""
    out = df
    for c in cols:
        out = out.withColumn(
            c, F.md5(F.concat(F.lit(f"{salt}:"), F.col(c).cast("string"))))
    return out
