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


def k_anonymity_risk(df: DataFrame, quasi_cols: list[str],
                     k: int = 5) -> DataFrame:
    """Re-identification risk screen: the quasi-identifier value
    combinations shared by FEWER than ``k`` rows (Sweeney's
    k-anonymity criterion, Int. J. Unc. Fuzz. 2002). Rows in these
    groups are linkable through their quasi-identifiers even after
    direct ids are pseudonymized — the screen a release pipeline runs
    to decide what to generalize or suppress.

    Scale shape: one map-side-combinable group-by; output is bounded
    by the number of distinct quasi-identifier combinations below the
    threshold, never by corpus size."""
    return (df.groupBy(*quasi_cols)
            .agg(F.count("*").alias("group_size"))
            .filter(F.col("group_size") < int(k)))


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
