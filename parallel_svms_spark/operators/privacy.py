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


# Default PII rule chain: (name, pattern, replacement), applied IN
# ORDER — specific shapes (email/ip/phone) before the generic digit-run
# catch-all, so an already-masked phone's digits are not re-counted by
# ``idnum``. Patterns stay inside the regex subset that Java
# (java.util.regex, Spark's engine) and RE2 (DuckDB's engine) define
# identically: literal classes, bounded repeats, non-capturing groups,
# anchors/\b — no backreferences, no lookaround.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9]{2,3}(?:[- ][0-9]{3,4}){2,3}", "<PHONE>"),
    ("idnum", r"[0-9]{6,}", "<ID>"),
]


def _redact_chain(col, rules) -> tuple:
    """(redacted Column, total-match-count Column) after applying the
    rule chain in order, counting each rule's hits on the text AS THE
    EARLIER RULES LEFT IT (sequential semantics — a digit run inside a
    already-replaced <PHONE> is gone, not double-counted)."""
    cur = col
    n = F.lit(0).cast("long")
    for _name, pat, rep in rules:
        n = n + F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).cast("long")
        cur = F.regexp_replace(cur, pat, rep)
    return cur, n


def redact_pii(df: DataFrame, cols: list[str],
               rules: list[tuple[str, str, str]] | None = None,
               count_col: str = "n_redacted") -> DataFrame:
    """Destructive PII redaction: replace e-mail addresses, IPv4
    addresses, phone-shaped numbers, and long digit runs (account /
    national-id shapes) in each text column with typed placeholders,
    and report the per-row replacement count in ``count_col``.

    This is the release-time complement to ``pseudonymize``:
    pseudonymization keeps joinability for identifier COLUMNS; free
    text needs in-place destruction because identifiers hide mid-
    string where no column-level token can reach (the standard corpus
    step publicly described for C4/ROOTS-style releases).

    Scale shape: a pure codegen'd projection — the regex chain runs
    inside whole-stage codegen on the JVM, zero exchange, zero Python,
    zero state; redacting a 100 TB corpus is one read+write pass. The
    same Column expression serves the streaming twin verbatim
    (stateless, like ``clean_text_col``). NULL in, NULL out (regexp
    functions are null-propagating in Spark and DuckDB; the count for
    a NULL value is 0, not NULL, so downstream sums stay usable).
    """
    rules = PII_RULES if rules is None else rules
    # ONE select, so every expression binds to the INPUT columns — a
    # withColumn chain would re-resolve the count against the already-
    # redacted text and always report 0
    repl = {}
    total = F.lit(0).cast("long")
    for c in cols:
        red, n = _redact_chain(F.col(c), rules)
        repl[c] = red
        total = total + F.coalesce(n, F.lit(0))
    out_cols = [repl[c].alias(c) if c in repl else F.col(c)
                for c in df.columns]
    return df.select(*out_cols, total.alias(count_col))


def pii_audit(df: DataFrame, cols: list[str],
              rules: list[tuple[str, str, str]] | None = None) -> DataFrame:
    """Pre-release PII exposure report: per (column, rule), how many
    matches exist corpus-wide and how many rows carry at least one —
    the number a data-protection review reads before ``redact_pii``
    rewrites anything. Rules with zero hits are reported too (the
    absence-of-PII claim is the point of the audit).

    Sequential-count semantics match ``redact_pii`` exactly: rule k is
    counted on the text with rules 1..k-1 already applied, so audit
    totals equal what redaction will actually replace.

    Scale shape: one map-side-combinable aggregation per column stack
    — counts partial-aggregate inside the scan; output is exactly
    |cols| × |rules| rows, never corpus-sized.
    """
    rules = PII_RULES if rules is None else rules
    aggs = []
    for ci, c in enumerate(cols):
        cur = F.col(c)
        for name, pat, rep in rules:
            hits = F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
            aggs.append(F.sum(F.coalesce(hits.cast("long"), F.lit(0)))
                        .alias(f"__m_{ci}_{name}"))
            aggs.append(F.sum(F.when(hits > 0, 1).otherwise(0))
                        .cast("long").alias(f"__r_{ci}_{name}"))
            cur = F.regexp_replace(cur, pat, rep)
    # ONE aggregation pass over the table for every (column, rule)
    # cell; the wide 1-row result is unpivoted with a single
    # explode(array(struct...)) — a union of per-cell selects would
    # make Catalyst re-plan the aggregation (and re-scan the table)
    # once per branch
    wide = df.agg(*aggs)
    cells = []
    for ci, c in enumerate(cols):
        for name, _pat, _rep in rules:
            cells.append(F.struct(
                F.lit(c).alias("col_name"), F.lit(name).alias("rule"),
                F.col(f"__m_{ci}_{name}").alias("n_matches"),
                F.col(f"__r_{ci}_{name}").alias("n_rows_affected")))
    return (wide.select(F.explode(F.array(*cells)).alias("cell"))
            .select("cell.*"))


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
