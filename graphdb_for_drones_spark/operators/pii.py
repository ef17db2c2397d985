"""PII detection / redaction for training-data pipelines — pure codegen
regex expressions (``regexp_count`` / ``regexp_replace``, JVM-side), the
scrub pass a corpus runs before text reaches a tokenizer.

Patterns are RE2-compatible (no lookarounds/backrefs) so the DuckDB
oracle twin evaluates the SAME pattern text: engine and oracle agree
match-for-match, making redaction counts hash-checkable.

At 100 TB this is a map-only projection — no shuffle, no Python; a scan
with a redaction column appended.  Detection counts aggregate with
map-side combine like any other integer rollup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# detector name -> RE2-safe regex (same string passed to Spark and the
# SQL twin).  `entity_id` matches the synthetic corpus's Customer#…/
# Supplier#… identifiers — the pseudonymization target in this dataset;
# the rest are the standard scrub set, exercised on planted fixtures in
# tests.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{2,3}-\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "entity_id": r"(Customer|Supplier)#\d+",
}


def pii_count(col: Column, kind: str) -> Column:
    """Match count for one detector (long)."""
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind])).cast("long")


def mask_pii(col: Column, kinds: tuple[str, ...] | None = None,
             replacement: str = "[PII]") -> Column:
    """Redact every match of the selected detectors (all by default).
    Chained ``regexp_replace`` — one codegen projection, applied in the
    deterministic PII_PATTERNS order so overlapping matches resolve
    identically everywhere."""
    out = col
    for kind in kinds if kinds is not None else tuple(PII_PATTERNS):
        out = F.regexp_replace(out, PII_PATTERNS[kind], replacement)
    return out


def pii_stats(
    df: DataFrame,
    text_col: str,
    group_col: str,
    kinds: tuple[str, ...] | None = None,
    sample_mask_kinds: tuple[str, ...] | None = None,
) -> DataFrame:
    """Per-group redaction report: row count, per-detector match totals,
    and rows touched by any detector — the audit table a scrub run
    emits.  Integer counts only (engine-hash-stable).

    ``sample_mask_kinds`` adds a ``masked_sample`` column (the MIN of
    the masked text under those detectors) inside the SAME aggregation,
    so auditing the redaction output costs no second corpus scan."""
    kinds = kinds if kinds is not None else tuple(PII_PATTERNS)
    cols = [
        F.col(group_col),
        *[pii_count(F.col(text_col), k).alias(f"__c_{k}") for k in kinds],
    ]
    if sample_mask_kinds is not None:
        cols.append(
            mask_pii(F.col(text_col), sample_mask_kinds).alias("__masked")
        )
    staged = df.select(*cols)
    any_hit = None
    for k in kinds:
        c = F.col(f"__c_{k}") > 0
        any_hit = c if any_hit is None else (any_hit | c)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(f"__c_{k}").alias(f"n_{k}") for k in kinds],
        F.sum(any_hit.cast("long")).alias("n_rows_with_pii"),
    ]
    if sample_mask_kinds is not None:
        aggs.append(F.min("__masked").alias("masked_sample"))
    return staged.groupBy(group_col).agg(*aggs)
