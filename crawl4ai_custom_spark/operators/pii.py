"""PII redaction for training-data pipelines — all native Catalyst exprs.

A large-scale text pipeline must scrub personally identifiable information
before training. This operator redacts (and counts) the classic structured
PII families with a fixed, documented pattern order; every pattern is
RE2-compatible (no lookaround) so the DuckDB oracle runs the IDENTICAL
regexes (`q_pii_redact` — exact value oracle incl. md5 of redacted text).

Scale shape: one projection, zero shuffles, zero UDFs — whole-stage codegen
all the way; at 100 TB this is a pure map over the scan.

Reference note: crawl4ai has no PII scrubber; this belongs to the
training-data-pipeline axis of the brief (quality/compliance filtering).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (kind, pattern, replacement) — applied IN ORDER; order matters where
# families overlap textually: email before ip (hosts inside an address are
# consumed by the email rule), card before phone/ssn (grouped 16-digit
# runs must not be eaten 3-3-4 at a time), phone before ip (a dotted
# 3-3-4 inside a malformed 4-digit-octet "ip" is claimed as phone).
# Covered shapes per family (documented scope — NOT "all PII"):
#   email  user@host.tld
#   cc     16 digits, plain or 4-4-4-4 grouped by dash/space (shape only,
#          no Luhn check — RE2 has no way to validate checksums)
#   ssn    ddd-dd-dddd
#   phone  ddd-ddd-dddd, ddd.ddd.dddd, (ddd) ddd-dddd, +c[c] ddd ddd dddd
#   ip     dotted-quad IPv4 (IPv6 is out of scope)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9][A-Za-z0-9.-]*\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("cc", r"\b(?:\d{4}[- ]){3}\d{4}\b|\b\d{16}\b", "<CC>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone",
     r"\(\d{3}\)[-. ]?\d{3}[-. ]\d{4}"
     r"|\+\d{1,2}[-. ]?\d{3}[-. ]?\d{3}[-. ]?\d{4}"
     r"|\b\d{3}[-.]\d{3}[-.]\d{4}\b",
     "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_counts(text: Column, patterns=PII_PATTERNS) -> list[Column]:
    """One count column per PII family, measured BEFORE redaction on the
    progressively-redacted stream (so families consumed by an earlier rule —
    an IP inside an email — are not double-counted), mirroring redact order."""
    cols = []
    cur = text
    for kind, pat, rep in patterns:
        cols.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pat, rep)
    return cols


def redact_text(text: Column, patterns=PII_PATTERNS) -> Column:
    cur = text
    for _, pat, rep in patterns:
        cur = F.regexp_replace(cur, pat, rep)
    return cur


def redact_pii(docs: DataFrame, text_col: str = "text",
               patterns=PII_PATTERNS) -> DataFrame:
    """docs + per-family counts + `any_pii` flag + `<text_col>_redacted`."""
    text = F.col(text_col)
    counts = pii_counts(text, patterns)
    out = docs.select("*", *counts,
                      redact_text(text, patterns).alias(f"{text_col}_redacted"))
    total = None
    for kind, _, _ in patterns:
        c = F.col(f"n_{kind}")
        total = c if total is None else total + c
    return out.withColumn("any_pii", total > 0)
