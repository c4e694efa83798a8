"""PII redaction for pretraining curation: scrub emails, IPv4
addresses, and phone numbers from document text before it enters a
training mix. Every pattern is written in the regex subset whose
semantics are identical in Java regex (Spark) and RE2 (DuckDB), so
the whole op — match counts AND the redacted text itself — is
cross-engine oracle-able (the driver entry pins the redacted text via
md5, not just the counts).

All pure `regexp_replace` / `regexp_extract_all` expressions: no UDF,
no shuffle, whole-stage-codegen friendly — a single projection that
scales to any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: email first (an address can embed digit runs an IP/phone
# pattern would chew on), then IP, then phone. Kept to the
# Java-regex ∩ RE2 subset: char classes, bounded repeats, \b, \d —
# no lookarounds, no backrefs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,2}[ -]\d{3}[ -]\d{3}[ -]\d{4}", "<PHONE>"),
]


def redact_pii(text: Column | str) -> Column:
    """Replace every PII match with its placeholder. Replacement is
    sequential in PII_PATTERNS order on both engines (Spark
    regexp_replace is global by default; the oracle uses the 'g'
    flag), so results are bit-identical."""
    t = F.col(text) if isinstance(text, str) else text
    for _, pat, repl in PII_PATTERNS:
        t = F.regexp_replace(t, pat, repl)
    return t


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind match counts (n_email, n_ip, n_phone) — the audit
    trail a curation run reports alongside the scrub. Counted on the
    RAW text (before any replacement), in the same order-independent
    way on both engines."""
    t = F.col(text) if isinstance(text, str) else text
    return {
        f"n_{name}": F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        for name, pat, _ in PII_PATTERNS
    }


def redact_documents(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """The pipeline verb: (id, n_email, n_ip, n_phone, redacted).
    One projection, no shuffle; columns beyond (id, text) are pruned
    at the scan."""
    counts = pii_counts(text_col)
    return docs.select(
        F.col(id_col),
        *[c.alias(n) for n, c in counts.items()],
        redact_pii(text_col).alias("redacted"),
    )
