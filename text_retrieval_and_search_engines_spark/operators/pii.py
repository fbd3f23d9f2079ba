"""PII detection + redaction for webtext curation pipelines.

Training-data pipelines over Common-Crawl-style corpora routinely strip
personally identifiable information before anything else touches the text
(the reference repo's corpus prep stops at HTML->text extraction,
final-project/src/data_loader.py; this engine adds the curation stage a
100 TB deployment needs). Everything here is pure JVM column expressions
(``regexp_count`` / ``regexp_replace`` inside whole-stage codegen): per-doc,
zero-shuffle, pipelines with the parquet scan exactly like the
textstats feature operators, and SQL-twinnable for the DuckDB oracle.

Pattern notes: every regex is written in the Java-regex ∩ RE2 common
subset (no backrefs, no lookaround) so the Spark plan and the DuckDB twin
compile the same automaton. Categories may overlap on pathological text
(each count is independent); redaction applies them in a pinned order
(email, credit_card, ssn, phone, ipv4) so the output text is
deterministic.

Known miss / false-positive classes (ADVICE r4 — these are heuristic,
SQL-twinnable patterns by design, not an NER system):
* phone MISSES: bare space-separated digit triples ("555 123 4567"
  without parens or a +CC prefix — accepting them false-positives on
  number runs in prose like "100 200 3000"), compact international
  ("+15551234567"), non-NANP groupings ("+44 20 7946 0958").
* ssn MISSES: bare 9-digit runs ("123456789" — too collision-prone with
  order ids/zip+4/phone fragments to redact safely).
* ipv4 FALSE-POSITIVES: dotted version strings whose fields are valid
  octets ("release 1.2.3.4" redacts); octet values are bounds-checked
  (0-255), so "999.999.999.999" no longer matches.
* credit_card: 16-digit shapes in 4-4-4-4 or contiguous form; no Luhn
  check (not expressible in the regex subset), so random 16-digit runs
  false-positive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Pinned (name, pattern, placeholder) triples — ORDER IS THE REDACTION ORDER.
# credit_card before ssn/phone (longest digit shape first); ssn before
# phone: all are digit-dash shapes and redaction must not let a later
# pattern see a placeholder's surroundings differently across engines.
_OCTET = r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("credit_card", r"\b\d{4}(?:[- ]?\d{4}){3}\b", "<CC>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # three shapes: (555) 123-4567 / (555)123 4567 [optional +CC],
    # +1 555 123 4567 (spaces need the +CC or parens anchor — see module
    # docstring), and the classic dash/dot 555-123-4567 / 800.555.1212
    ("phone", r"(?:\+\d{1,2}[-. ])?\(\d{3}\)[-. ]?\d{3}[-. ]\d{4}\b"
              r"|(?:\+\d{1,2}[-. ])\d{3}[-. ]\d{3}[-. ]\d{4}\b"
              r"|\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", rf"\b(?:{_OCTET}\.){{3}}{_OCTET}\b", "<IP>"),
)


def pii_features(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 keep: tuple[str, ...] = ()) -> DataFrame:
    """Per-doc PII match counts + a 0/1 ``has_pii`` flag.

    One ``regexp_count`` per category over the raw text — a narrow map
    stage with no Exchange (pinned by tests/test_pii_decontam.py); at 100 TB this
    fuses into the corpus scan. ``keep`` passes input columns through so
    the stage chains into curation DAGs without a doc_id re-join
    (same contract as textstats.quality_features)."""
    from ..functions.partitioning import ensure_min_partitions
    docs = ensure_min_partitions(docs)
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    total = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in keep],
        *counts,
    ).withColumn("has_pii", (total > 0).cast("int"))


def pii_redact(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               keep: tuple[str, ...] = ()) -> DataFrame:
    """Replace every PII match with its placeholder token, in the pinned
    PII_PATTERNS order. Narrow map (chained ``regexp_replace``); output
    column ``redacted``. Deterministic: global replace, leftmost-first,
    same automaton in Spark and the DuckDB twin."""
    out = F.col(text_col)
    for _, pat, placeholder in PII_PATTERNS:
        out = F.regexp_replace(out, pat, placeholder)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in keep],
        out.alias("redacted"),
    )


def pii_sql_exprs(text_expr: str = "text") -> dict[str, str]:
    """DuckDB twins: {n_<name>: count_expr, redacted: replace_expr}.
    RE2 needs the same escapes; patterns are already in the common subset."""
    exprs: dict[str, str] = {}
    for name, pat, _ in PII_PATTERNS:
        lit = pat.replace("'", "''")
        exprs[f"n_{name}"] = (
            f"len(regexp_extract_all({text_expr}, '{lit}'))")
    red = text_expr
    for _, pat, placeholder in PII_PATTERNS:
        lit = pat.replace("'", "''")
        red = f"regexp_replace({red}, '{lit}', '{placeholder}', 'g')"
    exprs["redacted"] = red
    return exprs
