"""PII / secret redaction — regex-class scrubbing for training corpora.

Beyond the reference (which has no text layer; driver-brief pipeline
extension): before text reaches a training mix, emails, addresses, phone
numbers and credential-shaped strings must be stripped and COUNTED (the
counts drive source-level audits). Four default classes, each a single
regex kept deliberately inside the common Java-regex ∩ RE2 subset (no
lookaround, no backrefs, leftmost-first alternation-free), so the exact
same pattern text runs in Spark (JVM codegen'd ``regexp_replace`` /
``regexp_extract_all``) and the DuckDB oracle:

  email   user@host.tld mailbox shapes
  ipv4    dotted quads (syntactic — no range check, like public scrubbers)
  phone   international-prefix shapes ``+C[C] GGG GGGG GGGG`` with
          ``-``/``.``/space separators (narrow on purpose: a bare-digit-run
          matcher redacts every timestamp and id in a web corpus; the
          class list is a config surface, swap in locale packs at deploy)
  key     credential-shaped tokens: ≥32-char base64-alphabet runs
          (API keys, tokens, hashes) with optional ``=`` padding

Scale shape: pure per-row Catalyst string expressions — whole-stage
codegen, zero shuffle, zero UDFs; counting rides the same scan as the
replacement. Replacements apply in a fixed class order (email → key →
ipv4 → phone) so engines agree on nested shapes; counts are taken per
class on the ORIGINAL text (audit semantics: a doc is 'contains email'
regardless of what another class consumed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# class order matters: it is the replacement order (documented above)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # no trailing \b: '=' padding is a non-word char, so a boundary there
    # would only match before ANOTHER word char — padded keys at end-of-
    # sentence would silently survive
    "key": r"\b[A-Za-z0-9+/]{32,}={0,2}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+[0-9]{1,2}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{3,4}\b",
}


def _token(cls: str) -> str:
    return f"<{cls.upper()}>"


def pii_counts(text: Column) -> list[Column]:
    """One count column per class (on the given text as-is)."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).alias(f"n_{cls}")
        for cls, pat in PII_PATTERNS.items()
    ]


def redact(text: Column) -> Column:
    """Apply every class replacement in the fixed order."""
    out = text
    for cls, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, _token(cls))
    return out


def pii_scrub(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, redacted, n_email, n_key, n_ipv4, n_phone)."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"), redact(t).alias("redacted"), *pii_counts(t)
    )


def pii_scrub_sql_exprs() -> tuple[str, list[str]]:
    """The DuckDB-side mirror: (redacted_expr, [count_exprs]) over a column
    named ``text`` — kept HERE so the patterns can never drift from the
    Spark side. DuckDB's regexp_replace is single-occurrence by default →
    the 'g' flag; Spark's is always global."""
    red = "text"
    for cls, pat in PII_PATTERNS.items():
        red = f"regexp_replace({red}, '{pat}', '{_token(cls)}', 'g')"
    counts = [
        f"len(regexp_extract_all(text, '{pat}'))::BIGINT AS n_{cls}"
        for cls, pat in PII_PATTERNS.items()
    ]
    return red, counts
