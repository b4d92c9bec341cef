"""PII detection + redaction as pure codegen'd SQL expressions.

The canonical pre-training scrub (Dolma / RefinedWeb / FineWeb all ship
one): find emails, phone numbers, and IPv4 addresses in document text
and replace them with typed placeholder tokens.  Everything here is
`regexp_count` / `regexp_replace` on the JVM — no UDF, no shuffle; the
operator is embarrassingly map-parallel and whole-stage-codegen'd, which
is exactly what you want for a full-corpus rewrite at 100 TB.

Regex notes: the patterns are restricted to the lookahead-free subset
shared by Java regex (Spark) and RE2 (the DuckDB oracle) — character
classes, bounded repetition, and ASCII word boundaries only — so the
oracle replays the identical redaction byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

EMAIL_TOK = "<EMAIL>"
PHONE_TOK = "<PHONE>"
IPV4_TOK = "<IP>"


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ipv4) occurrence counts."""
    return (F.regexp_count(text, F.lit(EMAIL_RE)),
            F.regexp_count(text, F.lit(PHONE_RE)),
            F.regexp_count(text, F.lit(IPV4_RE)))


def redact(text: Column) -> Column:
    """Replace every email, then phone, then IPv4 with its placeholder.

    Order matters: the email pattern consumes its dotted domain before
    the IPv4 pattern could half-match digit-dot runs inside it.
    """
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TOK)
    out = F.regexp_replace(out, PHONE_RE, PHONE_TOK)
    return F.regexp_replace(out, IPV4_RE, IPV4_TOK)


def sql_pii_exprs(text_expr: str) -> dict[str, str]:
    """DuckDB twins (RE2): counts via len(regexp_extract_all), redaction
    via regexp_replace(..., 'g') — Spark's regexp_replace is global by
    default, DuckDB's needs the flag."""
    def esc(p: str) -> str:
        return p.replace("'", "''")
    red = (f"regexp_replace(regexp_replace(regexp_replace({text_expr}, "
           f"'{esc(EMAIL_RE)}', '{EMAIL_TOK}', 'g'), "
           f"'{esc(PHONE_RE)}', '{PHONE_TOK}', 'g'), "
           f"'{esc(IPV4_RE)}', '{IPV4_TOK}', 'g')")
    return {
        "n_emails": f"len(regexp_extract_all({text_expr}, '{esc(EMAIL_RE)}'))",
        "n_phones": f"len(regexp_extract_all({text_expr}, '{esc(PHONE_RE)}'))",
        "n_ipv4": f"len(regexp_extract_all({text_expr}, '{esc(IPV4_RE)}'))",
        "redacted": red,
    }
