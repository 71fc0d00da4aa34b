"""PII detection / redaction expressions -- all native ``regexp_*``
column expressions (JVM codegen, no Python UDFs), so a 100 TB redaction
pass stays a single narrow scan-project stage with full pushdown.

A training-data pipeline needs these on the hot ingest path: find
emails / phone numbers / IPv4 addresses, extract the pieces it keys on
(email domain), and rewrite the text with typed placeholders.  Patterns
stay inside the RE2-compatible subset (no lookaround, no backrefs) so
the DuckDB oracle (RE2) and Spark (java.util.regex) agree byte-for-byte.

The reference has no PII handling at all -- its only text rewriting is
CSV-safety comma mangling (reference etl/transform.py:176-177); this is
a Ring C extension.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# RE2-safe patterns (also valid Java regex with identical semantics).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
EMAIL_DOMAIN_RE = "[A-Za-z0-9._%+-]+@([A-Za-z0-9.-]+\\.[A-Za-z]{2,})"
PHONE_RE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
IPV4_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


def find_emails(text: Column) -> Column:
    """All email matches, in order (group 0 = whole match)."""
    return F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0))


def email_domain(text: Column) -> Column:
    """Domain of the first email found, '' when none."""
    return F.regexp_extract(text, EMAIL_DOMAIN_RE, 1)


def has_phone(text: Column) -> Column:
    return text.rlike(PHONE_RE)


def has_ipv4(text: Column) -> Column:
    return text.rlike(IPV4_RE)


def redact_pii(text: Column) -> Column:
    """Replace every email, then phone, then IPv4 with a typed
    placeholder.  Email first: its pattern can contain digits/dots that
    the narrower patterns would otherwise shred mid-match."""
    out = F.regexp_replace(text, EMAIL_RE, "[EMAIL]")
    out = F.regexp_replace(out, PHONE_RE, "[PHONE]")
    return F.regexp_replace(out, IPV4_RE, "[IP]")


# DuckDB fragments kept in lock-step with the Spark expressions above
# (same source-of-truth constants; DuckDB needs the explicit 'g' flag
# where Spark's regexp_replace is global by default).
def duck_find_emails(col: str) -> str:
    return f"regexp_extract_all({col}, '{EMAIL_RE}', 0)"


def duck_email_domain(col: str) -> str:
    return f"regexp_extract({col}, '{EMAIL_DOMAIN_RE}', 1)"


def duck_has_phone(col: str) -> str:
    return f"regexp_matches({col}, '{PHONE_RE}')"


def duck_has_ipv4(col: str) -> str:
    return f"regexp_matches({col}, '{IPV4_RE}')"


def duck_redact_pii(col: str) -> str:
    return (
        "regexp_replace(regexp_replace(regexp_replace("
        f"{col}, '{EMAIL_RE}', '[EMAIL]', 'g'), "
        f"'{PHONE_RE}', '[PHONE]', 'g'), "
        f"'{IPV4_RE}', '[IP]', 'g')"
    )
