"""PII scrubbing for web-scale training corpora: redact emails / IPv4
addresses (and count what was redacted, for corpus-quality dashboards).

All JVM column algebra — ``regexp_replace`` / ``regexp_extract_all``
compile into whole-stage codegen; no Python in the path.  Patterns stay
inside the regex subset that Java's engine and RE2 (DuckDB, Go tooling)
interpret identically — no backreferences, no lookaround — so redaction
is reproducible outside Spark (the DuckDB oracle runs the same patterns).

Scale shape: a narrow map over the text column; composes with the
extraction pipeline (scrub after extract, before dedup — redaction
placeholders are stable strings so they don't break minhash shingles
determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2- and Java-compatible (no backrefs/lookaround)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "scrubbed"
) -> DataFrame:
    """Replace emails and IPv4 literals with stable placeholder tokens and
    count the redactions per row.  Email redaction runs first so an IPv4
    lookalike inside an email's domain is counted once, as an email."""
    emails_removed = F.regexp_replace(F.col(text_col), EMAIL_RE, EMAIL_TOKEN)
    return df.withColumn(
        "n_emails", F.size(F.regexp_extract_all(F.col(text_col), F.lit(EMAIL_RE), 0))
    ).withColumn(
        "n_ipv4", F.size(F.regexp_extract_all(emails_removed, F.lit(IPV4_RE), 0))
    ).withColumn(
        out_col, F.regexp_replace(emails_removed, IPV4_RE, IP_TOKEN)
    )
