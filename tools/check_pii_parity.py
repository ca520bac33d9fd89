#!/usr/bin/env python3
"""Cross-engine parity gate for text_pii's POSITIVE path.

The shipped corpus is digit-free, so the driver's DuckDB oracle compare
exercises only the all-zeros path of text_pii — a Java-regex/RE2 counting
divergence on real PII text would be invisible to it. This gate runs the
same synthetic documents TextAnalysisSpec asserts Spark-side through
DuckDB's RE2 `regexp_extract_all` and checks the counts match the shared
expectations. Patterns must stay byte-identical to TextAnalysis.scala.
"""
import duckdb
import sys

EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
SSN = r"\b\d{3}-\d{2}-\d{4}\b"
PHONE = r"\d{3}[- ]\d{3}[- ]\d{4}"

# (text, (n_email, n_ipv4, n_ssn, n_phone)) — the values TextAnalysisSpec
# asserts for the SPARK side on the same documents
CASES = [
    ("contact alice@example.com or bob.smith+tag@mail.co today", (2, 0, 0, 0)),
    ("server at 10.0.0.1 and 192.168.001.255 responded", (0, 2, 0, 0)),
    ("ssn 123-45-6789 phone 555-123-4567 and 555 987 6543", (0, 0, 1, 2)),
    ("nothing sensitive here at all", (0, 0, 0, 0)),
]

# (text, redacted) — the strings TextAnalysisSpec asserts for the SPARK
# side of text_pii_redact on the same documents (same replacement order:
# email, ipv4, ssn, phone)
REDACT_CASES = [
    ("contact alice@example.com or bob.smith+tag@mail.co today",
     "contact [EMAIL] or [EMAIL] today"),
    ("server at 10.0.0.1 and 192.168.001.255 responded",
     "server at [IPV4] and [IPV4] responded"),
    ("ssn 123-45-6789 phone 555-123-4567 and 555 987 6543",
     "ssn [SSN] phone [PHONE] and [PHONE]"),
    ("nothing sensitive here at all", "nothing sensitive here at all"),
]


def main():
    con = duckdb.connect()
    bad = []
    for text, want in CASES:
        got = con.execute(
            "SELECT len(regexp_extract_all(?, ?)), len(regexp_extract_all(?, ?)),"
            " len(regexp_extract_all(?, ?)), len(regexp_extract_all(?, ?))",
            [text, EMAIL, text, IPV4, text, SSN, text, PHONE]).fetchone()
        if tuple(got) != want:
            bad.append((text, want, tuple(got)))
    for text, want in REDACT_CASES:
        got = con.execute(
            "SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace(?,"
            " ?, '[EMAIL]', 'g'), ?, '[IPV4]', 'g'), ?, '[SSN]', 'g'), ?, '[PHONE]', 'g')",
            [text, EMAIL, IPV4, SSN, PHONE]).fetchone()[0]
        if got != want:
            bad.append((text, want, got))
    if bad:
        for text, want, got in bad:
            print(f"MISMATCH {text!r}: spark-spec {want!r} vs duckdb {got!r}")
        sys.exit(1)
    print(f"pii parity: all {len(CASES)} count cases and {len(REDACT_CASES)} "
          "redaction cases match DuckDB")

if __name__ == "__main__":
    main()
