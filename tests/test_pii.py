"""PII gate-surface tests (operators/text.py redact_pii, gates
pii_scan / pii_redact): pattern semantics pinned on crafted strings
and the engine-portability contract (Java∩RE2 dialect) checked against
DuckDB directly — the property the oracle md5 hash-match depends on.
Complements test_ext_operators.py::test_redact_pii_patterns_and_counts
(mask text + counts)."""

from __future__ import annotations

import duckdb

from flyq_spark.operators.text import PII_PATTERNS, redact_pii

CASES = [
    # (text, n_email, n_ssn, n_phone, n_ipv4)
    ("reach me at jane.doe+spam@mail.example.org today", 1, 0, 0, 0),
    ("ssn 123-45-6789 and phone 555-123-4567", 0, 1, 1, 0),
    ("server 192.168.1.254 and 10.0.0.1 respond", 0, 0, 0, 2),
    ("no pii here, just words and 12345 numbers", 0, 0, 0, 0),
    ("two mails a@b.co c@d.io one ip 8.8.8.8", 2, 0, 0, 1),
    # dashed-number disambiguation: 3-2-4 is SSN, 3-3-4 is phone
    ("123-45-6789 123-456-7890", 0, 1, 1, 0),
    # version strings are NOT IPv4 (need exactly 4 octets at \b)
    ("v1.2.3 release", 0, 0, 0, 0),
    # the richer phone forms: parenthesized area code, +1 prefix, dots
    ("call (212) 555-0123 or +1 555.123.4567", 0, 0, 2, 0),
    ("dial 1-800-555-0199 for support", 0, 0, 1, 0),
]


def test_scan_counts_pinned(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(CASES)], "id long, text string"
    )
    got = {
        r["id"]: (r["n_email"], r["n_ssn"], r["n_phone"], r["n_ipv4"])
        for r in redact_pii(df).collect()
    }
    for i, (_, ne, ns, np_, ni) in enumerate(CASES):
        assert got[i] == (ne, ns, np_, ni), CASES[i][0]


def test_patterns_portable_to_duckdb(spark):
    """Every pattern must count identically in DuckDB (RE2) — the
    property the gate's cross-engine hash-match rests on, covering
    alternation preference and optional-group greed, not just the
    simple classes."""
    con = duckdb.connect()
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(CASES)], "id long, text string"
    )
    spark_counts = {
        r["id"]: (r["n_email"], r["n_ssn"], r["n_phone"], r["n_ipv4"])
        for r in redact_pii(df).collect()
    }
    for i, (text, *_) in enumerate(CASES):
        duck = tuple(
            con.sql(
                "SELECT len(regexp_extract_all(?, ?))", params=[text, pat]
            ).fetchone()[0]
            for pat in PII_PATTERNS.values()
        )
        assert spark_counts[i] == duck, text


def test_redaction_text_portable_to_duckdb(spark):
    """regexp_replace parity on a string exercising every category —
    the masked TEXT (not just counts) must agree byte-for-byte, since
    the gate hashes it."""
    text = (
        "mail a@b.co ssn 123-45-6789 tel (212) 555-0123 "
        "alt +1 555.123.4567 ip 10.0.0.1 end"
    )
    df = spark.createDataFrame([(0, text)], "id long, text string")
    spark_red = redact_pii(df).collect()[0]["text"]
    con = duckdb.connect()
    duck_red = text
    for name, pat in PII_PATTERNS.items():
        duck_red = con.sql(
            "SELECT regexp_replace(?, ?, ?, 'g')",
            params=[duck_red, pat, f"[{name.upper()}]"],
        ).fetchone()[0]
    assert spark_red == duck_red
    assert spark_red == "mail [EMAIL] ssn [SSN] tel [PHONE] alt [PHONE] ip [IPV4] end"


def test_collocations_components_pinned(spark):
    """Tiny corpus with known pair/unigram counts: every PMI component
    exact, rank deterministic, min_count filter honored."""
    from flyq_spark.operators.text import collocations

    rows = [
        (1, "new york new york city"),
        (2, "new york is big"),
        (3, "big city life"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["w1"], r["w2"]): r.asDict()
        for r in collocations(df, min_count=2, k=10).collect()
    }
    ny = got[("new", "york")]
    # "new york" appears 3x (twice in doc 1, once in doc 2), 2 docs
    assert (ny["pair_n"], ny["n_docs"]) == (3, 2)
    assert (ny["w1_n"], ny["w2_n"]) == (3, 3)  # new x3, york x3
    # total pairs: doc1 has 4, doc2 3, doc3 2 = 9; tokens 5+4+3 = 12
    assert (ny["total_pairs"], ny["total_tokens"]) == (9, 12)
    assert ny["rank"] == 1
    # pairs below min_count=2 are absent
    assert ("city", "life") not in got
