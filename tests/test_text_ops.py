"""Unit tests for the text-curation operators added on top of the
reference surface: PII redaction (t9), unigram LM scoring (t11) and
BM25 retrieval (i1).  The oracle gate pins cross-engine equality; these
pin the local semantics on hand-written rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans.queries_text import (
    _BM25_TERMS,
    _EMAIL_PAT,
    _IP_PAT,
    _PHONE_PAT,
    _term_freq,
)
from tests.conftest import SF_SMOKE


def _redact(col):
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col, _EMAIL_PAT, "[EMAIL]"), _PHONE_PAT, "[PHONE]"
        ),
        _IP_PAT,
        "[IP]",
    )


def test_redaction_patterns_golden(spark):
    rows = [
        ("mail a.b-c_9@sub.example.org now", "mail [EMAIL] now"),
        ("call 555-123-4567 today", "call [PHONE] today"),
        ("host 10.0.255.7 down", "host [IP] down"),
        # versions and decimals must NOT be eaten by the IP pattern
        ("v1.2.3 and pi 3.14", "v1.2.3 and pi 3.14"),
        # a 9-digit id is not a phone
        ("id 123456789", "id 123456789"),
        ("plain text stays", "plain text stays"),
    ]
    df = spark.createDataFrame(rows, ["text", "want"]).select(
        "want", _redact(F.col("text")).alias("got")
    )
    bad = df.filter(F.col("got") != F.col("want")).collect()
    assert not bad, bad


def test_t9_redacts_every_planted_hit(spark):
    """Counts in the t9 output must equal the planted schedule: one
    email iff 7 | doc_id, one phone iff 5 | doc_id, one ip iff 11 |
    doc_id -- i.e. the regexes catch exactly what was planted and
    nothing from the base corpus."""
    import __spark_entry__ as ent

    out = ent.queries()["t9_pii_redaction"](spark, SF_SMOKE)
    bad = out.filter(
        (F.col("n_emails") != (F.col("doc_id") % 7 == 0).cast("int"))
        | (F.col("n_phones") != (F.col("doc_id") % 5 == 0).cast("int"))
        | (F.col("n_ips") != (F.col("doc_id") % 11 == 0).cast("int"))
    ).collect()
    assert not bad, bad[:5]


def test_term_freq_counts_occurrences(spark):
    df = spark.createDataFrame(
        [("spark merge spark window",), ("nothing here",)], ["text"]
    )
    toks = F.split(F.col("text"), " ")
    got = df.select(
        *[_term_freq(toks, t).alias(t) for t in _BM25_TERMS]
    ).collect()
    assert [r.asDict() for r in got] == [
        {"merge": 1.0, "spark": 2.0, "window": 1.0},
        {"merge": 0.0, "spark": 0.0, "window": 0.0},
    ]


def test_bm25_topk_is_deterministic_and_positive(spark):
    import __spark_entry__ as ent

    q = ent.queries()["i1_bm25_topk"]
    a = [tuple(r) for r in q(spark, SF_SMOKE).collect()]
    b = [tuple(r) for r in q(spark, SF_SMOKE).collect()]
    assert a == b
    assert len(a) == 10
    assert all(s > 0 for _, s in a)
    # descending by score, doc_id tiebreak
    assert a == sorted(a, key=lambda r: (-r[1], r[0]))
