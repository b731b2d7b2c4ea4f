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


def test_t15_passage_dedup_planted(spark, tmp_path):
    """First-occurrence-wins at chunk granularity: a chunk shared with
    an earlier doc is cut, a doc that is a full duplicate empties out,
    sub-chunk-length docs pass through."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans.queries_text import (
        q_passage_dedup,
    )

    head = "a b c d e f g h"           # one full chunk, shared
    docs = [
        (0, f"{head} x1 x2 x3", "en", "s", 0),
        (1, f"{head} y1 y2 y3 y4", "en", "s", 0),   # loses the head
        (2, "short text only", "en", "s", 0),        # < 8 words: kept
        (3, f"{head} x1 x2 x3", "en", "s", 0),       # full dup: empties
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in q_passage_dedup(spark, str(tmp_path)).collect()
    }
    assert got[0]["text_dedup"] == f"{head} x1 x2 x3"
    assert got[0]["removed_chunks"] == 0
    assert got[1]["text_dedup"] == "y1 y2 y3 y4"
    assert got[1]["kept_chunks"] == 1 and got[1]["removed_chunks"] == 1
    assert got[2]["text_dedup"] == "short text only"
    assert got[3]["text_dedup"] == "" and got[3]["kept_chunks"] == 0
    assert got[3]["removed_chunks"] == 2


def test_v10_kmeans_empty_cluster_guard(spark, tmp_path):
    """All-identical vectors: every point ties to cluster 0 (struct
    tie-break on smallest cid), clusters 1..7 lose all members, and the
    guard must keep their previous centroids instead of KeyError-ing.
    Result: one cluster, zero inertia."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans.queries_vectors import (
        q_kmeans_ivf_training,
    )

    vec = [float(i % 5) / 10.0 for i in range(64)]
    rows = [(i, vec, 0) for i in range(10)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    got = q_kmeans_ivf_training(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["cluster_id"] == 0 and r["size"] == 10
    assert r["min_vec_id"] == 0 and r["inertia"] == 0
