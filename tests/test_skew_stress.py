"""Skew stress past the pair-generation cap: plant a 2000-df stopword
phrase and a 2000-fanout referenced part (tools/gen_sf_scale.plant_skew)
and assert the df-capped dedup queries and the capped inverted index
stay EXACTLY oracle-equal on the skewed data -- i.e. the cap drops the
hot groups identically in Spark and DuckDB, and pair expansion stays
bounded (an uncapped dd2 would emit ~2e6 pairs per in-phrase shingle
and never return at corpus scale)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.check_oracle import value_hash  # noqa: E402


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    from tools.gen_sf_scale import plant_skew

    dst = str(tmp_path_factory.mktemp("skew") / "sf_skew")
    plant_skew(spark, "/root/testdata/sf0.001", dst, hot_docs=2000, hot_fanout=2000)
    return dst


@pytest.fixture(scope="module")
def oracle(skew_dir):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        # Spark writes each table as a directory of part files.
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{skew_dir}/{t}.parquet/*.parquet'"
        )
    return con


@pytest.mark.parametrize(
    "qname",
    ["dd1_exact_dedup", "dd2_ngram_jaccard_pairs", "dd3_minhash_lsh_pairs",
     "dd7_duplicate_clusters", "m3_ref_index_parts", "j4_most_referenced_parts",
     "aj1_asof_join", "aj3_asof_join_skewed",
     # Round 8: same hot-user / hot-phrase exposure as aj1 / dd2.
     "aj4_point_in_time_join", "m8_cdc_snapshot", "dd13_containment_pairs"],
)
def test_skewed_query_matches_oracle(spark, skew_dir, oracle, qname):
    import __spark_entry__ as ent

    sdf = ent.queries()[qname](spark, skew_dir)
    srows = [tuple(r) for r in sdf.collect()]
    res = oracle.execute(ent.oracle_sql()[qname])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows)
    assert sorted(sdf.columns) == sorted(dcols)
    assert value_hash(sdf.columns, srows) == value_hash(dcols, drows)


def test_planted_shape(spark, skew_dir):
    """The stress is real: in-phrase shingles exceed the cap by 30x and
    the hot part's posting list is 2000+ deep (output slice stays 100)."""
    from pyspark.sql import functions as F

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans.queries_dedup import (
        PAIR_DF_CAP,
    )

    docs = spark.read.parquet(f"{skew_dir}/documents.parquet")
    planted = docs.filter(F.col("source") == "skew_plant")
    assert planted.count() == 2000 > 30 * PAIR_DF_CAP

    import __spark_entry__ as ent

    m3 = ent.queries()["m3_ref_index_parts"](spark, skew_dir)
    hot = m3.orderBy(F.desc("refer_count")).first()
    assert hot["refer_count"] >= 2000

    # Window-skew plant: ONE user with 10^4 events (default hot_events),
    # the key a plain per-user window serializes onto a single task --
    # aj1 (plain) and aj3 (time-bucketed) must both stay oracle-equal
    # on it (parametrized test above).
    ev = spark.read.parquet(f"{skew_dir}/events.parquet")
    assert ev.filter(F.col("user_id") == 777_777).count() == 10_000
    assert len(hot["refers"].split("|")) == 100


@pytest.fixture(scope="module")
def hot_chunk_dir(spark, tmp_path_factory):
    from tools.gen_sf_scale import plant_hot_chunk

    dst = str(tmp_path_factory.mktemp("hotchunk") / "sf_hot")
    plant_hot_chunk(spark, "/root/testdata/sf0.001", dst)
    return dst


def test_t15_hot_chunk_oracle_equal_and_shape(spark, hot_chunk_dir):
    """Round-13 VERDICT #2: t15's skew-immunity claim under its OWN
    adversary -- one boilerplate chunk stamped at the head of every
    doc, so a single chunk text carries df == n_docs.  Pinned: (a)
    exact oracle equality on the planted corpus (the min-struct
    combine and DuckDB's min([doc_id, idx]) drop the duplicates
    identically), and (b) the planted shape resolved as passage dedup
    must: the chunk survives in exactly ONE doc (the lowest doc_id --
    every doc holds it at chunk_idx 0, so the min struct picks the min
    doc), and every other doc lost at least that chunk."""
    import duckdb

    import __spark_entry__ as ent
    from tools.gen_sf_scale import HOT_CHUNK

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{hot_chunk_dir}/documents.parquet/*.parquet'"
    )
    sdf = ent.queries()["t15_passage_dedup"](spark, hot_chunk_dir)
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(ent.oracle_sql()["t15_passage_dedup"])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows)
    assert sorted(sdf.columns) == sorted(dcols)
    assert value_hash(sdf.columns, srows) == value_hash(dcols, drows)

    rows = {r["doc_id"]: r for r in sdf.collect()}
    n = len(rows)
    assert n == 500
    keepers = [
        d for d, r in rows.items() if r["text_dedup"].startswith(HOT_CHUNK)
    ]
    assert keepers == [min(rows)]          # exactly one survivor: min doc
    assert all(HOT_CHUNK not in r["text_dedup"]
               for d, r in rows.items() if d != min(rows))
    # every non-winner doc lost at least its planted chunk
    assert all(r["removed_chunks"] >= 1
               for d, r in rows.items() if d != min(rows))
