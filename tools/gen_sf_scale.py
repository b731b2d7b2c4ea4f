"""Scale the synthetic benchmark tables Nx for scale-proofing runs.

The committed testdata tops out at sf0.1; VERDICT r2 asks for a one-off
sf1 bench to catch skew/buffer cliffs that sf0.1 hides.  This scales a
source SF directory by unioning N key-shifted copies of every FACT
table (dimension tables region/nation keep TPC-H semantics: fixed size
at every SF, so foreign keys into them are left untouched); foreign
keys BETWEEN scaled tables shift by the same per-family stride, so the
ID-keyed join graph of each copy is a disjoint replica of the source.

CONTENT columns are perturbed per copy, not replicated verbatim:
replicated text/embeddings would give every fingerprint exactly N
artificial duplicates, grow every shingle/LSH posting list Nx (so
candidate pairs grow N^2 and df-capped groups silently leave the
workload), and fill ANN top-k with exact ties -- i.e. the scaled run
would measure a different workload than a real Nx corpus.  Copy i>0
appends a copy-marker token to ``documents.text`` (fingerprints become
distinct; only the trailing shingles change) and offsets one embedding
dimension by i*1e-3 (cosine neighborhoods keep their structure without
exact-tie duplication).  Events keep their timestamps: 10x event
density in the same time range is what 10x traffic looks like.

Usage: python tools/gen_sf_scale.py [src_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# key column -> stride family; every column in a family shifts by the
# same stride (copy_index * (max(family base key) + 1)).
FACT_KEYS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
FAMILY_BASE = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
DIMS = ["region", "nation"]


# Bump whenever scale_dir/plant_skew generation logic changes: bench.py
# writes this into its /tmp cache markers so a logic change invalidates
# previously-generated derived datasets instead of silently re-timing
# stale data.
GEN_VERSION = 3


def scale_dir(spark, src: str, dst: str, factor: int = 10) -> None:
    """Scale every benchmark table from ``src`` into ``dst`` by
    ``factor`` using the key-shift + content-perturb scheme documented
    in the module docstring.  Reusable from bench.py's sf1 block with
    the caller's session."""
    from pyspark.sql import functions as F

    os.makedirs(dst, exist_ok=True)

    strides = {}
    for fam, (tbl, col) in FAMILY_BASE.items():
        mx = (
            spark.read.parquet(f"{src}/{tbl}.parquet")
            .agg(F.max(col))
            .collect()[0][0]
        )
        strides[fam] = int(mx) + 1

    for t in DIMS:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        # stderr: bench.py's caller contract is ONE JSON line on stdout.
        print(f"{t}: copied (dimension)", file=sys.stderr)

    for t, keys in FACT_KEYS.items():
        base = spark.read.parquet(f"{src}/{t}.parquet")
        copies = []
        for i in range(factor):
            c = base
            for col, fam in keys.items():
                c = c.withColumn(
                    col, (F.col(col) + F.lit(i * strides[fam])).cast(base.schema[col].dataType)
                )
            if i > 0 and t == "documents":
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" copymark{i}"))
                ).withColumn("n_chars", F.length("text"))
            if i > 0 and t == "embeddings":
                elem_t = base.schema["embedding"].dataType.elementType.simpleString()
                c = c.withColumn(
                    "embedding",
                    F.concat(
                        F.array(
                            (F.get("embedding", 0) + F.lit(i * 1e-3)).cast(elem_t)
                        ),
                        F.slice("embedding", 2, 10_000),
                    ),
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"{t}: {n} rows ({factor}x)", file=sys.stderr)


# Ten common words: every 3-gram shingle inside the phrase lands in
# EVERY planted document, i.e. shingle df == n hot docs -- the
# stopword-trigram hot key that breaks naive shingle self-joins.
SKEW_PHRASE = "the of and to in is it for on as"


def plant_skew(
    spark,
    src: str,
    dst: str,
    hot_docs: int = 10_000,
    hot_fanout: int = 10_000,
    hot_events: int = 10_000,
) -> int:
    """Copy an SF directory and plant three adversarial hot keys:

    * ``documents`` gains ``hot_docs`` rows sharing a 10-stopword
      phrase, so each in-phrase 3-gram shingle has df == hot_docs --
      far past queries_dedup.PAIR_DF_CAP.  Uncapped pair generation
      would emit ~hot_docs^2/2 = 5e7 candidate pairs PER SHINGLE; the
      df-cap must drop these groups identically in Spark and DuckDB
      (oracle-green on the skewed dir proves the cap semantics match).
      A unique suffix keeps the planted docs from being exact dups, so
      dd1's groups stay small and only the shingle path is stressed.
    * ``lineitem`` gains ``hot_fanout`` rows all referencing ONE part,
      so m3's inverted index sees a posting list hot_fanout deep (its
      output slices to 100; refer_count carries the full cardinality)
      and j4/salted joins see a skewed build side.
    * ``events`` gains ``hot_events`` rows for ONE user (user_id
      777777, one event per minute, clicks with a purchase every 3rd),
      the window-skew case: a plain per-user window (aj1) serializes
      all hot_events rows in one task's sort, while the time-bucketed
      strategy (aj3) spreads them one-bucket-per-task.  Deterministic
      (ts/type/value derived from the row index) so both engines see
      identical data.

    Returns the hot l_partkey (useful for asserting the planted shape).
    """
    from pyspark.sql import functions as F

    os.makedirs(dst, exist_ok=True)
    passthrough = [
        t
        for t in (DIMS + list(FACT_KEYS))
        if t not in ("documents", "lineitem", "events")
    ]
    for t in passthrough:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )

    docs = spark.read.parquet(f"{src}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0]
    planted_docs = spark.range(hot_docs).select(
        (F.col("id") + F.lit(int(max_doc) + 1)).alias("doc_id"),
        F.concat(F.lit(SKEW_PHRASE + " uniq"), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("skew_plant").alias("source"),
    ).withColumn("n_chars", F.length("text"))
    docs.unionByName(planted_docs.select(docs.columns)).write.mode(
        "overwrite"
    ).parquet(f"{dst}/documents.parquet")

    li = spark.read.parquet(f"{src}/lineitem.parquet")
    hot_part = li.agg(F.min("l_partkey")).collect()[0][0]
    n_li = li.count()
    n_rep = (hot_fanout + n_li - 1) // n_li
    planted_li = (
        li.crossJoin(spark.range(n_rep).select(F.col("id").alias("_rep")))
        .limit(hot_fanout)
        .drop("_rep")
        .withColumn("l_partkey", F.lit(hot_part).cast(li.schema["l_partkey"].dataType))
    )
    li.unionByName(planted_li).write.mode("overwrite").parquet(
        f"{dst}/lineitem.parquet"
    )

    ev = spark.read.parquet(f"{src}/events.parquet")
    max_ev = ev.agg(F.max("event_id")).collect()[0][0]
    planted_ev = spark.range(hot_events).select(
        (F.col("id") + F.lit(int(max_ev) + 1)).alias("event_id"),
        (
            F.to_timestamp(F.lit("2024-01-05 00:00:00"))
            + F.make_interval(mins=F.col("id").cast("int"))
        ).alias("ts"),
        F.lit(777_777).alias("user_id"),
        F.when(F.col("id") % 3 == 0, F.lit("purchase"))
        .otherwise(F.lit("click"))
        .alias("event_type"),
        ((F.col("id") % 100) / F.lit(100.0) + F.lit(1.0)).alias("value"),
        F.lit("{}").alias("props"),
    )
    ev.unionByName(planted_ev.select(ev.columns)).write.mode(
        "overwrite"
    ).parquet(f"{dst}/events.parquet")
    return int(hot_part)


# Exactly PASSAGE_WORDS (8) words, none from the synthetic doc vocab:
# the corpus-wide boilerplate chunk for t15's skew adversary.
HOT_CHUNK = "copyright notice all rights reserved visit official site"


def plant_hot_chunk(spark, src: str, dst: str) -> int:
    """t15's skew adversary: stamp ONE fixed 8-word boilerplate chunk
    (HOT_CHUNK) at the HEAD of every document's text.  The prefix is
    exactly PASSAGE_WORDS words, so every original chunk boundary
    shifts by one whole chunk and stays aligned -- the plant adds one
    corpus-wide duplicate chunk (count == n_docs) without otherwise
    perturbing the chunking.  This is the classic passage-dedup hot
    key (site boilerplate repeated on every page); t15's min-struct
    map-side combine must keep the wall flat vs the unskewed corpus,
    where a window-sort or join-back shape would serialize n_docs rows
    through one key.  Only ``documents.parquet`` is written (t15 reads
    nothing else).  Returns the doc count."""
    from pyspark.sql import functions as F

    assert len(HOT_CHUNK.split()) == 8
    os.makedirs(dst, exist_ok=True)
    docs = spark.read.parquet(f"{src}/documents.parquet")
    planted = docs.withColumn(
        "text",
        F.when(
            F.length(F.col("text")) > 0,
            F.concat(F.lit(HOT_CHUNK + " "), F.col("text")),
        ).otherwise(F.lit(HOT_CHUNK)),
    ).withColumn("n_chars", F.length("text"))
    planted.select(docs.columns).write.mode("overwrite").parquet(
        f"{dst}/documents.parquet"
    )
    return docs.count()


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.session import get_spark

    spark = get_spark(app_name="gen_sf_scale")
    scale_dir(spark, src, dst, factor)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
