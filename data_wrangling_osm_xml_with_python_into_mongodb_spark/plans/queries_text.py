"""Text-analysis queries over the documents table (training-data
pipeline surface: tokenization, quality scoring, language ID,
fingerprinting, cleaning-function parity on synthetic strings).

The reference's cleaning scalars (SURVEY.md §2.8 F1-F12) operate on
OSM tag strings; the same expression classes (regex split/replace,
case mapping, substring, list-ify, guarded casts) are exercised here
over ``documents.text`` / ``events.props`` so the DuckDB oracle can
gate them.  OSM-specific semantics are pinned by tests/test_cleaning.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions.hashing import md5_int64_sql
from .queries import _spread, _t, register


@register(
    "t1_token_stats",
    "Whitespace + BPE-ish tokenization with counts (token counting for "
    "training pipelines; reference split semantics F5, "
    "clean_and_write.py:168-179).",
    """
    SELECT doc_id,
           CAST(len(string_split(trim(text), ' ')) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(string_split(trim(text), ' '))) AS INTEGER)
             AS n_uniq_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
             AS INTEGER) AS n_bpe_tokens,
           round(n_chars::DOUBLE / len(string_split(trim(text), ' ')), 4)
             AS chars_per_token
    FROM documents
    """,
    tags=("text",),
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(_t(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.col("text")), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
        F.size(TX.bpe_like_tokens(F.col("text"))).alias("n_bpe_tokens"),
        F.round(F.col("n_chars").cast("double") / F.size(toks), 4).alias(
            "chars_per_token"
        ),
    )


@register(
    "t2_quality_scores",
    "Deterministic quality scoring: length/punctuation/diversity heuristic "
    "(training-data quality filter).",
    """
    SELECT doc_id,
           round(
             (CASE WHEN nt BETWEEN 5 AND 1000 THEN 1.0 ELSE 0.5 END) *
             (CASE WHEN punct / nc <= 0.2 THEN 1.0 ELSE 0.7 END) *
             (nu / nt), 4) AS quality
    FROM (
      SELECT doc_id,
             len(string_split(trim(text), ' '))::DOUBLE AS nt,
             len(list_distinct(string_split(trim(text), ' ')))::DOUBLE AS nu,
             length(text)::DOUBLE AS nc,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE AS punct
      FROM documents
    )
    """,
    tags=("text",),
)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(_t(spark, sf_dir, "documents"))
    return docs.select("doc_id", TX.quality_score(F.col("text")).alias("quality"))


def _langid_sql() -> str:
    hits = []
    for lang, words in TX.LANG_STOPWORDS.items():
        inlist = ", ".join(f"'{w}'" for w in words)
        hits.append(
            f"len(list_filter(toks, t -> t IN ({inlist}))) AS hits_{lang}"
        )
    hit_cols = ", ".join(hits)
    langs = list(TX.LANG_STOPWORDS)
    # argmax with fixed precedence order (first language wins ties).
    cond = "CASE "
    for lang in langs:
        others = [f"hits_{lang} >= hits_{o}" for o in langs if o != lang]
        cond += f"WHEN {' AND '.join(others)} THEN '{lang}' "
    cond += "ELSE 'und' END"
    return f"""
    SELECT lang_pred, count(*) AS n_docs
    FROM (
      SELECT {cond} AS lang_pred
      FROM (
        SELECT {hit_cols}
        FROM (SELECT string_split(trim(lower(text)), ' ') AS toks FROM documents)
      )
    )
    GROUP BY lang_pred
    """


@register(
    "t3_language_id",
    "Language identification via stopword-hit heuristic with fixed "
    "tie precedence (training-data langid stage).",
    _langid_sql(),
    tags=("text",),
)
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(_t(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.lower(F.col("text"))), " ")
    scored = docs.select(*[
        TX.stopword_hits(toks, words).alias(f"hits_{lang}")
        for lang, words in TX.LANG_STOPWORDS.items()
    ])
    langs = list(TX.LANG_STOPWORDS)
    pred = None
    for lang in langs:
        cond = None
        for o in langs:
            if o == lang:
                continue
            c = F.col(f"hits_{lang}") >= F.col(f"hits_{o}")
            cond = c if cond is None else (cond & c)
        pred = (
            F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
        )
    pred = pred.otherwise(F.lit("und"))
    return (
        scored.select(pred.alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "t4_fingerprints",
    "Portable md5 document fingerprint over normalized text "
    "(dedup/fingerprinting stage; normalization per reference F7 "
    "lower/collapse semantics, clean_and_write.py:195-227).",
    """
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM documents
    WHERE doc_id < 100
    """,
    tags=("text", "dedup"),
)
def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select("doc_id", TX.fingerprint(F.col("text")).alias("fingerprint"))


@register(
    "f7_string_cleaning",
    "Cleaning-scalar parity on synthetic strings: lower/snake-case, "
    "substring truncation, regex digit extraction + zero-pad formatting "
    "(reference F7 misc_val_edits / F1 phone-shaping classes, "
    "clean_and_write.py:97-111,195-227).",
    """
    SELECT doc_id,
           regexp_replace(lower(trim(source)), '\\s+', '_', 'g') AS snake_source,
           substr(lang, 1, 2) AS lang2,
           concat('+1-555-', lpad(regexp_extract(source, '([0-9]+)', 1), 4, '0'))
             AS formatted_code,
           CASE WHEN lower(lang) = 'en' THEN TRUE
                WHEN lower(lang) = 'zh' THEN FALSE
                ELSE NULL END AS is_en_bool
    FROM documents
    WHERE doc_id < 200
    """,
    tags=("text", "cleaning"),
)
def q_string_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select(
        "doc_id",
        F.regexp_replace(F.lower(F.trim(F.col("source"))), r"\s+", "_").alias(
            "snake_source"
        ),
        F.substring("lang", 1, 2).alias("lang2"),
        F.concat(
            F.lit("+1-555-"),
            F.lpad(F.regexp_extract("source", r"([0-9]+)", 1), 4, "0"),
        ).alias("formatted_code"),
        F.when(F.lower(F.col("lang")) == "en", F.lit(True))
        .when(F.lower(F.col("lang")) == "zh", F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
        .alias("is_en_bool"),
    )


def _phone_sql() -> str:
    """DuckDB mirror of functions/cleaning.py format_phone (reference F1,
    clean_and_write.py:97-111) over synthetic raw phone strings."""
    return r"""
    WITH raw AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN '(306) 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               WHEN 1 THEN '+1-360-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               WHEN 2 THEN '360-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                           || ' ext. 77'
               ELSE '1 (360) 555 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             END AS raw_phone
      FROM documents WHERE doc_id < 300
    ),
    d1 AS (SELECT doc_id, raw_phone,
                  regexp_replace(raw_phone, '[^0-9]', '', 'g') AS d FROM raw),
    d2 AS (SELECT doc_id, raw_phone,
                  CASE WHEN regexp_matches(d, '^1*306')
                       THEN regexp_replace(d, '^(1*)306', '\1360') ELSE d END AS d
           FROM d1),
    d3 AS (SELECT doc_id, raw_phone,
                  CASE WHEN d LIKE '1%' THEN d ELSE '1' || d END AS d FROM d2)
    SELECT doc_id, raw_phone,
           CASE WHEN regexp_matches(raw_phone, '^\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}$')
                THEN raw_phone
                ELSE '+' || substr(d, 1, 1) || '-' || substr(d, 2, 3) || '-'
                     || substr(d, 5, 3) || '-'
                     || CASE WHEN length(d) > 12
                             THEN substr(d, 8, 4) || ' x' || substr(d, 12)
                             ELSE substr(d, 8) END
           END AS phone
    FROM d3
    """


@register(
    "f1_phone_format",
    "Phone normalization to +1-AAA-NNN-NNNN[ xEXT] with the 306->360 "
    "area-code repair and extension splicing (reference F1 format_phone, "
    "clean_and_write.py:9-10,97-111), over deterministic synthetic raw "
    "strings; the oracle mirrors every step in SQL.",
    _phone_sql(),
    tags=("text", "cleaning"),
)
def q_phone_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import cleaning as C

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    num = F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
    raw = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("(306) 555-"), num))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("+1-360-555-"), num))
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("360-555-"), num, F.lit(" ext. 77")),
        )
        .otherwise(F.concat(F.lit("1 (360) 555 "), num))
    )
    return docs.select(
        "doc_id",
        raw.alias("raw_phone"),
        C.format_phone(raw).alias("phone"),
    )


def _street_sql() -> str:
    from ..functions.cleaning import STREET_TYPE_MAP

    types = ["Ave.", "St", "Rd", "Boulevard", "Hwy", "street"]
    type_case = (
        "CASE doc_id % 6 "
        + " ".join(f"WHEN {i} THEN '{t}'" for i, t in enumerate(types))
        + " END"
    )
    map_case = (
        "CASE last_tok "
        + " ".join(
            f"WHEN '{k}' THEN '{v}'"
            for k, v in STREET_TYPE_MAP.items()
            if "\\" not in k and "'" not in k
        )
        + " ELSE NULL END"
    )
    return f"""
    WITH raw AS (
      SELECT doc_id, 'North Garden ' || {type_case} AS street
      FROM documents WHERE doc_id < 240
    ),
    toks AS (
      SELECT doc_id, street,
             string_split(street, ' ')[-1] AS last_tok,
             array_to_string(string_split(street, ' ')[1:-2], ' ') AS head
      FROM raw
    )
    SELECT doc_id, street AS raw_street,
           CASE WHEN {map_case} IS NOT NULL
                THEN head || ' ' || {map_case}
                ELSE street END AS cleaned_street
    FROM toks
    """


@register(
    "f2_street_types",
    "Street-type suffix normalization through the literal mapping table "
    "(reference F2 clean_street_type, clean_and_write.py:66-77), over "
    "deterministic synthetic street strings.",
    _street_sql(),
    tags=("text", "cleaning"),
)
def q_street_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import cleaning as C

    types = ["Ave.", "St", "Rd", "Boulevard", "Hwy", "street"]
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 240)
    type_col = None
    for i, t in enumerate(types):
        cond = F.col("doc_id") % 6 == i
        type_col = F.when(cond, t) if type_col is None else type_col.when(cond, t)
    raw = F.concat(F.lit("North Garden "), type_col)
    return docs.select(
        "doc_id",
        raw.alias("raw_street"),
        C.clean_street_type(raw).alias("cleaned_street"),
    )


def _phone_audit_sql() -> str:
    """DuckDB mirror of cleaning.audit_phone (reference F11
    ex_audit_phone, main.ipynb:799-821) over synthetic raw phones."""
    flag = """(
      CASE WHEN length(d) >= 10 AND regexp_matches(substr(d, 1, 4), '^1*360')
           THEN NULL ELSE d END
    )""".replace(
        "d",
        "regexp_replace(CASE WHEN strpos(s, 'x') > 0 "
        "THEN substr(s, 1, strpos(s, 'x') - 1) ELSE s END, '\\D', '', 'g')",
    )
    return f"""
    WITH raw AS (
      SELECT doc_id,
             CASE doc_id % 6
               WHEN 0 THEN '(360) 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               WHEN 1 THEN '306-398-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               WHEN 2 THEN '253-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               WHEN 3 THEN '+1-360-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' x99'
               WHEN 4 THEN '360-111-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                           || ';306-222-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               ELSE '555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             END AS raw_phone
      FROM documents WHERE doc_id < 300
    ),
    aud AS (
      SELECT doc_id, raw_phone,
             list_filter(
               list_transform(string_split(raw_phone, ';'), s -> {flag}),
               x -> x IS NOT NULL) AS sus
      FROM raw
    )
    SELECT doc_id, raw_phone,
           coalesce(array_to_string(sus, '|'), '') AS suspicious,
           CAST(len(sus) AS INT) AS n_suspicious
    FROM aud
    """


@register(
    "f11_phone_audit",
    "Phone area-code audit: flag numbers whose digits do not start with "
    "1*360, recursing into ';'-lists (reference F11 ex_audit_phone, "
    "main.ipynb:799-821), over deterministic synthetic raw phones; the "
    "oracle mirrors the x-truncation / digit-strip / prefix test in SQL.",
    _phone_audit_sql(),
    tags=("text", "audit"),
)
def q_phone_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import cleaning as C

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    num = F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
    raw = (
        F.when(F.col("doc_id") % 6 == 0, F.concat(F.lit("(360) 555-"), num))
        .when(F.col("doc_id") % 6 == 1, F.concat(F.lit("306-398-"), num))
        .when(F.col("doc_id") % 6 == 2, F.concat(F.lit("253-555-"), num))
        .when(
            F.col("doc_id") % 6 == 3,
            F.concat(F.lit("+1-360-555-"), num, F.lit(" x99")),
        )
        .when(
            F.col("doc_id") % 6 == 4,
            F.concat(F.lit("360-111-"), num, F.lit(";306-222-"), num),
        )
        .otherwise(F.concat(F.lit("555-"), num))
    )
    sus = C.audit_phone(raw)
    return docs.select(
        "doc_id",
        raw.alias("raw_phone"),
        F.concat_ws("|", sus).alias("suspicious"),
        F.size(sus).alias("n_suspicious"),
    )


def _street_exceptions_sql() -> str:
    from ..functions.cleaning import ALLOWED_STREET_TYPES

    allowed = ", ".join(f"'{t}'" for t in ALLOWED_STREET_TYPES)
    types = [
        "Street", "Ave.", "Rd", "Meridian", "Boulevard",
        "Hwy", "Court", "street",
    ]
    type_case = (
        "CASE doc_id % 8 "
        + " ".join(f"WHEN {i} THEN '{t}'" for i, t in enumerate(types))
        + " END"
    )
    return f"""
    WITH raw AS (
      SELECT doc_id, 'North Garden ' || {type_case} AS street
      FROM documents WHERE doc_id < 400
    ),
    toks AS (
      SELECT doc_id, string_split(street, ' ')[-1] AS tok FROM raw
    )
    SELECT tok AS exception, count(*) AS n_values, min(doc_id) AS first_doc
    FROM toks
    WHERE tok NOT IN ({allowed})
    GROUP BY tok
    """


@register(
    "f12_street_exceptions",
    "Street-type exception finder: distinct trailing tokens not in the "
    "acceptable street-type list, with usage counts (reference F12 audit "
    "that builds STREET_TYPE_MAP, main.ipynb:955-975), over "
    "deterministic synthetic streets.",
    _street_exceptions_sql(),
    tags=("text", "audit"),
)
def q_street_exceptions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import cleaning as C

    types = [
        "Street", "Ave.", "Rd", "Meridian", "Boulevard",
        "Hwy", "Court", "street",
    ]
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    type_col = None
    for i, t in enumerate(types):
        cond = F.col("doc_id") % 8 == i
        type_col = F.when(cond, t) if type_col is None else type_col.when(cond, t)
    street = F.concat(F.lit("North Garden "), type_col)
    return (
        docs.select("doc_id", C.street_type_exception(street).alias("exception"))
        .filter(F.col("exception").isNotNull())
        .groupBy("exception")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.min("doc_id").alias("first_doc"),
        )
    )


@register(
    "t5_bpe_token_stats",
    "BPE-ish pre-tokenization stats (functions/text.py bpe_like_tokens: "
    "words | digit runs | single punctuation): token and distinct-token "
    "counts plus a punctuation ratio per document -- the token-counting "
    "surface a training-data pipeline budgets with.",
    r"""
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_bpe_tokens,
           CAST(len(list_distinct(toks)) AS INT) AS n_uniq_bpe,
           round(len(list_filter(toks, x -> regexp_matches(x, '^[^A-Za-z0-9]$')))::DOUBLE
                 / greatest(len(toks), 1), 4) AS punct_ratio
    FROM (
      SELECT doc_id,
             regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS toks
      FROM documents WHERE doc_id < 400
    )
    """,
    tags=("text", "tokens"),
)
def q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    toks = TX.bpe_like_tokens(F.col("text"))
    punct = F.size(
        F.filter(toks, lambda x: x.rlike("^[^A-Za-z0-9]$"))
    )
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_bpe"),
        F.round(
            punct.cast("double") / F.greatest(F.size(toks), F.lit(1)), 4
        ).alias("punct_ratio"),
    )


@register(
    "t6_top_bigrams",
    "Corpus-level vocabulary statistics: global top-20 word bigrams by "
    "occurrence count (the n-gram frequency pass a BPE/vocab-building "
    "pipeline runs over the corpus; multiplicity-preserving, unlike "
    "the dedup shingle SET).  Scale: explode is narrow, the single "
    "shuffle is the hash agg on the bigram key with map-side partial "
    "aggregation collapsing repeats before the exchange, then top-k "
    "via TakeOrderedAndProject -- no full sort.",
    """
    SELECT bigram,
           count(*) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM (
      SELECT doc_id,
             unnest(list_transform(
               range(0, greatest(len(toks) - 1, 0)),
               i -> concat_ws(' ', toks[i + 1], toks[i + 2]))) AS bigram
      FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
            FROM documents)
    )
    GROUP BY bigram
    ORDER BY n_occurrences DESC, bigram ASC
    LIMIT 20
    """,
    tags=("text", "vocab"),
)
def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(_t(spark, sf_dir, "documents"))
    # Literal single-space split (like t1), NOT tokens()'s \s+ regex:
    # the DuckDB oracle's string_split(' ') yields empty tokens on
    # consecutive whitespace, so both sides must split identically or
    # multi-space/tab/newline text diverges.
    toks = F.split(F.trim(F.lower(F.col("text"))), " ")
    bigrams = F.when(F.size(toks) >= 2, TX._ngram_list(toks, 2)).otherwise(
        F.array().cast("array<string>")
    )
    grams = docs.select("doc_id", F.explode(bigrams).alias("bigram"))
    return (
        grams.groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("bigram"))
        .limit(20)
    )


# Per-language sampling rates out of 1000 -- the domain-mixing weights
# a training-data curation pass applies (upsample scarce languages,
# downsample the dominant one).  Deterministic hash-gated sampling
# (keep iff md5(doc_id) mod 1000 < rate) instead of RNG sampling: the
# SAME rows are kept on every run, every engine, every cluster size --
# reproducibility that sample()/TABLESAMPLE cannot give across
# engines, and exactly how production pipelines pin their mixtures.
SAMPLE_RATES = {"en": 250, "de": 500, "fr": 500, "es": 500, "zh": 750}
_DEFAULT_RATE = 100


@register(
    "t7_stratified_sample",
    "Deterministic stratified sampling for corpus mixing: per-language "
    "keep-rates applied via a portable md5 hash gate on doc_id (no RNG "
    "-- same kept set on every engine/run), audited per language with "
    "achieved-vs-target rates.  One scan + a tiny groupBy; the gate "
    "predicate pushes into the scan at scale.",
    f"""
    SELECT lang,
           count(*) AS n_total,
           CAST(count(*) FILTER (WHERE kept) AS BIGINT) AS n_sampled,
           CAST(min(CASE WHEN kept THEN doc_id END) AS BIGINT) AS min_kept_id,
           CAST(max(CASE WHEN kept THEN doc_id END) AS BIGINT) AS max_kept_id,
           target_rate
    FROM (
      SELECT lang, doc_id,
             CASE lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_RATES.items())}
                  ELSE {_DEFAULT_RATE} END AS target_rate,
             ({md5_int64_sql("CAST(doc_id AS VARCHAR)")}) % 1000 <
             CASE lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_RATES.items())}
                  ELSE {_DEFAULT_RATE} END AS kept
      FROM documents
    )
    GROUP BY lang, target_rate
    """,
    tags=("text", "sampling"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_int64

    docs = _spread(_t(spark, sf_dir, "documents"))
    rate = F.coalesce(
        F.create_map(
            *[F.lit(x) for kv in SAMPLE_RATES.items() for x in kv]
        )[F.col("lang")],
        F.lit(_DEFAULT_RATE),
    )
    gate = (md5_int64(F.col("doc_id").cast("string")) % 1000) < rate
    return (
        docs.select("lang", "doc_id", rate.alias("target_rate"), gate.alias("kept"))
        .groupBy("lang", "target_rate")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("kept").cast("long")).alias("n_sampled"),
            F.min(F.when(F.col("kept"), F.col("doc_id"))).alias("min_kept_id"),
            F.max(F.when(F.col("kept"), F.col("doc_id"))).alias("max_kept_id"),
        )
        .select(
            "lang", "n_total", "n_sampled", "min_kept_id", "max_kept_id", "target_rate"
        )
    )


# --- t8: sequence packing for pretraining batches. ------------------
# Token budget per packed sequence; 512 gives multi-doc sequences at
# every SF (docs average ~30-60 whitespace tokens).
PACK_BUDGET = 512
# Packing shards: documents are packed WITHIN a deterministic shard
# (doc_id mod 32), so the prefix-sum window parallelizes across 32
# independent partitions instead of one global ordered window -- the
# difference between a scale-correct plan and a single-task sort at
# corpus scale.  Real pipelines pack per input shard exactly like this
# (sequence order across shards carries no meaning for training).
PACK_SHARDS = 32


@register(
    "t8_sequence_packing",
    "Greedy token packing of documents into fixed-budget training "
    "sequences (prefix-sum assignment within deterministic shards): "
    "per packed sequence, its doc count, token total, and doc-id span. "
    "The batch-prep step after tokenize/filter/dedup in a pretraining "
    "pipeline.",
    f"""
    SELECT shard, seq_no,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM (
      SELECT shard, doc_id, n_tokens,
             CAST(floor((cum - n_tokens) / {PACK_BUDGET}.0) AS BIGINT) AS seq_no
      FROM (
        SELECT shard, doc_id, n_tokens,
               sum(n_tokens) OVER (
                 PARTITION BY shard ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM (
          SELECT doc_id % {PACK_SHARDS} AS shard, doc_id,
                 len(string_split(trim(text), ' ')) AS n_tokens
          FROM documents)
      )
    )
    GROUP BY shard, seq_no
    """,
    tags=("text", "window", "packing"),
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit packing by running token count: a document starts in
    the sequence its PRECEDING cumulative total falls in (sequences
    absorb the boundary overflow, the standard streaming-packing
    relaxation -- bin-optimal packing is not data-parallel).  All
    arithmetic is exact int64 + one float division by the budget
    (values far below 2^53), so seq assignment is engine-portable."""
    docs = _spread(_t(spark, sf_dir, "documents"))
    toks = docs.select(
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    seq = toks.withColumn("cum", F.sum("n_tokens").over(w)).withColumn(
        "seq_no",
        F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(float(PACK_BUDGET))),
    )
    return seq.groupBy("shard", "seq_no").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "t10_repetition_ratios",
    "Within-document repetition screening (the Gopher-style quality "
    "gate dedup cannot catch): per-document duplicate-token and "
    "duplicate-3-gram fractions from one pass over the token array -- "
    "documents above the duplicate-shingle threshold are the "
    "boilerplate/looping-generation candidates a curation pipeline "
    "drops before training.",
    """
    SELECT doc_id,
           n_tokens,
           n_distinct_tokens,
           round((n_tokens - n_distinct_tokens) / n_tokens::DOUBLE, 6)
             AS token_dup_ratio,
           n_shingles,
           n_distinct_shingles,
           CASE WHEN n_shingles > 0
                THEN round((n_shingles - n_distinct_shingles)
                           / n_shingles::DOUBLE, 6)
                ELSE 0.0 END AS shingle_dup_ratio
    FROM (
      SELECT doc_id,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_distinct_tokens,
             greatest(len(toks) - 2, 0) AS n_shingles,
             len(list_distinct(
               list_transform(range(1, len(toks) - 1),
                 i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))))
               AS n_distinct_shingles
      FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
            FROM documents)
    )
    """,
    tags=("text", "quality"),
)
def q_repetition_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Narrow per-row array expressions only -- no shuffle, no UDF;
    at 100 TB this runs at scan speed and the filter threshold pushes
    into the scan when materialized as a column."""
    docs = _spread(_t(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.lower(F.col("text"))), " ")
    n = F.size(toks)
    shingles_all = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
                F.element_at(toks, i + 3),
            ),
        ),
    ).otherwise(F.array())
    base = docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.greatest(n - 2, F.lit(0)).cast("long").alias("n_shingles"),
        F.size(F.array_distinct(shingles_all))
        .cast("long")
        .alias("n_distinct_shingles"),
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        F.round(
            (F.col("n_tokens") - F.col("n_distinct_tokens"))
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("token_dup_ratio"),
        "n_shingles",
        "n_distinct_shingles",
        F.when(
            F.col("n_shingles") > 0,
            F.round(
                (F.col("n_shingles") - F.col("n_distinct_shingles"))
                / F.col("n_shingles").cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("shingle_dup_ratio"),
    )


# ---------------------------------------------------------------------------
# t9: PII redaction.  The synthetic corpus contains no PII, so the query
# PLANTS it deterministically from doc_id (same arithmetic in Spark and in
# the DuckDB oracle -- the same in-query fixture technique dd9 uses for its
# duplicate chain), then redacts and counts.  Patterns are written in the
# common Java-regex / RE2 subset so both engines compile them identically.
_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_PAT = r"\b\d{3}-\d{3}-\d{4}\b"
_IP_PAT = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_T9_SQL = """
    WITH planted AS (
      SELECT doc_id,
             text
               || CASE WHEN doc_id % 7 = 0
                       THEN ' contact user' || doc_id || '@example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 5 = 0
                       THEN ' call 555-'
                            || lpad((doc_id % 1000)::VARCHAR, 3, '0')
                            || '-0199'
                       ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                       THEN ' at 10.' || (doc_id % 256) || '.'
                            || (doc_id % 100) || '.7'
                       ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, 'EMAILPAT')) AS INTEGER)
             AS n_emails,
           CAST(len(regexp_extract_all(text, 'PHONEPAT')) AS INTEGER)
             AS n_phones,
           CAST(len(regexp_extract_all(text, 'IPPAT')) AS INTEGER) AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
                 'EMAILPAT', '[EMAIL]', 'g'),
                 'PHONEPAT', '[PHONE]', 'g'),
                 'IPPAT', '[IP]', 'g')) AS redacted_md5
    FROM planted
    WHERE doc_id % 7 = 0 OR doc_id % 5 = 0 OR doc_id % 11 = 0
""".replace("EMAILPAT", _EMAIL_PAT).replace("PHONEPAT", _PHONE_PAT).replace(
    "IPPAT", _IP_PAT
)


@register(
    "t9_pii_redaction",
    "PII scrubbing for training corpora: regex redaction of emails / "
    "phone numbers / IPv4 addresses with per-document redaction counts "
    "and an md5 of the redacted text (pins the exact replacement "
    "output, not just the counts).  PII is planted deterministically "
    "from doc_id so both engines redact identical inputs.",
    _T9_SQL,
    tags=("text", "pii"),
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure Column-expression pipeline: planting, counting and triple
    regexp_replace all run inside whole-stage codegen -- no UDF, no
    shuffle; at 100 TB this is scan-bound and the modulo predicate
    prunes rows before the regex work."""
    docs = _spread(_t(spark, sf_dir, "documents"))
    did = F.col("doc_id")
    planted = F.concat(
        F.col("text"),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" contact user"), did.cast("string"), F.lit("@example.com")
            ),
        ).otherwise(""),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((did % 1000).cast("string"), 3, "0"),
                F.lit("-0199"),
            ),
        ).otherwise(""),
        F.when(
            did % 11 == 0,
            F.concat(
                F.lit(" at 10."),
                (did % 256).cast("string"),
                F.lit("."),
                (did % 100).cast("string"),
                F.lit(".7"),
            ),
        ).otherwise(""),
    )
    base = docs.filter((did % 7 == 0) | (did % 5 == 0) | (did % 11 == 0)).select(
        "doc_id", planted.alias("text")
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_PAT, "[EMAIL]"),
            _PHONE_PAT,
            "[PHONE]",
        ),
        _IP_PAT,
        "[IP]",
    )
    return base.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_PAT), F.lit(0)))
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PHONE_PAT), F.lit(0)))
        .alias("n_phones"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_IP_PAT), F.lit(0)))
        .alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"),
    )


@register(
    "t11_unigram_logprob",
    "Unigram language-model scoring: corpus token frequencies -> "
    "per-document mean log-probability (the cheap perplexity proxy "
    "quality filters rank documents by before training).  Two shuffles "
    "total: one token-frequency aggregation, one per-document mean.",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
      FROM documents
    ),
    freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
    tot AS (SELECT sum(cnt)::DOUBLE AS total FROM freq)
    SELECT doc_id,
           CAST(count(*) AS INTEGER) AS n_tokens,
           round(avg(ln(cnt / total)), 4) AS avg_logp
    FROM toks JOIN freq USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """,
    tags=("text", "quality"),
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token explode -> frequency agg (map-side partial) -> join back
    -> per-doc mean.  The frequency table is vocabulary-sized (Heaps'
    law: ~10^7 rows at 100 TB), so the join-back broadcasts on a real
    cluster; locally AQE picks the same plan.  No UDFs anywhere."""
    docs = _spread(_t(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    tot = freq.agg(F.sum("cnt").cast("double").alias("total"))
    return (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("cnt") / F.col("total"))), 4).alias(
                "avg_logp"
            ),
        )
    )


# BM25 over a fixed conjunctive keyword query -- the retrieval scoring a
# curation pipeline uses to mine topical subsets out of a web-scale corpus.
_BM25_TERMS = ("merge", "spark", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10


def _term_freq(toks: F.Column, term: str) -> F.Column:
    # Single-parameter lambda only: a second parameter (even a bound
    # default) makes Spark's array filter pass the ELEMENT INDEX as the
    # second argument.  The term is captured via this function scope.
    return F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("double")


def _bm25_sql() -> str:
    tf_cols = ",\n             ".join(
        f"len(list_filter(toks, x -> x = '{t}'))::DOUBLE AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n             ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    k1, b = _BM25_K1, _BM25_B
    score = " + ".join(
        f"ln(1 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * tf_{i} * {k1 + 1} / (tf_{i} + {k1} * ({1 - b} + {b} * dl / avgdl))"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
    WITH base AS (
      SELECT doc_id, len(toks)::DOUBLE AS dl,
             {tf_cols}
      FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
            FROM documents)
    ),
    stats AS (
      SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl,
             {df_cols}
      FROM base
    )
    SELECT doc_id, round({score}, 4) AS bm25
    FROM base CROSS JOIN stats
    ORDER BY bm25 DESC, doc_id
    LIMIT {_BM25_TOPK}
    """


@register(
    "i1_bm25_topk",
    "BM25 keyword retrieval (k1=1.2, b=0.75) for a fixed 3-term query: "
    "per-document term frequencies via native array filters (no "
    "explode), corpus df/avgdl in one aggregate, top-k by rounded "
    "score with doc_id tiebreak.",
    _bm25_sql(),
    tags=("text", "search"),
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf per term is a narrow array-filter expression -- the whole
    per-document scoring stage is one codegen'd projection with NO
    token explode (a 30x row-blowup at corpus scale).  One tiny stats
    aggregate broadcasts back; top-k is a TakeOrderedAndProject, not a
    global sort."""
    docs = _spread(_t(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.lower(F.col("text"))), " ")
    base = docs.select(
        "doc_id",
        F.size(toks).cast("double").alias("dl"),
        *[
            _term_freq(toks, t).alias(f"tf_{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).cast("double").alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    k1, b = _BM25_K1, _BM25_B
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(_BM25_TERMS)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        part = (
            idf
            * F.col(f"tf_{i}")
            * (k1 + 1)
            / (F.col(f"tf_{i}") + k1 * ((1 - b) + b * F.col("dl") / F.col("avgdl")))
        )
        score = part if score is None else score + part
    return (
        scored.select("doc_id", F.round(score, 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_BM25_TOPK)
    )


@register(
    "t12_train_eval_split",
    "Deterministic hash-based corpus split (train/validation/test "
    "81.25/12.5/6.25 by the first md5 nibble of doc_id) -- the "
    "reproducible-assignment primitive every training pipeline needs: "
    "no RNG state, no shuffle of the assignment itself, any worker "
    "recomputes a doc's split from its id alone.  Reported as per-"
    "(split, lang) doc counts and char volume; both engines hash the "
    "identical decimal string, so assignment is pinned cross-engine.",
    """
    WITH s AS (
      SELECT CASE WHEN d < 13 THEN 'train'
                  WHEN d < 15 THEN 'validation'
                  ELSE 'test' END AS split,
             lang, n_chars
      FROM (SELECT strpos('0123456789abcdef',
                          substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS d,
                   lang, n_chars
            FROM documents)
    )
    SELECT split, lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY split, lang
    """,
    tags=("pipeline", "split", "agg"),
)
def q_train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One narrow projection (md5 of the id string, no shuffle for the
    ASSIGNMENT -- a 100 TB corpus splits embarrassingly parallel) plus
    a single partial+final hash agg for the report.  The hex-nibble
    threshold gives exact power-of-two fractions; finer ratios use
    more nibbles the same way."""
    docs = _t(spark, sf_dir, "documents")
    d = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    split = (
        F.when(d < 13, F.lit("train"))
        .when(d < 15, F.lit("validation"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


_GOPHER_FILLER = ("data", "table", "row", "order")


@register(
    "t13_gopher_quality_rules",
    "Rule-based corpus filter (Gopher/MassiveText-style, Rae et al. "
    "2021, public): per-document pass/fail on word-count bounds, "
    "mean-word-length bounds, repetition (distinct-token ratio) and "
    "minimum common-word hits, rolled up per language with per-rule "
    "and all-rules pass counts -- the audit report a filtering run "
    "emits before dropping documents.  Every rule compares INTEGER "
    "token statistics (sums and counts, never float ratios), so both "
    "engines agree exactly.",
    f"""
    WITH toks AS (
      SELECT lang,
             len(ts) AS nw,
             list_sum(list_transform(ts, t -> length(t))) AS sumlen,
             len(list_distinct(ts)) AS nu,
             len(list_filter(ts, t -> t IN
                 ({", ".join(f"'{w}'" for w in _GOPHER_FILLER)}))) AS filler
      FROM (
        SELECT lang, string_split_regex(trim(text), '\\s+') AS ts
        FROM documents
      )
    ),
    rules AS (
      SELECT lang,
             (nw BETWEEN 25 AND 80) AS r_wc,
             (sumlen BETWEEN 4 * nw AND 5 * nw) AS r_mwl,
             (2 * nu > nw) AS r_rep,
             (filler >= 3) AS r_filler
      FROM toks
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN r_wc THEN 1 ELSE 0 END) AS BIGINT) AS n_wc,
           CAST(sum(CASE WHEN r_mwl THEN 1 ELSE 0 END) AS BIGINT) AS n_mwl,
           CAST(sum(CASE WHEN r_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_rep,
           CAST(sum(CASE WHEN r_filler THEN 1 ELSE 0 END) AS BIGINT)
             AS n_filler,
           CAST(sum(CASE WHEN r_wc AND r_mwl AND r_rep AND r_filler
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
    FROM rules
    GROUP BY lang
    """,
    tags=("text", "quality", "agg"),
)
def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One narrow scan -> per-row token-array expressions (all JVM
    codegen: split/aggregate/array_distinct/filter -- no Python) ->
    one partial+final agg on lang.  Nothing here grows with corpus
    size except the embarrassingly-parallel map side; the shuffle
    carries |langs| x 6 longs.  The integer-threshold form of each
    rule (sumlen BETWEEN 4*nw AND 5*nw instead of mean in [4,5])
    avoids cross-engine float division entirely -- the same
    sums-not-ratios rule the sketches use."""
    filler_arr = ", ".join(f"'{w}'" for w in _GOPHER_FILLER)
    docs = _spread(_t(spark, sf_dir, "documents"))
    toks = docs.selectExpr(
        "lang", r"split(trim(text), '\\s+') AS ts"
    ).selectExpr(
        "lang",
        "size(ts) AS nw",
        "aggregate(ts, 0L, (a, t) -> a + length(t)) AS sumlen",
        "size(array_distinct(ts)) AS nu",
        f"size(filter(ts, t -> t IN ({filler_arr}))) AS filler",
    )
    rules = toks.select(
        "lang",
        F.col("nw").between(25, 80).alias("r_wc"),
        F.col("sumlen").between(4 * F.col("nw"), 5 * F.col("nw")).alias(
            "r_mwl"
        ),
        (2 * F.col("nu") > F.col("nw")).alias("r_rep"),
        (F.col("filler") >= 3).alias("r_filler"),
    )
    as_n = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0)).cast("bigint")  # noqa: E731
    return rules.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        as_n("r_wc").alias("n_wc"),
        as_n("r_mwl").alias("n_mwl"),
        as_n("r_rep").alias("n_rep"),
        as_n("r_filler").alias("n_filler"),
        F.sum(
            F.when(
                F.col("r_wc")
                & F.col("r_mwl")
                & F.col("r_rep")
                & F.col("r_filler"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_pass"),
    )


_TFIDF_TERMS = ("hash", "vector", "batch")
_TFIDF_TOPK = 10


def _tfidf_sql() -> str:
    tf_cols = ",\n             ".join(
        f"len(list_filter(toks, x -> x = '{t}'))::DOUBLE AS tf_{i}"
        for i, t in enumerate(_TFIDF_TERMS)
    )
    df_cols = ",\n             ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_{i}"
        for i in range(len(_TFIDF_TERMS))
    )
    score = " + ".join(
        f"(CASE WHEN tf_{i} > 0 THEN 1 + ln(tf_{i}) ELSE 0 END)"
        f" * (ln((n_docs + 1) / (df_{i} + 1)) + 1)"
        for i in range(len(_TFIDF_TERMS))
    )
    return f"""
    WITH base AS (
      SELECT doc_id,
             {tf_cols}
      FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
            FROM documents)
    ),
    stats AS (
      SELECT count(*)::DOUBLE AS n_docs,
             {df_cols}
      FROM base
    )
    SELECT doc_id, round({score}, 4) AS tfidf
    FROM base CROSS JOIN stats
    ORDER BY tfidf DESC, doc_id
    LIMIT {_TFIDF_TOPK}
    """


@register(
    "i2_tfidf_topk",
    "TF-IDF keyword retrieval (sublinear tf, smooth idf -- the "
    "sklearn formulation, public) for a fixed 3-term query: completes "
    "the retrieval family next to BM25 (i1) with the length-"
    "normalization-free scorer a simpler ranking pipeline uses.  Same "
    "engine-pinning rules as i1: tf via native array filters, ln only "
    "inside a round(,4) gate, doc_id tiebreak.",
    _tfidf_sql(),
    tags=("text", "search"),
)
def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical 100 TB shape to i1: one codegen'd projection computes
    every per-document tf (no token explode), one tiny stats aggregate
    broadcasts df/n back, and the top-k is a TakeOrderedAndProject --
    no global sort, no shuffle keyed on anything document-sized."""
    docs = _spread(_t(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.lower(F.col("text"))), " ")
    base = docs.select(
        "doc_id",
        *[
            _term_freq(toks, t).alias(f"tf_{i}")
            for i, t in enumerate(_TFIDF_TERMS)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long"))
            .cast("double")
            .alias(f"df_{i}")
            for i in range(len(_TFIDF_TERMS))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(_TFIDF_TERMS)):
        tf_n = F.when(
            F.col(f"tf_{i}") > 0, 1 + F.log(F.col(f"tf_{i}"))
        ).otherwise(F.lit(0.0))
        idf = F.log((F.col("n_docs") + 1) / (F.col(f"df_{i}") + 1)) + 1
        part = tf_n * idf
        score = part if score is None else score + part
    return (
        scored.select("doc_id", F.round(score, 4).alias("tfidf"))
        .orderBy(F.col("tfidf").desc(), "doc_id")
        .limit(_TFIDF_TOPK)
    )

def _tfidf_incremental_sql() -> str:
    """Oracle for i3: a FULL rebuild on the unioned corpus -- stats over
    every document, scoring restricted to the added batch.  Equality
    with the Spark side proves the additive df/n_docs merge."""
    tf_cols = ",\n             ".join(
        f"len(list_filter(toks, x -> x = '{t}'))::DOUBLE AS tf_{i}"
        for i, t in enumerate(_TFIDF_TERMS)
    )
    df_cols = ",\n             ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_{i}"
        for i in range(len(_TFIDF_TERMS))
    )
    score = " + ".join(
        f"(CASE WHEN tf_{i} > 0 THEN 1 + ln(tf_{i}) ELSE 0 END)"
        f" * (ln((n_docs + 1) / (df_{i} + 1)) + 1)"
        for i in range(len(_TFIDF_TERMS))
    )
    return f"""
    WITH base AS (
      SELECT doc_id,
             {tf_cols}
      FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
            FROM documents)
    ),
    stats AS (
      SELECT count(*)::DOUBLE AS n_docs,
             {df_cols}
      FROM base
    )
    SELECT doc_id, round({score}, 4) AS tfidf, n_docs AS n_docs_used
    FROM base CROSS JOIN stats
    WHERE doc_id % 10 = 0
    ORDER BY tfidf DESC, doc_id
    LIMIT {_TFIDF_TOPK}
    """


@register(
    "i3_tfidf_incremental",
    "Incremental retrieval-stats maintenance (the dd12 idiom applied "
    "to i2): an added document batch (doc_id % 10 = 0) updates the "
    "persisted corpus stats row by PURE ADDITION (n_docs and every "
    "per-term df are sums, so new_stats = old_stats + batch_stats), "
    "then scores the batch against the merged stats.  The historical "
    "corpus is touched only through its one persisted stats row -- no "
    "rescan; the oracle full-rebuilds stats on the unioned corpus and "
    "must agree exactly (n_docs_used rides in the output to pin the "
    "merged stats in the hash gate).",
    _tfidf_incremental_sql(),
    tags=("text", "search", "incremental"),
)
def q_tfidf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan shape: two tiny one-row aggregates (the 'persisted' stats
    row stands in for a stats table read -- in production it IS a
    table), one unionByName+sum merge, and the scoring crossJoin
    broadcasts the merged row over the BATCH only.  The base corpus
    appears in the plan solely under its stats aggregate; the scoring
    side never scans it."""
    docs = _spread(_t(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.lower(F.col("text"))), " ")
    is_batch = (F.col("doc_id") % 10) == 0

    def tf_frame(d: DataFrame) -> DataFrame:
        return d.select(
            "doc_id",
            *[
                _term_freq(toks, t).alias(f"tf_{i}")
                for i, t in enumerate(_TFIDF_TERMS)
            ],
        )

    def stats_row(d: DataFrame) -> DataFrame:
        return d.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            *[
                F.sum((F.col(f"tf_{i}") > 0).cast("long"))
                .cast("double")
                .alias(f"df_{i}")
                for i in range(len(_TFIDF_TERMS))
            ],
        )

    batch = tf_frame(docs.filter(is_batch))
    old_stats = stats_row(tf_frame(docs.filter(~is_batch)))  # persisted row
    delta_stats = stats_row(batch)
    merged = old_stats.unionByName(delta_stats).agg(
        F.sum("n_docs").alias("n_docs"),
        *[
            F.sum(f"df_{i}").alias(f"df_{i}")
            for i in range(len(_TFIDF_TERMS))
        ],
    )

    scored = batch.crossJoin(F.broadcast(merged))
    score = None
    for i in range(len(_TFIDF_TERMS)):
        tf_n = F.when(
            F.col(f"tf_{i}") > 0, 1 + F.log(F.col(f"tf_{i}"))
        ).otherwise(F.lit(0.0))
        idf = F.log((F.col("n_docs") + 1) / (F.col(f"df_{i}") + 1)) + 1
        part = tf_n * idf
        score = part if score is None else score + part
    return (
        scored.select(
            "doc_id",
            F.round(score, 4).alias("tfidf"),
            F.col("n_docs").alias("n_docs_used"),
        )
        .orderBy(F.col("tfidf").desc(), "doc_id")
        .limit(_TFIDF_TOPK)
    )




# Per-language token BUDGETS for mixture construction (t14) -- absolute
# targets, unlike t7's keep-RATES.  All divisible by MIX_SHARDS so the
# per-shard budget is exact integer arithmetic on both engines.
MIX_BUDGETS = {"en": 4000, "de": 2000, "fr": 2000, "es": 2000, "zh": 3000}
MIX_DEFAULT_BUDGET = 1600
MIX_SHARDS = 8


def _mix_budget_case() -> str:
    branches = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in MIX_BUDGETS.items()
    )
    return f"CASE lang {branches} ELSE {MIX_DEFAULT_BUDGET} END"


@register(
    "t14_token_budget_mixture",
    "Data-mixture construction against absolute per-language TOKEN "
    "budgets (the Pile/Dolma-style mixing step; t7 samples by rate, "
    "this fills a quota): documents are ranked by a portable md5 "
    "priority, the budget is split evenly over deterministic shards, "
    "and a doc is kept while its shard's PRECEDING token total is "
    "under the shard budget (the same boundary-absorption relaxation "
    "as t8 -- quota filling is not data-parallel without it).  Output "
    "audits achieved tokens vs budget per language.  At scale the "
    "prefix sum runs per (lang, shard) -- low-cardinality languages "
    "spread over shards instead of one hot window partition.",
    f"""
    SELECT lang,
           CAST(budget AS BIGINT) AS budget,
           count(*) AS n_total,
           CAST(count(*) FILTER (WHERE kept) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(n_tokens) FILTER (WHERE kept), 0) AS BIGINT)
             AS tokens_kept
    FROM (
      SELECT lang, budget, n_tokens,
             (cum - n_tokens) < (budget / {MIX_SHARDS}) AS kept
      FROM (
        SELECT lang, budget, n_tokens,
               sum(n_tokens) OVER (
                 PARTITION BY lang, shard ORDER BY pri, doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM (
          SELECT lang, doc_id, doc_id % {MIX_SHARDS} AS shard,
                 len(string_split(trim(text), ' ')) AS n_tokens,
                 ({md5_int64_sql("CAST(doc_id AS VARCHAR)")}) AS pri,
                 {_mix_budget_case()} AS budget
          FROM documents)
      )
    )
    GROUP BY lang, budget
    """,
    tags=("text", "sampling", "window"),
)
def q_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard budgets are exact int64 (budgets divisible by MIX_SHARDS),
    the priority is the same md5 gate t7 uses, and the keep rule is
    t8's preceding-cum convention -- so the kept set is identical on
    any engine and stable under re-partitioning."""
    from ..functions.hashing import md5_int64

    docs = _spread(_t(spark, sf_dir, "documents"))
    budget = F.coalesce(
        F.create_map(
            *[F.lit(x) for kv in MIX_BUDGETS.items() for x in kv]
        )[F.col("lang")],
        F.lit(MIX_DEFAULT_BUDGET),
    ).cast("long")
    toks = docs.select(
        "lang",
        "doc_id",
        (F.col("doc_id") % MIX_SHARDS).alias("shard"),
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("n_tokens"),
        md5_int64(F.col("doc_id").cast("string")).alias("pri"),
        budget.alias("budget"),
    )
    w = Window.partitionBy("lang", "shard").orderBy("pri", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    kept = toks.withColumn("cum", F.sum("n_tokens").over(w)).withColumn(
        "kept",
        (F.col("cum") - F.col("n_tokens"))
        < (F.col("budget") / F.lit(MIX_SHARDS)).cast("long"),
    )
    return kept.groupBy("lang", "budget").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
        F.coalesce(
            F.sum(F.when(F.col("kept"), F.col("n_tokens"))), F.lit(0)
        ).alias("tokens_kept"),
    )


# --- t15: cross-document repeated-passage removal (C4/RefinedWeb). ---
# C4 removed any three-sentence span occurring more than once in the
# corpus (Raffel et al. 2020 §2.2); RefinedWeb/Dolma run the same idea
# at passage granularity.  The synthetic corpus has no sentence
# boundaries, so a "passage" here is a non-overlapping 8-word chunk --
# the semantics (exact global span dedup, first occurrence wins) are
# the published ones.
PASSAGE_WORDS = 8


@register(
    "t15_passage_dedup",
    "Cross-document repeated-passage removal: each doc's text splits "
    "into non-overlapping 8-word chunks; a chunk text occurring at "
    "several positions corpus-wide survives only at its first "
    "occurrence (min (doc_id, chunk_idx)), every other occurrence is "
    "cut and the doc reassembled (C4's three-sentence-span dedup at "
    "chunk granularity).  Scale shape: ONE shuffle of the chunk set "
    "keyed by chunk text with full map-side combine (the per-key state "
    "is a single min-struct, so a chunk duplicated a million times "
    "still reduces to one row per map task -- skew-immune, no window "
    "sort, no join-back: the winner rows ARE the kept set), then a "
    "doc_id-keyed reassembly of winners co-partitioned with the "
    "per-doc totals.",
    f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    chunks AS (
      SELECT doc_id, i AS chunk_idx,
             array_to_string(
               ws[(i*{PASSAGE_WORDS} + 1):(i*{PASSAGE_WORDS} + {PASSAGE_WORDS})],
               ' ') AS chunk_text
      FROM words,
           UNNEST(range(CAST(ceil(len(ws) / {PASSAGE_WORDS}.0) AS BIGINT))) AS t(i)
    ),
    winners AS (
      SELECT chunk_text,
             w[1] AS doc_id, w[2] AS chunk_idx
      FROM (SELECT chunk_text, min([doc_id, chunk_idx]) AS w
            FROM chunks GROUP BY chunk_text)
    )
    SELECT t.doc_id,
           coalesce(k.text_dedup, '') AS text_dedup,
           coalesce(k.kept_chunks, CAST(0 AS BIGINT)) AS kept_chunks,
           t.total_chunks - coalesce(k.kept_chunks, CAST(0 AS BIGINT))
             AS removed_chunks
    FROM (SELECT doc_id, CAST(count(*) AS BIGINT) AS total_chunks
          FROM chunks GROUP BY doc_id) t
    LEFT JOIN (
      SELECT doc_id,
             string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS text_dedup,
             CAST(count(*) AS BIGINT) AS kept_chunks
      FROM winners GROUP BY doc_id
    ) k USING (doc_id)
    """,
    tags=("text", "dedup"),
)
def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    W = PASSAGE_WORDS
    docs = _spread(_t(spark, sf_dir, "documents")).select("doc_id", "text")
    chunks = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(split(text, ' ')) / {W}.0)"
                f" AS INT) - 1), i -> array_join(slice(split(text, ' '),"
                f" i * {W} + 1, {W}), ' '))"
            )
        ).alias("chunk_idx", "chunk_text"),
    )
    # First-occurrence-wins in ONE combinable aggregation: min over
    # (doc_id, chunk_idx) structs reduces map-side, so the hot chunk
    # (corpus boilerplate repeated everywhere) costs one struct per map
    # task instead of a skewed window sort; the winner rows are exactly
    # the kept occurrences, so no second pass over the chunk set.
    winners = chunks.groupBy("chunk_text").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("w")
    )
    kept = winners.select(
        F.col("w.doc_id").alias("doc_id"),
        F.col("w.chunk_idx").alias("chunk_idx"),
        "chunk_text",
    )
    # Per-doc totals come straight off the documents scan as a narrow
    # projection (doc_id is unique there): no explode, no aggregate, no
    # exchange on this branch -- at scale this is the difference
    # between re-scanning the corpus and re-shuffling it.
    totals = docs.select(
        "doc_id",
        F.ceil(F.size(F.split(F.col("text"), " ")) / F.lit(float(W)))
        .cast("long")
        .alias("total_chunks"),
    )
    reassembled = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", "chunk_text"))
                ),
                lambda s: s["chunk_text"],
            ),
            " ",
        ).alias("text_dedup"),
        F.count(F.lit(1)).cast("long").alias("kept_chunks"),
    )
    return totals.join(reassembled, "doc_id", "left").select(
        "doc_id",
        F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        F.coalesce("kept_chunks", F.lit(0).cast("long")).alias("kept_chunks"),
        (
            F.col("total_chunks")
            - F.coalesce("kept_chunks", F.lit(0).cast("long"))
        ).alias("removed_chunks"),
    )
