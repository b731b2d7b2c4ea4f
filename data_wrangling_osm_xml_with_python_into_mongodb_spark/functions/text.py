"""Text-analysis column expressions for the documents pipeline.

Everything is a native ``Column`` expression -- with one measured
exception: shingle GENERATION also ships an Arrow pandas_udf twin
(:func:`word_shingles_arrow`), because Spark's higher-order functions
(``transform``/``filter``) are CodegenFallback -- interpreted per row
-- and the per-row interpreter overhead dominates shingling on
document-count-heavy inputs (measured 3.5s HOF vs 0.66s Arrow on the
planted-skew corpus; identical output).  Each helper has a matching
ANSI-SQL formulation used by the DuckDB oracles in ``plans``.

Capabilities (training-data-pipeline surface):
  * tokenization + token counting (whitespace + BPE-ish word/punct regex)
  * quality scoring (length / punctuation / stopword / repetition ratios)
  * language ID via stopword-hit heuristic over small per-language lists
  * document fingerprinting (normalized md5, portable across engines)
  * word-level shingles for near-dup detection
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language function-word lists for the langid heuristic. The
# heuristic is intentionally deterministic and engine-portable; real
# deployments would swap in fastText et al. at the same call site.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "que", "en", "un", "est"),
    "de": ("der", "die", "das", "und", "zu", "in", "ein", "ist"),
}

TOKEN_SPLIT_RE = r"\s+"
# BPE-ish pre-tokenizer: words, numbers, or single punctuation marks.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(text), TOKEN_SPLIT_RE)


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_like_tokens(text: Column) -> Column:
    """Regex pre-tokenization approximating a BPE pre-tokenizer split."""
    return F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)


def stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """Multiset count of tokens that appear in ``words``."""
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: penalize very short or very
    long docs, high punctuation density, and low token diversity."""
    toks = tokens(text)
    nt = F.size(toks).cast("double")
    n_chars = F.length(text).cast("double")
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", "")).cast("double")
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / nt
    len_ok = F.when((nt >= 5) & (nt <= 1000), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_ok = F.when(punct / n_chars <= 0.2, F.lit(1.0)).otherwise(F.lit(0.7))
    return F.round(len_ok * punct_ok * uniq_ratio, 4)


def lang_scores(toks: Column) -> list[Column]:
    return [
        stopword_hits(toks, words).alias(f"hits_{lang}")
        for lang, words in LANG_STOPWORDS.items()
    ]


def fingerprint(text: Column) -> Column:
    """Normalized md5 fingerprint: lowercase, collapse whitespace."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(normalized)


def _ngram_list(toks: Column, k: int) -> Column:
    """All in-order k-grams of a token array (meaningful for size >= k;
    the ``greatest`` clamp keeps the sequence bound non-negative even
    if a caller's guard branch is evaluated eagerly): ``transform``
    over start positions, joined with single spaces."""
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )


def word_ngrams(text: Column, k: int = 2) -> Column:
    """ALL k-word n-gram occurrences in order (vocabulary counting /
    BPE-prep wants multiplicities, unlike :func:`word_shingles`' set
    semantics).  Texts shorter than ``k`` tokens yield an empty array.
    """
    toks = tokens(F.lower(text))
    return F.when(F.size(toks) >= k, _ngram_list(toks, k)).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (the unit set for Jaccard / MinHash);
    texts shorter than ``k`` tokens contribute their whole text as the
    one shingle (a short doc still has a set to compare).

    Built with ``transform`` over token positions -- stays JVM-side.
    """
    toks = tokens(F.lower(text))
    return F.array_distinct(
        F.when(F.size(toks) >= k, _ngram_list(toks, k)).otherwise(
            F.array(F.concat_ws(" ", toks))
        )
    )


# Java \s as an explicit ASCII class, so the Python twin splits exactly
# like F.split(_, r"\s+") does JVM-side (Python's \s is unicode-aware).
_JAVA_WS_RE = None  # built lazily; keeps module import free of re cost


def word_shingles_arrow(
    text: Column, k: int = 3, *, eval_once: bool = False
) -> Column:
    """Arrow-vectorized twin of :func:`word_shingles` -- identical
    output (pytest-pinned on edge cases and data), ~5x faster where
    doc count dominates, because the HOF path pays the expression
    interpreter per row while this pays one Arrow batch per ~10k rows.

    This is the hot-path entry for the dedup family's shingle streams
    (plans/queries_dedup._shingles_df); the Column version remains the
    reference formulation mirrored by the SQL oracles."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    global _JAVA_WS_RE
    if _JAVA_WS_RE is None:
        _JAVA_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")
    ws = _JAVA_WS_RE

    def _sh(texts):
        out = []
        for t in texts:
            # .strip(' ') matches Spark trim (space only), not Python's
            # unicode-whitespace strip.
            toks = ws.split((t or "").strip(" ").lower())
            if len(toks) >= k:
                out.append(
                    list(
                        dict.fromkeys(
                            " ".join(toks[i : i + k])
                            for i in range(len(toks) - k + 1)
                        )
                    )
                )
            else:
                out.append([" ".join(toks)])
        return pd.Series(out)

    # Real-object annotations: this module uses `from __future__ import
    # annotations`, which would turn inline hints into strings that
    # pandas_udf's type-hint inference cannot resolve for a
    # function-local def.
    _sh.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    udf = pandas_udf(_sh, ArrayType(StringType()))
    if eval_once:
        # The function IS deterministic; the flag only tells the
        # optimizer it may not duplicate or move the call (guide
        # §4.4).  Needed when the shingle ARRAY is kept as a named
        # column that a later select explodes: the filter inferred
        # from the generate (size(arr) > 0) otherwise gets pushed
        # below the _spread exchange WITH ITS OWN COPY of the UDF --
        # the plan then runs the Python shingling twice, and the
        # first copy runs before the round-robin spread, i.e. on the
        # scan's unsplit partitions (measured: 2 ArrowEvalPython
        # nodes in plans/r18/dd2_ngram_jaccard_pairs_after.txt before
        # this flag, 1 after; the inline-explode callers never hit
        # the duplication and stay deterministic).
        udf = udf.asNondeterministic()
    return udf(text)
