"""Text analysis operators over a documents table (doc_id, text, lang, ...).

Everything here is built-in-function-only (JVM-side, whole-stage
codegen) — no UDFs in the hot path. Each operator returns a DataFrame
keyed by doc_id so pipelines compose by join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Deliberately minimal and deterministic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to "],
    "de": [" der ", " und ", " die ", " nicht "],
    "fr": [" le ", " et ", " les ", " des "],
    "es": [" el ", " de ", " los ", " que "],
}


def _count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of a literal substring, codegen'd: (len - len(removed))/len(needle)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: argmax over per-language marker hits.

    Returns (doc_id, lang_pred, lang_score). Deterministic tie-break:
    language with the most hits, ties -> lexicographically first code.
    'und' (undetermined) when no marker hits.
    """
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = [
        F.struct(
            sum(
                (_count_occurrences(padded, m) for m in markers),
                F.lit(0).cast("long"),
            ).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    # array_max over structs: max by (hits, lang); ties on hits pick the
    # LARGEST lang string — to get lexicographically-first instead,
    # compare on (hits, reversed-rank) via a negative index.
    ranked = [
        F.struct(
            s["hits"].alias("hits"),
            F.lit(-i).alias("rank"),  # earlier languages win ties
            s["lang"].alias("lang"),
        )
        for i, s in enumerate(scores)
    ]
    best = F.array_max(F.array(*ranked))
    return docs.select(
        "doc_id",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["hits"].cast("long").alias("lang_score"),
    )


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate + char count.

    tokens: split on whitespace runs. bpe_est: a deterministic
    regex-based proxy for BPE token count — words plus punctuation
    marks counted separately (the usual ~chars/4 sanity bound applies).
    """
    t = F.trim(F.col(text_col))
    tokens = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )
    # count punctuation/symbol chars as their own tokens
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    # long words contribute extra subword pieces (every 6 chars)
    longword_extra = (
        F.length(F.regexp_replace(t, r"\s+", "")) / F.lit(6)
    ).cast("long")
    return docs.select(
        "doc_id",
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        tokens.cast("long").alias("n_tokens"),
        (tokens + punct + longword_extra).cast("long").alias("bpe_est"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score in [0,1]:
    length band, punctuation ratio, stopword ratio, uppercase ratio.
    All arithmetic, fully codegen'd, deterministic.
    """
    t = F.col(text_col)
    n = F.length(t).cast("double")
    n_safe = F.greatest(n, F.lit(1.0))
    punct_ratio = (n - F.length(F.regexp_replace(t, r"[^\w\s]", ""))) / n_safe
    upper_ratio = (n - F.length(F.regexp_replace(t, r"[A-Z]", ""))) / n_safe
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    stop_hits = sum(
        (_count_occurrences(padded, m) for m in LANG_MARKERS["en"]),
        F.lit(0).cast("long"),
    )
    words = F.greatest(
        F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(F.size(F.split(F.trim(t), r"\s+"))),
        F.lit(1),
    )
    stop_ratio = stop_hits / words.cast("double")
    length_band = F.when((n >= 200) & (n <= 100000), F.lit(1.0)).otherwise(
        F.least(n / F.lit(200.0), F.lit(1.0))
    )
    score = (
        F.lit(0.4) * length_band
        + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0)))
        + F.lit(0.1) * (F.lit(1.0) - F.least(upper_ratio * 5, F.lit(1.0)))
    )
    return docs.select(
        "doc_id",
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(upper_ratio, 6).alias("upper_ratio"),
        F.round(score, 6).alias("quality"),
    )


def document_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic content fingerprints: md5 (exact-dup key) +
    xxhash64 (cheap 64-bit) + a normalized-text hash (casefold +
    whitespace collapse first — catches trivial reformatting dups)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return docs.select(
        "doc_id",
        F.md5(F.col(text_col)).alias("md5"),
        F.xxhash64(F.col(text_col)).alias("xxh64"),
        F.md5(norm).alias("norm_md5"),
    )


def ngram_counts(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Corpus-level n-gram frequency table:
    (ngram, n_docs, n_occurrences), occurrences counted with
    multiplicity, filtered to n_occurrences >= min_count.

    The standard corpus-statistics pass of an LM data pipeline
    (boilerplate discovery, contamination screening, vocabulary
    coverage). Scale shape: the flat-map explode is the only row
    amplification (x ~doc_len), and the groupBy's map-side partial
    aggregation collapses high-frequency grams before the shuffle —
    the exchange carries per-partition distinct grams, not token
    occurrences. min_count prunes the long tail right after the
    aggregate (typically >90% of distinct grams are hapax).

    Uses the same text normalization as the dedup shingle pass
    (lowercase, non-alphanumeric -> space), so gram tables and shingle
    tables are joinable. Single-word documents yield one degenerate
    short gram (same convention as dedup.shingles).
    """
    from olive_spark.pipeline.dedup import _normalized_words

    words = _normalized_words(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return (
        docs.select("doc_id", F.explode(grams).alias("ngram"))
        .filter(F.length("ngram") > 0)
        .groupBy("ngram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_occurrences") >= min_count)
    )
