"""Text analysis operators for corpus quality pipelines.

All pure column algebra (JVM-side): token counting with a BPE-ish
regex, language-signal heuristics, quality scoring with exact integer
features, and document fingerprinting.  Each has a 1:1 ANSI-SQL twin,
so the whole family is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "token_count_expr",
    "quality_features",
    "lang_signal",
    "fingerprints",
    "repetition_filters",
    "tfidf_top_terms",
]

TOKEN_PATTERN = "[a-z]+|[0-9]+"


def token_count_expr(text: Column) -> Column:
    """Number of BPE-ish tokens (letter runs / digit runs)."""
    return F.size(F.regexp_extract_all(F.lower(text),
                                       F.lit(TOKEN_PATTERN), F.lit(0)))


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-integer quality features per document: word count, alpha
    char count, mean word length ×100 (floored), short-doc flag."""
    text = F.col(text_col)
    n_words = F.size(F.split(F.trim(text), r"\s+"))
    n_alpha = F.length(F.regexp_replace(F.lower(text), "[^a-z]", ""))
    return df.select(
        F.col(id_col).alias("doc"),
        n_words.cast("long").alias("n_words"),
        n_alpha.cast("long").alias("n_alpha"),
        F.floor(n_alpha * 100 / n_words).cast("long").alias("mean_wlen_x100"),
        (n_words < 20).cast("int").alias("is_short"))


def lang_signal(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Character-distribution language signal: vowel percentage (integer
    basis points) and a coarse class — the n-gram-heuristic shape of a
    language-ID stage."""
    text = F.lower(F.col(text_col))
    n_vowel = F.length(F.regexp_replace(text, "[^aeiou]", ""))
    n_alpha = F.length(F.regexp_replace(text, "[^a-z]", ""))
    pct = F.floor(n_vowel * 1000 / n_alpha).cast("long")
    # letterless docs carry no signal — filtered, not divided by zero
    # (ANSI mode would otherwise kill the job on the first such doc)
    return (df.filter(n_alpha > 0)
            .select(
                F.col(id_col).alias("doc"),
                pct.alias("vowel_permille"),
                F.when(pct >= 380, "vowel-heavy")
                .when(pct >= 300, "latin-like")
                .otherwise("consonant-heavy").alias("lang_class")))


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stable normalized content fingerprint per document."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(F.col(id_col).alias("doc"),
                     F.md5(norm).alias("fp"),
                     F.length(norm).cast("long").alias("n_chars_norm"))


def repetition_filters(df: DataFrame, id_col: str, text_col: str,
                       max_dup_word_permille: int = 300,
                       max_top_bigram_permille: int = 180) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1 shape): duplicate-word fraction and most-frequent-bigram
    fraction, exact integer permille so any SQL engine reproduces them.

    * ``dup_word_permille`` = (n_words − n_distinct_words) · 1000 /
      n_words — high for boilerplate/keyword-stuffed docs;
    * ``top_bigram_permille`` = occurrences of the most frequent word
      bigram · 1000 / n_bigrams — high for template/repeated-phrase
      docs;
    * ``keep`` applies the thresholds (defaults in the Gopher
      ballpark).

    One explode + two-level aggregation: shuffles on (doc, bigram) then
    doc — both uniform keys, map-side combined, no joins.
    """
    toks = F.split(F.lower(F.col(text_col)), " ")
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(F.slice(toks, 1, m), F.slice(toks, 2, m),
                         lambda x, y: F.concat_ws(" ", x, y))
    # keep the tokenize/shingle pass wide on compacted inputs
    from ..partitioning import widen_for_cpu
    df = widen_for_cpu(df, id_col)
    # explode_outer keeps sub-bigram docs as a single null-bigram row,
    # so EVERY doc gets a verdict from one pass over the input (a
    # union of a short-doc branch would scan the corpus twice)
    base = df.select(F.col(id_col).alias("doc"),
                     F.size(toks).alias("n_words"),
                     F.size(F.array_distinct(toks)).alias("n_distinct"),
                     F.explode_outer(bigrams).alias("bigram"))
    per_bigram = (base.groupBy("doc", "n_words", "n_distinct", "bigram")
                  .agg(F.count(F.lit(1)).alias("c")))
    real = F.col("bigram").isNotNull()
    per_doc = (per_bigram.groupBy("doc", "n_words", "n_distinct")
               .agg(F.max(F.when(real, F.col("c")).otherwise(0))
                    .alias("top_bigram_count"),
                    F.sum(F.when(real, F.col("c")).otherwise(0))
                    .alias("n_bigrams")))
    dup_word = F.floor((F.col("n_words") - F.col("n_distinct")) * 1000
                       / F.col("n_words")).cast("long")
    top_bigram = F.when(
        F.col("n_bigrams") > 0,
        F.floor(F.col("top_bigram_count") * 1000 / F.col("n_bigrams"))
    ).otherwise(0).cast("long")
    return (per_doc.select(
        "doc",
        F.col("n_words").cast("long").alias("n_words"),
        dup_word.alias("dup_word_permille"),
        top_bigram.alias("top_bigram_permille"))
        .withColumn("keep",
                    ((F.col("dup_word_permille")
                      <= max_dup_word_permille)
                     & (F.col("top_bigram_permille")
                        <= max_top_bigram_permille)).cast("int")))


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str,
                    k: int = 3) -> DataFrame:
    """Top-``k`` characteristic terms per document by TF-IDF — the
    corpus-characterization stage of a training-data pipeline (what
    is this document ABOUT, relative to the corpus).

    Tokens are the module's BPE-ish runs (``TOKEN_PATTERN``,
    lowercased); ``idf = ln((N+1)/(df+1))`` smoothed, ``score = tf ×
    idf``; ties rank by term ascending so the output is deterministic.
    Returns ``(doc, term, rank, score)`` with score rounded at the
    edge.

    Scale shape: the explode shuffles on the uniform ``(doc, term)``
    key; the document-frequency aggregate is Zipf-skewed on hot terms
    but moves only map-side-combined counts; the tf⋈idf equi-join is
    on ``term`` (vocabulary-sized right side — AQE broadcasts it when
    small, and its skew-join splitter handles hot terms when not);
    the final top-k is one per-doc window.  The corpus text crosses
    exactly one shuffle (the explode).  ``N`` is a driver-side scalar
    ``count()`` — one metadata-cheap job, not a collect of rows.
    """
    toks = (df.select(F.col(id_col).alias("doc"),
                      F.explode(F.regexp_extract_all(
                          F.lower(F.col(text_col)),
                          F.lit(TOKEN_PATTERN), F.lit(0))).alias("term")))
    tf = toks.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.count()
    scored = (tf.join(dfreq, "term")
              .withColumn("score",
                          F.col("tf") * F.log((F.lit(n_docs) + 1.0)
                                              / (F.col("df") + 1.0))))
    from pyspark.sql import Window
    w = Window.partitionBy("doc").orderBy(F.col("score").desc(),
                                          F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("doc", "term", "rank",
                    F.round("score", 6).alias("score")))
