"""Text-analysis operators over the documents table (training-data pipeline).

Tokenization, term frequencies, quality scoring, language heuristics — all
built-in column expressions; the only shuffles are the final aggregations on
uniform keys (token, lang).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_cdc_gps_spark.functions.text import tokens
from stream_cdc_gps_spark.operators.common import t
from stream_cdc_gps_spark.registry import query


@query(
    "q70_lang_stats",
    oracle="""
SELECT lang,
       count(*)                        AS n_docs,
       round(avg(n_chars), 4)          AS avg_chars,
       count(DISTINCT source)          AS n_sources,
       min(n_chars)                    AS min_chars,
       max(n_chars)                    AS max_chars
FROM documents
GROUP BY lang
""",
)
def q70_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition per language tag."""
    d = t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "q71_token_quality",
    oracle="""
SELECT doc_id,
       CAST(n_tok AS BIGINT)                                          AS n_tokens,
       CAST(n_dis AS BIGINT)                                          AS n_distinct,
       round(CAST(n_dis AS DOUBLE) / n_tok, 4)                        AS ttr,
       round(CAST(n_chars - n_tok + 1 AS DOUBLE) / n_tok, 4)          AS avg_token_len,
       round(least(n_tok / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
               * CAST(0.5 AS DOUBLE)
             + (CAST(n_dis AS DOUBLE) / n_tok) * CAST(0.5 AS DOUBLE), 4)
                                                                      AS quality_score
FROM (SELECT doc_id, n_chars,
             len(string_split(text, ' '))                AS n_tok,
             len(list_distinct(string_split(text, ' '))) AS n_dis
      FROM documents)
""",
)
def q71_token_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: token count, type-token ratio, average
    token length, and a composite quality score (length + diversity)."""
    d = t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "n_chars",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tok"),
        F.size(F.array_distinct(tokens(F.col("text")))).cast("bigint").alias("n_dis"),
    )
    n_tok, n_dis = F.col("n_tok"), F.col("n_dis")
    ttr = n_dis * 1.0 / n_tok
    # tokens are single-space separated: total token chars = n_chars - (n_tok - 1)
    avg_len = (F.col("n_chars") - n_tok + 1) * 1.0 / n_tok
    quality = F.least(n_tok / 100.0, F.lit(1.0)) * 0.5 + ttr * 0.5
    return base.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_dis.alias("n_distinct"),
        F.round(ttr, 4).alias("ttr"),
        F.round(avg_len, 4).alias("avg_token_len"),
        F.round(quality, 4).alias("quality_score"),
    )


@query(
    "q72_top_terms",
    oracle="""
SELECT tok AS token, count(*) AS n
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
     UNNEST(toks) AS u(tok)
GROUP BY tok
ORDER BY n DESC, token
LIMIT 20
""",
)
def q72_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency, top-20 (explode → groupBy → deterministic top-k).

    At scale: partial map-side counts make the shuffle O(vocab), not
    O(tokens)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


# Tiny per-language marker lists for the heuristic language guesser. The
# corpus vocabulary is synthetic, so this demonstrates the OPERATOR (scored
# token-overlap argmax), not linguistic accuracy.
_MARKERS = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "das"),
    "es": ("el", "la", "los"),
}


@query(
    "q73_lang_id_heuristic",
    oracle="""
SELECT doc_id, lang,
       CAST(len(list_filter(string_split(text, ' '),
                            x -> x IN ('the', 'a', 'of'))) AS BIGINT)      AS score_en,
       CAST(len(list_filter(string_split(text, ' '),
                            x -> x IN ('der', 'die', 'das'))) AS BIGINT)   AS score_de,
       CAST(len(list_filter(string_split(text, ' '),
                            x -> x IN ('el', 'la', 'los'))) AS BIGINT)     AS score_es,
       CASE
         WHEN len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a', 'of'))) >=
              greatest(len(list_filter(string_split(text, ' '), x -> x IN ('der', 'die', 'das'))),
                       len(list_filter(string_split(text, ' '), x -> x IN ('el', 'la', 'los'))))
           THEN 'en'
         WHEN len(list_filter(string_split(text, ' '), x -> x IN ('der', 'die', 'das'))) >=
              len(list_filter(string_split(text, ' '), x -> x IN ('el', 'la', 'los')))
           THEN 'de'
         ELSE 'es'
       END AS guessed
FROM documents
""",
)
def q73_lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language scoring with a deterministic argmax.

    The real-corpus version swaps the marker lists for n-gram profiles; the
    plan (per-row array filter + priority CASE) is the same."""
    d = t(spark, sf_dir, "documents").withColumn("toks", tokens(F.col("text")))
    toks = F.col("toks")

    def score(lang: str):
        markers = _MARKERS[lang]
        return F.size(F.filter(toks, lambda x: x.isin(*markers))).cast("bigint")

    s_en, s_de, s_es = score("en"), score("de"), score("es")
    guessed = (
        F.when(s_en >= F.greatest(s_de, s_es), "en")
        .when(s_de >= s_es, "de")
        .otherwise("es")
    )
    return d.select(
        "doc_id",
        "lang",
        s_en.alias("score_en"),
        s_de.alias("score_de"),
        s_es.alias("score_es"),
        guessed.alias("guessed"),
    )


@query(
    "q74_source_lang_matrix",
    oracle="""
SELECT source, lang, count(*) AS n,
       round(CAST(sum(n_chars) AS DOUBLE) / 1000.0, 4) AS kchars
FROM documents
GROUP BY source, lang
""",
)
def q74_source_lang_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-key composition matrix (source x lang) with volume."""
    d = t(spark, sf_dir, "documents")
    return d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("n_chars") / 1000.0, 4).alias("kchars"),
    )
