"""Text-analysis operators over the documents table (training-data pipeline).

Tokenization, term frequencies, quality scoring, language heuristics — all
built-in column expressions; the only shuffles are the final aggregations on
uniform keys (token, lang).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_cdc_gps_spark.functions.text import tokens, word_shingles
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


@query(
    "q75_bpe_token_estimate",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT)                    AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+'))
            AS BIGINT)                                                 AS bpe_ish_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT)                        AS byte_estimate
FROM documents
""",
)
def q75_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, a BPE-ish regex
    (letter-runs / digit-runs / punctuation-runs — the GPT-2 pre-tokenizer
    family), and the chars/4 rule of thumb. All JVM-side regex, no UDF."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"), 0))
        .cast("bigint")
        .alias("bpe_ish_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("byte_estimate"),
    )


@query(
    "q76_rolling_hash",
    oracle="""
SELECT doc_id,
       CAST(list_reduce(
           list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(text, ' '),
                                       t -> CAST(('0x' || substr(md5(t), 1, 8))::BIGINT AS BIGINT))),
           (acc, h) -> (acc * 31 + h) % 1000000007) AS BIGINT) AS roll_hash
FROM documents
WHERE doc_id < 300
""",
)
def q76_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint: polynomial rolling hash over the
    token sequence (acc*31 + md5-prefix(token) mod p). Unlike the set-based
    md5/MinHash fingerprints, token ORDER matters — reordered duplicates get
    different hashes. Pure fold over the token array, no UDF, no shuffle."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = d.select("doc_id", F.split("text", " ").alias("toks"))
    tok_hash = lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")  # noqa: E731
    roll = F.aggregate(
        F.transform("toks", tok_hash),
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * 31 + h) % 1000000007,
    )
    return toks.select("doc_id", roll.cast("bigint").alias("roll_hash"))


_STOPWORDS = (
    "the a an and or of to in is it for on with as at by from this that".split()
)
_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"


@query(
    "q77_stopword_ratio",
    oracle=f"""
SELECT doc_id,
       CAST(len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) AS BIGINT)
           AS n_stop,
       CAST(len(toks) AS BIGINT) AS n_tok,
       round(len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) * 1.0
             / len(toks), 4) AS stop_ratio
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
WHERE len(toks) > 0
""",
)
def q77_stopword_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword ratio per document — the classic fluency/quality signal
    (natural prose has a stable stopword fraction; keyword spam and
    boilerplate sit at the extremes). Pure array math, no explode: the
    ratio is computed per row inside codegen."""
    d = t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
    n_tok = F.size(toks)
    return (
        d.select(
            "doc_id",
            n_stop.cast("bigint").alias("n_stop"),
            n_tok.cast("bigint").alias("n_tok"),
        )
        .filter(F.col("n_tok") > 0)
        .select(
            "doc_id",
            "n_stop",
            "n_tok",
            F.round(F.col("n_stop") * 1.0 / F.col("n_tok"), 4).alias("stop_ratio"),
        )
    )


@query(
    "q78_tfidf",
    oracle="""
WITH tok AS (
    SELECT doc_id, tok
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         UNNEST(toks) AS u(tok)
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok WHERE doc_id < 30
       GROUP BY doc_id, tok),
df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY tok),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT doc_id, tok AS term,
           CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           round(tf * ln(n_docs * 1.0 / df), 6) AS tfidf,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY tf * ln(n_docs * 1.0 / df) DESC, tok) AS rn
    FROM tf JOIN df USING (tok) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf FROM scored WHERE rn <= 3
""",
)
def q78_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: top-3 most characteristic terms per document (sample of 30).

    Classic retrieval/relevance scoring: tf from the document's own tokens,
    df over the WHOLE corpus (never the sample — idf is a corpus statistic),
    idf = ln(N/df). Plan at scale: tf shuffles only the sampled docs' tokens
    and then BROADCASTS into the join — the vocabulary-sized df side is the
    big side and must never reshuffle just to meet a 30-doc sample; the one
    remaining full-corpus shuffle pair is the exact distinct-doc count
    behind df. The final top-k window only moves the joined sample rows."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = (
        tok.filter(F.col("doc_id") < 30)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = d.select(F.count(F.lit(1)).alias("n_docs"))
    tfidf_raw = F.col("tf") * F.log(F.col("n_docs") * 1.0 / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(F.desc(tfidf_raw), "term")
    return (
        df.join(F.broadcast(tf), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(tfidf_raw, 6).alias("tfidf"),
        )
    )


@query(
    "q87_train_val_split",
    oracle="""
SELECT split, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(n_chars), 4)   AS avg_chars
FROM (
    SELECT lang, n_chars,
           CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
    FROM (SELECT lang, n_chars,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 AS b
          FROM documents)
)
GROUP BY split, lang
""",
)
def q87_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split (90/5/5) — the held-out
    split every training-data pipeline needs. Hash-mod bucketing (first 2
    md5 bytes of the id) instead of rand(): reproducible across runs,
    engines, and cluster sizes, stable under re-partitioning, and new
    documents never move existing ones between splits. Map-only except the
    final stats aggregation."""
    d = t(spark, sf_dir, "documents")
    b = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "bigint"
    ) % 100
    split = (
        F.when(b < 90, "train").when(b < 95, "val").otherwise("test").alias("split")
    )
    return d.select(split, "lang", "n_chars").groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@query(
    "q149_weighted_sample",
    oracle="""
SELECT doc_id, CAST(n_chars AS BIGINT) AS weight, round(key, 6) AS sample_key
FROM (
    SELECT doc_id, n_chars,
           -ln((('0x' || substr(md5('ws|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                + 1) / 4294967297.0) / n_chars AS key
    FROM documents WHERE n_chars > 0
)
ORDER BY key, doc_id
LIMIT 100
""",
)
def q149_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES):
    each doc draws an exponential clock -ln(u)/w with weight w = n_chars
    (longer docs proportionally more likely) and the k smallest clocks form
    the sample — the standard one-pass distributed weighted reservoir, here
    with u derived from a salted md5 so the draw is deterministic and
    engine-portable ((h+1)/(2^32+1) keeps u in (0,1), never 0).

    Scale: key computation is map-only; the k-smallest selection is
    TakeOrdered (per-partition top-k, then a k-row driver merge) — no
    global sort, no shuffle of the corpus. This is how a 100 TB pipeline
    draws a quality-weighted eval slice in one pass."""
    d = t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ws|"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / F.lit(4294967297.0)
    key = -F.log(u) / F.col("n_chars")
    return (
        d.select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("weight"),
            key.alias("key"),
        )
        .orderBy("key", "doc_id")
        .limit(100)
        .select("doc_id", "weight", F.round("key", 6).alias("sample_key"))
    )


@query(
    "q66_quality_filter",
    oracle="""
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tokens,
       (n_tok BETWEEN 5 AND 2000)
           AND (avg_len >= 2 AND avg_len <= 12)
           AND (digit_frac <= 0.2)                       AS keep,
       CASE WHEN NOT (n_tok BETWEEN 5 AND 2000) THEN 'n_tokens'
            WHEN NOT (avg_len >= 2 AND avg_len <= 12) THEN 'avg_token_len'
            WHEN NOT (digit_frac <= 0.2) THEN 'digit_ratio'
            END                                          AS drop_reason
FROM (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tok,
           CAST(n_chars - len(string_split(text, ' ')) + 1 AS DOUBLE)
               / len(string_split(text, ' ')) AS avg_len,
           CAST(n_chars - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
               / n_chars AS digit_frac
    FROM documents WHERE n_chars > 0
)
""",
)
def q66_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based document quality filtering (the Gopher/C4-style gate every
    pretraining pipeline runs before tokenization): token-count bounds,
    mean-token-length bounds, digit-character ratio cap — keep/drop plus the
    FIRST failing rule for auditability (filters must be explainable, not
    just applied).

    Map-only: every rule is a column expression over per-row stats, so the
    100 TB corpus pass is a single codegen stage with zero shuffles; the
    same rule expressions run verbatim in the oracle."""
    d = t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    n_tok = F.size(tokens(F.col("text")))
    avg_len = (F.col("n_chars") - n_tok + 1).cast("double") / n_tok
    digit_frac = (
        F.col("n_chars") - F.length(F.regexp_replace("text", "[0-9]", ""))
    ).cast("double") / F.col("n_chars")
    r_tok = n_tok.between(5, 2000)
    r_len = (avg_len >= 2) & (avg_len <= 12)
    r_dig = digit_frac <= 0.2
    return d.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        (r_tok & r_len & r_dig).alias("keep"),
        F.when(~r_tok, "n_tokens")
        .when(~r_len, "avg_token_len")
        .when(~r_dig, "digit_ratio")
        .alias("drop_reason"),
    )


@query(
    "q67_stratified_sample",
    oracle="""
SELECT doc_id, lang
FROM (
    SELECT doc_id, lang,
           ('0x' || substr(md5('strat|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
               % 100 AS b,
           CASE WHEN lang = 'en' THEN 50 ELSE 20 END AS pct
    FROM documents
)
WHERE b < pct
""",
)
def q67_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language sampling rates
    (down-sample the dominant stratum, keep more of the rest — the standard
    rebalancing move for pretraining mixes) via hash-threshold membership,
    NOT rand(): md5('strat|'||id) mod 100 < rate. Reproducible across runs,
    engines, partitionings, and cluster sizes; a namespaced salt ('strat|')
    decorrelates it from q87's split buckets so sampling and splitting stay
    independent events.

    Map-only membership test — at 100 TB the sample materializes in one
    codegen pass with no shuffle at all."""
    d = t(spark, sf_dir, "documents")
    b = F.conv(
        F.substring(F.md5(F.concat(F.lit("strat|"), F.col("doc_id").cast("string"))), 1, 4),
        16,
        10,
    ).cast("bigint") % 100
    pct = F.when(F.col("lang") == "en", 50).otherwise(20)
    return d.filter(b < pct).select("doc_id", "lang")


@query(
    "q69_token_pmi",
    oracle="""
WITH dt AS (
    SELECT doc_id, tok FROM (
        SELECT doc_id,
               list_sort(list_distinct(list_filter(string_split(text, ' '),
                                                   x -> length(x) >= 3)))[1:12] AS ts
        FROM documents
    ), UNNEST(ts) AS u(tok)
),
pc AS (
    SELECT a.tok AS ta, b.tok AS tb, count(*) AS n_ab
    FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
    GROUP BY a.tok, b.tok HAVING count(*) >= 3
),
tc AS (SELECT tok, count(*) AS n_t FROM dt GROUP BY tok),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT ta, tb, CAST(n_ab AS BIGINT) AS n_ab,
       round(ln(CAST(n_ab AS DOUBLE) * n_docs / (ca.n_t * cb.n_t)), 6) AS pmi
FROM pc JOIN tc ca ON ca.tok = pc.ta JOIN tc cb ON cb.tok = pc.tb, n
ORDER BY pmi DESC, ta, tb
LIMIT 30
""",
)
def q69_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top token co-occurrence pairs by pointwise mutual information —
    collocation mining over the corpus (phrase detection / tokenizer-merge
    candidates in a training-data pipeline).

    Per-doc token set is capped at the first 12 sorted distinct tokens
    (len >= 3), so in-doc pair expansion is a BOUNDED O(12 choose 2) array
    HOF — the same cap-before-expand discipline as the dedup buckets
    (dedup.py MAX_POSTING): pair count per doc is a constant, never
    O(doc_len^2). Pair counts and token counts shuffle on uniform token
    keys; the PMI join brings in the two marginals and the corpus size
    rides in via a broadcast of a 1-row aggregate (no driver-side count()).
    Tiebreak (pmi desc, ta, tb) is total, so top-30 is deterministic."""
    d = t(spark, sf_dir, "documents")
    toks12 = F.slice(
        F.array_sort(
            F.array_distinct(F.filter(tokens(F.col("text")), lambda x: F.length(x) >= 3))
        ),
        1,
        12,
    )
    dt = d.select("doc_id", toks12.alias("ts"))
    arr = F.col("ts")
    pair_structs = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda y: F.struct(x.alias("ta"), y.alias("tb")),
            ),
        )
    )
    pc = (
        dt.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.ta").alias("ta"), F.col("p.tb").alias("tb"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    tc = (
        dt.select(F.explode("ts").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_t"))
    )
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    pmi = F.round(
        F.log(
            F.col("n_ab").cast("double") * F.col("n_docs") / (F.col("na") * F.col("nb"))
        ),
        6,
    )
    return (
        pc.join(tc.select(F.col("tok").alias("ta"), F.col("n_t").alias("na")), "ta")
        .join(tc.select(F.col("tok").alias("tb"), F.col("n_t").alias("nb")), "tb")
        .crossJoin(F.broadcast(n_docs))
        .select("ta", "tb", F.col("n_ab").cast("bigint").alias("n_ab"), pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "ta", "tb")
        .limit(30)
    )


@query(
    "q103_sequence_packing",
    oracle="""
WITH d AS (
    SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok
    FROM documents WHERE n_chars > 0
),
c AS (
    SELECT doc_id, lang, n_tok,
           sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
    FROM d
),
packed AS (
    SELECT lang, (cum - 1) // 512 AS pack_id, n_tok FROM c
)
SELECT lang, CAST(pack_id AS BIGINT) AS pack_id,
       CAST(count(*) AS BIGINT)      AS n_docs,
       CAST(sum(n_tok) AS BIGINT)    AS pack_tokens
FROM packed
GROUP BY lang, pack_id
""",
)
def q103_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed token-budget (512)
    training packs by running token count — the batching step between a
    cleaned corpus and a tokenizer/dataloader. Cumulative-sum assignment
    (pack = (cumsum-1) div budget) is the deterministic, repartition-stable
    form of greedy packing; packs can overflow by at most one document,
    the standard trade for a one-pass parallel packer.

    Scale: the running sum is windowed PER STRATUM (lang), never a single
    global partition — each stratum's cumsum is an independent sorted
    window, so a 100 TB corpus packs as N_strata parallel streams (in a
    real pipeline the stratum is (split, shard), thousands of bounded
    partitions). One shuffle on the stratum key."""
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "lang", F.size(tokens(F.col("text"))).alias("n_tok"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = d.select(
        "lang",
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - 1) / 512).cast("bigint").alias("pack_id"),
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("pack_tokens"),
    )


@query(
    "q104_repetition_stats",
    oracle="""
WITH sh AS (
    SELECT doc_id, tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2] AS s
    FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
          WHERE len(string_split(text, ' ')) >= 3),
         UNNEST(range(1, len(tokens) - 1)) AS r(i)
),
counts AS (
    SELECT doc_id, s, count(*) AS c FROM sh GROUP BY doc_id, s
),
per_doc AS (
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_shingles,
           CAST(max(c) AS BIGINT) AS max_rep
    FROM counts GROUP BY doc_id
)
SELECT doc_id, n_shingles, max_rep,
       round(CAST(max_rep AS DOUBLE) / n_shingles, 4) AS rep_ratio,
       CAST(max_rep AS DOUBLE) / n_shingles > 0.2     AS flagged
FROM per_doc
""",
)
def q104_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition detection — the Gopher rule q66 doesn't cover: the share
    of a document's 3-gram shingles taken by its single most repeated
    shingle; documents above 20% are flagged (boilerplate, keyword
    stuffing, degenerate generations).

    Counts ride on (doc_id, shingle) then reduce to (doc_id) — both keys
    are uniform (doc_id dominates the hash), so the two shuffles stay
    balanced at corpus scale; the shingle arrays themselves are per-row
    HOFs shared with the MinHash stage (functions/text.py)."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= 3
    )
    sh = toks.select(
        "doc_id", F.explode(word_shingles(F.col("toks"), 3)).alias("s")
    )
    counts = sh.groupBy("doc_id", "s").agg(F.count(F.lit(1)).alias("c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_shingles"),
        F.max("c").cast("bigint").alias("max_rep"),
    )
    ratio = F.col("max_rep").cast("double") / F.col("n_shingles")
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "max_rep",
        F.round(ratio, 4).alias("rep_ratio"),
        (ratio > 0.2).alias("flagged"),
    )


@query(
    "q132_fixed_k_sample",
    oracle="""
SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn
FROM (
    SELECT lang, doc_id,
           row_number() OVER (PARTITION BY lang
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
    FROM documents
)
WHERE rn <= 20
""",
)
def q132_fixed_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-k per-stratum sample: exactly 20 docs per
    language, chosen by hash rank — the reservoir-sample replacement that
    is reproducible across runs, engines, and partitionings (q67 samples by
    RATE; this guarantees COUNT, e.g. eval-set carving).

    Scale: one window pass partitioned by stratum; the hash order makes the
    choice data-independent, so re-runs and backfills pick identical docs.
    Skewed strata cost their own partition sort only."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("lang", "doc_id", F.row_number().over(w).cast("bigint").alias("rn"))
        .filter(F.col("rn") <= 20)
    )


@query(
    "q139_token_entropy",
    oracle="""
WITH tf AS (
    SELECT tok, CAST(count(*) AS BIGINT) AS c
    FROM (SELECT string_split(text, ' ') AS toks FROM documents), UNNEST(toks) AS u(tok)
    GROUP BY tok
),
s AS (SELECT tok, c, sum(c) OVER () AS n FROM tf)
SELECT CAST(count(*) AS BIGINT) AS vocab,
       CAST(max(n) AS BIGINT)   AS n_tokens,
       round(-sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)), 5)
                                AS entropy_nats,
       round(exp(-sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n))), 3)
                                AS unigram_perplexity
FROM s
""",
)
def q139_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram entropy / perplexity of the corpus token distribution — the
    one-number corpus-health signal (collapsing perplexity across snapshots
    means boilerplate flooding; unusually high means noise/encoding junk).

    Scale: one O(vocab) aggregate after map-side partials; the normalizing
    window runs over the vocab table. Log arguments are exact count
    ratios."""
    d = t(spark, sf_dir, "documents")
    from pyspark.sql import Window

    tf = (
        d.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    s = tf.select("c", F.sum("c").over(Window.partitionBy()).alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    h = -F.sum(p * F.log(p))
    return s.agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.max("n").cast("bigint").alias("n_tokens"),
        F.round(h, 5).alias("entropy_nats"),
        F.round(F.exp(h), 3).alias("unigram_perplexity"),
    )


_BM25_TERMS = ("table", "spark", "fast")
_BM25_K1, _BM25_B = 1.2, 0.75


@query(
    "q141_bm25",
    oracle=f"""
WITH dl AS (
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
    FROM documents
),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(dl) AS sum_dl FROM dl),
tf AS (
    SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         UNNEST(toks) AS u(tok)
    WHERE tok IN ('table', 'spark', 'fast')
    GROUP BY doc_id, tok
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (
    SELECT t.doc_id,
           sum(ln((s.n - d.df + 0.5e0) / (d.df + 0.5e0) + 1.0e0)
               * (t.tf * (1.2e0 + 1.0e0))
               / (t.tf + 1.2e0 * (1.0e0 - 0.75e0
                    + 0.75e0 * l.dl / (CAST(s.sum_dl AS DOUBLE) / s.n)))) AS score
    FROM tf t
    JOIN df d ON t.term = d.term
    JOIN dl l ON t.doc_id = l.doc_id
    CROSS JOIN stats s
    GROUP BY t.doc_id
)
SELECT doc_id, round(score, 4) AS bm25
FROM scored ORDER BY score DESC, doc_id LIMIT 15
""",
)
def q141_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking for a fixed query (k1=1.2, b=0.75) — the relevance
    scorer a search surface needs beyond q78's TF-IDF: length-normalized
    saturating term frequency x smoothed idf, top-15 docs.

    Scale: the per-(doc, matching-term) tf table is filtered MAP-SIDE to
    query terms before any shuffle, so its size is O(matching docs x |q|),
    not O(corpus tokens); df and the corpus length stats are tiny broadcast
    sides. avgdl is derived from an exact integer sum (never avg()) so
    both engines compute identical doubles."""
    from pyspark.sql import Window  # noqa: F401  (pattern parity w/ module)

    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    dl = toks.select("doc_id", F.size("toks").cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    avgdl = F.col("sum_dl").cast("double") / F.col("n")
    idf = F.log((F.col("n") - F.col("df") + 0.5e0) / (F.col("df") + 0.5e0) + 1.0e0)
    contrib = idf * (F.col("tf") * (k1 + 1.0e0)) / (
        F.col("tf") + k1 * (1.0e0 - b + b * F.col("dl") / avgdl)
    )
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(15)
        .select("doc_id", F.round("score", 4).alias("bm25"))
    )


@query(
    "q142_bigram_lm_score",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
big AS (
    SELECT doc_id, u.i AS pos,
           toks[CAST(u.i AS INTEGER)]     AS w1,
           toks[CAST(u.i AS INTEGER) + 1] AS w2
    FROM toks, UNNEST(range(1, greatest(len(toks) - 1, 0) + 1)) AS u(i)
),
uni AS (
    SELECT tok AS w1, CAST(count(*) AS BIGINT) AS c1
    FROM toks, UNNEST(toks) AS u(tok) GROUP BY tok
),
bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM big GROUP BY w1, w2),
v AS (SELECT CAST(count(*) AS BIGINT) AS vocab FROM uni)
SELECT b.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(ln((bc.c12 + 1.0e0) / (u.c1 + v.vocab))), 4) AS avg_logp,
       round(exp(-avg(ln((bc.c12 + 1.0e0) / (u.c1 + v.vocab)))), 2) AS ppl
FROM big b
JOIN bc  ON b.w1 = bc.w1 AND b.w2 = bc.w2
JOIN uni u ON b.w1 = u.w1
CROSS JOIN v
GROUP BY b.doc_id
""",
)
def q142_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model pseudo-perplexity per document (add-one
    smoothing, corpus-trained) — CCNet-style LM quality filtering: docs
    whose bigrams are improbable under the corpus model (high ppl) are
    noise candidates; suspiciously LOW ppl flags boilerplate.

    Scale: the bigram count table is bounded by vocab^2 and the unigram
    table by vocab, both broadcastable; the per-doc bigram stream is
    map-generated (zip_with on shifted slices, same as word_shingles) and
    joins against those broadcasts, then aggregates per doc. P values are
    exact integer ratios, so both engines log identical doubles."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    big = toks.select(
        "doc_id", F.explode(word_shingles(F.col("toks"), 2)).alias("bg")
    ).select(
        "doc_id",
        F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    uni = (
        toks.select(F.explode("toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    )
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    v = uni.agg(F.count(F.lit(1)).cast("bigint").alias("vocab"))
    logp = F.log(
        (F.col("c12") + 1.0e0) / (F.col("c1") + F.col("vocab"))
    )
    return (
        big.join(F.broadcast(bc), ["w1", "w2"])
        .join(F.broadcast(uni), "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg(logp), 4).alias("avg_logp"),
            F.round(F.exp(-F.avg(logp)), 2).alias("ppl"),
        )
    )


@query(
    "q144_corpus_pipeline",
    oracle="""
WITH gated AS (
    SELECT doc_id, text FROM (
        SELECT doc_id, text,
               len(string_split(text, ' ')) AS n_tok,
               CAST(n_chars - len(string_split(text, ' ')) + 1 AS DOUBLE)
                   / len(string_split(text, ' ')) AS avg_len,
               CAST(n_chars - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                   / n_chars AS digit_frac
        FROM documents WHERE n_chars > 0
    )
    WHERE (n_tok BETWEEN 5 AND 2000)
      AND (avg_len >= 2 AND avg_len <= 12)
      AND (digit_frac <= 0.2)
),
deduped AS (
    SELECT doc_id, text FROM (
        SELECT doc_id, text,
               row_number() OVER (
                   PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   ORDER BY doc_id) AS rn
        FROM gated
    ) WHERE rn = 1
)
SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT)                         AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM (SELECT doc_id, text,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 AS b
      FROM deduped)
GROUP BY split
""",
)
def q144_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus build composing the pipeline stages as one plan:
    quality gate (q66's rules) -> exact dedup keep-first (q50/q59's
    fingerprint) -> reproducible split (q87's hash buckets) -> per-split
    token budget. The point is COMPOSITION: every stage is a
    DataFrame->DataFrame transform, so Catalyst optimizes the whole
    pipeline as one plan (the gate's predicates run in the same scan that
    feeds the fingerprint).

    Scale: gate is map-side; dedup is the one corpus-keyed shuffle; split
    and stats are map + an O(splits) aggregate."""
    from stream_cdc_gps_spark.functions.text import fingerprint
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    n_tok = F.size(tokens(F.col("text")))
    avg_len = (F.col("n_chars") - n_tok + 1).cast("double") / n_tok
    digit_frac = (
        F.col("n_chars") - F.length(F.regexp_replace("text", "[0-9]", ""))
    ).cast("double") / F.col("n_chars")
    gated = d.filter(
        n_tok.between(5, 2000)
        & (avg_len >= 2)
        & (avg_len <= 12)
        & (digit_frac <= 0.2)
    ).select("doc_id", "text")
    w = Window.partitionBy(fingerprint(F.col("text"))).orderBy("doc_id")
    deduped = (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    b = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "bigint"
    ) % 100
    split = F.when(b < 90, "train").when(b < 95, "val").otherwise("test")
    return deduped.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).cast("bigint").alias("n_tokens"),
    )


# ln(2) written identically on both engines: JSD in nats / _LN2 = bits.
_JSD_LN2 = "0.6931471805599453e0"


@query(
    "q173_source_divergence",
    oracle=f"""
WITH tc AS (
    SELECT source, tok AS token, count(*) AS n
    FROM (SELECT source, string_split(text, ' ') AS toks FROM documents),
         UNNEST(toks) AS u(tok)
    GROUP BY source, tok
),
tot AS (SELECT source, sum(n) AS total FROM tc GROUP BY source),
p AS (
    SELECT tc.source, tc.token, tc.n * 1.0e0 / tot.total AS prob
    FROM tc JOIN tot USING (source)
),
shared AS (
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared,
           sum(a.prob * ln(2.0e0 * a.prob / (a.prob + b.prob))
             + b.prob * ln(2.0e0 * b.prob / (a.prob + b.prob))) AS kl_shared,
           sum(a.prob) AS pa_shared, sum(b.prob) AS pb_shared
    FROM p a JOIN p b ON a.token = b.token AND a.source < b.source
    GROUP BY a.source, b.source
),
pairs AS (
    SELECT a.source AS source_a, b.source AS source_b
    FROM tot a JOIN tot b ON a.source < b.source
)
SELECT pr.source_a, pr.source_b,
       COALESCE(s.n_shared, 0) AS n_shared,
       round((0.5e0 * COALESCE(s.kl_shared, 0.0e0)
              + 0.5e0 * {_JSD_LN2}
                * (2.0e0 - COALESCE(s.pa_shared, 0.0e0)
                         - COALESCE(s.pb_shared, 0.0e0)))
             / {_JSD_LN2}, 6) AS jsd_bits
FROM pairs pr
LEFT JOIN shared s
  ON s.source_a = pr.source_a AND s.source_b = pr.source_b
""",
)
def q173_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (in bits) between every pair of sources'
    unigram distributions — the corpus-curation probe for which feeds are
    interchangeable and which bring genuinely different text (mixture
    design, duplicate-feed detection; complements q74's count matrix with
    a distributional distance).

    The disjoint-support mass needs no outer join: a token present only in
    P contributes 0.5*p*ln2 to JSD, so the out-of-overlap term collapses
    to 0.5*ln2*(2 - sum_shared p - sum_shared q) and ONE inner equi-join
    on token covers everything. Every pair of sources appears in the output
    (r5 advice): the full pair set comes from the tiny per-source totals,
    left-joined to the shared aggregate with the shared sums coalesced to
    0, so a zero-overlap pair reports jsd_bits = 1 instead of vanishing.
    Scale: token-keyed join between two per-source distributions (each a
    fraction of the vocab), per-pair aggregate on |sources|^2 keys; the
    pair frame and shared aggregate are |sources|^2 rows — broadcast-sized
    by construction. JSD is symmetric and bounded [0, 1] in bits —
    asserted in tests."""
    d = t(spark, sf_dir, "documents")
    tc = (
        d.select("source", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = tc.groupBy("source").agg(F.sum("n").alias("total"))
    # materialize the per-source distribution ONCE: both pair-join sides
    # consume it, and Catalyst does not share identical subplans across a
    # self-join — without truncation the tokenize+count pass runs twice
    p = (
        tc.join(tot, "source")
        .select(
            "source", "token", (F.col("n") * F.lit(1.0e0) / F.col("total")).alias("prob")
        )
        .localCheckpoint()
    )
    a = p.select(
        F.col("source").alias("source_a"), "token", F.col("prob").alias("pa")
    )
    b = p.select(
        F.col("source").alias("source_b"), F.col("token").alias("token_b"),
        F.col("prob").alias("pb"),
    )
    ln2 = F.lit(0.6931471805599453e0)
    m = F.col("pa") + F.col("pb")
    shared = (
        a.join(b, (F.col("token") == F.col("token_b")) & (F.col("source_a") < F.col("source_b")))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared"),
            F.sum(
                F.col("pa") * F.log(F.lit(2.0e0) * F.col("pa") / m)
                + F.col("pb") * F.log(F.lit(2.0e0) * F.col("pb") / m)
            ).alias("kl_shared"),
            F.sum("pa").alias("pa_shared"),
            F.sum("pb").alias("pb_shared"),
        )
    )
    pairs = (
        tot.select(F.col("source").alias("source_a"))
        .join(
            tot.select(F.col("source").alias("source_b")),
            F.col("source_a") < F.col("source_b"),
        )
    )
    return pairs.join(F.broadcast(shared), ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        F.coalesce(F.col("n_shared"), F.lit(0).cast("bigint")).alias("n_shared"),
        F.round(
            (
                F.lit(0.5e0) * F.coalesce(F.col("kl_shared"), F.lit(0.0e0))
                + F.lit(0.5e0)
                * ln2
                * (
                    F.lit(2.0e0)
                    - F.coalesce(F.col("pa_shared"), F.lit(0.0e0))
                    - F.coalesce(F.col("pb_shared"), F.lit(0.0e0))
                )
            )
            / ln2,
            6,
        ).alias("jsd_bits"),
    )


# q211: hybrid retrieval — three fixed "information needs", each a BM25 term
# set plus a query embedding (the document's own vector space: vec_id ==
# doc_id in the synthetic corpus). Ranks are computed on 6-dp-rounded scores
# (the q60 idiom) so both engines rank identical values; RRF_K = 60 is the
# published constant (Cormack et al., SIGIR'09).
_RRF_QUERIES = ((1, ("table", "spark"), 490), (2, ("fast", "query"), 491), (3, ("data", "join"), 492))
_RRF_K = 60
_RRF_TOPB = 20  # per-system candidate depth
_RRF_TOPK = 10  # fused output depth

_RRF_TERMS_SQL = ", ".join(
    f"({qid}, '{term}')" for qid, terms, _ in _RRF_QUERIES for term in terms
)
_RRF_QVEC_SQL = ", ".join(f"({qid}, {qv})" for qid, _, qv in _RRF_QUERIES)
_RRF_ALL_TERMS_SQL = ", ".join(
    sorted({f"'{term}'" for _, terms, _ in _RRF_QUERIES for term in terms})
)

# DuckDB-side cosine: the ONE sequential-fold template lives in
# operators/similarity.py next to its Spark mirror (functions/vector.py) —
# a second copy here would silently diverge if the accumulation-order
# contract ever changes.
from stream_cdc_gps_spark.operators.similarity import _sql_cosine as _rrf_cos_sql


@query(
    "q211_hybrid_rrf_search",
    oracle=f"""
WITH q_terms(qid, term) AS (VALUES {_RRF_TERMS_SQL}),
q_vec(qid, qvec_id) AS (VALUES {_RRF_QVEC_SQL}),
dl AS (
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
    FROM documents
),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(dl) AS sum_dl FROM dl),
tf AS (
    SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         UNNEST(toks) AS u(tok)
    WHERE tok IN ({_RRF_ALL_TERMS_SQL})
    GROUP BY doc_id, tok
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
bm25 AS (
    SELECT qt.qid, t.doc_id,
           round(sum(ln((s.n - d.df + 0.5e0) / (d.df + 0.5e0) + 1.0e0)
               * (t.tf * ({_BM25_K1}e0 + 1.0e0))
               / (t.tf + {_BM25_K1}e0 * (1.0e0 - {_BM25_B}e0
                    + {_BM25_B}e0 * l.dl / (CAST(s.sum_dl AS DOUBLE) / s.n)))), 6)
               AS score
    FROM q_terms qt
    JOIN tf t ON t.term = qt.term
    JOIN df d ON t.term = d.term
    JOIN dl l ON t.doc_id = l.doc_id
    CROSS JOIN stats s
    GROUP BY qt.qid, t.doc_id
),
b_rank AS (
    SELECT b.qid, b.doc_id,
           row_number() OVER (PARTITION BY b.qid
                              ORDER BY b.score DESC, b.doc_id) AS rank_b
    FROM bm25 b JOIN q_vec v ON b.qid = v.qid
    WHERE b.doc_id != v.qvec_id
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
cos AS (
    SELECT v.qid, c.vec_id AS doc_id,
           round({_rrf_cos_sql("q.emb", "c.emb")}, 6) AS cos_sim
    FROM q_vec v
    JOIN e q ON q.vec_id = v.qvec_id
    JOIN e c ON c.vec_id != v.qvec_id
),
v_rank AS (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cos_sim DESC, doc_id) AS rank_v
    FROM cos
),
fused AS (
    SELECT coalesce(b.qid, v.qid) AS qid,
           coalesce(b.doc_id, v.doc_id) AS doc_id,
           b.rank_b, v.rank_v,
           coalesce(1.0e0 / ({_RRF_K} + b.rank_b), 0.0e0)
             + coalesce(1.0e0 / ({_RRF_K} + v.rank_v), 0.0e0) AS rrf
    FROM (SELECT * FROM b_rank WHERE rank_b <= {_RRF_TOPB}) b
    FULL OUTER JOIN (SELECT * FROM v_rank WHERE rank_v <= {_RRF_TOPB}) v
      ON b.qid = v.qid AND b.doc_id = v.doc_id
)
SELECT qid, doc_id, rank_b, rank_v, round(rrf, 6) AS rrf FROM (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY rrf DESC, doc_id) AS rn
    FROM fused
) WHERE rn <= {_RRF_TOPK}
""",
)
def q211_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID RETRIEVAL with reciprocal-rank fusion — the RAG-serving
    staple the lexical (q141 BM25) and dense (q60 cosine) rows compose
    into: for each query, rank documents by BM25 over its term set AND by
    cosine against its query embedding, then fuse the two top-20 lists
    with RRF (score = Σ 1/(60 + rank), Cormack et al.) and emit the fused
    top-10. Absent-from-one-system candidates contribute only the present
    system's term (the standard convention), so the FULL OUTER merge of
    the two ranked lists is part of the operator.

    Both ranks are computed over 6-dp-rounded scores with doc-id tiebreaks
    so the differential ranks are engine-stable (the q60/q141 idiom).

    Scale: the BM25 side filters to query terms MAP-SIDE before any
    shuffle (O(matching docs × |q|)); the dense side broadcasts the
    query vectors against the embedding scan (the q60 exact baseline —
    swap in the IVF path of q187 for 10⁹ vectors); fusion itself touches
    only 2 × top-B rows per query. No corpus-sized shuffle anywhere."""
    d = t(spark, sf_dir, "documents")
    from stream_cdc_gps_spark.functions.vector import as_double, cosine

    q_terms = spark.createDataFrame(
        [(qid, term) for qid, terms, _ in _RRF_QUERIES for term in terms],
        "qid int, term string",
    )
    q_vec = spark.createDataFrame(
        [(qid, qv) for qid, _, qv in _RRF_QUERIES], "qid int, qvec_id bigint"
    )
    all_terms = sorted({term for _, terms, _ in _RRF_QUERIES for term in terms})

    toks = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    dl = toks.select("doc_id", F.size("toks").cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*all_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    avgdl = F.col("sum_dl").cast("double") / F.col("n")
    idf = F.log((F.col("n") - F.col("df") + 0.5e0) / (F.col("df") + 0.5e0) + 1.0e0)
    contrib = idf * (F.col("tf") * (k1 + 1.0e0)) / (
        F.col("tf") + k1 * (1.0e0 - b + b * F.col("dl") / avgdl)
    )
    bm25 = (
        tf.join(F.broadcast(q_terms), "term")
        .join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    wb = Window.partitionBy("qid").orderBy(F.desc("score"), "doc_id")
    b_rank = (
        bm25.join(F.broadcast(q_vec), "qid")
        .filter(F.col("doc_id") != F.col("qvec_id"))
        .select("qid", "doc_id", F.row_number().over(wb).alias("rank_b"))
        .filter(F.col("rank_b") <= _RRF_TOPB)
    )

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    qe = (
        F.broadcast(q_vec)
        .join(e, F.col("qvec_id") == F.col("vec_id"))
        .select("qid", "qvec_id", F.col("emb").alias("q_emb"))
    )
    cos = (
        e.crossJoin(F.broadcast(qe))
        .filter(F.col("vec_id") != F.col("qvec_id"))
        .select(
            "qid",
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("q_emb"), F.col("emb")), 6).alias("cos_sim"),
        )
    )
    wv = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "doc_id")
    v_rank = cos.select(
        "qid", "doc_id", F.row_number().over(wv).alias("rank_v")
    ).filter(F.col("rank_v") <= _RRF_TOPB)

    fused = (
        b_rank.join(v_rank, ["qid", "doc_id"], "full_outer")
        .select(
            "qid",
            "doc_id",
            "rank_b",
            "rank_v",
            (
                F.coalesce(1.0e0 / (F.lit(_RRF_K) + F.col("rank_b")), F.lit(0.0e0))
                + F.coalesce(1.0e0 / (F.lit(_RRF_K) + F.col("rank_v")), F.lit(0.0e0))
            ).alias("rrf"),
        )
    )
    wf = Window.partitionBy("qid").orderBy(F.desc("rrf"), "doc_id")
    return (
        fused.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= _RRF_TOPK)
        .select("qid", "doc_id", "rank_b", "rank_v", F.round("rrf", 6).alias("rrf"))
    )
