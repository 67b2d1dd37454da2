"""Deduplication operators over the documents table (training-data pipeline).

Scale design: every variant avoids O(n²) comparison. Exact dedup groups on a
content hash; MinHash/LSH only pairs documents that collide in a band bucket;
Jaccard is computed only for candidate pairs that share a shingle. At 100 TB
the shuffles are all on hash/band keys — uniform by construction — and the
per-document shingle/signature work is embarrassingly parallel column math.

The md5-based MinHash (min over shingles of md5(seed|shingle), compared as
hex strings) is chosen over xxhash64 so the DuckDB oracle can reproduce the
exact signatures: md5 is bit-identical everywhere, and taking the MIN of hex
strings is a valid uniform min-hash on a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_cdc_gps_spark.functions.text import fingerprint, word_shingles
from stream_cdc_gps_spark.operators.common import t
from stream_cdc_gps_spark.registry import query

SQL_DOT_AB = "list_reduce(list_transform(range(1, len(a.emb) + 1), i -> a.emb[i] * b.emb[i]), (acc, x) -> acc + x)"
SQL_DOT_AA = "list_reduce(list_transform(range(1, len(a.emb) + 1), i -> a.emb[i] * a.emb[i]), (acc, x) -> acc + x)"
SQL_DOT_BB = "list_reduce(list_transform(range(1, len(b.emb) + 1), i -> b.emb[i] * b.emb[i]), (acc, x) -> acc + x)"

N_MINHASH = 6
BAND_SIZE = 2  # 3 bands of 2 hashes each

# Hot-bucket guard: a shingle or band key shared by more than this many docs
# contributes O(df²) candidate pairs with almost no signal (a stop-shingle
# like "the the the" or a degenerate band key). Standard near-dup practice
# drops these posting lists before pair expansion — the cap bounds per-bucket
# work at MAX_POSTING² regardless of corpus size, which is what keeps the
# expansion stage O(n · MAX_POSTING) instead of quadratic at 100 TB. The cap
# is applied identically in the DuckDB oracles so parity still holds.
MAX_POSTING = 64

# Distinct word-3-gram shingles per doc, identically in SQL (chr(32)=space to
# survive any quoting) and DataFrame form.
SHINGLES_SQL = """
SELECT DISTINCT doc_id, tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2] AS sh
FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents),
     UNNEST(range(1, len(tokens) - 1)) AS r(i)
"""

_MINHASH_COLS = ", ".join(
    f"min(md5('{k}|' || sh)) AS h{k}" for k in range(N_MINHASH)
)
MINHASH_SQL = f"SELECT doc_id, {_MINHASH_COLS} FROM ({SHINGLES_SQL}) GROUP BY doc_id"

_BAND_SELECTS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, h{BAND_SIZE * b} || h{BAND_SIZE * b + 1} AS band_key"
    f" FROM mh"
    for b in range(N_MINHASH // BAND_SIZE)
)


def bucket_pair_expand(
    buckets: DataFrame, ids: str = "ids", keep: tuple[str, ...] = ()
) -> DataFrame:
    """Expand each bucket's sorted element array into ordered pairs (a, b)
    with a before b in array order — array HOFs inside one projection, no
    self-join, no extra shuffle. Elements may be atoms or structs.
    ``keep`` columns ride along unchanged (the incremental index keeps the
    bucket key on each pair so retraction can target a bucket).

    Callers must cap bucket size first (``MAX_POSTING``): expansion is
    O(|bucket|²) by nature, and the cap is what makes that a constant."""
    c = F.col(ids)
    pairs = F.flatten(
        F.transform(
            c,
            lambda x, i: F.transform(
                F.slice(c, i + F.lit(2), F.size(c)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return buckets.select(*keep, F.explode(pairs).alias("p")).select(
        *keep, "p.a", "p.b"
    )


def shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, shingle) pairs — explode happens here, once."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.split("text", " ").alias("toks"))
        .select("doc_id", F.explode(word_shingles(F.col("toks"), 3)).alias("sh"))
        .filter(F.col("sh") != "")
        .distinct()
    )


def shingle_arrays_of(d: DataFrame) -> DataFrame:
    """(doc_id, array of shingles) — per-row, no explode/shuffle.

    No array_distinct: min-hash is duplicate-invariant (min over a multiset
    equals min over its distinct set), so signatures match the oracle's
    DISTINCT-shingle formulation without paying for per-row dedup.

    Gated scan spread (r14, the q181 idiom): everything downstream of
    this frame is compute-dense per-row work (S shingle concats, then
    6·S md5s in the MinHash paths), but the sf corpus ships as
    single-row-group parquet, so the whole signature stage ran on ONE
    scan task (measured: 1.78 s vs 0.94 s spread for the q52 signature
    pass at sf0.1). On a healthy multi-row-group layout the gate is a
    no-op and the stage inherits the scan's own parallelism — an
    unconditional repartition would shuffle every document's text at
    100 TB for nothing."""
    par = d.sparkSession.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par, "doc_id")
    toks = d.select("doc_id", F.split("text", " ").alias("toks"))
    shs = F.filter(word_shingles(F.col("toks"), 3), lambda s: s != "")
    return toks.select("doc_id", shs.alias("shs")).filter(F.size("shs") > 0)


def _shingle_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shingle_arrays_of(t(spark, sf_dir, "documents"))


def minhash_signatures_of(d: DataFrame) -> DataFrame:
    """K min-hashes per doc as pure per-row array math — ZERO shuffles.

    array_min over md5(seed|shingle) of the per-doc distinct-shingle array is
    the same min the explode→groupBy plan computes, but stays entirely inside
    codegen: at 100 TB the signature stage is an embarrassingly parallel map
    with no exchange (the explode version shuffles O(total shingles) rows).
    Takes the documents frame directly so the incremental index (streaming/
    dedup_index.py) can run the identical stage over a micro-batch."""
    sh = shingle_arrays_of(d)

    def minhash_col(k: int):
        # NB: the lambda must stay single-argument — pyspark treats a
        # two-parameter lambda (even with a default) as (element, index).
        seed = f"{k}|"
        return F.array_min(
            F.transform("shs", lambda s: F.md5(F.concat(F.lit(seed), s)))
        ).alias(f"h{k}")

    return sh.select("doc_id", *[minhash_col(k) for k in range(N_MINHASH)])


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signatures_of(t(spark, sf_dir, "documents"))


def band_tuples_of(d: DataFrame) -> DataFrame:
    """LSH banding: (doc_id, band, band_key) via ONE posexplode pass.

    A single plan node instead of a per-band union — the signature stage is
    computed once, not once per band."""
    mh = minhash_signatures_of(d)
    keys = F.array(
        *[
            F.concat(F.col(f"h{BAND_SIZE * b}"), F.col(f"h{BAND_SIZE * b + 1}"))
            for b in range(N_MINHASH // BAND_SIZE)
        ]
    )
    return mh.select("doc_id", F.posexplode(keys).alias("band", "band_key"))


def band_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return band_tuples_of(t(spark, sf_dir, "documents"))


@query(
    "q50_dedup_exact",
    oracle="""
SELECT h, CAST(n AS BIGINT) AS n, keeper FROM (
    SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keeper
    FROM documents GROUP BY md5(text)
) WHERE n > 1
""",
)
def q50_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group identical content hashes, keep the min doc_id.

    The 100 TB plan: one shuffle on a 128-bit uniform key — no skew possible
    beyond true duplicate groups."""
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n") > 1)
    )


@query(
    "q51_dedup_fingerprint",
    oracle="""
SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
FROM documents WHERE doc_id < 200
""",
)
def q51_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalizing fingerprint (lowercase + whitespace collapse + md5) —
    catches trivially-reformatted duplicates that exact hashing misses."""
    d = t(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 200).select("doc_id", fingerprint(F.col("text")).alias("fp"))


@query(
    "q52_minhash_signatures",
    oracle=MINHASH_SQL,
)
def q52_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (K=6) per document."""
    return minhash_signatures(spark, sf_dir)


# The all-at-once LSH candidate-pair result — q53's oracle, and ALSO
# q177's: the incremental index's parity contract is that a sliced replay
# lands exactly this relation.
LSH_PAIRS_SQL = f"""
WITH mh AS ({MINHASH_SQL}),
bands AS ({_BAND_SELECTS}),
ok AS (SELECT band, band_key FROM bands
       GROUP BY band, band_key HAVING count(*) <= {MAX_POSTING})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
FROM bands a JOIN ok USING (band, band_key)
JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


@query(
    "q53_lsh_candidate_pairs",
    oracle=LSH_PAIRS_SQL,
)
def q53_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates: docs colliding in ≥1 LSH band.

    Plan: ONE pass over the signature stage, ONE exchange. Grouping on
    (band, band_key) collects each bucket's doc ids, and pairs are generated
    inside the bucket with array higher-order functions — vs the naive
    self-join, which evaluates the (shuffle-free, so not reusable) MinHash
    subtree twice and shuffles both sides. Buckets are tiny by construction
    (band_key is 2 concatenated md5s); a degenerate band key (e.g. all-empty
    shingles) is dropped by the MAX_POSTING cap before expansion, bounding
    the quadratic tail."""
    bands = band_buckets(spark, sf_dir)
    buckets = (
        bands.groupBy("band", "band_key")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= MAX_POSTING))
    )
    return (
        bucket_pair_expand(buckets)
        .select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


@query(
    "q177_lsh_incremental_parity",
    oracle=LSH_PAIRS_SQL,
)
def q177_lsh_incremental_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LSH dedup (streaming/dedup_index.py) replayed over a
    2-slice split of the corpus — even doc_ids land first, odd second, an
    interleaved arrival order harsher than a prefix split — then the
    index's ``pairs()`` snapshot. The oracle is q53's OWN SQL: the parity
    contract "incremental == all-at-once, cap included" is itself the
    driver-checked claim, covering the cap-crossing retraction path on
    every bucket the second slice pushes past MAX_POSTING.

    Scale: two merges, each = one map-only signature pass over its slice +
    one band-key semi join against the posting store + bounded per-bucket
    expansion (see the module docstring for the 100 TB layout). The
    streaming (foreachBatch + checkpoint + replay) form of the same class
    is pytest-verified in tests/test_streaming.py."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.dedup_index import IncrementalLshIndex

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="lsh_idx_")
    try:
        idx = IncrementalLshIndex(spark, base)
        idx.merge(d.filter(F.col("doc_id") % 2 == 0), 0)
        idx.merge(d.filter(F.col("doc_id") % 2 == 1), 1)
        # materialize before the temp state dir is removed
        return idx.pairs().localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "q54_ngram_jaccard",
    oracle=f"""
WITH sh AS ({SHINGLES_SQL}),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
ok AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= {MAX_POSTING}),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM sh a JOIN ok USING (sh)
    JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = doc_a
           JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.2
""",
)
def q54_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle.

    Candidate generation by shingle bucket (inverted-index style), then
    |A∩B| / (|A|+|B|-|A∩B|); only near-dup pairs (≥0.2) survive.

    TWO exchanges, zero joins: each doc's distinct-shingle set is built
    per-row (array_distinct — map-only), so its TRUE size ``n_sh`` is known
    before the explode and rides along into the posting-list buckets; pairs
    expanded in-bucket then carry both sizes, making the Jaccard denominator
    a plain expression instead of two post-hoc joins against a sizes table
    (the previous design paid 7 exchanges for the same answer).
    Stop-shingles (document frequency > MAX_POSTING) are dropped before
    expansion on both sides — they carry ~zero Jaccard signal and are the
    one input that would make a bucket quadratic at corpus scale. Sizes stay
    TRUE per-doc counts; only the candidate/intersection side is capped."""
    sh = _shingle_arrays(spark, sf_dir)
    docs = sh.select(
        "doc_id", F.array_distinct("shs").alias("shs")
    ).withColumn("n_sh", F.size("shs"))
    exploded = docs.select("doc_id", "n_sh", F.explode("shs").alias("sh"))
    buckets = (
        exploded.groupBy("sh")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n_sh"))).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= MAX_POSTING))
    )
    inter = (
        bucket_pair_expand(buckets)
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.filter(jac >= 0.2)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# 64-bit SimHash, represented as two 32-bit halves (sim_hi = bits 32..63,
# sim_lo = bits 0..31) so every intermediate stays inside signed-BIGINT range
# on both engines (conv()/CAST of a full 16-hex-char value would overflow).
# Bit b's vote comes from bit (b%8) of md5 byte (b//8) of the token hash.
_SIMHASH_SUMS = ",\n       ".join(
    f"sum(CASE WHEN (('0x' || substr(h, {2 * (b // 8) + 1}, 2))::BIGINT >> {b % 8}) & 1 = 1"
    f" THEN 1 ELSE -1 END) AS s{b}"
    for b in range(64)
)
_SIMHASH_HI = " + ".join(
    f"(CASE WHEN s{b} > 0 THEN {1 << (b - 32)} ELSE 0 END)" for b in range(32, 64)
)
_SIMHASH_LO = " + ".join(
    f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(0, 32)
)
SIMHASH_SQL = f"""
WITH tok AS (
    SELECT doc_id, md5(t) AS h
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         UNNEST(toks) AS u(t)
),
s AS (SELECT doc_id, {_SIMHASH_SUMS} FROM tok GROUP BY doc_id)
SELECT doc_id,
       CAST({_SIMHASH_HI} AS BIGINT) AS sim_hi,
       CAST({_SIMHASH_LO} AS BIGINT) AS sim_lo
FROM s
"""


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sim_hi, sim_lo): REAL 64-bit SimHash as two 32-bit halves.

    All 64 per-bit vote sums run in ONE groupBy(doc_id) — 64 conditional-sum
    aggregate columns with map-side partials, zero explode beyond the token
    explode itself (the round-2 8-bit version exploded a bit index per token;
    this computes 8× the bits with one exchange less). The shift amounts and
    byte offsets are compile-time literals, so the whole vote matrix stays
    inside whole-stage codegen."""
    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("t")).withColumn(
        "h", F.md5("t")
    )

    def byte(j: int):
        return F.conv(F.substring("h", 2 * j + 1, 2), 16, 10).cast("bigint")

    votes = [
        F.sum(
            F.when(F.shiftright(byte(b // 8), b % 8) % 2 == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(64)
    ]
    s = tok.groupBy("doc_id").agg(*votes)
    hi = sum(
        (F.when(F.col(f"s{b}") > 0, F.lit(1 << (b - 32))).otherwise(0) for b in range(32, 64)),
        F.lit(0),
    )
    lo = sum(
        (F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(0) for b in range(0, 32)),
        F.lit(0),
    )
    return s.select(
        "doc_id", hi.cast("bigint").alias("sim_hi"), lo.cast("bigint").alias("sim_lo")
    )


@query("q55_simhash", oracle=SIMHASH_SQL)
def q55_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (sign of per-bit token-hash votes),
    emitted as two 32-bit halves — the production-width signature (the
    round-2 8-bit toy width is gone; same plan, full width, per the Charikar
    / Manku-Jain-Das-Sarma design). Near-dup test is hamming distance ≤ k
    over the 64 bits (q58)."""
    return simhash_signatures(spark, sf_dir)


@query(
    "q58_simhash_pairs",
    oracle=f"""
WITH sims AS ({SIMHASH_SQL}),
quarters AS (
    SELECT doc_id, sim_hi, sim_lo, 0 AS q_idx, sim_lo % 65536 AS q_val FROM sims
    UNION ALL
    SELECT doc_id, sim_hi, sim_lo, 1, sim_lo // 65536 FROM sims
    UNION ALL
    SELECT doc_id, sim_hi, sim_lo, 2, sim_hi % 65536 FROM sims
    UNION ALL
    SELECT doc_id, sim_hi, sim_lo, 3, sim_hi // 65536 FROM sims
),
ok AS (SELECT q_idx, q_val FROM quarters
       GROUP BY q_idx, q_val HAVING count(*) <= {MAX_POSTING}),
cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           min(a.sim_hi) AS ha, min(a.sim_lo) AS la,
           min(b.sim_hi) AS hb, min(b.sim_lo) AS lb
    FROM quarters a JOIN ok USING (q_idx, q_val)
    JOIN quarters b
      ON a.q_idx = b.q_idx AND a.q_val = b.q_val AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 3
""",
)
def q58_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairing at the REAL 64-bit width: candidates at
    hamming distance ≤ 3.

    Pigeonhole banding (Manku/Jain/Das Sarma): split the 64-bit signature
    into four 16-bit quarters — any pair differing in ≤ 3 bits agrees
    exactly on at least one quarter. Bucket on (q_idx, q_val), expand pairs
    in-bucket (array HOFs, no self-join), verify true hamming with
    bit_count(xor) over both halves. 2^16 quarter values keep buckets tiny
    at corpus scale; a pathological hot quarter (e.g. boilerplate-dominated
    corpora voting the same signs) is dropped by the MAX_POSTING cap before
    expansion — mirrored in the oracle — bounding in-bucket work exactly as
    q53/q54 do."""
    sims = simhash_signatures(spark, sf_dir)
    quarters = sims.select(
        "doc_id",
        "sim_hi",
        "sim_lo",
        F.posexplode(
            F.array(
                F.col("sim_lo") % 65536,
                F.floor(F.col("sim_lo") / 65536).cast("bigint"),
                F.col("sim_hi") % 65536,
                F.floor(F.col("sim_hi") / 65536).cast("bigint"),
            )
        ).alias("q_idx", "q_val"),
    )
    buckets = (
        quarters.groupBy("q_idx", "q_val")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "sim_hi", "sim_lo"))
            ).alias("ids")
        )
        .filter((F.size("ids") > 1) & (F.size("ids") <= MAX_POSTING))
    )
    cand = (
        bucket_pair_expand(buckets)
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.min("a.sim_hi").alias("ha"),
            F.min("a.sim_lo").alias("la"),
            F.min("b.sim_hi").alias("hb"),
            F.min("b.sim_lo").alias("lb"),
        )
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) + F.bit_count(
        F.col("la").bitwiseXOR(F.col("lb"))
    )
    return cand.filter(ham <= 3).select(
        "doc_a", "doc_b", ham.cast("int").alias("hamming")
    )


_Q56_BANDS_SQL = " UNION ALL ".join(
    f"""SELECT vec_id, {g} AS band,
       list_sum(list_transform(range(0, 16),
         i -> CASE WHEN emb[{g} * 16 + i + 1] > 0
                   THEN (1::BIGINT << (15 - i)) ELSE 0 END)) AS band_key
FROM e"""
    for g in range(4)
)


@query(
    "q56_embedding_near_dup",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
bands AS ({_Q56_BANDS_SQL}),
ok AS (SELECT band, band_key FROM bands
       GROUP BY band, band_key HAVING count(*) <= {MAX_POSTING}),
cand AS (
    SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
    FROM bands x JOIN ok USING (band, band_key)
    JOIN bands y
      ON x.band = y.band AND x.band_key = y.band_key AND x.vec_id < y.vec_id
)
SELECT c.vec_a, c.vec_b,
       round(({SQL_DOT_AB}) / (sqrt({SQL_DOT_AA}) * sqrt({SQL_DOT_BB})), 6) AS cos_sim
FROM cand c JOIN e a ON a.vec_id = c.vec_a JOIN e b ON b.vec_id = c.vec_b
WHERE ({SQL_DOT_AB}) / (sqrt({SQL_DOT_AA}) * sqrt({SQL_DOT_BB})) >= 0.3
""",
)
def q56_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection via MULTI-TABLE sign-LSH.

    Four independent hash tables, one per 16-dimension block: a pair is a
    candidate iff the two vectors agree on the full sign pattern of at least
    one block (standard-basis random-hyperplane LSH, L=4 tables × k=16 bits).
    Cosine is computed only for candidates; pairs >= 0.3 survive (random
    64-d cosines concentrate at 0 ± 0.125, so 0.3 = 2.4σ marks genuine
    outlier similarity).

    Scale: 2^16 buckets PER TABLE keeps expected bucket size n/65536 — the
    round-2 single-table 8-bit width (256 buckets) went quadratic in-bucket
    at corpus scale; k=16 defers that by 256× and the MAX_POSTING cap bounds
    the pathological tail (mirrored in the oracle). L=4 tables buy back the
    recall that a single wider table loses — the textbook L·p^k trade —
    while candidate generation stays a capped bucket expansion, never a
    cross join."""
    from stream_cdc_gps_spark.functions.vector import as_double, cosine

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )

    def band_key(g: int):
        key = F.lit(0)
        for i in range(16):
            key = key * 2 + F.when(
                F.element_at("emb", g * 16 + i + 1) > 0, 1
            ).otherwise(0)
        return key.cast("bigint")

    bands = e.select(
        "vec_id",
        "emb",
        F.posexplode(F.array(*[band_key(g) for g in range(4)])).alias(
            "band", "band_key"
        ),
    )
    buckets = (
        bands.groupBy("band", "band_key")
        .agg(F.array_sort(F.collect_list(F.struct("vec_id", "emb"))).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= MAX_POSTING))
    )
    cand = (
        bucket_pair_expand(buckets)
        .groupBy(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .agg(F.first("a.emb").alias("emb_a"), F.first("b.emb").alias("emb_b"))
    )
    sim = cosine(F.col("emb_a"), F.col("emb_b"))
    return (
        cand.filter(sim >= 0.3)
        .select("vec_a", "vec_b", F.round(sim, 6).alias("cos_sim"))
    )


_PAIRS_SQL = f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a
JOIN (SELECT band, band_key FROM bands
      GROUP BY band, band_key HAVING count(*) <= {MAX_POSTING}) ok
  USING (band, band_key)
JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


@query(
    "q57_neardup_components",
    oracle=f"""
WITH RECURSIVE
mh AS ({MINHASH_SQL}),
bands AS ({_BAND_SELECTS}),
pairs AS ({_PAIRS_SQL}),
edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT s AS d FROM edges),
reach(s, t) AS (
    SELECT d, d FROM nodes
    UNION
    SELECT r.s, e.t FROM reach r JOIN edges e ON e.s = r.t
)
SELECT s AS doc_id, min(t) AS component FROM reach GROUP BY s
""",
)
def q57_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate GROUPS: connected components over the LSH candidate
    graph (q53's pairs), labeling every involved doc with the min doc_id of
    its component — the final step that turns pairwise candidates into
    keep-one-per-group dedup decisions.

    Iterative min-label propagation: each round, a node's label becomes the
    min of its own and its neighbors' labels; converges in O(component
    diameter) rounds (near-dup components are almost-cliques, so 2-3).
    Each round is one join + one agg shuffle over the EDGE list only — at
    100 TB the edge list after LSH is a tiny fraction of the corpus, and
    ``localCheckpoint`` truncates the growing lineage. The oracle expresses
    the same fixpoint as a recursive CTE, so even this iterative operator
    gets the full value-hash check."""
    pairs = q53_lsh_candidate_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("t"))
        .union(pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("t")))
        .distinct()
        .localCheckpoint()
    )
    # Seed labels with min(self, neighbors): one aggregate over the edge
    # list performs what would otherwise be the first propagation round
    # (identity init + 1 iteration), saving a full join+checkpoint cycle —
    # on near-clique components most labels are already final after this.
    labels = (
        edges.groupBy(F.col("s").alias("d"))
        .agg(F.min("t").alias("mint"))
        .select("d", F.least(F.col("d"), F.col("mint")).alias("comp"))
    )
    converged = False
    for _ in range(16):  # diameter bound; real convergence is 2-3 rounds
        neigh = (
            edges.join(labels, edges["t"] == labels["d"])
            .groupBy("s")
            .agg(F.min("comp").alias("ncomp"))
        )
        # carry old+new label in ONE checkpointed frame: the convergence
        # check is a cheap filter-count on materialized data, not a re-join
        stepped = (
            labels.join(neigh, labels["d"] == neigh["s"], "left")
            .select(
                labels["d"],
                F.col("comp").alias("old_comp"),
                F.least(F.col("comp"), F.coalesce("ncomp", "comp")).alias("comp"),
            )
            .localCheckpoint()
        )
        labels = stepped.select("d", "comp")
        if stepped.filter(F.col("comp") != F.col("old_comp")).count() == 0:
            converged = True
            break
    if not converged:
        # Silent fallthrough would return wrong labels for any component
        # with diameter > the round bound — fail loudly instead; the oracle
        # computes the true transitive closure and would flag it anyway.
        raise RuntimeError(
            "neardup_components: min-label propagation did not converge "
            "within 16 rounds (component diameter exceeds bound)"
        )
    return labels.select(F.col("d").alias("doc_id"), F.col("comp").alias("component"))


@query(
    "q59_dedup_keep_one",
    oracle=f"""
WITH RECURSIVE
mh AS ({MINHASH_SQL}),
bands AS ({_BAND_SELECTS}),
pairs AS ({_PAIRS_SQL}),
edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT s AS d FROM edges),
reach(s, t) AS (
    SELECT d, d FROM nodes
    UNION
    SELECT r.s, e.t FROM reach r JOIN edges e ON e.s = r.t
),
comp AS (SELECT s AS doc_id, min(t) AS component FROM reach GROUP BY s)
SELECT d.doc_id
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> component)
""",
)
def q59_dedup_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END near-dup dedup: the surviving corpus after keep-one-per-
    component — the materialization step a training-data pipeline actually
    ships. Composes signatures → LSH candidates → connected components
    (q52/q53/q57), keeps each component's min doc_id, and anti-joins the
    rest of the corpus.

    At 100 TB the anti-join's right side is only the DROPPED ids (strictly
    smaller than the near-dup subset — typically a tiny fraction of the
    corpus), so it broadcasts; the corpus side never shuffles."""
    labels = q57_neardup_components(spark, sf_dir)
    drops = labels.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    d = t(spark, sf_dir, "documents")
    return d.join(F.broadcast(drops), "doc_id", "left_anti").select("doc_id")


@query(
    "q146_minhash_jaccard_estimate",
    oracle=f"""
WITH mh AS ({MINHASH_SQL}),
bands AS ({_BAND_SELECTS}),
pairs AS ({_PAIRS_SQL}),
sh AS ({SHINGLES_SQL}),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
    SELECT p.doc_a, p.doc_b, count(*) AS n_common
    FROM pairs p
    JOIN sh a ON a.doc_id = p.doc_a
    JOIN sh b ON b.doc_id = p.doc_b AND b.sh = a.sh
    GROUP BY p.doc_a, p.doc_b
),
est AS (
    SELECT p.doc_a, p.doc_b,
           CAST({" + ".join(f"CASE WHEN ma.h{k} = mb.h{k} THEN 1 ELSE 0 END"
                            for k in range(N_MINHASH))} AS BIGINT) AS n_eq
    FROM pairs p
    JOIN mh ma ON ma.doc_id = p.doc_a
    JOIN mh mb ON mb.doc_id = p.doc_b
)
SELECT e.doc_a, e.doc_b, e.n_eq,
       round(e.n_eq / {N_MINHASH}.0, 4) AS est_jaccard,
       round(i.n_common / CAST(sa.n_sh + sb.n_sh - i.n_common AS DOUBLE), 4)
           AS exact_jaccard,
       abs(e.n_eq / {N_MINHASH}.0
           - i.n_common / CAST(sa.n_sh + sb.n_sh - i.n_common AS DOUBLE)) <= 0.5e0
           AS within_half
FROM est e
JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
JOIN sizes sa ON sa.doc_id = e.doc_a
JOIN sizes sb ON sb.doc_id = e.doc_b
""",
)
def q146_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash Jaccard ESTIMATION quality, in-query: for every LSH candidate
    pair, the sketch estimate (fraction of agreeing minhash components —
    the unbiased estimator E[h_a==h_b] = J) next to the EXACT shingle-set
    Jaccard, with the estimator's coarse error bound (K=6 grid, so ±0.5 is
    the loosest sane envelope) asserted per pair.

    This is the verification harness a production near-dup pipeline runs on
    a sample to pick K/band geometry: estimate vs truth, per pair, one scan.

    Plan: the candidate-pair list is post-LSH (tiny, broadcast); signatures
    join it twice (map-side), and the exact intersection reuses the
    inverted-index expansion ONLY for pair members — every equal minhash
    component implies a shared shingle, so candidate pairs always intersect
    and the join is an inner join without a lost-row hazard. The corpus
    itself never shuffles."""
    pairs = q53_lsh_candidate_pairs(spark, sf_dir).select("doc_a", "doc_b")
    mh = minhash_signatures(spark, sf_dir)
    eq = sum(
        F.when(F.col(f"a.h{k}") == F.col(f"b.h{k}"), 1).otherwise(0)
        for k in range(N_MINHASH)
    ).cast("bigint")
    est = (
        F.broadcast(pairs)
        .join(mh.alias("a"), F.col("a.doc_id") == F.col("doc_a"))
        .join(mh.alias("b"), F.col("b.doc_id") == F.col("doc_b"))
        .select("doc_a", "doc_b", eq.alias("n_eq"))
    )
    docs = _shingle_arrays(spark, sf_dir).select(
        "doc_id", F.array_distinct("shs").alias("shs")
    )
    exact = (
        F.broadcast(pairs)
        .join(
            docs.select(
                F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a")
            ),
            "doc_a",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("shs_a", "shs_b")).alias("n_common"),
            F.size("shs_a").alias("na"),
            F.size("shs_b").alias("nb"),
        )
    )
    ex_j = F.col("n_common") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    ).cast("double")
    est_j = F.col("n_eq") / float(N_MINHASH)
    return (
        est.join(exact, ["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            "n_eq",
            F.round(est_j, 4).alias("est_jaccard"),
            F.round(ex_j, 4).alias("exact_jaccard"),
            (F.abs(est_j - ex_j) <= 0.5e0).alias("within_half"),
        )
    )


@query(
    "q147_neardup_cluster_stats",
    oracle=f"""
WITH RECURSIVE
mh AS ({MINHASH_SQL}),
bands AS ({_BAND_SELECTS}),
pairs AS ({_PAIRS_SQL}),
edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT s AS d FROM edges),
reach(s, t) AS (
    SELECT d, d FROM nodes
    UNION
    SELECT r.s, e.t FROM reach r JOIN edges e ON e.s = r.t
),
comp AS (SELECT s AS doc_id, min(t) AS component FROM reach GROUP BY s),
sizes AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
SELECT CAST(cluster_size AS BIGINT)                      AS cluster_size,
       CAST(count(*) AS BIGINT)                          AS n_clusters,
       CAST((cluster_size - 1) * count(*) AS BIGINT)     AS docs_dropped
FROM sizes
GROUP BY cluster_size
""",
)
def q147_neardup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size distribution — the dedup YIELD report: for each
    component size, how many clusters exist and how many documents keep-one
    dedup would drop. The number a pipeline owner actually reads before
    committing a dedup run (a fat head of giant clusters means boilerplate;
    a long tail of pairs means true near-dups).

    Plan: q57's converged labels (edge-list-sized, post-LSH) feed two
    uniform-key aggregations — component then cluster_size; both shuffles
    are over tiny sketch-scale data, never the corpus."""
    labels = q57_neardup_components(spark, sf_dir)
    sizes = labels.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        ((F.col("cluster_size") - 1) * F.count(F.lit(1)))
        .cast("bigint")
        .alias("docs_dropped"),
    ).select(
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        "n_clusters",
        "docs_dropped",
    )


@query(
    "q150_split_leakage_check",
    oracle=f"""
WITH RECURSIVE
mh AS ({MINHASH_SQL}),
bands AS ({_BAND_SELECTS}),
pairs AS ({_PAIRS_SQL}),
edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT s AS d FROM edges),
reach(s, t) AS (
    SELECT d, d FROM nodes
    UNION
    SELECT r.s, e.t FROM reach r JOIN edges e ON e.s = r.t
),
comp AS (SELECT s AS doc_id, min(t) AS component FROM reach GROUP BY s),
labeled AS (
    SELECT c.component, c.doc_id,
           CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM comp c
    JOIN (SELECT doc_id,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                     % 100 AS b
          FROM documents) s ON s.doc_id = c.doc_id
),
per_comp AS (
    SELECT component, count(*) AS n_docs,
           count(DISTINCT split) AS n_splits
    FROM labeled GROUP BY component
)
SELECT CAST(count(*) AS BIGINT)                                   AS n_components,
       CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
                                                                  AS n_spanning,
       CAST(sum(CASE WHEN n_splits > 1 THEN n_docs ELSE 0 END) AS BIGINT)
                                                                  AS n_docs_leaking,
       floor(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE) * 10000 + 0.5e0) / 10000.0
                                                                  AS leakage_rate
FROM per_comp
""",
)
def q150_split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE SPLIT audit: near-duplicate components (q57) that span
    q87's train/val/test boundary. A near-dup of a test document sitting in
    train is silent eval contamination that doc-level hash splitting cannot
    see — production pipelines split by CLUSTER, and this is the check that
    says whether you must.

    Plan: the component labels are edge-list-sized (post-LSH); the split
    bucket is the same map-only md5 expression as q87, joined on doc_id
    (broadcastable at scale since components are the tiny side); two
    aggregations produce the one-row report. The corpus never shuffles.
    Rounding: portable half-up floor(x*1e4+0.5)/1e4."""
    labels = q57_neardup_components(spark, sf_dir)
    d = t(spark, sf_dir, "documents").select("doc_id")
    b = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("bigint") % 100
    split = F.when(b < 90, "train").when(b < 95, "val").otherwise("test")
    labeled = F.broadcast(labels).join(
        d.select("doc_id", split.alias("split")), "doc_id"
    )
    per_comp = labeled.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("split").alias("n_splits"),
    )
    spanning = F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
    return per_comp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_components"),
        spanning.cast("bigint").alias("n_spanning"),
        F.sum(F.when(F.col("n_splits") > 1, F.col("n_docs")).otherwise(0))
        .cast("bigint")
        .alias("n_docs_leaking"),
        (
            F.floor(spanning / F.count(F.lit(1)).cast("double") * 10000 + 0.5e0)
            / 10000.0
        ).alias("leakage_rate"),
    )


@query(
    "q153_cluster_safe_split",
    oracle=f"""
WITH RECURSIVE
mh AS ({MINHASH_SQL}),
bands AS ({_BAND_SELECTS}),
pairs AS ({_PAIRS_SQL}),
edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT s AS d FROM edges),
reach(s, t) AS (
    SELECT d, d FROM nodes
    UNION
    SELECT r.s, e.t FROM reach r JOIN edges e ON e.s = r.t
),
comp AS (SELECT s AS doc_id, min(t) AS component FROM reach GROUP BY s),
assigned AS (
    SELECT d.doc_id,
           coalesce(c.component, d.doc_id) AS split_key,
           c.component IS NOT NULL AS clustered
    FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
),
labeled AS (
    SELECT doc_id, clustered,
           CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, clustered,
                 ('0x' || substr(md5(CAST(split_key AS VARCHAR)), 1, 4))::BIGINT
                     % 100 AS b
          FROM assigned)
)
SELECT split,
       CAST(count(*) AS BIGINT)                                    AS n_docs,
       CAST(sum(CASE WHEN clustered THEN 1 ELSE 0 END) AS BIGINT)  AS n_clustered
FROM labeled
GROUP BY split
""",
)
def q153_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER-SAFE train/val/test split — the remedy for what q150 audits:
    every document hashes on its near-dup COMPONENT label (its own id when
    unclustered), so an entire near-dup cluster lands in one split by
    construction and eval contamination through near-duplicates is
    structurally impossible.

    Plan: component labels (edge-list-sized, post-LSH) broadcast into a
    left join against the corpus; split assignment stays the same map-only
    md5 bucket as q87, just keyed on the inherited label. One aggregation
    reports the split sizes and how many docs were cluster-assigned —
    the same numbers a pipeline logs before materializing the split."""
    labels = q57_neardup_components(spark, sf_dir)
    d = t(spark, sf_dir, "documents").select("doc_id")
    assigned = d.join(F.broadcast(labels), "doc_id", "left").select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("split_key"),
        F.col("component").isNotNull().alias("clustered"),
    )
    b = F.conv(
        F.substring(F.md5(F.col("split_key").cast("string")), 1, 4), 16, 10
    ).cast("bigint") % 100
    split = F.when(b < 90, "train").when(b < 95, "val").otherwise("test")
    return (
        assigned.select(split.alias("split"), "clustered")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("clustered"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clustered"),
        )
    )


@query(
    "q154_cross_source_dup_matrix",
    oracle=f"""
WITH mh AS ({MINHASH_SQL}),
bands AS ({_BAND_SELECTS}),
pairs AS ({_PAIRS_SQL})
SELECT least(da.source, db.source)    AS source_a,
       greatest(da.source, db.source) AS source_b,
       CAST(count(*) AS BIGINT)       AS n_pairs
FROM pairs p
JOIN documents da ON da.doc_id = p.doc_a
JOIN documents db ON db.doc_id = p.doc_b
GROUP BY least(da.source, db.source), greatest(da.source, db.source)
""",
)
def q154_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: near-dup candidate pairs bucketed by
    the (unordered) pair of sources they bridge. The provenance question a
    corpus owner asks before weighting sources (q108): which feeds
    syndicate each other's content — diagonal mass = within-source
    boilerplate, off-diagonal = cross-source copying that double-counts
    under independent source weights.

    Plan: the post-LSH pair list is tiny and broadcasts into two doc_id
    equi joins against a 2-column projection of the corpus; one
    O(sources²)-key aggregation. least/greatest folds the symmetric pair
    so each source pair reports once."""
    pairs = q53_lsh_candidate_pairs(spark, sf_dir).select("doc_a", "doc_b")
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    da = d.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))
    db = d.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))
    return (
        F.broadcast(pairs)
        .join(da, "doc_a")
        .join(db, "doc_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


@query(
    "q155_dedup_threshold_sweep",
    oracle=f"""
WITH sh AS ({SHINGLES_SQL}),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
ok AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= {MAX_POSTING}),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM sh a JOIN ok USING (sh)
    JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
jac AS (
    SELECT doc_a, doc_b,
           n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS j
    FROM inter JOIN sizes sa ON sa.doc_id = doc_a
               JOIN sizes sb ON sb.doc_id = doc_b
)
SELECT t.threshold,
       CAST(count(CASE WHEN j >= t.threshold THEN 1 END) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT CASE WHEN j >= t.threshold THEN doc_b END) AS BIGINT)
           AS max_docs_dropped
FROM jac CROSS JOIN (SELECT unnest([0.2e0, 0.4e0, 0.6e0, 0.8e0]) AS threshold) t
GROUP BY t.threshold
""",
)
def q155_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup THRESHOLD TUNING curve: for each candidate Jaccard cutoff,
    how many pairs survive and an upper bound on documents dropped (distinct
    higher-id pair members) — the sweep a pipeline owner reads to pick the
    dedup threshold before a run, computed in ONE pass over the pair list.

    Plan: reuses q54's capped inverted-index intersection (two exchanges,
    no joins on the corpus side); the 4-row threshold grid explodes against
    only the tiny pair list, then one O(4)-key aggregation. The conditional
    count-distinct is exact because it runs per threshold key."""
    sh = _shingle_arrays(spark, sf_dir)
    docs = sh.select("doc_id", F.array_distinct("shs").alias("shs")).withColumn(
        "n_sh", F.size("shs")
    )
    exploded = docs.select("doc_id", "n_sh", F.explode("shs").alias("sh"))
    buckets = (
        exploded.groupBy("sh")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n_sh"))).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= MAX_POSTING))
    )
    inter = (
        bucket_pair_expand(buckets)
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = inter.select(
        "doc_a",
        "doc_b",
        (
            F.col("n_common")
            / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double")
        ).alias("j"),
    )
    grid = F.explode(F.array(*[F.lit(x) for x in (0.2, 0.4, 0.6, 0.8)]))
    return (
        jac.select("doc_a", "doc_b", "j", grid.alias("threshold"))
        .groupBy("threshold")
        .agg(
            F.count(F.when(F.col("j") >= F.col("threshold"), 1))
            .cast("bigint")
            .alias("n_pairs"),
            F.count_distinct(
                F.when(F.col("j") >= F.col("threshold"), F.col("doc_b"))
            )
            .cast("bigint")
            .alias("max_docs_dropped"),
        )
    )


@query(
    "q160_idf_weighted_jaccard",
    oracle=f"""
WITH mh AS ({MINHASH_SQL}),
bands AS ({_BAND_SELECTS}),
pairs AS ({_PAIRS_SQL}),
sh AS ({SHINGLES_SQL}),
n AS (SELECT count(*) AS n_docs FROM documents),
idf AS (
    SELECT sh.sh AS sh, ln(CAST(n.n_docs AS DOUBLE) / count(*)) AS w
    FROM sh, n GROUP BY sh.sh, n.n_docs
),
doc_w AS (
    SELECT s.doc_id, sum(i.w) AS total_w
    FROM sh s JOIN idf i ON i.sh = s.sh GROUP BY s.doc_id
),
shared AS (
    SELECT p.doc_a, p.doc_b, sum(i.w) AS shared_w
    FROM pairs p
    JOIN sh a ON a.doc_id = p.doc_a
    JOIN sh b ON b.doc_id = p.doc_b AND b.sh = a.sh
    JOIN idf i ON i.sh = a.sh
    GROUP BY p.doc_a, p.doc_b
)
SELECT s.doc_a, s.doc_b,
       round(s.shared_w / (wa.total_w + wb.total_w - s.shared_w), 4)
           AS soft_jaccard
FROM shared s
JOIN doc_w wa ON wa.doc_id = s.doc_a
JOIN doc_w wb ON wb.doc_id = s.doc_b
""",
)
def q160_idf_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF-WEIGHTED (soft) Jaccard for LSH candidate pairs: shared and
    union shingle mass weighted by ln(N/df), so overlap on rare content
    counts and overlap on boilerplate barely does — the similarity a
    curation pipeline uses when plain Jaccard is gamed by navigation
    chrome and license footers.

    Plan: document frequencies come from one shingle-keyed aggregation
    (the q152 inverted index) with the 1-row corpus count broadcast into
    the idf expression (q78's pattern); per-doc total mass is one doc-keyed
    aggregation; the pair-scoped shared mass touches only the broadcast
    post-LSH pair list. Every weight is derived, joined, and summed on
    uniform hash keys."""
    pairs = q53_lsh_candidate_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sh = shingles(spark, sf_dir)
    d = t(spark, sf_dir, "documents")
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    idf = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select("sh", F.log(F.col("n_docs") / F.col("df")).alias("w"))
    )
    doc_w = (
        sh.join(idf, "sh")
        .groupBy("doc_id")
        .agg(F.sum("w").alias("total_w"))
    )
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    shared = (
        F.broadcast(pairs)
        .join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "sh"])
        .join(idf, "sh")
        .groupBy("doc_a", "doc_b")
        .agg(F.sum("w").alias("shared_w"))
    )
    wa = doc_w.select(F.col("doc_id").alias("doc_a"), F.col("total_w").alias("wa"))
    wb = doc_w.select(F.col("doc_id").alias("doc_b"), F.col("total_w").alias("wb"))
    return (
        shared.join(wa, "doc_a")
        .join(wb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("shared_w") / (F.col("wa") + F.col("wb") - F.col("shared_w")),
                4,
            ).alias("soft_jaccard"),
        )
    )


@query(
    "q79_lev_verify_pairs",
    oracle=f"""
WITH mh AS ({MINHASH_SQL}),
bands AS ({_BAND_SELECTS}),
pairs AS ({_PAIRS_SQL})
SELECT p.doc_a, p.doc_b,
       CAST(levenshtein(substr(da.text, 1, 80), substr(db.text, 1, 80)) AS INT)
           AS lev80,
       levenshtein(substr(da.text, 1, 80), substr(db.text, 1, 80)) <= 24
           AS confirmed
FROM pairs p
JOIN documents da ON da.doc_id = p.doc_a
JOIN documents db ON db.doc_id = p.doc_b
""",
)
def q79_lev_verify_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification of LSH candidate pairs: levenshtein over
    an 80-char prefix confirms (or rejects) each MinHash candidate — the
    exact-verify stage of a candidate-generate/verify dedup pipeline.

    The quadratic-in-length edit distance runs ONLY on candidate pairs
    (post-LSH, post-cap) and only on a fixed prefix, so per-pair cost is
    bounded; the pair list joins the corpus twice on doc_id (at scale the
    pair list is the small side — broadcastable)."""
    pairs = q53_lsh_candidate_pairs(spark, sf_dir).select("doc_a", "doc_b")
    d = t(spark, sf_dir, "documents").select("doc_id", F.substring("text", 1, 80).alias("pfx"))
    da = d.select(F.col("doc_id").alias("doc_a"), F.col("pfx").alias("pfx_a"))
    db = d.select(F.col("doc_id").alias("doc_b"), F.col("pfx").alias("pfx_b"))
    lev = F.levenshtein("pfx_a", "pfx_b")
    return (
        F.broadcast(pairs)
        .join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            "doc_a", "doc_b",
            lev.cast("int").alias("lev80"),
            (lev <= 24).alias("confirmed"),
        )
    )


@query(
    "q182_minhash_containment",
    oracle=f"""
WITH sh AS ({SHINGLES_SQL}),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
ok AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= {MAX_POSTING}),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM sh a JOIN ok USING (sh)
    JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(least(sa.n_sh, sb.n_sh) AS BIGINT) AS n_smaller,
       round(n_common / least(sa.n_sh, sb.n_sh), 4) AS containment
FROM inter JOIN sizes sa ON sa.doc_id = doc_a
           JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / least(sa.n_sh, sb.n_sh) >= 0.6
""",
)
def q182_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle CONTAINMENT |A∩B| / min(|A|,|B|) for candidate pairs —
    the subsumption detector Jaccard misses: a short document pasted
    inside a long one scores near-zero Jaccard (the union is dominated
    by the long side) but containment ≈ 1. Training-data pipelines run
    this next to q54 to catch quote-expansion and boilerplate-wrapping
    duplicates (Broder's containment measure, the basis of "superset"
    dedup rules).

    Plan shape is q54's proven two-exchange inverted index — per-row
    distinct-shingle arrays carry TRUE sizes into the posting buckets,
    pairs expand in-bucket (MAX_POSTING-capped, the O(n²) guard), and
    the measure is a plain expression over (n_common, na, nb) — only
    the denominator differs: min(na, nb) instead of the union size."""
    d = t(spark, sf_dir, "documents")
    return containment_pairs_of(d)


def containment_pairs_of(
    d: DataFrame, threshold: float = 0.6, max_posting: int = MAX_POSTING
) -> DataFrame:
    """q182's core over any (doc_id, text) frame — factored out so the
    hypothesis property suite can drive it on generated corpora against
    brute-force set containment."""
    sh = shingle_arrays_of(d)
    docs = sh.select(
        "doc_id", F.array_distinct("shs").alias("shs")
    ).withColumn("n_sh", F.size("shs"))
    exploded = docs.select("doc_id", "n_sh", F.explode("shs").alias("sh"))
    buckets = (
        exploded.groupBy("sh")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n_sh"))).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_posting))
    )
    inter = (
        bucket_pair_expand(buckets)
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    n_smaller = F.least("na", "nb")
    cont = F.col("n_common") / n_smaller
    return (
        inter.filter(cont >= threshold)
        .select(
            "doc_a",
            "doc_b",
            n_smaller.cast("bigint").alias("n_smaller"),
            F.round(cont, 4).alias("containment"),
        )
    )


# q206's oracle: q53's batch LSH pipeline, verbatim, over the CDC-upserted
# FINAL documents (re-crawls applied, deletes gone) instead of the raw table.
_DOCS_FINAL_SQL = """SELECT doc_id,
       CASE WHEN doc_id % 7 = 0
            THEN text || ' REVISED REVISED REVISED REVISED'
            ELSE text END AS text
FROM documents WHERE doc_id % 5 <> 0"""
CDC_LSH_PAIRS_SQL = LSH_PAIRS_SQL.replace(
    "FROM documents", f"FROM ({_DOCS_FINAL_SQL})"
)


@query("q206_cdc_lsh_index", oracle=CDC_LSH_PAIRS_SQL)
def q206_cdc_lsh_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-MAINTAINED LSH DEDUP PARITY — the near-duplicate index under
    the mutations a production corpus actually has: RE-CRAWLED documents
    (doc_id % 7 gains four appended tokens — new shingles, new
    signature, postings MOVE band buckets and stale collision edges
    retract), REMOVED documents (% 5 — they leave every bucket they
    occupied), and duplicate re-delivery (% 11, unchanged image, higher
    seq — a net no-op), via streaming/dedup_index.CdcLshIndex: posting
    Z-set bucketed by (band, band_key), touched buckets' collisions
    recomputed per merge from their post-batch alive postings, pairs
    versioned by bucket. The insert-only index (q177) cannot express
    any of these. Oracle is q53's all-at-once batch LSH SQL over the
    CDC-upserted final documents — cap semantics INCLUDED (with
    retraction the hot-bucket cap is no longer monotone; a bucket
    dropping back under the cap re-emits, exactly the batch HAVING).

    Scale: per merge one pk-pruned latest-image read, map-only banding
    of the ± images, an alive-posting fold over ONLY the touched
    buckets' shards, and MAX_POSTING²-bounded pair expansion per
    touched bucket — never a corpus re-signature."""
    import shutil
    import tempfile

    from stream_cdc_gps_spark.streaming.dedup_index import CdcLshIndex

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    a0 = d.select(F.lit("c").alias("op"), did.alias("seq"), "doc_id", "text")
    a_u = d.filter(did % 7 == 0).select(
        F.lit("u").alias("op"),
        (F.lit(1_000_000_000) + did).alias("seq"),
        "doc_id",
        F.concat(F.col("text"), F.lit(" REVISED REVISED REVISED REVISED")).alias(
            "text"
        ),
    )
    a_d = d.filter(did % 5 == 0).select(
        F.lit("d").alias("op"), (F.lit(2_000_000_000) + did).alias("seq"),
        "doc_id", "text",
    )
    a_dup = d.filter((did % 11 == 0) & (did % 5 != 0) & (did % 7 != 0)).select(
        F.lit("u").alias("op"), (F.lit(3_000_000_000) + did).alias("seq"),
        "doc_id", "text",
    )
    base = tempfile.mkdtemp(prefix="cdc_lsh_")
    try:
        idx = CdcLshIndex(spark, base)
        idx.merge(a0, 0)
        idx.merge(a_u.unionByName(a_d).unionByName(a_dup), 1)
        # materialize before the temp state dir is removed
        return idx.pairs().localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


_PF_T = 0.5  # prefix-filter Jaccard threshold


@query(
    "q244_prefix_filter_join",
    oracle=f"""
WITH sh AS ({SHINGLES_SQL}),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(n_common / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = doc_a
           JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {_PF_T}
""",
)
def q244_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREFIX-FILTERED set-similarity self-join (AllPairs / PPJoin —
    Bayardo et al. WWW'07, Xiao et al. WWW'08): the EXACT Jaccard-≥-t
    join with NO posting-list cap — the guarantee q54's inverted-index
    sweep trades away (its MAX_POSTING stop-shingle drop is a documented
    approximation; this operator never misses a qualifying pair).

    The filter: order all shingles globally by (document frequency ASC,
    shingle) — rarest first — and keep only each doc's PREFIX of length
    n − ceil(t·n) + 1 under that order. If J(A,B) ≥ t the two prefixes
    must share an element (skipping a whole prefix leaves fewer than
    t·|A| ≤ |A∩B| common elements — contradiction), so candidates =
    pairs sharing a PREFIX shingle only. Prefix postings are small by
    construction (the rarest shingles), which is what kills the hot
    buckets the cap existed for; the LENGTH filter (J ≥ t forces
    t·max(n_a,n_b) ≤ min(n_a,n_b)) prunes again before verification,
    and the exact |A∩B| check runs as array_intersect over the two
    ~50-element shingle arrays per surviving candidate — never a
    re-scan. The oracle runs the UNcapped all-pairs inverted-index join
    (an independent formulation): a single missed pair hash-fails the
    row, so the prefix theorem is driver-checked, not trusted.

    Scale: one df aggregate, one per-doc sort of its own shingle array,
    one explode of prefixes (≈ half the shingle volume at t=0.5), one
    prefix-keyed bucket expand, one candidate-keyed verify join.
    Adversarial near-identical corpora make prefix buckets dense — but
    then the OUTPUT is itself quadratic; PPJoin's positional filter is
    the production tightening, noted not needed at this threshold."""
    d = _shingle_arrays(spark, sf_dir)
    docs = d.select("doc_id", F.array_distinct("shs").alias("shs")).withColumn(
        "n", F.size("shs")
    )
    ex = docs.select("doc_id", "n", F.explode("shs").alias("sh"))
    dfreq = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    ranked = ex.join(dfreq, "sh")
    lists = ranked.groupBy("doc_id").agg(
        F.max("n").alias("n"),
        F.array_sort(F.collect_list(F.struct("df", "sh"))).alias("sorted"),
    )
    plen = (F.col("n") - F.ceil(F.col("n") * F.lit(_PF_T)) + 1).cast("int")
    pref = lists.select(
        "doc_id", "n", F.explode(F.slice("sorted", F.lit(1), plen)).alias("e")
    ).select("doc_id", "n", F.col("e.sh").alias("sh"))
    buckets = (
        pref.groupBy("sh")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n"))).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    cand = (
        bucket_pair_expand(buckets)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .filter(
            F.least("na", "nb")
            >= F.greatest("na", "nb") * F.lit(_PF_T)
        )
        .distinct()
    )
    sets_a = docs.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"))
    sets_b = docs.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    inter = F.size(F.array_intersect("shs_a", "shs_b"))
    jac = inter / (F.col("na") + F.col("nb") - inter)
    return (
        cand.join(sets_a, "doc_a")
        .join(sets_b, "doc_b")
        .filter(jac >= _PF_T)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )
