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


def bucket_pair_expand(buckets: DataFrame, ids: str = "ids") -> DataFrame:
    """Expand each bucket's sorted element array into ordered pairs (a, b)
    with a before b in array order — array HOFs inside one projection, no
    self-join, no extra shuffle. Elements may be atoms or structs.

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
    return buckets.select(F.explode(pairs).alias("p")).select("p.a", "p.b")


def shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, shingle) pairs — explode happens here, once."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.split("text", " ").alias("toks"))
        .select("doc_id", F.explode(word_shingles(F.col("toks"), 3)).alias("sh"))
        .filter(F.col("sh") != "")
        .distinct()
    )


def _shingle_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, array of shingles) — per-row, no explode/shuffle.

    No array_distinct: min-hash is duplicate-invariant (min over a multiset
    equals min over its distinct set), so signatures match the oracle's
    DISTINCT-shingle formulation without paying for per-row dedup."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("toks"))
    shs = F.filter(word_shingles(F.col("toks"), 3), lambda s: s != "")
    return toks.select("doc_id", shs.alias("shs")).filter(F.size("shs") > 0)


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K min-hashes per doc as pure per-row array math — ZERO shuffles.

    array_min over md5(seed|shingle) of the per-doc distinct-shingle array is
    the same min the explode→groupBy plan computes, but stays entirely inside
    codegen: at 100 TB the signature stage is an embarrassingly parallel map
    with no exchange (the explode version shuffles O(total shingles) rows)."""
    sh = _shingle_arrays(spark, sf_dir)

    def minhash_col(k: int):
        # NB: the lambda must stay single-argument — pyspark treats a
        # two-parameter lambda (even with a default) as (element, index).
        seed = f"{k}|"
        return F.array_min(
            F.transform("shs", lambda s: F.md5(F.concat(F.lit(seed), s)))
        ).alias(f"h{k}")

    return sh.select("doc_id", *[minhash_col(k) for k in range(N_MINHASH)])


def band_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: (doc_id, band, band_key) via ONE posexplode pass.

    A single plan node instead of a per-band union — the signature stage is
    computed once, not once per band."""
    mh = minhash_signatures(spark, sf_dir)
    keys = F.array(
        *[
            F.concat(F.col(f"h{BAND_SIZE * b}"), F.col(f"h{BAND_SIZE * b + 1}"))
            for b in range(N_MINHASH // BAND_SIZE)
        ]
    )
    return mh.select("doc_id", F.posexplode(keys).alias("band", "band_key"))


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


@query(
    "q53_lsh_candidate_pairs",
    oracle=f"""
WITH mh AS ({MINHASH_SQL}),
bands AS ({_BAND_SELECTS}),
ok AS (SELECT band, band_key FROM bands
       GROUP BY band, band_key HAVING count(*) <= {MAX_POSTING})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
FROM bands a JOIN ok USING (band, band_key)
JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
""",
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


SIMHASH_SQL = """
WITH tok AS (
    SELECT doc_id, t FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         UNNEST(toks) AS u(t)
),
bits AS (
    SELECT doc_id, b,
           sum(CASE WHEN (('0x' || substr(md5(t), 1, 2))::BIGINT >> b) & 1 = 1
                    THEN 1 ELSE -1 END) AS s
    FROM tok, UNNEST(range(0, 8)) AS r(b)
    GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS simhash8
FROM bits GROUP BY doc_id
"""


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash8): 8-bit SimHash — sign of per-bit token-hash vote."""
    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    byte = F.conv(F.substring(F.md5("t"), 1, 2), 16, 10).cast("bigint")
    # v >> b and 1 << b via exact power-of-two arithmetic (shiftleft/right
    # builtins require a literal shift amount).
    pow2 = F.pow(F.lit(2.0), F.col("b"))
    bit = F.floor(F.col("v") / pow2).cast("bigint") % 2
    bits = (
        tok.select("doc_id", byte.alias("v"), F.explode(F.sequence(F.lit(0), F.lit(7))).alias("b"))
        .select("doc_id", "b", F.when(bit == 1, 1).otherwise(-1).alias("vote"))
        .groupBy("doc_id", "b")
        .agg(F.sum("vote").alias("s"))
    )
    return bits.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s") > 0, pow2).otherwise(0.0))
        .cast("bigint")
        .alias("simhash8")
    )


@query("q55_simhash", oracle=SIMHASH_SQL)
def q55_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bit SimHash per document (sign of per-bit token-hash vote).

    Deliberately narrow (first md5 byte) so the oracle reproduces it exactly;
    widening to 64 bits is the same plan with 8 byte-columns. Near-dup test
    is then hamming distance ≤ k on the signature — O(n) per doc (q58)."""
    return simhash_signatures(spark, sf_dir)


@query(
    "q58_simhash_pairs",
    oracle=f"""
WITH sims AS ({SIMHASH_SQL}),
halves AS (
    SELECT doc_id, simhash8, 0 AS half_idx, simhash8 // 16 AS half_val FROM sims
    UNION ALL
    SELECT doc_id, simhash8, 1 AS half_idx, simhash8 % 16 AS half_val FROM sims
),
cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           min(a.simhash8) AS sig_a, min(b.simhash8) AS sig_b
    FROM halves a JOIN halves b
      ON a.half_idx = b.half_idx AND a.half_val = b.half_val
     AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 1
""",
)
def q58_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairing: candidates at hamming distance ≤ 1.

    Pigeonhole banding: split the signature into two halves — any pair
    differing in ≤ 1 bit agrees exactly on at least one half — equi-join on
    (half_idx, half_value), then verify true hamming with bit_count(xor).
    This is the classic Manku/Jain/Das Sarma web-dedup layout: banding makes
    candidate generation an equi-join (shuffle on the half value), and the
    exact check is per-pair O(1) bit math. At the real 64-bit width the two
    32-bit halves make collisions rare and buckets tiny; the 8-bit toy width
    here (oracle-reproducible, q55) is the same plan with coarser keys."""
    sims = simhash_signatures(spark, sf_dir)
    halves = sims.select(
        "doc_id",
        "simhash8",
        F.posexplode(
            F.array(F.floor(F.col("simhash8") / 16).cast("bigint"), F.col("simhash8") % 16)
        ).alias("half_idx", "half_val"),
    )
    a = halves.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash8").alias("sig_a"),
        "half_idx", "half_val",
    )
    b = halves.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash8").alias("sig_b"),
        "half_idx", "half_val",
    )
    cand = (
        a.join(b, ["half_idx", "half_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.min("sig_a").alias("sig_a"), F.min("sig_b").alias("sig_b"))
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.filter(ham <= 1).select(
        "doc_a", "doc_b", ham.cast("int").alias("hamming")
    )


@query(
    "q56_embedding_near_dup",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
pairs AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ({SQL_DOT_AB}) / (sqrt({SQL_DOT_AA}) * sqrt({SQL_DOT_BB})) AS cos_sim
    FROM e a JOIN e b
      ON a.vec_id < b.vec_id
     AND list_reduce(list_transform(range(1, 9),
                     i -> CASE WHEN (a.emb[i] > 0) = (b.emb[i] > 0) THEN 0 ELSE 1 END),
                     (x, y) -> x + y) = 0
)
SELECT vec_a, vec_b, round(cos_sim, 6) AS cos_sim
FROM pairs WHERE cos_sim >= 0.3
""",
)
def q56_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection, LSH-pruned.

    Candidate pairs must agree on the sign pattern of the first 8 dimensions
    (a 256-bucket random-hyperplane LSH — the standard-basis variant); cosine
    is computed only within buckets, and pairs >= 0.3 survive (random 64-d cosines concentrate at 0 +- 0.125, so 0.3 = 2.4 sigma marks genuine outlier similarity). The bucket
    equi-join is what keeps this sub-quadratic at 100 TB — the same structural
    move as MinHash banding (q53), applied to dense vectors."""
    from stream_cdc_gps_spark.functions.vector import as_double, cosine

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    bucket = F.lit(0)
    for i in range(8):
        bucket = bucket * 2 + F.when(F.element_at("emb", i + 1) > 0, 1).otherwise(0)
    e = e.withColumn("bucket", bucket)
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("emb").alias("emb_a"), "bucket"
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("emb").alias("emb_b"),
        F.col("bucket").alias("bucket_b"),
    )
    sim = cosine(F.col("emb_a"), F.col("emb_b"))
    return (
        a.join(b, (F.col("bucket") == F.col("bucket_b")) & (F.col("vec_a") < F.col("vec_b")))
        .filter(sim >= 0.3)
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
    labels = edges.select(F.col("s").alias("d")).distinct().withColumn(
        "comp", F.col("d")
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
