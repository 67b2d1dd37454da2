"""Unit tests for dedup building blocks (hot-bucket cap, pair expansion)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_cdc_gps_spark.operators.dedup import MAX_POSTING, bucket_pair_expand


def test_bucket_pair_expand_orders_pairs(spark):
    df = spark.createDataFrame([(["a", "b", "c"],)], "ids array<string>")
    got = sorted(tuple(r) for r in bucket_pair_expand(df).collect())
    assert got == [("a", "b"), ("a", "c"), ("b", "c")]


def test_hot_bucket_cap_drops_stop_shingle_pairs(spark):
    """A posting list longer than MAX_POSTING (a stop-shingle) must be
    dropped BEFORE pair expansion — the guard that keeps expansion
    O(n * MAX_POSTING) instead of O(hot_bucket^2) at corpus scale."""
    hot = [(f"d{i:03d}", "the the the") for i in range(MAX_POSTING + 1)]
    cold = [("d900", "rare shingle x"), ("d901", "rare shingle x")]
    sh = spark.createDataFrame(hot + cold, "doc_id string, sh string")
    buckets = (
        sh.groupBy("sh")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= MAX_POSTING))
    )
    pairs = bucket_pair_expand(buckets).collect()
    # only the cold bucket survives: 1 pair, none from the hot shingle
    assert [tuple(r) for r in pairs] == [("d900", "d901")]


def test_simhash_quarter_bucket_distribution(spark):
    """64-bit SimHash quarter-band buckets must stay small: log the bucket
    size distribution and assert no quarter bucket exceeds MAX_POSTING at
    the smoke scale (the widen-to-64-bit claim is precisely that 2^16-value
    band keys keep buckets tiny, unlike the retired 8-bit width whose
    16-value half-keys made every bucket fat)."""
    from stream_cdc_gps_spark.operators.dedup import simhash_signatures

    sims = simhash_signatures(spark, "/root/testdata/sf0.001")
    quarters = sims.select(
        "doc_id",
        F.posexplode(
            F.array(
                F.col("sim_lo") % 65536,
                F.floor(F.col("sim_lo") / 65536).cast("bigint"),
                F.col("sim_hi") % 65536,
                F.floor(F.col("sim_hi") / 65536).cast("bigint"),
            )
        ).alias("q_idx", "q_val"),
    )
    dist = (
        quarters.groupBy("q_idx", "q_val")
        .count()
        .groupBy("count")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .orderBy("count")
        .collect()
    )
    sizes = {r["count"]: r["n_buckets"] for r in dist}
    print(f"simhash quarter bucket-size -> n_buckets: {sizes}")
    assert max(sizes) <= 64  # MAX_POSTING: no fat bucket at smoke scale
    # sanity: signatures exist and quarters are 16-bit values
    assert sum(k * v for k, v in sizes.items()) > 0


def test_sign_lsh_band_bucket_distribution(spark):
    """q56's 4x16-bit sign-LSH tables: log per-table bucket sizes and assert
    the cap holds — expected size n/65536 per table, so even the smoke
    corpus should produce near-singleton buckets."""
    from pyspark.sql import functions as F2

    from stream_cdc_gps_spark.functions.vector import as_double
    from stream_cdc_gps_spark.operators.common import t

    e = t(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", as_double(F2.col("embedding")).alias("emb")
    )

    def band_key(g: int):
        key = F2.lit(0)
        for i in range(16):
            key = key * 2 + F2.when(
                F2.element_at("emb", g * 16 + i + 1) > 0, 1
            ).otherwise(0)
        return key.cast("bigint")

    bands = e.select(
        "vec_id",
        F2.posexplode(F2.array(*[band_key(g) for g in range(4)])).alias(
            "band", "band_key"
        ),
    )
    dist = (
        bands.groupBy("band", "band_key")
        .count()
        .groupBy("count")
        .agg(F2.count(F2.lit(1)).alias("n_buckets"))
        .orderBy("count")
        .collect()
    )
    sizes = {r["count"]: r["n_buckets"] for r in dist}
    print(f"sign-LSH band bucket-size -> n_buckets: {sizes}")
    assert max(sizes) <= MAX_POSTING
