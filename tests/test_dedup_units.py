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


def test_bucket_pair_expand_keep_carries_key_columns(spark):
    """keep= columns ride along on every expanded pair (the incremental
    index keys retraction on them)."""
    df = spark.createDataFrame(
        [(0, "k0", [1, 2, 3]), (1, "k1", [7, 8])],
        "band int, band_key string, ids array<int>",
    )
    got = sorted(
        tuple(r) for r in bucket_pair_expand(df, keep=("band", "band_key")).collect()
    )
    assert got == [
        (0, "k0", 1, 2),
        (0, "k0", 1, 3),
        (0, "k0", 2, 3),
        (1, "k1", 7, 8),
    ]


def test_incremental_lsh_random_slicings_match_batch(spark):
    """Slice-order independence: ANY partition of the corpus into ordered
    batches lands the same pairs() as the all-at-once batch plan —
    a handful of adversarial slicings over a corpus built to produce both
    near-dup collisions and a hot bucket right at the cap boundary."""
    import itertools

    from stream_cdc_gps_spark.operators.dedup import band_tuples_of
    from stream_cdc_gps_spark.streaming.dedup_index import IncrementalLshIndex

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        (1, base),
        (2, base),                       # exact dup of 1
        (3, base + " iota"),             # near dup
        (4, "unrelated text about nothing in particular here"),
        (5, base),                       # third member of the hot family
        (6, base),                       # fourth — crosses max_posting=3
    ]
    schema = "doc_id long, text string"
    full = spark.createDataFrame(docs, schema)

    def batch_pairs(cap):
        bands = band_tuples_of(full)
        buckets = (
            bands.groupBy("band", "band_key")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
            .filter((F.size("ids") > 1) & (F.size("ids") <= cap))
        )
        return sorted(
            tuple(r)
            for r in bucket_pair_expand(buckets)
            .groupBy(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )

    slicings = [
        [[1, 2, 3, 4, 5, 6]],                    # single batch
        [[1, 2], [3, 4], [5, 6]],                # pairs in order
        [[6, 5], [4, 3], [2, 1]],                # reverse arrival
        [[1], [2], [3], [4], [5], [6]],          # one doc per batch
        [[4], [1, 5, 6], [2, 3]],                # hot family split unevenly
    ]
    for cap in (3, 64):
        golden = batch_pairs(cap)
        for si, slices in enumerate(slicings):
            import tempfile, shutil

            tmp = tempfile.mkdtemp(prefix="lsh_prop_")
            try:
                idx = IncrementalLshIndex(spark, tmp, max_posting=cap)
                for bi, ids in enumerate(slices):
                    idx.merge(
                        full.filter(F.col("doc_id").isin(ids)), bi
                    )
                got = sorted(
                    (r.doc_a, r.doc_b, r.n_shared_bands)
                    for r in idx.pairs().collect()
                )
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
            assert got == golden, f"cap={cap} slicing#{si} diverged"
