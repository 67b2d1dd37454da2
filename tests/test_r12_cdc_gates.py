"""r12 additions: the CDC-maintained shingle-DF view behind the
decontamination (q234) and novelty (q235) corpus gates — exactness of the
signed-partial DF under re-crawl/delete/duplicate delivery, predicate
scoping, and the maintained-view family replay contract (torn writes heal,
compaction invariant, folded replays refused)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from stream_cdc_gps_spark.functions.text import tokens, word_shingles
from stream_cdc_gps_spark.streaming.shingle_df_index import CdcShingleDfView


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "op string, seq bigint, doc_id bigint, text string"
    )


def _df_dict(df):
    return {r["shingle"]: r["n_docs"] for r in df.collect()}


def _batch_df(final_docs, n=2):
    """DF table built from scratch over an image frame — the oracle shape."""
    return (
        final_docs.select(
            F.explode(
                F.array_distinct(word_shingles(tokens(F.col("text")), n))
            ).alias("shingle")
        )
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


def test_cdc_shingle_df_equals_batch_df_of_final_corpus(spark, tmp_path):
    """Maintained net counts == the from-scratch DF over the upserted
    final corpus: re-crawl retracts the OLD text's shingles, delete
    retracts everything, duplicate re-delivery nets to zero."""
    base = str(tmp_path / "sdf")
    view = CdcShingleDfView(spark, base, n=2, n_doc_buckets=4, n_shingle_buckets=4)
    view.merge(
        _docs(
            spark,
            [
                ("c", 1, 1, "a b c"),
                ("c", 2, 2, "a b"),
                ("c", 3, 3, "c d e"),
            ],
        ),
        0,
    )
    view.merge(
        _docs(
            spark,
            [
                ("u", 10, 1, "a b x"),  # re-crawl: 'b c' retracts, 'b x' asserts
                ("d", 11, 3, "c d e"),  # delete: all its shingles retract
                ("u", 12, 2, "a b"),  # duplicate re-delivery: zero partial
            ],
        ),
        1,
    )
    final = spark.createDataFrame(
        [(1, "a b x"), (2, "a b")], "doc_id bigint, text string"
    )
    assert _df_dict(view.df()) == _df_dict(_batch_df(final))
    # fully-retracted shingles are GONE (df 0), not present at 0 — the
    # dead-membership drift the maintained gate exists to rule out
    assert "c d" not in _df_dict(view.df())
    # the changelog side still answers the full alive snapshot
    alive = {r["doc_id"]: r["text"] for r in view.alive_docs().collect()}
    assert alive == {1: "a b x", 2: "a b"}


def test_cdc_shingle_df_pred_scopes_the_counts(spark, tmp_path):
    """df_pred scopes WHICH documents count (the q234 train-bucket move)
    while the changelog keeps the whole stream."""
    base = str(tmp_path / "sdf_scoped")
    view = CdcShingleDfView(
        spark,
        base,
        n=2,
        df_pred=F.col("doc_id") % 2 == 0,
        n_doc_buckets=4,
        n_shingle_buckets=4,
    )
    view.merge(
        _docs(spark, [("c", 1, 1, "a b"), ("c", 2, 2, "a b"), ("c", 3, 4, "a b")]),
        0,
    )
    # only docs 2 and 4 count toward DF; doc 1 (odd) is out of scope
    assert _df_dict(view.df()) == {"a b": 2}
    view.merge(_docs(spark, [("d", 10, 2, "a b")]), 1)
    assert _df_dict(view.df()) == {"a b": 1}
    # the full stream is still in the changelog (scope is a DF concern)
    assert {r["doc_id"] for r in view.alive_docs().collect()} == {1, 4}


def test_cdc_shingle_df_torn_write_heals_and_compaction_invariant(spark, tmp_path):
    base = str(tmp_path / "sdf2")
    view = CdcShingleDfView(spark, base, n=2, n_doc_buckets=4, n_shingle_buckets=4)
    b0 = _docs(spark, [("c", 1, 1, "x y z"), ("c", 2, 2, "x y")])
    b1 = _docs(spark, [("u", 10, 1, "x y w"), ("d", 11, 2, "x y")])
    view.merge(b0, 0)
    view.merge(b1, 1)
    want = _df_dict(view.df())
    # torn write: batch 1's DF partial vanished, the changelog landing
    # survived — replay recomputes the identical delta and heals
    shutil.rmtree(f"{base}/df/partials/batch_id=1")
    replay = CdcShingleDfView(spark, base, n=2, n_doc_buckets=4, n_shingle_buckets=4)
    replay.merge(b1, 1)
    assert _df_dict(replay.df()) == want
    # compaction preserves the merged table and refuses a folded replay
    replay.compact()
    assert _df_dict(replay.df()) == want
    assert not replay.df_store.land(replay._signed_partial(
        b0.select(F.lit(1).alias("_w"), "doc_id", "text")
    ), 1)


# --- CDC counting Bloom (q243) -------------------------------------------

from stream_cdc_gps_spark.operators.relational import _BLOOM_K, _bloom_pos
from stream_cdc_gps_spark.streaming.bloom_index import CdcCountingBloom


def _rows(spark, rows):
    return spark.createDataFrame(rows, "op string, seq bigint, rid bigint, k bigint")


def _cnt_dict(df):
    return {r["pos"]: r["cnt"] for r in df.collect()}


def _batch_counters(spark, keys):
    img = spark.createDataFrame([(k,) for k in keys], "k bigint")
    return (
        img.select(
            F.explode(
                F.array(*[_bloom_pos(F.col("k"), i) for i in range(_BLOOM_K)])
            ).alias("pos")
        )
        .groupBy("pos")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def test_cdc_counting_bloom_equals_batch_counters(spark, tmp_path):
    """Maintained net counters == counters over the upserted final key
    multiset: a key move retracts the old key's cells and asserts the
    new key's; a delete decrements exactly; membership never carries a
    dead key's cells (the plain-Bloom drift this class exists to fix)."""
    base = str(tmp_path / "cbloom")
    bloom = CdcCountingBloom(spark, base, pk="rid", key="k", n_pk_buckets=4)
    bloom.merge(
        _rows(spark, [("c", 1, 1, 100), ("c", 2, 2, 100), ("c", 3, 3, 200)]), 0
    )
    bloom.merge(
        _rows(
            spark,
            [
                ("u", 10, 1, 300),  # key move: 100's cells -1, 300's +1
                ("d", 11, 3, 200),  # delete: 200 fully retracted
                ("u", 12, 2, 100),  # duplicate re-delivery: zero partial
            ],
        ),
        1,
    )
    want = _cnt_dict(_batch_counters(spark, [300, 100]))
    assert _cnt_dict(bloom.counters()) == want
    # 200's cells are GONE — membership over the alive set only
    dead = _cnt_dict(_batch_counters(spark, [200]))
    alive = _cnt_dict(bloom.counters())
    assert any(p not in alive for p in dead)


def test_cdc_counting_bloom_torn_write_heals_and_compaction(spark, tmp_path):
    import shutil as _sh

    base = str(tmp_path / "cbloom2")
    bloom = CdcCountingBloom(spark, base, pk="rid", key="k", n_pk_buckets=4)
    b0 = _rows(spark, [("c", 1, 1, 10), ("c", 2, 2, 20)])
    b1 = _rows(spark, [("u", 10, 1, 30), ("d", 11, 2, 20)])
    bloom.merge(b0, 0)
    bloom.merge(b1, 1)
    want = _cnt_dict(bloom.counters())
    _sh.rmtree(f"{base}/cnt/partials/batch_id=1")
    replay = CdcCountingBloom(spark, base, pk="rid", key="k", n_pk_buckets=4)
    replay.merge(b1, 1)
    assert _cnt_dict(replay.counters()) == want
    replay.compact()
    assert _cnt_dict(replay.counters()) == want


def test_cdc_token_tf_counts_occurrences_not_membership(spark, tmp_path):
    """CdcTokenTfView nets OCCURRENCES: the maintained tf equals the
    from-scratch token count over the upserted final corpus — a re-crawl
    moves the full multiset delta (not just distinct membership), a
    delete retracts every occurrence, a duplicate re-delivery nets zero,
    and a token whose last occurrence retracts drops from the table."""
    from stream_cdc_gps_spark.streaming.shingle_df_index import CdcTokenTfView

    base = str(tmp_path / "tf")
    view = CdcTokenTfView(spark, base, n_doc_buckets=4, n_shingle_buckets=4)
    view.merge(
        _docs(
            spark,
            [
                ("c", 1, 1, "a a b"),
                ("c", 2, 2, "b c c c"),
                ("c", 3, 3, "d"),
            ],
        ),
        0,
    )
    view.merge(
        _docs(
            spark,
            [
                ("u", 10, 1, "a b b b"),  # a: 2->1, b: 1->3
                ("d", 11, 3, "d"),  # -1 d -> 'd' drops entirely
                ("u", 12, 2, "b c c c"),  # duplicate: zero partial
            ],
        ),
        1,
    )
    got = {r["w"]: r["tf"] for r in view.tf().collect()}
    assert got == {"a": 1, "b": 4, "c": 3}


def test_cdc_token_tf_torn_write_heals_on_replay(spark, tmp_path):
    """The family replay contract holds for the tf store: a torn landing
    (tf partial landed, changelog missing) is healed by replaying the
    same batch — partition overwrite makes the merge idempotent."""
    from stream_cdc_gps_spark.streaming.shingle_df_index import CdcTokenTfView

    base = str(tmp_path / "tf2")
    view = CdcTokenTfView(spark, base, n_doc_buckets=2, n_shingle_buckets=2)
    b0 = _docs(spark, [("c", 1, 1, "a a b"), ("c", 2, 2, "b")])
    view.merge(b0, 0)
    b1 = _docs(spark, [("u", 10, 1, "a"), ("c", 11, 3, "c c")])
    view.merge(b1, 1)
    # tear batch 1's changelog landing away, keep the tf partial
    shutil.rmtree(f"{base}/docs/partials/batch_id=1")
    view2 = CdcTokenTfView(spark, base, n_doc_buckets=2, n_shingle_buckets=2)
    view2.merge(b1, 1)  # replay heals: both sides overwrite their partition
    got = {r["w"]: r["tf"] for r in view2.tf().collect()}
    assert got == {"a": 1, "b": 1, "c": 2}
    alive = {r["doc_id"]: r["text"] for r in view2.alive_docs().collect()}
    assert alive == {1: "a", 2: "b", 3: "c c"}


def _boot_batch(spark, rows):
    return spark.createDataFrame(
        rows, "op string, seq bigint, event_id bigint, v decimal(18,2)"
    )


def test_cdc_bootstrap_arms_equal_from_scratch(spark, tmp_path):
    """Maintained per-replicate (n, Σw, Σw·v) == the from-scratch weighted
    sums over the upserted final table, including the point arm r=-1 —
    value corrections shift every arm, deletes retract all contributions,
    duplicate re-deliveries net to zero."""
    from decimal import Decimal

    from stream_cdc_gps_spark.operators.analytics import _BOOT_THS
    from stream_cdc_gps_spark.streaming.bootstrap_index import CdcBootstrapView

    base = str(tmp_path / "boot")
    view = CdcBootstrapView(
        spark, base, pk="event_id", val="v", thresholds=_BOOT_THS, b=8, n_buckets=2
    )
    view.merge(
        _boot_batch(
            spark,
            [
                ("c", 1, 1, Decimal("10.00")),
                ("c", 2, 2, Decimal("20.00")),
                ("c", 3, 3, Decimal("30.00")),
            ],
        ),
        0,
    )
    view.merge(
        _boot_batch(
            spark,
            [
                ("u", 10, 1, Decimal("15.00")),  # correction
                ("d", 11, 3, Decimal("30.00")),  # delete
                ("u", 12, 2, Decimal("20.00")),  # duplicate re-delivery
            ],
        ),
        1,
    )
    got = {
        r["r"]: (r["n"], r["sw"], r["swv"]) for r in view.arms().collect()
    }
    # from-scratch over the final table {1: 15.00, 2: 20.00}
    final = spark.createDataFrame(
        [(1, Decimal("15.00")), (2, Decimal("20.00"))],
        "event_id bigint, v decimal(18,2)",
    )
    fresh = CdcBootstrapView(
        spark, str(tmp_path / "boot2"), pk="event_id", val="v",
        thresholds=_BOOT_THS, b=8, n_buckets=2,
    )
    fresh.merge(
        final.select(
            F.lit("c").alias("op"), F.col("event_id").alias("seq"), "event_id", "v"
        ),
        0,
    )
    want = {
        r["r"]: (r["n"], r["sw"], r["swv"]) for r in fresh.arms().collect()
    }
    assert got == want
    # the point arm is the plain mean's ingredients
    n, sw, swv = got[-1]
    assert (n, sw, swv) == (2, Decimal("2.00"), Decimal("35.0000"))


def test_cdc_bootstrap_torn_write_heals_on_replay(spark, tmp_path):
    """Family replay contract: tear away batch 1's changelog landing
    (arm partial kept), replay the batch, state converges."""
    from decimal import Decimal

    from stream_cdc_gps_spark.operators.analytics import _BOOT_THS
    from stream_cdc_gps_spark.streaming.bootstrap_index import CdcBootstrapView

    base = str(tmp_path / "boot3")
    view = CdcBootstrapView(
        spark, base, pk="event_id", val="v", thresholds=_BOOT_THS, b=4, n_buckets=2
    )
    b0 = _boot_batch(spark, [("c", 1, 1, Decimal("10.00"))])
    b1 = _boot_batch(spark, [("u", 10, 1, Decimal("12.00"))])
    view.merge(b0, 0)
    view.merge(b1, 1)
    before = {r["r"]: (r["n"], r["sw"], r["swv"]) for r in view.arms().collect()}
    shutil.rmtree(f"{base}/a/partials/batch_id=1")
    view2 = CdcBootstrapView(
        spark, base, pk="event_id", val="v", thresholds=_BOOT_THS, b=4, n_buckets=2
    )
    view2.merge(b1, 1)
    after = {r["r"]: (r["n"], r["sw"], r["swv"]) for r in view2.arms().collect()}
    assert after == before
