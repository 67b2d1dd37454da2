"""r10: bucketed, partition-pruned state reads wired into the CDC/IVM
views (the r9 verdict's #1 task — the store primitive existed, nothing
used it). Pins, per claim:

1. the two state reads a CdcJoinView merge performs — the pk-pruned
   changelog snapshot feeding Δ̂, and the key-pruned arrangement fold
   feeding the bilinear state sides — reach the scan as PARTITION
   filters on kbucket (only touched shard directories are read at all);
2. the arrangement's net-positive fold equals the changelog's
   latest-alive-per-pk snapshot (the inductive identity the key-indexed
   read path rests on), including after a key-moving update and a
   delete;
3. a narrow merge into wide accumulated state rewrites NO pre-existing
   file in ANY of the view's six stores — per-merge write cost is the
   batch's own shards (the LSH untouched-partitions pin, view-level);
4. the maintained snapshot stays equal to the batch recompute through
   the narrow merges (bucket pruning is a superset read — correctness
   must be unaffected).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from stream_cdc_gps_spark.plans.inspect import plan_string
from stream_cdc_gps_spark.streaming.join_view import (
    CdcJoinView,
    alive_images,
    cdc_state,
)

A_SCHEMA = "op string, seq long, oid long, k long, a_val string"
B_SCHEMA = "op string, seq long, k long, b_name string"


def _a_rows(pks, tag, op="c", seq0=0, kof=lambda p: p % 7):
    return [(op, seq0 + p, p, kof(p), f"{tag}{p}") for p in pks]


def _b_rows(ks, tag, op="c", seq0=0):
    return [(op, seq0 + k, k, f"{tag}{k}") for k in ks]


def _file_digests(root):
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = hashlib.md5(fh.read()).hexdigest()
    return out


def _mk_view(spark, tmp_path):
    view = CdcJoinView(
        spark, str(tmp_path / "v"), key="k", a_pk="oid", b_pk="k", n_buckets=8
    )
    a0 = spark.createDataFrame(_a_rows(range(60), "a"), A_SCHEMA)
    b0 = spark.createDataFrame(_b_rows(range(7), "B"), B_SCHEMA)
    view.merge(a0, b0, 0)
    return view


def test_merge_state_reads_are_partition_pruned(spark, tmp_path):
    view = _mk_view(spark, tmp_path)
    narrow = spark.createDataFrame(
        [("u", 100, 5, 6, "a5x")], A_SCHEMA
    ).localCheckpoint()

    # (1a) pk-pruned changelog snapshot: one pk -> one shard scanned
    st = cdc_state(view.a_store, 1, "oid", prune=narrow)
    p = plan_string(st)
    assert "PartitionFilters" in p
    assert "kbucket" in p.split("PartitionFilters", 1)[1][:200]
    assert [r.oid for r in st.collect() if r.oid == 5] == [5]

    # (1b) key-pruned arrangement fold: the B-side state the bilinear
    # term joins is read through a kbucket partition filter too
    img = alive_images(view.bk_store, 1, prune=narrow.select("k"))
    p = plan_string(img)
    assert "PartitionFilters" in p
    assert "kbucket" in p.split("PartitionFilters", 1)[1][:200]
    assert 6 in {r.k for r in img.collect()}


def test_arrangement_fold_equals_changelog_snapshot(spark, tmp_path):
    view = _mk_view(spark, tmp_path)
    # batch 1: key-moving update, in-place update, delete, same-image u
    a1 = spark.createDataFrame(
        [
            ("u", 100, 5, 6, "a5x"),   # key 5%7=5 -> 6 (moves)
            ("u", 101, 8, 1, "a8"),    # same image as create
            ("d", 102, 10, 3, "a10"),
        ],
        A_SCHEMA,
    )
    view.merge(a1, spark.createDataFrame([], B_SCHEMA), 1)

    snap = cdc_state(view.a_store, 2, "oid")
    fold = alive_images(view.ak_store, 2)
    assert sorted(map(tuple, snap.select("oid", "k", "a_val").collect())) == sorted(
        map(tuple, fold.select("oid", "k", "a_val").collect())
    )
    got = {r.oid: (r.k, r.a_val) for r in fold.collect()}
    assert got[5] == (6, "a5x") and got[8] == (1, "a8") and 10 not in got


def test_narrow_merge_rewrites_no_preexisting_file(spark, tmp_path):
    view = _mk_view(spark, tmp_path)
    root = str(tmp_path / "v")
    before = _file_digests(root)
    view.merge(
        spark.createDataFrame([("u", 100, 5, 6, "a5x")], A_SCHEMA),
        spark.createDataFrame([("u", 100, 6, "B6x")], B_SCHEMA),
        1,
    )
    after = _file_digests(root)
    for path, digest in before.items():
        assert after.get(path) == digest, f"pre-existing file rewritten: {path}"
    # and the merge landed strictly fewer A-changelog shards than exist
    b1_dir = os.path.join(root, "a", "partials", "batch_id=1")
    b0_dir = os.path.join(root, "a", "partials", "batch_id=0")
    assert len(os.listdir(b1_dir)) < len(os.listdir(b0_dir))


def test_vector_index_probe_prunes_to_probed_cells(spark, tmp_path):
    """r10 task #2: the incremental vector index's code store is bucketed
    by cell, and base_table(cells=probes) reaches the scan as a kbucket
    PARTITION filter naming no more shards than probe cells — a 2-probe
    search opens 2 posting lists, not the corpus. Pruned and unpruned
    searches must return identical rows (the prune is a superset; the
    cell equi join filters exactly)."""
    from stream_cdc_gps_spark.operators.similarity import (
        _ivfadc_query,
        _lloyd_train_pq,
        _probe_cells,
        _seed_centroids,
        as_double,
    )
    from stream_cdc_gps_spark.operators.common import t
    from stream_cdc_gps_spark.streaming.vector_index import IncrementalVectorIndex

    e = t(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    cents = _seed_centroids(e)
    cbs = _lloyd_train_pq(e, iters=0)
    idx = IncrementalVectorIndex(spark, str(tmp_path / "vi"), cents, cbs)
    idx.merge(e.filter(F.col("vec_id") % 2 == 0), 0)
    idx.merge(e.filter(F.col("vec_id") % 2 == 1), 1)

    qv = e.filter(F.col("vec_id") < 3)
    cells = _probe_cells(qv, cents, nprobe=2)
    assert cells  # the sample probes at least one cell

    pruned = idx.base_table(cells=cells)
    p = plan_string(pruned)
    assert "PartitionFilters" in p
    tail = p.split("PartitionFilters", 1)[1][:300]
    assert "kbucket" in tail
    # no more shards named than probe cells (hash may collide two cells
    # into one shard, never the reverse)
    n_shards = tail.count("kbucket#") or tail.count("kbucket")
    lit = spark.createDataFrame([(int(c),) for c in cells], "cell int")
    assert len(idx.store.touched_buckets(lit)) <= len(cells)

    got = sorted(
        map(tuple, _ivfadc_query(pruned, qv, cents, cbs).collect())
    )
    full = sorted(
        map(tuple, _ivfadc_query(idx.base_table(), qv, cents, cbs).collect())
    )
    assert got == full


def test_cdc_vector_index_mutations(spark, tmp_path):
    """r10: the CDC-maintained vector index. A delete must leave the
    index, a re-embedding must move the vector's codes between posting
    lists (the −1 retraction lands under the OLD cell), duplicate
    re-delivery is a net no-op, a torn code-store write heals on
    replay, and compaction folds retractions away while preserving the
    alive set."""
    import os as _os
    import shutil as _shutil

    from stream_cdc_gps_spark.operators.similarity import (
        _ivfadc_encode,
        _lloyd_train_pq,
        _seed_centroids,
        as_double,
    )
    from stream_cdc_gps_spark.operators.common import t
    from stream_cdc_gps_spark.streaming.vector_index import CdcVectorIndex

    e = t(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    cents = _seed_centroids(e)
    cbs = _lloyd_train_pq(e, iters=0)
    vid = F.col("vec_id")
    neg = F.transform("emb", lambda x: -x)

    idx = CdcVectorIndex(spark, str(tmp_path / "cvi"), cents, cbs)
    a0 = e.select(F.lit("c").alias("op"), vid.alias("seq"), "vec_id", "emb")
    idx.merge(a0, 0)
    base0 = {r.vec_id: r.cell for r in idx.base_table().collect()}
    n0 = len(base0)

    # batch 1: delete vec 0, re-embed vec 1 (negated), duplicate vec 2
    a1 = (
        e.filter(vid == 0)
        .select(F.lit("d").alias("op"), F.lit(100).alias("seq"), "vec_id", "emb")
        .unionByName(
            e.filter(vid == 1).select(
                F.lit("u").alias("op"), F.lit(101).alias("seq"), "vec_id",
                neg.alias("emb"),
            )
        )
        .unionByName(
            e.filter(vid == 2).select(
                F.lit("u").alias("op"), F.lit(102).alias("seq"), "vec_id", "emb"
            )
        )
    )
    idx.merge(a1, 1)
    alive = {r.vec_id: r.cell for r in idx.base_table().collect()}
    assert len(alive) == n0 - 1 and 0 not in alive
    assert alive[2] == base0[2]  # duplicate: unchanged
    # the re-embedded vector carries the NEW encode (golden from a live encode)
    golden1 = (
        _ivfadc_encode(
            e.filter(vid == 1).select("vec_id", neg.alias("emb")), cents, cbs
        )
        .collect()[0]
    )
    got1 = [r for r in idx.base_table().collect() if r.vec_id == 1][0]
    assert tuple(got1) == tuple(golden1)

    golden = sorted(map(tuple, idx.base_table().collect()))

    # torn write: batch 1's code partition vanishes, changelog survived
    _shutil.rmtree(_os.path.join(idx.code_store.partials_path, "batch_id=1"))
    assert sorted(map(tuple, idx.base_table().collect())) != golden
    idx.merge(a1, 1)
    assert sorted(map(tuple, idx.base_table().collect())) == golden

    # compaction folds retractions away; snapshot invariant; replay refused
    idx.compact()
    assert idx.n_partials() == 1
    assert sorted(map(tuple, idx.base_table().collect())) == golden
    idx.merge(a1, 1)
    assert sorted(map(tuple, idx.base_table().collect())) == golden
    # the folded code store holds ONLY net rows: no ±1 pairs remain
    folded = idx.code_store.rows()
    from stream_cdc_gps_spark.streaming.join_view import IMG_W
    assert folded.filter(F.col(IMG_W) != 1).count() == 0
    assert folded.count() == len(golden)


def test_grouped_recompute_matches_python_replay_on_generated(spark):
    """Hypothesis fuzz for CdcGroupedRecomputeView with a genuinely
    SEQUENCE-DEPENDENT aggregate (per-key sum of |Δv| over pk-ordered
    alive rows — the trip-distance shape with integer-exact Decimals):
    any generated c/u/d script, split anywhere into two batches, must
    land exactly the last-writer-wins Python replay's per-key recompute,
    and re-merging the last batch (replay) must be a no-op."""
    import shutil
    import tempfile
    from decimal import Decimal

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from stream_cdc_gps_spark.streaming.join_view import CdcGroupedRecomputeView

    schema = "op string, seq long, oid long, k long, v decimal(18,2)"
    opname = {0: "c", 1: "u", 2: "d"}

    def span_recompute(after):
        w = Window.partitionBy("k").orderBy("oid")
        d = F.abs(F.col("v") - F.lag("v").over(w))
        return (
            after.withColumn("_d", d)
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.coalesce(F.sum("_d"), F.lit(0).cast("decimal(28,2)")).alias(
                    "span"
                ),
            )
        )

    ops_st = st.lists(
        st.tuples(
            st.integers(0, 2),  # op
            st.integers(0, 5),  # pk
            st.integers(0, 3),  # key
            st.integers(0, 999),  # value in cents
        ),
        max_size=8,
    )

    @given(ops=ops_st, split_raw=st.integers(0, 9))
    @settings(max_examples=5, deadline=None)
    def run(ops, split_raw):
        rows = [
            (opname[t_], i, pk, k, Decimal(v) / 100)
            for i, (t_, pk, k, v) in enumerate(ops)
        ]
        split = split_raw % (len(rows) + 1)

        state: dict[int, tuple[int, Decimal]] = {}
        for t_, pk, k, v in ops:
            if t_ == 2:
                state.pop(pk, None)
            else:
                state[pk] = (k, Decimal(v) / 100)
        by_key: dict[int, list[tuple[int, Decimal]]] = {}
        for pk, (k, v) in state.items():
            by_key.setdefault(k, []).append((pk, v))
        golden = sorted(
            (
                k,
                len(items),
                sum(
                    (abs(b[1] - a[1]) for a, b in zip(items, items[1:])),
                    Decimal(0),
                ),
            )
            for k, items in ((k, sorted(v)) for k, v in by_key.items())
        )

        base = tempfile.mkdtemp(prefix="grv_prop_")
        try:
            view = CdcGroupedRecomputeView(
                spark, base, key="k", pk="oid", recompute=span_recompute,
                n_buckets=4,
            )
            view.merge(spark.createDataFrame(rows[:split], schema), 0)
            b1 = spark.createDataFrame(rows[split:], schema)
            view.merge(b1, 1)
            view.merge(b1, 1)  # replay must be a no-op

            try:
                got = sorted(
                    (r.k, r.n, Decimal(r.span)) for r in view.snapshot().collect()
                )
            except ValueError:
                got = []
            assert got == golden
        finally:
            shutil.rmtree(base, ignore_errors=True)

    run()


def test_cdc_lsh_index_matches_batch_on_generated(spark):
    """Hypothesis fuzz for CdcLshIndex: generated c/u/d scripts over a
    small doc pool (texts drawn from three near-dup-clustered sentences)
    must land exactly the batch LSH pairs over the upserted final docs."""
    import shutil
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from stream_cdc_gps_spark.operators.dedup import (
        MAX_POSTING,
        band_tuples_of,
        bucket_pair_expand,
    )
    from stream_cdc_gps_spark.streaming.dedup_index import CdcLshIndex

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",
        "one two three four five six seven eight",
    ]
    schema = "op string, seq long, doc_id long, text string"
    opname = {0: "c", 1: "u", 2: "d"}

    def batch_pairs(final_docs):
        if not final_docs:
            return []
        bands = band_tuples_of(
            spark.createDataFrame(
                sorted(final_docs.items()), "doc_id long, text string"
            )
        )
        buckets = (
            bands.groupBy("band", "band_key")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
            .filter((F.size("ids") > 1) & (F.size("ids") <= MAX_POSTING))
        )
        return sorted(
            map(
                tuple,
                bucket_pair_expand(buckets)
                .select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
                .groupBy("doc_a", "doc_b")
                .agg(F.count(F.lit(1)).alias("n_shared_bands"))
                .collect(),
            )
        )

    ops_st = st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 4), st.integers(0, 2)),
        max_size=6,
    )

    @given(ops=ops_st, split_raw=st.integers(0, 7))
    @settings(max_examples=4, deadline=None)
    def run(ops, split_raw):
        rows = [
            (opname[t_], i, d, texts[x]) for i, (t_, d, x) in enumerate(ops)
        ]
        split = split_raw % (len(rows) + 1)
        final: dict[int, str] = {}
        for t_, d, x in ops:
            if t_ == 2:
                final.pop(d, None)
            else:
                final[d] = texts[x]
        golden = batch_pairs(final)

        base = tempfile.mkdtemp(prefix="lsh_prop_")
        try:
            idx = CdcLshIndex(spark, base, n_buckets=4)
            idx.merge(spark.createDataFrame(rows[:split], schema), 0)
            idx.merge(spark.createDataFrame(rows[split:], schema), 1)
            try:
                got = sorted(map(tuple, idx.pairs().collect()))
            except ValueError:
                got = []
            assert got == golden
        finally:
            shutil.rmtree(base, ignore_errors=True)

    run()


def test_cdc_lsh_index_mutations(spark, tmp_path):
    """r10: the CDC-maintained LSH index. A re-crawl moves a doc's
    postings between buckets and retracts its stale collision edges; a
    delete removes the doc from every pair; a duplicate re-delivery is
    a net no-op; a torn pair-store write heals on replay; compaction
    preserves the pair set. Parity target: the batch LSH pairs over the
    upserted final docs (computed in-test via the same public batch
    helpers)."""
    import os as _os
    import shutil as _shutil

    from stream_cdc_gps_spark.operators.dedup import (
        MAX_POSTING,
        band_tuples_of,
        bucket_pair_expand,
    )
    from stream_cdc_gps_spark.streaming.dedup_index import CdcLshIndex

    mk = lambda rows: spark.createDataFrame(
        rows, "op string, seq long, doc_id long, text string"
    )

    def batch_pairs(docs):
        bands = band_tuples_of(
            spark.createDataFrame(docs, "doc_id long, text string")
        )
        buckets = (
            bands.groupBy("band", "band_key")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
            .filter((F.size("ids") > 1) & (F.size("ids") <= MAX_POSTING))
        )
        return sorted(
            map(
                tuple,
                bucket_pair_expand(buckets)
                .select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
                .groupBy("doc_a", "doc_b")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect(),
            )
        )

    base_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    docs0 = [(1, base_text), (2, base_text), (3, other), (4, other)]
    idx = CdcLshIndex(spark, str(tmp_path / "lsh"), n_buckets=4)
    idx.merge(mk([("c", i, d, t_) for i, (d, t_) in enumerate(docs0)]), 0)
    got = lambda: sorted(map(tuple, idx.pairs().collect()))
    assert got() == batch_pairs(docs0)
    assert (1, 2, got()[0][2]) in got()  # 1-2 are near-dups

    # batch 1: re-crawl doc 2 to the OTHER cluster (its 1-2 edges must
    # retract, 2 now pairs with 3/4), delete doc 4, duplicate doc 3
    a1 = [
        ("u", 10, 2, other),
        ("d", 11, 4, other),
        ("u", 12, 3, other),
    ]
    docs1 = [(1, base_text), (2, other), (3, other)]
    idx.merge(mk(a1), 1)
    golden = batch_pairs(docs1)
    assert got() == golden
    assert not any(a == 1 or b == 1 for a, b, _ in got())  # doc 1 now alone

    # torn write: batch 1's pair partition vanishes, postings survived
    _shutil.rmtree(_os.path.join(idx.pair_store.partials_path, "batch_id=1"))
    assert got() != golden
    idx.merge(mk(a1), 1)
    assert got() == golden

    # compaction folds all three stores; pairs invariant; replay refused
    idx.compact()
    assert idx.n_partials() == 1
    assert got() == golden
    idx.merge(mk(a1), 1)
    assert got() == golden


def test_suite_restart_resume_from_checkpoint_heals_torn_batch(spark, tmp_path):
    """r10 task #3 (carried from r8): RESTART ≠ REPLAY. The replay tests
    re-call merge() in-process; this drives CdcViewSuite through a real
    checkpointed readStream → foreachBatch (availableNow,
    maxFilesPerTrigger=1 → one epoch per file), CRASHES the handler
    mid-epoch-1 after a TORN prefix of the suite's landings (one member
    merged, nothing else), then starts a NEW query on the SAME
    checkpoint — the reference's restartable consume loop
    (cmd/main.go:197-230) under its actual failure mode. Structured
    Streaming must re-deliver epoch 1 (its offsets never committed), the
    re-run merge must overwrite the torn prefix idempotently, and the
    dashboard must equal the batch recompute."""
    import json as _json
    import os as _os
    import time as _time

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from stream_cdc_gps_spark.streaming.join_view import CdcViewSuite

    src = tmp_path / "in"
    src.mkdir()
    a0 = [
        {"side": "a", "op": "c", "seq": 1, "oid": 10, "k": 1, "v": "5.00", "c": "x"},
        {"side": "a", "op": "c", "seq": 2, "oid": 11, "k": 1, "v": "3.00", "c": "y"},
        {"side": "a", "op": "c", "seq": 3, "oid": 12, "k": 2, "v": "7.00", "c": "x"},
    ]
    b0 = [{"side": "b", "op": "c", "seq": 1, "k": 1, "b_name": "Alice"}]
    a1 = [
        {"side": "a", "op": "u", "seq": 10, "oid": 10, "k": 2, "v": "6.00", "c": "z"},
        {"side": "a", "op": "d", "seq": 11, "oid": 11, "k": 1, "v": "3.00", "c": "y"},
    ]
    b1 = [
        {"side": "b", "op": "d", "seq": 10, "k": 1, "b_name": "Alice"},
        {"side": "b", "op": "c", "seq": 11, "k": 2, "b_name": "Bob"},
    ]
    (src / "b0.jsonl").write_text("\n".join(_json.dumps(r) for r in a0 + b0))
    (src / "b1.jsonl").write_text("\n".join(_json.dumps(r) for r in a1 + b1))
    # FileStreamSource orders by modification time — pin it
    now = _time.time()
    _os.utime(src / "b0.jsonl", (now - 100, now - 100))
    _os.utime(src / "b1.jsonl", (now, now))

    schema = (
        "side string, op string, seq long, oid long, k long, "
        "v decimal(18,2), b_name string, c string"
    )
    suite = CdcViewSuite(
        spark, str(tmp_path / "suite"), key="k", a_pk="oid", b_pk="k",
        num_val="v", cat_val="c", k=2, n_buckets=4,
    )
    epochs: list[tuple[int, int]] = []
    crash_armed = [True]

    def handler(df, epoch_id):
        df = df.localCheckpoint()
        a = df.filter(F.col("side") == "a").select("op", "seq", "oid", "k", "v", "c")
        b = df.filter(F.col("side") == "b").select("op", "seq", "k", "b_name")
        if int(epoch_id) == 1 and crash_armed[0]:
            # torn prefix: ONE member's view delta lands, then the crash —
            # the worst restart state (view ahead of changelogs)
            suite.join.merge(a, b, int(epoch_id))
            epochs.append((1, -1))
            raise RuntimeError("injected crash mid-suite-merge")
        suite.merge(a, b, int(epoch_id))
        epochs.append((int(epoch_id), 1))

    def run():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
            .writeStream.foreachBatch(handler)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(420), "stream did not terminate"

    with pytest.raises(StreamingQueryException, match="injected crash"):
        run()
    assert epochs == [(0, 1), (1, -1)]  # epoch 0 committed, epoch 1 torn
    crash_armed[0] = False
    run()  # SAME checkpoint: epoch 1 must be re-delivered, not skipped
    assert epochs == [(0, 1), (1, -1), (1, 1)]

    # parity vs the plain batch recompute over the upserted final tables
    from decimal import Decimal as D

    dash = {
        r.k: (r.n, r.total, r.vmin, r.vmax, r.n_distinct, r.n_matched)
        for r in suite.snapshot_dashboard().collect()
    }
    # final A: oid 10 -> (k=2, 6.00, z); oid 11 deleted; oid 12 -> (2, 7.00, x)
    # final B: k=1 deleted, k=2 Bob
    assert dash == {
        2: (2, D("13.00"), D("6.00"), D("7.00"), 2, 2),
    }


def test_snapshot_parity_through_narrow_merges(spark, tmp_path):
    view = _mk_view(spark, tmp_path)
    view.merge(
        spark.createDataFrame([("u", 100, 5, 6, "a5x")], A_SCHEMA),
        spark.createDataFrame([("d", 100, 3, "B3")], B_SCHEMA),
        1,
    )
    view.merge(
        spark.createDataFrame([("d", 200, 20, 6, "a20")], A_SCHEMA),
        spark.createDataFrame([("u", 200, 0, "B0x")], B_SCHEMA),
        2,
    )
    # batch recompute over the upserted final tables
    a_final = {p: (p % 7, f"a{p}") for p in range(60)}
    a_final[5] = (6, "a5x")
    del a_final[20]
    b_final = {k: f"B{k}" for k in range(7)}
    del b_final[3]
    b_final[0] = "B0x"
    golden = sorted(
        (oid, k, v, b_final[k]) for oid, (k, v) in a_final.items() if k in b_final
    )
    got = sorted(
        map(tuple, view.snapshot().select("oid", "k", "a_val", "b_name").collect())
    )
    assert got == golden
