"""r11: the THREE-LAYER cascaded IVM view (join → linear aggregate →
top-k order statistic, streaming/join_view.CdcCascadeTopKView — the r10
verdict's task #6). Pins, per claim:

1. every rank transition class lands the maintained top-k on the batch
   recompute: eviction by retraction (a delete demotes the leader),
   promotion of the next-ranked group, a GROUP-key move through the
   join (B-side rename), a RANK-PARTITION move (B-side segment change
   retracts a group's whole aggregate from one partition's ranking and
   asserts it into another's in one merge), and a B-side delete that
   retracts a partition's leader entirely;
2. NEITHER intermediate is materialized: no join m-store directory ever
   exists, and the only landed state beyond the join stage's four
   stores is per-GROUP aggregate partials + the ≤ k·|partitions| top-k
   view;
3. the layer-3 rerank reads the per-group partial store through a
   kbucket PARTITION filter naming only the touched rank-partitions'
   shards, and the pruned recompute equals the unpruned one;
4. torn writes heal on replay (any subset of the six landings), and
   compaction preserves the snapshot while refusing replays;
5. generated two-batch c/u/d scripts (hypothesis) land exactly the
   Python last-writer-wins replay's join + group + rank golden.
"""

from __future__ import annotations

import os
import shutil
from decimal import Decimal as D

from pyspark.sql import functions as F

from stream_cdc_gps_spark.plans.inspect import plan_string
from stream_cdc_gps_spark.streaming.join_view import (
    CdcCascadeTopKView,
    pruned_before,
)

A_SCHEMA = (
    "op string, seq long, order_key long, cust_key long, total_price decimal(18,2)"
)
B_SCHEMA = "op string, seq long, cust_key long, cust_name string, segment string"


def _mk(spark, tmp_path, n_buckets=8):
    view = CdcCascadeTopKView(
        spark, str(tmp_path / "cv"), key="cust_key", a_pk="order_key",
        b_pk="cust_key", pkey="segment", gkey="cust_name",
        val="total_price", k=2, n_buckets=n_buckets,
    )
    a0 = spark.createDataFrame(
        [
            ("c", 1, 1, 10, D("5.00")),
            ("c", 2, 2, 11, D("4.00")),
            ("c", 3, 3, 12, D("3.00")),
            ("c", 4, 4, 13, D("2.00")),
            ("c", 5, 5, 20, D("9.00")),
            ("c", 6, 6, 10, D("1.00")),
        ],
        A_SCHEMA,
    )
    b0 = spark.createDataFrame(
        [
            ("c", 1, 10, "acme", "S1"),
            ("c", 2, 11, "bob", "S1"),
            ("c", 3, 12, "carl", "S1"),
            ("c", 4, 13, "dora", "S1"),
            ("c", 5, 20, "eve", "S2"),
        ],
        B_SCHEMA,
    )
    view.merge(a0, b0, 0)
    return view


def _snap(view):
    return sorted(
        (r.segment, r.cust_name, r.n, D(r.total)) for r in view.snapshot().collect()
    )


_B1_A = [
    ("d", 10, 1, 10, D("5.00")),   # delete acme's big order: leader evicted
    ("u", 11, 2, 11, D("2.50")),   # bob 4.00 -> 2.50
]
_B1_B = [
    ("u", 10, 12, "carl", "S2"),   # RANK-PARTITION move: carl S1 -> S2
    ("u", 11, 13, "dora2", "S1"),  # GROUP-key move through the join
    ("d", 12, 20, "eve", "S2"),    # retract a partition's leader entirely
]
# final tables: orders o2(11,2.50) o3(12,3.00) o4(13,2.00) o6(10,1.00),
# o5 orphaned (eve deleted); customers 10 acme S1, 11 bob S1, 12 carl S2,
# 13 dora2 S1 -> S1 agg: bob 2.50, dora2 2.00, acme 1.00; S2: carl 3.00
_WANT1 = [
    ("S1", "bob", 1, D("2.50")),
    ("S1", "dora2", 1, D("2.00")),
    ("S2", "carl", 1, D("3.00")),
]


def test_cascade_topk_rank_transitions(spark, tmp_path):
    view = _mk(spark, tmp_path)
    assert _snap(view) == [
        ("S1", "acme", 2, D("6.00")),
        ("S1", "bob", 1, D("4.00")),
        ("S2", "eve", 1, D("9.00")),
    ]
    view.merge(
        spark.createDataFrame(_B1_A, A_SCHEMA),
        spark.createDataFrame(_B1_B, B_SCHEMA),
        1,
    )
    assert _snap(view) == _WANT1
    # the layer-2 aggregate rides the same store: full per-group truth
    agg = sorted(
        (r.segment, r.cust_name, r.n, D(r.total))
        for r in view.agg_snapshot().collect()
    )
    assert agg == [
        ("S1", "acme", 1, D("1.00")),
        ("S1", "bob", 1, D("2.50")),
        ("S1", "dora2", 1, D("2.00")),
        ("S2", "carl", 1, D("3.00")),
    ]
    # claim 2: the intermediate join view was never stored
    assert not os.path.isdir(str(tmp_path / "cv" / "join" / "m" / "partials"))


def test_cascade_topk_torn_writes_heal_and_compaction_preserves(spark, tmp_path):
    view = _mk(spark, tmp_path)
    a1 = spark.createDataFrame(_B1_A, A_SCHEMA)
    b1 = spark.createDataFrame(_B1_B, B_SCHEMA)
    view.merge(a1, b1, 1)
    assert _snap(view) == _WANT1

    # torn write: the batch-1 TOP-K view partition AND the aggregate
    # partials vanish; the join stage's four landings survived — the
    # worst prefix (outer layers behind the sources)
    shutil.rmtree(str(tmp_path / "cv" / "t" / "partials" / "batch_id=1"))
    shutil.rmtree(str(tmp_path / "cv" / "v" / "partials" / "batch_id=1"))
    assert _snap(view) != _WANT1
    replay = CdcCascadeTopKView(
        spark, str(tmp_path / "cv"), key="cust_key", a_pk="order_key",
        b_pk="cust_key", pkey="segment", gkey="cust_name",
        val="total_price", k=2, n_buckets=8,
    )
    replay.merge(a1, b1, 1)
    assert _snap(replay) == _WANT1

    # compaction folds every store; snapshot invariant; replay refused
    replay.compact()
    assert replay.n_partials() == 1
    assert _snap(replay) == _WANT1
    replay.merge(a1, b1, 1)
    assert _snap(replay) == _WANT1


def test_cascade_rerank_read_is_partition_pruned(spark, tmp_path):
    view = _mk(spark, tmp_path)
    # a batch touching ONLY segment S2's ranking, typed exactly as the
    # store's landed partials (decimal widths must match for the union)
    dtotal_t = view.v_store.rows_before(1).schema["dtotal"].dataType.simpleString()
    dv = spark.createDataFrame(
        [("S2", "eve", 0, D("1.00"))],
        f"segment string, cust_name string, dn bigint, dtotal {dtotal_t}",
    ).localCheckpoint()
    touched = dv.select("segment").distinct().localCheckpoint()
    v_pre = pruned_before(view.v_store, 1, prune=touched)
    p = plan_string(v_pre)
    # claim 3: the per-group partial read is a kbucket PARTITION filter
    assert "PartitionFilters" in p
    assert "kbucket" in p.split("PartitionFilters", 1)[1][:200]
    assert len(view.v_store.touched_buckets(touched)) == 1
    # pruning is a superset read: pruned rerank == unpruned rerank
    got = sorted(map(tuple, view._topk(dv, touched, v_pre).collect()))
    full = sorted(
        map(
            tuple,
            view._topk(dv, touched, view.v_store.rows_before(1)).collect(),
        )
    )
    assert got == full
    assert got == [("S2", "eve", 1, D("10.00"))]


def test_cascade_topk_matches_python_replay_on_generated(spark):
    """Hypothesis fuzz: any generated two-batch c/u/d script over both
    sides must land exactly the Python replay's join + group-sum +
    per-partition rank-2 golden (count desc is NOT the order — total
    desc, name asc is)."""
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    segs = ["S1", "S2"]
    names = ["n0", "n1", "n2"]
    opname = {0: "c", 1: "u", 2: "d"}

    a_ops = st.lists(
        st.tuples(
            st.integers(0, 2),  # op
            st.integers(0, 4),  # order pk
            st.integers(0, 3),  # cust key
            st.integers(0, 99),  # price cents
        ),
        max_size=7,
    )
    b_ops = st.lists(
        st.tuples(
            st.integers(0, 2),  # op
            st.integers(0, 3),  # cust pk
            st.integers(0, 2),  # name idx
            st.integers(0, 1),  # segment idx
        ),
        max_size=5,
    )

    @given(a=a_ops, b=b_ops, split_raw=st.integers(0, 9))
    @settings(max_examples=4, deadline=None)
    def run(a, b, split_raw):
        a_rows = [
            (opname[t_], i, pk, ck, D(v) / 100) for i, (t_, pk, ck, v) in enumerate(a)
        ]
        b_rows = [
            (opname[t_], i, pk, names[n], segs[s])
            for i, (t_, pk, n, s) in enumerate(b)
        ]
        sa = split_raw % (len(a_rows) + 1)
        sb = split_raw % (len(b_rows) + 1)

        a_final: dict[int, tuple[int, D]] = {}
        for t_, pk, ck, v in a:
            if t_ == 2:
                a_final.pop(pk, None)
            else:
                a_final[pk] = (ck, D(v) / 100)
        b_final: dict[int, tuple[str, str]] = {}
        for t_, pk, n, s in b:
            if t_ == 2:
                b_final.pop(pk, None)
            else:
                b_final[pk] = (names[n], segs[s])
        agg: dict[tuple[str, str], tuple[int, D]] = {}
        for ck, v in a_final.values():
            if ck in b_final:
                nm, sg = b_final[ck]
                n0, t0 = agg.get((sg, nm), (0, D(0)))
                agg[(sg, nm)] = (n0 + 1, t0 + v)
        golden = []
        for sg in segs:
            grp = sorted(
                ((nm, n, t_) for (s_, nm), (n, t_) in agg.items() if s_ == sg),
                key=lambda r: (-r[2], r[0]),
            )[:2]
            golden += [(sg, nm, n, t_) for nm, n, t_ in grp]
        golden.sort()

        base = tempfile.mkdtemp(prefix="cascade_prop_")
        try:
            view = CdcCascadeTopKView(
                spark, base, key="cust_key", a_pk="order_key", b_pk="cust_key",
                pkey="segment", gkey="cust_name", val="total_price", k=2,
                n_buckets=4,
            )
            view.merge(
                spark.createDataFrame(a_rows[:sa], A_SCHEMA),
                spark.createDataFrame(b_rows[:sb], B_SCHEMA),
                0,
            )
            a1 = spark.createDataFrame(a_rows[sa:], A_SCHEMA)
            b1 = spark.createDataFrame(b_rows[sb:], B_SCHEMA)
            view.merge(a1, b1, 1)
            view.merge(a1, b1, 1)  # replay must be a no-op
            try:
                got = _snap(view)
            except ValueError:
                got = []
            assert got == golden
        finally:
            shutil.rmtree(base, ignore_errors=True)

    run()


def test_cascade_restart_resume_from_checkpoint_heals_torn_batch(spark, tmp_path):
    """RESTART ≠ REPLAY (the r10 suite-restart discipline applied to the
    three-layer view): drive CdcCascadeTopKView through a real
    checkpointed readStream → foreachBatch (availableNow,
    maxFilesPerTrigger=1 → one epoch per file), CRASH the handler
    mid-epoch-1 after a TORN prefix of its six landings (the join
    stage's four source landings durable, the two view layers' gone —
    outer layers behind the sources, the worst restart state), then
    start a NEW query on the SAME checkpoint. Structured Streaming must
    re-deliver epoch 1 (offsets never committed), the re-run merge must
    overwrite the torn prefix idempotently, and the snapshot must equal
    the batch recompute golden."""
    import json as _json
    import os as _os
    import time as _time

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    src = tmp_path / "in"
    src.mkdir()

    def _a(op, seq, okey, ck, v):
        return {"side": "a", "op": op, "seq": seq, "order_key": okey,
                "cust_key": ck, "total_price": v}

    def _b(op, seq, ck, nm, sg):
        return {"side": "b", "op": op, "seq": seq, "cust_key": ck,
                "cust_name": nm, "segment": sg}

    e0 = [
        _a("c", 1, 1, 10, "5.00"), _a("c", 2, 2, 11, "4.00"),
        _a("c", 3, 3, 12, "3.00"), _a("c", 4, 4, 13, "2.00"),
        _a("c", 5, 5, 20, "9.00"), _a("c", 6, 6, 10, "1.00"),
        _b("c", 1, 10, "acme", "S1"), _b("c", 2, 11, "bob", "S1"),
        _b("c", 3, 12, "carl", "S1"), _b("c", 4, 13, "dora", "S1"),
        _b("c", 5, 20, "eve", "S2"),
    ]
    e1 = [
        _a("d", 10, 1, 10, "5.00"), _a("u", 11, 2, 11, "2.50"),
        _b("u", 10, 12, "carl", "S2"), _b("u", 11, 13, "dora2", "S1"),
        _b("d", 12, 20, "eve", "S2"),
    ]
    (src / "b0.jsonl").write_text("\n".join(_json.dumps(r) for r in e0))
    (src / "b1.jsonl").write_text("\n".join(_json.dumps(r) for r in e1))
    now = _time.time()
    _os.utime(src / "b0.jsonl", (now - 100, now - 100))
    _os.utime(src / "b1.jsonl", (now, now))

    schema = (
        "side string, op string, seq long, order_key long, cust_key long, "
        "total_price decimal(18,2), cust_name string, segment string"
    )
    view = CdcCascadeTopKView(
        spark, str(tmp_path / "cv"), key="cust_key", a_pk="order_key",
        b_pk="cust_key", pkey="segment", gkey="cust_name",
        val="total_price", k=2, n_buckets=4,
    )
    epochs: list[tuple[int, int]] = []
    crash_armed = [True]

    def handler(df, epoch_id):
        df = df.localCheckpoint()
        a = df.filter(F.col("side") == "a").select(
            "op", "seq", "order_key", "cust_key", "total_price"
        )
        b = df.filter(F.col("side") == "b").select(
            "op", "seq", "cust_key", "cust_name", "segment"
        )
        view.merge(a, b, int(epoch_id))
        if int(epoch_id) == 1 and crash_armed[0]:
            # tear the two VIEW layers back out, keep the four source
            # landings — a durable subset of the concurrent wave — and
            # crash before the epoch's offsets commit
            shutil.rmtree(str(tmp_path / "cv" / "t" / "partials" / "batch_id=1"))
            shutil.rmtree(str(tmp_path / "cv" / "v" / "partials" / "batch_id=1"))
            epochs.append((1, -1))
            raise RuntimeError("injected crash mid-cascade-merge")
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
    assert epochs == [(0, 1), (1, -1)]
    assert _snap(view) != _WANT1  # the torn state is visibly wrong
    crash_armed[0] = False
    run()  # SAME checkpoint: epoch 1 re-delivered, not skipped
    assert epochs == [(0, 1), (1, -1), (1, 1)]
    assert _snap(view) == _WANT1
