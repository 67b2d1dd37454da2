"""Late-r10 session additions: CDC-maintained sessionization (q216 —
the merge/split semantics that make session windows the hardest
maintained aggregate) including a checkpointed streaming
restart-resume, plus the KMV bottom-K sketch's mergeability
property (q215)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from stream_cdc_gps_spark.operators.analytics import (
    _SESSION_GAP_US,
    session_recompute,
)
from stream_cdc_gps_spark.operators.relational import _KMV_K, _kmv_hash
from stream_cdc_gps_spark.streaming.join_view import CdcGroupedRecomputeView

HOUR = 3_600_000_000  # µs


def _chg(spark, rows):
    return spark.createDataFrame(
        rows, "op string, seq bigint, eid bigint, uid bigint, us bigint"
    )


def _snap(view):
    return {
        r["uid"]: (r["n"], r["n_sessions"], r["total_dur_us"])
        for r in view.snapshot().collect()
    }


def test_session_view_merge_and_split(spark, tmp_path):
    """A late event BRIDGES two sessions into one; retracting it splits
    them back; a user-moving fix re-sessionizes both timelines."""
    view = CdcGroupedRecomputeView(
        spark, str(tmp_path / "sess"), key="uid", pk="eid",
        recompute=session_recompute, n_buckets=4,
    )
    # user 1: events at 0h, 1h, 10h -> sessions {0,1} and {10} (6h gap)
    view.merge(
        _chg(spark, [("c", 1, 1, 1, 0), ("c", 2, 2, 1, HOUR), ("c", 3, 3, 1, 10 * HOUR)]),
        0,
    )
    assert _snap(view) == {1: (3, 2, HOUR)}
    # late event at 5h bridges: gaps 1h/4h/5h -> ONE session spanning 10h
    view.merge(_chg(spark, [("c", 10, 4, 1, 5 * HOUR)]), 1)
    assert _snap(view) == {1: (4, 1, 10 * HOUR)}
    # retract the bridge -> splits back into the original two sessions
    view.merge(_chg(spark, [("d", 20, 4, 1, 5 * HOUR)]), 2)
    assert _snap(view) == {1: (3, 2, HOUR)}
    # attribution fix moves the 10h event to user 2: BOTH users
    # re-sessionize in one merge
    view.merge(_chg(spark, [("u", 30, 3, 2, 10 * HOUR)]), 3)
    assert _snap(view) == {1: (2, 1, HOUR), 2: (1, 1, 0)}
    # duplicate re-delivery of an unchanged event is a net no-op
    view.merge(_chg(spark, [("u", 40, 1, 1, 0)]), 4)
    assert _snap(view) == {1: (2, 1, HOUR), 2: (1, 1, 0)}


def _py_sessionize(alive: dict[int, tuple[int, int]]):
    """Pure-Python referee: {eid: (uid, us)} -> {uid: (n, n_sessions, dur)}."""
    by_uid: dict[int, list[tuple[int, int]]] = {}
    for eid, (uid, us) in alive.items():
        by_uid.setdefault(uid, []).append((us, eid))
    out = {}
    for uid, evs in by_uid.items():
        evs.sort()
        sessions = [[evs[0]]]
        for prev, cur in zip(evs, evs[1:]):
            if cur[0] - prev[0] > _SESSION_GAP_US:
                sessions.append([cur])
            else:
                sessions[-1].append(cur)
        dur = sum(s[-1][0] - s[0][0] for s in sessions)
        out[uid] = (len(evs), len(sessions), dur)
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from("cud"),
            st.integers(min_value=1, max_value=8),    # eid
            st.integers(min_value=1, max_value=3),    # uid
            st.integers(min_value=0, max_value=30),   # hours
        ),
        min_size=1,
        max_size=16,
    )
)
def test_session_view_fuzz_matches_python_referee(spark, tmp_path_factory, ops):
    """Random create/update/delete scripts: the maintained view equals a
    pure-Python sessionizer over the net-alive events, whatever order
    merges/splits/moves arrive in."""
    base = tmp_path_factory.mktemp("sess_fuzz")
    view = CdcGroupedRecomputeView(
        spark, str(base), key="uid", pk="eid",
        recompute=session_recompute, n_buckets=4,
    )
    alive: dict[int, tuple[int, int]] = {}
    half = max(1, len(ops) // 2)
    for bid, chunk in enumerate((ops[:half], ops[half:])):
        if not chunk:
            continue
        rows, seen = [], set()
        for i, (op, eid, uid, hours) in enumerate(chunk):
            if eid in seen:  # one image per pk per batch (CDC upsert contract)
                continue
            seen.add(eid)
            if op == "d":
                if eid not in alive:
                    continue  # can't delete what never existed
                # a retraction carries the CURRENT image (Debezium 'before')
                d_uid, d_us = alive.pop(eid)
                rows.append(("d", bid * 100 + i, eid, d_uid, d_us))
                continue
            us = hours * HOUR
            rows.append((op, bid * 100 + i, eid, uid, us))
            alive[eid] = (uid, us)
        if rows:
            view.merge(_chg(spark, rows), bid)
    if view.n_partials() == 0:
        return
    assert _snap(view) == _py_sessionize(alive)


def test_kmv_sketch_union_is_mergeable(spark):
    """Bottom-K mergeability — the property that makes KMV a sketch:
    re-truncating the union of two sketches equals sketching the union
    of the raw sets (so pairwise estimates never touch base data)."""
    a = spark.range(0, 500).select(F.col("id").alias("c"))
    b = spark.range(300, 900).select(F.col("id").alias("c"))

    def sketch(df):
        h = df.select(_kmv_hash(F.col("c")).alias("h")).distinct()
        w = Window.orderBy("h")
        return (
            h.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _KMV_K)
            .select("h")
        )

    ska = {r["h"] for r in sketch(a).collect()}
    skb = {r["h"] for r in sketch(b).collect()}
    retrunc = sorted(ska | skb)[:_KMV_K]
    direct = sorted(
        r["h"] for r in sketch(a.union(b)).collect()
    )
    assert retrunc == direct


def test_session_view_streaming_restart_resume(spark, tmp_path):
    """RESTART ≠ REPLAY for the grouped-recompute family: drive the
    session view through a real checkpointed readStream → foreachBatch
    (availableNow, one epoch per file), crash the handler at epoch 1
    AFTER its merge landed (offsets never committed — the reference
    consume loop's at-least-once window, cmd/main.go:197-230), then
    resume on the SAME checkpoint: Structured Streaming re-delivers
    epoch 1, the re-merge overwrites its own partitions idempotently,
    and the snapshot equals the batch recompute."""
    import json as _json
    import os as _os
    import time as _time

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    src = tmp_path / "in"
    src.mkdir()
    b0 = [
        {"op": "c", "seq": 1, "eid": 1, "uid": 1, "us": 0},
        {"op": "c", "seq": 2, "eid": 2, "uid": 1, "us": HOUR},
        {"op": "c", "seq": 3, "eid": 3, "uid": 1, "us": 10 * HOUR},
    ]
    b1 = [
        {"op": "c", "seq": 10, "eid": 4, "uid": 1, "us": 5 * HOUR},  # bridge
        {"op": "u", "seq": 11, "eid": 3, "uid": 2, "us": 10 * HOUR},  # move
    ]
    (src / "b0.jsonl").write_text("\n".join(_json.dumps(r) for r in b0))
    (src / "b1.jsonl").write_text("\n".join(_json.dumps(r) for r in b1))
    now = _time.time()
    _os.utime(src / "b0.jsonl", (now - 100, now - 100))
    _os.utime(src / "b1.jsonl", (now, now))

    view = CdcGroupedRecomputeView(
        spark, str(tmp_path / "sess"), key="uid", pk="eid",
        recompute=session_recompute, n_buckets=4,
    )
    log: list[tuple[int, int]] = []
    crash_armed = [True]

    def handler(df, epoch_id):
        view.merge(df.select("op", "seq", "eid", "uid", "us"), int(epoch_id))
        if int(epoch_id) == 1 and crash_armed[0]:
            log.append((1, -1))
            raise RuntimeError("injected crash after epoch-1 merge")
        log.append((int(epoch_id), 1))

    def run():
        q = (
            spark.readStream.schema("op string, seq long, eid long, uid long, us long")
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
    assert log == [(0, 1), (1, -1)]  # epoch 0 committed, epoch 1 uncommitted
    crash_armed[0] = False
    run()  # same checkpoint: epoch 1 re-delivered, re-merged idempotently
    assert log == [(0, 1), (1, -1), (1, 1)]
    # final alive: eid1(u1,0h) eid2(u1,1h) eid4(u1,5h) eid3(u2,10h)
    # -> user 1: one merged session 0-5h; user 2: one singleton
    assert _snap(view) == {1: (3, 1, 5 * HOUR), 2: (1, 1, 0)}
