"""r11: the CDC-maintained sweep line (CdcSweepLineView — interval
cardinality under churn, the 'explode is linear' instance). Pins:

1. boundary-move transitions land the maintained curve on the batch
   recompute: an end-date slip retracts the old boundary and asserts
   the new one, a start-date correction moves the start, a delete
   retracts both boundaries, and a DEGENERATE interval (e ≤ s) whose
   correction makes it valid enters the sweep only then;
2. replay of a batch is a no-op and a torn view-store write heals on
   re-merge (the family contract);
3. compaction preserves the snapshot and refuses replays.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

from stream_cdc_gps_spark.streaming.join_view import CdcSweepLineView

SCHEMA = "op string, seq long, pk long, s date, e date"


def _d(day: int) -> dt.date:
    return dt.date(2024, 1, day)


def _snap(view):
    return sorted(
        (str(r.day), r.n_started, r.n_shipped, r.in_fulfillment)
        for r in view.snapshot().collect()
    )


def _batch_sweep(intervals):
    """Python golden: q229's containment count over boundary days."""
    iv = [(s, e) for s, e in intervals if e > s]
    days = sorted({d for s, e in iv for d in (s, e)})
    return sorted(
        (
            str(d),
            sum(1 for s, _ in iv if s == d),
            sum(1 for _, e in iv if e == d),
            sum(1 for s, e in iv if s <= d < e),
        )
        for d in days
    )


def test_sweepline_mutations_and_replay(spark, tmp_path):
    base = str(tmp_path / "sw")
    view = CdcSweepLineView(spark, base, pk="pk", n_buckets=4)
    # pk 4 is DEGENERATE at create (e == s): contributes nothing yet
    a0 = spark.createDataFrame(
        [
            ("c", 1, 1, _d(1), _d(5)),
            ("c", 2, 2, _d(2), _d(4)),
            ("c", 3, 3, _d(3), _d(6)),
            ("c", 4, 4, _d(2), _d(2)),
        ],
        SCHEMA,
    )
    view.merge(a0, 0)
    assert _snap(view) == _batch_sweep([(_d(1), _d(5)), (_d(2), _d(4)), (_d(3), _d(6))])

    # batch 1: end slip (pk 1: e 5→8), start correction (pk 2: s 2→1),
    # delete pk 3, and pk 4's correction VALIDATES it (e 2→7)
    a1 = spark.createDataFrame(
        [
            ("u", 10, 1, _d(1), _d(8)),
            ("u", 11, 2, _d(1), _d(4)),
            ("d", 12, 3, _d(3), _d(6)),
            ("u", 13, 4, _d(2), _d(7)),
        ],
        SCHEMA,
    )
    view.merge(a1, 1)
    golden = _batch_sweep([(_d(1), _d(8)), (_d(1), _d(4)), (_d(2), _d(7))])
    assert _snap(view) == golden
    # replay is a no-op
    view.merge(a1, 1)
    assert _snap(view) == golden

    # torn write: the batch-1 view partition vanishes, changelog landed
    shutil.rmtree(os.path.join(base, "v", "partials", "batch_id=1"))
    assert _snap(view) != golden
    replay = CdcSweepLineView(spark, base, pk="pk", n_buckets=4)
    replay.merge(a1, 1)
    assert _snap(replay) == golden

    # compaction preserves the snapshot; replay refused afterward
    replay.compact()
    assert replay.n_partials() == 1
    assert _snap(replay) == golden
    replay.merge(a1, 1)
    assert _snap(replay) == golden


def test_sweepline_matches_python_replay_on_generated(spark):
    """Hypothesis fuzz: any generated two-batch c/u/d script over a
    small interval pool (including degenerate e ≤ s images) must land
    exactly the Python last-writer-wins replay's batch sweep golden,
    and a replayed batch must be a no-op."""
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    opname = {0: "c", 1: "u", 2: "d"}

    ops_st = st.lists(
        st.tuples(
            st.integers(0, 2),   # op
            st.integers(0, 4),   # pk
            st.integers(1, 6),   # start day
            st.integers(1, 9),   # end day (may be <= start: degenerate)
        ),
        max_size=8,
    )

    @given(ops=ops_st, split_raw=st.integers(0, 9))
    @settings(max_examples=5, deadline=None)
    def run(ops, split_raw):
        rows = [
            (opname[t_], i, pk, _d(s), _d(e)) for i, (t_, pk, s, e) in enumerate(ops)
        ]
        split = split_raw % (len(rows) + 1)

        final: dict[int, tuple] = {}
        for t_, pk, s, e in ops:
            if t_ == 2:
                final.pop(pk, None)
            else:
                final[pk] = (_d(s), _d(e))
        golden = _batch_sweep(final.values())

        base = tempfile.mkdtemp(prefix="sweep_prop_")
        try:
            view = CdcSweepLineView(spark, base, pk="pk", n_buckets=4)
            view.merge(spark.createDataFrame(rows[:split], SCHEMA), 0)
            b1 = spark.createDataFrame(rows[split:], SCHEMA)
            view.merge(b1, 1)
            view.merge(b1, 1)  # replay must be a no-op
            try:
                got = _snap(view)
            except ValueError:
                got = []
            assert got == golden
        finally:
            shutil.rmtree(base, ignore_errors=True)

    run()
