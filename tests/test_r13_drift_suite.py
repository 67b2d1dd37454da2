"""r13: the composed drift-monitoring suite (streaming/drift_suite.py) —
one landed events changelog shared by the bootstrap-arm, KS-arm-count and
PSI-arm-count views (q260's machinery). Pins:

1. every member's maintained state equals the from-scratch computation
   over the CDC-upserted final events (retraction, re-type, delete,
   duplicate re-delivery);
2. a torn SUBSET of the two-wave merge (some members' view partitions +
   the shared changelog partition lost, others landed) heals on replay —
   the crash state the shared landing makes possible;
3. suite compaction folds every member first, then the shared changelog,
   and preserves all snapshots.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from stream_cdc_gps_spark.streaming.drift_suite import CdcDriftSuite

# tiny thresholds: weight = #{t in THS : u >= t} with the view's CASE —
# any ascending uint32 cut points work for the replay-identity tests
THS = (1_000_000_000, 3_000_000_000, 4_000_000_000, 4_200_000_000)


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "op string, seq bigint, event_id bigint, user_id bigint, "
        "event_type string, value double",
    )


B0 = [
    ("c", 1, 1, 10, "purchase", 5.0),
    ("c", 2, 2, 11, "purchase", 7.0),
    ("c", 3, 3, 12, "click", 1.0),
    ("c", 4, 4, 13, "view", 9.0),
    ("c", 5, 5, 14, "purchase", 5.0),
]
B1 = [
    ("u", 10, 1, 10, "purchase", 6.0),   # value correction
    ("u", 11, 3, 12, "purchase", 1.0),   # re-type click -> purchase
    ("d", 12, 5, 14, "purchase", 5.0),   # delete
    ("u", 13, 2, 11, "purchase", 7.0),   # duplicate re-delivery (no-op image)
]
FINAL = [  # upserted final alive rows: (event_id, user_id, event_type, value)
    (1, 10, "purchase", 6.0),
    (2, 11, "purchase", 7.0),
    (3, 12, "purchase", 1.0),
    (4, 13, "view", 9.0),
]


def _merge_all(spark, base, batches):
    suite = CdcDriftSuite(spark, base, thresholds=THS, b=8)
    for i, rows in enumerate(batches):
        suite.merge(CdcDriftSuite.prepare(_events(spark, rows)), i)
    return suite


def _state(suite):
    arms = sorted(map(tuple, suite.boot.arms().collect()))
    ks = sorted(
        map(tuple, suite.ks.snapshot().filter(F.col("pval").isNotNull()).collect())
    )
    psi = sorted(
        map(
            tuple,
            suite.psi.snapshot()
            .filter(F.col("k").isNotNull())
            .select("k.et", "k.value", "n", "total")
            .collect(),
        )
    )
    return arms, ks, psi


def _batch_reference(spark, base_ref):
    """From-scratch member states over the upserted FINAL rows, computed
    by a fresh suite fed the final rows as one create-only batch."""
    rows = [("c", i + 1, e, u, t, v) for i, (e, u, t, v) in enumerate(FINAL)]
    return _state(_merge_all(spark, base_ref, [rows]))


def test_suite_members_equal_batch_over_upserted_final(spark, tmp_path):
    suite = _merge_all(spark, str(tmp_path / "s"), [B0, B1])
    ref = _batch_reference(spark, str(tmp_path / "ref"))
    assert _state(suite) == ref
    # semantic spot checks: the point arm (r = -1) sees exactly the alive
    # rows; KS tracks only purchase rows of the final corpus
    pt = suite.boot.arms().filter(F.col("r") == -1).collect()[0]
    assert pt["n"] == len(FINAL)
    assert float(pt["swv"]) == sum(v for _, _, t, v in FINAL)
    ks_total = (
        suite.ks.snapshot()
        .filter(F.col("pval").isNotNull())
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert ks_total == sum(1 for _, _, t, _ in FINAL if t == "purchase")


def test_torn_multi_landing_heals_on_replay(spark, tmp_path):
    """Crash after a torn SUBSET of the merge waves: the bootstrap and
    PSI members' batch-1 view partitions land but the KS member's and
    the SHARED changelog's batch-1 partitions are lost. Replaying the
    batch (Structured Streaming's re-delivery) must restore exactly the
    clean-run state — rows_before(t) never reads the torn partition, so
    the re-derived delta and every member landing are identical."""
    base = str(tmp_path / "s")
    want = _state(_merge_all(spark, base, [B0, B1]))
    shutil.rmtree(f"{base}/ks/v/partials/batch_id=1")
    shutil.rmtree(f"{base}/a/partials/batch_id=1")
    replay = CdcDriftSuite(spark, base, thresholds=THS, b=8)
    replay.merge(CdcDriftSuite.prepare(_events(spark, B1)), 1)
    assert _state(replay) == want

    # the OPPOSITE torn subset: changelog landed, every member's view
    # partition lost
    base2 = str(tmp_path / "s2")
    want2 = _state(_merge_all(spark, base2, [B0, B1]))
    for member in ("boot", "ks", "psi"):
        shutil.rmtree(f"{base2}/{member}/v/partials/batch_id=1")
    replay2 = CdcDriftSuite(spark, base2, thresholds=THS, b=8)
    replay2.merge(CdcDriftSuite.prepare(_events(spark, B1)), 1)
    assert _state(replay2) == want2


def test_suite_compaction_preserves_all_members(spark, tmp_path):
    suite = _merge_all(spark, str(tmp_path / "s"), [B0, B1])
    want = _state(suite)
    suite.compact()
    assert _state(suite) == want
    # and the compacted state still merges correctly
    suite.merge(
        CdcDriftSuite.prepare(
            _events(spark, [("u", 20, 4, 13, "purchase", 2.0)])
        ),
        2,
    )
    pt = suite.boot.arms().filter(F.col("r") == -1).collect()[0]
    assert pt["n"] == len(FINAL)
    assert float(pt["swv"]) == 6.0 + 7.0 + 1.0 + 2.0
