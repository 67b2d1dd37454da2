"""Observation-API metrics: computed during the action, matching a separate
aggregation pass, at zero extra jobs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_cdc_gps_spark.observability import observed
from stream_cdc_gps_spark.operators.common import t
from tests.conftest import SF_SMOKE


def test_observed_metrics_match_separate_pass(spark, tmp_path):
    d = t(spark, SF_SMOKE, "documents")
    inst, obs = observed(
        d,
        "landing",
        n_rows=F.count(F.lit(1)),
        n_empty=F.count_if(F.length("text") == 0),
        total_chars=F.sum("n_chars"),
    )
    inst.write.format("noop").mode("overwrite").save()
    got = obs.get
    exp = d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.length("text") == 0).alias("n_empty"),
        F.sum("n_chars").alias("total_chars"),
    ).collect()[0]
    assert got["n_rows"] == exp.n_rows
    assert got["n_empty"] == exp.n_empty
    assert got["total_chars"] == exp.total_chars


def test_observed_requires_metrics(spark):
    d = t(spark, SF_SMOKE, "documents")
    with pytest.raises(ValueError):
        observed(d, "nothing")
