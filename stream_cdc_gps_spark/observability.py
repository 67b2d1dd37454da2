"""Inline pipeline metrics via Spark's Observation API.

A training-data pipeline wants row counts, null rates, and domain guards for
every stage it materializes — but a separate `.count()`/`.agg()` pass
re-executes the stage. `df.observe` piggybacks aggregate metrics onto the
action that already runs (the write), so quality telemetry is free.

Usage:
    df, obs = observed(df, "landing", n_rows=F.count(F.lit(1)),
                       null_ids=F.count_if(F.col("id").isNull()))
    df.write.parquet(...)        # one job: write + metrics
    obs.get["null_ids"]          # available after the action
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(df: DataFrame, name: str, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to df's next action.

    Returns the instrumented frame and the Observation handle; metric
    values become available (``obs.get``) once ONE action has run the
    frame. Metrics are computed executor-side during that action — no
    second scan, no extra shuffle (observe is a map-side accumulator
    pattern)."""
    if not metrics:
        raise ValueError("observed() needs at least one metric column")
    obs = Observation(name)
    aliased = [col.alias(alias) for alias, col in metrics.items()]
    return df.observe(obs, *aliased), obs
