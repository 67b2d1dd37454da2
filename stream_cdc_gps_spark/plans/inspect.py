"""Inspect physical plans: the assertions behind the engine's scale claims.

Wraps ``EXPLAIN FORMATTED`` output (the same text ``df.explain("formatted")``
prints) with parsers for the properties that matter at 100 TB:

- ``pushed_filters``     — predicates that reached the parquet reader
                           (row-group / page skipping);
- ``read_schema_columns``— columns actually scanned (pruning; a scan reading
                           all columns for a 2-column projection is a bug);
- ``broadcast_join_count`` / ``exchange_count`` — join strategy and shuffle
                           count (every Exchange is a full network pass of
                           its input at scale);
- plan text access for anything bespoke.

Note on AQE: with adaptive execution the formatted string shows the INITIAL
plan; AQE can only COALESCE or locally improve it at runtime (e.g. demote a
shuffle join to broadcast), so asserting "<= N exchanges, >= M broadcasts" on
the initial plan is a safe lower bound on runtime quality.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The text ``df.explain(mode)`` would print, as a string."""
    qe = df._jdf.queryExecution()  # noqa: SLF001 — no public accessor exists
    jvm = df.sparkSession._jvm  # noqa: SLF001
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans (flattened)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        inner = m.group(1).strip()
        if inner:
            # split on top-level commas (filter exprs don't nest brackets here)
            out.extend(p.strip() for p in inner.split(",") if p.strip())
    return out


def read_schema_columns(df: DataFrame, table_hint: str | None = None) -> list[list[str]]:
    """Column lists actually read by each parquet scan (ReadSchema).

    ``table_hint`` filters to scans whose Location mentions the substring
    (e.g. "lineitem")."""
    plan = plan_string(df)
    scans = []
    # each scan block: "Location: ... <path>" then "ReadSchema: struct<...>"
    blocks = re.split(r"\(\d+\) Scan parquet", plan)[1:]
    for b in blocks:
        loc = re.search(r"Location:.*?\[(.*?)\]", b)
        rs = re.search(r"ReadSchema: struct<([^>]*)>", b)
        if rs is None:
            continue
        if table_hint and (loc is None or table_hint not in loc.group(1)):
            continue
        cols = [c.split(":")[0].strip() for c in rs.group(1).split(",") if c.strip()]
        scans.append(cols)
    return scans


def broadcast_join_count(df: DataFrame) -> int:
    plan = plan_string(df)
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges in the initial plan (excludes broadcast exchanges —
    those move only the small side)."""
    plan = plan_string(df)
    return len(re.findall(r"\(\d+\) Exchange", plan))
