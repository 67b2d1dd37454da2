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


# --- un-partitioned window detection (r11, r10 verdict task #2) ----------
#
# `Window.orderBy(...)` with no partitionBy executes on a SINGLE task
# ("No Partition Defined for Window operation! Moving all data to a single
# partition") — fine over a frame already compressed to a bounded/keyed
# cardinality (the q178 distinct-value move), a scale-killer over row-level
# input. The parser classifies every global window by walking its single-
# child chain in the simple-mode plan text.

# Pass-through nodes: exactly one child, cardinality-preserving (or only
# reducing) — keep walking. A nested Window/WindowGroupLimit never GROWS
# its input, so the classification defers to the node below it.
_WALK_THROUGH = {
    "Sort",
    "Project",
    "Filter",
    "Exchange",
    "Coalesce",
    "AQEShuffleRead",
    "ShuffleQueryStage",
    "InputAdapter",
    "WholeStageCodegen",
    "ColumnarToRow",
    "Window",
    "WindowGroupLimit",
    "RunningWindowFunction",
}

# Nodes that PROVE the frame is compressed below row-level cardinality:
# a (keyed or global) aggregate bounds the frame by its distinct keys,
# a global limit bounds it absolutely, a local relation is literal data.
_BOUNDED_BELOW = {
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "GlobalLimit",
    "TakeOrderedAndProject",
    "LocalTableScan",
}

_NODE_NAME = re.compile(r"^(?:\*\(\d+\)\s*)?([A-Za-z]+)")


def _tree_lines(plan: str) -> list[tuple[int, str]]:
    """(depth, node_text) per plan line; depth from the tree-art prefix."""
    out = []
    for raw in plan.splitlines():
        m = re.match(r"^([:+\-|\s]*)(\S.*)$", raw)
        if not m:
            continue
        prefix, body = m.groups()
        if body.startswith("==") or not _NODE_NAME.match(body):
            continue
        out.append((len(prefix) // 3, body))
    return out


def _window_is_partitioned(body: str) -> bool:
    """Spark prints `Window [exprs], [partition spec], [order spec]`,
    omitting empty specs: 3 top-level groups = partitioned+ordered,
    1 group = pure over() (global). With 2 groups the second is EITHER
    a partition spec (partitionBy without orderBy — e.g. a per-group
    count) or an order spec (global ordered window): an order spec
    always carries sort-direction markers, a partition spec never
    does."""
    depth = 0
    groups: list[str] = []
    buf: list[str] = []
    for ch in body:
        if ch == "[":
            if depth == 0:
                buf = []
            depth += 1
            if depth == 1:
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(buf))
                continue
        if depth >= 1:
            buf.append(ch)
    if len(groups) >= 3:
        return True
    if len(groups) == 2:
        return " ASC" not in groups[1] and " DESC" not in groups[1]
    return False


def unpartitioned_windows(df: DataFrame) -> list[dict]:
    """Every un-partitioned Window node in the plan, classified.

    Returns dicts with ``bounded`` True when the window's child chain
    reaches an aggregate/limit/literal before any other real node (the
    frame is provably compressed — the q178 distinct-value shape), False
    when it reaches a join, generate, scan, or anything that can carry
    row-level cardinality (single-partition scale hazard; must be an
    explicit, justified exception). A keyed aggregate below only proves
    "bounded by distinct keys" — a reviewer still owns the key-cardinality
    argument, which is why the lint keeps a pinned allowlist rather than
    auto-passing silently."""
    return unpartitioned_windows_from_text(plan_string(df, "simple"))


def unpartitioned_windows_from_text(plan: str) -> list[dict]:
    """`unpartitioned_windows` over an already-rendered simple-mode plan
    string (the lint sweep renders each query's plan once and feeds every
    rule from the same text)."""
    lines = _tree_lines(plan)
    found: list[dict] = []
    for i, (depth, body) in enumerate(lines):
        name = _NODE_NAME.match(body).group(1)
        if name != "Window" or _window_is_partitioned(body):
            continue
        bounded = False
        reason = "end-of-plan"
        want = depth + 1
        for d, child in lines[i + 1 :]:
            if d != want:
                reason = "branching/unknown shape"
                break
            cname = _NODE_NAME.match(child).group(1)
            if cname in _WALK_THROUGH:
                want += 1
                continue
            bounded = cname in _BOUNDED_BELOW
            reason = cname
            break
        found.append({"node": body[:120], "bounded": bounded, "below": reason})
    return found
