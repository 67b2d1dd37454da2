"""Registry hygiene: the driver iterates names in priority order and the
bench suite indexes by name — a typo in either list silently drops coverage,
so pin the invariants."""

from __future__ import annotations

from stream_cdc_gps_spark import registry


def test_priority_names_all_registered():
    qs = registry.all_queries()
    missing = [n for n in registry._PRIORITY if n not in qs]
    assert not missing, f"_PRIORITY names not in registry: {missing}"


def test_priority_has_no_duplicates():
    assert len(registry._PRIORITY) == len(set(registry._PRIORITY))


def test_every_query_has_an_oracle():
    """Every registered query carries full DuckDB oracle SQL — rows-only
    checks are the documented exception and there are currently none."""
    qs = registry.all_queries()
    no_oracle = [n for n, spec in qs.items() if spec.oracle is None]
    assert not no_oracle, f"queries without oracle SQL: {no_oracle}"


def test_bench_headline_names_registered():
    import bench

    qs = registry.all_queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"bench HEADLINE names not in registry: {missing}"


def test_priority_prefix_covers_changed_queries():
    """The driver checks ~50 queries per round; everything the registry
    front-loads as changed/new (the part before the r1-rotation block)
    must fit well inside that window."""
    front = registry._PRIORITY[: registry._PRIORITY.index("q52_minhash_signatures")]
    assert len(front) <= 50
