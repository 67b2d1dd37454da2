"""Operator implementations, one module per family (SURVEY.md §2B).

Each public query is registered in ``stream_cdc_gps_spark.registry`` with a
DuckDB oracle; importing the modules populates the registry.
"""
