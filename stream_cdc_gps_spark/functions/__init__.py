"""Column-expression function library (pure built-ins, JVM-side).

Engine policy (SURVEY.md §2C): everything here is composed from
``pyspark.sql.functions`` so it stays inside whole-stage codegen — no
row-at-a-time Python in the hot path.
"""
