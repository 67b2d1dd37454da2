"""Targeted driver-style check: python scripts/check_queries.py q161 q162 ...

Same canonicalizer as driver_sim (imports it), but runs only the named
queries (prefix match) — the cheap per-query loop used while building,
before the full-sim certificate run."""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import duckdb
from driver_sim import _canon


def main() -> None:
    names = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as E
    from stream_cdc_gps_spark.tables import TABLE_NAMES, table_path

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_dir, name)}')"
        )
    qs, osql = E.queries(), E.oracle_sql()
    n_fail = 0
    for pref in names:
        matches = [n for n in qs if n.startswith(pref)]
        if not matches:
            print(f"{pref}: NO MATCH")
            n_fail += 1
            continue
        for name in matches:
            sdf = qs[name](spark, sf_dir).toPandas()
            ddf = con.execute(osql[name]).df()
            sdf.columns = [c.lower() for c in sdf.columns]
            ddf.columns = [c.lower() for c in ddf.columns]
            ok = (
                len(sdf) == len(ddf)
                and sorted(sdf.columns) == sorted(ddf.columns)
                and _canon(sdf) == _canon(ddf)
            )
            print(f"{name}: {'OK' if ok else 'FAIL'} ({len(sdf)} vs {len(ddf)} rows)")
            if not ok:
                n_fail += 1
                if sorted(sdf.columns) != sorted(ddf.columns):
                    print("  cols:", sorted(sdf.columns), "vs", sorted(ddf.columns))
                else:
                    a, b = _canon(sdf), _canon(ddf)
                    diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
                    for i in diff:
                        print("  spark:", a[i], "\n  oracle:", b[i])
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
