"""Isolated per-query probe: warm session, N reps to a noop sink, optional
plan dump.

    python scripts/probe.py q254_cdc_bootstrap_ci q253_poisson_bootstrap \
        [--reps 3] [--sf /root/testdata/sf0.1] [--explain plans/r14 --tag before]

Prints one line per query: min / median / all samples. With --explain DIR,
writes DIR/<qname>_<tag>.txt with the formatted physical plan (the
.explain("formatted") artifact the optimization rounds commit). The warmup
query (q01) runs untimed first, exactly like bench.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stream_cdc_gps_spark.registry import queries  # noqa: E402
from stream_cdc_gps_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", default=None, help="directory for plan dumps")
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    spark = get_spark(app_name="probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    def run(name: str) -> None:
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()

    spark.sparkContext.setJobDescription("probe warmup")
    run("q01_pricing_summary")

    for name in args.names:
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        samples = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            run(name)
            samples.append(time.perf_counter() - t0)
        samples_r = [round(s, 3) for s in samples]
        print(
            f"{name}: min={min(samples_r)} "
            f"median={sorted(samples_r)[len(samples_r) // 2]} all={samples_r}",
            flush=True,
        )


if __name__ == "__main__":
    main()
