"""Per-key profiling for the optimization rounds (guide §1).

For each named key: run min-of-N with the noop sink on an otherwise idle
session (same methodology as bench.py), and dump `.explain("formatted")`
to plans/<tag>/<key>_<suffix>.txt so plan-shape claims are checkable
without running Spark.

Usage:
  python scripts/profile_keys.py --queries a,b,c --suffix before [--runs 3]
  python scripts/profile_keys.py --top 25 --suffix before   # top-N from bench_summary.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--tag", default="r15")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bristle_spark.registry import all_specs
    from bristle_spark.session import get_spark

    specs = all_specs()
    if args.queries:
        names = [q.strip() for q in args.queries.split(",") if q.strip()]
    else:
        rec = json.load(open(os.path.join(ROOT, "bench_summary.json")))
        names = [
            k
            for k, _ in sorted(rec["queries"].items(), key=lambda kv: -kv[1])[
                : args.top
            ]
        ]

    plans_dir = os.path.join(ROOT, "plans", args.tag)
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name="bristle-profile")
    spark.range(1000).selectExpr("sum(id)").collect()
    specs["r_hash_agg"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, float] = {}
    for name in names:
        spec = specs[name]
        spark.sparkContext.setJobDescription(name)
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()  # r16: between-RUN isolation, like bench.py
        out[name] = round(best, 3)
        if not args.no_plans:
            df = spec.fn(spark, sf_dir)
            with open(
                os.path.join(plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()  # same per-key isolation as bench.py
        print(f"{out[name]:7.3f}  {name}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
