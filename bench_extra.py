"""Optimization-round measurement harness (guide §1: measure first).

NOT the driver contract — bench.py stays frozen.  This file isolates
individual queries with the noop sink (every column of every row is
computed and discarded — no count() column pruning, no sink cost),
labels jobs for the UI, and dumps .explain("formatted") plans to
plans/r07/.

Usage:
    python bench_extra.py q1 q2 ...          # time named queries, min-of-N
    python bench_extra.py --plans q1 q2 ...  # also write plans/r07/<q>_<tag>.txt
    SPARK_GRAFT_BENCH_RUNS=3                 # runs per query (default 2)
    SPARK_GRAFT_PLAN_TAG=before              # plan file suffix (default 'cur')
"""

from __future__ import annotations

import json
import os
import sys
import time

from bench import make_spark


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "cur")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    want_plans = "--plans" in sys.argv

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: python workers + scan paths once at the smallest SF
    qmap["kg_triples"](spark, "/root/testdata/sf0.001").count()

    out: dict[str, dict] = {}
    plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")
    os.makedirs(plan_dir, exist_ok=True)
    for name in args:
        fn = qmap[name]
        if want_plans:
            df = fn(spark, sf_dir)
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        times = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name} [noop run {i}]")
            t0 = time.perf_counter()
            noop(fn(spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(times), "all": times}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
