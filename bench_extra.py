"""Isolation bench (guide §1.4): time ONE declared query (or DAG stage
family) with the noop sink, capture .explain("formatted"), and print
per-trial walls.  Separate from the frozen bench.py by design.

Usage:
  python bench_extra.py q36_minhash_dedup [q104_langid_ngram ...]
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py q57_pagerank

Env:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf1.0)
  SPARK_GRAFT_CPUS    local[N] (default 32)
  BENCH_TRIALS        trials per query (default 3; first is cold)
  EXPLAIN_DIR         where to write <query>_<tag>.txt plans
                      (default plans/r06; empty string disables)
  EXPLAIN_TAG         suffix for the plan file (default "before")
"""

from __future__ import annotations

import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = int(os.environ.get("BENCH_TRIALS", "3"))
EXPLAIN_DIR = os.environ.get("EXPLAIN_DIR", "plans/r06")
EXPLAIN_TAG = os.environ.get("EXPLAIN_TAG", "before")


def _drop_cached_state(spark) -> None:
    try:
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
    except Exception:
        pass


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        print("usage: bench_extra.py <query> [<query> ...]")
        sys.exit(2)

    import __spark_entry__ as E
    from redactify_spark.plans.session import build_session

    spark = build_session("bench-extra", master=f"local[{CPUS}]",
                          shuffle_partitions=CPUS)
    qs = E.queries()
    results = {}
    try:
        for name in names:
            fn = qs[name]
            if EXPLAIN_DIR:
                os.makedirs(EXPLAIN_DIR, exist_ok=True)
                df = fn(spark, SF_DIR)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
                with open(os.path.join(
                        EXPLAIN_DIR, f"{name}_{EXPLAIN_TAG}.txt"),
                        "w") as f:
                    f.write(plan)
            walls = []
            for i in range(TRIALS):
                spark.sparkContext.setJobDescription(f"{name} trial {i}")
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop") \
                    .mode("overwrite").save()
                walls.append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)
                _drop_cached_state(spark)
            results[name] = walls
            print(f"{name}: cold={walls[0]} warm={walls[1:]} "
                  f"best={min(walls[1:]) if len(walls) > 1 else walls[0]}",
                  flush=True)
    finally:
        spark.stop()
    print({"sf": SF_DIR, "cpus": CPUS, "walls": results})


if __name__ == "__main__":
    main()
