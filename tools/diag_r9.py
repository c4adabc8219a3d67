"""Round-9 diagnostic: split each query's cost into BUILD (Python plan
construction incl. any eager jobs like localCheckpoints / CC iterations)
vs EXECUTE (the noop write of the returned frame). Sums to the headline
protocol's timed rep. Also counts Spark jobs per phase via the status
tracker. One steady-state session, warm + N reps like bench.py.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    names = sys.argv[1:] or ["dedup_components", "simhash_pairs"]
    reps = int(os.environ.get("R9_REPS", "3"))
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from logstash_filter_translate_spark.plans import queries as Q
    from logstash_filter_translate_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="lfts-r9-diag", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    spark.range(2_000_000).selectExpr("sum(id)").collect()
    _warm = pandas_udf(lambda s: s, "long", PandasUDFType.SCALAR)
    spark.range(1000).select(_warm("id")).write.format("noop").mode(
        "overwrite").save()
    tracker = spark.sparkContext.statusTracker()

    out = {}
    for name in names:
        fn = Q.ALL_QUERIES[name]
        # warm
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        builds, execs, jobs_b, jobs_e = [], [], [], []
        for _ in range(reps):
            j0 = len(tracker.getJobIdsForGroup(None))
            t0 = time.time()
            df = fn(spark, sf)
            t1 = time.time()
            j1 = len(tracker.getJobIdsForGroup(None))
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            j2 = len(tracker.getJobIdsForGroup(None))
            builds.append(round(t1 - t0, 3))
            execs.append(round(t2 - t1, 3))
            jobs_b.append(j1 - j0)
            jobs_e.append(j2 - j1)
        out[name] = {
            "build_median": round(statistics.median(builds), 3),
            "exec_median": round(statistics.median(execs), 3),
            "builds": builds, "execs": execs,
            "jobs_build": jobs_b, "jobs_exec": jobs_e,
        }
        print(f"{name}: build {out[name]['build_median']}s "
              f"(jobs {jobs_b}), exec {out[name]['exec_median']}s "
              f"(jobs {jobs_e})", file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
