"""Single-operator microbenchmark mirroring the reference's
benchmark_rspec.rb (100,000-entry CSV dict, exact match, override=true,
/root/reference/spec/filters/benchmark_rspec.rb:26,44-54) — the
"matches-or-beats single-node throughput" evidence.

The reference harness runs one JRuby thread calling filter(event) per
event. The comparable configuration here is local[1] (one core, one
row-at-a-time... except Spark amortizes via codegen batches). We report
local[1] and local[32].

Usage: python tools/microbench_exact.py [rows] [cpus ...]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GC_OPTS = "-XX:ParallelGCThreads=8 -XX:ConcGCThreads=2"


def run(cpus: int, rows: int) -> dict:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    from pyspark.sql import functions as F

    from logstash_filter_translate_spark.config import TranslateConfig
    from logstash_filter_translate_spark.operators.translate import Translate
    from logstash_filter_translate_spark.session import build_session

    spark = build_session(
        app_name=f"micro-exact-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.driver.extraJavaOptions": GC_OPTS},
    )
    dictionary = [(f"key-{i}", f"value-{i}") for i in range(100_000)]
    op = Translate(
        TranslateConfig(
            source="status", target="translation",
            dictionary=dictionary, override=True,
        ),
        spark=spark,
    )
    events = spark.range(0, rows, 1, max(cpus * 4, 16)).select(
        F.concat(F.lit("key-"), (F.col("id") % 120_000).cast("string")).alias(
            "status"
        )
    )
    out = op.apply(events)

    def job():
        out.write.format("noop").mode("overwrite").save()

    job()  # steady state
    times = []
    for _ in range(2):
        t0 = time.time()
        job()
        times.append(time.time() - t0)
    spark.stop()
    best = min(times)
    return {
        "cpus": cpus,
        "rows": rows,
        "sec": round(best, 2),
        "rows_per_sec": round(rows / best, 1),
    }


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000_000
    cpus_list = [int(c) for c in sys.argv[2:]] or [1, 32]
    results = {}
    for cpus in cpus_list:
        r = run(cpus, rows)
        results[f"local{cpus}"] = r
        print(f"local[{cpus}]: {r['rows_per_sec']} rows/s", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
