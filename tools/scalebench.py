"""Scaling benchmark runner — ONE Spark run per process invocation.

(JVM state persists across SparkSession stop/create within a Python
process, so comparable runs must be separate processes.)

Usage:
  python tools/scalebench.py run <cpus> <rows> <file|gen> [path]
      → prints one JSON line {"cpus":..,"sec":..,"pages_per_sec":..}
  python tools/scalebench.py sweep <rows> [reps]
      → orchestrates subprocess runs at local[8]/local[32] × {file,gen},
        prints a summary JSON with medians and efficiencies.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def gc_opts(cpus: int) -> str:
    """ParallelGC (throughput collector) beats the G1 default on every
    interleaved A/B in this sandbox (+10% @4, +33% @16, +13..33% @32
    threads, 2026-08-16): the job is one allocation-heavy codegen stage
    with no latency requirement, exactly ParallelGC's case. GC worker
    count tracks the executor thread count (capped: the host degrades
    past ~16 runnable threads)."""
    return os.environ.get(
        "LFTS_GC_OPTS",
        f"-XX:+UseParallelGC -XX:ParallelGCThreads={min(16, max(4, cpus))}",
    )


def single_run(cpus: int, rows: int, mode: str, path: str | None) -> dict:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    from logstash_filter_translate_spark.plans import pipeline as P
    from logstash_filter_translate_spark.plans.pages import generate_pages
    from logstash_filter_translate_spark.session import build_session

    spark = build_session(
        app_name=f"scale-{mode}-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.driver.extraJavaOptions": gc_opts(cpus),
            # fine scan splits: the 12M-row corpus is ~470MB — 32MB splits
            # gave only ~16 read partitions = ONE wave at 16 threads (no
            # straggler balancing, the slowest task gates the stage); 8MB
            # → ~60 splits ≈ 4 waves. At real scale the corpus provides
            # thousands of splits and this ceases to matter.
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        },
    )
    if mode == "file":
        pages = spark.read.parquet(path)
    else:
        pages = generate_pages(spark, rows, 128)

    def job(df):
        parsed = P.parse_stage(df)
        enriched = P.enrich_stage(parsed, spark)
        enriched, obs = P.observed(enriched)
        enriched.write.format("noop").mode("overwrite").save()
        return obs.get

    # warmup: the FULL job once — the first large job in a JVM pays one-time
    # costs (heap growth via mmap, JIT/codegen compilation, Python worker
    # pool spin-up) that would otherwise be billed to the measurement
    job(pages)
    times = []
    metrics = None
    for _ in range(2):
        t0 = time.time()
        metrics = job(pages)
        times.append(time.time() - t0)
    elapsed = min(times)
    assert metrics["extract_mismatches"] == 0, metrics
    spark.stop()
    return {
        "cpus": cpus,
        "mode": mode,
        "rows": int(metrics["rows"]),
        "sec": round(elapsed, 2),
        "all_sec": [round(t, 2) for t in times],
        "pages_per_sec": round(metrics["rows"] / elapsed, 1),
    }


def sweep(rows: int, reps: int, path: str, n: int = 4, n4: int = 16) -> dict:
    """Interleaved N vs 4N comparison (default 4→16: the 32-thread config
    sits on this sandbox's syscall/futex cliff — see the memory notes — so
    the honest two-cluster-size evidence uses the pair where the host can
    actually schedule the threads; pass 8 32 to reproduce the cliff)."""
    results: dict = {}
    for rep in range(reps):
        for mode in ("file", "gen"):
            for cpus in (n, n4):
                cmd = [
                    sys.executable, os.path.abspath(__file__), "run",
                    str(cpus), str(rows), mode, path,
                ]
                out = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=900
                )
                line = out.stdout.strip().splitlines()[-1]
                r = json.loads(line)
                results.setdefault(f"{mode}{cpus}", []).append(r["pages_per_sec"])
                print(f"rep{rep} {mode} local[{cpus}]: {r['sec']}s "
                      f"{r['pages_per_sec']}/s", file=sys.stderr, flush=True)
    summary = {"rows": rows, "reps": reps, "n": n, "n4": n4,
               "throughput": results}
    for mode in ("file", "gen"):
        tn = statistics.median(results[f"{mode}{n}"])
        tn4 = statistics.median(results[f"{mode}{n4}"])
        summary[f"{mode}_median_{n}"] = tn
        summary[f"{mode}_median_{n4}"] = tn4
        summary[f"{mode}_efficiency"] = round(tn4 / tn / 4, 3)
        bn, bn4 = max(results[f"{mode}{n}"]), max(results[f"{mode}{n4}"])
        summary[f"{mode}_best_efficiency"] = round(bn4 / bn / 4, 3)
    return summary


def main():
    cmd = sys.argv[1]
    if cmd == "run":
        cpus, rows, mode = int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
        path = sys.argv[5] if len(sys.argv) > 5 else None
        print(json.dumps(single_run(cpus, rows, mode, path)))
    elif cmd == "sweep":
        rows = int(sys.argv[2]) if len(sys.argv) > 2 else 12_000_000
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        n = int(sys.argv[4]) if len(sys.argv) > 4 else 4
        n4 = int(sys.argv[5]) if len(sys.argv) > 5 else 4 * n
        path = os.environ.get(
            "SPARK_GRAFT_PAGES_CACHE", f"/tmp/lfts_pages_{rows}"
        )
        print(json.dumps(sweep(rows, reps, path, n, n4)))
    else:
        raise SystemExit(f"unknown command {cmd}")


if __name__ == "__main__":
    main()
