#!/usr/bin/env python
"""Adversarial-diameter stress for connected_components (r7 judge item
#5): a 200-node CHAIN (diameter 199 — the worst case for min-label
propagation, which moves the min one hop per round) timed on the plain
plane vs the pointer_jump plane (L(v) <- L(L(v)) shortcutting,
O(log diameter) rounds).

Protocol: one subprocess per measurement (CLAUDE.md invariant — the JVM
persists across in-process SparkSession cycles). Writes
BENCH/STRESS_CC_<tag>.json. Near-dup graphs are shallow (3-5 rounds);
this measures where the plain loop becomes the bottleneck and evidences
the remedy the flag ships.

Usage:
    python tools/stress_components.py            # both planes, 200-chain
    python tools/stress_components.py 500        # longer chain
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

CHAIN_N = 200
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))


def _child(plane: str, chain_n: int, cpus: int) -> None:
    from logstash_filter_translate_spark.operators import dedup
    from logstash_filter_translate_spark.operators.dedup import (
        connected_components,
    )
    from logstash_filter_translate_spark.session import build_session

    spark = build_session(
        app_name=f"stress-cc-{plane}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    nodes = spark.range(chain_n).withColumnRenamed("id", "doc_id")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(chain_n - 1)], "id_a long, id_b long"
    )
    t0 = time.monotonic()
    out = connected_components(
        nodes,
        edges,
        id_col="doc_id",
        pointer_jump=(plane == "jump"),
        # plain needs diameter rounds; jump needs ~log2(diameter)+slack
        max_iterations=chain_n + 50 if plane == "plain" else 32,
    )
    n_zero = out.filter("component = 0").count()
    secs = round(time.monotonic() - t0, 3)
    assert n_zero == chain_n, f"wrong components: {n_zero} != {chain_n}"
    spark.stop()
    print(
        "CHILD_RESULT "
        + json.dumps(
            {"sec": secs, "iterations": dedup.LAST_CC_ITERATIONS}
        ),
        flush=True,
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        _child(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return
    chain_n = int(sys.argv[1]) if len(sys.argv) > 1 else CHAIN_N
    results = {}
    for plane in ("plain", "jump"):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "child", plane,
             str(chain_n), str(CPUS)],
            capture_output=True, text=True,
        )
        res = None
        for line in proc.stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                res = json.loads(line.split(" ", 1)[1])
        assert res, f"{plane} child failed: {proc.stderr[-2000:]}"
        results[plane] = res
        print(f"{plane}: {res['sec']}s in {res['iterations']} iterations",
              file=sys.stderr, flush=True)
    payload = {
        "metric": "connected_components_chain_stress",
        "chain_nodes": chain_n,
        "diameter": chain_n - 1,
        "cpus": CPUS,
        "planes": results,
        "jump_speedup": round(
            results["plain"]["sec"] / results["jump"]["sec"], 3
        ),
        "protocol": "one subprocess per plane; wall-clock covers the "
                    "full fixpoint loop incl. per-iteration "
                    "localCheckpoint + convergence count",
    }
    tag = os.environ.get("SPARK_GRAFT_ROUND_TAG", "r8")
    bench_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
    )
    os.makedirs(bench_dir, exist_ok=True)
    out_path = os.path.join(bench_dir, f"STRESS_CC_{tag}.json")
    i = 0
    while os.path.exists(out_path):
        i += 1
        out_path = os.path.join(
            bench_dir, f"STRESS_CC_{tag}{chr(ord('a') + i)}.json"
        )
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
