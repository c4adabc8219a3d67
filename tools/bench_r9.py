"""Round-9 optimization measurement harness (bench.py stays FROZEN).

Replicates bench.py's headline protocol for an arbitrary subset of
queries — steady-state session on local[$SPARK_GRAFT_CPUS], one untimed
warm run, then N timed reps per query (noop sink), median reported —
so per-change A/B numbers are comparable to the driver's
BENCH/HEADLINE_* artifacts. Also dumps `.explain("formatted")` per query
(plans/r09/<query>_<label>.txt) when --explain is given.

Usage:
  python tools/bench_r9.py [--reps N] [--label tag] [--explain] \
      [--sf DIR] query [query ...]
  python tools/bench_r9.py --label base heavy   # preset: the expensive set

Output: one JSON line to stdout + /tmp/r9_bench_<label>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEAVY = [
    "dedup_components", "incremental_keep", "simhash_pairs",
    "canonical_docs", "dedup_components_shuffle", "jaccard_adjacent",
    "near_dup_keep", "fuzzy_contamination", "similarity_lsh_multiband",
    "similarity_ivf", "corpus_filter", "table_dict_shuffle_enrich",
    "lsh_pairs_capped", "span_dedup", "lsh_pairs", "minhash_signatures",
    "lineitem_brand_enrich", "contamination_check", "segment_dedup",
    "langid",
]


def _steal():
    try:
        with open("/proc/stat") as fh:
            f = [int(x) for x in fh.readline().split()[1:9]]
        return f[7], sum(f)
    except Exception:
        return 0, 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--label", default="dev")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    names = []
    for q in args.queries:
        names.extend(HEAVY if q == "heavy" else [q])

    from logstash_filter_translate_spark.plans import queries as Q
    from logstash_filter_translate_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name=f"lfts-r9-{args.label}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    spark.range(2_000_000).selectExpr("sum(id)").collect()
    _warm = pandas_udf(lambda s: s, "long", PandasUDFType.SCALAR)
    spark.range(1000).select(_warm("id")).write.format("noop").mode(
        "overwrite").save()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out = {"label": args.label, "reps": {}, "medians": {}}
    for name in names:
        fn = Q.ALL_QUERIES[name]
        if args.explain:
            import contextlib
            import io

            os.makedirs(os.path.join(REPO, "plans", "r09"), exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
            with open(os.path.join(
                    REPO, "plans", "r09",
                    f"{name}_{args.label}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        spark.sparkContext.setJobDescription(f"{name} warm")
        t0 = time.time()
        force(fn(spark, args.sf))
        warm = time.time() - t0
        reps = []
        st0, tot0 = _steal()
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            force(fn(spark, args.sf))
            reps.append(round(time.time() - t0, 3))
        st1, tot1 = _steal()
        out["reps"][name] = {
            "warm": round(warm, 3), "timed": reps,
            "steal_pct": round(100 * (st1 - st0) / max(tot1 - tot0, 1), 2),
        }
        out["medians"][name] = round(statistics.median(reps), 3)
        print(f"  {name}: {out['medians'][name]}s "
              f"(warm {round(warm, 3)}s, reps {reps})", file=sys.stderr,
              flush=True)
        with open(f"/tmp/r9_bench_{args.label}.json", "w") as fh:
            json.dump(out, fh)
    out["total"] = round(sum(out["medians"].values()), 3)
    with open(f"/tmp/r9_bench_{args.label}.json", "w") as fh:
        json.dump(out, fh)
    print(json.dumps({"label": args.label, "total": out["total"],
                      "medians": out["medians"]}))
    spark.stop()


if __name__ == "__main__":
    main()
