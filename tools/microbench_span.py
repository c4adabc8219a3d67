"""span_dedup flagged-fraction microbenchmark (round 8).

`remove_duplicate_spans` (operators/dedup.py) claims its per-word
coverage REBUILD — the one interpreted-HOF expression in the operator —
runs only for the flagged MINORITY: clean documents take the
isnull(__flags) branch (one codegen concat_ws), so the operator's cost
should grow only mildly with the duplicated-doc fraction, and a fully
clean corpus should pay nothing for the rebuild machinery at all. This
tool measures that: the SAME synthetic corpus shape at duplicated-doc
fractions 0 / 10% / 33%, one subprocess per measurement (CLAUDE.md
invariant — the JVM persists across in-process SparkSession restarts,
so in-JVM ordering poisons plane comparisons).

Corpus: N docs x 40 unique md5-derived words; a flagged doc carries an
8-word shared passage at a per-doc varying offset (1..20) — the
any-offset regime the operator exists for. The corpus is
localCheckpoint'ed so timed reps measure the operator, not the
synthesis. Flagged docs produce flags rows through the inventory →
semi-join → per-doc aggregate path AND take the rebuild branch.

Usage: python tools/microbench_span.py [docs] [cpus]
Prints one JSON line; results recorded in BENCH/MICRO_SPAN_<tag>.json
and docs/ROUND8.md (bench.py does not ingest this artifact).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = 40
PASSAGE = 8
SPAN_K = 5
REPS = 3

#: duplicated-doc fractions measured: clean corpus, 1-in-10, 1-in-3
FRACTIONS = {"f0": 0, "f10": 10, "f33": 3}


def _corpus(spark, docs: int, dup_every: int):
    """Deterministic corpus: doc i, word j = md5(i_j)[:6] (unique), and
    when ``dup_every`` > 0 every ``dup_every``-th doc carries the fixed
    8-word passage at offset 1 + (i mod 20). Pure codegen, no RNG."""
    from pyspark.sql import functions as F

    df = spark.range(docs).select(F.col("id").alias("doc_id"))
    off = F.pmod(F.col("doc_id"), F.lit(20)) + F.lit(1)
    passage = F.array(*[F.lit(f"shared{p}") for p in range(PASSAGE)])
    flagged = (
        F.pmod(F.col("doc_id"), F.lit(dup_every)) == 0
        if dup_every
        else F.lit(False)
    )
    word = lambda j: F.substring(  # noqa: E731
        F.md5(F.concat_ws("_", F.col("doc_id"), j)), 1, 6
    )
    toks = F.transform(
        F.sequence(F.lit(1), F.lit(WORDS)),
        lambda j: F.when(
            flagged & (j >= off) & (j < off + F.lit(PASSAGE)),
            F.element_at(passage, (j - off + F.lit(1)).cast("int")),
        ).otherwise(word(j)),
    )
    return df.select("doc_id", F.concat_ws(" ", toks).alias("text"))


def _child(frac_name: str, docs: int, cpus: int) -> None:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")

    from pyspark.sql import functions as F

    from logstash_filter_translate_spark.operators.dedup import (
        remove_duplicate_spans,
    )
    from logstash_filter_translate_spark.session import build_session

    spark = build_session(
        app_name=f"micro-span-{frac_name}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    corpus = _corpus(spark, docs, FRACTIONS[frac_name]).localCheckpoint()
    out = remove_duplicate_spans(
        corpus, "text", "doc_id", span_words=SPAN_K, min_docs=2
    )
    out.write.format("noop").mode("overwrite").save()  # warm + compile
    times = []
    for _ in range(REPS):
        t0 = time.monotonic()
        out.write.format("noop").mode("overwrite").save()
        times.append(round(time.monotonic() - t0, 3))
    # sanity: flagged docs actually got trimmed (the passage is removed)
    trimmed = out.filter(
        F.size(F.split("clean_text", " ")) < WORDS
    ).count()
    spark.stop()
    print(
        "CHILD_RESULT "
        + json.dumps({"times": times, "trimmed_docs": trimmed}),
        flush=True,
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        _child(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import subprocess

    results = {}
    for name in FRACTIONS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "child", name,
             str(docs), str(cpus)],
            capture_output=True, text=True,
        )
        payload = None
        for line in proc.stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                payload = json.loads(line.split(" ", 1)[1])
        assert payload, proc.stderr[-2000:]
        times = payload["times"]
        results[name] = {
            "dup_every": FRACTIONS[name],
            "sec_median": sorted(times)[len(times) // 2],
            "sec_reps": times,
            "trimmed_docs": payload["trimmed_docs"],
        }
    out = {
        "metric": "span_dedup_fraction_microbench",
        "docs": docs,
        "words_per_doc": WORDS,
        "span_words": SPAN_K,
        "cpus": cpus,
        "fractions": results,
        "f33_over_f0_cost_ratio": round(
            results["f33"]["sec_median"] / results["f0"]["sec_median"], 3
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
