"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship parse→enrich→route→aggregate query at sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2 +
                training-data ops), each (spark, sf_dir) -> DataFrame.
                EXACTLY 50 entries: the driver's correctness artifact
                records the first 50 rows, so the contract is pinned at
                that size (tests/test_registry_contract.py); pure
                plane/parameter variants live in Q.EXTRA_QUERIES and are
                verified by tools/selfcheck.py + plan guards + digests.
oracle_sql()  — DuckDB-runnable ANSI SQL equivalents over the same parquet
                views; column names/aliases match the Spark outputs exactly.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from logstash_filter_translate_spark.plans import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: translate-enrich-route over events + per-route aggregates
    at sf0.001 (driver smoke-checks rows >= 0)."""
    return Q.q_route_histogram(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
