"""The similarity scale path: corpus written PARTITIONED BY its LSH bucket
(the layout a 100 TB index would use), queries touching only their bucket's
partition — results identical to computing buckets inline."""

import os

from pyspark.sql import functions as F

from logstash_filter_translate_spark.operators.similarity import (
    hyperplane_bucket,
    lsh_topk,
)

PLANES = [[(((i * 37 + p * 17) % 13) - 6) / 6.0 for i in range(16)] for p in range(2)]


def test_bucket_partitioned_corpus_serves_lsh_queries(spark, tmp_path):
    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # index pass: write partitioned by bucket (Iceberg identity partition)
    out = str(tmp_path / "index")
    emb.withColumn("bucket", hyperplane_bucket(F.col("embedding"), PLANES)) \
        .write.partitionBy("bucket").parquet(out)

    indexed = spark.read.parquet(out)
    # partition pruning: a single-bucket read touches one subtree
    buckets = {p for p in os.listdir(out) if p.startswith("bucket=")}
    assert len(buckets) > 1

    queries = emb.filter("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    # query served from the indexed layout (bucket column already present)
    qb = queries.withColumn("bucket", hyperplane_bucket(F.col("embedding"), PLANES))
    served = (
        indexed.join(F.broadcast(qb.select("query_id",
                                           F.col("embedding").alias("__qvec"),
                                           "bucket")), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    from logstash_filter_translate_spark.operators.similarity import cosine
    from pyspark.sql import Window

    scored = served.select(
        "query_id", "vec_id",
        cosine(F.col("embedding"), F.col("__qvec")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    from_index = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter("rank <= 3").select("query_id", "rank", "vec_id")
    )

    inline = lsh_topk(emb, queries, PLANES, k=3)
    assert sorted(map(tuple, from_index.collect())) == sorted(
        map(tuple, inline.collect())
    )
