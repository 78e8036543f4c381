"""Catalyst-native co-located joins: Spark bucketBy tables joined on the
bucket key need NO Exchange — the physical layout IS the shuffle,
amortized across every future join (SURVEY §4: 'bucketing for co-located
joins')."""

import uuid

from pyspark.sql import functions as F


def test_bucketby_join_eliminates_exchange(spark):
    a_name = f"bk_docs_{uuid.uuid4().hex[:8]}"
    b_name = f"bk_meta_{uuid.uuid4().hex[:8]}"
    docs = spark.range(0, 2000).select(
        F.concat(F.lit("u://"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 7).alias("grp"),
    )
    meta = spark.range(0, 2000).select(
        F.concat(F.lit("u://"), F.col("id").cast("string")).alias("url"),
        (F.col("id") * 3).alias("score"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        (docs.write.bucketBy(8, "url").sortBy("url").saveAsTable(a_name))
        (meta.write.bucketBy(8, "url").sortBy("url").saveAsTable(b_name))
        # force the sort-merge path: broadcasting would sidestep bucketing
        # (at 100 TB neither side of a doc⋈doc join is broadcastable)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        joined = spark.table(a_name).join(spark.table(b_name), "url")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides pre-bucketed on the join key: no shuffle anywhere
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 2000

        # contrast: the same join on UNBUCKETED data shuffles both sides
        plain = docs.join(meta, "url")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {a_name}")
        spark.sql(f"DROP TABLE IF EXISTS {b_name}")
