"""Bucketed-output sink: same-bucketed tables must join with NO shuffle
(the co-located-join contract that replaces the reference's target-side
region pre-split at scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tidb_lightning_spark.sinks.files_sink import FilesSink

from .conftest import SF_SMOKE


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    sink = FilesSink(str(tmp_path / "wh"))
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    sink.write_bucketed_table(
        orders, "bkt", "orders", ["o_orderkey"], 4, ["o_orderkey"]
    )
    sink.write_bucketed_table(
        lineitem, "bkt", "lineitem", ["l_orderkey"], 4, ["l_orderkey"]
    )
    try:
        o = spark.table("bkt.orders")
        l = spark.table("bkt.lineitem")
        # force a sort-merge join so the bucketing (not a broadcast) is
        # what eliminates the exchanges
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = o.join(l, o.o_orderkey == l.l_orderkey).groupBy(
                "o_orderstatus"
            ).agg(F.count(F.lit(1)).alias("n"))
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # the join inputs must read pre-bucketed data: no shuffle
            # before the SortMergeJoin (the aggregate after it may shuffle)
            join_part = plan.split("SortMergeJoin")[-1]
            assert "Exchange hashpartitioning" not in join_part, join_part[:2000]
            n = joined.agg(F.sum("n")).collect()[0][0]
            assert n == lineitem.count()
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt.lineitem")
        spark.sql("DROP TABLE IF EXISTS bkt.orders")
        spark.sql("DROP DATABASE IF EXISTS bkt")


def test_bucketed_table_has_catalog_stats(spark, tmp_path):
    """L3 full: the bucketed sink runs ANALYZE TABLE ... FOR ALL COLUMNS,
    so DESCRIBE EXTENDED exposes row-count/size statistics to the CBO."""
    from tidb_lightning_spark.sinks.files_sink import FilesSink

    sink = FilesSink(str(tmp_path / "wh"))
    df = spark.range(1000).selectExpr("id AS k", "id % 7 AS grp")
    try:
        name = sink.write_bucketed_table(df, "statdb", "t", ["k"], 4)
        ext = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
        stats = {r["col_name"]: r["data_type"] for r in ext}
        assert "Statistics" in stats and "1000 rows" in stats["Statistics"]
        colstats = spark.sql(f"DESCRIBE EXTENDED {name} k").collect()
        kv = {r["info_name"]: r["info_value"] for r in colstats}
        assert kv.get("distinct_count") not in (None, "NULL")
    finally:
        spark.sql("DROP TABLE IF EXISTS statdb.t")
        spark.sql("DROP DATABASE IF EXISTS statdb")
