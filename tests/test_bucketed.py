"""Co-located bucketed joins: the repeated url_seen ⋈ frontier confirm join
must not shuffle when both sides share bucketing on url_hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from review_crawler_spark.sources.bucketed import (
    cobucketed_join,
    plan_has_no_exchange,
    write_bucketed,
)


def test_cobucketed_join_plans_no_exchange(spark):
    # warehouse.dir is a static config — use the session default (the shared
    # test session sets ./spark-warehouse under the pytest cwd); tables are
    # dropped in the finally block
    seen = spark.range(0, 20_000).select(
        F.xxhash64("id").alias("url_hash"),
        F.concat(F.lit("https://h/"), F.col("id")).alias("canonical_url"),
    )
    frontier = spark.range(10_000, 30_000).select(
        F.xxhash64("id").alias("url_hash"),
        (F.col("id") % 7).alias("priority"),
    )
    write_bucketed(seen, "t_seen", "url_hash", num_buckets=8, sorted_by="url_hash")
    write_bucketed(frontier, "t_frontier", "url_hash", num_buckets=8,
                   sorted_by="url_hash")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force the sort-merge path: at test size both joins would otherwise
    # broadcast, hiding the bucketing co-location this test demonstrates
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(spark, "t_frontier", "t_seen", "url_hash")
        # correctness: equal to the plain-dataframe join
        expect = frontier.join(seen, "url_hash").count()
        assert joined.count() == expect
        assert expect > 0
        # the point: no shuffle on either side
        assert plan_has_no_exchange(joined), "co-bucketed join must not shuffle"
        # control: the un-bucketed equivalent DOES shuffle
        assert not plan_has_no_exchange(frontier.join(seen, "url_hash"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS t_frontier")
        spark.sql("DROP TABLE IF EXISTS t_seen")


def test_append_before_read_in_fresh_catalog(spark, tmp_path):
    """Round-3 ADVICE (medium): after a catalog loss (fresh session), an
    APPEND issued before any read must re-register the table from the
    on-disk spec — with the old bare tableExists check, saveAsTable
    recreated the table knowing only the new wave's partition and every
    prior delta silently vanished from read_bucketed_deltas."""
    from review_crawler_spark.crawler.checkpoint import SnapshotStore

    store = SnapshotStore(tmp_path / "store")
    w0 = spark.createDataFrame(
        [(1, "https://a/1"), (2, "https://a/2")],
        "url_hash long, canonical_url string",
    )
    store.append_delta_bucketed("t", 0, w0, ("url_hash", "canonical_url"), 4)
    # simulate the fresh session: in-memory catalog loses the table
    spark.sql(f"DROP TABLE IF EXISTS {store.table_name('t')}")
    w1 = spark.createDataFrame(
        [(3, "https://a/3")], "url_hash long, canonical_url string"
    )
    store.append_delta_bucketed("t", 1, w1, ("url_hash", "canonical_url"), 4)
    got = {
        r["url_hash"]
        for r in store.read_bucketed_deltas(spark, "t", 1).collect()
    }
    assert got == {1, 2, 3}
    spark.sql(f"DROP TABLE IF EXISTS {store.table_name('t')}")
