"""Bucketed co-located join: pre-bucketing both sides on the join key
removes the shuffle — the Exchange-free plan the 100 TB design relies on
for repeated large-table joins (SURVEY.md §4.2 / north_star)."""

import pytest


@pytest.fixture(scope="module")
def bucketed_spark(tmp_path_factory):
    from pdf_extraction_spark.session import get_spark

    wh = str(tmp_path_factory.mktemp("warehouse"))
    s = get_spark(
        app_name="bucketing",
        master="local[4]",
        extra_conf={
            "spark.sql.warehouse.dir": wh,
            "spark.ui.showConsoleProgress": "false",
            # AQE can re-add exchanges around cached plans; keep the demo
            # plan deterministic
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    yield s
    s.stop()


def test_bucketed_join_has_no_exchange(bucketed_spark):
    spark = bucketed_spark
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )

    ob = spark.table("orders_b")
    lb = spark.table("lineitem_b")
    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]

    # and the join is correct
    expect = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).count()
    assert joined.count() == expect
