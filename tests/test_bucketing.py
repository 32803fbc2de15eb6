"""Bucketed co-located join: pre-bucketing both sides on the join key
removes the shuffle — the Exchange-free plan the 100 TB design relies on
for repeated large-table joins (SURVEY.md §4.2 / north_star)."""

import pytest


@pytest.fixture(scope="module")
def bucketed_spark(tmp_path_factory, spark):
    """The shared session, with the broadcast threshold disabled for the
    duration of this module (AQE broadcasting the small side would hide
    the Exchange this module asserts about).

    IMPORTANT: this fixture must NOT create-and-stop its own session —
    ``get_spark`` getOrCreates, so when another module already owns the
    session-scoped fixture a ``stop()`` here kills the session for every
    module that runs after (exactly what happened when a new
    alphabetically-earlier test module landed)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(bucketed_spark, tmp_path_factory):
    spark = bucketed_spark
    wh = tmp_path_factory.mktemp("bucketed_tables")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    # external tables at tmp paths: the shared session's default
    # warehouse must not collect residue inside the repo
    (
        orders.write.mode("overwrite")
        .option("path", str(wh / "orders_b"))
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .option("path", str(wh / "lineitem_b"))
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
