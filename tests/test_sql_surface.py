"""§3.2 read path: the spark.sql surface over registered fixture views."""

from pyspark.sql import functions as F

from aws_dms_cdc_data_pipeline_spark.session import load_table, register_tables


def test_sql_over_registered_views_matches_dataframe(spark, sf_dir):
    register_tables(spark, sf_dir)
    sql_result = spark.sql(
        """
        SELECT r_name, COUNT(*) AS n_nations
        FROM region JOIN nation ON r_regionkey = n_regionkey
        GROUP BY r_name ORDER BY r_name
        """
    ).collect()
    df_result = (
        load_table(spark, sf_dir, "region")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .groupBy("r_name")
        .agg(F.count("*").alias("n_nations"))
        .orderBy("r_name")
        .collect()
    )
    assert list(map(str, sql_result)) == list(map(str, df_result))
    assert len(sql_result) == 5


def test_sql_window_and_cte(spark, sf_dir):
    register_tables(spark, sf_dir)
    top = spark.sql(
        """
        WITH ranked AS (
            SELECT o_custkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC) AS rn
            FROM orders
        )
        SELECT COUNT(*) AS n FROM ranked WHERE rn = 1
        """
    ).collect()[0]["n"]
    assert top == load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()


def test_range_frame_window_includes_peers_and_bounds(spark):
    from pyspark.sql import Window, functions as F

    df = spark.createDataFrame(
        [  # (cust, day, cents): two orders same day -> peers aggregate
            (1, 100, 10), (1, 100, 20), (1, 106, 5), (1, 107, 7), (1, 200, 1),
        ],
        "cust long, day long, cents long",
    )
    w = Window.partitionBy("cust").orderBy("day").rangeBetween(-6, 0)
    got = {
        (r.day, r.cents): r.s
        for r in df.select("day", "cents", F.sum("cents").over(w).alias("s")).collect()
    }
    # same-day rows are peers: BOTH see the full day's total
    assert got[(100, 10)] == 30 and got[(100, 20)] == 30
    assert got[(106, 5)] == 35   # day 100 still inside [100, 106]
    assert got[(107, 7)] == 12   # day 100 fell out, 106+107 remain
    assert got[(200, 1)] == 1    # isolated


def test_except_all_keeps_multiplicity(spark):
    a = spark.createDataFrame([(1,), (1,), (1,), (2,)], "k long")
    b = spark.createDataFrame([(1,), (3,)], "k long")
    got = sorted(r.k for r in a.exceptAll(b).collect())
    assert got == [1, 1, 2]  # one occurrence of 1 cancelled, not all
