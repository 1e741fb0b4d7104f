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
