"""S7 JDBC source against an embedded Derby database (the jar ships inside
pyspark's own jars dir) — upgrades SURVEY §2.1 S7 from 'supported, not used
in tests' to exercised: plain read, partitioned fan-out, predicate push.

Derby embedded runs inside the same JVM, which is exactly the local-mode
topology; on a cluster the same options fan the read out per executor.
"""

from __future__ import annotations

import pytest

from minerva_etl_46_spark.sources.jdbc import read_jdbc_table

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    jvm = spark.sparkContext._jvm
    try:
        jvm.java.lang.Class.forName(DRIVER)
    except Exception:
        pytest.skip("Derby driver not on the JVM classpath")
    db = tmp_path_factory.mktemp("derby") / "testdb"
    url = f"jdbc:derby:{db};create=true"
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "create table events (event_id bigint primary key, "
        "user_id bigint, value double)"
    )
    ps = conn.prepareStatement("insert into events values (?, ?, ?)")
    for i in range(200):
        ps.setLong(1, i)
        ps.setLong(2, i % 7)
        ps.setDouble(3, i / 3.0)
        ps.addBatch()
    ps.executeBatch()
    st.close()
    conn.close()
    return f"jdbc:derby:{db}"


def test_jdbc_read_roundtrip(spark, derby_url):
    df = read_jdbc_table(spark, derby_url, "events", driver=DRIVER)
    assert df.count() == 200
    assert {f.name.lower() for f in df.schema.fields} == {
        "event_id", "user_id", "value"}


def test_jdbc_partitioned_read_fans_out(spark, derby_url):
    df = read_jdbc_table(
        spark, derby_url, "events",
        partition_column="event_id", lower_bound=0, upper_bound=200,
        num_partitions=4, driver=DRIVER,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 200


def test_jdbc_predicate_pushdown(spark, derby_url):
    from pyspark.sql import functions as F

    df = read_jdbc_table(spark, derby_url, "events", driver=DRIVER) \
        .filter(F.col("user_id") == 3)
    # the filter must reach the JDBC scan (PushedFilters), not Spark-side
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "user_id" in plan.lower()
    assert df.count() == 200 // 7 + (1 if 3 < 200 % 7 else 0)


def test_jdbc_write_roundtrip(spark, derby_url):
    """S7 write-back: a notifications-shaped frame lands via the JDBC
    sink (bounded connection fan-in) and reads back identically — the
    reference's results-to-PostgreSQL path, bidirectional."""
    from pyspark.sql import functions as F

    from minerva_etl_46_spark.sources.jdbc import write_jdbc_table

    notif = spark.range(50).select(
        F.col("id").alias("notif_id"),
        (F.col("id") % 5).alias("rule_id"),
        (F.col("id") * 2.5).alias("weight"),
    )
    write_jdbc_table(notif, derby_url, "notifications",
                     mode="overwrite", num_partitions=2)
    back = read_jdbc_table(spark, derby_url, "notifications")
    got = back.orderBy("notif_id").toPandas()
    want = notif.orderBy("notif_id").toPandas()
    assert got.equals(want[got.columns.tolist()])
