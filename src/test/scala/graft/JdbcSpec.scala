package graft

import java.util.Properties

import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** S7/S8 — JDBC sink + source round-trip against embedded Derby (the
  * in-process JDBC database Spark already ships for its Hive metastore).
  * The reference's Postgres egress (`spark_transform.py:331-389`) differs
  * only in the URL/driver; the Spark write/read path exercised here is
  * identical. */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  test("JDBC round-trip: Sinks.jdbc append → spark.read.jdbc returns the rows") {
    val df = Seq((1L, "alpha", 10.5), (2L, "beta", 20.0), (3L, "gamma", 0.25))
      .toDF("id", "name", "score")
    Sinks.jdbc(df, url, "roundtrip", props)
    val back = spark.read.jdbc(url, "roundtrip", props)
    assert(back.count() == 3)
    assert(back.orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "alpha", 10.5), (2L, "beta", 20.0), (3L, "gamma", 0.25)))

    // append semantics (S11 contrast: JDBC egress appends, lake overwrites)
    Sinks.jdbc(df.filter(col("id") === 1), url, "roundtrip", props)
    assert(spark.read.jdbc(url, "roundtrip", props).count() == 4)
  }

  test("JDBC source supports predicate pushdown into the database") {
    val df = (1 to 100).map(i => (i.toLong, s"row$i")).toDF("id", "name")
    Sinks.jdbc(df, url, "pushdown", props)
    val filtered = spark.read.jdbc(url, "pushdown", props)
      .filter(col("id") <= 10)
    assert(filtered.count() == 10)
    // the JDBC relation advertises the pushed filter in its plan
    val plan = filtered.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") && plan.contains("LessThanOrEqual"),
      s"filter not pushed to JDBC source:\n$plan")
  }
}
