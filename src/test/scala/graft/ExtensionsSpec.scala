package graft

import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot is callable from SQL (extensions / install)") {
    // Engine.configure (used by the shared fixture) installs the function
    // registry entries even on sessions built elsewhere
    val d = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val viaColumn = d.select(
      org.apache.spark.sql.graft.VectorExpressions.dotProduct(col("a"), col("b")))
      .collect()(0).getDouble(0)
    assert(viaColumn == 11.0)
    val viaSql = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect()(0).getDouble(0)
    assert(viaSql == 11.0)
  }

  test("graft_ascii_fold: codegen expression == former UDF semantics") {
    val d = Seq("  Crème BRÛLÉE  ", "ÅngstrÖm", "plain", null)
      .toDF("s")
    val got = d.select(graft.functions.Scalars.asciiFold(col("s")))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("creme brulee"), Some("angstrom"),
      Some("plain"), None))
    val viaSql = spark.sql("SELECT graft_ascii_fold('  ÉCLAIR  ') AS f")
      .collect()(0).getString(0)
    assert(viaSql == "eclair")
  }

  test("q07b approx scores agree with exact ntile away from boundaries") {
    val exact = graft.analytics.Queries.q07Rfm(spark, sfDir)
      .select("cust_id", "r_score", "f_score", "m_score").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    val approx = graft.analytics.Queries.q07bRfmApprox(spark, sfDir)
      .select("cust_id", "r_score", "f_score", "m_score").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(exact.keySet == approx.keySet)
    // boundary ties may differ by one bucket; the vast majority must agree
    val agree = exact.count { case (k, v) => approx(k) == v }
    assert(agree >= (exact.size * 0.8).toInt,
      s"only $agree/${exact.size} customers agree")
  }
}
