package graft

import org.apache.spark.sql.types._

import graft.analytics.Queries
import graft.llm.VectorOps

/** Golden schema + property contracts for the three rows-only queries
  * (q02b / q07b / a04b): they have no DuckDB oracle, so these tests pin
  * their output schemas (the driver's schema check can't cover them) and
  * the property tying each sketch tier to its exact twin. */
class GoldenApproxSpec extends SparkSpec {

  test("q02b schema pinned + HLL counts within 2% of exact q02") {
    val approx = Queries.q02bKpiApprox(spark, sfDir)
    assert(approx.schema ==
      StructType(Seq(
        StructField("total_revenue", DoubleType),
        StructField("approx_orders", LongType, nullable = false),
        StructField("approx_customers", LongType, nullable = false))),
      s"q02b schema drifted: ${approx.schema.treeString}")
    val a = approx.collect().head
    val e = Queries.q02KpiTotals(spark, sfDir).collect().head
    // identical exact-revenue expression → identical value
    assert(a.getDouble(0) == e.getDouble(0))
    def within2pct(approx: Long, exact: Long): Boolean =
      math.abs(approx - exact) <= math.max(1L, (0.02 * exact).toLong)
    assert(within2pct(a.getLong(1), e.getLong(1)),
      s"approx_orders ${a.getLong(1)} vs exact ${e.getLong(1)}")
    assert(within2pct(a.getLong(2), e.getLong(2)),
      s"approx_customers ${a.getLong(2)} vs exact ${e.getLong(2)}")
  }

  test("q07b schema pinned + scores differ from exact q07 only at quartile boundaries") {
    val approx = Queries.q07bRfmApprox(spark, sfDir)
    assert(approx.schema ==
      StructType(Seq(
        StructField("cust_id", LongType),
        StructField("recency", LongType),
        StructField("frequency", LongType, nullable = false),
        StructField("monetary", DoubleType),
        StructField("r_score", IntegerType, nullable = false),
        StructField("f_score", IntegerType, nullable = false),
        StructField("m_score", IntegerType, nullable = false))),
      s"q07b schema drifted: ${approx.schema.treeString}")
    val exact = Queries.q07Rfm(spark, sfDir)
      .select("cust_id", "r_score", "f_score", "m_score").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    val rows = approx.collect()
    assert(rows.length == exact.size)
    var diffs = 0
    rows.foreach { r =>
      val (er, ef, em) = exact(r.getLong(0))
      val ds = Seq(r.getInt(4) - er, r.getInt(5) - ef, r.getInt(6) - em)
      // a 1e-4-accuracy sketch can shift a cutpoint past at most the
      // adjacent quartile: any per-dimension drift beyond ±1 is a bug
      assert(ds.forall(d => math.abs(d) <= 1),
        s"cust ${r.getLong(0)}: approx scores drifted >1 quartile: $ds")
      diffs += ds.count(_ != 0)
    }
    // boundary ties are rare: the overwhelming majority must agree exactly
    assert(diffs.toDouble / (rows.length * 3) <= 0.1,
      s"$diffs of ${rows.length * 3} scores differ — more than boundary noise")
  }

  test("a04b schema pinned (recall contract lives in IvfSpec)") {
    val df = VectorOps.a04bAnnIvfKmeans(spark, sfDir)
    assert(df.schema ==
      StructType(Seq(
        StructField("query_id", LongType),
        StructField("neighbor_id", LongType),
        StructField("cos_sim", DoubleType),
        StructField("rank", IntegerType, nullable = false))),
      s"a04b schema drifted: ${df.schema.treeString}")
  }
}
