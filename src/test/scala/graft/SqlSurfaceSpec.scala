package graft

import org.apache.spark.sql.functions._

/** `spark.sql` as a query surface: Tables.registerViews makes every pinned
  * table addressable from SQL text, and SQL plans get the same Catalyst
  * treatment as the DataFrame programs (same results, broadcast join,
  * pushed filters). */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = sfDir

  test("SQL text over views == DataFrame program (daily sales shape)") {
    Tables.registerViews(spark, dir)
    val viaSql = spark.sql(
      """SELECT to_date(o_orderdate) AS sale_date,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
        |       COUNT(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY sale_date""".stripMargin)
    val viaDf = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("sale_date"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_sales"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("sale_date"))
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
  }

  test("SQL over views keeps pushdown + broadcast (same physical treatment)") {
    Tables.registerViews(spark, dir)
    val plan = spark.sql(
      """SELECT n.n_name, COUNT(*) AS n
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_acctbal > 0 GROUP BY n.n_name""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(plan.contains("PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal,0.0)"))
  }

  test("registered SQL functions from GraftExtensions work in SQL text") {
    Tables.registerViews(spark, dir)
    val r = spark.sql("SELECT graft_ascii_fold('Héllo  Wörld ') AS f")
      .collect()(0).getString(0)
    assert(r == "hello  world")
  }

  test("custom aggregates are SQL-callable (graft_heavy_hitters, graft_bottom_k)") {
    import spark.implicits._
    Seq("a", "a", "b", "a", "c", "b").toDF("tok").createOrReplaceTempView("hh_in")
    val hh = spark.sql(
      """SELECT e.token, e.cnt
        |FROM (SELECT explode(graft_heavy_hitters(tok, 8)) AS e FROM hh_in)""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    Seq(5L, 1L, 9L, 3L).toDF("h").createOrReplaceTempView("bk_in")
    val bk = spark.sql("SELECT graft_bottom_k(h, 2) AS ks FROM bk_in")
      .collect()(0).getSeq[Long](0)
    assert(bk == Seq(1L, 3L))
  }

  test("corpus ops are SQL-expressible over the documents view (d01 shape)") {
    Tables.registerViews(spark, dir)
    val viaSql = spark.sql(
      """SELECT md5(text) AS text_fp, MIN(doc_id) AS rep_doc_id,
        |       COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY text_fp""".stripMargin)
    val viaDf = graft.llm.TextOps.d01DedupExact(spark, dir)
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
    // and the scan under the SQL text is column-pruned to what it needs
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }
}
