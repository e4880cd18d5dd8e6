package graft

import java.nio.file.Files

import graft.pipeline.Runner
import graft.sources.{Sinks, Sources}

/** End-to-end layered pipeline + source/sink roundtrips (SURVEY.md §3.1
  * lifecycle and §2.1 scans/sinks). */
class PipelineSpec extends SparkSpec {

  test("bronze → silver → gold runner produces the full lake") {
    val out = Files.createTempDirectory("graft_lake").toString
    Runner.runBronze(spark, sfDir, out)
    Runner.runSilver(spark, sfDir, out)
    Runner.runGold(spark, sfDir, out)
    val events = spark.read.parquet(s"$out/bronze/events")
    assert(events.count() > 0)
    assert(!events.columns.contains("error"))
    val report = spark.read.json(s"$out/bronze/events_bad/report")
    val r = report.collect()(0)
    assert(r.getAs[Long]("total") ==
      Tables.events(spark, sfDir).count())
    assert(spark.read.parquet(s"$out/silver/line_dedup_map").count() > 0)
    assert(spark.read.parquet(s"$out/silver/customer_enriched").count() == 150)
    val kpi = spark.read.parquet(s"$out/gold/kpi_totals")
    assert(kpi.count() == 1 && kpi.columns.contains("_inserted_at"))
    assert(spark.read.parquet(s"$out/gold/rfm").count() == 150)
  }

  test("corpus layer: prepared split, stats, chunks of survivors only") {
    val out = Files.createTempDirectory("graft_corpus").toString
    Runner.runCorpus(spark, sfDir, out)
    val prepared = spark.read.parquet(s"$out/corpus/prepared")
    assert(prepared.count() > 0)
    assert(prepared.columns.toSet ==
      Set("doc_id", "source", "n_tokens", "bucket", "split"))
    val stats = spark.read.parquet(s"$out/corpus/stats")
    assert(stats.filter(org.apache.spark.sql.functions.col("lvl") === 3)
      .count() == 1) // grand-total row present
    // chunks cover exactly the prepared doc ids
    val chunkDocs = spark.read.parquet(s"$out/corpus/chunks")
      .select("doc_id").distinct()
    val prepDocs = prepared.select("doc_id")
    assert(chunkDocs.except(prepDocs).isEmpty)
    assert(prepDocs.except(chunkDocs).isEmpty)
    // packed sequences: one row per prepared doc, offsets within budget
    val packed = spark.read.parquet(s"$out/corpus/packed")
    assert(packed.count() == prepared.count())
    assert(packed.filter(
      org.apache.spark.sql.functions.col("offset_in_pack") >= 512L
        || org.apache.spark.sql.functions.col("offset_in_pack") < 0L)
      .count() == 0)
  }

  test("CSV source roundtrip with pinned schema (S1/S4)") {
    val out = Files.createTempDirectory("graft_csv").toString
    val orders = Tables.orders(spark, sfDir)
    orders.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$out/orders_csv")
    val back = Sources.csv(spark, s"$out/orders_csv", Tables.ordersSchema)
    assert(back.count() == orders.count())
    assert(back.schema == Tables.ordersSchema)
    // values survive the roundtrip
    val a = orders.orderBy("o_orderkey").collect().map(_.toSeq)
    val b = back.orderBy("o_orderkey").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("bronze CSV read is all-strings with empty-as-null (S3)") {
    val out = Files.createTempDirectory("graft_csv3").toString
    import spark.implicits._
    Seq(("1", "x"), ("2", "")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").option("header", "true")
      .csv(s"$out/t")
    val back = Sources.csvBronze(spark, s"$out/t", Seq("id", "v"))
      .orderBy("id").collect()
    assert(back(0).getString(1) == "x")
    assert(back(1).isNullAt(1))
  }
}
