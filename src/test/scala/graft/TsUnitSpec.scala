package graft

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}

/** Regression guard for the round-9 incident: the driver regenerated
  * `events.parquet` with `ts` as TIMESTAMP(MICROS) where the previous
  * fixture was TIMESTAMP(NANOS), and the loader's hard-coded nanos
  * assumption divided by 1000 twice — every event landed on 1970-01-20 and
  * 8 oracle queries went red. [[Tables.events]] now derives the unit from
  * the parquet footer; this spec pins that contract by writing the SAME
  * logical rows in every physical encoding the fixture has ever used
  * (annotated micros, annotated nanos, legacy INT96) and asserting
  * identical reads — plus the footer-stats sanity bound that makes any
  * FUTURE drift fail loudly instead of producing epoch-1970 garbage. */
class TsUnitSpec extends SparkSpec {

  // one row per distinct minute, values chosen so a wrong unit conversion
  // (÷1000 or ×1000 off) moves every ts out of the asserted set
  private val rows = Seq(
    (1L, "2024-03-01 10:15:00", 7L, "view", 1.5),
    (2L, "2024-03-01 10:16:30", 7L, "click", 2.5),
    (3L, "2024-03-02 23:59:59", 9L, "purchase", 99.0))

  private def readBack(dir: String): Seq[(Long, Timestamp, Long, String)] =
    Tables.events(spark, dir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .toSeq.sortBy(_._1)

  private val expected = rows.map { case (id, ts, u, t, _) =>
    (id, Timestamp.valueOf(ts), u, t)
  }

  /** Write the fixture rows as a raw-long `ts` column annotated with the
    * given parquet TIMESTAMP unit — the writer path Spark itself cannot
    * produce (Spark never writes NANOS), exercised via parquet-hadoop's
    * example API exactly like an external generator would. */
  private def writeAnnotated(dir: String, unit: TimeUnit, perSecond: Long): Unit = {
    val schema = Types.buildMessage()
      .addField(Types.required(INT64).named("event_id"))
      .addField(Types.required(INT64)
        .as(LogicalTypeAnnotation.timestampType(true, unit)).named("ts"))
      .addField(Types.required(INT64).named("user_id"))
      .addField(Types.required(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type"))
      .addField(Types.required(DOUBLE).named("value"))
      .addField(Types.optional(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("props"))
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet")).withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, ts, user, typ, v) =>
      val g = gf.newGroup()
      g.add("event_id", id)
      g.add("ts", Timestamp.valueOf(ts).getTime / 1000L * perSecond)
      g.add("user_id", user)
      g.add("event_type", typ)
      g.add("value", v)
      writer.write(g)
    } finally writer.close()
  }

  test("micros, nanos and INT96 events files read identically") {
    val base = java.nio.file.Files.createTempDirectory("graft_tsunit").toString

    val microsDir = s"$base/micros"
    writeAnnotated(microsDir, TimeUnit.MICROS, 1000000L)
    val nanosDir = s"$base/nanos"
    writeAnnotated(nanosDir, TimeUnit.NANOS, 1000000000L)

    // legacy INT96: what Spark writes with the default outputTimestampType
    val int96Dir = s"$base/int96"
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try {
      import spark.implicits._
      rows.map { case (id, ts, u, t, v) =>
        (id, Timestamp.valueOf(ts), u, t, v, null.asInstanceOf[String])
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$int96Dir/events.parquet")
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)

    assert(Tables.tsUnit(spark, s"$microsDir/events.parquet") == "MICROS")
    assert(Tables.tsUnit(spark, s"$nanosDir/events.parquet") == "NANOS")
    assert(readBack(microsDir) == expected)
    assert(readBack(nanosDir) == expected)
    assert(readBack(int96Dir) == expected)
  }

  test("sanity bound: a drifted unit fails loudly, not as 1970 garbage") {
    // claim MICROS but store seconds-scale values — the exact shape of the
    // r9 incident (values 1e6× too small for the declared unit)
    val dir = java.nio.file.Files.createTempDirectory("graft_tsdrift").toString
    writeAnnotated(dir, TimeUnit.MICROS, 1L)
    val e = intercept[IllegalArgumentException] {
      Tables.events(spark, dir)
    }
    assert(e.getMessage.contains("sanity bound"))
  }
}
