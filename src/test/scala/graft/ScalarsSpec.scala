package graft

import org.apache.spark.sql.functions._

import graft.functions.Scalars

class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  test("asciiFold strips accents, lowercases, trims (F4)") {
    val out = Seq(" Café São GONÇALO ", "plain", null)
      .toDF("s").select(Scalars.asciiFold(col("s"))).collect()
    assert(out(0).getString(0) == "cafe sao goncalo")
    assert(out(1).getString(0) == "plain")
    assert(out(2).isNullAt(0))
  }

  test("multi-format timestamp parse tries formats in order (F7)") {
    val out = Seq("2024-01-05 03:04:05", "2024/01/05", "garbage", null)
      .toDF("s")
      .select(Scalars.parseTimestampMulti(col("s"), Scalars.referenceFormats))
      .collect()
    assert(out(0).getTimestamp(0).toString == "2024-01-05 03:04:05.0")
    assert(out(1).getTimestamp(0).toString == "2024-01-05 00:00:00.0")
    assert(out(2).isNullAt(0))
    assert(out(3).isNullAt(0))
  }

  test("stripFloatArtifact and normalizeKey (F1/F2/F3)") {
    val r = Seq(("12345.0", " São-Paulo! "))
      .toDF("zip", "city")
      .select(
        Scalars.stripFloatArtifact(col("zip")),
        Scalars.normalizeKey(col("city")))
      .collect()(0)
    assert(r.getString(0) == "12345")
    assert(r.getString(1) == "sopaulo") // non-alnum (incl. accents) dropped
  }

  test("minMaxScaled maps extremes to [lo, hi] (F16)") {
    val d = Seq(0.0, 5.0, 10.0).toDF("v")
    val out = Scalars.minMaxScaled(d, col("v"), "s", 5.0, 100.0)
      .orderBy("v").select("s").collect().map(_.getDouble(0))
    assert(out(0) == 5.0 && out(2) == 100.0)
    assert(math.abs(out(1) - 52.5) < 1e-12)
  }

  test("lenient numeric cast nulls bad input and flags it (F14)") {
    val out = Seq("1.5", "x", null).toDF("s")
      .select(Scalars.lenientDouble(col("s")),
        Scalars.lenientDoubleError(col("s")))
      .collect()
    assert(out(0).getDouble(0) == 1.5 && !out(0).getBoolean(1))
    assert(out(1).isNullAt(0) && out(1).getBoolean(1))
    assert(out(2).isNullAt(0) && !out(2).getBoolean(1))
  }
}
