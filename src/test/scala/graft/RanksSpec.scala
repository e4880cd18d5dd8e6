package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Ranks, Validate}

/** Distributed global rank / NTILE reconstruction (operators.Ranks) vs the
  * single-partition window built-ins they replace, and the generalized
  * per-table validation registry. */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  // duplicates in the metric force the tie-break column to matter; sizes
  // 37/40/41 hit all NTILE remainder classes (N%4 = 1, 0, 1) plus N<n
  private def fixture(n: Int) =
    (1 to n).map(i => (i.toLong, (i * 7919 % 13).toDouble)).toDF("id", "m")

  for (n <- Seq(2, 37, 40, 41)) {
    test(s"withGlobalRank == ROW_NUMBER over global window (n=$n)") {
      val df = fixture(n)
      val got = Ranks.withGlobalRank(df, Seq(col("m"), col("id")), "rk")
        .select(col("id"), col("rk"))
      val want = df.select(col("id"),
        row_number().over(Window.partitionBy(lit(0)).orderBy(col("m"), col("id")))
          .cast("long").as("rk"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty)
    }

    test(s"ntileFromRank == NTILE(4) (n=$n)") {
      val df = fixture(n).crossJoin(
        broadcast(fixture(n).agg(count(lit(1)).as("total"))))
      val got = Ranks.withGlobalRank(df, Seq(col("m"), col("id")), "rk")
        .select(col("id"),
          Ranks.ntileFromRank(col("rk"), col("total"), 4).as("tile"))
      val want = df.select(col("id"),
        ntile(4).over(Window.partitionBy(lit(0)).orderBy(col("m"), col("id")))
          .cast("long").as("tile"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty)
    }
  }

  test("withGlobalRank survives multi-partition tie runs (1500 rows, 13 keys)") {
    // mirrors the q07 frequency profile that exposed the sampled-boundary
    // double-execution bug: long runs of tied metric values spanning
    // range-partition boundaries
    val df = (1 to 1500).map(i => (i.toLong, (i * 7919 % 13).toDouble))
      .toDF("id", "m")
    val ranked = Ranks.withGlobalRank(df, Seq(col("m"), col("id")), "rk")
    val got = ranked.select(col("id"), col("rk"))
    val want = df.select(col("id"),
      row_number().over(Window.partitionBy(lit(0)).orderBy(col("m"), col("id")))
        .cast("long").as("rk"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // ranks are a permutation of 1..N — catches duplicate/overflow ranks
    val agg = ranked.agg(count(lit(1)), countDistinct(col("rk")), max(col("rk")))
      .collect()(0)
    assert(agg.getLong(0) == 1500 && agg.getLong(1) == 1500 &&
      agg.getLong(2) == 1500L)
  }

  test("validation registry covers every driver table, keys first") {
    val tables = Validate.registry.map(_.table)
    assert(tables.toSet == Set("orders", "lineitem", "customer", "supplier",
      "nation", "region", "part", "events"))
    // every KEY COLUMN is flagged by a null-check rule (quarantine before
    // dup-ranking depends on it: null-key rows never match the dupKeys
    // equi-joins, so a rule must catch them — ADVICE r2 found events
    // missing this and passing the old label-prefix check vacuously)
    Validate.registry.foreach { tr =>
      tr.key.foreach { k =>
        assert(tr.rules.exists(_.sql.contains(s"$k IS NULL")),
          s"${tr.table}: key $k has no null-flagging rule")
      }
    }
  }

  test("generic split: rule rows quarantine, clean dup keys rank clean-first") {
    val df = Seq(
      (1L, "x", 1.0),   // clean, unique key
      (2L, "y", -1.0),  // rule violation (negative v)
      (3L, "z", 2.0),   // clean, key 3 first
      (3L, "z", 3.0),   // duplicate of key 3
      (4L, null, 1.0),  // rule violation (null name)
      (4L, "w", 9.0),   // clean — must stay valid despite sharing key 4
    ).toDF("id", "name", "v")
    val tr = Validate.TableRules("t", Seq("id"), Seq("v"), Seq(
      Validate.Rule("missing_name", col("name").isNull, "name IS NULL"),
      Validate.Rule("negative_v", col("v") < 0, "v < 0")))
    val tagged = Validate.split(df, tr).cache()
    val byError = tagged.groupBy("error").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byError(None) == 3)                      // ids 1, 3(first), 4("w")
    assert(byError(Some("missing_name")) == 1)
    assert(byError(Some("negative_v")) == 1)
    assert(byError(Some("duplicate")) == 1)
    assert(Validate.valid(tagged).count() + Validate.quarantine(tagged).count()
      == df.count())
    tagged.unpersist()
  }
}
