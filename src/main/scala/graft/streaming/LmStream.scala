package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.LmOps

/** Streaming LM quality gate — the production seam for d31b.
  *
  * CCNet's actual deployment shape: the LM is trained ONCE on a trusted
  * reference corpus, frozen, and every incoming crawl batch is scored
  * against it (training the LM on the batch being scored — d31/d31b's
  * self-scoring configuration — is the corpus-analysis mode, not the
  * ingest mode). This object owns the frozen-model half:
  *
  *   - [[trainModel]] runs d31b's pruning stages over a reference corpus
  *     frame and persists the three artifact tables (model / backoff /
  *     floor) as ONE atomic model version: `modelDir/v<N>/{model,backoff,
  *     floor}` committed by a root `_SUCCESS` marker, same crash-safety
  *     contract as the corpus stream's band-index deltas — a version
  *     without the marker is invisible to readers and reclaimed by the
  *     next trainer.
  *   - [[scoreBatch]] scores any document frame against the LATEST
  *     committed version: broadcast-hash joins against the pruned tables,
  *     so the batch never shuffles before its per-doc aggregate —
  *     per-micro-batch cost is one corpus-store-free scan of the batch.
  *   - [[startScored]] wires a document stream through the gate with
  *     `foreachBatch`, appending (doc_id, n_bigrams, avg_ll, ppl,
  *     lm_pass) per batch.
  *
  * Scale: the persisted model is the pruned artifact (bounded by
  * reference_tokens / MinBigramCount), read once per executor via
  * broadcast; re-training is an explicit, versioned event (e.g. nightly)
  * — scoring micro-batches NEVER touches the reference corpus itself.
  */
object LmStream {

  private val VersionRe = "v(\\d+)".r

  /** Committed model versions, ascending. */
  def modelVersions(spark: SparkSession, modelDir: String): Seq[Int] = {
    val p = new Path(modelDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .flatMap(_.getPath.getName match {
        case VersionRe(v) => Some(v.toInt)
        case _ => None
      })
      .filter(v => fs.exists(new Path(p, s"v$v/_SUCCESS")))
      .sorted
  }

  /** Train the pruned LM on `reference` and commit it as the next model
    * version. Single-trainer contract (same as the corpus index: no
    * lock); a partial version dir left by a crashed trainer has no
    * `_SUCCESS`, is invisible to [[scoreBatch]], and is reclaimed here. */
  def trainModel(spark: SparkSession, reference: DataFrame,
      modelDir: String): Int = {
    val (_, vocab, cnt, ctx) = LmOps.lmStagesFrom(reference)
    val (model, backoff, floorLl) = LmOps.prunedTablesFrom(vocab, cnt, ctx)
    val next = modelVersions(spark, modelDir).maxOption.getOrElse(-1) + 1
    val vdir = new Path(s"$modelDir/v$next")
    val fs = vdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(vdir)) fs.delete(vdir, true) // crashed trainer's partial
    model.write.mode(SaveMode.ErrorIfExists).parquet(s"$vdir/model")
    backoff.write.mode(SaveMode.ErrorIfExists).parquet(s"$vdir/backoff")
    floorLl.write.mode(SaveMode.ErrorIfExists).parquet(s"$vdir/floor")
    fs.create(new Path(vdir, "_SUCCESS")).close() // commit point
    next
  }

  private val ModelSchema = StructType(Seq(
    StructField("bh", LongType), StructField("llq", LongType)))
  private val BackoffSchema = StructType(Seq(
    StructField("w1h", LongType), StructField("bllq", LongType)))
  private val FloorSchema = StructType(Seq(StructField("fllq", LongType)))

  /** Score `docs` (any frame with doc_id + text) against the latest
    * committed model version. Output: (doc_id, n_bigrams, avg_ll, ppl) —
    * d31b's schema, d31b's fixed-point contract, zero-token docs absent
    * (d28's contract). */
  def scoreBatch(spark: SparkSession, modelDir: String)
      (docs: DataFrame): DataFrame = {
    val v = modelVersions(spark, modelDir).maxOption.getOrElse(
      sys.error(s"[graft] no committed LM model version under $modelDir — " +
        "run LmStream.trainModel first"))
    val vdir = s"$modelDir/v$v"
    LmOps.scorePruned(
      LmOps.bigramRows(docs),
      spark.read.schema(ModelSchema).parquet(s"$vdir/model"),
      spark.read.schema(BackoffSchema).parquet(s"$vdir/backoff"),
      spark.read.schema(FloorSchema).parquet(s"$vdir/floor"))
  }

  /** Stream gate: score each micro-batch against the frozen model and
    * append results (with the pass flag) to `outDir`. Replay-idempotent
    * via per-batch subdirs: a replayed batchId overwrites its own output
    * only. */
  def startScored(docs: DataFrame, modelDir: String, outDir: String,
      checkpoint: String, minAvgLl: Double):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docs.sparkSession
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        scoreBatch(spark, modelDir)(batch)
          .withColumn("lm_pass", (col("avg_ll") >= minAvgLl).cast(IntegerType))
          .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
