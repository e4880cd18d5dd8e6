package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.TextOps

/** Streaming corpus ingestion — the LLM tier's batch stages that are pure
  * per-row functions (quality signals, content fingerprinting) run
  * UNCHANGED on a document stream; exact dedup becomes
  * dropDuplicatesWithinWatermark on the md5 content fingerprint, with
  * state bounded by the watermark exactly like the event-stream dedup
  * (Realtime.dedupEvents).
  *
  * This is the "documents arrive continuously" shape of a crawl pipeline:
  * gate → fingerprint → content-dedup, emitting append-mode rows ready
  * for the downstream batch stages (LSH near-dedup runs per micro-batch
  * or in the nightly batch pass — sketch joins need a bounded corpus).
  *
  * Scale: dedup state is one (16-byte fingerprint → marker) entry per
  * distinct document inside the watermark horizon; a 24 h watermark over
  * a crawl that ingests ~1 B docs/day bounds state at the day's distinct
  * fingerprints, not the corpus's.
  */
object CorpusStream {

  private val MinTokens = 10
  private val MaxPunctRatio = 0.3

  /** Quality gate + content fingerprint for a (doc_id, ingest_ts, text)
    * stream — pure projections, so the SAME code serves batch frames. */
  def gated(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    docs
      .withColumn("n_tokens", size(toks).cast(LongType))
      .withColumn("n_punct",
        length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast(LongType))
      .withColumn("n_chars", length(col("text")).cast(LongType))
      .filter(col("n_tokens") >= MinTokens &&
        col("n_punct").cast(DoubleType) / col("n_chars") <= MaxPunctRatio)
      .withColumn("text_fp", md5(col("text")))
  }

  /** Gate then drop every document whose CONTENT was already seen inside
    * the watermark horizon (keep-first, like the batch d01 tier). */
  def gateAndDedup(docs: DataFrame, watermark: String = "24 hours"): DataFrame =
    gated(docs)
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("text_fp")
}
