package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The composed cleaning pipeline of a pretraining-data build:
  * quality gate → exact dedup → deterministic sample → split
  * assignment. Each stage is an independent DataFrame → DataFrame
  * function (composable / individually testable); `clean` is the
  * standard composition.
  *
  * Scale shape: the quality gate and sampling are map-only (no
  * shuffle); dedup is the single shuffle (by content hash); the split
  * is a pure function of the id. Every decision is deterministic —
  * a function of (content, id, salt), never of partitioning, row
  * order, or rand() — so reruns and cluster-vs-local runs agree
  * bit-for-bit (the property the reference's PK merge guarantees and
  * a 1000-executor rerun must keep).
  */
object TrainingPipeline {

  /** Keep docs with ≥ minWords tokens and stopword ratio < maxStopRatio. */
  def qualityGate(docs: DataFrame, textCol: String,
      minWords: Int = 20, maxStopRatio: Double = 0.5): DataFrame = {
    val words = TextFunctions.tokens(col(textCol))
    val enStop = TextFunctions.stopwordsByLang("en")
    val nw = size(words)
    val hits = TextFunctions.stopwordHits(words, enStop)
    docs.filter(nw >= minWords &&
      hits.cast("double") / nw.cast("double") < maxStopRatio)
  }

  /** Exact dedup keeping the smallest id per content hash (one
    * shuffle by sha256(text); deterministic winner).
    */
  def dedupKeepMin(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(sha2(col(textCol), 256)).orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Deterministic keep-decision: md5(salt, id) bucket ∈ [0,256) < rate. */
  def sampleBucket(idCol: Column, salt: String): Column = {
    val hex = lit("0123456789abcdef")
    val h = md5(concat(lit(salt), idCol.cast("string")))
    (instr(hex, substring(h, 1, 1)) - 1) * 16 +
      (instr(hex, substring(h, 2, 1)) - 1)
  }

  def sample(docs: DataFrame, idCol: String, rateOf256: Int,
      salt: String = "graft"): DataFrame =
    docs.filter(sampleBucket(col(idCol), salt) < rateOf256)

  /** train/val/test split as a pure function of the id (8/1/1). */
  def withSplit(docs: DataFrame, idCol: String): DataFrame =
    docs.withColumn("split",
      when(col(idCol) % 10 < 8, "train")
        .when(col(idCol) % 10 < 9, "val")
        .otherwise("test"))

  /** The standard composition. */
  def clean(docs: DataFrame, textCol: String, idCol: String,
      minWords: Int = 20, maxStopRatio: Double = 0.5,
      sampleRateOf256: Int = 128): DataFrame =
    withSplit(
      sample(
        dedupKeepMin(
          qualityGate(docs, textCol, minWords, maxStopRatio),
          textCol, idCol),
        idCol, sampleRateOf256),
      idCol)
}
