package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Content-defined chunking (FastCDC family): chunk boundaries where
  * the rolling n-word window's md5 has a leading '0' hex digit
  * (expected chunk ~16 grams). The rule reads only window CONTENT, so
  * an edit shifts only the chunk it touches — the property that makes
  * CDC the chunking step in front of chunk-level dedup (fixed-size
  * chunking shifts every downstream chunk on one insertion;
  * CdcChunkingSpec asserts the locality).
  *
  * Shared by the declared q_x_cdc_chunks query and its spec so the
  * boundary rule lives exactly once.
  */
object Chunking {

  /** Gram rows with chunk assignment: (doc_id, pos, g, chunk_idx).
    * The cumulative boundary count is a per-doc PARTITIONED window —
    * never global. Documents with fewer than n words have no grams
    * and are absent.
    */
  def cdcGrams(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.wordNgramsExpr(textCol, n)).as(Seq("pos", "g")))
      .withColumn("b", when(substring(md5(col("g")), 1, 1) === "0", 1L).otherwise(0L))
      .withColumn("chunk_idx", sum(col("b")).over(w))
      .drop("b")
  }

  /** Per-chunk summary: (doc_id, chunk_idx, start_pos, n_grams). */
  def cdcChunks(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame =
    cdcGrams(docs, textCol, idCol, n)
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(min(col("pos")).cast("int").as("start_pos"), count(lit(1)).as("n_grams"))
}
