package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (q_x_cdc_chunks logic): boundaries are a
  * pure function of window CONTENT, so an edit shifts only the chunk
  * it touches — the property fixed-size chunking (q_x_chunks) lacks,
  * and the reason CDC feeds chunk-level dedup.
  */
class CdcChunkingSpec extends SparkSuite {
  import spark.implicits._
  import functions.TextFunctions

  /** Per-doc chunk contents from the SAME builder the declared query
    * uses (operators.Chunking — a drifting copy here would leave the
    * real boundary rule untested): each chunk as its gram sequence.
    */
  private def chunks(docs: DataFrame): Map[Long, Seq[Seq[String]]] =
    operators.Chunking.cdcGrams(docs, "text", "doc_id", n = 3)
      .groupBy($"doc_id", $"chunk_idx")
      .agg(sort_array(collect_list(struct($"pos", $"g"))).as("pg"))
      .select($"doc_id", $"chunk_idx", expr("transform(pg, x -> x.g)").as("grams"))
      .as[(Long, Long, Seq[String])].collect()
      .groupBy(_._1)
      .map { case (id, rows) => id -> rows.sortBy(_._2).map(_._3).toSeq }

  test("prepending a word disturbs only the first chunk") {
    val text = Tables.table(spark, sfDir, "documents")
      .filter(size(TextFunctions.tokens($"text")) >= 50)
      .select($"text").head().getString(0)
    val both = chunks(Seq((1L, text), (2L, s"zzzedit $text")).toDF("doc_id", "text"))
    val (orig, edited) = (both(1L), both(2L))
    // every chunk except the first is byte-identical between versions
    assert(orig.size > 2, s"fixture text produced only ${orig.size} chunks; pick a longer doc")
    assert(orig.tail === edited.tail,
      "CDC must localize a front edit to the first chunk")
    assert(orig.head !== edited.head)
  }

  test("boundary decision depends only on gram content (stable across docs)") {
    // the same text in two docs chunks identically
    val text = Tables.table(spark, sfDir, "documents")
      .filter(size(TextFunctions.tokens($"text")) >= 20)
      .select($"text").head().getString(0)
    val both = chunks(Seq((10L, text), (20L, text)).toDF("doc_id", "text"))
    assert(both(10L) === both(20L))
  }
}
