package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** q_x_compress_ratio (Gopher-rules repetitive-document detector):
  * no SQL oracle exists (DuckDB has no zlib), so the signal's
  * invariants are pinned here instead — separation between repetitive
  * and diverse text, flag/ratio consistency, determinism, and empty
  * handling.
  */
class CompressRatioSpec extends SparkSuite {
  import spark.implicits._

  private def runOn(texts: Seq[(Long, String)], parts: Int = 1): Map[Long, (Long, Long, Double, Boolean)] = {
    val dir = Files.createTempDirectory("graft_cr").toString
    texts.toDF("doc_id", "text")
      .repartition(parts)
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src").as("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("q_x_compress_ratio")(spark, dir)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("repetitive text compresses far below diverse text and is flagged") {
    val repetitive = Seq.fill(150)("buy now click here").mkString(" ")
    // pseudo-random word soup, deterministic seed
    val rnd = new scala.util.Random(7)
    val diverse = Seq.fill(150)(rnd.alphanumeric.take(12).mkString).mkString(" ")
    val got = runOn(Seq((1L, repetitive), (2L, diverse)))
    val (rBytes, rDefl, rRatio, rFlag) = got(1L)
    val (_, _, dRatio, dFlag) = got(2L)
    assert(rRatio < 0.1, s"repetitive ratio $rRatio")
    assert(dRatio > 0.5, s"diverse ratio $dRatio")
    assert(rFlag && !dFlag)
    // flag consistent with the integer-exact rule on the raw counts
    assert(rFlag == (rDefl * 100 < rBytes * 35))
  }

  test("ratio and flag are deterministic across runs and partitionings") {
    val texts = (1L to 40L).map(i => i -> s"doc $i ${"na " * (i % 7).toInt}content")
    val a = runOn(texts, parts = 1)
    val b = runOn(texts, parts = 7)
    assert(a == b)
  }

  test("empty text rows are filtered, not divided by zero") {
    val got = runOn(Seq((1L, ""), (2L, "some real content here")))
    assert(!got.contains(1L))
    assert(got.contains(2L))
  }

  test("fixture corpus: all rows have positive deflated size and sane ratios") {
    val df = SparkEntry.queries("q_x_compress_ratio")(spark, sfDir)
    val bad = df.filter(col("n_deflated") <= 0 ||
      col("compress_ratio") <= 0 || col("compress_ratio") > 1.2)
    assert(bad.isEmpty)
    assert(df.count() > 0)
  }
}
