package graft

import org.apache.spark.sql.functions._

/** Guards the byte-vs-character equivalence the multimodal oracles rely
  * on: q_x_waveform / q_x_frame_dedup / q_x_media_features compute over
  * UTF-8 payload BYTES on the Spark side while their DuckDB oracles use
  * character semantics (length/substr/ascii over text). Those two
  * readings coincide exactly when every code point is ASCII (1 byte ==
  * 1 char, codepoint == byte value). This spec pins that invariant on
  * every materialized documents fixture so a future non-ASCII fixture
  * fails HERE with a named cause instead of as a silent oracle hash
  * divergence (r8 ADVICE item).
  */
class AsciiFixtureSpec extends SparkSuite {

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"documents.text is pure ASCII on $sf (oracle byte==char contract)") {
      assume(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"/root/testdata/$sf/documents.parquet")),
        s"fixture $sf not present")
      val docs = Tables.table(spark, s"/root/testdata/$sf", "documents")
      // byte length (octet_length of the UTF-8 encoding) == char length
      // for every row iff the text is ASCII-only; one aggregate, no collect
      val bad = docs
        .select(col("doc_id"),
          length(col("text")).as("chars"),
          octet_length(col("text")).as("bytes"))
        .filter(col("chars") =!= col("bytes"))
        .limit(5)
        .collect()
      assert(bad.isEmpty,
        s"non-ASCII text in documents fixture $sf — multimodal oracles' " +
        s"char-semantics no longer match Spark's byte-semantics; first " +
        s"offenders: ${bad.map(_.getString(0)).mkString(", ")}")
    }
  }
}
