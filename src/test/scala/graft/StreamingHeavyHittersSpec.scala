package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{StreamingJobs, TransformWithStateJobs}

/** Streaming Misra–Gries invariants: the per-key managed-state sketch
  * folded over N batches must obey the MG error bounds against EXACT
  * counts of the whole stream (the bounds are order-free, so batch
  * boundaries cannot break them — only widen dec within its bound).
  */
class StreamingHeavyHittersSpec extends SparkSuite {

  private val k = 8

  private def exactCounts(): Map[(String, String), Long] =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1).toString) -> r.getLong(2)).toMap

  private def assertInvariants(
      finals: Map[String, (Map[String, Long], Long, Long)]): Unit = {
    val exact = exactCounts()
    val totals = exact.groupBy(_._1._1).map { case (t, m) => t -> m.values.sum }
    assert(finals.keySet == totals.keySet)
    finals.foreach { case (typ, (est, dec, n)) =>
      assert(n == totals(typ), s"$typ: processed $n of ${totals(typ)}")
      assert(dec <= n / (k + 1), s"$typ: dec $dec above n/(k+1)")
      est.foreach { case (term, e) =>
        val truth = exact.getOrElse((typ, term), 0L)
        assert(e <= truth && truth <= e + dec,
          s"$typ/$term: est $e outside [${truth - dec}, $truth]")
      }
      // no false negatives above the error bound
      exact.filter { case ((t, _), c) => t == typ && c > dec }.foreach {
        case ((_, term), c) =>
          assert(est.contains(term), s"$typ: heavy term $term (true $c > dec $dec) missing")
      }
    }
  }

  private def parseFinals(table: String): Map[String, (Map[String, Long], Long, Long)] =
    operators.Upsert.dedupKeyed(spark.table(table), Seq("event_type"), Seq(col("n")))
      .collect().map { r =>
        val terms = r.getAs[String]("terms").split(",").filter(_.nonEmpty)
          .map { kv => val Array(t, c) = kv.split("="); t -> c.toLong }.toMap
        r.getAs[String]("event_type") ->
          (terms, r.getAs[Long]("err"), r.getAs[Long]("n"))
      }.toMap

  test("single-batch streamed MG obeys the error bounds vs exact counts") {
    TransformWithStateJobs.withRocksDb(spark)
    try {
      val q = TransformWithStateJobs
        .heavyHitters(spark, StreamingJobs.readEvents(spark, sfDir), k)
        .toDF().writeStream.format("memory").queryName("t_hh1")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      assertInvariants(parseFinals("t_hh1"))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("multi-batch streamed MG still obeys the bounds (state resumes the sketch)") {
    TransformWithStateJobs.withRocksDb(spark)
    try {
      val ev = Tables.events(spark, sfDir)
      val dir = Files.createTempDirectory("graft-hh").toString
      (0 until 3).foreach { i =>
        ev.filter(col("event_id") % 3 === i).coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/slice$i")
        val f = Files.list(java.nio.file.Paths.get(s"$dir/slice$i"))
          .filter(_.toString.endsWith(".parquet")).findFirst().get()
        Files.move(f, java.nio.file.Paths.get(s"$dir/b$i.parquet"))
      }
      val stream = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
        .parquet(dir)
      val q = TransformWithStateJobs.heavyHitters(spark, stream, k)
        .toDF().writeStream.format("memory").queryName("t_hh3")
        .outputMode("update").trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          Files.createTempDirectory("graft-hh-ckpt").toString)
        .start()
      q.awaitTermination()
      assertInvariants(parseFinals("t_hh3"))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("MG bounds hold at shuffle widths 2 and 5; totals and guaranteed-heavy sets agree") {
    // partitioning invariance (r11 verdict item 8): Misra–Gries is
    // within-key order-SENSITIVE in its counter contents, so the
    // layout-free contract is (a) the error bounds hold at every
    // width, (b) processed totals are identical, and (c) every term
    // whose true count exceeds the width's dec bound appears at BOTH
    // widths — the set a user may act on never depends on task layout.
    TransformWithStateJobs.withRocksDb(spark)
    try {
      def run(w: Int): Map[String, (Map[String, Long], Long, Long)] = withShuffleWidth(w) {
        val name = s"t_hh_w$w"
        val q = TransformWithStateJobs
          .heavyHitters(spark, StreamingJobs.readEvents(spark, sfDir), k)
          .toDF().writeStream.format("memory").queryName(name)
          .outputMode("update").trigger(Trigger.AvailableNow())
          .option("checkpointLocation",
            Files.createTempDirectory(s"graft-hh-inv$w").toString)
          .start()
        q.awaitTermination()
        parseFinals(name)
      }
      val narrow = run(2)
      val wide = run(5)
      assertInvariants(narrow)
      assertInvariants(wide)
      assert(narrow.keySet == wide.keySet)
      val exact = exactCounts()
      narrow.foreach { case (typ, (_, decN, nN)) =>
        val (_, decW, nW) = wide(typ)
        assert(nN == nW, s"$typ: processed totals differ across widths ($nN vs $nW)")
        val bound = math.max(decN, decW)
        exact.filter { case ((t, _), c) => t == typ && c > bound }.foreach {
          case ((_, term), c) =>
            assert(narrow(typ)._1.contains(term) && wide(typ)._1.contains(term),
              s"$typ: guaranteed-heavy term $term (true $c > dec $bound) missing at one width")
        }
      }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
