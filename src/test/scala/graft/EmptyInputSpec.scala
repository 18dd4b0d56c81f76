package graft

/** Robustness: every declared query must run (not throw) against
  * EMPTY tables of the fixture schemas — the degenerate partition a
  * 1000-executor job will inevitably hand some task, and the day-one
  * state of any new deployment. Catches null-from-empty-aggregate,
  * sequence(0,-1), require(nonEmpty)-style bugs.
  */
class EmptyInputSpec extends SparkSuite {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("empty_sf").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      // events: read with nanosAsLong set so a nanos-encoded fixture
      // round-trips; the empty copy keeps the fixture's ts encoding
      // and Tables.events branches on it either way.
      if (t == "events") spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every declared query runs on empty inputs") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, emptyDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
