package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: flagship smoke + plan inspection (explain output for
  * the scale-critical queries — pushdown, broadcast, codegen spans).
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftSparkExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.headOption match {
      case Some("explain") =>
        args.drop(1).foreach { q =>
          println(s"===== $q =====")
          SparkEntry.queries(q)(spark, dir).explain("formatted")
        }
      case Some("show") =>
        args.drop(1).foreach { q =>
          println(s"===== $q =====")
          try SparkEntry.queries(q)(spark, dir).show(20, truncate = false)
          catch { case e: Throwable => println(s"THREW: $e"); e.printStackTrace() }
        }
      case _ =>
        val flagship = SparkEntry.entry(spark)
        println(s"flagship rows = ${flagship.count()}")
    }
    spark.stop()
  }
}
