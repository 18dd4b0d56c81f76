package graft
import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness: times the named queries individually
  * (cold then 2 warm), prints physical plan summaries for audit.
  * Run: sbt "runMain graft.Profile q_x_knn q_x_ann_lsh"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftSparkExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.enableCaching(spark, sfDir)
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime(); val df = fn(spark, sfDir); val tPlanBuild = System.nanoTime()
      df.count(); val tCold = System.nanoTime()
      val warms = (1 to 2).map { _ =>
        val a = System.nanoTime(); fn(spark, sfDir).count(); (System.nanoTime() - a) / 1e9
      }
      println(f"PROF $name%-22s build=${(tPlanBuild-t0)/1e9}%.2f cold=${(tCold-tPlanBuild)/1e9}%.2f warm=${warms.min}%.2f")
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) df.explain("formatted")
    }
    spark.stop()
  }
}
