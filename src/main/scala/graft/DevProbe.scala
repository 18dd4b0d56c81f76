package graft
import org.apache.spark.sql.SparkSession
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val flagship = SparkEntry.entry(spark)
    flagship.show(5, false)
    println(s"flagship rows = ${flagship.count()}")
    spark.stop()
  }
}
