package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink surface (SURVEY.md §2.1): bulk columnar writes replace
  * the reference's row-at-a-time INSERT loop (weather-etl.py:134-143,
  * a documented anti-pattern, SURVEY.md §4.1).
  *
  * Scale defaults: date-partitioned parquet so downstream reads prune
  * partitions; append for micro-batches, overwrite for staging; JDBC
  * writer for parity with the reference's Postgres target (exercised
  * for real against embedded Derby — JdbcRoundTripSpec).
  */
object Sinks {

  /** Append a micro-batch to a date-partitioned parquet table — the
    * engine-native bulk form of the reference's INSERT loop.
    */
  def appendPartitioned(df: DataFrame, path: String, tsCol: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode(SaveMode.Append)
      .partitionBy("p_date")
      .parquet(path)

  /** Overwrite (the staging-table pattern, weather-etl.py:82-94). */
  def overwrite(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** JDBC append — the reference's actual sink (Postgres via
    * psycopg2); Spark's batched writer replaces per-row INSERTs.
    * Round-tripped for real against embedded Derby (table
    * auto-create, append semantics, typed readback —
    * JdbcRoundTripSpec); at a deployment only the url/driver change.
    */
  def appendJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)

  /** Compact a parquet directory's many small files into
    * ~`targetMb`-sized ones — the maintenance pass every long-running
    * micro-batch ingest needs (each 5-minute batch appends small
    * files; scan efficiency at 100 TB needs row groups near the HDFS
    * block size). File count from actual on-disk bytes, data
    * round-tripped via a temp dir so the rewrite is atomic-ish
    * (write new, then swap).
    */
  def compact(spark: SparkSession, path: String, targetMb: Int = 128): Unit = {
    val dir = new java.io.File(path)
    // A hive-partitioned dir (key=value subdirs) must be compacted
    // leaf-by-leaf: the flat rewrite below would land files with the
    // partition columns re-materialized NEXT TO the old partition
    // dirs — readers then see conflicting directory structures.
    val subdirs = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !f.getName.startsWith("_"))
    if (subdirs.nonEmpty) {
      require(subdirs.forall(_.getName.contains("=")),
        s"compact: unrecognized subdirectories under $path: " +
          subdirs.map(_.getName).mkString(", "))
      subdirs.foreach(d => compact(spark, d.getAbsolutePath, targetMb))
      return
    }
    val bytes = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-")).map(_.length()).sum
    val nFiles = math.max(1, (bytes / (targetMb.toLong << 20)).toInt +
      (if (bytes % (targetMb.toLong << 20) > 0) 1 else 0))
    val tmp = path.stripSuffix("/") + "_compact_tmp"
    spark.read.parquet(path).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val target = java.nio.file.Paths.get(path)
    // swap: remove originals, move compacted files in
    Option(dir.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (!f.isDirectory) f.delete()
    }
    Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty).foreach { f =>
      java.nio.file.Files.move(f.toPath, target.resolve(f.getName),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    new java.io.File(tmp).delete()
  }

  /** Z-ordered parquet write: range-partition + sort by the Morton
    * key of two columns ([[graft.functions.ZOrderKey]]) so row groups
    * are tight in BOTH dimensions — min/max statistics then prune
    * scans filtering on either column. The write-once layout
    * optimization for 100 TB tables queried along two axes (a linear
    * sort only prunes its leading column).
    *
    * Columns must be non-negative integral (ranks/quantized values);
    * repartitionByRange keeps key ranges disjoint ACROSS files so
    * file-level pruning works too, not just row-group-level.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int = 0): Unit = {
    val keyed = df.withColumn("z",
      call_function("graft_zorder", col(colA).cast("long"), col(colB).cast("long")))
    val ranged = if (numFiles > 0) keyed.repartitionByRange(numFiles, col("z"))
      else keyed.repartitionByRange(col("z"))
    ranged.sortWithinPartitions(col("z")).drop("z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Schema-on-read JSON source (the API payload shape,
    * weather-etl.py:122) and CSV round-trip helpers — the remaining
    * file formats of the source surface.
    */
  def readJson(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def readCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Binary-file source — the ingestion path for multimodal payloads
    * (images/audio/video as opaque bytes, SURVEY.md §2.8): one row per
    * file with (path, modificationTime, length, content). Globbed and
    * distributed by Spark's file index, so a 100 TB media corpus scans
    * in parallel like any other source; decode happens downstream in
    * [[graft.multimodal.Multimodal]].
    */
  def readBinaryDir(spark: SparkSession, path: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)

  /** ORC — the other columnar at-rest format Spark ships natively. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** XML — native in Spark 4 (SPARK-44265); the sibling ad-hoc payload
    * format of the reference's JSON API feed. Schema-on-read like
    * [[readJson]]; rowTag delimits one record per element.
    */
  def readXml(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      rowTag: String = "row"): DataFrame =
    spark.read.schema(schema).option("rowTag", rowTag).format("xml").load(path)

  def writeXml(df: DataFrame, path: String, rowTag: String = "row"): Unit =
    df.write.mode(SaveMode.Overwrite).option("rowTag", rowTag).format("xml").save(path)
}
