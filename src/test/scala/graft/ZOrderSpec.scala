package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrderKey
import graft.sources.Sinks

class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  /** Reference interleave: bit-by-bit loop. */
  private def refInterleave(a: Long, b: Long): Long = {
    var out = 0L
    for (i <- 0 until 32)
      out |= (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    out
  }

  test("morton interleave matches bit-by-bit reference") {
    val rnd = new scala.util.Random(11)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL)) ++
      Seq.fill(200)((rnd.nextLong() & 0xFFFFFFFFL, rnd.nextLong() & 0xFFFFFFFFL))
    cases.foreach { case (a, b) =>
      assert(ZOrderKey.interleave(a, b) === refInterleave(a, b), s"($a,$b)")
    }
  }

  test("codegen expression equals object method") {
    val df = Seq((3L, 5L), (0L, 0L), (123456L, 654321L)).toDF("a", "b")
      .selectExpr("a", "b", "graft_zorder(a, b) AS z")
    df.as[(Long, Long, Long)].collect().foreach { case (a, b, z) =>
      assert(z === ZOrderKey.interleave(a, b))
    }
  }

  test("z-ordered layout bounds both dimensions per file; linear sort does not") {
    val n = 64
    val grid = spark.range(0, n.toLong * n)
      .select((col("id") % n).as("x"), (col("id") / n).cast("long").as("y"))

    def maxSpreadOf(dir: String): (Long, Long) = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      val spans = files.toSeq.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(max(col("x")) - min(col("x")), max(col("y")) - min(col("y")))
          .as[(Long, Long)].collect()(0)
        r
      }
      (spans.map(_._1).max, spans.map(_._2).max)
    }

    val zDir = java.nio.file.Files.createTempDirectory("zord").toString
    Sinks.writeZOrdered(grid, zDir, "x", "y", numFiles = 16)
    val (zx, zy) = maxSpreadOf(zDir)

    val linDir = java.nio.file.Files.createTempDirectory("lin").toString
    grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y"))
      .write.mode("overwrite").parquet(linDir)
    val (lx, ly) = maxSpreadOf(linDir)

    info(s"z-order max spans: x=$zx y=$zy; linear: x=$lx y=$ly")
    // z-order: every file is a tile — both dimensions bounded well below
    // the full extent. Linear: x is tight but y spans the whole range.
    assert(zx < n / 2 && zy < n / 2)
    assert(ly > n / 2 && zy < ly)
  }
}

class CompactionSpec extends SparkSuite {
  import spark.implicits._

  test("compact merges small files, preserves data, bounds file count") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    val df = spark.range(0, 50000).select($"id", ($"id" % 97).as("k"))
    df.repartition(40).write.mode("overwrite").parquet(dir)
    def parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.length === 40)
    Sinks.compact(spark, dir, targetMb = 128)
    assert(parts.length === 1) // 50k rows ≪ 128 MB
    val got = spark.read.parquet(dir).as[(Long, Long)].collect().toSet
    val want = df.as[(Long, Long)].collect().toSet
    assert(got === want)
  }

  test("compact recurses into hive partitions instead of flattening them") {
    val dir = java.nio.file.Files.createTempDirectory("compactp").toString
    val df = spark.range(0, 10000).select($"id", ($"id" % 4).as("p"))
    df.repartition(10).write.partitionBy("p").mode("overwrite").parquet(dir)
    Sinks.compact(spark, dir, targetMb = 128)
    val leaves = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("p="))
    assert(leaves.length === 4)
    leaves.foreach { leaf =>
      assert(leaf.listFiles().count(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet")) === 1)
    }
    val got = spark.read.parquet(dir).selectExpr("id", "CAST(p AS LONG)")
      .as[(Long, Long)].collect().toSet
    assert(got === df.as[(Long, Long)].collect().toSet)
  }
}
