package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSuite {
  import spark.implicits._

  test("salted join result == plain join result under heavy key skew") {
    // 90% of rows share one key — the pathological shuffle-join shape
    val big = spark.range(0, 20000)
      .select(when($"id" % 10 === 0, $"id" % 50).otherwise(lit(7L)).as("k"),
        $"id".as("payload"))
    val small = Seq.tabulate(50)(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val salted = SkewJoin.saltedJoin(big, small, "k", 8, xxhash64($"payload"))
    val plain = big.join(small, Seq("k"), "inner")
    assert(salted.count() === plain.count())
    assert(salted.select("k", "payload", "name")
      .except(plain.select("k", "payload", "name")).isEmpty)
  }

  test("salt spreads the hot key across partitions") {
    val big = spark.range(0, 1000).select(lit(7L).as("k"), $"id".as("payload"))
    val salts = big.select(pmod(xxhash64($"payload"), lit(8)).as("s"))
      .distinct().count()
    assert(salts === 8)
  }
}

class SqlSurfaceSpec extends SparkSuite {

  test("ad-hoc SQL over registered fixture views (README.md:62-78 analog)") {
    val df = Sql.adhoc(spark, sfDir,
      """SELECT c_mktsegment, count(*) AS n, sum(o_totalprice) AS total
         FROM customer JOIN orders ON c_custkey = o_custkey
         GROUP BY c_mktsegment ORDER BY n DESC""")
    assert(df.count() === 5)
    assert(df.columns.toSeq === Seq("c_mktsegment", "n", "total"))
  }

  test("ad-hoc SQL sees the same data as the programmatic API") {
    val viaSql = Sql.adhoc(spark, sfDir, "SELECT count(*) FROM lineitem")
      .collect().head.getLong(0)
    assert(viaSql === Tables.table(spark, sfDir, "lineitem").count())
  }

  test("CTE + window + set-op compose in one ad-hoc statement") {
    val df = Sql.adhoc(spark, sfDir,
      """WITH ranked AS (
           SELECT o_custkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) rn
           FROM orders)
         SELECT o_custkey FROM ranked WHERE rn = 1 AND o_totalprice > 400000
         INTERSECT
         SELECT c_custkey FROM customer""")
    assert(df.count() > 0)
  }
}
