package graft

import org.scalatest.funsuite.AnyFunSuite

/** Proves the library installs through the standard
  * SparkSessionExtensions path alone: `newSession()` starts a fresh
  * SessionState (temp functions from GraftFunctions.register do NOT
  * carry over), so everything resolving below comes from
  * [[GraftSparkExtensions]].
  */
class ExtensionsInstallSpec extends SparkSuite {

  private lazy val fresh = spark.newSession()

  test("injected functions resolve in a brand-new session via SQL") {
    val dot = fresh.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(dot === 11.0)
    val ic = fresh.sql(
      "SELECT graft_intersect_count(array('a','b','c'), array('b','c','d')) AS n")
      .collect()(0).getInt(0)
    assert(ic === 2)
    val sh = fresh.sql("SELECT graft_simhash(array('x','y')) AS h").collect()(0).getLong(0)
    assert(sh === graft.functions.SimHash64(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("x", "y"), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))).eval(null))
    val z = fresh.sql("SELECT graft_zorder(3L, 5L) AS z").collect()(0).getLong(0)
    assert(z === graft.functions.ZOrderKey.interleave(3L, 5L))
    val wn = fresh.sql("SELECT graft_word_ngrams('a b c', 2) AS g")
      .collect()(0).getSeq[String](0)
    assert(wn === Seq("a b", "b c"))
    val cn = fresh.sql("SELECT graft_char_ngrams('abcd', 3) AS g")
      .collect()(0).getSeq[String](0)
    assert(cn === Seq("abc", "bcd"))
    val adc = fresh.sql(
      "SELECT graft_adc(array(1, 0), array(array(1.0D, 2.0D), array(3.0D, 4.0D))) AS a")
      .collect()(0).getDouble(0)
    assert(adc === 2.0 + 3.0)
    val fi = fresh.sql(
      "SELECT graft_freq_items(w, 4).terms[0].term AS top FROM " +
      "(SELECT 'x' AS w UNION ALL SELECT 'x' UNION ALL SELECT 'y')")
      .collect()(0).getString(0)
    assert(fi === "x")
  }

  test("native aggregate and minhash resolve and run in SQL") {
    fresh.sql("SELECT 1 AS g, array(5L, 7L) AS sig UNION ALL SELECT 1, array(3L, 9L)")
      .createOrReplaceTempView("sigs")
    val merged = fresh.sql(
      "SELECT graft_minhash_union(sig) AS m FROM sigs GROUP BY g")
      .collect()(0).getSeq[Long](0)
    assert(merged === Seq(3L, 7L))
    val sig = fresh.sql("SELECT graft_minhash(array('a','b'), 4) AS s")
      .collect()(0).getSeq[Long](0)
    assert(sig.length === 4)
  }

  test("as-of strategy is injected into the planner") {
    assert(fresh.sessionState.planner.strategies.exists(_ eq graft.plans.AsOfStrategy) ||
      fresh.sessionState.experimentalMethods.extraStrategies.contains(graft.plans.AsOfStrategy) ||
      fresh.sessionState.planner.extraPlanningStrategies.contains(graft.plans.AsOfStrategy))
  }

  test("optimizer rewrite fires in a fresh session") {
    import fresh.implicits._
    val df = Seq((Seq("a", "b"), Seq("b", "c"))).toDF("x", "y")
      .selectExpr("size(array_intersect(x, y)) AS n")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_intersect_count") ||
      df.collect()(0).getInt(0) === 1)
  }
}
