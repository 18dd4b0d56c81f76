package graft

import org.apache.spark.sql.functions._

import graft.operators.Expectations
import graft.operators.Expectations._

class ExpectationsSpec extends SparkSuite {
  import spark.implicits._

  test("report evaluates all checks in one pass with correct verdicts") {
    val df = Seq(
      (1L, "alpha", 10),
      (2L, "beta", 20),
      (3L, null.asInstanceOf[String], 30),
      (3L, "gamma", 400)
    ).toDF("id", "name", "score")

    val rep = Expectations.report(df, Seq(
      neverNull("name"),          // 1 null -> fail
      unique("id"),               // id 3 twice -> fail
      minAtLeast("score", 5),     // min 10 -> pass
      maxAtMost("score", 100),    // max 400 -> fail
      distinctAtMost("id", 10),   // 3 distinct -> pass
      fractionWhere("score_pos", $"score" > 0, "==", 1.0) // pass
    )).collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(4))).toMap

    assert(rep("name_never_null") === ((1.0, false)))
    assert(rep("id_unique") === ((1.0, false)))
    assert(rep("score_min") === ((10.0, true)))
    assert(rep("score_max") === ((400.0, false)))
    assert(rep("id_cardinality") === ((3.0, true)))
    assert(rep("score_pos") === ((1.0, true)))
  }

  test("report is a single aggregation pass (one Aggregate in the plan)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val rep = Expectations.report(df, Seq(neverNull("name"), unique("id"), distinctAtMost("id", 5)))
    // adding checks must not add scans: the optimized plan reads the
    // relation exactly once however many checks are declared
    val scans = rep.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case r if r.getClass.getSimpleName.contains("Relation") => r
    }
    assert(scans.size === 1, rep.queryExecution.optimizedPlan.toString)
  }

  test("invalid op is rejected at construction") {
    intercept[IllegalArgumentException] {
      Check("bad", count(lit(1)).cast("double"), "!=", 0.0)
    }
  }

  test("all-NULL column on a NON-empty frame: verdict is NULL (unknown), not true") {
    val df = Seq((1L, null.asInstanceOf[java.lang.Long]), (2L, null.asInstanceOf[java.lang.Long]))
      .toDF("id", "score")
    val row = Expectations.report(df, Seq(minAtLeast("score", 5)))
      .collect().head
    assert(row.isNullAt(1)) // metric: min over all-NULL is NULL
    assert(row.isNullAt(4), "NULL metric must not silently pass the gate")
  }

  test("empty input: all constraints hold vacuously, NULL metrics preserved") {
    val df = Seq.empty[(Long, String)].toDF("id", "name")
    val rows = Expectations.report(df,
      Seq(neverNull("name"), unique("id"), minAtLeast("id", 5))).collect()
    assert(rows.forall(_.getBoolean(4)), rows.mkString("; "))
    // count-based metric is 0 (non-null); sum/min over empty stay NULL
    assert(rows.find(_.getString(0) == "id_unique").get.getDouble(1) === 0.0)
    assert(rows.find(_.getString(0) == "id_min").get.isNullAt(1))
  }
}
