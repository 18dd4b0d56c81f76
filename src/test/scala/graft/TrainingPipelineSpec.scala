package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainingPipeline

class TrainingPipelineSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Tables.table(spark, sfDir, "documents")

  test("dedup is idempotent and keeps the smallest id per content") {
    val once = TrainingPipeline.dedupKeepMin(docs, "text", "doc_id")
    val twice = TrainingPipeline.dedupKeepMin(once, "text", "doc_id")
    assert(once.count() === twice.count())
    // winner per hash is min id
    val viaAgg = docs.groupBy(sha2($"text", 256)).agg(min($"doc_id").as("doc_id"))
    assert(once.select($"doc_id").exceptAll(viaAgg.select($"doc_id")).isEmpty)
  }

  test("sample decision survives repartition (pure function of id)") {
    val a = TrainingPipeline.sample(docs, "doc_id", 128)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val b = TrainingPipeline.sample(docs.repartition(13), "doc_id", 128)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a === b && a.nonEmpty && a.size < docs.count())
  }

  test("clean composition: stages drop monotonically, split covers all rows") {
    val gated = TrainingPipeline.qualityGate(docs, "text")
    val cleaned = TrainingPipeline.clean(docs, "text", "doc_id")
    assert(gated.count() <= docs.count())
    assert(cleaned.count() <= gated.count() && cleaned.count() > 0)
    assert(cleaned.filter(!$"split".isin("train", "val", "test")).isEmpty)
    // ~8/1/1 split of the sampled set
    val bySplit = cleaned.groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L))
  }
}
