package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic per-column dataset profiling (SURVEY.md §2.8 — the
  * "describe the corpus snapshot" companion to
  * [[Expectations]]: expectations assert, the profile measures).
  *
  * One row per column of the input schema: null count, exact distinct
  * count, min/max rendered as strings so heterogeneous column types
  * fit one report schema. Schema-driven — the aggregate list is built
  * from `df.schema`, so any frame profiles without per-table code.
  *
  * 100 TB shape: one `agg` call over the frame. The exact
  * `countDistinct` columns make Catalyst plan an Expand (one
  * duplicated stream per distinct aggregate) — the honest cost of
  * EXACT cardinalities; a production profile at 100 TB would swap
  * them for `approx_count_distinct` (one pass, no Expand) at the
  * price of oracle-exactness. Everything else (nulls, min, max,
  * count) rides the same single scan with map-side partial
  * aggregation.
  */
object Profiling {

  /** Profile every column of `df`; min/max are computed on the native
    * type (so numeric columns order numerically) and cast to string
    * only for display.
    */
  def columnProfile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "cannot profile a zero-column frame")
    require(fields.map(_.name).distinct.length == fields.length,
      s"cannot profile a frame with duplicate column names: ${fields.map(_.name).mkString(", ")}")
    // backtick-quote so dotted column names ("a.b") resolve as columns,
    // not nested-field paths
    def c(name: String) = col(s"`$name`")
    val aggs = fields.flatMap { f =>
      Seq(
        coalesce(sum(when(c(f.name).isNull, 1).otherwise(0)), lit(0)).cast("long").as(s"${f.name}__nulls"),
        countDistinct(c(f.name)).as(s"${f.name}__distinct"),
        min(c(f.name)).cast("string").as(s"${f.name}__min"),
        max(c(f.name)).cast("string").as(s"${f.name}__max"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.drop(1): _*)
    val rows = fields.map { f =>
      struct(
        lit(f.name).as("column"),
        lit(f.dataType.simpleString).as("data_type"),
        col("__n").as("n_rows"),
        c(s"${f.name}__nulls").as("n_nulls"),
        c(s"${f.name}__distinct").as("n_distinct"),
        c(s"${f.name}__min").as("min_value"),
        c(s"${f.name}__max").as("max_value"))
    }
    one.select(explode(array(rows.toIndexedSeq: _*)).as("r"))
      .select(col("r.column"), col("r.data_type"), col("r.n_rows"), col("r.n_nulls"),
        col("r.n_distinct"), col("r.min_value"), col("r.max_value"))
      .orderBy(col("column"))
  }
}
