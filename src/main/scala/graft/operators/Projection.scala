package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Johnson–Lindenstrauss random projection — the standard
  * dimensionality-reduction step in front of ANN / clustering at
  * scale (reduce 64-d embeddings to 16-d before the quadratic-ish
  * stages; Achlioptas 2003 shows ±1 sign matrices satisfy the JL
  * lemma).
  *
  * The sign matrix is DETERMINISTIC — sign(i, j) from the md5 of
  * "i_j" — so the projection is a pure function of the input (same
  * contract as every other sampling/splitting decision in this
  * library: reproducible across runs, engines, and partitionings; the
  * DuckDB oracle recomputes the identical matrix in SQL).
  *
  * Scale shape: the matrix is dIn×dOut literals baked into the plan
  * at COMPILE time (no join, no broadcast, no shuffle) and each output
  * coordinate is one codegen'd `graft_dot` against a literal sign
  * vector — a map-only projection over the corpus, embarrassingly
  * parallel at any scale.
  */
object Projection {

  /** ±1 sign matrix [dOut][dIn]: +1 iff the first hex digit of
    * md5("i_j") is < '8' (balanced for uniform hex). Computed
    * driver-side once; value-identical to the SQL `md5(concat(i, '_',
    * j))` formulation in Spark and DuckDB.
    */
  def jlSigns(dIn: Int, dOut: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dOut, dIn) { (j, i) =>
      val hex = md.digest(s"${i}_${j}".getBytes("UTF-8"))
      md.reset()
      // first hex digit < '8'  ⇔  high nibble of byte 0 < 8
      if (((hex(0) >> 4) & 0xF) < 8) 1.0 else -1.0
    }
  }

  /** Project `vecCol` (array<float|double>, length dIn) to dOut
    * coordinates, long form: (idCol, j, p) with p = dot(v, signs_j) ·
    * 1/√dOut, rounded to 6dp. Left-to-right fold order via
    * [[VectorFunctions.dot]] (codegen'd), matching the oracle's
    * `list_sum(list_transform(...))`.
    */
  def randomProject(emb: DataFrame, vecCol: String, idCol: String,
      dIn: Int, dOut: Int): DataFrame = {
    val signs = jlSigns(dIn, dOut)
    val scale = 1.0 / math.sqrt(dOut.toDouble)
    val v: Column = VectorFunctions.toDouble(col(vecCol))
    val proj = array((0 until dOut).map(j =>
      VectorFunctions.dot(v, typedLit(signs(j)))): _*)
    emb.select(col(idCol), posexplode(proj).as(Seq("j", "p")))
      .select(col(idCol), col("j").cast("int").as("j"),
        round(col("p") * scale, 6).as("p"))
  }
}
