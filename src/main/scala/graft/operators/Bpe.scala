package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Cuts.CutOps

/** Distributed byte-pair-encoding tokenizer training — the
  * vocabulary-learning step of an LLM data pipeline (the Sennrich
  * et al. 2016 subword-NMT shape; reference pipeline has no tokenizer
  * stage — `weather-etl.py` delegates all text handling to SQL — so
  * this is part of the mandated training-data extension family).
  *
  * Scale shape: ONE corpus-sized pass builds the (word, freq) table;
  * every merge round after that touches only the distinct-word table,
  * which grows with vocabulary (Heaps' law, sublinear in corpus
  * bytes), not with the corpus — the property that makes BPE trainable
  * over 100 TB: the heavy explode+count shuffle happens once, and the
  * iterative part is bounded by vocabulary size regardless of how many
  * petabytes produced it. Each round is (1) an adjacent-pair count
  * built from `slice` + `zip_with` (codegen'd, no UDF), (2) a 1-row
  * TakeOrdered argmax with a deterministic tie-break (count desc, then
  * pair asc — bit-reproducible on any partitioning), and (3) the merge
  * applied to the symbol arrays. Step (3) is a sequential
  * left-to-right fold (adjacent-pair collapse is order-dependent, not
  * expressible with element-wise higher-order functions) and runs as a
  * Scala UDF — but only ever over the vocabulary-sized table, never
  * the corpus. `localCheckpoint(eager = false)` truncates lineage each
  * round so analysis cost stays O(1) in the round count (same pattern
  * as [[Components.connectedComponents]]); the checkpoint blocks
  * materialize under the next round's argmax action, one job per
  * round.
  */
object Bpe {

  /** Terminal end-of-word symbol (Sennrich-style): lets merges learn
    * suffixes ("er</w>") distinct from word-internal bigrams. */
  val EndOfWord = "</w>"

  /** One trained merge, rank 1 = first learned: adjacent (left, right)
    * collapse to left+right; `freq` is the corpus-weighted pair count
    * the round saw when it won the argmax. */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Left-to-right, non-overlapping application of one merge to a
    * symbol sequence: "aaa" under (a,a) → [aa, a], never [a, aa].
    * Pure; shared by the executor UDF and usable as a driver-side
    * encoder primitive. */
  def applyMerge(syms: Seq[String], left: String, right: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == left && syms(i + 1) == right) {
        out += left + right
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** Code-point symbolization of one word — the JVM-side twin of the
    * plan-side [[graft.functions.CharNgrams]] n=1 split (UTF8String
    * "chars" are code points), so trained merges and the encode loop
    * agree on what a base symbol is even for supplementary-plane text
    * (an emoji is ONE symbol, never a surrogate pair split in two). */
  def charSyms(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** The distinct-word working table: (syms: array<string> of
    * one-code-point symbols plus the [[EndOfWord]] terminal, freq:
    * corpus occurrence count). This is the single corpus-sized pass —
    * everything after it is vocabulary-sized. The char split reuses
    * the codegen'd [[graft.functions.CharNgrams]] with n=1, the same
    * code-point semantics as [[charSyms]]. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(
        concat(
          graft.functions.TextFunctions.charNgramsExpr("w", 1),
          array(lit(EndOfWord))).as("syms"),
        col("freq"))

  /** Train `numMerges` BPE merges over whitespace-tokenized `textCol`.
    * Stops early (returning fewer merges) if the vocabulary is fully
    * merged before the budget is spent. Deterministic on any
    * partitioning: the argmax orders by (count desc, left asc,
    * right asc), where string order is Spark's binary UTF-8 compare —
    * i.e. code-POINT order, which a JVM UTF-16 String compare only
    * matches when ties never pit a supplementary-plane symbol against
    * a BMP char above U+E000 (the spec corpora keep clear of that
    * edge). The returned list is merge-rank-ordered and tiny
    * (≤ numMerges rows on the driver — this is tokenizer metadata,
    * not data). */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var words = wordTable(docs, textCol).cut("Bpe.scala:108")
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      // adjacent symbol pairs: zip syms[0..n-2] with syms[1..n-1];
      // both slices have n-1 elements so zip_with never null-pads.
      // Fully-merged single-symbol words yield empty pair arrays and
      // drop out under explode.
      val adj = zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))
      val top = words
        .select(col("freq"), explode(adj).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        merges += Merge(merges.length + 1, l, r, top(0).getLong(2))
        val mergeOne = udf((s: Seq[String]) => applyMerge(s, l, r))
        words = words
          .select(mergeOne(col("syms")).as("syms"), col("freq"))
          .cut("Bpe.scala:135")
      }
    }
    merges.toSeq
  }

  /** Merge-pair → rank lookup, built ONCE per merge list — callers on
    * per-word hot paths ([[encodeStats]]'s UDF) hoist this out of the
    * loop instead of rebuilding it per word. */
  def rankIndex(merges: Seq[Merge]): Map[(String, String), Int] =
    merges.map(m => (m.left, m.right) -> m.rank).toMap

  /** Standard BPE encode of one word's symbols: repeatedly apply the
    * LOWEST-rank merge present among adjacent pairs until none
    * applies (the subword-nmt / tokenizers encode loop — not a single
    * rank-order pass, which can miss an early merge whose pair only
    * becomes adjacent after a later merge fires). */
  def segment(syms: Seq[String], merges: Seq[Merge]): Seq[String] =
    segmentByRank(syms, rankIndex(merges))

  /** [[segment]] with a pre-built [[rankIndex]]. */
  def segmentByRank(syms: Seq[String], rankOf: Map[(String, String), Int]): Seq[String] = {
    var s = syms
    var done = false
    while (!done) {
      val best = s.zip(s.drop(1))
        .flatMap(p => rankOf.get(p).map(r => (r, p)))
        .sortBy(_._1).headOption
      best match {
        case Some((_, (l, r))) => s = applyMerge(s, l, r)
        case None => done = true
      }
    }
    s
  }

  /** Corpus tokenization stats under trained merges, grouped by
    * `groupCol`: word count, subtoken count, subtokens/word and
    * chars/subtoken (the fertility / compression dials a tokenizer is
    * judged by).
    *
    * Scale shape: the encode loop (a per-word sequential UDF) runs
    * once per DISTINCT word, never per occurrence — the corpus-sized
    * token stream is first reduced to a (group, word, n_occ) table
    * (vocabulary × groups rows), and the encoded widths join back on
    * the word key. Both join sides are vocabulary-scale, so no
    * broadcast-size assumption is needed — a plain equi-join
    * co-partitions them even when the vocabulary itself is huge. */
  def encodeStats(docs: DataFrame, textCol: String, groupCol: String,
      merges: Seq[Merge]): DataFrame = {
    val rankOf = rankIndex(merges) // built once, serialized to executors
    val nSub = udf((w: String) =>
      segmentByRank(charSyms(w) :+ EndOfWord, rankOf).length)
    val tok = docs
      .select(col(groupCol).as("g"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    val perWord = tok.groupBy(col("g"), col("w")).agg(count(lit(1)).as("n_occ"))
    val wordSub = perWord.select(col("w")).distinct()
      .select(col("w"), nSub(col("w")).as("n_sub"),
        length(col("w")).cast("long").as("n_chars_w"))
    perWord.join(wordSub, "w")
      .groupBy(col("g").as(groupCol))
      .agg(sum(col("n_occ")).as("n_words"),
        sum(col("n_occ") * col("n_sub")).as("n_subtokens"),
        round(sum(col("n_occ") * col("n_sub")) / sum(col("n_occ")), 6)
          .as("subtok_per_word"),
        round(sum(col("n_occ") * col("n_chars_w")) /
          sum(col("n_occ") * col("n_sub")), 6).as("chars_per_subtok"))
      .orderBy(col(groupCol))
  }
}
