package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline
  * (SURVEY.md §2.8): tokenization, character shingles, quality
  * signals, language-ID heuristic, document fingerprints.
  *
  * All built-in expressions — codegen'd, distributable, no UDFs.
  */
object TextFunctions {

  /** Whitespace tokenization (the fixture `documents.text` is
    * space-separated word soup).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish token counting: alnum runs, the cross-engine-stable
    * approximation of a subword tokenizer's pre-tokenizer.
    * Takes a column NAME (SQL form — regexp_extract_all has no Scala
    * DSL binding).
    */
  def regexTokenCount(textCol: String): Column =
    size(expr(s"regexp_extract_all($textCol, '[A-Za-z0-9]+', 0)"))

  /** Character n-grams (NOT deduplicated — the LM score needs the
    * multiplicity) via the codegen'd [[CharNgrams]] expression: one
    * char→byte offset pass + zero-copy gram views per row, vs the
    * interpreted higher-order formulation that re-scans the string per
    * substring call (value-identity spec-asserted by CharNgramsSpec).
    */
  def charNgramsExpr(textCol: String, n: Int): Column =
    call_function("graft_char_ngrams", col(textCol), lit(n))

  /** The interpreted higher-order formulation of [[charNgramsExpr]] —
    * retained as the value-identity oracle for CharNgramsSpec (and a
    * pure-built-in fallback for sessions without graft extensions).
    */
  def charNgramsHigherOrder(textCol: String, n: Int): Column =
    expr(s"CASE WHEN length($textCol) < $n THEN CAST(array() AS array<string>) " +
      s"ELSE transform(sequence(1, length($textCol) - ${n - 1}), i -> substring($textCol, i, $n)) END")

  /** Character n-gram shingles (default trigrams) over a text column
    * name, deduplicated, guarded for texts shorter than n.
    */
  def shinglesExpr(textCol: String, n: Int = 3): Column =
    array_distinct(charNgramsExpr(textCol, n))

  /** WORD n-grams (space-joined, NOT deduplicated — repetition
    * filters need the multiplicity) over a text column name; empty
    * array for texts with fewer than n words. The unit of the
    * repetition and benchmark-decontamination filters.
    *
    * Built on the codegen'd [[WordNgrams]] expression: one split and
    * one primitive loop per row inside whole-stage codegen, vs the
    * interpreted higher-order `transform(sequence(...), i ->
    * concat_ws(' ', slice(split(...), i, n)))` formulation, which
    * re-splits the text per CASE reference and allocates a closure +
    * slice array per gram. Value-identity with that formulation
    * (empty string, size < n, trailing/repeated separators) is
    * asserted by WordNgramsSpec.
    */
  def wordNgramsExpr(textCol: String, n: Int): Column =
    call_function("graft_word_ngrams", col(textCol), lit(n))

  /** The interpreted higher-order formulation of [[wordNgramsExpr]] —
    * retained as the value-identity oracle for WordNgramsSpec (and a
    * pure-built-in fallback for sessions without graft extensions).
    */
  def wordNgramsHigherOrder(textCol: String, n: Int): Column =
    expr(s"CASE WHEN size(split($textCol, ' ')) < $n THEN CAST(array() AS array<string>) " +
      s"ELSE transform(sequence(1, size(split($textCol, ' ')) - ${n - 1}), " +
      s"i -> concat_ws(' ', slice(split($textCol, ' '), i, $n))) END")

  /** Jaccard similarity between two (deduplicated) string-array sets.
    * |A∩B| via the codegen'd [[ArrayIntersectCount]] (no result-array
    * allocation); |A∪B| as |A|+|B|−|A∩B| (no union materialization).
    * Values identical to the array_intersect/array_union formulation
    * for set-valued inputs (spec-asserted).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = call_function("graft_intersect_count", a, b)
    inter.cast("double") / (size(a) + size(b) - inter).cast("double")
  }

  val stopwordsByLang: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "nicht"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour"))

  /** Count of distinct words from `dict` present in the token array
    * (codegen'd; same value as size(array_intersect(words, dict))).
    */
  def stopwordHits(words: Column, dict: Seq[String]): Column =
    call_function("graft_intersect_count", words, array(dict.map(lit): _*))

  /** n-gram/stopword language-ID heuristic: argmax of per-language
    * stopword hit counts; 'und' (undetermined) when no list scores.
    * A real system would use character-n-gram profiles; the structure
    * (per-language score columns → greatest → case) is the same.
    */
  def langId(words: Column): Column = {
    val scored = stopwordsByLang.toSeq.sortBy(_._1)
      .map { case (lang, dict) => (lang, stopwordHits(words, dict)) }
    val best = greatest(scored.map(_._2): _*)
    scored.foldLeft(when(best <= 0, "und")) { case (acc, (lang, score)) =>
      acc.when(score === best, lang)
    }.otherwise("und")
  }

  /** Quality score in [0,1]: length signal × (1 − stopword ratio).
    * Mirrors the length/punct/stopword-ratio family of heuristic
    * quality filters used on web-scale corpora.
    */
  def qualityScore(text: Column): Column = {
    val words = tokens(text)
    val nWords = size(words).cast("double")
    val stopRatio = stopwordHits(words, stopwordsByLang("en")).cast("double") / nWords
    round(least(lit(1.0), nWords / 100.0) * (lit(1.0) - stopRatio), 6)
  }

  /** Order-insensitive bag fingerprint: hash of the sorted distinct
    * token set. Two docs with the same vocabulary collide — the cheap
    * canonical-form dedup key.
    */
  def bagFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** 64-bit SimHash over whitespace tokens, built from per-token
    * xxhash64 bit votes. Returned as a Long column. Tokens are
    * weighted equally; near-duplicate docs differ in few bits
    * (hamming distance), which is what the LSH banding in
    * [[graft.operators.Dedup]] exploits.
    */
  def simhashBitVote(wordHash: Column, bit: Int): Column =
    when(shiftright(wordHash, bit).bitwiseAND(1) === 1, 1).otherwise(-1)
}
