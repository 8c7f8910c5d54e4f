package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, document fingerprinting.
  *
  * All operators are pure column expressions (whole-stage codegen, no UDFs)
  * and all hashing is md5-based so results are engine-portable (a SQL oracle
  * can reproduce them bit-for-bit). At 100 TB these are embarrassingly
  * parallel map-side transforms: no shuffle, pushdown-friendly.
  */
object TextOps {

  /** Whitespace tokens of a trimmed text column. */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** BPE-ish subword-oriented token count: runs of letters, runs of digits,
    * or single non-alphanumeric marks — the shape a byte-pair tokenizer's
    * pre-tokenizer uses.
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))

  /** Per-document token statistics: whitespace tokens, regex tokens,
    * chars-per-token ratio.
    */
  def tokenStats(df: DataFrame, textCol: String, idCols: Seq[String]): DataFrame = {
    val t = col(textCol)
    df.select(
      idCols.map(col) ++ Seq(
        length(t).cast("long").as("n_chars"),
        size(tokens(t)).cast("long").as("n_tokens_ws"),
        regexTokenCount(t).cast("long").as("n_tokens_re"),
        round(length(t).cast("double") / size(tokens(t)), 4).as("chars_per_token")): _*)
  }

  /** English stopwords used by the quality score and language ID. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "in", "to", "is", "for", "on", "with")

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic. Deterministic and tiny by design — real pipelines plug in a
    * fastText-style model via [[Multimodal.extractFeatures]]; the heuristic is the
    * engine-native fallback.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> EnglishStopwords,
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los"),
    "fr" -> Seq("le", "les", "et", "une", "dans", "est", "pour"),
    "zh" -> Seq("的", "是", "不", "我", "在", "了", "有"))

  /** Number of tokens of `toks` that appear in `words`. */
  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => words.map(w => t === lit(w)).reduce(_ || _)))

  /** Predicted language: arg-max of marker-word hit counts; ties break to the
    * lexicographically larger language code (max over (score, lang) pairs —
    * deterministic and replicable in plain SQL).
    */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = LangMarkers.map { case (lang, words) =>
      struct(hitCount(toks, words).as("score"), lit(lang).as("lang"))
    }
    greatest(scored: _*).getField("lang")
  }

  /** Heuristic quality signals + a composite score in [0,1]:
    * word-count saturation, alphabetic ratio, stopword ratio, punctuation
    * penalty. Formula is arbitrary but fixed; each signal is also exposed.
    */
  def qualitySignals(df: DataFrame, textCol: String, idCols: Seq[String]): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nChars = length(t).cast("double")
    val nWords = size(toks).cast("double")
    val nAlpha = length(regexp_replace(t, "[^A-Za-z]", "")).cast("double")
    val nPunct = length(regexp_replace(t, "[^.,!?;:]", "")).cast("double")
    val nStop = hitCount(tokens(lower(t)), EnglishStopwords).cast("double")
    val wordSat = least(nWords / lit(64.0), lit(1.0))
    // The composite score combines the ROUNDED ratios: raw ratio doubles
    // can differ by one ulp across engines, flipping the rounded score on
    // boundary rows (observed at sf0.1). With 4-dp inputs and 1-digit
    // weights the weighted sum is a TRUE 5-dp decimal, so it rounds at 5
    // decimals — the value lands exactly on the grid, never halfway, and
    // every engine's rounding mechanism recovers the same digits.
    val alphaRatio = round(nAlpha / greatest(nChars, lit(1.0)), 4)
    val stopRatio = round(nStop / greatest(nWords, lit(1.0)), 4)
    val punctRatio = round(nPunct / greatest(nChars, lit(1.0)), 4)
    df.select(
      idCols.map(col) ++ Seq(
        nWords.cast("long").as("n_words"),
        alphaRatio.as("alpha_ratio"),
        stopRatio.as("stopword_ratio"),
        punctRatio.as("punct_ratio"),
        round(
          lit(0.4) * round(wordSat, 4) + lit(0.3) * alphaRatio +
            lit(0.2) * least(stopRatio * 4, lit(1.0)) +
            lit(0.1) * (lit(1.0) - least(punctRatio * 10, lit(1.0))),
          5).as("quality_score")): _*)
  }

  /** Order/duplication-insensitive content fingerprint: md5 of the sorted
    * distinct token set. Near-identical docs that differ only in token order
    * or repetition collide — the classic "fingerprint dedup" key.
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Bottom-k sketch of character k-gram hashes (a winnowing-style rolling
    * fingerprint): the `sketchSize` smallest md5s of all `k`-char shingles,
    * joined with '|'. Docs sharing most low-order shingle hashes get equal or
    * near-equal sketches.
    */
  def shingleSketch(text: Column, k: Int = 8, sketchSize: Int = 4): Column = {
    val grams = transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => md5(text.substr(i, lit(k))))
    array_join(slice(array_sort(grams), 1, sketchSize), "|")
  }
}
