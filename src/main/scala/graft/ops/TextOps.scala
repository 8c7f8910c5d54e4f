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

  /** Winnowing fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03): the set
    * of minimal k-gram hashes over every `w`-gram sliding window. Any
    * shared substring of length ≥ w+k-1 between two documents guarantees a
    * shared fingerprint — the positional guarantee the bottom-k
    * [[shingleSketch]] lacks. Output per doc: sorted distinct selected
    * hashes, '|'-joined, as column `winnow_fp`. Map-only.
    *
    * DataFrame-level on purpose: the gram array must be MATERIALIZED as a
    * column before the window pass — inlining it as a subexpression makes
    * the outer lambda re-evaluate all n md5s per window position
    * (observed: O(n²) → 75 s/500 docs instead of 0.3 s).
    */
  def winnowingFingerprint(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 8,
      w: Int = 4): DataFrame = {
    val t = col(textCol)
    // Par.spread: one md5 per character position — the heaviest per-row
    // map in TextOps; spread an under-partitioned input to cluster width
    Par.spread(df).select(
        col(idCol),
        transform(
          sequence(lit(1), greatest(length(t) - (k - 1), lit(1))),
          i => md5(t.substr(i, lit(k)))).as("__grams"))
      .select(
        col(idCol),
        array_join(
          array_sort(array_distinct(transform(
            sequence(lit(1), greatest(size(col("__grams")) - (w - 1), lit(1))),
            // min over the w-wide window as a direct least() of w lookups —
            // no per-position slice allocation; try_element_at so a
            // shorter-than-w gram list yields NULLs that least() skips
            i => least(
              (0 until w).map(d => try_element_at(col("__grams"), i + lit(d))): _*)))),
          "|").as("winnow_fp"))
  }

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

  /** Repetition signals (the Gopher-rules repetition family, adapted to
    * whitespace corpora): distinct-token ratio plus the most frequent word
    * bigram and the fraction of bigram slots it occupies. Highly repetitive
    * machine-generated text scores low on the first and high on the last.
    *
    * The distinct ratio is a pure column expression; the top bigram is an
    * explode + two-level aggregation — at 100 TB that is one shuffle keyed
    * by (doc, bigram) with map-side combine, then a per-doc max carried as
    * a (count, bigram) struct so no second wide shuffle or window sort is
    * needed. Ties break to the lexicographically larger bigram (max over
    * the struct) — deterministic and replicable in SQL.
    */
  def repetitionSignals(df: DataFrame, textCol: String, idCols: Seq[String]): DataFrame = {
    val toks = tokens(col(textCol))
    val base = df.select(
      idCols.map(col) ++ Seq(
        size(toks).cast("long").as("n_tokens"),
        round(size(array_distinct(toks)).cast("double") / size(toks), 4)
          .as("distinct_ratio"),
        // zip_with over two shifted slices, not per-index element_at —
        // same reasoning as Dedup.wordShingles (array walk vs interpreted
        // per-element ordinal resolution).
        when(size(toks) >= 2,
          zip_with(
            slice(toks, lit(1), size(toks) - 1),
            slice(toks, lit(2), size(toks) - 1),
            (a, b) => concat(a, lit(" "), b)))
          .otherwise(array().cast("array<string>"))
          .as("bigrams")): _*)
    val exploded = base.select(
      idCols.map(col) :+ explode(col("bigrams")).as("bigram"): _*)
    val top = exploded
      .groupBy(idCols.map(col) :+ col("bigram"): _*)
      .agg(count(lit(1)).as("cnt"))
      .groupBy(idCols.map(col): _*)
      .agg(max(struct(col("cnt"), col("bigram"))).as("top"))
      .select(
        idCols.map(col) ++ Seq(
          col("top.bigram").as("top_bigram"),
          col("top.cnt").as("top_bigram_cnt")): _*)
    base.drop("bigrams")
      .join(top, idCols, "left")
      .select(
        idCols.map(col) ++ Seq(
          col("n_tokens"),
          col("distinct_ratio"),
          col("top_bigram"),
          coalesce(col("top_bigram_cnt"), lit(0L)).as("top_bigram_cnt"),
          round(coalesce(col("top_bigram_cnt"), lit(0L)).cast("double") /
            greatest(col("n_tokens") - 1, lit(1L)), 4).as("top_bigram_ratio")): _*)
  }

  /** Duplicated n-gram coverage (the Gopher/MassiveText repetition rule
    * family): the fraction of a document's token positions covered by some
    * `n`-token gram that occurs MORE THAN ONCE in that document.
    * Overlapping duplicate grams count each position once (true interval
    * union, computed by exploding each duplicate gram occurrence into its
    * n positions and de-duplicating).
    *
    * 100 TB shape: two shuffles, both keyed by (doc, …) — (doc, gram)
    * occurrence counts with map-side combine, then distinct (doc, pos) for
    * the union — plus a per-doc count. Everything is doc-local, so
    * partition skew equals document-length skew.
    */
  def dupNgramCoverage(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int): DataFrame = {
    require(n >= 2, s"n=$n must be >= 2")
    val toks = tokens(col(textCol))
    val grams = when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => struct(i.as("p"), array_join(slice(toks, i + 1, lit(n)), " ").as("g"))))
      .otherwise(array().cast("array<struct<p:int,g:string>>"))
    // duplicated-gram set via groupBy (map-side combine), re-joined to the
    // occurrences on the same (doc, gram) key — co-partitioned, no window
    // sort — then exploded to covered positions and de-duplicated
    val gramRows = Par.spread(df).select(col(idCol), explode(grams).as("pg"))
      .select(col(idCol), col("pg.p").as("p"), col("pg.g").as("g"))
    val dupGrams = gramRows
      .groupBy(col(idCol), col("g"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") > 1)
      .select(col(idCol), col("g"))
    val dupPos = gramRows
      .join(dupGrams, Seq(idCol, "g"))
      .select(col(idCol), explode(sequence(col("p"), col("p") + (n - 1))).as("pos"))
      .distinct()
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_dup_pos"))
    df.select(col(idCol), size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(dupPos, Seq(idCol), "left")
      .select(
        col(idCol), col("n_tokens"),
        coalesce(col("n_dup_pos"), lit(0L)).as("n_dup_pos"),
        round(coalesce(col("n_dup_pos"), lit(0L)).cast("double") / col("n_tokens"), 4)
          .as("dup_coverage"))
  }

  /** CCNet-style text normalization for hashing/dedup keys: lowercase,
    * strip punctuation-class chars, collapse whitespace runs, trim. Pure
    * codegen'd column expression; the companion `normalizedHash` is the
    * dedup key the CCNet pipeline hashes after exactly this cleanup (so
    * case/punctuation variants of one sentence collide).
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[.,!?;:'\"()\\[\\]{}]", ""),
      " +", " "))

  def normalizedHash(text: Column): Column = md5(normalizeText(text))

  /** URL decomposition for provenance filtering: scheme, lowercased host
    * (port stripped), naive registered domain (last two host labels), tld,
    * path, and a normalized form (lowercased scheme+host, query/fragment
    * dropped, trailing slash trimmed) whose hash is the cross-crawl dedup
    * key. Pure regexp column expressions — map-only, no shuffle; patterns
    * avoid lookaround so Java regex and RE2-family engines agree.
    */
  def urlParts(df: DataFrame, urlCol: String, idCols: Seq[String]): DataFrame = {
    val u = col(urlCol)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = lower(regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1), ":[0-9]+$", ""))
    val path = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    df.select(
      idCols.map(col) ++ Seq(
        scheme.as("scheme"),
        host.as("host"),
        regexp_extract(host, "([a-z0-9-]+\\.[a-z0-9-]+)$", 1).as("domain"),
        regexp_extract(host, "\\.([a-z0-9-]+)$", 1).as("tld"),
        path.as("path"),
        concat(scheme, lit("://"), host, regexp_replace(path, "/$", ""))
          .as("norm_url")): _*)
  }

  /** Domain-blocklist predicate over [[urlParts]]-shaped rows: TRUE when
    * the registered domain is on the list. Broadcast-friendly by
    * construction — the list compiles into the predicate itself, so at any
    * scale this is a pushed-down filter, not a join. For list sizes beyond
    * what a predicate should hold, broadcast-join a blocklist table on
    * `domain` instead.
    */
  def domainBlocked(domain: Column, blocklist: Seq[String]): Column =
    domain.isInCollection(blocklist)

  /** Canonical URL for crawl-frontier / cross-crawl dedup — unlike
    * [[urlParts]]' `norm_url` (which drops the query entirely, collapsing
    * `?page=2` into `?page=3`), this KEEPS meaningful query params:
    * fragment stripped, scheme+host lowercased, default ports (:80/:443)
    * removed, trailing path slashes trimmed, tracking params
    * (`utm_*`, `gclid`, `fbclid`, `ref`) dropped, and the surviving
    * params SORTED so param order can't split one page into two keys.
    * Pure string/array column expressions (regex + HOF filter/sort) —
    * map-only, codegen'd, no shuffle; every step replays in any engine
    * with regex + list functions. Pair with md5 for the dedup key.
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val schemeHost = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val hostNorm = regexp_replace(lower(schemeHost), ":(80|443)$", "")
    val rest = noFrag.substr(length(schemeHost) + 1, length(noFrag))
    val qpos = instr(rest, "?")
    val path0 = when(qpos > 0, rest.substr(lit(1), qpos - 1)).otherwise(rest)
    val path = regexp_replace(path0, "/+$", "")
    val query0 = when(qpos > 0, rest.substr(qpos + 1, length(rest))).otherwise(lit(""))
    val kept = array_sort(filter(
      split(query0, "&"),
      p => !p.rlike("^(utm_[^=]*|gclid|fbclid|ref)=") && p =!= ""))
    val qstr = when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
      .otherwise(lit(""))
    concat(hostNorm, path, qstr)
  }

  /** Character-level Shannon entropy (bits/char) — the cheap noise/garbage
    * signal (binary spew and keyboard-mash score far from prose's ~4.1
    * bits): per document, the distinct characters, and
    * −Σ p(c)·log p(c) over them. Determinism: each character's term is
    * quantized to integer micro-nats and the terms summed exactly in
    * sorted-character order, then converted to bits with a hardcoded ln 2
    * — the [[bigramLmScore]] recipe, so partial-aggregation order can
    * never flip the 4-dp rounding.
    *
    * 100 TB shape: explode + two-level codegen aggregation. Spark's
    * higher-order array functions run INTERPRETED per element (measured
    * at sf0.1, cold JVMs: a map-only lambda formulation 12 s, a
    * run-length fold 6 s, this plan 3.06 s isolated / ~1.2 s in-suite —
    * bench_full.json q59), while the exploded (id, char) rows collapse to
    * ~alphabet-size per document in the map-side partial agg, so shuffle
    * volume is distinct-chars-per-doc, not corpus characters. The
    * identity H = ln n − (Σ c·ln c)/n lets each character's term round
    * to integer micro-nats without knowing the document length, keeping
    * the per-term-quantized exact-integer-sum determinism recipe in a
    * single aggregation chain.
    */
  def charEntropy(df: DataFrame, textCol: String, idCols: Seq[String]): DataFrame = {
    val cs = filter(split(col(textCol), ""), c => c =!= lit(""))
    val ids = idCols.map(col)
    val g1 = df.select(ids :+ explode(cs).as("__ch"): _*)
      .groupBy(ids :+ col("__ch"): _*).agg(count(lit(1)).as("c"))
    val g2 = g1.groupBy(ids: _*).agg(
      sum("c").as("n"),
      count(lit(1)).as("nd"),
      sum(round(col("c") * log(col("c")) * 1e6).cast("long")).as("s"))
    // quantize to integer MICRO-bits first, then 4-dp via sign-split
    // integer division — a raw round(double, 4) is the cross-engine
    // rounding-procedure boundary class that bit q47 at sf0.1; a micro-level
    // boundary only flips the 4-dp value if the micro int also sits exactly
    // on the division boundary (compound-improbable)
    val eMicro = round(
      (log(col("n")) - col("s").cast("double") / 1e6 / col("n")) /
        lit(0.6931471805599453) * 1e6).cast("long")
    df.select(ids: _*).join(g2, idCols, "left")
      .withColumn("__em", eMicro)
      .select(ids ++ Seq(
        coalesce(col("n"), lit(0L)).cast("long").as("n_chars"),
        coalesce(col("nd"), lit(0L)).cast("long").as("n_distinct"),
        coalesce(
          expr("CASE WHEN __em >= 0 THEN (2 * __em + 100) div 200" +
            " ELSE -((-2 * __em + 100) div 200) END") / 1e4,
          lit(0.0)).as("entropy_bits")): _*)
  }

  /** Corpus rollup statistics: doc count, token sum, and mean quality-proxy
    * (alpha ratio) at every level of (source, lang) — per pair, per source
    * subtotal, grand total (`ROLLUP`). The missing-level markers are
    * `__all__` so the result is engine-portable (NULL markers collide with
    * genuinely-NULL group values).
    *
    * 100 TB shape: Spark expands rollup into one aggregation with a
    * grouping-id column — a single shuffle with map-side combine, not one
    * job per level.
    */
  def corpusRollup(df: DataFrame, textCol: String, srcCol: String, langCol: String): DataFrame = {
    val t = col(textCol)
    // per-row ratio quantized to integer micros (scale-0 rounding of a
    // double is procedure-stable across engines), then the mean's 4-dp
    // rounding is pure integer math — same determinism recipe as
    // [[bigramLmScore]]; a naive round(avg(..), 4) is the boundary class
    // that bit q47 at sf0.1
    df.select(
        col(srcCol).as("src"), col(langCol).as("lng"),
        size(tokens(t)).cast("long").as("n_toks"),
        round(length(regexp_replace(t, "[^A-Za-z]", "")).cast("double") /
          greatest(length(t), lit(1)).cast("double") * 1e6).cast("long").as("ar_micro"))
      .rollup(col("src"), col("lng"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("ar_micro")).as("s_micro"))
      .select(
        coalesce(col("src"), lit("__all__")).as("source"),
        coalesce(col("lng"), lit("__all__")).as("lang"),
        col("n_docs"), col("n_tokens"),
        (expr("(s_micro * 2 + 100 * n_docs) div (200 * n_docs)") / 1e4)
          .as("mean_alpha_ratio"))
  }

  /** Token-distribution drift per group: KL(P_group ‖ P_corpus) over the
    * top-V global vocabulary, with all remaining tokens massed into an
    * `<other>` bucket so both distributions sum to 1 and the truncation is
    * principled (not a silent drop). The mixing/quality diagnostic that
    * flags a source whose language diverges from the corpus it feeds.
    *
    * Determinism: p, q, and p/q are single divides of exact integers; each
    * bucket's p·ln(p/q) term is quantized to integer micro-nats and summed
    * exactly; the 4-dp rounding of the (possibly slightly negative, from
    * per-term rounding) total is sign-split integer arithmetic — the
    * [[bigramLmScore]] recipe end to end.
    *
    * 100 TB shape: (group, token) counts with map-side combine; the global
    * vocabulary re-aggregates THOSE counts (never rescans the corpus); the
    * top-V rank is a distributed TakeOrdered, not a single-partition
    * window; top-V broadcasts onto the group counts. Everything after the
    * first count aggregation is vocabulary-sized, not corpus-sized.
    */
  def tokenKlDivergence(
      df: DataFrame,
      textCol: String,
      groupCol: String,
      topV: Int): DataFrame = {
    require(topV > 0, s"topV $topV must be positive")
    val toks = df.select(
      col(groupCol).as("grp"), explode(tokens(col(textCol))).as("tok"))
    val cg = toks.groupBy("grp", "tok").agg(count(lit(1)).as("c"))
    val ct = cg.groupBy("tok").agg(sum("c").as("c"))
    val top = ct.orderBy(col("c").desc, col("tok")).limit(topV)
      .select(col("tok"), lit(true).as("istop"))
    val cgb = cg.join(broadcast(top), Seq("tok"), "left")
      .withColumn("b", when(col("istop"), col("tok")).otherwise(lit("<other>")))
      .groupBy("grp", "b").agg(sum("c").as("c"))
    val cb = cgb.groupBy("b").agg(sum("c").as("cq"))
    val ng = cgb.groupBy("grp").agg(sum("c").as("n"))
    val nn = cb.agg(sum("cq").as("nt"))
    val s = cgb.join(cb, "b").join(ng, "grp").crossJoin(broadcast(nn))
      .withColumn("m", round(
        (col("c") / col("n")) *
          log((col("c") / col("n")) / (col("cq") / col("nt"))) * 1e6).cast("long"))
      .groupBy("grp").agg(sum("m").as("s"))
    s.join(ng, "grp").select(
      col("grp"),
      col("n").cast("long").as("n_tokens"),
      (expr("CASE WHEN s >= 0 THEN (2*s + 100) div 200" +
        " ELSE -((-2*s + 100) div 200) END") / 1e4).as("kl_nats"))
  }

  /** Per-group document-length percentiles (p50/p90/p99 of whitespace
    * token counts) — the profiling pass behind length-filter thresholds.
    * Spark's exact `percentile` and DuckDB's `quantile_cont` share the
    * linear-interpolation definition (rank = 1 + q·(n−1)), so results are
    * engine-exact on integer inputs. One shuffle keyed by the group with
    * map-side partial collection.
    */
  def lengthPercentiles(df: DataFrame, textCol: String, groupCol: String): DataFrame =
    df.select(col(groupCol).as("grp"), size(tokens(col(textCol))).cast("long").as("n"))
      .groupBy("grp")
      .agg(
        count(lit(1)).as("n_docs"),
        expr("percentile(n, 0.5)").as("p50_tokens"),
        expr("percentile(n, 0.9)").as("p90_tokens"),
        expr("percentile(n, 0.99)").as("p99_tokens"))

  /** Percentile-band length filter: keep documents whose token count lies
    * within their GROUP's [lo, hi] interpolated percentiles — the
    * data-driven form of fixed length bounds (a length that is normal for
    * one source can be an outlier for another). Returns every row with its
    * bounds and the keep verdict, so the filter is auditable.
    *
    * 100 TB shape: one groupBy computes the per-group percentile table
    * (group-cardinality rows), which broadcasts back onto the corpus —
    * the corpus itself never shuffles.
    */
  def lengthOutliers(
      df: DataFrame,
      textCol: String,
      idCol: String,
      groupCol: String,
      lo: Double,
      hi: Double): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"bad percentile band [$lo, $hi]")
    val base = df.select(
      col(idCol), col(groupCol).as("grp"),
      size(tokens(col(textCol))).cast("long").as("n_tokens"))
    val bounds = base.groupBy("grp").agg(
      expr(s"percentile(n_tokens, $lo)").as("lo_tokens"),
      expr(s"percentile(n_tokens, $hi)").as("hi_tokens"))
    base.join(broadcast(bounds), "grp")
      .select(
        col(idCol), col("grp").as(groupCol), col("n_tokens"),
        col("lo_tokens"), col("hi_tokens"),
        (col("n_tokens") >= col("lo_tokens") &&
          col("n_tokens") <= col("hi_tokens")).as("keep"))
  }

  /** The Gopher document-quality rules (Rae et al. 2021, Table A1 — the
    * MassiveText filter), as per-rule booleans plus the conjunction:
    * word-count bounds, mean word length bounds, symbol-to-word ratio,
    * ellipsis-line ratio stand-in (ellipsis token ratio over word soup),
    * alphabetic-word ratio, and stopword presence. Map-only, no UDFs;
    * thresholds are the paper's.
    *
    * Words are WHITESPACE-RUN tokens (regex split, empties dropped), not
    * the single-space [[tokens]] — real crawled text has tabs, newlines
    * and repeated blanks, and a single-space split counts them as word
    * characters / phantom words, skewing docs near the 3.0/10.0 mean-len
    * and 0.8 alpha-ratio thresholds. Mean word length is exactly
    * Σ len(word) / words, computed codegen-friendly as
    * non-whitespace-chars / words.
    */
  def gopherRules(df: DataFrame, textCol: String, idCols: Seq[String]): DataFrame = {
    val t = col(textCol)
    val toks = filter(split(t, "\\s+"), w => w =!= "")
    val nWords = size(toks).cast("double")
    val meanLen = length(regexp_replace(t, "\\s+", "")).cast("double") / nWords
    val nSymbol = size(filter(toks, w => w.rlike("^[#\\.]+$"))).cast("double")
    val nEllipsis = size(filter(toks, w => w.endsWith("..."))).cast("double")
    val nAlphaWord = size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("double")
    val nStop = hitCount(filter(split(lower(t), "\\s+"), w => w =!= ""), EnglishStopwords)
    val rWords = nWords >= 50 && nWords <= 100000
    val rMeanLen = meanLen >= 3.0 && meanLen <= 10.0
    val rSymbol = nSymbol / nWords <= 0.1
    val rEllipsis = nEllipsis / nWords <= 0.3
    val rAlpha = nAlphaWord / nWords >= 0.8
    val rStop = nStop >= 2
    df.select(
      idCols.map(col) ++ Seq(
        rWords.as("ok_word_count"),
        rMeanLen.as("ok_mean_word_len"),
        rSymbol.as("ok_symbol_ratio"),
        rEllipsis.as("ok_ellipsis_ratio"),
        rAlpha.as("ok_alpha_words"),
        rStop.as("ok_stopwords"),
        (rWords && rMeanLen && rSymbol && rEllipsis && rAlpha && rStop).as("keep")): _*)
  }

  /** RE2-safe license / rights-marker patterns (word-bounded literal
    * alternations — no lookaround, so Java regex and RE2 engines agree).
    * Note `cc-by` also matches inside `cc-by-nc`; [[licenseSignals]]
    * resolves the class restrictive-first so the verdict is still right.
    */
  val PermissiveLicensePattern: String =
    "\\b(mit license|apache license|bsd license|creative commons|cc-by|public domain|unlicense)\\b"
  val RestrictiveLicensePattern: String =
    "\\b(all rights reserved|gnu general public license|gpl(v[0-9])?|proprietary|confidential|do not redistribute|cc-by-nc)\\b"

  /** License-contamination signals: per-document permissive/restrictive
    * rights-marker hits and a precedence-resolved `license_class`
    * (`restricted` > `permissive` > `none`) — the filter a
    * compliance-aware corpus build runs before training on crawled or
    * code-adjacent text. Map-only codegen regexes over the lowered text;
    * patterns are RE2-safe so a SQL oracle replays the decisions.
    */
  def licenseSignals(df: DataFrame, idCols: Seq[String], textCol: String): DataFrame = {
    val lt = lower(col(textCol))
    val perm = lt.rlike(PermissiveLicensePattern)
    val restr = lt.rlike(RestrictiveLicensePattern)
    df.select(idCols.map(col) ++ Seq(
      perm.as("has_permissive"),
      restr.as("has_restrictive"),
      when(restr, "restricted").when(perm, "permissive")
        .otherwise("none").as("license_class")): _*)
  }

  /** RE2-safe PII patterns (no backreferences/lookaround, so the same
    * pattern string runs identically under Java regex and RE2-family
    * engines — portability is what makes the redaction auditable with a
    * SQL oracle).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** PII scrub: per-doc email/phone match counts plus the text with both
    * replaced by `<EMAIL>` / `<PHONE>`. Map-only, codegen'd, no UDFs —
    * the 100 TB shape is a pure projection over the scan. Emails are
    * replaced before phones so a digit-run inside an address can't be
    * double-counted.
    */
  def redactPii(df: DataFrame, textCol: String, idCols: Seq[String]): DataFrame = {
    val t = col(textCol)
    val noEmail = regexp_replace(t, EmailPattern, "<EMAIL>")
    df.select(
      idCols.map(col) ++ Seq(
        size(regexp_extract_all(t, lit(EmailPattern), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(noEmail, lit(PhonePattern), lit(0))).cast("long").as("n_phones"),
        regexp_replace(noEmail, PhonePattern, "<PHONE>").as("redacted")): _*)
  }

  /** PII audit table — the extraction complement to [[redactPii]]: one
    * row per match, `(idCols..., kind, match, pos)` with `kind` ∈
    * email/phone and `pos` the 1-based match index within the doc for
    * that kind (matches are reported in document order). Redaction
    * destroys; this AUDITS — the row count per kind is the exposure
    * report, and the matches themselves feed an allow/deny review.
    * Emails are extracted from the raw text, phones from the
    * email-redacted text (same precedence rule as [[redactPii]], so the
    * two operators always agree on counts).
    *
    * 100 TB shape: map-only regexp_extract_all + posexplode — output is
    * match-sized, no shuffle.
    */
  def extractPii(df: DataFrame, textCol: String, idCols: Seq[String]): DataFrame = {
    val t = col(textCol)
    val noEmail = regexp_replace(t, EmailPattern, "<EMAIL>")
    val emails = df.select(idCols.map(col) :+
      posexplode(regexp_extract_all(t, lit(EmailPattern), lit(0)))
        .as(Seq("__p", "match")): _*)
      .withColumn("kind", lit("email"))
    val phones = df.select(idCols.map(col) :+
      posexplode(regexp_extract_all(noEmail, lit(PhonePattern), lit(0)))
        .as(Seq("__p", "match")): _*)
      .withColumn("kind", lit("phone"))
    emails.unionAll(phones)
      .select(idCols.map(col) ++ Seq(col("kind"), col("match"),
        (col("__p") + 1).cast("long").as("pos")): _*)
  }



  /** Segment-level boilerplate dedup (the CCNet/paragraph-hash recipe at
    * token-window granularity): each document is cut into consecutive
    * `segTokens`-token segments; a segment whose md5 appears in at least
    * `minDocFreq` DISTINCT documents is boilerplate. Output per document:
    * segment count, boilerplate count/ratio, and the md5 of the cleaned
    * text (boilerplate segments removed, order preserved).
    *
    * 100 TB shape: one shuffle for the (hash → distinct-doc-count)
    * aggregation (map-side combine over md5 keys, uniformly distributed by
    * construction); the surviving boilerplate-hash set — the "boilerplate
    * vocabulary", small by the nature of the threshold — broadcasts back
    * onto the exploded segments, so the corpus itself shuffles only once
    * more, keyed by doc id, for reassembly.
    */
  def segmentDedup(
      df: DataFrame,
      textCol: String,
      idCol: String,
      segTokens: Int,
      minDocFreq: Int): DataFrame = {
    require(segTokens > 0 && minDocFreq > 1, "segTokens > 0, minDocFreq > 1")
    val toks = tokens(col(textCol))
    val nSegs = greatest(ceil(size(toks).cast("double") / segTokens).cast("int"), lit(1))
    val segs = transform(
      sequence(lit(0), nSegs - 1),
      i => array_join(slice(toks, i * segTokens + 1, lit(segTokens)), " "))
    val base = df
      .select(col(idCol), posexplode(segs).as(Seq("pos", "seg")))
      .withColumn("h", md5(col("seg")))
    val boiler = base.select(col(idCol), col("h")).distinct()
      .groupBy("h").agg(count(lit(1)).as("df_docs"))
      .filter(col("df_docs") >= minDocFreq)
      .select(col("h"), lit(true).as("is_b"))
    base
      .join(broadcast(boiler), Seq("h"), "left")
      .withColumn("is_b", coalesce(col("is_b"), lit(false)))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("is_b"), 1L).otherwise(0L)).as("n_boilerplate"),
        // collect_list drops nulls, so only kept segments survive; the
        // struct sort restores document order before hashing
        md5(array_join(
          transform(
            array_sort(collect_list(when(!col("is_b"), struct(col("pos"), col("seg"))))),
            x => x.getField("seg")),
          " ")).as("cleaned_md5"))
      .withColumn("boilerplate_ratio",
        round(col("n_boilerplate").cast("double") / col("n_segments"), 4))
      .select(col(idCol), col("n_segments"), col("n_boilerplate"),
        col("boilerplate_ratio"), col("cleaned_md5"))
  }

  /** Corpus-trained bigram language-model score per document — the
    * perplexity-filter shape (CCNet's KenLM step) with the engine itself
    * as the LM trainer. The model is MLE over the corpus:
    * P(w2|w1) = C(w1 w2) / C(w1 ·), with C counted over bigram positions,
    * so every document bigram has positive probability (no smoothing
    * needed). Per document: bigram count, average log-probability, and
    * perplexity exp(-avg).
    *
    * Determinism contract: each bigram's log-probability is rounded to
    * integer MICROS before the per-document sum, so the aggregate is exact
    * integer arithmetic — association order can never flip a rounded
    * double (the one place a naive avg(ln(..)) differs across engines).
    *
    * 100 TB shape: counts are two map-side-combined aggregations keyed by
    * bigram/w1; scoring re-joins the exploded corpus to the counts on
    * those same keys — three shuffles total, all on uniformly-hashed text
    * keys, plus one per-doc aggregation. The count tables are vocabulary-
    * sized, not corpus-sized.
    */
  def bigramLmScore(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val pairs = when(size(toks) >= 2,
      zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("w1"), concat(a, lit(" "), b).as("bigram"))))
      .otherwise(array().cast("array<struct<w1:string,bigram:string>>"))
    val docBg = df.select(col(idCol), explode(pairs).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.bigram").as("bigram"))
    val cb = docBg.groupBy("bigram").agg(count(lit(1)).as("cb"))
    val cu = docBg.groupBy("w1").agg(count(lit(1)).as("cu"))
    val perDoc = docBg
      .join(cb, "bigram")
      .join(cu, "w1")
      .withColumn("lp_micro",
        round(log(col("cb").cast("double") / col("cu")) * 1e6).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_micro")).as("s_micro"))
    // The 4-dp rounding of avg = s/(1e6·n) is ITSELF integer arithmetic:
    // avg·1e4 = s/(100n), rounded half-away-from-zero via
    // (2·|s| + 100n) div (200n) on the negated (non-negative) sum — a
    // double `round()` here hits engine-specific rounding-procedure
    // disagreements on boundary values (observed at sf0.1). Perplexity
    // then takes exp of the already-rounded value so both engines
    // exponentiate the identical double.
    val r4 = -expr("(-s_micro * 2 + 100 * n_bigrams) div (200 * n_bigrams)")
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (r4 / 1e4).as("avg_logprob"),
        round(exp(-(r4 / 1e4)), 4).as("perplexity"))
  }

  /** TF-IDF keyword extraction: the `k` highest-scoring tokens per document,
    * tf-idf = (term count in doc) × ln(N / doc-freq), ties to the
    * lexicographically smaller token. Same determinism contract as the
    * bigram LM: the idf factor is rounded to integer MICROS before the
    * tf multiply, so scores are exact integers (`tfidf_micro`).
    *
    * 100 TB shape: per-doc term counts and corpus doc-freqs are two
    * map-side-combined aggregations keyed by (doc, token) / token; the
    * doc-freq table is vocabulary-sized and re-joins on the token key; the
    * final per-doc top-k sorts only each doc's DISTINCT terms. No
    * collect, no broadcast of anything corpus-sized.
    */
  def tfidfKeywords(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // scalar corpus size; over a parquet scan this is the count-star
    // metadata fast path (row-group stats, no data read)
    val nDocs = df.count()
    val termCounts = df
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = termCounts
      .groupBy("token")
      .agg(count(lit(1)).as("df_docs"))
      .withColumn("idf_micro",
        round(log(lit(nDocs.toDouble) / col("df_docs")) * 1e6).cast("long"))
    termCounts
      .join(docFreq, "token")
      .withColumn("tfidf_micro", col("tf") * col("idf_micro"))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col(idCol))
          .orderBy(col("tfidf_micro").desc, col("token"))))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("token"), col("tf"), col("tfidf_micro"))
  }

  /** Training-sequence packing layout (the GPT-style concat-then-chunk
    * recipe): documents concatenate in (group, id) order and chop into
    * fixed `seqTokens`-token sequences; each document's placement is its
    * starting sequence index and offset within it. Documents straddle
    * boundaries (`end_seq > start_seq`), exactly like the real
    * preprocessing — the output is the shuffle-free manifest a loader
    * needs to materialize packed sequences.
    *
    * 100 TB shape: one window cumsum per group (shuffle on the group key,
    * sort by id) — the packing decision itself; no data movement of the
    * text. Skew equals group size, so pack per source/shard, not globally.
    */
  def packSequences(
      df: DataFrame,
      textCol: String,
      idCol: String,
      groupCol: String,
      seqTokens: Int): DataFrame = {
    require(seqTokens > 0, s"seqTokens $seqTokens must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(
        col(groupCol), col(idCol),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("cum_end", sum(col("n_tokens")).over(w))
      .select(
        col(groupCol), col(idCol), col("n_tokens"),
        // integer div/mod throughout — a double division truncated back
        // to long is exact only by luck at large cumsums
        expr(s"(cum_end - n_tokens) div $seqTokens").as("start_seq"),
        expr(s"(cum_end - n_tokens) % $seqTokens").as("start_offset"),
        // last token of the doc lands in this sequence (empty docs stay
        // where they start)
        expr(s"greatest(cum_end - 1, cum_end - n_tokens) div $seqTokens").as("end_seq"))
  }

  /** Fixed-size token-window chunking with overlap — the RAG/embedding
    * prep step that turns documents into retrieval units (and the training
    * prep that bounds example length before packing). Chunk `i` covers
    * whitespace tokens `[i·stride, i·stride + chunkTokens)` with
    * `stride = chunkTokens - overlapTokens`; a document of `n` tokens
    * yields `max(1, ceil((n - overlapTokens) / stride))` chunks, so every
    * token is covered and consecutive chunks share `overlapTokens` tokens.
    * Output: (id, chunk_idx, chunk_text, n_tokens).
    *
    * 100 TB shape: map-only — tokens, a `sequence` explode, and an array
    * slice per chunk; no shuffle, no state. Chunk counts are bounded by
    * per-doc length, so output size is input size × (1 + overlap ratio).
    */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens $chunkTokens must be positive")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens $overlapTokens must be in [0, chunkTokens)")
    val stride = chunkTokens - overlapTokens
    val ws = tokens(coalesce(col(textCol), lit("")))
    val n = size(ws)
    val nChunks = when(n <= chunkTokens, lit(1L)).otherwise(
      ceil((n - overlapTokens).cast("double") / stride).cast("long"))
    df.select(col(idCol).as("id"), ws.as("__ws"), nChunks.as("__nc"))
      .select(col("id"), col("__ws"),
        explode(sequence(lit(0L), col("__nc") - 1)).as("chunk_idx"))
      .select(
        col("id"), col("chunk_idx"),
        array_join(slice(col("__ws"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(chunkTokens)), " ").as("chunk_text"),
        least(lit(chunkTokens.toLong),
          size(col("__ws")) - col("chunk_idx") * stride).cast("long").as("n_tokens"))
  }

  /** Encoding-quality signals — the mojibake/garbage detector a crawl
    * pipeline runs before any language or quality model (cf. CCNet /
    * ftfy-style cleanup): U+FFFD replacement characters (decode failures),
    * C0 control characters (binary leakage; tab/newline/CR excluded), and
    * UTF-8-read-as-Latin-1 mojibake lead bytes (Ã/Â/â followed by a
    * continuation-range character). `ascii_ratio` rounds per-row (ratio of
    * code points < 128). Map-only codegen regex counts; no shuffle.
    */
  def encodingQuality(df: DataFrame, idCols: Seq[String], textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    def cnt(pattern: String): Column =
      size(regexp_extract_all(t, lit(pattern), lit(0))).cast("long")
    df.select(
      idCols.map(col) ++ Seq(
        cnt("\ufffd").as("n_replacement"),
        cnt("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]").as("n_control"),
        cnt("[\u00c3\u00c2\u00e2][\u0080-\u00bf]").as("n_mojibake"),
        when(length(t) === 0, lit(1.0)).otherwise(
          round(cnt("[\\x00-\\x7F]").cast("double") / length(t), 4)).as("ascii_ratio")): _*)
  }

  /** Top-`k` tokens per group (vocabulary extraction): (group, rank, token,
    * cnt), rank 1 = most frequent, ties to the lexicographically smaller
    * token. Two aggregations — (group, token) counts with map-side combine,
    * then a per-group top-k window. The window sorts only the distinct
    * (group, token) pairs, already two aggregation levels smaller than the
    * corpus; groups are the partition key, so skew equals vocabulary skew,
    * not document skew.
    */
  def topTokens(df: DataFrame, textCol: String, groupCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(col(groupCol).as("grp"), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("grp"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("rank",
        row_number().over(
          Window.partitionBy(col("grp")).orderBy(col("cnt").desc, col("token"))))
      .filter(col("rank") <= k)
      .select(col("grp"), col("rank"), col("token"), col("cnt"))
  }

  /** Mixed-language (code-switch) detection: [[langId]] applied per
    * fixed-size token segment, aggregated per document — a document whose
    * segments disagree on language is boilerplate-stitched, machine-
    * translated-partial, or genuinely code-switched, and every downstream
    * monolingual filter mis-handles it. Returns
    * `(<idCol>, n_segments, n_langs, majority_lang, majority_share,
    * is_mixed)`; majority ties break toward the lexicographically larger
    * code (the [[langId]] rule, applied to (count, lang) pairs) and the
    * share is rounded to 4 dp.
    *
    * 100 TB shape: one segment explode (map-side), per-(doc, lang) counts
    * with map-side combine, one per-doc argmax aggregation — two doc-keyed
    * shuffles, no windows, nothing model-sized to broadcast.
    */
  def mixedLanguageSignals(
      df: DataFrame,
      idCol: String,
      textCol: String,
      segTokens: Int): DataFrame = {
    require(segTokens > 0, s"segTokens=$segTokens must be > 0")
    val toks = tokens(col(textCol))
    val nSegs = greatest(ceil(size(toks).cast("double") / segTokens).cast("int"), lit(1))
    val segs = transform(
      sequence(lit(0), nSegs - 1),
      i => array_join(slice(toks, i * segTokens + 1, lit(segTokens)), " "))
    val counts = df
      .select(col(idCol), explode(segs).as("__seg"))
      .withColumn("__lang", langId(col("__seg")))
      .groupBy(col(idCol), col("__lang"))
      .agg(count(lit(1)).as("__c"))
    counts.groupBy(col(idCol))
      .agg(
        sum(col("__c")).as("n_segments"),
        count(lit(1)).as("n_langs"),
        max(struct(col("__c"), col("__lang"))).as("__best"))
      .select(
        col(idCol),
        col("n_segments"),
        col("n_langs"),
        col("__best.__lang").as("majority_lang"),
        round(col("__best.__c").cast("double") / col("n_segments"), 4)
          .as("majority_share"),
        (col("n_langs") > 1L).as("is_mixed"))
  }

  /** PMI collocations: the top-k adjacent-token pairs by pointwise mutual
    * information, PMI = ln(P(w1w2) / (P(w1)·P(w2))) — the corpus-analysis
    * primitive behind phrase detection (word2vec's phrase pass), domain
    * drift checks, and tokenizer-merge candidates. `minCount` suppresses
    * the classic PMI low-frequency pathology (a pair seen once scores
    * absurdly high).
    *
    * Determinism contract: PMI is computed as the integer combination of
    * three SEPARATELY micro-floored logs —
    * floor6(ln(c12/Nb)) − floor6(ln(c1/N)) − floor6(ln(c2/N)) — each a
    * single IEEE double division of two longs. No c12·N²-style integer
    * products (which overflow Long at web scale), no compounded double
    * arithmetic whose ordering could differ across engines; ties in the
    * final top-k break on (w1, w2).
    *
    * 100 TB shape: two map-side-combined count aggregations (bigram and
    * unigram tables are vocabulary-sized), the unigram table broadcast
    * onto the bigram table twice, totals as broadcast one-row aggregates
    * of the count tables (never a third corpus pass), and a global
    * TakeOrdered for the top-k — nothing corpus-sized moves after the
    * two counts.
    */
  def pmiCollocations(
      df: DataFrame,
      textCol: String,
      minCount: Long = 5L,
      k: Int = 100): DataFrame = {
    require(minCount >= 1 && k >= 1, "minCount >= 1, k >= 1")
    val M = 1000000L
    val toks = tokens(col(textCol))
    val bigrams = when(size(toks) >= 2,
      zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val uc = df.select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    // Nb = ALL bigram positions (the filter must not bias P(w1w2))
    val bc0 = df.select(explode(bigrams).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint(true)
    val bc = bc0.filter(col("c12") >= minCount)
    val totals = uc.agg(sum(col("c")).as("n"))
      .crossJoin(bc0.agg(sum(col("c12")).as("nb")))
    def floor6(x: Column): Column = floor(log(x) * M).cast("long")
    bc
      .join(broadcast(uc.select(col("w").as("w1"), col("c").as("c1"))), Seq("w1"))
      .join(broadcast(uc.select(col("w").as("w2"), col("c").as("c2"))), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(
        col("w1"), col("w2"), col("c12").as("n_pair"),
        (floor6(col("c12").cast("double") / col("nb")) -
          floor6(col("c1").cast("double") / col("n")) -
          floor6(col("c2").cast("double") / col("n"))).as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Bootstrap quality classifier: a bernoulli naive-Bayes log-odds model
    * TRAINED IN-ENGINE from rule-labeled seed documents, then applied to
    * the whole corpus — the structural shape of the fasttext/CCNet quality
    * classifier step (label a seed set, fit a linear model over token
    * presence, score everything) with the engine itself as the trainer, so
    * the pipeline needs no external model artifact. `seedRule` is the
    * labeling heuristic (any boolean Column over the input row); the model
    * is Laplace-smoothed per-token presence log-odds over the top-`topV`
    * document-frequency tokens:
    *
    *   w(t)  = ln( ((df_pos+1)/(n_pos+2)) / ((df_neg+1)/(n_neg+2)) )
    *   prior = ln( (n_pos+1)/(n_neg+1) )
    *
    * Determinism contract (same recipe as [[bm25Scores]]): each weight and
    * the prior are floored to integer MICROS once; the per-document score
    * is then an exact integer sum over the document's DISTINCT vocab
    * tokens, so it replays bit-for-bit in any engine and aggregation
    * order. Returns `(<idCol>, n_vocab_tokens, score_micro, quality_pred)`
    * with quality_pred = score_micro > 0.
    *
    * 100 TB shape: one (doc, token) distinct shuffle, one token-keyed
    * count aggregation (map-side combined; label counts ride the same
    * pass as conditional sums), a global top-V TakeOrdered of the
    * vocabulary-sized count table, the ≤V-row weight table broadcast back
    * onto the (doc, token) pairs, and one per-doc sum. The corpus
    * shuffles twice (pairs + per-doc sum), both on uniform keys; the
    * model never exceeds V rows.
    */
  def nbQualityScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      seedRule: Column,
      topV: Int = 4096): DataFrame = {
    val M = 1000000L
    val labeled = df.select(
      col(idCol).as("__doc"),
      col(textCol).as("__text"),
      seedRule.cast("boolean").as("__good"))
    // consumed twice (model counts + scoring join): checkpoint so the
    // tokenize+distinct pipeline runs once
    val pairs = labeled
      .select(col("__doc"), col("__good"), explode(tokens(col("__text"))).as("__tok"))
      .distinct()
      .localCheckpoint(true)
    val totals = labeled.agg(
      sum(when(col("__good"), 1L).otherwise(0L)).as("__npos"),
      sum(when(col("__good"), 0L).otherwise(1L)).as("__nneg"))
    val tokCounts = pairs.groupBy(col("__tok"))
      .agg(
        count(lit(1)).as("__df"),
        sum(when(col("__good"), 1L).otherwise(0L)).as("__dfpos"))
      .orderBy(col("__df").desc, col("__tok"))
      .limit(topV)
    val weights = tokCounts.crossJoin(broadcast(totals))
      .withColumn("__w6",
        floor(log(
          ((col("__dfpos") + 1).cast("double") / (col("__npos") + 2)) /
            ((col("__df") - col("__dfpos") + 1).cast("double") / (col("__nneg") + 2))) * M)
          .cast("long"))
      .select(col("__tok"), col("__w6"))
    val prior = totals.select(
      floor(log((col("__npos") + 1).cast("double") / (col("__nneg") + 1)) * M)
        .cast("long").as("__prior6"))
    val docScores = pairs.join(broadcast(weights), Seq("__tok"))
      .groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_vocab_tokens"), sum(col("__w6")).as("__s6"))
    labeled.select(col("__doc"))
      .join(docScores, Seq("__doc"), "left")
      .crossJoin(broadcast(prior))
      .select(
        col("__doc").as(idCol),
        coalesce(col("n_vocab_tokens"), lit(0L)).as("n_vocab_tokens"),
        (coalesce(col("__s6"), lit(0L)) + col("__prior6")).as("score_micro"),
        ((coalesce(col("__s6"), lit(0L)) + col("__prior6")) > 0L).as("quality_pred"))
  }

  /** Okapi BM25 scoring of every document against a fixed query-term set —
    * the ranked-retrieval primitive a curation pipeline uses to pull
    * topic- or benchmark-adjacent documents out of a crawl (targeted
    * selection, retrieval-based decontamination). Standard BM25 with
    * k1 = `k1X100`/100, b = `bX100`/100 over lowercase whitespace tokens.
    *
    * Determinism contract (same recipe as [[bigramLmScore]] /
    * [[tfidfKeywords]]): the only real-valued step, idf = ln(1 + (N-df+½)/
    * (df+½)), is floored to integer MICROS per term; everything after — the
    * length normalization, the tf saturation ratio, the per-term
    * contribution, the final sum — is exact integer micro-unit arithmetic
    * with floor division, so scores replay bit-for-bit in any engine and
    * any aggregation order. Returns `(<idCol>, n_terms_hit, score_micro)`
    * for documents matching ≥1 query term.
    *
    * 100 TB shape: the token explode is filtered to the query vocabulary
    * BEFORE any shuffle, so only matching postings move — two small
    * aggregations (tf by (doc, term), df by term), a broadcast of the
    * ≤|terms|-row idf table, one join with the per-doc length table on the
    * doc key, and the final per-doc sum. Document lengths are a map-side
    * combined aggregate of the same scan; nothing corpus-sized is
    * broadcast or collected.
    */
  def bm25Scores(
      df: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      k1X100: Int = 120,
      bX100: Int = 75): DataFrame = {
    require(terms.nonEmpty, "bm25Scores needs at least one query term")
    require(k1X100 >= 0 && bX100 >= 0 && bX100 <= 100, "k1 >= 0, b in [0,1]")
    val M = 1000000L
    val toks = df.select(
      col(idCol).as("__doc"),
      explode(tokens(lower(col(textCol)))).as("__tok"))
    // per-doc length INCLUDING non-query tokens (the BM25 dl), map-side
    // combined; docs-count and total length ride the same aggregate
    val dl = toks.groupBy("__doc").agg(count(lit(1)).as("__dl"))
    val corpus = dl.agg(
      count(lit(1)).as("__n"),
      sum("__dl").as("__tot"))
    // postings pruned to the query vocabulary before the (doc, term) shuffle
    val tf = toks.filter(col("__tok").isin(terms: _*))
      .groupBy("__doc", "__tok")
      .agg(count(lit(1)).as("__tf"))
    val idf = tf.groupBy("__tok").agg(count(lit(1)).as("__df"))
      .crossJoin(broadcast(corpus))
      .withColumn("__idf6",
        floor(log(lit(1.0) +
          (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))) * M)
          .cast("long"))
      .select("__tok", "__idf6")
    tf.join(broadcast(idf), Seq("__tok"))
      .join(dl, Seq("__doc"))
      .crossJoin(broadcast(corpus.select(expr("__tot * 100 div __n").as("__avgdl100"))))
      // norm6 = (1 - b + b*dl/avgdl) in micros, exact: b*dl/avgdl =
      // (b*1e4 * dl*100) div avgdl100
      .withColumn("__norm6",
        lit((100L - bX100) * 10000L) +
          expr(s"(${bX100}L * 10000L * __dl * 100) div __avgdl100"))
      // denom6 = tf + k1*norm, in micros; tfterm6 = tf*(k1+1)/denom in micros
      .withColumn("__denom6",
        col("__tf") * M + expr(s"(${k1X100}L * 10000L * __norm6) div ${M}L"))
      .withColumn("__contrib6",
        expr(s"(__tf * ${(k1X100 + 100) * 10000L} * ${M}L div __denom6) * __idf6 div ${M}L"))
      .groupBy(col("__doc").as(idCol))
      .agg(
        count(lit(1)).as("n_terms_hit"),
        sum("__contrib6").as("score_micro"))
  }

  /** Distributed BPE merge learning (Sennrich et al. 2016): the first
    * `rounds` byte-pair merges a BPE tokenizer would learn from this
    * corpus, computed exactly. Classic formulation: collapse the corpus
    * to its WORD-FREQUENCY table first (vocabulary-sized, not
    * corpus-sized — the one explode happens once), represent each word as
    * delimiter-wrapped symbols (`<US>c<US><US>c<US>...` with U+001F as
    * the delimiter, initially characters), then per round: count
    * adjacent symbol pairs
    * weighted by word frequency, take the globally most frequent pair
    * (ties: lexicographically smaller pair — fully deterministic), and
    * merge it everywhere via a single literal string replace. The
    * left-to-right non-overlapping replace IS the greedy BPE fold
    * (`a a a` + merge (a,a) → `(aa) a`), and both Spark and any SQL
    * engine implement replace that way — so the whole procedure replays
    * engine-for-engine.
    *
    * Returns the merge table: (round, sym_a, sym_b, cnt) — the artifact a
    * tokenizer trainer consumes. The per-round top-1 is a driver-side
    * collect of ONE row (model-sized, like k-means centroids); everything
    * else is vocabulary-table work: one explode + count of the corpus up
    * front, then `rounds` × (map + map-side-combined pair count). The rep
    * table checkpoints per round so lineage stays flat.
    *
    * Assumes U+001F (ASCII unit separator) does not occur in the text —
    * true of any sanely cleaned corpus (encodingQuality counts C0
    * controls; strip first if unsure).
    */
  def bpeMerges(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds $rounds out of [1,64]")
    val S = "\u001f"
    val spark = df.sparkSession
    val words = df.select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    var rep = words.select(
      concat(lit(S), array_join(split(col("w"), ""), S + S), lit(S)).as("rep"),
      col("wc")).localCheckpoint(true)
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      val syms = split(col("rep").substr(lit(2), length(col("rep")) - 2), S + S)
      val top = rep.select(col("wc"), syms.as("sy"))
        .select(col("wc"),
          explode(zip_with(col("sy"), slice(col("sy"), lit(2), size(col("sy"))),
            (a, b) => struct(a.as("a"), b.as("b")))).as("pr"))
        .filter(col("pr.b").isNotNull)
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, a, b, c))
        rep = rep.select(
          regexp_replace(col("rep"),
            java.util.regex.Pattern.quote(S + a + S + S + b + S),
            java.util.regex.Matcher.quoteReplacement(S + a + b + S)).as("rep"),
          col("wc")).localCheckpoint(true)
      }
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      merges.toList.map(m => org.apache.spark.sql.Row(m._1, m._2, m._3, m._4)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("round", org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("sym_a", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("sym_b", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("cnt", org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Deterministic token-dropout augmentation: each token survives or
    * drops as a pure function of `(salt, doc id, 1-based position)` — an
    * md5 bucket in [0, 65536) against `floor(dropProb·65536)` — so the
    * "random" augmentation replays identically across engines, reruns,
    * and repartitions, and any augmented example can be audited back to
    * its decision. Re-salting gives independent augmentation epochs
    * (`salt = "epoch-2"`) without touching the data. Output:
    * `(ids..., aug_text, n_tokens, n_kept)`.
    *
    * 100 TB shape: map-only — one indexed `filter` HOF per row, no
    * shuffle, no rand() (Spark's `rand` is partition-seeded and NOT
    * replay-stable; this is the same md5-decision discipline as
    * [[graft.ops.Sampling]]).
    */
  def augmentDropout(
      df: DataFrame,
      idCols: Seq[String],
      textCol: String,
      dropProb: Double,
      salt: String): DataFrame = {
    require(dropProb >= 0.0 && dropProb < 1.0, s"dropProb $dropProb out of [0,1)")
    require(idCols.nonEmpty, "augmentDropout needs id columns for the decision key")
    val thresh = math.floor(dropProb * 65536).toLong
    val ws = tokens(col(textCol))
    val keyCols = lit(salt) +: idCols.map(col)
    val kept = filter(ws, (_, i) =>
      conv(substring(
        md5(concat_ws("|", (keyCols :+ (i + 1).cast("string")): _*)), 1, 4), 16, 10)
        .cast("long") >= thresh)
    df.select(idCols.map(col) ++ Seq(
      array_join(kept, " ").as("aug_text"),
      size(ws).cast("long").as("n_tokens"),
      size(kept).cast("long").as("n_kept")): _*)
  }

  /** Per-document out-of-vocabulary rate against the corpus's own top
    * `vocabSize` tokens — the pre-tokenizer-training signal for how well a
    * planned vocabulary covers each document (high OOV → the doc is
    * noise, another language, or the vocab is too small). Vocabulary
    * selection is exact and deterministic: global token counts, top
    * `vocabSize` by (count desc, token asc). Output per doc:
    * `(ids..., n_tokens, n_oov, oov_ratio)` with the ratio rounded to
    * 4 dp.
    *
    * 100 TB shape: vocabulary = one map-side-combined token-count shuffle
    * + a TakeOrdered top-k (never a global sort); the vocab table is
    * `vocabSize` rows by construction, so membership is a BROADCAST join
    * against the exploded corpus — the corpus's only shuffle is the
    * per-doc re-aggregation, keyed by the doc id.
    */
  def oovRate(
      df: DataFrame,
      idCols: Seq[String],
      textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize $vocabSize must be positive")
    val tok = df.select(explode(tokens(col(textCol))).as("token"))
    val vocab = tok.groupBy(col("token")).agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col("token").asc)
      .limit(vocabSize)
      .select(col("token"), lit(1).as("__in_vocab"))
    df.select(idCols.map(col) :+ explode(tokens(col(textCol))).as("token"): _*)
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(idCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ratio",
        round(col("n_oov").cast("double") / col("n_tokens"), 4))
  }

  /** Apply learned BPE merges ([[bpeMerges]] output: `(round, sym_a,
    * sym_b, cnt)`) to a corpus — the ENCODE half of the BPE pair: each
    * word char-splits into the same U+001F-delimited symbol
    * representation the learner used, then every merge is a literal
    * left-to-right non-overlapping replace in learned-round order (that
    * replace IS the greedy BPE fold — identical in any engine, which is
    * what makes the oracle replay exact). Output per row: ids,
    * `bpe_text` (all subword symbols joined by single spaces, word order
    * preserved) and `n_bpe_tokens`.
    *
    * 100 TB shape: the merge table is model-sized and collected ONCE into
    * plan literals — the corpus pass is map-only, no shuffle, no join.
    * Each merge is one literal `regexp_replace` inside a per-word
    * transform, so cost is O(merges × doc length) inside whole-stage
    * codegen. The merge count is capped at 64: past that an expression
    * tree stops being an engine — [[bpeEncodeLarge]] is the production
    * twin for real 32k–100k vocabs (broadcast rank map + min-rank merge
    * loop, same contract), and THIS operator is its cross-engine parity
    * oracle.
    */
  def bpeEncode(
      df: DataFrame,
      idCols: Seq[String],
      textCol: String,
      merges: DataFrame): DataFrame = {
    val S = "\u001f"
    val ms = merges.select(col("round"), col("sym_a"), col("sym_b"))
      .orderBy(col("round").asc)
      .collect()
      .map(r => (r.getString(1), r.getString(2)))
    require(ms.length <= 64, s"${ms.length} merges > 64: use a trie encoder for real vocabs")
    val enc: Column => Column = { w =>
      val rep0 = concat(lit(S), array_join(split(w, ""), S + S), lit(S))
      val repN = ms.foldLeft(rep0) { case (c, (a, b)) =>
        regexp_replace(c,
          lit(java.util.regex.Pattern.quote(S + a + S + S + b + S)),
          lit(java.util.regex.Matcher.quoteReplacement(S + a + b + S)))
      }
      split(repN.substr(lit(2), length(repN) - 2), S + S)
    }
    val words = filter(tokens(col(textCol)), w => length(w) > 0)
    val toks = flatten(transform(words, enc))
    df.select(idCols.map(col) :+ toks.as("__t"): _*)
      .select(idCols.map(col) :+
        array_join(col("__t"), " ").as("bpe_text") :+
        size(col("__t")).cast("long").as("n_bpe_tokens"): _*)
  }

  /** Large-vocab BPE encode — the production twin of [[bpeEncode]] that
    * lifts the 64-merge expression-tree cap to real 32k–100k tokenizer
    * vocabs. Same contract (ids, `bpe_text`, `n_bpe_tokens`), different
    * engine: the merge table becomes ONE broadcast `(sym_a, sym_b) →
    * rank` hash map and each word folds via the standard min-rank merge
    * loop (the GPT-2 `bpe()` algorithm): repeatedly find the
    * lowest-rank adjacent symbol pair present and merge ALL its
    * occurrences left-to-right non-overlapping, until no ranked pair
    * remains. Per-word cost is O(len²) hash lookups — INDEPENDENT of
    * vocab size, where the literal-replace path pays O(merges · len)
    * and dies as an expression tree past ~64 merges. Because that cost
    * is quadratic in the UNBROKEN token length, words over
    * `maxWordLen` code points are pre-segmented into maxWordLen-sized
    * chunks first (the byte-level pre-tokenization convention), so a
    * single pathological blob costs O(len · maxWordLen) total instead
    * of pinning a task for minutes.
    *
    * Why min-rank and not a longest-match trie: longest-match is
    * WordPiece semantics, a DIFFERENT tokenizer — it diverges from
    * merge-order BPE on e.g. merges [(a,b),(b,c)] over "abc". The
    * min-rank loop reproduces [[bpeEncode]]'s round-order literal
    * replace exactly on any table where a merge's operands cannot be
    * re-created by a LATER merge — true of tables learned by
    * [[bpeMerges]] (a symbol is born exactly once, at its own round)
    * and of every published tokenizer vocab; OpsSpec asserts the parity
    * on learned tables. [[bpeEncode]] (≤ 64 merges) stays the
    * cross-engine oracle: this path's per-word loop is not SQL-
    * expressible, so its correctness rides the parity property, q129's
    * oracle, and the synthetic-vocab property tests.
    *
    * 100 TB shape: map-only — no shuffle, no join; the model is one
    * broadcast of ~merges·32 B (a 100k vocab ≈ 3 MB, the k-means-
    * centroid pattern), and the corpus pass is one codegen'd projection
    * around a single Scala UDF call per row (the whole-array fold —
    * same seam discipline as [[graft.ops.Dedup]]'s Bloom membership).
    */
  def bpeEncodeLarge(
      df: DataFrame,
      idCols: Seq[String],
      textCol: String,
      merges: DataFrame,
      maxMerges: Int = 262144,
      maxWordLen: Int = 16384): DataFrame = {
    require(maxWordLen >= 2, s"maxWordLen $maxWordLen must be >= 2")
    val ms = merges.select(col("round"), col("sym_a"), col("sym_b"))
      .orderBy(col("round").asc)
      .collect()
      .map(r => (r.getString(1), r.getString(2)))
    require(ms.length <= maxMerges,
      s"${ms.length} merges > maxMerges $maxMerges")
    val pairByRank = ms
    val ranks: Map[(String, String), Int] =
      ms.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val bc = df.sparkSession.sparkContext.broadcast((pairByRank, ranks))
    def encodeWord(w: String): Seq[String] = {
      // code-point split — mirrors Spark's split(w, ""), which keeps
      // surrogate pairs whole (Java regex zero-width match advances by
      // code point)
      var syms = {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < w.length) {
          val n = Character.charCount(w.codePointAt(i))
          out += w.substring(i, i + n)
          i += n
        }
        out
      }
      val (byRank, rk) = bc.value
      var done = syms.length < 2
      while (!done) {
        var best = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = rk.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val (a, b) = byRank(best)
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              merged += a + b; j += 2
            } else { merged += syms(j); j += 1 }
          }
          syms = merged
          if (syms.length < 2) done = true
        }
      }
      syms.toSeq
    }
    // Pathological-token guard: the min-rank loop is O(L²) per unbroken
    // whitespace-free token, so one multi-megabyte run (minified JS,
    // base64 blob, CJK span) would pin an executor core for minutes.
    // Pre-segment any word longer than maxWordLen CODE POINTS into
    // maxWordLen-sized chunks before merging — the same move real
    // byte-level tokenizers make with their pre-tokenization regex
    // (merges never cross a pre-segment boundary). Real-language words
    // sit orders of magnitude under the default, so ordinary corpora
    // (and q306's oracle) are byte-identical; only the pathological
    // tail changes, from unbounded to O(L/maxWordLen · maxWordLen²).
    def preSegment(w: String): Seq[String] = {
      if (w.codePointCount(0, w.length) <= maxWordLen) Seq(w)
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < w.length) {
          // Bounded lookahead: count code points only inside the next
          // 2*maxWordLen chars (a surrogate pair is 2 chars per code
          // point, so maxWordLen code points fit in ≤ 2*maxWordLen
          // chars) — counting to end-of-string each iteration would be
          // O(L²/maxWordLen) char reads over the whole word, eroding
          // the very bound this guard exists to enforce.
          val horizon = math.min(w.length, i + 2 * maxWordLen)
          val cps = w.codePointCount(i, horizon)
          val j = w.offsetByCodePoints(i, math.min(maxWordLen, cps))
          out += w.substring(i, j)
          i = j
        }
        out.toSeq
      }
    }
    val enc = udf { ws: Seq[String] =>
      if (ws == null) Seq.empty[String]
      else ws.iterator.filter(w => w != null && w.nonEmpty)
        .flatMap(preSegment).flatMap(encodeWord).toSeq
    }
    val words = filter(tokens(col(textCol)), w => length(w) > 0)
    df.select(idCols.map(col) :+ enc(words).as("__t"): _*)
      .select(idCols.map(col) :+
        array_join(col("__t"), " ").as("bpe_text") :+
        size(col("__t")).cast("long").as("n_bpe_tokens"): _*)
  }

  /** Content-defined chunking (the Gear/FastCDC family's core rule, at
    * token granularity): a chunk boundary falls AFTER token `i` iff the
    * md5 of the trailing `window`-token gram lands under
    * `floor(65536 / avgChunkTokens)` — so boundaries are a pure function
    * of LOCAL content, and an insertion or edit only redraws the chunks
    * that contain it while every downstream boundary re-synchronizes
    * (fixed-size chunking shifts them all — the whole point of CDC
    * dedup). Expected chunk length ≈ `avgChunkTokens`. One row per
    * chunk: ids, `chunk_idx` (0-based), `n_tokens`, `chunk_text`,
    * `chunk_hash`. Deliberately the STATELESS rule — FastCDC's min/max
    * normalization makes boundaries history-dependent and is layered by
    * consumers that need bounded chunk sizes.
    *
    * 100 TB shape: map-only per document — the boundary flags, bounds
    * array, and chunk slices are all array HOFs over the token array
    * (O(doc length), no per-position subquery), and only the chunk rows
    * leave the operator. Cross-doc chunk dedup downstream is one
    * hash-keyed aggregation — the sub-document analogue of
    * [[graft.ops.Dedup.exactGroups]].
    */
  def cdcChunks(
      df: DataFrame,
      idCols: Seq[String],
      textCol: String,
      window: Int = 3,
      avgChunkTokens: Int = 8): DataFrame = {
    require(window >= 1, s"window $window must be >= 1")
    require(avgChunkTokens >= 2 && avgChunkTokens <= 65536,
      s"avgChunkTokens $avgChunkTokens out of [2, 65536]")
    val thr = 65536L / avgChunkTokens
    val ws = filter(tokens(col(textCol)), w => length(w) > 0)
    // boundary flag for 1-based position i: md5 of the trailing
    // `window`-gram ending at i, first 4 hex digits as a 16-bit bucket
    val flag: Column => Column = i => {
      val start = greatest(i - window + 1, lit(1))
      conv(substring(md5(array_join(slice(col("__ws"), start, i - start + 1), " ")), 1, 4),
        16, 10).cast("long") < thr
    }
    // sequence(1, n-1) flips to a DESCENDING range when n < 2 — guard
    val bounds = when(col("__n") >= 2,
        concat(filter(sequence(lit(1), col("__n") - 1), flag), array(col("__n"))))
      .when(col("__n") === 1, array(lit(1)))
      .otherwise(array().cast("array<int>"))
    // zip_with pads the shorter side with null; an empty bounds array (empty
    // doc) would pad the leading [0] into one null chunk — filter it out
    val chunks = filter(
      zip_with(
        concat(array(lit(0)), slice(col("__b"), lit(1), greatest(size(col("__b")) - 1, lit(0)))),
        col("__b"),
        (p, b) => struct(
          (b - p).cast("long").as("n_tokens"),
          array_join(slice(col("__ws"), p + 1, b - p), " ").as("chunk_text"))),
      c => c.getField("n_tokens").isNotNull)
    // Par.spread (round 16, §2.5): tokenize + one md5 per token position
    // is the op's whole cost, and the map stage inherits the scan's
    // partition count (a handful of row groups at bench scale ran the
    // entire corpus walk on a few cores). Spread the RAW rows so the
    // tokenizer runs wide too. No-op on well-split production scans.
    Par.spread(df).select(idCols.map(col) :+ ws.as("__ws"): _*)
      .withColumn("__n", size(col("__ws")))
      .withColumn("__b", bounds)
      .select(idCols.map(col) :+ posexplode(chunks): _*)
      .select(idCols.map(col) ++ Seq(
        col("pos").cast("long").as("chunk_idx"),
        col("col.n_tokens").as("n_tokens"),
        col("col.chunk_text").as("chunk_text"),
        md5(col("col.chunk_text")).as("chunk_hash")): _*)
  }

  /** Flesch reading-ease per document from three regex counts — words
    * (`\S+` runs), sentences (`[.!?]+` runs, floor 1), syllables (vowel
    * groups `[aeiouyAEIOUY]+`, the standard heuristic): `206.835 −
    * 1.015·(words/sentences) − 84.6·(syllables/words)`. ~90–100 reads
    * like a children's book, ≤ 30 like an academic paper; a quality
    * gate alongside the Gopher rules for "is this prose or sludge".
    *
    * Returns `(idCol, n_words, n_sentences, n_syllables, flesch_micro)`
    * — flesch_micro NULL for wordless docs. The counts are integers and
    * the score is a fixed correctly-rounded double expression floored
    * once, so rows hash across engines (regex classes this simple
    * behave identically in RE2 and Java).
    *
    * 100 TB shape: map-only codegen column expressions, zero shuffles.
    */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.filter(t.isNotNull)
      .select(col(idCol),
        regexp_count(t, lit("\\S+")).cast("long").as("n_words"),
        greatest(regexp_count(t, lit("[.!?]+")).cast("long"), lit(1L))
          .as("n_sentences"),
        regexp_count(t, lit("[aeiouyAEIOUY]+")).cast("long")
          .as("n_syllables"))
      .withColumn("flesch_micro", expr(
        """case when n_words > 0 then
             cast(floor(1000000.0 * (206.835
               - 1.015 * (cast(n_words as double) / cast(n_sentences as double))
               - 84.6 * (cast(n_syllables as double) / cast(n_words as double))))
             as long) end"""))
  }

  /** Confusable / invisible-character audit — the text-hygiene screen
    * for spoofing and prompt-smuggling artifacts that survive every
    * other quality filter because they are INVISIBLE: zero-width
    * characters (ZWSP/ZWNJ/ZWJ/BOM), bidi override controls (the
    * "Trojan Source" class), C0/C1 control characters, and mixed-script
    * tokens (Latin+Cyrillic in one word — the classic homoglyph spoof).
    * Per document: counts of each class plus `suspicious` (any hit).
    * Pure regex column expressions — map-only, codegen, pushdown-
    * friendly; counts via length-difference after removal, so no
    * per-char explode.
    *
    * 100 TB shape: embarrassingly parallel scan, no shuffle.
    */
  def confusableAudit(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val t = col(textCol)
    def nMatches(pattern: String) =
      (length(t) - length(regexp_replace(t, pattern, ""))).cast("long")
    df
      .filter(col(idCol).isNotNull && t.isNotNull)
      .withColumn("n_zero_width", nMatches("[\\u200B\\u200C\\u200D\\uFEFF]"))
      .withColumn("n_bidi", nMatches("[\\u202A-\\u202E\\u2066-\\u2069]"))
      .withColumn("n_control", nMatches("[\\u0000-\\u0008\\u000B\\u000C\\u000E-\\u001F\\u007F]"))
      .withColumn("n_mixed_script_tokens",
        size(filter(split(trim(t), " "), w =>
          w.rlike("[A-Za-z]") && w.rlike("[\\u0400-\\u04FF]"))).cast("long"))
      .withColumn("suspicious",
        col("n_zero_width") + col("n_bidi") + col("n_control") +
          col("n_mixed_script_tokens") > 0)
      .select(col(idCol), col("n_zero_width"), col("n_bidi"),
        col("n_control"), col("n_mixed_script_tokens"), col("suspicious"))
  }

  /** Vocabulary-growth (Heaps-law) audit: walk the corpus in a salted-
    * md5 document order, cut it into `buckets` equal-count slices, and
    * report per slice how many NEVER-SEEN-BEFORE tokens appear — plus
    * the cumulative vocabulary and type/token ratio curve. The corpus-
    * health read: a healthy corpus grows vocabulary sub-linearly
    * (Heaps' V ≈ K·nᵝ, β≈0.5); a FLAT tail means content is repeating
    * (dedup leftovers), a LINEAR tail means noise/IDs are flooding the
    * vocabulary. The salted order makes the curve a property of the
    * corpus, not of storage layout, and replays identically anywhere.
    *
    * Output per slice: `(bucket, n_docs, n_tokens, new_vocab,
    * tokens_cum, vocab_cum, ttr_micro)`.
    *
    * 100 TB shape: one [[Ranks.globalRank]] range exchange on the md5
    * order (checkpointed — the explode reads it twice), then two
    * map-side-combined aggregations over the exploded tokens: per-slice
    * token totals, and min-first-rank per token (the vocabulary is
    * token-distinct-sized, its bucket rollup tiny); the cumulative
    * window rides the `buckets`-row table.
    */
  def vocabGrowth(
      df: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 10,
      salt: String = "s1"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 2 && buckets <= 1000,
      s"buckets $buckets out of [2, 1000]")
    val base = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("__id"), col(textCol).as("__t"))
      .withColumn("__ord",
        md5(concat(lit(salt), lit("|"), col("__id").cast("string"))))
    val ranked = Ranks.globalRank(base, Seq(col("__ord"), col("__id")), "__rn")
      .localCheckpoint()
    val n = ranked.agg(count(lit(1))).collect()(0).getLong(0)
    val bucketOf = (c: String) =>
      expr(s"($buckets * ($c - 1)) div ${n}L").cast("int")
    val toks = ranked
      .select(col("__rn"), explode(tokens(col("__t"))).as("__tok"))
      .filter(col("__tok") =!= "")
    val docB = ranked.groupBy(bucketOf("__rn").as("bucket"))
      .agg(count(lit(1)).as("n_docs"))
    val tokB = toks.groupBy(bucketOf("__rn").as("bucket"))
      .agg(count(lit(1)).as("n_tokens"))
    val vocB = toks.groupBy("__tok").agg(min("__rn").as("__frn"))
      .groupBy(bucketOf("__frn").as("bucket"))
      .agg(count(lit(1)).as("new_vocab"))
    val wOrd = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docB
      .join(tokB, Seq("bucket"), "left")
      .join(vocB, Seq("bucket"), "left")
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
      .withColumn("new_vocab", coalesce(col("new_vocab"), lit(0L)))
      .withColumn("tokens_cum", sum(col("n_tokens")).over(wOrd))
      .withColumn("vocab_cum", sum(col("new_vocab")).over(wOrd))
      .withColumn("ttr_micro", expr(
        """cast(cast(vocab_cum as decimal(38,0)) * 1000000
           div greatest(tokens_cum, 1) as long)"""))
  }

  /** Corpus bigram conditional entropy H(next | prev) and the
    * predictability share U = (H(next) − H(next|prev))/H(next) — how
    * much of the next-token uncertainty the previous token already
    * resolves. The one-number sequential-structure audit behind the
    * per-doc [[bigramLmScore]]: shuffled/templated/generated text sits
    * at the extremes (near 0 = no sequential structure; near 1 =
    * boilerplate), and a corpus whose U drifts between crawls changed
    * its mix. Theil's U over the (prev, next) pair table, at token
    * scale.
    *
    * Determinism: every entropy is a sum of per-cell
    * ROUND(10⁶·c·(ln(total) − ln(c))/N) BIGINT terms (the q64/q321
    * ln-term convention) — order-independent, engine-portable; U is
    * one integer division, clamped at 0 against rounding residue.
    *
    * Output (one row): `(n_bigrams, n_prev_types, n_bigram_types,
    * h_next_micro, h_cond_micro, predictability_u_micro)`; U NULL
    * when H(next) = 0.
    *
    * 100 TB shape: one bigram explode → map-side-combined count (the
    * corpus's big shuffle); the marginals re-aggregate the bigram
    * table and the term sums ride it — everything after the first
    * count is vocabulary-sized (bigram types, not tokens), and only
    * scalars reach the driver.
    */
  def bigramConditionalEntropy(
      df: DataFrame,
      textCol: String): DataFrame = {
    val toks = df.filter(col(textCol).isNotNull)
      .select(filter(split(trim(col(textCol)), " "),
        w => length(w) > 0).as("__ws"))
    val cells = toks
      .select(
        slice(col("__ws"), lit(1), greatest(size(col("__ws")) - 1, lit(0)))
          .as("__a"),
        slice(col("__ws"), lit(2), greatest(size(col("__ws")) - 1, lit(0)))
          .as("__b"))
      .select(explode(arrays_zip(col("__a"), col("__b"))).as("__p"))
      .select(col("__p.__a").as("__w1"), col("__p.__b").as("__w2"))
      .groupBy("__w1", "__w2").agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val tot = cells.agg(coalesce(sum("__c"), lit(0L)).as("n"),
      count(lit(1)).as("types")).head()
    val n = tot.getLong(0); val nTypes = tot.getLong(1)
    val spark = df.sparkSession
    import spark.implicits._
    if (n == 0L)
      return Seq((0L, 0L, 0L, 0L, 0L, None: Option[Long]))
        .toDF("n_bigrams", "n_prev_types", "n_bigram_types",
          "h_next_micro", "h_cond_micro", "predictability_u_micro")
    def hTerm(c: Column, total: Column): Column =
      round(lit(1e6) * c.cast("double") *
        (log(total.cast("double")) - log(c.cast("double"))) / lit(n.toDouble))
        .cast("long")
    val m1 = cells.groupBy("__w1").agg(sum("__c").as("c1")).localCheckpoint(true)
    val nPrev = m1.count()
    val hNext = cells.groupBy("__w2").agg(sum("__c").as("c2"))
      .agg(coalesce(sum(hTerm(col("c2"), lit(n))), lit(0L))).head().getLong(0)
    val hCond = cells.join(m1, "__w1")
      .agg(coalesce(sum(hTerm(col("__c"), col("c1"))), lit(0L)))
      .head().getLong(0)
    val u: Option[Long] =
      if (hNext > 0)
        Some((BigInt(math.max(0L, hNext - hCond)) * 1000000 /
          BigInt(hNext)).toLong)
      else None
    Seq((n, nPrev, nTypes, hNext, hCond, u))
      .toDF("n_bigrams", "n_prev_types", "n_bigram_types",
        "h_next_micro", "h_cond_micro", "predictability_u_micro")
  }
}
