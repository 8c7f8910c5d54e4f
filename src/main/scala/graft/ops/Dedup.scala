package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Design for 100 TB:
  *  - every candidate-generation step is a hash-bucket shuffle on a derived
  *    key (never an all-pairs cross join);
  *  - hot shingles/buckets are frequency-capped (`maxDf`) so a stopword
  *    shingle can't create a quadratic bucket;
  *  - all hashing is md5-based and engine-portable, so a SQL oracle can
  *    reproduce every pair decision bit-for-bit.
  */
object Dedup {

  /** Exact dedup groups: one row per distinct text hash with the canonical
    * (minimum) id and the duplicate count. Plain hash groupBy — one shuffle,
    * map-side partial agg.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"))

  /** Streaming exact dedup: keeps the FIRST-arriving row per content hash
    * on an unbounded source, with state bounded by the watermark (a
    * duplicate arriving later than `lateness` after its original may pass —
    * the standard state-TTL trade every streaming dedup makes; Flink's
    * deduplicate and Spark's dropDuplicatesWithinWatermark share it).
    * One shuffle on the hash; state per distinct hash inside the window.
    */
  def streamingExactDedup(
      df: DataFrame,
      textCol: String,
      eventTsCol: String,
      lateness: scala.concurrent.duration.Duration): DataFrame = {
    require(df.isStreaming, "use exactGroups for batch inputs")
    df.withColumn("__text_hash", md5(col(textCol)))
      .withWatermark(eventTsCol, s"${lateness.toMillis} milliseconds")
      .dropDuplicatesWithinWatermark("__text_hash")
      .drop("__text_hash")
  }

  /** Distinct word `n`-gram shingles per document: (id, shingle).
    *
    * Built by zipping n shifted slices of the token array — zip_with walks
    * the arrays directly, ~10× faster than per-index element_at/get lambdas,
    * which pay interpreted ordinal resolution per element. A doc shorter
    * than n words yields one shingle of all its words. Distinct is
    * relational (map-side-combined hash distinct after the explode).
    */
  def wordShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val ws = TextOps.tokens(col(textCol))
    val m = greatest(size(ws) - (n - 1), lit(1))
    var acc = slice(ws, lit(1), m)
    for (j <- 1 until n)
      acc = zip_with(acc, slice(ws, lit(j + 1), m), (a, b) => concat(a, lit(" "), b))
    val grams = when(size(ws) >= n, acc).otherwise(array(array_join(ws, " ")))
    df.select(col(idCol).as("id"), explode(grams).as("shingle")).distinct()
  }

  /** All-pairs n-gram Jaccard similarity ≥ `threshold`, computed by joining
    * documents through shared shingles (inverted-index join): only pairs with
    * at least one common shingle are ever materialized. `maxDf` drops
    * shingles occurring in more documents — the skew guard that keeps a
    * stopword shingle from producing |bucket|² pairs.
    *
    * Threshold is applied to the ROUNDED (4 dp) similarity so the decision
    * is reproducible across engines.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxDf: Long = 10000L): DataFrame = {
    val sh = wordShingles(df, idCol, textCol, n)
    // Hot-shingle guard as a broadcast anti-join: the set of shingles with
    // df > maxDf has at most |rows|/maxDf members — broadcastable by
    // definition — so this costs one aggregation instead of a full
    // shuffle+sort window over every shingle row.
    val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("shingle"))
    // Persisted: consumed three times (size table + both self-join sides) —
    // without it Spark re-runs the explode+distinct pipeline per consumer.
    val kept = sh.join(broadcast(hot), Seq("shingle"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = kept.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val common = kept.as("a")
      .join(kept.as("b"), col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn(
        "jaccard",
        round(col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Training-corpus decontamination: flag corpus documents sharing at
    * least `minOverlap` distinct n-gram shingles with ANY row of a
    * benchmark/eval set — the standard train/test contamination sweep run
    * before training. The benchmark side is evaluation-sized by
    * definition, so its distinct shingle set broadcasts and the corpus
    * never shuffles on the join; the only corpus shuffle is the per-doc
    * overlap count, keyed by the corpus id. Returns (id, overlap).
    */
  def contaminatedBy(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      n: Int,
      minOverlap: Long = 1L): DataFrame = {
    val docSh = wordShingles(corpus, idCol, textCol, n)
    val benchSh = wordShingles(benchmark, benchIdCol, benchTextCol, n)
      .select(col("shingle")).distinct()
    docSh.join(broadcast(benchSh), Seq("shingle"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  /** Exact-substring decontamination: flag corpus documents containing any
    * benchmark phrase verbatim — the stricter companion to the n-gram
    * sweep ([[contaminatedBy]]), catching quoted eval answers that token
    * shingling can miss across formatting differences. Returns
    * (id, n_hits, first_phrase) with the lexicographically first matching
    * phrase as the audit sample.
    *
    * 100 TB shape: the phrase set is evaluation-sized, so it broadcasts
    * and the corpus never shuffles for the scan — the
    * BroadcastNestedLoopJoin is |corpus|·|phrases| `contains` probes
    * streamed map-side (each doc scans the broadcast list in place), and
    * the only corpus shuffle is the per-doc hit count. For phrase sets
    * beyond broadcast size, pre-block by a shared rare token first.
    */
  def containsPhrase(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      phrases: DataFrame,
      phraseCol: String): DataFrame = {
    val p = phrases.select(col(phraseCol).as("__phrase"))
      .filter(col("__phrase").isNotNull && col("__phrase") =!= "").distinct()
    corpus.select(col(idCol).as("id"), col(textCol).as("__text"))
      .join(broadcast(p), col("__text").contains(col("__phrase")))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_hits"),
        min(col("__phrase")).as("first_phrase"))
  }

  /** MinHash signature columns `mh_0..mh_{numHashes-1}` per id: the i-th
    * hash is the lexicographic minimum of ROTATE_i(md5(shingle)) over the
    * document's shingle set. One md5 per shingle; the i-th family member is
    * a string rotation (the min under rotation i is decided by hex digits
    * from offset i — independent across offsets), so the per-row hash cost
    * is constant in numHashes instead of linear. Portable: any engine with
    * md5 + substr reproduces it. One shuffle (groupBy id).
    */
  def minhashSignatures(shingles: DataFrame, numHashes: Int): DataFrame = {
    require(numHashes <= 32, "rotation family supports at most 32 hashes")
    val withH = shingles.withColumn("__h", md5(col("shingle")))
    val aggs = (0 until numHashes).map { i =>
      val rot =
        if (i == 0) col("__h")
        else concat(substring(col("__h"), i + 1, 32), substring(col("__h"), 1, i))
      min(rot).as(s"mh_$i")
    }
    withH.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band buckets from minhash signatures: `bands` buckets per doc, each
    * the md5 of `rowsPerBand` consecutive signature entries. Docs agreeing on
    * any full band land in the same bucket.
    */
  def lshBands(signatures: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", parts: _*)).as("bucket"))
    }
    signatures.select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** MinHash+LSH candidate pairs: distinct (id_a < id_b) sharing at least one
    * band bucket. Shuffles on (band, bucket); `maxBucket` caps pathological
    * buckets (identical boilerplate docs) the same way `maxDf` caps shingles.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      maxBucket: Long = 10000L): DataFrame = {
    val sigs = minhashSignatures(wordShingles(df, idCol, textCol, shingleLen), numHashes)
    val bb = lshBands(sigs, numHashes, bands)
    val hot = bb.groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket)
      .select(col("band"), col("bucket"))
    val capped = bb.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK) // both self-join sides
    capped.as("a")
      .join(
        capped.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Incremental MinHash+LSH: near-dup candidates for a NEW batch against
    * an EXISTING corpus plus within the batch itself — daily-crawl dedup
    * without ever re-pairing the old corpus against itself (the quadratic
    * bulk a full [[minhashLshPairs]] re-run would redo every day). Returns
    * (id_a, id_b) with id_a from either side, id_b always from the new
    * batch (old↔new pairs keep the old id first).
    *
    * 100 TB shape: both sides bucket independently (the old side's
    * signatures are re-derivable or can be persisted columns); the join is
    * bucket-local with the same `maxBucket` skew cap, and the old↔old
    * pair space — the bulk of the quadratic work — is never generated.
    */
  def minhashLshPairsIncremental(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      maxBucket: Long = 10000L): DataFrame = {
    def buckets(df: DataFrame) = lshBands(
      minhashSignatures(wordShingles(df, idCol, textCol, shingleLen), numHashes),
      numHashes, bands)
    val oldBb = buckets(oldDf)
    val newBb = buckets(newDf).persist(StorageLevel.MEMORY_AND_DISK)
    val all = oldBb.select(col("band"), col("bucket"))
      .unionByName(newBb.select(col("band"), col("bucket")))
    val hot = all.groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket)
      .select(col("band"), col("bucket"))
    val oldCapped = oldBb.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
    val newCapped = newBb.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
    val oldNew = oldCapped.as("a").join(
        newCapped.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val newNew = newCapped.as("a").join(
        newCapped.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    oldNew.unionByName(newNew).distinct()
  }

  /** 64-bit SimHash as a '0'/'1' bit string (avoids BIGINT sign overflow and
    * stays engine-portable). Bit b of a token = bit (b%4) of hex digit
    * (b/4 + 1) of md5(token); document bit b = majority vote over all token
    * occurrences (sum of ±1 > 0). Computed as 64 map-side partial sums in a
    * single groupBy — one shuffle.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(
      col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val hexIdx: Column => Column = d => instr(lit("0123456789abcdef"), d) - 1
    val bitSums = (0 until 64).map { b =>
      val digit = hexIdx(substring(col("h"), b / 4 + 1, 1))
      val bit = floor(digit / math.pow(2, b % 4).toInt).cast("long") % 2
      sum(bit * 2 - 1).as(s"s_$b")
    }
    val sums = toks.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    sums.select(
      col("id"),
      concat((0 until 64).map(b => when(col(s"s_$b") > 0, "1").otherwise("0")): _*)
        .as("simhash"))
  }

  /** SimHash near-dup candidates: pairs agreeing on a `prefixBits`-bit prefix
    * with Hamming distance ≤ `maxHamming` over the full 64 bits. Prefix
    * blocking keeps the join bucketed; for guaranteed recall at distance d,
    * run 64/prefixBits rotated-prefix passes (standard SimHash table
    * rotation) — this single-pass variant is the building block.
    */
  def simhashPairs(
      sim: DataFrame,
      prefixBits: Int = 16,
      maxHamming: Int = 3): DataFrame = {
    val withPrefix = sim.withColumn("pfx", substring(col("simhash"), 1, prefixBits))
      .persist(StorageLevel.MEMORY_AND_DISK) // both self-join sides
    val hamming = {
      val a = split(col("a.simhash"), "")
      val b = split(col("b.simhash"), "")
      size(filter(zip_with(a, b, (x, y) => x =!= y), d => d))
    }
    withPrefix.as("a")
      .join(withPrefix.as("b"),
        col("a.pfx") === col("b.pfx") && col("a.id") < col("b.id"))
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("hamming"))
  }

  /** Embedding near-duplicates: pairs with cosine ≥ `threshold` (rounded to
    * 6 dp for cross-engine determinism).
    *
    * `planes = 0` → exact all-pairs via the broadcast primitive kernel
    * ([[Similarity.allPairsCosine]]) — requires the table to be
    * broadcastable; kept as the small-data exactness baseline.
    *
    * `planes > 0` → sign-random-projection blocking (the 100 TB route):
    * the `planes`-bit SRP signature is split into `bands` bands (same
    * OR-of-ANDs amplification as [[minhashLshPairs]]); a pair is a
    * candidate iff it agrees on ALL bits of SOME band, so recall at a
    * given threshold is tuned by (planes/bands, bands) instead of being
    * stuck at agree-on-everything. Only candidates are scored; the one
    * data shuffle is the self-join on (band, bucket), and a final
    * `distinct` collapses pairs that collide in several bands. Vectors
    * ride along the band explode so no join back to the base table is
    * needed.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      planes: Int = 0,
      bands: Int = 1): DataFrame = {
    if (planes == 0)
      return Similarity.allPairsCosine(df, idCol, vecCol, threshold)
    require(bands > 0 && planes % bands == 0, s"bands=$bands must divide planes=$planes")
    val bitsPerBand = planes / bands
    val banded = df
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      // norm once per ROW here, not per candidate PAIR after the join
      .withColumn("nm", Similarity.norm(col("v")))
      .withColumn("bk",
        Similarity.srpBucket(col("v"), planes, Similarity.sniffDim(df, vecCol)))
      .select(col("id"), col("v"), col("nm"),
        explode(array((0 until bands).map(b => struct(
          lit(b).as("band"),
          substring(col("bk"), b * bitsPerBand + 1, bitsPerBand).as("bucket"))): _*)).as("bb"))
      .select(col("id"), col("v"), col("nm"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .withColumn("cosine",
        round(Similarity.dot(col("a.v"), col("b.v")) / (col("a.nm") * col("b.nm")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
      .distinct()
  }
}
