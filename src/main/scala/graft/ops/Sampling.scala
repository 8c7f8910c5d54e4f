package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * All selection decides on md5 of a stable key — never `rand()` — so a
  * sample is reproducible across engines, partitionings, and reruns, and
  * any row's membership can be audited after the fact. Selection is a pure
  * column predicate: map-only, no shuffle, fully pushdown-friendly.
  */
object Sampling {

  /** Uniform bucket in [0, 256) from the first two hex digits of
    * md5(salt|key). Two lowercase hex digits compare lexicographically in
    * numeric order, so thresholding works on the raw string in any engine
    * with md5 — no hex-to-int conversion needed.
    */
  private def bucketHex(key: Column, salt: String): Column =
    substring(md5(concat_ws("|", lit(salt), key)), 1, 2)

  private def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction not in [0,1]")
    val t = math.round(fraction * 256).toInt.min(256)
    // 256 must compare above every 2-hex-char bucket. The natural "100"
    // does NOT ("ff" < "100" is false lexicographically — 'f' > '1');
    // "g0" does ('g' sorts after every hex digit), keeping fraction=1.0 a
    // keep-everything predicate instead of silently dropping ~94%.
    if (t >= 256) "g0" else f"$t%02x"
  }

  /** Keep ~`fraction` of rows, decided by md5(salt|key) — deterministic
    * and stratification-free. Granularity is 1/256.
    */
  def sample(df: DataFrame, keyCol: String, fraction: Double, salt: String = ""): DataFrame =
    df.filter(bucketHex(col(keyCol), salt) < lit(thresholdHex(fraction)))

  /** Stratified deterministic sample: each stratum keeps ~its configured
    * fraction of rows (`default` for unlisted strata). One codegen'd
    * predicate over the scan — at 100 TB this is a filter pushed to the
    * reader, not a job.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      fractions: Map[String, Double],
      default: Double,
      salt: String = ""): DataFrame = {
    val threshold = fractions.foldLeft(lit(thresholdHex(default))) {
      case (acc, (stratum, frac)) =>
        when(col(strataCol) === stratum, lit(thresholdHex(frac))).otherwise(acc)
    }
    df.filter(bucketHex(concat_ws("#", col(strataCol), col(keyCol)), salt) < threshold)
  }

  /** Balanced sample: keep at most `quota` rows PER GROUP (language/source
    * balancing for a training mix), chosen deterministically — rows rank by
    * md5(salt|group#key) with the key as tiebreak, and ranks above the
    * quota drop. Unlike a fraction-based sample this gives exact per-group
    * counts (min(n_g, quota)).
    *
    * 100 TB shape: one shuffle keyed by the group for the rank window; skew
    * equals group skew, and a group's rows sort by a 32-char hash — if one
    * group dominates the corpus, pre-filter with [[stratifiedSample]] to
    * cut its bulk map-side first, then apply the exact quota here.
    */
  def groupQuotaSample(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      quota: Int,
      salt: String = ""): DataFrame = {
    require(quota > 0, s"quota $quota must be positive")
    import org.apache.spark.sql.expressions.Window
    val r = md5(concat_ws("|", lit(salt), concat_ws("#", col(groupCol), col(keyCol))))
    df.withColumn("__rk",
        row_number().over(Window.partitionBy(col(groupCol)).orderBy(r, col(keyCol))))
      .filter(col("__rk") <= quota)
      .drop("__rk")
  }

  /** Training-mix manifest (Pile/DoReMi-style static mixing): per source,
    * the corpus inventory (docs, units, corpus share), the target unit
    * allotment `round(budget * weight)`, and the `epochs` factor
    * (target / available) a sampler must apply — >1 means the source
    * repeats across the mix, <1 means it downsamples. `unitCol` is any
    * per-row size measure (token count, chars, bytes).
    *
    * Determinism: every ratio is a single divide of exact integers, and
    * `target_units` a single multiply+round — bit-identical across
    * engines, so ROUND(..,4) cannot straddle a boundary.
    *
    * 100 TB shape: one partial-aggregated groupBy on the source column
    * (cardinality = #sources, tiny); the global-total window runs over the
    * aggregated frame only, so its single-partition exchange moves
    * #sources rows regardless of corpus size.
    */
  /** Temperature-scaled mixing quotas (the multilingual-LM recipe,
    * Conneau & Lample 2019 §3.1 / mT5): group g keeps
    * `quota_g = min(n_g, round(budget · p_g))` rows where
    * `p_g ∝ n_g^alpha` — alpha < 1 flattens the distribution toward the
    * tail groups. `alpha = 0.5` (the common default) computes as
    * `round(sqrt(n)·1e6)` integer micros: sqrt is IEEE correctly-rounded
    * in every engine, the micro sum is exact integer arithmetic, and the
    * final share is one divide of the same two exact operands — so the
    * quota is bit-reproducible cross-engine (general alpha goes through
    * `pow`, whose last-ulp behavior is libm-specific; still deterministic
    * per engine, just not oracle-exact).
    *
    * 100 TB shape: one map-side-combined groupBy on the group column
    * (cardinality = #groups); the share normalization windows over the
    * aggregated frame only.
    */
  def temperatureQuotas(
      df: DataFrame,
      groupCol: String,
      alpha: Double,
      budget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha not in (0,1]")
    import org.apache.spark.sql.expressions.Window
    val wMicro =
      if (alpha == 0.5) round(sqrt(col("n").cast("double")) * 1e6).cast("long")
      else round(pow(col("n").cast("double"), alpha) * 1e6).cast("long")
    df.groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n"))
      .withColumn("w_micro", wMicro)
      .withColumn("share",
        col("w_micro").cast("double") / sum("w_micro").over(Window.partitionBy()))
      .withColumn("quota",
        least(col("n"), round(lit(budget.toDouble) * col("share")).cast("long")))
  }

  /** Temperature-scaled deterministic sample: [[temperatureQuotas]] joined
    * back (broadcast — #groups rows) and rows kept by the same
    * md5-ranked-within-group rule as [[groupQuotaSample]], so membership
    * is auditable and the per-group counts are exact.
    *
    * 100 TB shape: one rank window keyed by the group (same skew contract
    * as groupQuotaSample) plus the tiny quota aggregate.
    */
  def temperatureSample(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      alpha: Double,
      budget: Long,
      salt: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quotas = temperatureQuotas(df, groupCol, alpha, budget)
      .select(col("group").as(groupCol), col("quota"))
    val r = md5(concat_ws("|", lit(salt), concat_ws("#", col(groupCol), col(keyCol))))
    df.withColumn("__rk",
        row_number().over(Window.partitionBy(col(groupCol)).orderBy(r, col(keyCol))))
      .join(broadcast(quotas), Seq(groupCol))
      .filter(col("__rk") <= col("quota"))
      .drop("__rk", "quota")
  }

  /** Deterministic train/validation/test assignment: the md5 bucket of
    * (salt|key) in [0, 65536) is compared against the cumulative split
    * boundaries, so every row gets exactly one label, membership is
    * reproducible and auditable, and co-keyed rows (same document id
    * across shards/epochs) always land in the same split — the property
    * that prevents train/test leakage under re-runs. Map-only: adds one
    * codegen'd column, never shuffles.
    *
    * Boundaries are `round(cum_frac · 65536)` on 4 hex digits
    * (granularity 1/65536 ≈ 0.0015%).
    */
  def splitAssign(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      salt: String = ""): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got $splits")
    val bounds = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * 65536)
    }.tail
    val bucket = substring(md5(concat_ws("|", lit(salt), col(keyCol))), 1, 4)
    // a cumulative bound that reaches 65536 (trailing zero-fraction
    // splits) must sort above every 4-hex-char bucket — "g" does, the
    // natural "10000" does not (same lexicographic trap as thresholdHex)
    val label = splits.map(_._1).zip(bounds).init
      .foldRight(lit(splits.last._1): Column) { case ((name, hi), acc) =>
        val bound = if (hi >= 65536L) "g" else f"$hi%04x"
        when(bucket < lit(bound), lit(name)).otherwise(acc)
      }
    df.withColumn("split", label)
  }

  /** Near-dup-aware split: assign train/val/test by the md5 bucket of the
    * document's duplicate-CLUSTER label (connected components over the
    * given near-dup pairs), so an entire duplicate family always lands in
    * one split — per-document hashing would leak train content into test
    * through its near-copies, which inflates every eval it touches.
    * Returns `(idCol, cluster, split)`; singletons are their own cluster.
    *
    * 100 TB shape: inherits [[Cluster.dedupAssign]]'s delta-sized CC (only
    * pair participants iterate) plus [[splitAssign]]'s map-only labeling —
    * the split adds zero shuffles beyond the cluster join.
    */
  def leakageSafeSplit(
      corpus: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      splits: Seq[(String, Double)],
      salt: String = ""): DataFrame = {
    val assigned = Cluster.dedupAssign(corpus, idCol, pairs, aCol, bCol)
    splitAssign(assigned, "cluster", splits, salt)
      .select(col("id").as(idCol), col("cluster"), col("split"))
  }

  /** Per-group discrete quantile thresholds from a deterministic sample —
    * the CCNet recipe (Wenzek et al. 2020 §4.3): quality buckets come
    * from quantiles of a bounded SAMPLE, never a corpus-wide sort.
    * Threshold for probability p is sample element `max(ceil(p·n), 1)`
    * (1-based) of the group's sorted sample — a discrete pick, no
    * interpolation, so any engine that sorts and indexes agrees exactly.
    *
    * 100 TB shape: the md5 sample predicate pushes to the scan; the
    * per-group sorted list is bounded by the sample size (size the
    * fraction so group-sample × value width fits an executor — CCNet
    * itself uses a few hundred thousand values per language).
    */
  def quantileThresholds(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      keyCol: String,
      probs: Seq[Double],
      sampleFraction: Double,
      salt: String = ""): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p < 1),
      s"probs must lie in (0,1), got $probs")
    val sampled = sample(df, keyCol, sampleFraction, salt)
    val sorted = sort_array(collect_list(col(scoreCol)))
    val base = sampled.groupBy(col(groupCol).as("group"))
      .agg(sorted.as("xs"), count(lit(1)).as("n_sample"))
    probs.zipWithIndex.foldLeft(base) { case (acc, (p, i)) =>
      acc.withColumn(s"t$i",
        element_at(col("xs"), greatest(ceil(lit(p) * col("n_sample")), lit(1)).cast("int")))
    }.drop("xs")
  }

  /** Label each row by where its score falls among per-group ascending
    * `thresholds` (t0 ≤ t1 ≤ …, from [[quantileThresholds]]): label i for
    * score ≤ t_i, else the last label — CCNet's head/middle/tail with
    * perplexity-like scores (lower = better). Broadcast join on the
    * group + one codegen'd CASE; the corpus never shuffles.
    */
  def scoreBuckets(
      df: DataFrame,
      thresholds: DataFrame,
      groupCol: String,
      scoreCol: String,
      labels: Seq[String]): DataFrame = {
    require(labels.size >= 2, "need at least two bucket labels")
    val t = thresholds.withColumnRenamed("group", groupCol)
    val label = labels.init.zipWithIndex
      .foldRight(lit(labels.last): Column) { case ((name, i), acc) =>
        when(col(scoreCol) <= col(s"t$i"), lit(name)).otherwise(acc)
      }
    df.join(broadcast(t), Seq(groupCol))
      .withColumn("bucket", label)
      .drop(("n_sample" +: labels.init.indices.map(i => s"t$i")): _*)
  }

  /** Hashed unigram+bigram bag-of-words buckets for [[dsirWeights]]: the
    * bucket id is the first `hashDigits` hex chars of md5(gram) — a string
    * key every md5-capable engine derives identically, no hex→int parsing
    * — giving 16^hashDigits buckets (DSIR's paper setting is 10k; the
    * 3-digit default is 4096).
    */
  private def gramBuckets(
      df: DataFrame, idCols: Seq[Column], textCol: String, hashDigits: Int): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val bigrams = when(size(toks) >= 2,
      zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    Par.spread(df).select(idCols :+ explode(concat(toks, bigrams)).as("__gram"): _*)
      .withColumn("b", substring(md5(col("__gram")), 1, hashDigits))
      .drop("__gram")
  }

  /** Weighted sampling WITHOUT replacement, k per group, deterministic —
    * the Efraimidis–Spirakis (2006) exponential-jitter scheme with the
    * md5-derived uniform replacing `rand()`: u = (first-8-hex(md5(salt|id))
    * + 1) / 2^32, priority key ∝ −ln(u)/w, keep the k smallest keys per
    * group. Selection probability tracks the weight (a doc sampled
    * proportionally to its token count, a domain to its traffic) and the
    * SAME (salt, id) always draws the same u, so re-runs and engines
    * agree row-for-row — the weighted companion of [[sample]] /
    * [[groupQuotaSample]].
    *
    * Determinism contract: ln(u) is floored to integer micros ONCE, the
    * key is the all-integer `(−lnU6 · 1e6) div w` (everything
    * non-negative, so Spark's truncating div and a flooring replay
    * agree), and ranking breaks ties on ascending id. The micro floor
    * coarsens the E-S exponential jitter by < 1e-6 relative — sampling
    *-theory-irrelevant, replay-essential. Rows with weight <= 0 are
    * excluded (they have zero mass in E-S).
    *
    * 100 TB shape: map-only key computation, then ONE per-group rank
    * window — the same shape (and cost) as every deterministic top-k
    * here; groups are the partition key, so skew equals group skew.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      groupCol: String,
      k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val u = (conv(substring(md5(concat_ws("|", lit(salt), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("long") + 1L).cast("double") / 4294967296.0
    val lnU6 = floor(log(u) * 1e6).cast("long")
    df.filter(col(weightCol).cast("long") > 0L)
      .withColumn("__nlnu6", lnU6 * -1L) // >= 0: u <= 1 so ln(u) <= 0
      .withColumn("__key",
        expr(s"__nlnu6 * 1000000L div cast(`$weightCol` as bigint)"))
      .withColumn("rank",
        row_number().over(
          Window.partitionBy(col(groupCol)).orderBy(col("__key"), col(idCol))))
      .filter(col("rank") <= k)
      .select(col(groupCol), col(idCol), col(weightCol).cast("long").as("weight"),
        col("rank"))
  }

  /** Deterministic training-order shuffle: a reproducible global
    * permutation of the corpus for training-example ORDER, as
    * (shard, pos, global_pos). The usual `orderBy(rand())` is
    * non-deterministic across retries/replays AND a global range sort;
    * this is neither: order key = md5(seed|id) (any engine replays it),
    * shard = first-8-hex of the same hash mod `numShards` (one hash
    * shuffle), pos = shard-local rank, and global_pos = pos + the
    * broadcast cumulative shard-size offset — the [[graft.ops.Corpus]]
    * `packPieces` prefix-sum trick, so the total order costs NO global
    * window / range exchange. Note the resulting total order is
    * (shard, md5) lexicographic, not the plain md5 order — equally
    * pseudorandom (both derive from the same hash), and exactly what a
    * sharded training reader consumes. Re-running with the same seed reproduces
    * the epoch exactly; a new seed is a fresh epoch permutation.
    *
    * 100 TB shape: one shuffle on the shard key, shard-local sort windows
    * (shards ≈ parallelism, uniformly hash-filled), a numShards-row
    * offset table broadcast back. Writers consume (shard, pos) directly
    * as (file, offset); global_pos is for single-sequence consumers.
    */
  def trainingOrder(
      df: DataFrame,
      idCol: String,
      numShards: Int,
      seed: String): DataFrame = {
    require(numShards >= 1, s"numShards=$numShards must be >= 1")
    val h = md5(concat_ws("|", lit(seed), col(idCol).cast("string")))
    val sharded = df.select(col(idCol), h.as("__h"))
      .withColumn("shard",
        pmod(conv(substring(col("__h"), 1, 8), 16, 10).cast("long"), lit(numShards.toLong))
          .cast("int"))
    val pos = sharded.withColumn("pos",
      (row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))) - 1).cast("long"))
    val offsets = sharded.groupBy(col("shard")).agg(count(lit(1)).as("__c"))
      .withColumn("__off",
        (sum(col("__c")).over(Window.orderBy(col("shard"))) - col("__c")).cast("long"))
      .select(col("shard"), col("__off"))
    pos.join(broadcast(offsets), Seq("shard"))
      .select(col(idCol), col("shard"), col("pos"),
        (col("__off") + col("pos")).as("global_pos"))
  }

  /** Deterministic negative sampling for implicit-feedback training:
    * for every user in `interactions`, k items they did NOT interact
    * with, drawn uniformly from the item catalog by md5 — the
    * (user, pos, neg) triple generator every two-tower / matrix-
    * factorization pipeline needs, with none of the usual `rand()`
    * non-reproducibility. Draw j of user u proposes catalog index
    * md5(salt|u|j) mod |catalog|; proposals that hit the user's own
    * interaction set are discarded (true negatives only) and the first
    * k survivors by draw order are kept. `oversample` controls how many
    * proposals per kept negative are drawn (heavy users need more);
    * users whose interaction set eats too many proposals emit fewer
    * than k rows — raise `oversample` rather than re-drawing, so the
    * output stays a pure function of (salt, interactions).
    *
    * 100 TB shape: the catalog gets a dense 0..C-1 index from
    * [[trainingOrder]] (hash shards + broadcast offsets — no global
    * sort); proposals are a map-side explode of k·oversample rows per
    * user joined to the index (catalog-sized side, AQE broadcasts it
    * when it fits), the self-hit discard is one (user, item) anti-join
    * against the interactions themselves, and the keep-first-k is a
    * per-user rank window. Nothing is collected; no user×catalog cross
    * join exists anywhere.
    */
  def negativeSample(
      interactions: DataFrame,
      userCol: String,
      itemCol: String,
      k: Int,
      oversample: Int = 4,
      salt: String = ""): DataFrame = {
    require(k >= 1 && oversample >= 1, "k >= 1, oversample >= 1")
    val m = k * oversample
    val inter = interactions
      .select(col(userCol).cast("long").as("__u"), col(itemCol).cast("long").as("__i"))
      .filter(col("__u").isNotNull && col("__i").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val catalog = inter.select(col("__i")).distinct()
    val index = trainingOrder(catalog, "__i", numShards = 32, seed = s"ns|$salt")
      .select(col("__i").as("__item"), col("global_pos").as("__idx"))
    val catSize = index.agg(count(lit(1)).as("__c"))
    val proposals = inter.select(col("__u")).distinct()
      .select(col("__u"), explode(sequence(lit(0), lit(m - 1))).as("__j"))
      .crossJoin(broadcast(catSize))
      .withColumn("__idx",
        pmod(conv(substring(md5(concat_ws("|", lit(salt), col("__u"), col("__j"))), 1, 8),
          16, 10).cast("long"), col("__c")))
    proposals
      .join(index, Seq("__idx"))
      .join(inter.withColumnRenamed("__i", "__item"), Seq("__u", "__item"), "left_anti")
      // collision dedupe: two draws proposing the same item keep the first
      .groupBy(col("__u"), col("__item")).agg(min(col("__j")).as("__j"))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("__u")).orderBy(col("__j"))))
      .filter(col("rank") <= k)
      .select(col("__u").as(userCol), col("__item").as(itemCol), col("rank"))
  }

  /** DSIR importance weights (Xie et al. 2023, Data Selection via
    * Importance Resampling): fit Laplace-smoothed bag-of-hashed-ngram
    * models over the TARGET domain (p) and the raw CORPUS (q); a
    * document's weight is its sum of per-occurrence log p(b)/q(b). Every
    * per-bucket log is rounded to integer MICROS before any sum (the
    * bigramLmScore determinism recipe), so document weights are exact
    * integers — cross-engine and cross-partitioning reproducible.
    *
    * 100 TB shape: two gram-keyed count aggregations (bucket tables are
    * 16^hashDigits rows — model-sized); the corpus re-walks its grams once
    * against the BROADCAST log-ratio table and sums per doc with map-side
    * combine. The target set (a trusted domain sample) is assumed
    * corpus-fraction-sized or smaller; neither side ever collects.
    */
  def dsirWeights(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      targetTextCol: String,
      hashDigits: Int = 3): DataFrame = {
    require(hashDigits >= 1 && hashDigits <= 6, s"hashDigits $hashDigits not in [1,6]")
    val nBuckets = math.pow(16, hashDigits).toLong
    val cb = gramBuckets(corpus, Seq(col(idCol)), textCol, hashDigits)
    val tb = gramBuckets(target, Seq(lit(1).as("__one")), targetTextCol, hashDigits)
    // bucket-keyed count tables are 16^hashDigits rows — model-sized; the
    // gram totals come from summing THEM, so each side's gram explode runs
    // once here plus once in the scoring join (the inherent two DSIR
    // passes), never a third time for a count()
    val qCounts = cb.groupBy("b").agg(count(lit(1)).as("cq"))
      .localCheckpoint(true)
    val pCounts = tb.groupBy("b").agg(count(lit(1)).as("cp"))
      .localCheckpoint(true)
    // both totals in ONE driver round-trip: the two 1-row aggregates of
    // the checkpointed count tables cross-join into a single job
    val totals = qCounts.agg(coalesce(sum("cq"), lit(0L)).as("tq"))
      .crossJoin(pCounts.agg(coalesce(sum("cp"), lit(0L)).as("tp")))
      .collect()(0)
    val totQ = totals.getLong(0)
    val totP = totals.getLong(1)
    val lr = qCounts.join(pCounts, Seq("b"), "full_outer")
      .select(
        col("b"),
        (round(log((coalesce(col("cp"), lit(0L)) + 1).cast("double") /
            lit((totP + nBuckets).toDouble)) * 1e6).cast("long") -
          round(log((coalesce(col("cq"), lit(0L)) + 1).cast("double") /
            lit((totQ + nBuckets).toDouble)) * 1e6).cast("long")).as("lr_micro"))
    cb.join(broadcast(lr), Seq("b"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(col("lr_micro")).as("w_micro"))
  }

  /** DSIR selection: the `k` highest-weight documents (id tie-break) —
    * the deterministic GREEDY variant. For the paper's actual
    * importance-RESAMPLING semantics (Gumbel top-k, which preserves the
    * softmax sampling distribution instead of always taking the same
    * head) use [[dsirResample]] — its md5-driven Gumbel keys DO
    * hash-match cross-engine (q256 proves it tri-scale; an earlier note
    * here claimed otherwise, but `u = (h+1)/(2³²+1)` is an exact dyadic
    * rational and `−ln(−ln u)` is one mirrored double tree, the same
    * q106 Efraimidis–Spirakis contract). Greedy runs as a distributed
    * TakeOrdered, never a single-partition sort.
    */
  def dsirSelect(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      targetTextCol: String,
      k: Int,
      hashDigits: Int = 3): DataFrame = {
    val w = dsirWeights(corpus, idCol, textCol, target, targetTextCol, hashDigits)
    corpus.join(w, Seq(idCol))
      .orderBy(col("w_micro").desc, col(idCol))
      .limit(k)
  }

  /** DSIR importance RESAMPLING (the paper's sampler, vs
    * [[dsirSelect]]'s greedy head): Gumbel top-k over the
    * [[dsirWeights]] log-weights — add an independent Gumbel
    * `g = −ln(−ln u)` to each document's log-weight and take the k
    * largest, which draws k documents WITHOUT replacement from the
    * softmax of the weights (Gumbel-max trick). Greedy always returns
    * the same extreme head; resampling preserves diversity in the tail
    * the way the training-data literature intends.
    *
    * Determinism contract: `u = (h+1)/(2³²+1)` from md5(seed|id) — an
    * exact dyadic rational strictly inside (0,1), so the double tree
    * `⌊−10⁶·ln(−ln u)⌋` is finite and engine-identical (q106's
    * Efraimidis–Spirakis precedent); the integer `score = w_micro +
    * gumbel_micro` then ranks by (score desc, id). Documents absent
    * from [[dsirWeights]] (no grams) carry weight 0 — no evidence
    * either way.
    *
    * Output per corpus document: `(id, n_grams, w_micro, gumbel_micro,
    * score_micro, rank, selected = rank ≤ k)`.
    *
    * 100 TB shape: [[dsirWeights]]'s two gram passes + broadcast
    * log-ratio join; the Gumbel key is map-only and the global rank a
    * range-exchange [[Ranks.globalRank]] over one row per document.
    */
  def dsirResample(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      targetTextCol: String,
      k: Int,
      hashDigits: Int = 3,
      seed: String = "dsir"): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    val w = dsirWeights(corpus, idCol, textCol, target, targetTextCol, hashDigits)
    val u = (conv(substring(md5(concat_ws("|",
      lit(seed), col(idCol).cast("string"))), 1, 8), 16, 10).cast("long") + 1L)
      .cast("double") / 4294967297.0
    val scored = corpus.select(col(idCol)).filter(col(idCol).isNotNull)
      .join(w.select(col(idCol), col("n_grams"), col("w_micro")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("w_micro"), lit(0L)).as("w_micro"),
        floor(lit(-1e6) * log(log(u) * -1.0)).cast("long").as("gumbel_micro"))
      .withColumn("score_micro", col("w_micro") + col("gumbel_micro"))
    Ranks.globalRank(scored,
        Seq(col("score_micro") * -1, col(idCol)), "rank")
      .withColumn("selected", col("rank") <= k)
  }

  def mixingManifest(
      df: DataFrame,
      sourceCol: String,
      unitCol: String,
      weights: Map[String, Double],
      defaultWeight: Double,
      unitBudget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.groupBy(col(sourceCol).as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(unitCol)).cast("long").as("n_units"))
      .withColumn("corpus_share",
        round(col("n_units").cast("double") /
          sum("n_units").over(Window.partitionBy()), 4))
      .withColumn("weight", weights.foldLeft(lit(defaultWeight)) {
        case (acc, (s, w)) => when(col("source") === s, lit(w)).otherwise(acc)
      })
      .withColumn("target_units",
        round(lit(unitBudget.toDouble) * col("weight")).cast("long"))
      .withColumn("epochs",
        round(col("target_units").cast("double") / col("n_units"), 4))
      .withColumn("mode",
        when(col("epochs") > 1.0, lit("upsample")).otherwise(lit("downsample")))
  }

  /** Temporal leave-last-k holdout split — the standard recsys/sequential
    * evaluation protocol: per entity, the last `k` events by event time go
    * to the holdout split, everything earlier trains. Unlike the hashed
    * [[splitAssign]] (which is time-blind), this split respects causality:
    * the model never trains on anything later than what it is evaluated
    * on, per entity. Ties on the timestamp break by `tieCol` DESCENDING
    * (latest id wins a holdout slot) so the assignment is a pure function
    * of the data. Entities with ≤ `k` events land entirely in holdout —
    * filter such cold-start entities beforehand if that is not wanted.
    *
    * 100 TB shape: one row_number window partitioned by the entity key —
    * a single hash shuffle whose partition count scales with entity
    * cardinality (per-entity event lists sort within partitions). No
    * global sort, no collect.
    */
  def leaveLastKSplit(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      k: Int,
      trainName: String = "train",
      holdoutName: String = "test"): DataFrame = {
    require(k > 0, s"k $k must be positive")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("split",
        when(col("__rn") <= k, lit(holdoutName)).otherwise(lit(trainName)))
      .drop("__rn")
  }

  /** EXACT-count stratified split: within every stratum, rows rank by
    * md5(salt|key) and cut at exact quantile positions, so each split
    * receives ⌊n_g·p⌋-exact counts per stratum — unlike [[splitAssign]]'s
    * hash thresholding, whose per-stratum proportions only hold in
    * expectation (a 50-row language can land 60/40 on an 80/20 split;
    * this gives 40/10 every time). Permille fractions keep the cut
    * arithmetic integer-exact; the last named split takes the remainder.
    * Still deterministic and key-stable ACROSS RERUNS of the same
    * stratum content (the md5 order is a pure function of keys), though
    * — unlike hash thresholding — adding rows to a stratum can move
    * earlier keys across the cut: exactness and insertion-stability are
    * a real trade, pick per use case. Returns the input plus `split`.
    *
    * 100 TB shape: ONE window shuffle on the stratum (rank + count share
    * the sort); the label is a pure comparison of rank against
    * integer cut positions — no second pass, no collect.
    */
  def stratifiedExactSplit(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      splits: Seq[(String, Int)],
      salt: String = ""): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.map(_._2).forall(_ > 0), s"permille weights must be positive: $splits")
    require(splits.map(_._2).sum == 1000, s"permille weights must sum to 1000: $splits")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(concat_ws("|", lit(salt), col(keyCol).cast("string"))), col(keyCol))
    val cumPermille = splits.map(_._2).scanLeft(0)(_ + _).tail // cut points
    val labelled = df
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__ng", count(lit(1)).over(Window.partitionBy(col(stratumCol))))
    val label = splits.init.zip(cumPermille).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), acc) =>
        when(col("__rn") <= expr(s"__ng * $cut div 1000"), lit(name)).otherwise(acc)
    }
    labelled.withColumn("split", label).drop("__rn", "__ng")
  }

  /** Group-aware k-fold assignment (GroupKFold at scale): every GROUP —
    * a user, a domain, a dedup cluster — lands wholly in one fold, and
    * folds come out near-balanced by ROW count without the sequential
    * greedy bin-packing loop that cannot be distributed. Groups are
    * ordered by (size desc, group) and dealt out SERPENTINE: fold
    * `pos` on even passes, `k−1−pos` on odd passes, so each fold
    * receives one group from every size stratum — the classic
    * snake-draft guarantee that fold totals differ by at most the
    * largest group in any stratum. Deterministic: a pure function of
    * the group sizes. Returns `(groupCol, n_rows, fold)` for joining
    * back onto the rows.
    *
    * 100 TB shape: one map-side-combined groupBy(group) reduces the
    * corpus to GROUP-cardinality, and the ordering window runs over
    * that already-aggregated table — the global window here is
    * groups-sized, never row-sized (SCALE.md's keyless-window rule).
    */
  def groupFolds(df: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k $k must be >= 2")
    val sizes = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n_rows"))
    val w = Window.orderBy(col("n_rows").desc, col(groupCol))
    sizes.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("fold",
        expr(s"""case when ((__rn - 1) div $k) % 2 = 0
                 then (__rn - 1) % $k
                 else $k - 1 - (__rn - 1) % $k end"""))
      .drop("__rn")
  }

  /** Time-ordered train/test split with a PURGE EMBARGO: train is the
    * first `trainPermille`/1000 of rows by event time, test is
    * everything later than `embargoMs` past the train cutoff, and the
    * embargoed gap between them is labelled and EXCLUDED from both —
    * the leakage guard for models with lagged/windowed features, where
    * a test row just after the cutoff still carries training-period
    * signal in its feature window (the purged split of financial ML).
    * The cutoff is the exact nearest-rank order statistic of
    * (ts, tie) — deterministic under any partitioning. Returns the
    * input plus a `split` column ∈ {train, embargo, test}.
    *
    * 100 TB shape: the cutoff ranks only the two sort columns through
    * [[Ranks.orderStatistics]] (range exchange, column-pruned scan);
    * labelling is then a broadcast of ONE cutoff row and a map-only
    * predicate — the corpus itself never shuffles.
    */
  def temporalEmbargoSplit(
      df: DataFrame,
      tsMsCol: String,
      tieCol: String,
      trainPermille: Int,
      embargoMs: Long): DataFrame = {
    require(trainPermille > 0 && trainPermille < 1000,
      s"trainPermille $trainPermille must lie in (0, 1000)")
    require(embargoMs >= 0, s"embargoMs $embargoMs must be >= 0")
    val base = df.filter(col(tsMsCol).isNotNull)
    val n = base.agg(count(lit(1))).head().getLong(0)
    val pos = math.max(1L, n * trainPermille / 1000L)
    val cut = Ranks.orderStatistics(base, Seq(tsMsCol, tieCol), Seq(pos))
      .select(col(tsMsCol).as("__cut_ts"), col(tieCol).as("__cut_tie"))
    base.crossJoin(broadcast(cut))
      .withColumn("split",
        when(col(tsMsCol) < col("__cut_ts") ||
            (col(tsMsCol) === col("__cut_ts") && col(tieCol) <= col("__cut_tie")),
          lit("train"))
        .when(col(tsMsCol) > col("__cut_ts") + embargoMs, lit("test"))
        .otherwise(lit("embargo")))
      .drop("__cut_ts", "__cut_tie")
  }


  /** Neyman (optimal) stratified-sample allocation — how many of a
    * `budget` of sample slots each stratum gets when the goal is the
    * minimum-variance estimate of the value's mean: `n_h ∝ N_h·S_h`
    * (stratum size × within-stratum standard deviation), the classic
    * survey-sampling result that beats proportional allocation exactly
    * when strata differ in spread — the right way to size eval slices
    * drawn from heterogeneous corpus segments.
    *
    * Exact integer contract: values micro-floor once; the exact
    * decimal(38,0) moments N·Σv² − (Σv)² and N·(N−1) each cast to
    * double ONCE (IEEE round-to-nearest of an exact integer — identical
    * in any engine) and `s_micro = ⌊√(num/den)⌋` is one fixed double
    * tree (q220 contract; an integer `div` here would overflow
    * IntegralDivide's int64 result at micro² magnitudes); single-row
    * strata get s = 0. Weights `w_h = N_h·s_micro` ride decimal(38,0); base
    * quotas `⌊budget·w_h/Σw⌋` and largest-remainder bonuses (ranked by
    * exact integer remainder desc, stratum asc, via the range-exchange
    * [[graft.ops.Ranks.globalRank]] — no keyless window) make the
    * allocations SUM TO BUDGET EXACTLY. Quotas are the raw Neyman
    * numbers: a tiny high-variance stratum can be allocated more rows
    * than it has — the caller clamps and re-runs without saturated
    * strata (the textbook iterative step), which keeps this op a pure
    * deterministic function. Requires Σw > 0 (at least one stratum
    * with spread).
    *
    * Output per stratum: `(stratum, n_rows, s_micro, weight, quota)`,
    * `weight` as int64 (N_h·s_micro < 2⁶³ documented bound — 10¹²
    * rows at s ≤ 9·10⁶ micro).
    *
    * 100 TB shape: ONE map-side-combined groupBy(stratum) over three
    * moments; everything after runs on the model-sized strata table
    * (globalRank's range exchange included).
    */
  def neymanAllocation(
      df: DataFrame,
      stratumCol: String,
      valueCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget $budget must be >= 0")
    val dec = "decimal(38,0)"
    val strata = df
      .filter(col(stratumCol).isNotNull && col(valueCol).isNotNull)
      .select(col(stratumCol).cast("string").as("__s"),
        floor(col(valueCol).cast("double") * 1e6).cast("long").as("__vm"))
      .groupBy("__s")
      .agg(count(lit(1)).as("nh"),
        sum(col("__vm").cast(dec)).as("__sv"),
        sum(expr(s"cast(__vm as $dec) * __vm")).as("__sv2"))
      .withColumn("s_micro", expr(s"""case when nh >= 2 then
          cast(floor(sqrt(
            cast(cast(nh as $dec) * __sv2 - __sv * __sv as double)
              / cast(cast(nh as $dec) * (nh - 1) as double))) as long)
        else 0L end"""))
      .withColumn("__w", expr(s"cast(nh as $dec) * s_micro"))
      .localCheckpoint()
    val tot = strata.agg(sum("__w").as("__tw"))
    val twRow = tot.collect()(0)
    require(!twRow.isNullAt(0) &&
        twRow.getDecimal(0).signum() > 0,
      "neymanAllocation: every stratum has zero spread (or no strata) — " +
        "Neyman weights are all zero; sample proportionally instead")
    val based = strata.crossJoin(broadcast(tot))
      .withColumn("__qb", expr(s"cast($budget as $dec) * __w div __tw"))
      .withColumn("__rem", expr(s"cast($budget as $dec) * __w - __qb * __tw"))
    val spent = based.agg(sum("__qb").as("__spent"))
    val ranked = Ranks.globalRank(
      based.crossJoin(broadcast(spent)),
      Seq(col("__rem").desc, col("__s").asc), "__rk")
    ranked
      .withColumn("quota", expr(s"""cast(__qb +
        (case when __rk <= cast($budget as $dec) - __spent then 1 else 0 end)
        as long)"""))
      .select(col("__s").as("stratum"), col("nh").as("n_rows"),
        col("s_micro"), expr("cast(__w as long)").as("weight"),
        col("quota"))
  }

  /** Kish design effect per stratum — the price of unequal weights: a
    * weighted sample of n rows carries the information of only
    * `ess = (Σw)²/Σw²` unweighted rows, and `deff = n·Σw²/(Σw)² ≥ 1`
    * says how much variance the weighting inflates. The audit to run
    * AFTER any importance-weighted selection ([[dsirWeights]],
    * [[neymanAllocation]], mixture reweighting): deff creeping past ~2
    * means a few huge weights dominate and the effective corpus is a
    * fraction of its row count. The off-policy twin lives in
    * [[graft.ops.Eval.offPolicyValue]]'s ESS diagnostic; this is the
    * per-stratum designed-sampling view.
    *
    * Exactness: weights floor once to micro (w > 0 rows only — zero or
    * negative weights are excluded and counted); Σw and Σw² are exact
    * decimals; `deff_micro = ⌊10⁶·n·Σw²/(Σw)²⌋` and
    * `ess_milli = ⌊10³·(Σw)²/Σw²⌋` are one floor division each
    * (nonneg, truncation = floor). `max_w_share_micro` rides along
    * (largest single weight over Σw) — the "one row IS the stratum"
    * alarm deff alone can hide at large n.
    *
    * Output per stratum: `(stratum, n, n_nonpos, sum_w_micro,
    * deff_micro, ess_milli, max_w_share_micro)`.
    *
    * Overflow: 10⁶·n·Σw² ≤ 10¹⁸·n²·w²_max inside decimal(38,0) to
    * n·w_max ≈ 10¹⁰ — loud decimal NULL past it.
    *
    * 100 TB shape: ONE map-side-combined groupBy(stratum) carrying
    * four moments; output is strata-sized.
    */
  def designEffect(
      df: DataFrame,
      stratumCol: String,
      weightCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    df.filter(col(stratumCol).isNotNull && col(weightCol).isNotNull)
      .select(col(stratumCol).as("stratum"),
        floor(col(weightCol).cast("double") * 1e6).cast("long").as("__w"))
      .groupBy("stratum")
      .agg(count(when(col("__w") > 0, 1)).as("n"),
        count(when(col("__w") <= 0, 1)).as("n_nonpos"),
        sum(when(col("__w") > 0, col("__w")).otherwise(0L).cast(dec))
          .as("__sw"),
        sum(expr(s"""case when __w > 0
          then cast(__w as $dec) * __w else cast(0 as $dec) end"""))
          .as("__sw2"),
        max(when(col("__w") > 0, col("__w"))).as("__wmax"))
      .select(col("stratum"), col("n"), col("n_nonpos"),
        expr("cast(__sw as long)").as("sum_w_micro"),
        expr(s"""cast(case when __sw > 0 then
            cast(n as $dec) * __sw2 * 1000000 div (__sw * __sw)
          end as long)""").as("deff_micro"),
        expr("""cast(case when __sw2 > 0 then
            __sw * __sw * 1000 div __sw2
          end as long)""").as("ess_milli"),
        expr("""cast(case when __sw > 0 then
            cast(__wmax as decimal(38,0)) * 1000000 div __sw
          end as long)""").as("max_w_share_micro"))
  }
}
