package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution: finding rows that NAME the same thing without a
  * shared key — the character-level complement to the token-set
  * similarity join (q113) and MinHash families, which miss short strings
  * where a one-letter typo changes most shingles.
  */
object Entity {

  /** Blocked edit-distance candidate pairs: rows sharing `blockCol` are
    * compared with Levenshtein distance, pairs within `maxDist` survive
    * with `sim_micro = (max_len − dist)·1e6 / max_len` — the normalized
    * similarity downstream clustering (connected components / dedupApply)
    * consumes. Returns `(id_a, id_b, dist, max_len, sim_micro)` with
    * `id_a < id_b` (each unordered pair once).
    *
    * Levenshtein is the exact DP distance in every engine — integer, no
    * replay caveats; sim_micro is one integer divide.
    *
    * 100 TB shape: ONE shuffle on the block key; the pair space is
    * block-local O(Σ b²), so the block choice is the scale knob (a
    * phonetic key, a sorted-neighborhood window, a field prefix — pick
    * one whose largest block is bounded; diagnose with the q112 hot-key
    * report first). Edit distance runs AFTER the `id_a < id_b` and
    * block cut, never all-pairs. Blocks larger than `maxBlock` rows are
    * DROPPED via a broadcast anti-join before pairing — the same recall
    * trade as `Dedup`'s `maxDf`: a hot block (empty soundex, a default
    * value, "unknown") is b²/2 Levenshteins in ONE task and is almost
    * never a real entity; at most n/maxBlock blocks can exceed the cap,
    * so the hot set is broadcastable by definition. Pairs inside a
    * dropped block are not emitted; raise `maxBlock` (or pick a finer
    * block key — see `blockingAudit`) if those matter.
    */
  def fuzzyPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: Column,
      maxDist: Int,
      maxBlock: Long = 10000L): DataFrame = {
    require(maxDist >= 0, s"maxDist $maxDist must be >= 0")
    require(maxBlock >= 2, s"maxBlock $maxBlock must be >= 2")
    val t0 = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(textCol).as("txt"),
        blockCol.as("blk"))
      .filter(col("blk").isNotNull)
    val hot = t0.groupBy(col("blk")).agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > maxBlock)
      .select(col("blk"))
    val t = t0.join(broadcast(hot), Seq("blk"), "left_anti")
    val a = t.select(col("id").as("id_a"), col("txt").as("txt_a"), col("blk"))
    val b = t.select(col("id").as("id_b"), col("txt").as("txt_b"), col("blk"))
    // The scaladoc's "ONE shuffle on the block key" is the contract: force
    // the shuffled hash join so the pair generation + Levenshtein verify
    // run in a REDUCE stage distributed over hash(blk). Left to the
    // planner, a small input side turns this into a broadcast join whose
    // pair DP work all lands inside the (often single-task) scan stage —
    // measured 5.8 s single-core vs distributed at bench scale. At crawl
    // scale both sides exceed the broadcast threshold and the planner
    // picks a shuffle join anyway; the hint only pins SHJ over SMJ (blocks
    // are maxBlock-capped, so per-partition hash builds are bounded).
    a.join(b.hint("shuffle_hash"), Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      // exact prefilter: dist >= |len_a - len_b|, so length-incompatible
      // pairs never run the DP at all — this cheap cut (and id_a < id_b)
      // SHOULD sit in the join condition, so it's written before the
      // barrier below (measured: dropping it costs ~40% at sf0.1)
      .withColumn("len_a", length(col("txt_a")))
      .withColumn("len_b", length(col("txt_b")))
      .filter(abs(col("len_a") - col("len_b")) <= maxDist)
      // pushdown barrier: without it Catalyst folds the distance cut into
      // the join CONDITION, where each comparison re-evaluates its
      // levenshtein and the conjunct order runs the DP before the
      // id_a < id_b cut (measured 2x slower at sf0.1). The
      // non-deterministic column pins the cut above the join: one
      // THRESHOLD-banded levenshtein per surviving pair — O(len·maxDist),
      // exact within maxDist, -1 beyond it, so `dist >= 0` is the whole
      // decision.
      .withColumn("__barrier", monotonically_increasing_id())
      .withColumn("dist", levenshtein(col("txt_a"), col("txt_b"), maxDist))
      .filter(col("dist") >= 0)
      .drop("__barrier")
      .withColumn("max_len", greatest(col("len_a"), col("len_b")))
      .withColumn("sim_micro",
        expr("(max_len - dist) * 1000000L div max_len"))
      .select("id_a", "id_b", "dist", "max_len", "sim_micro")
  }

  /** Blocking-strategy audit: BEFORE running an expensive pairwise
    * matcher ([[fuzzyPairs]], LSH verify), measure what each candidate
    * blocking key would cost — per strategy: block count, candidate
    * pairs Σ b·(b−1)/2, the reduction ratio vs all n·(n−1)/2 pairs
    * (micro; 1e6 = no reduction, the all-pairs disaster), and the
    * biggest block (the straggler task). The strategy table every
    * entity-resolution run should consult first: a blocking key with a
    * million-row block is a cartesian bomb no skew cap fully defuses.
    * NULL block keys are excluded (an unblockable row joins nothing).
    * Returns one row per strategy: `(strategy, n_rows, n_blocks,
    * n_candidate_pairs, reduction_micro, max_block)`.
    *
    * 100 TB shape: per strategy ONE map-side-combined
    * groupBy(block) → block-cardinality table → one-row rollup; the
    * corpus is scanned once per strategy and never pair-expanded —
    * that is the point.
    *
    * Exactness: pair counts can exceed int64 only past ~4.3 billion
    * rows in ONE block — decimal(38,0) internally, so even that
    * pathological audit reports rather than overflows.
    */
  /** Sorted-neighborhood candidate pairs (Hernández–Stolfo SNM): sort
    * the corpus by a fuzzy key and pair each row with its next
    * `window − 1` neighbors in sort order — the classic complement to
    * hash blocking: blocking misses near-matches that straddle a bucket
    * boundary, SNM catches anything the sort brings close (typo'd
    * prefixes, off-by-one lengths), at a GUARANTEED `n·(w−1)` candidate
    * budget that no skewed bucket can blow. The global order comes from
    * [[Ranks.globalRank]] (range exchange, no single-task window) and
    * neighbors join on literal rank offsets — an equi-join on integers,
    * distributed. Returns `(id_a, id_b, gap)` with `id_a`/`id_b` the
    * sort-order earlier/later row and `gap` their rank distance
    * (1 = adjacent). NULL sort keys are excluded.
    *
    * 100 TB shape: one range exchange for the rank, one integer
    * equi-join of the ranked table with its offset explode — pair count
    * is exactly n·(w−1) by construction, the property that makes SNM
    * the bounded-cost ER pass. Multi-pass SNM = union over several sort
    * keys (names, emails reversed, phones), same bound each.
    */
  def sortedNeighborPairs(
      df: DataFrame,
      idCol: String,
      sortKey: Column,
      window: Int): DataFrame = {
    require(window >= 2, s"window $window must be >= 2")
    val ranked = Ranks.globalRank(
      df.select(col(idCol).as("__id"), sortKey.as("__k"))
        .filter(col("__k").isNotNull),
      Seq(col("__k"), col("__id")), "__rn")
    val probes = ranked.select(col("__id").as("id_a"), col("__rn"),
        explode(sequence(lit(1), lit(window - 1))).as("gap"))
      .withColumn("__rn2", col("__rn") + col("gap"))
    probes.join(
        ranked.select(col("__id").as("id_b"), col("__rn").as("__rn2")),
        Seq("__rn2"))
      .select(col("id_a"), col("id_b"), col("gap"))
  }

  def blockingAudit(
      df: DataFrame,
      strategies: Seq[(String, Column)]): DataFrame = {
    require(strategies.nonEmpty, "at least one blocking strategy")
    strategies.map { case (name, keyExpr) =>
      df.select(keyExpr.as("blk"))
        .filter(col("blk").isNotNull)
        .groupBy("blk").agg(count(lit(1)).as("b"))
        .agg(
          sum(col("b")).as("n_rows"),
          count(lit(1)).as("n_blocks"),
          sum(expr("cast(b as decimal(38,0)) * (b - 1) div 2"))
            .as("__pairs"),
          max(col("b")).as("max_block"))
        .select(
          lit(name).as("strategy"),
          coalesce(col("n_rows"), lit(0L)).as("n_rows"),
          col("n_blocks"),
          coalesce(col("__pairs"), lit(0)).cast("long")
            .as("n_candidate_pairs"),
          expr("""case when n_rows > 1 then
              cast(__pairs * 1000000 div
                (cast(n_rows as decimal(38,0)) * (n_rows - 1) div 2) as long)
            end""").as("reduction_micro"),
          col("max_block"))
    }.reduce(_ unionByName _)
  }
}
