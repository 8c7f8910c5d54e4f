package graft

import graft.ops.{Eval, Features, Ranks, Sampling, SemiStructured, Similarity, Skew, TimeSeries}
import org.apache.spark.sql.functions._

/** Behavior specs for the global-rank family and the round-6b operator
  * batch (quantile normalization, group folds, conformal thresholds,
  * range-partition planning, EWMA, anomaly attribution, schema drift,
  * embargo split, mutual NN).
  */
class RankOpsSpec extends SparkSuite {
  import spark.implicits._

  test("globalRank matches a single-partition window rank on any partitioning") {
    val df = spark.range(0, 500).select(
      (col("id") * 37 % 101).as("v"), col("id"))
      .repartition(7)
    val got = Ranks.globalRank(df, Seq(col("v"), col("id")), "r")
      .select("v", "id", "r").as[(Long, Long, Long)].collect().sortBy(_._2)
    val exp = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity).zipWithIndex
      .map { case ((v, id), i) => (v, id, i + 1L) }.sortBy(_._2)
    assert(got.toSeq == exp.toSeq)
  }

  test("orderStatistics returns exactly the requested nearest-rank values") {
    val df = Seq(5L, 1L, 9L, 3L, 7L).toDF("v").withColumn("id", col("v"))
    val got = Ranks.orderStatistics(df, Seq("v", "id"), Seq(1L, 3L, 5L))
      .select("position", "v").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 3L -> 5L, 5L -> 9L))
  }

  test("prefixSum equals the driver cumsum under any partitioning, copies not views") {
    val rnd = new scala.util.Random(3)
    val data = (0 until 500).map(i => (i.toLong, rnd.nextInt(100).toLong))
    val df = data.toDF("id", "x").repartition(7)
    val got = Ranks.prefixSum(df, Seq(col("id")), Seq("x"))
      .select("id", "x_cum").as[(Long, Long)].collect().sortBy(_._1)
    val exp = data.sortBy(_._1).scanLeft((-1L, 0L)) {
      case ((_, acc), (id, x)) => (id, acc + x)
    }.tail
    assert(got.toSeq == exp.toSeq)
  }

  test("ksStatistic is 0 on identical and 1e6 on disjoint distributions") {
    val same = (1 to 50).flatMap(i =>
      Seq(("a", i.toDouble), ("b", i.toDouble))).toDF("g", "v")
    val s0 = Eval.ksStatistic(same, "g", "v", "a", "b")
      .selectExpr("cast(d_scaled as long)", "ks_micro")
      .as[(Long, Long)].collect().head
    assert(s0 == ((0L, 0L)))
    val disj = ((1 to 30).map(i => ("a", i.toDouble)) ++
      (100 to 120).map(i => ("b", i.toDouble))).toDF("g", "v")
    val s1 = Eval.ksStatistic(disj, "g", "v", "a", "b")
      .select("n_a", "n_b", "ks_micro", "at_value")
      .as[(Long, Long, Long, Double)].collect().head
    assert(s1._1 == 30 && s1._2 == 21)
    assert(s1._3 == 1000000L) // full separation
    assert(s1._4 == 30.0)     // the gap peaks at a's last value
  }

  test("ksFromCells survives n_a*n_b > 2^63 (decimal(38,0) products)") {
    // 6e9 rows per side => n_a*n_b = 3.6e19 > Long.MaxValue; the int64
    // route wrapped dd silently. Pre-aggregated cells stand in for the
    // corpus so the overflow is exercised without 1e10 physical rows.
    val cells = Seq(
      (1.0, 5000000000L, 1000000000L),
      (2.0, 1000000000L, 5000000000L)).toDF("v", "ca", "cb")
    val r = Eval.ksFromCells(cells)
      .selectExpr("n_a", "n_b", "cast(d_scaled as string) d_scaled",
        "ks_micro", "at_value")
      .as[(Long, Long, String, Long, Double)].collect().head
    assert(r._1 == 6000000000L && r._2 == 6000000000L)
    assert(r._3 == "24000000000000000000") // |5e9*6e9 - 1e9*6e9| > 2^63
    assert(r._4 == 666666L) // floor(2.4e19 * 1e6 / 3.6e19)
    assert(r._5 == 1.0)
  }

  test("integrityAudit counts orphans and null FKs per relation") {
    import graft.ops.Corpus
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(9L), Some(8L), None)
      .toDF("fk")
    val out = Corpus.integrityAudit(Seq(("c_p", child, "fk", parent, "pk")))
      .select("relation", "n_rows", "n_child", "n_null_fk", "n_orphans",
        "orphan_micro")
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(out == (("c_p", 5L, 4L, 1L, 2L, 500000L)))
  }

  test("stratifiedExactSplit hits exact per-stratum counts every time") {
    val df = ((1 to 100).map(i => ("big", i.toLong)) ++
      (1 to 10).map(i => ("small", 1000L + i))).toDF("g", "id")
    val out = Sampling.stratifiedExactSplit(df, "g", "id",
      Seq(("train", 800), ("test", 200)))
    val counts = out.groupBy("g", "split").count()
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(counts == Map(
      ("big", "train") -> 80L, ("big", "test") -> 20L,
      ("small", "train") -> 8L, ("small", "test") -> 2L))
    // deterministic: same call, same assignment
    val again = Sampling.stratifiedExactSplit(df, "g", "id",
      Seq(("train", 800), ("test", 200)))
      .select("id", "split").as[(Long, String)].collect().toMap
    val first = out.select("id", "split").as[(Long, String)].collect().toMap
    assert(again == first)
  }

  test("knnLabelAudit flags the row whose neighbors outvote its label") {
    // three tight clusters of label 0 around (1,0), label 1 around (0,1);
    // one label-1 point sitting inside the label-0 cluster gets flagged
    val pts = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.99f, 0.01f), 0),
      (3L, Array(0.98f, 0.02f), 0), (4L, Array(0.97f, 0.01f), 0),
      (5L, Array(0.0f, 1.0f), 1), (6L, Array(0.01f, 0.99f), 1),
      (7L, Array(0.02f, 0.98f), 1),
      (8L, Array(0.96f, 0.03f), 1)) // mislabeled
    val out = Eval.knnLabelAudit(pts.toDF("id", "v", "lab"), "id", "v", "lab", k = 3)
      .select("id", "knn_label", "n_agree", "flagged")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(8L)._2 == 0L && out(8L)._3 == 0L && out(8L)._4)
    assert(!out(1L)._4 && !out(5L)._4)
    assert(out.size == 8)
  }

  test("quantileNormalize maps a uniform group onto the global distribution") {
    // group a: values 0..9, group b: values 100..109. Global sorted =
    // a's then b's; each group of 10 maps rank r to global position 2r.
    val df = (0 until 10).map(i => (i.toLong, "a", i.toDouble)) ++
      (0 until 10).map(i => (i + 10L, "b", 100.0 + i))
    val out = Features.quantileNormalize(
      df.toDF("id", "grp", "score"), "id", "grp", "score")
      .select("id", "norm_value").as[(Long, Double)].collect().toMap
    // rank r in group of 10, N=20 → position 2r → a's rank 5 (value 4)
    // lands on global position 10 = a's max (9.0)
    assert(out(4L) == 9.0)
    // b's rank 10 (value 109) → position 20 → global max 109
    assert(out(19L) == 109.0)
    // a's rank 10 (value 9) → position 20 → 109 (the whole-distribution top)
    assert(out(9L) == 109.0)
  }

  test("groupFolds deals groups out serpentine and balances row counts") {
    // 12 groups with sizes 12, 11, ..., 1 over k=3:
    // pass 1 (sizes 12,11,10) → folds 0,1,2; pass 2 (9,8,7) → 2,1,0; ...
    val rows = (1 to 12).flatMap(g => Seq.fill(13 - g)(g.toLong))
    val folds = Sampling.groupFolds(rows.toDF("g"), "g", 3)
      .select("g", "fold").as[(Long, Long)].collect().toMap
    assert(folds(1L) == 0 && folds(2L) == 1 && folds(3L) == 2)
    assert(folds(4L) == 2 && folds(5L) == 1 && folds(6L) == 0)
    val totals = Sampling.groupFolds(rows.toDF("g"), "g", 3)
      .groupBy("fold").agg(sum("n_rows").as("t"))
      .select("t").as[Long].collect().sorted
    assert(totals.max - totals.min <= 2, s"unbalanced: ${totals.toSeq}")
  }

  test("conformalThreshold picks the finite-sample quantile index and audits coverage") {
    // 9 calibration scores 1..9, alpha=10% → idx = ceil(10*0.9) = 9 → threshold 9
    val cal = (1 to 9).map(i => ("g", i.toDouble, i.toLong))
      .toDF("grp", "s", "id")
    val test9 = Seq(("g", 5.0, 100L), ("g", 9.5, 101L)).toDF("grp", "s", "id")
    val out = Eval.conformalThreshold(cal, test9, "grp", "s", "id", 100)
      .select("n_cal", "q_index", "threshold", "n_test", "n_covered")
      .as[(Long, Long, Double, Long, Long)].collect()
    assert(out.toSeq == Seq((9L, 9L, 9.0, 2L, 1L)))
  }

  test("rangePartitionPlan boundaries are exact and the audit counts every row once") {
    val df = spark.range(0, 1000).select(
      (col("id") * 7919 % 1000).as("v"), col("id"))
    val plan = Skew.rangePartitionPlan(df.toDF("v", "id"), "v", "id", 4)
      .select("partition_id", "n_rows").as[(Int, Long)].collect().toMap
    assert(plan.values.sum == 1000)
    assert(plan.size == 4)
    // exact boundaries ⇒ perfectly balanced on distinct values
    assert(plan.values.forall(n => n == 250), s"plan: $plan")
  }

  test("ewmaPow2 equals the brute-force truncated binary decay") {
    val rows = Seq((1L, 10L, 1L, 1.0), (1L, 20L, 2L, 3.0), (1L, 30L, 3L, 2.0))
    val out = TimeSeries.ewmaPow2(
      rows.toDF("k", "ts", "id", "v"), "k", "ts", "id", "v", lookback = 2)
      .orderBy("ts").selectExpr("cast(ewma_num as long)", "ewma_den")
      .as[(Long, Long)].collect().toSeq
    // L=2: weights 4,2,1 for lags 0,1,2 on micro values 1e6, 3e6, 2e6
    assert(out == Seq(
      (4000000L, 4L),                      // 4·1e6 / 4
      (4L * 3000000 + 2L * 1000000, 6L),   // 4·3e6 + 2·1e6 / 6
      (4L * 2000000 + 2L * 3000000 + 1000000L, 7L)))
  }

  test("ewmaPow2 at lookback=40 with |value| = 1e8 does not wrap") {
    // v_micro = ±1e14; the lag-0 weight is 2^40, so the first term alone
    // is ~1.1e26 — past 2^63. The int64 route wrapped silently here.
    val rows = Seq((1L, 10L, 1L, 1e8), (1L, 20L, 2L, -1e8))
    val out = TimeSeries.ewmaPow2(
      rows.toDF("k", "ts", "id", "v"), "k", "ts", "id", "v", lookback = 40)
      .orderBy("ts").selectExpr("cast(ewma_num as string)", "ewma_den")
      .as[(String, Long)].collect().toSeq
    val v = BigInt(10).pow(14)
    val exp = Seq(
      ((v * (BigInt(1) << 40)).toString, 1L << 40),
      ((-v * (BigInt(1) << 40) + v * (BigInt(1) << 39)).toString,
        (1L << 40) + (1L << 39)))
    assert(out == exp)
  }

  test("anomalyAttribution picks the most deviating column deterministically") {
    // b is wildly off for id 3; a for id 4
    val df = Seq(
      (1L, 10.0, 100.0), (2L, 11.0, 101.0), (3L, 10.5, 500.0),
      (4L, 90.0, 100.5), (5L, 10.2, 100.2)).toDF("id", "a", "b")
    val out = Eval.anomalyAttribution(df, "id", Seq("a", "b"))
      .select("id", "top_col").as[(Long, String)].collect().toMap
    assert(out(3L) == "b")
    assert(out(4L) == "a")
  }

  test("schemaDrift labels added/removed/type_changed/share_shifted/stable") {
    val oldDf = (1 to 10).map(i =>
      s"""{"id":$i,"gone":"x","b":${i % 2 == 0},"s":$i}""").toDF("p")
    val newDf = (1 to 10).map { i =>
      val sPart = if (i <= 3) s""","s":$i""" else ""
      s"""{"id":$i,"fresh":"y","b":"no"$sPart}"""
    }.toDF("p")
    val st = SemiStructured.schemaDrift(oldDf, newDf, "p")
      .select("key", "status").as[(String, String)].collect().toMap
    assert(st == Map(
      "id" -> "stable", "gone" -> "removed", "fresh" -> "added",
      "b" -> "type_changed", "s" -> "share_shifted"))
  }

  test("temporalEmbargoSplit purges the embargo window between train and test") {
    val df = (1 to 10).map(i => (i.toLong, i * 1000L)).toDF("id", "ts")
    // 70% of 10 → cutoff at rank 7 (ts 7000); embargo 1500ms → test > 8500
    val out = Sampling.temporalEmbargoSplit(df, "ts", "id", 700, 1500L)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert((1 to 7).forall(i => out(i.toLong) == "train"))
    assert(out(8L) == "embargo")
    assert(out(9L) == "test" && out(10L) == "test")
  }

  test("mutualTop1 keeps only reciprocal nearest-neighbor pairs") {
    // 1↔2 mutual; 3's NN is 2 but 2's NN is 1 → 3 excluded
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f)),
      (3L, Array(0.8f, 0.4f))).toDF("id", "v")
    val out = Similarity.mutualTop1(df, "id", "v")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L)))
  }

  test("wilcoxonSignedRank: hand W+, matched-pairs effect, zero drop") {
    // diffs +3, −1, +2 (plus one zero pair, dropped): |d| ranks 3,1,2 →
    // W+ = 5, rb = (5−1)/6 = 0.6666, z = 4/√14 → 1069 milli
    val df = Seq((4.0, 1.0), (2.0, 3.0), (5.0, 3.0), (7.0, 7.0))
      .toDF("a", "b")
    val out = Features.wilcoxonSignedRank(df, "a", "b")
      .select("n_pairs", "n_zero", "w_plus", "rank_biserial_micro",
        "z_milli")
      .as[(Long, Long, Double, Option[Long], Option[Long])].collect().head
    assert(out == ((3L, 1L, 5.0, Some(666666L), Some(1069L))), s"$out")
    // all-zero diffs: no pairs survive → NULL stats
    val z = Features.wilcoxonSignedRank(
      Seq((1.0, 1.0)).toDF("a", "b"), "a", "b")
      .select("n_pairs", "rank_biserial_micro")
      .collect().head
    assert(z.getLong(0) == 0L && z.isNullAt(1))
  }

  test("mannWhitney: exact U, Cliff's delta, tie-corrected z by hand") {
    // A{1,2} B{3,4}: A loses every pair → U_A = 0, delta = −1e6;
    // z = −4/√(20/12·4... ) = −1.54919 → floor milli −1550
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0))
      .toDF("g", "v")
    val out = Features.mannWhitney(df, "g", "v")
      .select("grp_a", "grp_b", "n_a", "n_b", "u_a", "u_b",
        "rank_biserial_micro", "z_milli")
      .as[(String, String, Long, Long, Double, Double, Long, Option[Long])]
      .collect().head
    assert(out == (("A", "B", 2L, 2L, 0.0, 4.0, -1000000L, Some(-1550L))),
      s"$out")
    // tied crossing case: A{1,3} B{2,3}: pairs — (1<2),(1<3),(3>2),
    // (3=3 half) → U_A = 1.5, delta = (3 − 4)/4 = −0.25
    val t = Features.mannWhitney(
        Seq(("A", 1.0), ("A", 3.0), ("B", 2.0), ("B", 3.0)).toDF("g", "v"),
        "g", "v")
      .select("u_a", "rank_biserial_micro")
      .as[(Double, Long)].collect().head
    assert(t == ((1.5, -250000L)), s"$t")
    intercept[IllegalArgumentException] {
      Features.mannWhitney(Seq(("A", 1.0)).toDF("g", "v"), "g", "v")
    }
  }

  test("kruskalWallis: hand H with and without ties") {
    // A{1,2} B{3,4}: ranks 1..4, ΣR²g/ng = 29 → H = 12/20·29 − 15 = 2.4;
    // in IEEE doubles 12·29/20 = 17.399999999999999, so the contractual
    // floored milli is 2399 — the same value every engine computes
    val clean = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0))
      .toDF("g", "v")
    val c = Features.kruskalWallis(clean, "g", "v")
      .select("n", "n_groups", "h_milli")
      .as[(Long, Long, Long)].collect().head
    assert(c == ((4L, 2L, 2399L)), s"$c")
    // A{1,1} B{2,2}: H0 = 2.4, tie term 12, C = 0.8 → H = 3.0 (2.999…
    // in doubles → 2999 floored)
    val tied = Seq(("A", 1.0), ("A", 1.0), ("B", 2.0), ("B", 2.0))
      .toDF("g", "v")
    val t = Features.kruskalWallis(tied, "g", "v")
      .select("tie_sum", "h_milli")
      .as[(java.math.BigDecimal, Long)].collect().head
    assert(t._1.longValueExact() == 12L && t._2 == 2999L, s"$t")
    // all values identical → C = 0 → NULL
    val flat = Features.kruskalWallis(
      Seq(("A", 5.0), ("B", 5.0)).toDF("g", "v"), "g", "v")
      .select("h_milli").collect().head
    assert(flat.isNullAt(0))
  }

  test("anovaEta: hand-computed variance decomposition") {
    // A: 1,2,3 (mean 2); B: 4,5,6 (mean 5): SSB = 13.5e12 micro²,
    // SST = 17.5e12, SSW = 4e12 → η² = 0.771428, F = 13.5
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 4.0), ("B", 5.0), ("B", 6.0)).toDF("c", "v")
    val out = Features.anovaEta(df, "c", "v")
      .select("n", "n_groups", "eta2_micro", "f_milli")
      .as[(Long, Long, Long, Long)].collect().head
    assert(out == ((6L, 2L, 771428L, 13500L)), s"$out")
    // degenerate: a single group yields NULL stats
    val one = Features.anovaEta(
      Seq(("A", 1.0), ("A", 2.0)).toDF("c", "v"), "c", "v")
      .select("eta2_micro").collect().head
    assert(one.isNullAt(0))
  }

  test("spearmanMatrix: exact midranks — monotone → 1e6, ties by hand") {
    // y = x³ is nonlinear but monotone → Spearman exactly +1; z reverses
    val mono = Seq((1L, 1.0, 1.0, 9.0), (2L, 2.0, 8.0, 4.0),
      (3L, 3.0, 27.0, 1.0)).toDF("id", "x", "y", "z")
    val m = Features.spearmanMatrix(mono, "id", Seq("x", "y", "z"))
      .select("col_a", "col_b", "spearman_micro")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(m(("x", "y")) == 1000000L && m(("x", "z")) == -1000000L)
    // tie case: x = 1,2,2,3 (doubled midranks 2,5,5,8), y strictly
    // increasing → centered cov 18, var 18/20 → ρ = 18/√360 → 948683
    val ties = Seq((1L, 1.0, 1.0), (2L, 2.0, 4.0), (3L, 2.0, 9.0),
      (4L, 3.0, 16.0)).toDF("id", "x", "y")
    val t = Features.spearmanMatrix(ties, "id", Seq("x", "y"))
      .select("n", "spearman_micro").as[(Long, Long)].collect().head
    assert(t == ((4L, 948683L)), s"$t")
  }

  test("spearmanMatrix matches an in-memory midrank reference on random ties") {
    def refSpearman(xs: Seq[Double], ys: Seq[Double]): Long = {
      def mid2(v: Seq[Double]): Seq[Long] = {
        // doubled midranks: 2*start + cnt - 1 per value group
        val sorted = v.sorted
        val start = sorted.zipWithIndex.groupBy(_._1)
          .map { case (x, g) => x -> (g.map(_._2).min + 1).toLong }
        val cnt = v.groupBy(identity).map { case (x, g) => x -> g.size.toLong }
        v.map(x => 2 * start(x) + cnt(x) - 1)
      }
      val n = xs.size
      val (ax, ay) = (mid2(xs).map(_ - (n + 1)), mid2(ys).map(_ - (n + 1)))
      val cov = ax.zip(ay).map { case (a, b) => BigInt(a) * b }.sum
      val va = ax.map(a => BigInt(a) * a).sum
      val vb = ay.map(b => BigInt(b) * b).sum
      math.floor(1e6 * cov.toDouble /
        math.sqrt(va.toDouble * vb.toDouble)).toLong
    }
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed + 900)
      val n = 40
      // coarse values force plenty of ties
      val xs = Seq.fill(n)((rnd.nextInt(8) + 1).toDouble)
      val ys = Seq.fill(n)((rnd.nextInt(6) + 1).toDouble)
      val df = xs.zip(ys).zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x, y) }.toDF("id", "x", "y")
      val got = Features.spearmanMatrix(df, "id", Seq("x", "y"))
        .select("spearman_micro").as[Long].collect().head
      assert(got == refSpearman(xs, ys), s"seed=$seed")
    }
  }

  test("annotatorConsensus: reliability re-vote flips a bad majority") {
    // calibration items 1-4: A,B,E say g; C,D say b → majority g, so
    // A/B/E earn high weights and C/D low ones. Item 5 has only A (g)
    // vs C,D (b): raw majority is b, but the weighted re-vote flips to
    // g — exactly the "two random clickers outvote one expert" fix.
    val rows =
      (1 to 4).flatMap(i => Seq((i.toLong, "A", "g"), (i.toLong, "B", "g"),
        (i.toLong, "E", "g"), (i.toLong, "C", "b"), (i.toLong, "D", "b"))) ++
      Seq((5L, "A", "g"), (5L, "C", "b"), (5L, "D", "b"))
    val out = Eval.annotatorConsensus(rows.toDF("item", "ann", "lab"),
        "item", "ann", "lab")
      .select("item", "n_annotations", "majority_label", "consensus_label",
        "confidence_micro", "changed")
      .as[(Long, Long, String, String, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    (1L to 4L).foreach { i =>
      val r = out(i)
      assert(r._3 == "g" && r._4 == "g" && !r._6, s"item $i: $r")
    }
    val r5 = out(5L)
    assert(r5._2 == 3L && r5._3 == "b" && r5._4 == "g" && r5._6, s"$r5")
    // w_A = (4+1)e6 div 7 = 714285; w_C = w_D = (1+1)e6 div 7 = 285714
    val conf = (BigInt(714285) * 1000000 / BigInt(714285 + 2 * 285714)).toLong
    assert(r5._5 == conf, s"confidence ${r5._5} vs $conf")
  }

  test("rfmSegments: aligned metrics give diagonal quintile codes") {
    // customer i: i events, last day i*10, total i² dollars → all three
    // ranks agree, so scores are (i,i,i) and rfm_code = 111·i
    val rows = for (i <- 1 to 5; j <- 0 until i)
      yield (i.toLong, (i * 10 - j).toLong, i.toDouble)
    val out = Features.rfmSegments(rows.toDF("c", "d", "a"), "c", "d", "a", 5)
      .select("entity", "last_active", "n_events", "monetary_micro",
        "r_score", "f_score", "m_score", "rfm_code")
      .as[(Long, Long, Long, Long, Int, Int, Int, Int)]
      .collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (1L to 5L))
    out.foreach { r =>
      val i = r._1.toInt
      assert(r._2 == i * 10 && r._3 == i && r._4 == i.toLong * i * 1000000L, s"$r")
      assert((r._5, r._6, r._7, r._8) == ((i, i, i, 111 * i)), s"$r")
    }
  }

  test("knnShapley matches the closed-form recurrence by hand (k=1)") {
    // val point (1,0) y=1; train ranked t1 (cos .9988, y=1),
    // t2 (.8944, y=0), t3 (0, y=1). Recurrence, K=1:
    //   s3 = 1·1e6 div 3             = 333333
    //   s2 = s3 + (0−1)·(1e6 div 2)  = −166667
    //   s1 = s2 + (1−0)·(1e6 div 1)  = 833333
    // nearest-correct is worth most; the wrong point in between is
    // negative; Σ ≈ 1e6 = utility(full) − utility(∅).
    val train = Seq(
      (1L, Array(1.0f, 0.05f), 1L),
      (2L, Array(1.0f, 0.5f), 0L),
      (3L, Array(0.0f, 1.0f), 1L)).toDF("id", "v", "y")
    val valSet = Seq((100L, Array(1.0f, 0.0f), 1L)).toDF("id", "v", "y")
    val out = Eval.knnShapley(train, valSet, "id", "v", "y", k = 1)
      .select("id", "label", "n_val", "shapley_sum_micro", "shapley_micro")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, 833333L, 833333L),
      (2L, 0L, 1L, -166667L, -166667L),
      (3L, 1L, 1L, 333333L, 333333L)))
  }

  test("gainsCurve: perfect score ordering captures all positives in " +
      "the top slice at 2x lift") {
    // scores 4,3,2,1; both positives carry the two highest scores.
    // halves: top bucket has all positives → gain 1e6, lift 2000 milli;
    // bottom adds none → gain stays 1e6, lift decays to 1000 (= random)
    val df = Seq((1L, 4.0, true), (2L, 3.0, true),
      (3L, 2.0, false), (4L, 1.0, false)).toDF("id", "s", "y")
    val out = Eval.gainsCurve(df, "id", "s", "y", buckets = 2)
      .select("bucket", "n", "n_pos", "cum_n", "cum_pos", "gain_micro",
        "lift_milli")
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (0, 2L, 2L, 2L, 2L, 1000000L, 2000L),
      (1, 2L, 0L, 4L, 2L, 1000000L, 1000L)))
    // anti-ordered scores: top bucket captures nothing
    val bad = Eval.gainsCurve(
      Seq((1L, 4.0, false), (2L, 3.0, false), (3L, 2.0, true),
        (4L, 1.0, true)).toDF("id", "s", "y"), "id", "s", "y", 2)
      .select("bucket", "gain_micro").as[(Int, Long)].collect().sortBy(_._1)
    assert(bad.toSeq == Seq((0, 0L), (1, 1000000L)))
  }
}
