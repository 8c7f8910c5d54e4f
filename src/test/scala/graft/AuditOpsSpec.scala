package graft

import graft.ops.{Cluster, Corpus, Entity, Survival, TimeSeries}
import org.apache.spark.sql.functions._

/** Behavior specs for the audit/robust-statistics operator batch:
  * Theil–Sen trend, Benford first-digit audit, blocking audit,
  * purity/NMI, seasonal profile.
  */
class AuditOpsSpec extends SparkSuite {
  import spark.implicits._

  test("theilSen takes the median pairwise slope, immune to one outlier point") {
    // key 1: y = 2t exactly except one wild outlier at t=4 — the median
    // of the 10 pairwise slopes must stay 2.0 (least squares would not).
    val pts = Seq(
      (1L, 0L, 0L), (1L, 1L, 2000000L), (1L, 2L, 4000000L),
      (1L, 3L, 6000000L), (1L, 4L, 900000000L))
    val out = TimeSeries.theilSen(pts.toDF("k", "t", "v"), "k", "t", "v")
      .select("n_points", "n_pairs", "slope_per_ms")
      .as[(Long, Long, Double)].collect()
    assert(out.length == 1)
    val (np, m, slope) = out.head
    assert(np == 5 && m == 10)
    assert(slope == 2000000.0, s"median slope $slope")
  }

  test("theilSen caps points per key deterministically and needs >= 2 points") {
    val single = Seq((1L, 0L, 5L)).toDF("k", "t", "v")
    assert(TimeSeries.theilSen(single, "k", "t", "v").count() == 0)
    val many = (0 until 20).map(i => (1L, i.toLong, i.toLong)).toDF("k", "t", "v")
    val capped = TimeSeries.theilSen(many, "k", "t", "v", maxPoints = 4)
      .select("n_points", "n_pairs").as[(Long, Long)].collect().head
    assert(capped == ((4L, 6L))) // earliest 4 points → C(4,2) pairs
  }

  test("benford reports exact shares against the hardcoded log-law table") {
    // 30 values with first digit 1, 10 with first digit 2
    val rows = Seq.fill(30)(("g", 12.3)) ++ Seq.fill(10)(("g", 250.0))
    val out = Corpus.benford(rows.toDF("grp", "v"), "grp", "v")
      .select("digit", "n", "n_group", "share_micro", "benford_micro")
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1, 30L, 40L), (2, 10L, 40L)))
    assert(out(0)._4 == 750000L && out(1)._4 == 250000L)
    assert(out(0)._5 == 301029L && out(1)._5 == 176091L)
    // sub-unit values keep their leading significant digit via centi-scaling
    val small = Corpus.benford(Seq(("g", 0.07)).toDF("grp", "v"), "grp", "v")
      .select("digit").as[Int].collect()
    assert(small.toSeq == Seq(7))
  }

  test("sprtBernoulli stops at the first boundary crossing, exactly") {
    import graft.ops.Features
    val spark2 = spark
    import spark2.implicits._
    // llr +3/-2, boundaries +7/-7. Key A: T T T (3,6,9) crosses up at
    // step 3; later rows must not move the decision. Key B: F F F F
    // (-2,-4,-6,-8) crosses down at step 4. Key C: T F (3,1) never
    // crosses.
    val rows = Seq(
      ("A", 1L, true), ("A", 2L, true), ("A", 3L, true), ("A", 4L, false),
      ("B", 1L, false), ("B", 2L, false), ("B", 3L, false), ("B", 4L, false),
      ("C", 1L, true), ("C", 2L, false))
    val out = Features.sprtBernoulli(
      rows.toDF("k", "t", "o").withColumn("tie", col("t")),
      "k", "t", "tie", "o",
      llrPosMicro = 3L, llrNegMicro = -2L, upperMicro = 7L, lowerMicro = -7L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_obs"), r.getAs[Long]("llr_final_micro"),
          Option(r.getAs[String]("decision")),
          Option(r.getAs[Any]("n_at_decision")).map(_.asInstanceOf[Long]),
          Option(r.getAs[Any]("llr_at_decision_micro"))
            .map(_.asInstanceOf[Long]))).toMap
    assert(out("A") == ((4L, 7L, Some("accept_h1"), Some(3L), Some(9L))))
    assert(out("B") == ((4L, -8L, Some("accept_h0"), Some(4L), Some(-8L))))
    assert(out("C") == ((2L, 1L, None, None, None)))
  }

  test("classCentroids: exact integer centroids, cosine to the global mean") {
    import graft.ops.Similarity
    val spark2 = spark
    import spark2.implicits._
    // label x: (1,0),(3,0) → centroid (2e6, 0); label y: (0,2) →
    // centroid (0, 2e6). Global over 3 rows: ((1+3)/3, 2/3) →
    // (1333333, 666666) micro.
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), "x"), (2L, Seq(3.0f, 0.0f), "x"),
      (3L, Seq(0.0f, 2.0f), "y"))
      .toDF("id", "vec", "label")
    val out = Similarity.classCentroids(df, "id", "vec", "label")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("norm_micro"),
          r.getAs[Long]("cos_global_micro"))).toMap
    assert(out("x")._1 == 2L && out("y")._1 == 1L)
    assert(out("x")._2 == 2000000L && out("y")._2 == 2000000L)
    val g = (1333333.0, 666666.0)
    val gn = math.sqrt(g._1 * g._1 + g._2 * g._2)
    val cx = math.floor(1e6 * (2e6 * g._1) / (2e6 * gn)).toLong
    val cy = math.floor(1e6 * (2e6 * g._2) / (2e6 * gn)).toLong
    assert(out("x")._3 == cx && out("y")._3 == cy)
  }

  test("crossSplitContamination reports only cross-split near-dups") {
    import graft.ops.Dedup
    val spark2 = spark
    import spark2.implicits._
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq(
      (1L, text, "train"),            // near-dup of the eval doc
      (2L, text + " extra", "train"), // also similar
      (3L, text, "eval"),
      (4L, text, "train"),            // train↔train dup: must NOT appear
      (5L, "totally different words entirely unrelated content here now", "eval"))
      .toDF("doc_id", "text", "split")
    val out = Dedup.crossSplitContamination(
      df, "doc_id", "text", "split", "eval", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("best_jaccard"), r.getLong(3)))
    assert(out.length == 1, s"only the eval doc may be reported: ${out.toSeq}")
    val (evalId, n, bj, best) = out.head
    assert(evalId == 3L && n >= 2)
    assert(bj == 1.0 && (best == 1L || best == 4L) && best == 1L,
      s"best must be the identical doc with the smallest id, got $best")
  }

  test("sortedNeighborPairs pairs each row with its next w-1 sort neighbors, exactly") {
    // sort by key: ids 3(aa) < 1(ab) < 4(ac) < 2(zz); window 3
    val df = Seq((1L, "ab"), (2L, "zz"), (3L, "aa"), (4L, "ac")).toDF("id", "k")
    val out = Entity.sortedNeighborPairs(df, "id", col("k"), window = 3)
      .select("id_a", "id_b", "gap").as[(Long, Long, Int)].collect().toSet
    assert(out == Set(
      (3L, 1L, 1), (3L, 4L, 2), (1L, 4L, 1), (1L, 2L, 2), (4L, 2L, 1)))
    // candidate budget is exactly n(w-1) - (w-1)w/2 tail loss: 4*2 - 3 = 5
    assert(out.size == 5)
  }

  test("blockingAudit counts candidate pairs and flags the straggler block") {
    // strategy A: blocks of 3 and 2 → 3+1 pairs; strategy B: one block of 5
    val df = Seq("x", "x", "x", "y", "y").toDF("b")
    val out = Entity.blockingAudit(df, Seq(
      "by_b" -> col("b"),
      "all_one" -> lit("z")))
      .select("strategy", "n_rows", "n_blocks", "n_candidate_pairs",
        "reduction_micro", "max_block")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("by_b") == (("by_b", 5L, 2L, 4L, 400000L, 3L)))
    assert(out("all_one") == (("all_one", 5L, 1L, 10L, 1000000L, 5L)))
  }

  test("purityNmi is perfect on aligned labels and ~0 on independent ones") {
    val aligned = Seq(("c1", "a"), ("c1", "a"), ("c2", "b"), ("c2", "b"))
    val pa = Cluster.purityNmi(aligned.toDF("c", "l"), "c", "l")
      .select("purity_micro", "nmi_milli").as[(Long, Long)].collect().head
    assert(pa._1 == 1000000L)
    assert(pa._2 >= 995L && pa._2 <= 1000L, s"nmi ${pa._2}")
    // independent: every (cluster, label) cell equal → MI 0
    val indep = for (c <- Seq("c1", "c2"); l <- Seq("a", "b")) yield (c, l)
    val pi = Cluster.purityNmi(indep.toDF("c", "l"), "c", "l")
      .select("purity_micro", "nmi_milli").as[(Long, Long)].collect().head
    assert(pi._1 == 500000L)
    assert(pi._2 == 0L, s"independent nmi ${pi._2}")
  }

  test("adjustedRand: identical 1000, hand -111 replay, degenerate NULL") {
    val same = Seq(("c1", "a"), ("c1", "a"), ("c2", "b"))
    val r1 = Cluster.adjustedRand(same.toDF("c", "l"), "c", "l")
      .select("ari_milli").as[Long].collect().head
    assert(r1 == 1000L)
    // classic 2x2: cells (A,X)=2 (A,Y)=1 (B,X)=1 (B,Y)=2; T=15, Sab=2,
    // Sa=Sb=6 -> num=2*(30-36)=-12, den=180-72=108 -> trunc(-12000/108)=-111
    val cross = Seq(("A", "X"), ("A", "X"), ("A", "Y"),
      ("B", "X"), ("B", "Y"), ("B", "Y"))
    val r2 = Cluster.adjustedRand(cross.toDF("c", "l"), "c", "l").collect()(0)
    assert(r2.getLong(0) == 6L && r2.getLong(3) == 2L &&
      r2.getLong(4) == 6L && r2.getLong(5) == 6L, r2.toString)
    assert(r2.getLong(6) == -111L, r2.toString)
    // all singletons on both sides: no pair structure -> den 0 -> NULL
    val single = Seq(("c1", "a"), ("c2", "b"))
    assert(Cluster.adjustedRand(single.toDF("c", "l"), "c", "l")
      .collect()(0).isNullAt(6))
  }

  test("bcubed: hand 5/9-precision replay, perfect 1.0") {
    // one cluster {x,x,y}: P = (4/3+1/3)/3 = 5/9, R = 1
    val df = Seq(("c1", "x"), ("c1", "x"), ("c1", "y")).toDF("c", "l")
    val r = Cluster.bcubed(df, "c", "l").collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L && r.getLong(2) == 2L,
      r.toString)
    val p = (BigInt(4000000) / 3 + BigInt(1000000) / 3) / 3
    assert(r.getLong(3) == p.toLong, r.toString)
    assert(r.getLong(4) == 1000000L, r.toString)
    val f = BigInt(2) * p * 1000000 / (p + 1000000)
    assert(r.getLong(5) == f.toLong, r.toString)
    // perfect partition match
    val perfect = Seq(("c1", "x"), ("c1", "x"), ("c2", "y"))
    val rp = Cluster.bcubed(perfect.toDF("c", "l"), "c", "l").collect()(0)
    assert(rp.getLong(3) == 1000000L && rp.getLong(4) == 1000000L &&
      rp.getLong(5) == 1000000L, rp.toString)
  }

  test("multiKeyClusters merges across evidence types transitively, capped buckets drop out") {
    import graft.ops.Dedup
    // 1-2 share key A; 2-3 share key B (different evidence) → {1,2,3} one
    // cluster. 4 alone. 5,6,7 share an over-common value under maxBucket=2
    // → no evidence, all singletons.
    val df = Seq(
      (1L, "a1", "x1"), (2L, "a1", "b1"), (3L, "zz", "b1"), (4L, "q", "r"),
      (5L, "hot", "s5"), (6L, "hot", "s6"), (7L, "hot", "s7"))
      .toDF("id", "k1", "k2")
    val out = Dedup.multiKeyClusters(df, "id",
      Seq("k1" -> col("k1"), "k2" -> col("k2")), maxBucket = 2)
      .select("id", "cluster", "is_canonical")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 4L, true),
      (5L, 5L, true), (6L, 6L, true), (7L, 7L, true)))
  }

  test("plannedRangeWrite produces p sorted, range-disjoint, balanced files") {
    import graft.ops.Skew
    val rnd = new scala.util.Random(7)
    val df = (0 until 1000).map(i => (rnd.nextInt(100000), i.toLong))
      .toDF("v", "id")
    val out = s"${SparkSuite.tmpDir}/prw_out"
    Skew.plannedRangeWrite(df, "v", "id", p = 4, out)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    assert(files.length == 4, s"expected 4 part files, got ${files.length}")
    val perFile = files.map { f =>
      val rows = spark.read.parquet(f.getAbsolutePath)
        .select("v", "id").as[(Int, Long)].collect()
      assert(rows.sameElements(rows.sortBy(r => (r._1, r._2))),
        s"${f.getName} not sorted")
      (rows.length, rows.map(r => (r._1, r._2)).min, rows.map(r => (r._1, r._2)).max)
    }
    assert(perFile.map(_._1).sum == 1000)
    assert(perFile.map(_._1).max - perFile.map(_._1).min <= 1,
      s"unbalanced: ${perFile.map(_._1).toSeq}")
    perFile.sliding(2).foreach {
      case Array((_, _, maxA), (_, minB, _)) =>
        assert(Ordering[(Int, Long)].lt(maxA, minB),
          s"file ranges overlap: $maxA !< $minB")
      case _ =>
    }
  }

  test("fuzzyPairs drops blocks larger than maxBlock before pairing") {
    // "widget" block: 2 rows, a real near-dup; "common" block: 6 rows of a
    // default-value hot key — at maxBlock=5 it must vanish entirely (no
    // pair from it), while the widget pair survives unchanged.
    val df = (Seq((1L, "red widget"), (2L, "rad widget")) ++
      (10L to 15L).map(i => (i, s"x$i common"))).toDF("id", "name")
    def run(cap: Long) = Entity.fuzzyPairs(df, "id", "name",
        expr("split(name, ' ')[1]"), maxDist = 10, maxBlock = cap)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = run(5L)
    assert(capped == Set((1L, 2L)), s"hot block leaked pairs: $capped")
    // default cap keeps both blocks (6 < 10000)
    assert(run(10000L).size == 1 + 6 * 5 / 2)
    intercept[IllegalArgumentException] {
      Entity.fuzzyPairs(df, "id", "name", expr("name"), 1, maxBlock = 1L)
    }
  }

  test("truncationStats: exact per-limit loss from one corpus pass") {
    import graft.ops.Packing
    val df = Seq(1L, 5L, 10L).toDF("n")
    val out = Packing.truncationStats(df, "n", Seq(4L, 8L))
      .selectExpr("context_len", "n_docs", "n_truncated",
        "cast(trunc_frac_micro as long)", "tokens_total", "tokens_kept",
        "tokens_lost", "cast(kept_frac_micro as long)")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (4L, 3L, 2L, 666666L, 16L, 9L, 7L, 562500L),  // kept 1+4+4
      (8L, 3L, 1L, 333333L, 16L, 14L, 2L, 875000L))) // kept 1+5+8
    // a negative cost is an upstream bug: loud at execution, never NaN math
    val ex = intercept[Exception] {
      Packing.truncationStats(Seq(3L, -1L).toDF("n"), "n", Seq(4L)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("packingAudit: exact chunk spans in the salted md5 order") {
    import graft.ops.Packing
    import java.security.MessageDigest
    val costs = Map(1L -> 0L, 2L -> 3L, 3L -> 12L, 4L -> 5L,
      5L -> 10L, 6L -> 7L, 7L -> 1L)
    val df = costs.toSeq.toDF("doc_id", "n")
    val got = Packing.packingAudit(df, "doc_id", "n", contextLen = 10L,
        salt = "sx")
      .select("id", "n_cost", "start_offset", "chunk_first", "chunk_last",
        "n_splits")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // brute-force replica: same md5 order, running offsets
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    var off = 0L
    val exp = costs.keys.toSeq.sortBy(id => (md5hex(s"sx|$id"), id)).map { id =>
      val n = costs(id)
      val start = off
      val last = math.max(start + n - 1, start) / 10
      off += n
      (id, n, start, start / 10, last, last - start / 10)
    }
    exp.foreach { e => assert(got(e._1) == e, s"doc ${e._1}: ${got(e._1)} vs $e") }
    // invariants: zero-cost docs never split; offsets tile the corpus
    assert(got(1L)._6 == 0L)
    assert(got.values.map(_._2).sum == costs.values.sum)
  }

  test("lorenzCurve cumulates exact shares poorest-first") {
    // 4 holders with weights 1,1,1,7 in 2 buckets: poor half holds 20%
    val df = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 7.0)).toDF("h", "v")
    val out = Corpus.lorenzCurve(df, "h", "v", buckets = 2)
      .select("bucket", "n_holders", "cum_holders", "cum_share_micro")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0, 2L, 2L, 200000L), (1, 2L, 4L, 1000000L)))
    intercept[IllegalArgumentException] {
      Corpus.lorenzCurve(Seq((1L, -5.0), (2L, 1.0)).toDF("h", "v"), "h", "v", 2)
    }
    // a negative holder hiding inside a NET-POSITIVE bucket must also be
    // rejected — the old bucket-sum check let this through
    intercept[IllegalArgumentException] {
      Corpus.lorenzCurve(
        Seq((1L, -5.0), (2L, 20.0), (3L, 30.0)).toDF("h", "v"), "h", "v", 2)
    }
  }

  test("cusumMonitor: closed form equals Page's recurrence by hand") {
    // ref 10, slack 0, threshold 5 (micro-scaled): values 10,12,7,13,14
    // → d = 0,2,-3,3,4; S = max(0, S+d) = 0,2,0,3,7 → alarm on the last
    val rows = Seq((1L, 1L, 10.0), (1L, 2L, 12.0), (1L, 3L, 7.0),
      (1L, 4L, 13.0), (1L, 5L, 14.0)).map { case (k, t, v) => (k, t, t, v) }
    val out = TimeSeries.cusumMonitor(rows.toDF("k", "t", "tie", "v"),
        "k", "t", "tie", "v", refMeanMicro = 10000000L, slackMicro = 0L,
        thresholdMicro = 5000000L)
      .select("ts_ms", "s_micro", "alarmed")
      .as[(Long, java.math.BigDecimal, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._2.longValueExact()).toSeq ==
      Seq(0L, 2000000L, 0L, 3000000L, 7000000L))
    assert(out.map(_._3).toSeq == Seq(false, false, false, false, true))
  }

  test("silhouette: tight separated clusters near +1, mislabels negative") {
    // A = {(0,0), (0.1,0)}, B = {(10,0), (10.1,0)}: tight and far →
    // silhouette ≈ 1000 milli for every point, no negatives
    val good = Seq(
      (1L, Array(0.0f, 0.0f), "A"), (2L, Array(0.1f, 0.0f), "A"),
      (3L, Array(10.0f, 0.0f), "B"), (4L, Array(10.1f, 0.0f), "B"))
      .toDF("id", "v", "c")
    val g = Cluster.silhouette(good, "id", "v", "c")
      .select("cluster", "n_points", "mean_silhouette_milli", "n_negative")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(g.forall(r => r._2 == 2 && r._3 > 990 && r._4 == 0), s"${g.toSeq}")
    // mislabel a point sitting inside B as A: its a >> b → negative
    val bad = Seq(
      (1L, Array(0.0f, 0.0f), "A"), (2L, Array(0.1f, 0.0f), "A"),
      (5L, Array(10.2f, 0.0f), "A"),
      (3L, Array(10.0f, 0.0f), "B"), (4L, Array(10.1f, 0.0f), "B"))
      .toDF("id", "v", "c")
    val b = Cluster.silhouette(bad, "id", "v", "c")
      .select("cluster", "n_negative")
      .as[(String, Long)].collect().toMap
    assert(b("A") == 1L && b("B") == 0L, s"$b")
  }

  test("medoids pick the central member; singletons are their own medoid") {
    // cluster 1 on a line: points at x = 0, 1, 10 → the middle point (1)
    // minimizes summed squared distance; cluster 2 is a singleton
    val df = Seq(
      (1L, Array(0.0f, 0.0f), 1), (2L, Array(1.0f, 0.0f), 1),
      (3L, Array(10.0f, 0.0f), 1), (9L, Array(5.0f, 5.0f), 2))
      .toDF("id", "v", "c")
    val out = Cluster.medoids(df, "id", "v", "c")
      .select("cluster", "medoid_id", "n_members", "avg_dist2")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    // medoid 2: cost = 1² + 9² = 82e12 micro²; avg over (n−1)=2 → 41e12
    assert(out.toSeq == Seq((1, 2L, 3L, 41000000000000L), (2, 9L, 1L, 0L)))
  }

  test("inclusionDependencies finds the FK direction, not its reverse") {
    val child = Seq((1L, "x"), (2L, "y"), (3L, "z"), (1L, "w"))
      .toDF("fk", "payload")
    val parent = Seq(1L, 2L, 3L, 4L, 5L).toDF("pk")
    val out = Corpus.inclusionDependencies(Seq(
        ("c", child, Seq("fk")), ("p", parent, Seq("pk"))))
      .select("child", "parent", "n_child_distinct", "n_parent_distinct",
        "n_common", "containment_micro", "parent_unique_micro",
        "is_candidate")
      .as[(String, String, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // c.fk ⊆ p.pk: 3 of 3 distinct contained, parent is a key
    assert(out(("c.fk", "p.pk")) ==
      (("c.fk", "p.pk", 3L, 5L, 3L, 1000000L, 1000000L, true)))
    // reverse direction: only 3 of 5 parent values appear in the child
    assert(out(("p.pk", "c.fk")) ==
      (("p.pk", "c.fk", 5L, 3L, 3L, 600000L, 750000L, false)))
  }

  test("kaplanMeier life table matches the textbook estimator with censoring") {
    // (duration, event): deaths at t=1 (×2) and t=3, censored at t=2, t=4.
    // KM: S(1) = 3/5 = 0.6, S(3) = 0.6 · 1/2 = 0.3; censoring only
    // shrinks n_risk. ln-micro terms floored separately per factor.
    val df = Seq((1L, true), (1L, true), (2L, false), (3L, true),
      (4L, false)).toDF("dur", "ev")
    val lnM = (x: Double) => math.floor(math.log(x) * 1e6).toLong
    val out = Survival.kaplanMeier(df, "dur", "ev")
      .select("t", "n_risk", "n_event", "n_censored", "hazard_micro",
        "ln_surv_micro")
      .as[(Long, Long, Long, Long, Long, Option[Long])]
      .collect().sortBy(_._1)
    val s1 = lnM(3) - lnM(5)
    val s3 = s1 + (lnM(1) - lnM(2))
    assert(out.toSeq == Seq(
      (1L, 5L, 2L, 0L, 400000L, Some(s1)),
      (2L, 3L, 0L, 1L, 0L, Some(s1)),
      (3L, 2L, 1L, 0L, 500000L, Some(s3)),
      (4L, 1L, 0L, 1L, 0L, Some(s3))))
    // sanity: the ln curve exponentiates back to the textbook S(t)
    assert(math.abs(math.exp(s1 / 1e6) - 0.6) < 1e-5)
    assert(math.abs(math.exp(s3 / 1e6) - 0.3) < 1e-5)
  }

  test("kaplanMeier reports survival exactly 0 as NULL past extinction") {
    // everyone at risk dies at t=2 → S(2) = 0: ln_surv undefined (NULL),
    // while t=1's partial survival is still finite
    val df = Seq((1L, true), (2L, true), (2L, true)).toDF("dur", "ev")
    val out = Survival.kaplanMeier(df, "dur", "ev")
      .select("t", "n_risk", "n_event", "ln_surv_micro")
      .as[(Long, Long, Long, Option[Long])].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 3L, 1L), (2L, 2L, 2L)))
    assert(out(0)._4.isDefined && out(1)._4.isEmpty)
  }

  test("logRank recovers the hand-computed hypergeometric table and chi2") {
    // A dies at t=1 (both), B dies at t=2 (both):
    // t=1: N=4, N_A=2, d=2 → E_A = 2·2·1e6//4 = 1e6;
    //      V = (2·2·1e6//3)·(500000)//1e6·(500000)//1e6 = 333333
    // t=2: N=N_B=2, d=2 → E_A = 0, E_B = 2e6; V = 0 (N−d = 0)
    // O_A=2, E_A=1.0, V=0.333333 → χ² = 1/0.333333 = 3.000003 → 3000 milli
    val df = Seq(("A", 1L, true), ("A", 1L, true),
      ("B", 2L, true), ("B", 2L, true)).toDF("g", "dur", "ev")
    val out = Survival.logRank(df, "dur", "ev", "g")
      .select("grp", "n_subjects", "n_events", "expected_micro",
        "var_micro", "chi2_milli")
      .as[(String, Long, Long, Long, Long, Option[Long])]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("A", 2L, 2L, 1000000L, 333333L, Some(3000L)),
      ("B", 2L, 2L, 3000000L, 333333L, Some(3000L))))
    // identical survival in both arms → O = E exactly, χ² = 0
    val same = Seq(("A", 1L, true), ("A", 2L, true), ("A", 3L, false),
      ("B", 1L, true), ("B", 2L, true), ("B", 3L, false))
      .toDF("g", "dur", "ev")
    val s2 = Survival.logRank(same, "dur", "ev", "g")
      .select("n_events", "expected_micro", "chi2_milli")
      .as[(Long, Long, Option[Long])].collect()
    assert(s2.forall(r => r._2 == r._1 * 1000000L && r._3 == Some(0L)))
    intercept[IllegalArgumentException] {
      Survival.logRank(Seq(("A", 1L, true)).toDF("g", "dur", "ev"),
        "dur", "ev", "g")
    }
  }

  test("disorderProfile buckets exact log2 lateness vs the running HWM") {
    // arrivals 1..5, ts 10,5,20,19,30: disorders 0,5,0,1,0 →
    // bucket 0 ×3; 5 → '101' → bucket 3; 1 → '1' → bucket 1
    val df = Seq((1L, 10L), (2L, 5L), (3L, 20L), (4L, 19L), (5L, 30L))
      .toDF("a", "t")
    val out = TimeSeries.disorderProfile(df, "a", "t")
      .select("disorder_bucket", "n_events", "max_disorder_ms", "share_micro")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (0, 3L, 0L, 600000L), (1, 1L, 1L, 200000L), (3, 1L, 5L, 200000L)))
  }

  test("disorderProfile block-split running max equals a global window") {
    // 150k rows cross the 65536-row block boundary twice; varied
    // perturbation so lateness lands in many buckets, including
    // cross-block references
    val big = spark.range(150000).select(col("id").as("a"),
      (col("id") * 2 - (col("id") % 97) * 3).as("t"))
    val got = TimeSeries.disorderProfile(big, "a", "t")
      .select("disorder_bucket", "n_events", "max_disorder_ms")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    // brute force: one global window (fine at test size)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("a"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val brute = big
      .withColumn("pm", max(col("t")).over(w))
      .withColumn("lt", when(col("pm").isNull, 0L)
        .otherwise(greatest(col("pm") - col("t"), lit(0L))))
      .withColumn("b", when(col("lt") === 0, lit(0))
        .otherwise(length(conv(col("lt"), 10, 2))).cast("int"))
      .groupBy("b").agg(count(lit(1)).as("n"), max("lt").as("m"))
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == brute, s"block-split vs global:\n$got\n$brute")
  }

  test("seasonalProfile computes exact per-phase lift on a 2-phase cycle") {
    // period 2ms, bucket 1ms: even ts → phase 0 (value 10), odd → phase 1 (30)
    val rows = Seq((0L, 10.0), (1L, 30.0), (2L, 10.0), (3L, 30.0))
      .map { case (t, v) => ("k", t, v) }
    val out = TimeSeries.seasonalProfile(
      rows.toDF("key", "ts", "v"), "key", "ts", "v",
      periodMs = 2L, bucketMs = 1L)
      .select("phase", "n", "avg_micro", "lift_milli")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, 2L, 10000000L, 500L),   // 10 vs mean 20 → lift 0.5
      (1L, 2L, 30000000L, 1500L))) // 30 vs mean 20 → lift 1.5
  }
}
