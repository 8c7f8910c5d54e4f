package graft

import graft.ops.{Causal, Features, TimeSeries}
import org.apache.spark.sql.Row

import scala.util.Random

/** Randomized differential checks for the round-11 statistics ops: every
  * case generates a small random dataset (seeded — failures replay) and
  * compares the distributed operator's EXACT integer outputs against an
  * independent plain-Scala reference that re-derives the statistic from
  * first principles (sort + fold, no DataFrames). The references
  * intentionally replicate the ops' documented floor/double-tree
  * contracts, so any disagreement is an operator bug, not rounding.
  */
class StatsFuzzSpec extends SparkSuite {
  import spark.implicits._

  private def floorMilli(x: Double): Long = math.floor(1000.0 * x).toLong

  test("runsTest matches a sequential reference on random keyed series") {
    val rnd = new Random(411)
    for (_ <- 0 until 12) {
      val nKeys = 1 + rnd.nextInt(4)
      val rows = (0 until nKeys).flatMap { k =>
        val len = 2 + rnd.nextInt(40)
        (0 until len).map(t => (s"k$k", t.toLong, rnd.nextBoolean()))
      }
      val got = TimeSeries.runsTest(rows.toDF("k", "t", "x"), "k", "t", "x")
        .collect().map(r => r.getAs[String]("key") -> r).toMap
      rows.groupBy(_._1).foreach { case (k, rs) =>
        val xs = rs.sortBy(_._2).map(_._3)
        val n = xs.length.toLong
        val n1 = xs.count(identity).toLong
        val n2 = n - n1
        val runs = 1L + xs.sliding(2).count {
          case Seq(a, b) => a != b
          case _         => false
        }
        val r = got(k)
        assert(r.getAs[Long]("n") == n && r.getAs[Long]("runs") == runs &&
          r.getAs[Long]("n_true") == n1, s"$k: $r")
        val inner = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
        if (n1 > 0 && n2 > 0 && n >= 2 && inner > 0) {
          val z = (runs.toDouble * n - 2.0 * n1 * n2 - n) /
            math.sqrt(inner / (n - 1.0))
          assert(r.getAs[Long]("z_milli") == floorMilli(z), s"$k: $r z=$z")
        } else assert(r.isNullAt(r.fieldIndex("z_milli")), s"$k: $r")
      }
    }
  }

  test("durbinWatson matches a sequential reference on random keyed series") {
    val rnd = new Random(412)
    for (_ <- 0 until 12) {
      val rows = (0 until 1 + rnd.nextInt(3)).flatMap { k =>
        val len = 2 + rnd.nextInt(30)
        (0 until len).map(t =>
          (s"k$k", t.toLong, (rnd.nextInt(2001) - 1000) / 10.0))
      }
      val got = TimeSeries.durbinWatson(
        rows.toDF("k", "t", "v"), "k", "t", "v")
        .collect().map(r => r.getAs[String]("key") -> r).toMap
      rows.groupBy(_._1).foreach { case (k, rs) =>
        val vs = rs.sortBy(_._2)
          .map(r => math.floor(r._3 * 1e6).toLong).map(BigInt(_))
        val num = vs.sliding(2).collect {
          case Seq(a, b) => (b - a) * (b - a)
        }.sum
        val den = vs.map(v => v * v).sum
        val r = got(k)
        if (vs.length >= 2 && den > 0)
          assert(BigInt(r.getAs[Long]("dw_milli")) == num * 1000 / den,
            s"$k: $r")
        else assert(r.isNullAt(r.fieldIndex("dw_milli")), s"$k: $r")
      }
    }
  }

  test("coxStuart matches a sequential reference on random keyed series") {
    val rnd = new Random(413)
    for (_ <- 0 until 12) {
      val rows = (0 until 1 + rnd.nextInt(3)).flatMap { k =>
        val len = 2 + rnd.nextInt(30)
        // small value domain so ties genuinely occur
        (0 until len).map(t => (s"k$k", t.toLong, rnd.nextInt(5).toDouble))
      }
      val got = TimeSeries.coxStuart(rows.toDF("k", "t", "v"), "k", "t", "v")
        .collect().map(r => r.getAs[String]("key") -> r).toMap
      rows.groupBy(_._1).foreach { case (k, rs) =>
        val vs = rs.sortBy(_._2).map(_._3)
        val n = vs.length
        val half = n / 2
        val off = n - half
        val pairs = (0 until half).map(i => (vs(i), vs(i + off)))
        val rise = pairs.count { case (a, b) => b > a }.toLong
        val fall = pairs.count { case (a, b) => b < a }.toLong
        val r = got(k)
        assert(r.getAs[Long]("n_pairs") == half.toLong &&
          r.getAs[Long]("n_rise") == rise &&
          r.getAs[Long]("n_fall") == fall, s"$k: $r")
        if (rise + fall > 0) {
          val z = (rise.toDouble - fall) / math.sqrt((rise + fall).toDouble)
          assert(r.getAs[Long]("z_milli") == floorMilli(z), s"$k: $r")
        } else assert(r.isNullAt(r.fieldIndex("z_milli")), s"$k: $r")
      }
    }
  }

  test("cramerVonMises matches a pooled-ECDF reference on random two-sample data") {
    val rnd = new Random(414)
    for (_ <- 0 until 10) {
      val na = 5 + rnd.nextInt(60)
      val nb = 5 + rnd.nextInt(60)
      // overlapping small domains so both ties and gaps occur
      val a = (0 until na).map(_ => ("arm_a", rnd.nextInt(12).toDouble))
      val b = (0 until nb).map(_ =>
        ("arm_b", (rnd.nextInt(12) + rnd.nextInt(3)).toDouble))
      val r = Features.cramerVonMises(
        (a ++ b).toDF("g", "v"), "g", "v").collect()(0)
      val av = a.map(x => math.floor(x._2 * 1e6).toLong)
      val bv = b.map(x => math.floor(x._2 * 1e6).toLong)
      val values = (av ++ bv).distinct.sorted
      var (c1, c2) = (0L, 0L)
      var u = BigInt(0)
      for (v <- values) {
        c1 += av.count(_ == v)
        c2 += bv.count(_ == v)
        val cnt = av.count(_ == v) + bv.count(_ == v)
        val dev = BigInt(nb) * c1 - BigInt(na) * c2
        u += BigInt(cnt) * dev * dev
      }
      val n = (na + nb).toLong
      val t = math.floor(1e6 * u.toDouble /
        (n.toDouble * n * na * nb)).toLong
      assert(r.getAs[Long]("t_micro") == t,
        s"na=$na nb=$nb got=$r want=$t")
    }
  }

  test("mantelHaenszel matches a per-stratum BigInt reference on random 2x2 tables") {
    val rnd = new Random(416)
    for (_ <- 0 until 10) {
      val nStrata = 1 + rnd.nextInt(5)
      val rows = (0 until nStrata).flatMap { s =>
        (0 until 2 + rnd.nextInt(60)).map(_ =>
          (s"s$s", rnd.nextBoolean(), rnd.nextInt(100) < 30 + s * 10))
      }
      val r = graft.ops.Causal.mantelHaenszel(
        rows.toDF("s", "t", "y"), "s", "t", "y").collect()(0)
      var (rr, sden, dev, vr) = (BigInt(0), BigInt(0), BigInt(0), BigInt(0))
      var (nStrataUsed, nTot) = (0L, 0L)
      rows.groupBy(_._1).foreach { case (_, rs) =>
        val a = rs.count(x => x._2 && x._3).toLong
        val b = rs.count(x => x._2 && !x._3).toLong
        val c = rs.count(x => !x._2 && x._3).toLong
        val d = rs.count(x => !x._2 && !x._3).toLong
        val nn = a + b + c + d
        nTot += nn
        rr += BigInt(a) * d * 1000000 / nn
        sden += BigInt(b) * c * 1000000 / nn
        val ok = nn >= 2 && a + b > 0 && c + d > 0 && a + c > 0 && b + d > 0
        if (ok) {
          nStrataUsed += 1
          dev += BigInt(a) * 1000000 - BigInt(a + b) * (a + c) * 1000000 / nn
          vr += BigInt(a + b) * (c + d) * (a + c) * (b + d) * 1000000 /
            (BigInt(nn) * nn * (nn - 1))
        }
      }
      assert(r.getAs[Long]("n") == nTot &&
        r.getAs[Long]("n_strata_used") == nStrataUsed, r.toString)
      if (sden > 0)
        assert(BigInt(r.getAs[Long]("or_mh_micro")) == rr * 1000000 / sden,
          r.toString)
      else assert(r.isNullAt(r.fieldIndex("or_mh_micro")))
      if (vr > 0)
        assert(BigInt(r.getAs[Long]("chi2_milli")) ==
          (dev * dev) / (vr * 1000), r.toString)
      else assert(r.isNullAt(r.fieldIndex("chi2_milli")))
    }
  }

  test("moodsMedian matches a sorted-median BigInt reference on random groups") {
    val rnd = new Random(417)
    for (_ <- 0 until 10) {
      val k = 2 + rnd.nextInt(4)
      val rows = (0 until k).flatMap { g =>
        (0 until 5 + rnd.nextInt(50)).map(_ =>
          (s"g$g", rnd.nextInt(15).toDouble + g * 0.5))
      }
      val r = Features.moodsMedian(
        rows.toDF("g", "v"), "g", "v").collect()(0)
      val vs = rows.map(x => math.floor(x._2 * 1e6).toLong).sorted
      val n = vs.length
      val m2 = vs((n + 1) / 2 - 1) + vs(n / 2)
      val cells = rows.groupBy(_._1).map { case (_, rs) =>
        val ng = rs.size.toLong
        val oa = rs.count(x => math.floor(x._2 * 1e6).toLong * 2 > m2).toLong
        (ng, oa, ng - oa)
      }
      val nA = cells.map(_._2).sum
      val nB = cells.map(_._3).sum
      assert(r.getAs[Long]("n_above") == nA, r.toString)
      if (k >= 2 && nA > 0 && nB > 0) {
        val s = cells.map { case (ng, oa, ob) =>
          BigInt(n) * oa * oa * 1000000 / (BigInt(ng) * nA) +
            BigInt(n) * ob * ob * 1000000 / (BigInt(ng) * nB)
        }.sum
        assert(BigInt(r.getAs[Long]("chi2_micro")) ==
          s - BigInt(n) * 1000000, r.toString)
      } else assert(r.isNullAt(r.fieldIndex("chi2_micro")))
    }
  }

  test("brownForsythe matches a sorted-median moment reference on random groups") {
    val rnd = new Random(418)
    for (_ <- 0 until 10) {
      val k = 2 + rnd.nextInt(4)
      val rows = (0 until k).flatMap { g =>
        (0 until 4 + rnd.nextInt(40)).map(_ =>
          (s"g$g", (rnd.nextInt(2001) - 1000) / 10.0 * (g + 1)))
      }
      val r = Features.brownForsythe(
        rows.toDF("g", "v"), "g", "v").collect()(0)
      val cells = rows.groupBy(_._1).map { case (_, rs) =>
        val vs = rs.map(x => math.floor(x._2 * 1e6).toLong).sorted
        val ng = vs.length
        val m2 = vs((ng + 1) / 2 - 1) + vs(ng / 2)
        val zs = rs.map(x =>
          BigInt((math.floor(x._2 * 1e6).toLong * 2 - m2).abs))
        (BigInt(ng), zs.sum, zs.map(z => z * z).sum)
      }
      val n = cells.map(_._1).sum
      val s = cells.map(_._2).sum
      val q = cells.map(_._3).sum
      val sbRaw = cells.map { case (ng, sg, _) =>
        (sg * sg - (sg * sg) % ng) / ng
      }.sum
      if (k >= 2 && n > k) {
        val within = (q.toDouble - sbRaw.toDouble) / (n.toLong - k)
        if (within != 0.0) {
          val f = ((sbRaw.toDouble - s.toDouble * s.toDouble / n.toLong) /
            (k - 1)) / within
          assert(r.getAs[Long]("f_milli") == floorMilli(f),
            s"$r want ${floorMilli(f)}")
        } else assert(r.isNullAt(r.fieldIndex("f_milli")))
      } else assert(r.isNullAt(r.fieldIndex("f_milli")))
    }
  }

  test("cronbachAlpha matches a BigInt variance reference on random rating matrices") {
    val rnd = new Random(419)
    for (_ <- 0 until 10) {
      val k = 2 + rnd.nextInt(4)
      val nUnits = 3 + rnd.nextInt(30)
      // complete units plus some incomplete stragglers
      val complete = (0 until nUnits).flatMap { u =>
        val base = rnd.nextInt(9)
        (0 until k).map(i => (s"u$u", s"i$i", (base + rnd.nextInt(4)).toDouble))
      }
      val stragglers = (0 until rnd.nextInt(4)).flatMap(u =>
        (0 until 1 + rnd.nextInt(k - 1)).map(i =>
          (s"x$u", s"i$i", rnd.nextInt(9).toDouble)))
      val r = graft.ops.Eval.cronbachAlpha(
        (complete ++ stragglers).toDF("u", "i", "v"), "u", "i", "v", k)
        .collect()(0)
      assert(r.getAs[Long]("n_units") == nUnits.toLong)
      val byUnit = complete.groupBy(_._1).view.mapValues(
        _.map(x => BigInt(math.floor(x._3 * 1e6).toLong)))
      val totals = byUnit.values.map(_.sum).toSeq
      val dTot = BigInt(nUnits) * totals.map(t => t * t).sum -
        totals.sum * totals.sum
      val dSum = complete.groupBy(_._2).values.map { rs =>
        val vs = rs.map(x => BigInt(math.floor(x._3 * 1e6).toLong))
        BigInt(vs.size) * vs.map(v => v * v).sum - vs.sum * vs.sum
      }.sum
      if (nUnits >= 2 && dTot > 0) {
        val num = BigInt(k) * (dTot - dSum) * 1000000
        val den = BigInt(k - 1) * dTot
        val want = if (num >= 0) num / den else -((-num) / den)
        assert(BigInt(r.getAs[Long]("alpha_micro")) == want, r.toString)
      } else assert(r.isNullAt(r.fieldIndex("alpha_micro")))
    }
  }

  test("krippendorffAlpha matches a coincidence reference on random incomplete matrices") {
    val rnd = new Random(420)
    for (_ <- 0 until 10) {
      val rows = (0 until 4 + rnd.nextInt(25)).flatMap { u =>
        val m = 1 + rnd.nextInt(5)
        (0 until m).map(rr => (s"u$u", s"r$rr", s"L${rnd.nextInt(3)}"))
      }
      val r = graft.ops.Eval.krippendorffAlpha(
        rows.toDF("u", "r", "l"), "u", "r", "l").collect()(0)
      val units = rows.groupBy(_._1).view.mapValues(
        _.groupBy(_._3).view.mapValues(_.size.toLong).toMap).toMap
      val kept = units.filter(_._2.values.sum >= 2)
      assert(r.getAs[Long]("n_units") == kept.size.toLong &&
        r.getAs[Long]("n_dropped") == (units.size - kept.size).toLong)
      val s = kept.values.map { cs =>
        val m = cs.values.sum
        val agree = cs.values.map(c => BigInt(c) * (c - 1)).sum
        (BigInt(m) * (m - 1) - agree) * 1000000 / (m - 1)
      }.sum
      val ncs = kept.values.flatten
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).values.toSeq
      val n = BigInt(ncs.sum)
      val nc2 = ncs.map(c => BigInt(c) * c).sum
      if (kept.nonEmpty && n * n - nc2 > 0) {
        val want = BigInt(1000000) - (n - 1) * s / (n * n - nc2)
        assert(BigInt(r.getAs[Long]("alpha_micro")) == want, r.toString)
      } else assert(r.isNullAt(r.fieldIndex("alpha_micro")))
    }
  }

  test("bowkerSymmetry matches a pair-fold reference on random confusion tables") {
    val rnd = new Random(421)
    for (_ <- 0 until 10) {
      val labels = (0 until 3 + rnd.nextInt(4)).map(i => s"L$i")
      val rows = (0 until 30 + rnd.nextInt(200)).map { _ =>
        (labels(rnd.nextInt(labels.size)), labels(rnd.nextInt(labels.size)))
      }
      val r = graft.ops.Eval.bowkerSymmetry(
        rows.toDF("a", "b"), "a", "b").collect()(0)
      val cnt = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val pairs = for {
        i <- labels; j <- labels if i < j
        nij = cnt.getOrElse((i, j), 0L); nji = cnt.getOrElse((j, i), 0L)
        if nij + nji > 0
      } yield BigInt(nij - nji) * (nij - nji) * 1000000 / (nij + nji)
      assert(r.getAs[Long]("n") == rows.size.toLong)
      assert(r.getAs[Long]("df_pairs") == pairs.size.toLong, r.toString)
      assert(BigInt(r.getAs[Long]("chi2_micro")) == pairs.sum, r.toString)
      assert(r.getAs[Long]("n_offdiag") ==
        rows.count(x => x._1 != x._2).toLong)
    }
  }

  test("cohensD and tostEquivalence match a welch-moment reference on random arms") {
    val rnd = new Random(422)
    for (_ <- 0 until 10) {
      val na = 3 + rnd.nextInt(60)
      val nb = 3 + rnd.nextInt(60)
      val shift = rnd.nextInt(9) - 4
      val rows = (0 until na).map(_ =>
        ("arm_a", (rnd.nextInt(201) - 100) / 10.0)) ++
        (0 until nb).map(_ =>
          ("arm_b", (rnd.nextInt(201) - 100) / 10.0 + shift))
      val deltaMicro = (1 + rnd.nextInt(5)) * 1000000L
      val d = Causal.cohensD(rows.toDF("g", "v"), "g", "v").collect()(0)
      val t = Causal.tostEquivalence(
        rows.toDF("g", "v"), "g", "v", deltaMicro).collect()(0)
      def mom(g: String) = {
        val vs = rows.filter(_._1 == g)
          .map(x => BigInt(math.floor(x._2 * 1e6).toLong))
        (vs.size.toLong, vs.sum, vs.map(v => v * v).sum)
      }
      val (n1, s1, q1) = mom("arm_a")
      val (n2, s2, q2) = mom("arm_b")
      def fd(s: BigInt, c: Long) =
        (if (s >= 0) s / c else -((-s) / c)).toLong
      val diff = fd(s1, n1) - fd(s2, n2)
      assert(d.getAs[Long]("diff_micro") == diff &&
        t.getAs[Long]("diff_micro") == diff)
      val df2 = n1 + n2 - 2
      val ss1 = q1.toDouble - s1.toDouble * s1.toDouble / n1
      val ss2 = q2.toDouble - s2.toDouble * s2.toDouble / n2
      val sp2 = (ss1 + ss2) / df2
      val dm = s1.toDouble / n1 - s2.toDouble / n2
      if (sp2 > 0) {
        val dd = dm / math.sqrt(sp2)
        assert(d.getAs[Long]("d_milli") == floorMilli(dd), d.toString)
        assert(d.getAs[Long]("g_milli") ==
          floorMilli(dd * (4.0 * df2 - 4.0) / (4.0 * df2 - 1.0)))
      }
      val v1 = ss1 / (n1 - 1)
      val v2 = ss2 / (n2 - 1)
      val se2 = v1 / n1 + v2 / n2
      if (se2 > 0) {
        val se = math.sqrt(se2)
        val zl = floorMilli((dm + deltaMicro) / se)
        val zu = floorMilli((deltaMicro - dm) / se)
        assert(t.getAs[Long]("z_lower_milli") == zl &&
          t.getAs[Long]("z_upper_milli") == zu, t.toString)
        assert(t.getAs[Boolean]("equivalent") == (math.min(zl, zu) >= 1645L))
      }
    }
  }

  test("rateRatioTest matches an exact count/exposure reference on random streams") {
    val rnd = new Random(423)
    for (_ <- 0 until 10) {
      val rows = Seq("arm_a", "arm_b").flatMap { g =>
        val n = 5 + rnd.nextInt(80)
        // distinct-ish timestamps guarantee a positive span
        (0 until n).map(i =>
          (g, i * 100L + rnd.nextInt(50), rnd.nextInt(4) == 0))
      }
      val r = Causal.rateRatioTest(
        rows.toDF("g", "t", "e"), "g", "t", "e").collect()(0)
      def arm(g: String) = {
        val rs = rows.filter(_._1 == g)
        (rs.count(_._3).toLong, rs.map(_._2).max - rs.map(_._2).min)
      }
      val (xa, ta) = arm("arm_a")
      val (xb, tb) = arm("arm_b")
      assert(r.getAs[Long]("n_events_a") == xa &&
        r.getAs[Long]("exposure_ms_b") == tb)
      assert(r.getAs[Long]("rate_a_micro") ==
        (BigInt(xa) * 3600000L * 1000000L / ta).toLong)
      if (xb > 0)
        assert(r.getAs[Long]("rate_ratio_micro") ==
          (BigInt(xa) * tb * 1000000L / (BigInt(xb) * ta)).toLong)
      if (xa > 0 && xb > 0) {
        val z = (math.log(xa.toDouble / ta) - math.log(xb.toDouble / tb)) /
          math.sqrt(1.0 / xa + 1.0 / xb)
        assert(r.getAs[Long]("z_milli") == floorMilli(z), r.toString)
      } else assert(r.isNullAt(r.fieldIndex("z_milli")))
    }
  }

  test("linCccMicro matches a BigInt-moment reference on random pairs") {
    val rnd = new Random(415)
    for (_ <- 0 until 10) {
      val n = 3 + rnd.nextInt(50)
      val pairs = (0 until n).map { _ =>
        val x = rnd.nextInt(2000001) - 1000000L
        // y correlated with x plus noise, sometimes shifted
        val y = x / 2 + rnd.nextInt(300001) - 150000L
        (x, y)
      }
      val r = Features.linCccMicro(pairs.toDF("x", "y"), "x", "y")
        .collect()(0)
      val (sx, sy) = (pairs.map(p => BigInt(p._1)).sum,
        pairs.map(p => BigInt(p._2)).sum)
      val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
      val syy = pairs.map(p => BigInt(p._2) * p._2).sum
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
      val num = 2 * (n * sxy - sx * sy)
      val den = (n * sxx - sx * sx) + (n * syy - sy * sy) +
        (sx - sy) * (sx - sy)
      if (den > 0) {
        val want =
          if (num >= 0) (num * 1000000 / den).toLong
          else -((-num) * 1000000 / den).toLong
        assert(r.getAs[Long]("ccc_micro") == want, s"n=$n got=$r want=$want")
      } else assert(r.isNullAt(r.fieldIndex("ccc_micro")))
    }
  }
}
