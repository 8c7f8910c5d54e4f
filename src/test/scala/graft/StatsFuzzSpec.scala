package graft

import graft.ops.{Features, TimeSeries}
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
