package graft

import graft.engine.{EventTime, TemporalJoin}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Differential fuzzing of the point-in-time join: the union+running-last
  * plan must match a brute-force per-left-row scan (max right time ≤ left
  * time; ties on time keep the greatest value tuple) across randomized
  * keys, duplicate timestamps, and missing-key cases.
  */
class JoinFuzzSpec extends SparkSuite {

  test("point-in-time join matches brute force on randomized inputs") {
    val spark2 = spark
    import spark2.implicits._
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val keys = Seq("k1", "k2", "k3", "k4")
      // left: (key, t); right: (key, t, v) with deliberate duplicate
      // (key, t) pairs and keys absent from either side
      val left = (1 to 40).map { _ =>
        (keys(rnd.nextInt(3)), (rnd.nextInt(20) + 1).toLong * 1000)
      }
      val right = (1 to 40).map { _ =>
        (keys(rnd.nextInt(4)), (rnd.nextInt(20) + 1).toLong * 1000,
          (rnd.nextInt(50) + 1).toLong)
      }

      val expected = left.map { case (k, t) =>
        val candidates = right.filter(r => r._1 == k && r._2 <= t)
        val v =
          if (candidates.isEmpty) null
          else {
            val tMax = candidates.map(_._2).max
            candidates.filter(_._2 == tMax).map(_._3).max // tie: greatest value
          }
        (k, t, v)
      }.sortBy(r => (r._1, r._2)).map(r => (r._1, r._2, Option(r._3)))

      val leftDf = EventTime.append(
        left.toDF("k", "t_ms"), Some("t_ms"), "epoch_millis")
      val rightDf = EventTime.append(
        right.toDF("k", "t_ms", "v"), Some("t_ms"), "epoch_millis")
        .select(col("k"), col(EventTime.Col), col("v"))
      val got = TemporalJoin.pointInTime(leftDf, rightDf, Seq("k"), Seq(("v", "pit_v")))
        .select("k", "t_ms", "pit_v")
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .sortBy(r => (r._1, r._2)).toSeq
      // duplicate left rows produce duplicate outputs; compare as sorted seqs
      assert(got == expected.map(e => (e._1, e._2, e._3)), s"seed=$seed")
    }
  }

  test("point-in-time join: NULL keys never match (SQL equi-join semantics)") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq((Some("a"), 2000L), (None: Option[String], 2000L))
      .toDF("k", "t_ms")
    val right = Seq((Some("a"), 1000L, 10L), (None: Option[String], 1000L, 99L))
      .toDF("k", "t_ms", "v")
    val leftDf = EventTime.append(left, Some("t_ms"), "epoch_millis")
    val rightDf = EventTime.append(right, Some("t_ms"), "epoch_millis")
      .select(col("k"), col(EventTime.Col), col("v"))
    val got = TemporalJoin.pointInTime(leftDf, rightDf, Seq("k"), Seq(("v", "pit_v")))
      .select("k", "pit_v").collect()
      .map(r => (Option(r.getString(0)), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    // the NULL-keyed left row must NOT pick up the NULL-keyed right version
    assert(got == Set((Some("a"), Some(10L)), (None, None)))
  }

  test("interval join matches the naive non-equi join on randomized inputs") {
    val spark2 = spark
    import spark2.implicits._
    for (seed <- 1 to 5) {
      val rnd = new Random(100 + seed)
      val keys = Seq("k1", "k2", "k3")
      val left = (1 to 50).map { i =>
        (keys(rnd.nextInt(3)), i.toLong, rnd.nextInt(100).toLong * 7)
      }
      val right = (1 to 50).map { i =>
        (keys(rnd.nextInt(3)), 1000L + i, rnd.nextInt(120).toLong * 7)
      }
      // windows including negative lower bounds, zero-width, and exact ties
      val windows = Seq((0L, 0L), (-21L, 21L), (7L, 70L), (-70L, -7L))
      for ((lo, hi) <- windows) {
        val l = left.toDF("k", "lid", "t")
        val r = right.toDF("k", "rid", "t")
        val got = TemporalJoin.intervalJoin(l, r, Seq("k"), "t", lo, hi)
          .select("k", "lid", "rid_r")
          .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
        val expected = (for {
          (lk, lid, lt) <- left
          (rk, rid, rt) <- right
          if lk == rk && rt >= lt + lo && rt <= lt + hi
        } yield (lk, lid, rid)).toSet
        assert(got == expected, s"seed $seed window ($lo,$hi): got ${got.size}, expected ${expected.size}")
      }
    }
  }

  test("nearest join matches brute-force argmin on randomized inputs") {
    val spark2 = spark
    import spark2.implicits._
    for (seed <- 1 to 5) {
      val rnd = new Random(200 + seed)
      val keys = Seq("k1", "k2", "k3")
      // dense duplicate timestamps on both sides force every tie-break leg
      val left = (1 to 40).map { i =>
        (keys(rnd.nextInt(3)), i.toLong, rnd.nextInt(15).toLong * 7)
      }
      val right = (1 to 40).map { i =>
        (keys(rnd.nextInt(3)), 1000L + i, rnd.nextInt(15).toLong * 7)
      }
      val windows = Seq((-21L, 21L), (1L, 35L), (-35L, -1L), (0L, 0L))
      for ((lo, hi) <- windows) {
        val got = TemporalJoin.nearestJoin(
            left.toDF("k", "lid", "t"), right.toDF("k", "rid", "t"),
            Seq("k"), "t", leftIdCols = Seq("lid"), lo, hi)
          .select("lid", "rid_r", "t_r")
          .collect()
          .map(x => (x.getLong(0),
            if (x.isNullAt(1)) None else Some((x.getLong(1), x.getLong(2)))))
          .toMap
        val expected = left.map { case (lk, lid, lt) =>
          val cand = right.filter { case (rk, _, rt) =>
            rk == lk && rt >= lt + lo && rt <= lt + hi }
          val best = // (|delta|, right ts, right payload) lexicographic min
            if (cand.isEmpty) None
            else Some(cand.minBy { case (_, rid, rt) => (math.abs(rt - lt), rt, rid) })
              .map { case (_, rid, rt) => (rid, rt) }
          lid -> best
        }.toMap
        assert(got == expected, s"seed $seed window ($lo,$hi)")
      }
    }
  }
}
