package graft

import graft.client.GraftClient
import graft.table._
import org.apache.spark.sql.Row

import scala.concurrent.duration._
import scala.util.Random

/** Model-based check of the batch sliding engine: an independent, naive
  * in-memory implementation of the reference's sliding semantics (step
  * grid near data, per-feature windows, limits as newest-N pairs,
  * became-empty default row, skip-same suppression) is compared against
  * the two-phase relational plan on randomized inputs and configurations.
  * Together with the batch↔streaming fuzz this triangulates all three
  * implementations.
  */
class SlidingModelSpec extends SparkSuite {

  private val step = 60000L

  private final case class Feat(agg: AggFunc, spanBuckets: Long, limit: Option[Int])

  /** Naive model. Rows are (t, v) per key; emits (windowTime, values). */
  private def model(
      rows: Seq[(Long, Long)],
      feats: Seq[Feat],
      enableEmpty: Boolean,
      skipSame: Boolean): Seq[(Long, Seq[Any])] = {
    if (rows.isEmpty) return Nil
    val maxSpan = feats.map(_.spanBuckets).max
    val buckets = rows.map(r => Math.floorDiv(r._1, step)).distinct.sorted
    val grid = buckets.flatMap(b => b to b + maxSpan).distinct.sorted
    var out = Vector.empty[(Long, Seq[Any], Boolean)] // (wt, values, any)
    var prevAny = false
    grid.foreach { s =>
      val values = feats.map { f =>
        // window covers buckets (s - span, s]; newest-limit pairs sorted
        // by (t, v) — the engine's sort_array order
        val in = rows
          .filter(r => {
            val b = Math.floorDiv(r._1, step); b > s - f.spanBuckets && b <= s
          })
          .sortBy(r => (r._1, r._2))
        val pairs = f.limit.map(n => in.takeRight(n)).getOrElse(in)
        val vs = pairs.map(_._2)
        f.agg match {
          case AggFunc.Sum        => vs.sum
          case AggFunc.Count      => vs.size.toLong
          case AggFunc.Avg        => if (vs.isEmpty) null else vs.map(_.toDouble).sum / vs.size
          case AggFunc.Min        => if (vs.isEmpty) null else vs.min
          case AggFunc.Max        => if (vs.isEmpty) null else vs.max
          case AggFunc.FirstValue => vs.headOption.map(_.asInstanceOf[Any]).orNull
          case AggFunc.LastValue  => vs.lastOption.map(_.asInstanceOf[Any]).orNull
          case AggFunc.ValueCounts =>
            if (vs.isEmpty) null else vs.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
          case AggFunc.CollectList => if (vs.isEmpty) null else vs.toList
          case other => throw new IllegalArgumentException(other.toString)
        }
      }
      val any = feats.zip(values).exists { case (f, _) =>
        rows.exists(r => {
          val b = Math.floorDiv(r._1, step); b > s - f.spanBuckets && b <= s
        })
      }
      val keep = any || (enableEmpty && prevAny)
      if (keep) out :+= (((s + 1) * step - 1, values, any))
      prevAny = any
    }
    // skip-same over the kept rows
    val kept =
      if (!skipSame) out
      else out.foldLeft(Vector.empty[(Long, Seq[Any], Boolean)]) { (acc, r) =>
        if (acc.nonEmpty && acc.last._2 == r._2) acc else acc :+ r
      }
    kept.map(r => (r._1, r._2))
  }

  test("batch sliding matches the naive model on randomized configs") {
    val spark2 = spark
    import spark2.implicits._
    val aggPool = Seq(
      AggFunc.Sum, AggFunc.Count, AggFunc.Avg, AggFunc.Min, AggFunc.Max,
      AggFunc.FirstValue, AggFunc.LastValue, AggFunc.ValueCounts, AggFunc.CollectList)
    for (seed <- 1 to 6) {
      val rnd = new Random(seed * 31)
      val keys = Seq("a", "b")
      val rows = rnd.shuffle(
        (for (k <- keys; t <- 1 to 25) yield (k, t)).toList
      ).take(20).map { case (k, t) =>
        // off-grid timestamps: rows land mid-bucket
        (k, (rnd.nextInt(9) + 1).toLong, t * step + rnd.nextInt(step.toInt))
      }
      val feats = (0 until 4).map { _ =>
        Feat(
          aggPool(rnd.nextInt(aggPool.size)),
          (rnd.nextInt(4) + 1).toLong,
          if (rnd.nextBoolean()) Some(rnd.nextInt(2) + 1) else None)
      }
      val (empty, skip) = Seq((true, true), (true, false), (false, false))(rnd.nextInt(3))

      val view = SlidingFeatureView(
        s"model_v_$seed",
        DataFrameSource(
          s"model_s_$seed", rows.toDF("k", "v", "t_ms"),
          keys = Some(Seq("k")), timestampField = Some("t_ms"),
          timestampFormat = "epoch_millis"),
        features = feats.zipWithIndex.map { case (f, i) =>
          Feature(s"f$i", SlidingWindowTransform(
            "v", f.agg, (f.spanBuckets * 60).seconds, 1.minute, Seq("k"), limit = f.limit))
        },
        enableEmptyWindowOutput = empty, skipSameWindowOutput = skip)

      def normVal(v: Any): Any = v match {
        case d: Double => math.round(d * 1e9)
        case s: scala.collection.Seq[_] => s.toList
        case m: scala.collection.Map[_, _] => m.toMap
        case x => x
      }
      val got = new GraftClient(spark).getFeatures(view)
        .collect()
        .map { r =>
          (r.getAs[String]("k"), r.getAs[Long]("window_time"),
            feats.indices.map(i => normVal(r.get(r.fieldIndex(s"f$i")))).toList)
        }
        .sortBy(r => (r._1, r._2)).toSeq

      val exp = keys.flatMap { k =>
        model(
          rows.filter(_._1 == k).map(r => (r._3, r._2)).sortBy(identity),
          feats, empty, skip)
          .map { case (wt, vs) => (k, wt, vs.map(normVal).toList) }
      }.sortBy(r => (r._1, r._2))

      assert(got == exp, s"seed=$seed feats=$feats empty=$empty skip=$skip")
    }
  }
}
