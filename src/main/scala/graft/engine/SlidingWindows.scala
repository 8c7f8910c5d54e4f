package graft.engine

import graft.expr.SparkCompiler
import graft.table._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sliding (hopping) window aggregation.
  *
  * Semantics (ref: python/feathub/feature_views/transforms/
  * sliding_window_transform.py:23-101 and the golden suites in
  * feature_views/transforms/tests/test_sliding_window_transform.py):
  *  - event-time window (end-size, end], emitted per step; the emitted
  *    `window_time` is the inclusive last millisecond of the step
  *    (…23:59:59.999 convention, sliding_feature_view.py:146-151);
  *  - `enable_empty_window_output`: when a window becomes empty, emit one
  *    row with SUM/COUNT=0 and NULL for other aggs, then stop
  *    (sliding_feature_view.py:34-42; defaults per
  *    processors/flink/table_builder/aggregation_utils.py:93-118);
  *  - `skip_same_window_output`: suppress steps whose aggregated values are
  *    unchanged from the previously emitted row (sliding_feature_view.py:44-49).
  *
  * Physical plan mirrors the reference's two-phase design
  * (java/feathub-udf/.../SlidingWindowUtils.java:66-170: tumbling pre-agg
  * into step buckets, then a shared multi-size merge) re-expressed
  * relationally: groupBy(keys, bucket) partial aggregation (map-side combine
  * for free), then one RANGE window per window size over the bucket index —
  * all window sizes share the single shuffle+sort on the keys, the analogue
  * of the reference's shared state buffer. The per-key step grid (a
  * `sequence` + `explode`, no cross join) supplies the empty-window rows the
  * reference produces with Flink timers.
  *
  * Scale: one shuffle for the pre-agg, one for the merge window; both keyed
  * by the group keys. Buckets bound intermediate size at
  * rows_per_key × (span/step), independent of window size count.
  */
object SlidingWindows {

  private val t = EventTime.Col
  private val B = "__bucket"

  /** Timezone-aligned window offset: step boundaries align to the session
    * time zone's local midnight instead of UTC, mirroring the reference's
    * `TumblingEventTimeWindows.of(step, offset)` with
    * `offset = getModdedOffset(step, -rawOffset(localZone))`
    * (ref: java/feathub-udf/flink-udf/src/main/java/com/alibaba/feathub/
    * flink/udf/SlidingWindowUtils.java:113-114, 281-287). The raw (non-DST)
    * offset is used, exactly as the reference does. UTC ⇒ 0, preserving
    * the default epoch-aligned bucketing.
    */
  def zoneOffsetMs(zoneId: String, stepMs: Long): Long = {
    if (stepMs <= 0) return 0L
    val raw = java.util.TimeZone.getTimeZone(zoneId).getRawOffset.toLong
    val m = (-raw) % stepMs
    if (m < 0) m + stepMs else m
  }

  final case class SlidingFeature(name: String, tr: SlidingWindowTransform)

  def apply(
      input: DataFrame,
      feats: Seq[SlidingFeature],
      enableEmptyWindowOutput: Boolean,
      skipSameWindowOutput: Boolean,
      postExprs: Seq[(String, String)] = Nil): DataFrame = {
    require(feats.nonEmpty, "no sliding features")
    val step = feats.head.tr.stepSize.toMillis
    val keys = feats.head.tr.groupByKeys
    require(feats.forall(_.tr.stepSize.toMillis == step), "step_size must match")
    require(feats.forall(_.tr.groupByKeys == keys), "group_by_keys must match")

    if (step == 0) return perRecord(input, feats, keys, skipSameWindowOutput, postExprs)

    // ---- Phase 1: per-feature value columns + step bucket -------------
    val offset = zoneOffsetMs(
      input.sparkSession.conf.get("spark.sql.session.timeZone", "UTC"), step)
    val withVals = feats.zipWithIndex.foldLeft(
      input.withColumn(B, floor((col(t) - offset) / step))
    ) { case (df, (f, i)) =>
      val e = SparkCompiler.compile(f.tr.expr)
      val v = f.tr.filterExpr match {
        case Some(fe) => when(SparkCompiler.compile(fe), e)
        case None     => e
      }
      df.withColumn(s"__v_$i", v)
    }

    def needsList(f: SlidingFeature): Boolean =
      f.tr.limit.isDefined ||
        f.tr.aggFunc == AggFunc.CollectList || f.tr.aggFunc == AggFunc.ValueCounts

    // ---- Phase 2: tumbling pre-aggregation into step buckets ----------
    val partials: Seq[Column] = feats.zipWithIndex.flatMap { case (f, i) =>
      val v = col(s"__v_$i")
      val cnt = count(v).as(s"__cnt_$i")
      if (needsList(f))
        Seq(sort_array(collect_list(when(v.isNotNull, struct(col(t).as("t"), v.as("v")))))
          .as(s"__list_$i"), cnt)
      else f.tr.aggFunc match {
        case AggFunc.Sum   => Seq(sum(v).as(s"__sum_$i"), cnt)
        case AggFunc.Count => Seq(cnt)
        case AggFunc.Min   => Seq(min(v).as(s"__min_$i"), cnt)
        case AggFunc.Max   => Seq(max(v).as(s"__max_$i"), cnt)
        case AggFunc.Avg   => Seq(sum(v).as(s"__sum_$i"), cnt)
        case AggFunc.FirstValue =>
          Seq(min(when(v.isNotNull, struct(col(t).as("t"), v.as("v")))).as(s"__first_$i"), cnt)
        case AggFunc.LastValue =>
          Seq(max(when(v.isNotNull, struct(col(t).as("t"), v.as("v")))).as(s"__last_$i"), cnt)
        case other =>
          throw new IllegalArgumentException(s"Unsupported sliding agg $other")
      }
    }
    val groupCols = (keys :+ B).map(col)
    val preAgg0 = withVals.groupBy(groupCols: _*).agg(partials.head, partials.tail: _*)
    // One keys-only repartition of the (small) per-bucket partials lets the
    // grid distinct, the grid⋈partials join, and every per-size merge
    // window all reuse the same clustering (hash on a SUBSET of their keys
    // satisfies their required distributions), collapsing what was four
    // hash exchanges into two: the map-side-combined pre-agg shuffle and
    // this one. Keyless views are single-partition by reference semantics.
    // The persist matters at scale: the grid branch consumes preAgg a
    // second time, and without it Spark replans that branch all the way
    // down to a second source scan.
    // AQE inside cached plans (default since Spark 3.5) hides the cache's
    // output partitioning from consumers, which would re-shuffle both cache
    // reads; pinning it off keeps the keys-clustering visible downstream.
    input.sparkSession.conf
      .set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
    val preAgg = {
      val p = if (keys.nonEmpty) preAgg0.repartition(keys.map(col): _*) else preAgg0
      p.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

    // ---- Phase 3: per-key step grid (supplies empty-window steps) -----
    // Generate grid buckets only NEAR DATA: each pre-agg bucket b feeds the
    // windows ending at b..b+span-1 plus the became-empty step b+span, so
    // exploding b..b+span per data bucket (then distinct) covers exactly the
    // steps the reference's Flink timers would fire. Densifying the full
    // min..max range per key (the naive formulation) explodes row counts for
    // sparse keys with long histories and overflows sequence()'s max array
    // length — this stays proportional to the data instead.
    val maxSpanBuckets = feats.map(f => f.tr.windowSize.toMillis / step).max
    require(
      maxSpanBuckets < 10_000_000,
      s"window_size/step_size ratio $maxSpanBuckets too large; every input " +
        "row would feed that many output windows")
    val grid = preAgg
      .select(keys.map(col) :+
        explode(sequence(col(B), col(B) + lit(maxSpanBuckets))).as(B): _*)
      .distinct()
    val joined = grid.join(preAgg, keys :+ B, "left")

    // ---- Phase 4: one RANGE window per window size over bucket index --
    val keyWin =
      if (keys.nonEmpty) Window.partitionBy(keys.map(col): _*) else Window.partitionBy()
    val merged = feats.zipWithIndex.foldLeft(joined) { case (df, (f, i)) =>
      val span = f.tr.windowSize.toMillis / step // buckets per window
      val w = keyWin.orderBy(col(B)).rangeBetween(1L - span, Window.currentRow)
      val cnt = coalesce(sum(col(s"__cnt_$i")).over(w), lit(0L))
      val raw: Column = f.tr.aggFunc match {
        case _ if needsList(f) =>
          val flat = flatten(collect_list(col(s"__list_$i")).over(w))
          val lim = f.tr.limit match {
            case Some(l) => slice(flat, greatest(size(flat) - l + 1, lit(1)), lit(l))
            case None    => flat
          }
          OverWindows.hofAgg(f.tr.aggFunc, lim)
        case AggFunc.Sum   => sum(col(s"__sum_$i")).over(w)
        case AggFunc.Count => cnt
        case AggFunc.Min   => min(col(s"__min_$i")).over(w)
        case AggFunc.Max   => max(col(s"__max_$i")).over(w)
        case AggFunc.Avg =>
          when(cnt > 0, sum(col(s"__sum_$i")).over(w).cast("double") / cnt)
        case AggFunc.FirstValue => first(col(s"__first_$i"), ignoreNulls = true).over(w)("v")
        case AggFunc.LastValue  => last(col(s"__last_$i"), ignoreNulls = true).over(w)("v")
        case other => throw new IllegalArgumentException(s"Unsupported sliding agg $other")
      }
      // Empty-window defaults: SUM/COUNT → 0, others NULL
      // (ref: flink table_builder/aggregation_utils.py:93-118). A COUNT
      // with a limit counts the limited list, not the whole window.
      val value = f.tr.aggFunc match {
        case AggFunc.Sum   => when(cnt > 0, raw).otherwise(lit(0).cast(valueType(withVals, i)))
        case AggFunc.Count => if (f.tr.limit.isEmpty) cnt else raw
        case _             => when(cnt > 0, raw)
      }
      df.withColumn(f.name, value).withColumn(s"__wcnt_$i", cnt)
    }

    // ---- Phase 5: emission rules --------------------------------------
    val anyData = feats.indices.map(i => col(s"__wcnt_$i") > 0).reduce(_ || _)
    val orderW = keyWin.orderBy(col(B))
    val withAny = merged.withColumn("__any", anyData)
    val kept =
      if (enableEmptyWindowOutput)
        // keep data rows plus the single step where the window became empty;
        // the lag must be materialized via withColumn first — window
        // functions are not allowed directly inside filter().
        withAny
          .withColumn("__keep",
            col("__any") || lag(col("__any"), 1, false).over(orderW))
          .filter(col("__keep"))
          .drop("__keep")
      else withAny.filter(col("__any"))

    val windowTime = ((col(B) + 1) * step + offset - 1).as(SparkCompiler.WindowTimeCol)
    val featCols = feats.map(f => col(f.name))
    val withTime = kept.withColumn(SparkCompiler.WindowTimeCol, windowTime)
    val withPost = postExprs.foldLeft(withTime) { case (df, (n, e)) =>
      df.withColumn(n, SparkCompiler.compile(e))
    }

    val outCols = keys.map(col) ++ Seq(col(SparkCompiler.WindowTimeCol)) ++
      featCols ++ postExprs.map { case (n, _) => col(n) }
    val out = withPost.select(outCols :+ col(B): _*)

    val result =
      if (skipSameWindowOutput) {
        out
          .withColumn("__sig", comparableSig(out, feats.map(_.name)))
          .withColumn("__prev", lag(col("__sig"), 1).over(keyWin.orderBy(col(B))))
          .filter(col("__prev").isNull || !(col("__sig") <=> col("__prev")))
          .drop("__sig", "__prev")
      } else out
    result.drop(B)
  }

  /** Signature struct for the skip-same comparison. `<=>` cannot compare
    * MAP-typed fields (maps are unordered), so map features are encoded as
    * their key-sorted entry arrays — deterministic and equatable, matching
    * the reference's per-field Objects.equals
    * (processfunction/WindowUtils.java:29-46).
    */
  private def comparableSig(df: DataFrame, featNames: Seq[String]): Column =
    struct(featNames.map { n =>
      df.schema(n).dataType match {
        case _: org.apache.spark.sql.types.MapType =>
          sort_array(map_entries(col(n))).as(n)
        case _ => col(n)
      }
    }: _*)

  private def valueType(df: DataFrame, i: Int) = df.schema(s"__v_$i").dataType

  /** step_size=0: infinite window, emit an updated aggregate per input record
    * (ref: java/feathub-udf/.../GlobalWindowKeyedProcessFunction.java, wired
    * at processors/flink/table_builder/sliding_window_utils.py:82-123).
    */
  private def perRecord(
      input: DataFrame,
      feats: Seq[SlidingFeature],
      keys: Seq[String],
      skipSame: Boolean,
      postExprs: Seq[(String, String)]): DataFrame = {
    val keyWin =
      if (keys.nonEmpty) Window.partitionBy(keys.map(col): _*) else Window.partitionBy()
    val w = keyWin.orderBy(col(t)).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val agged = feats.foldLeft(input) { case (df, f) =>
      val tr = OverWindowTransform(
        f.tr.expr, f.tr.aggFunc, None, f.tr.groupByKeys, f.tr.filterExpr, None)
      df.withColumn(f.name, OverWindows.aggColumn(tr, Nil))
    }
    val withTime = agged.withColumn(SparkCompiler.WindowTimeCol, col(t))
    val withPost = postExprs.foldLeft(withTime) { case (df, (n, e)) =>
      df.withColumn(n, SparkCompiler.compile(e))
    }
    val outCols = keys.map(col) ++ Seq(col(SparkCompiler.WindowTimeCol)) ++
      feats.map(f => col(f.name)) ++ postExprs.map { case (n, _) => col(n) }
    val out = withPost.select(outCols: _*)
    if (skipSame) {
      out
        .withColumn("__sig", comparableSig(out, feats.map(_.name)))
        .withColumn("__prev", lag(col("__sig"), 1).over(keyWin.orderBy(col(SparkCompiler.WindowTimeCol))))
        .filter(col("__prev").isNull || !(col("__sig") <=> col("__prev")))
        .drop("__sig", "__prev")
    } else out
  }
}
