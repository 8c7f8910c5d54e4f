package graft.streaming

import graft.engine.EventTime
import graft.table.AggFunc
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming per-row trailing-window (OVER) aggregation — the
  * unbounded analogue of [[graft.engine.OverWindows]] and of the
  * reference's Flink OVER windows (over_window_utils.py compiles to Flink
  * `OVER (PARTITION BY keys ORDER BY rowtime ...)`, which buffers rows
  * until the watermark and emits one output row per input row, dropping
  * rows that arrive below the watermark).
  *
  * Per-key state:
  *  - `pending`: input rows not yet finalized by the watermark (emitted in
  *    event-time order once `watermark >= t`, matching Flink's
  *    RowTimeRangeBoundedPrecedingFunction buffering);
  *  - `hist`: finalized rows' (t, values, matches) retained exactly as long
  *    as some feature's frame can still reach them — bounded by the largest
  *    window_size horizon and each limit's n-th-newest qualifying row;
  *  - `accs`: running accumulators for UNBOUNDED-frame features, so their
  *    state is O(1) instead of the full history (COLLECT_LIST/VALUE_COUNTS
  *    with an unbounded frame inherently retain all values).
  *
  * Frame semantics mirror the batch engine exactly (OverWindows.scala):
  * with a filter the frame is the matching rows, without it all rows; a
  * `limit` keeps the newest n frame rows; a `window_size` then cuts at
  * `row.t - size`; SUM/COUNT/ROW_NUMBER default to 0 under a filter,
  * FIRST/LAST honor ignoreNulls only when filtered.
  */
object StreamingOverWindows {

  final case class FeatureSpec(
      name: String,
      agg: AggFunc,
      windowMs: Option[Long],
      limit: Option[Int],
      hasFilter: Boolean)

  /** Running accumulator for unbounded frames. `rows` counts every frame
    * row (ROW_NUMBER); value stats fold non-null values; `firstRow`/
    * `lastRow` keep the raw first/last frame value (nullable) for the
    * unfiltered FIRST/LAST_VALUE semantics; `vals` is retained only for
    * COLLECT_LIST / VALUE_COUNTS.
    */
  final case class RunAcc(
      rows: Long,
      cnt: Long,
      sumD: Double,
      sumL: Long,
      min: Any,
      max: Any,
      firstRowV: Any, firstRowSet: Boolean,
      lastRowV: Any,
      firstMatchV: Any, firstMatchSet: Boolean,
      lastMatchV: Any,
      vals: List[Any]) extends Serializable

  private val emptyAcc =
    RunAcc(0L, 0L, 0.0, 0L, null, null, null, false, null, null, false, null, Nil)

  final case class Entry(t: Long, vs: List[Any], ms: List[Boolean])
      extends Serializable

  final case class OverState(
      keyVals: List[Any],
      seq: Long,
      pending: List[(Long, Long, List[Any])], // (t, arrival seq, row values)
      hist: Vector[Entry],
      accs: List[RunAcc]) extends Serializable

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Number, y: Number)   => java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case (x: String, y: String)   => x.compareTo(y)
    case (x: Boolean, y: Boolean) => x.compareTo(y)
    case _                        => 0
  }

  private def foldAcc(a: RunAcc, v: Any, m: Boolean, keepVals: Boolean): RunAcc = {
    if (!m) return a // non-matching rows are outside a filtered frame
    val cnt = if (v == null) a.cnt else a.cnt + 1
    RunAcc(
      a.rows + 1,
      cnt,
      if (v == null) a.sumD else a.sumD + (v match { case n: Number => n.doubleValue(); case _ => 0.0 }),
      if (v == null) a.sumL else a.sumL + (v match { case n: Number => n.longValue(); case _ => 0L }),
      if (v == null) a.min else if (a.min == null || cmp(v, a.min) < 0) v else a.min,
      if (v == null) a.max else if (a.max == null || cmp(v, a.max) > 0) v else a.max,
      if (a.firstRowSet) a.firstRowV else v,
      true,
      v,
      if (a.firstMatchSet || v == null) a.firstMatchV else v,
      a.firstMatchSet || v != null,
      if (v == null) a.lastMatchV else v,
      if (keepVals && v != null) a.vals :+ v else a.vals)
  }

  private def accResult(f: FeatureSpec, a: RunAcc, integral: Boolean): Any = f.agg match {
    case AggFunc.Count     => a.cnt
    case AggFunc.RowNumber => a.rows
    case AggFunc.Sum =>
      if (a.cnt == 0) { if (f.hasFilter) { if (integral) 0L else 0.0 } else null }
      else if (integral) a.sumL else a.sumD
    case AggFunc.Avg        => if (a.cnt == 0) null else a.sumD / a.cnt
    case AggFunc.Min        => a.min
    case AggFunc.Max        => a.max
    case AggFunc.FirstValue => if (f.hasFilter) a.firstMatchV else a.firstRowV
    case AggFunc.LastValue  => if (f.hasFilter) a.lastMatchV else a.lastRowV
    case AggFunc.CollectList => if (a.vals.isEmpty) null else a.vals
    case AggFunc.ValueCounts =>
      if (a.vals.isEmpty) null
      else a.vals.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
  }

  /** Aggregate one bounded frame. `frame` holds (t, v) of the frame's rows
    * (already restricted to matching rows when filtered), newest last.
    */
  private def frameResult(f: FeatureSpec, frame: Vector[(Long, Any)], integral: Boolean): Any = {
    val vals = frame.collect { case (_, v) if v != null => v }
    f.agg match {
      case AggFunc.Count     => vals.size.toLong
      case AggFunc.RowNumber => frame.size.toLong
      case AggFunc.Sum =>
        if (vals.isEmpty) { if (f.hasFilter) { if (integral) 0L else 0.0 } else null }
        else if (integral) vals.foldLeft(0L)((s, v) => s + v.asInstanceOf[Number].longValue())
        else vals.foldLeft(0.0)((s, v) => s + v.asInstanceOf[Number].doubleValue())
      case AggFunc.Avg =>
        if (vals.isEmpty) null
        else vals.foldLeft(0.0)((s, v) => s + v.asInstanceOf[Number].doubleValue()) / vals.size
      case AggFunc.Min => vals.reduceOption((a, b) => if (cmp(a, b) <= 0) a else b).orNull
      case AggFunc.Max => vals.reduceOption((a, b) => if (cmp(a, b) >= 0) a else b).orNull
      case AggFunc.FirstValue =>
        if (f.hasFilter) vals.headOption.orNull
        else frame.headOption.map(_._2).orNull
      case AggFunc.LastValue =>
        if (f.hasFilter) vals.lastOption.orNull
        else frame.lastOption.map(_._2).orNull
      case AggFunc.CollectList => if (vals.isEmpty) null else vals.toList
      case AggFunc.ValueCounts =>
        if (vals.isEmpty) null
        else vals.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    }
  }

  /** @param input streaming DataFrame carrying [[EventTime.Col]] (epoch ms),
    *              one `__v_i` per feature (expr with filter applied) and one
    *              `__m_i` boolean per feature (frame-membership: the filter
    *              predicate, or true when unfiltered).
    * @return append-mode stream: all input columns except the `__v`/`__m`
    *         helpers, plus one column per feature — row-preserving like the
    *         batch over-window phase.
    */
  def apply(
      input: DataFrame,
      keys: Seq[String],
      feats: Seq[FeatureSpec],
      maxOutOfOrdernessMs: Long): DataFrame = {
    require(input.isStreaming, "use OverWindows for batch inputs")
    val schema = input.schema
    val keyIdx = keys.map(schema.fieldIndex)
    val tIdx = schema.fieldIndex(EventTime.Col)
    val vIdx = feats.indices.map(i => schema.fieldIndex(s"__v_$i"))
    val mIdx = feats.indices.map(i => schema.fieldIndex(s"__m_$i"))
    val helperIdx = (vIdx ++ mIdx).toSet
    val outIdx = schema.indices.filterNot(helperIdx.contains)
    val valueTypes = feats.indices.map(i => schema(s"__v_$i").dataType)
    val integral = valueTypes.map {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val outSchema = StructType(
      outIdx.map(schema(_)) ++
        feats.zipWithIndex.map { case (f, i) =>
          val dt = f.agg match {
            case AggFunc.Count | AggFunc.RowNumber => LongType
            case AggFunc.Avg                       => DoubleType
            case AggFunc.Sum => if (integral(i)) LongType else DoubleType
            case AggFunc.ValueCounts => MapType(valueTypes(i), LongType)
            case AggFunc.CollectList => ArrayType(valueTypes(i))
            case _                   => valueTypes(i)
          }
          StructField(f.name, dt)
        })

    val unbounded = feats.map(f => f.windowMs.isEmpty && f.limit.isEmpty)
    val keepVals = feats.map(f =>
      f.agg == AggFunc.CollectList || f.agg == AggFunc.ValueCounts)
    val horizonMs = feats.flatMap(_.windowMs) match {
      case Nil => 0L
      case ws  => ws.max
    }
    val nFeats = feats.length

    // __event_ts__ is appended AFTER the index computations above, so every
    // precomputed field index stays valid; it is simply absent from outIdx.
    val withTs = input
      .withColumn("__event_ts__", timestamp_millis(col(EventTime.Col)))
      .withWatermark("__event_ts__", s"$maxOutOfOrdernessMs milliseconds")

    val grouped = withTs.groupByKey { r: Row =>
      keyIdx.map { i =>
        if (r.isNullAt(i)) "N"
        else { val s = String.valueOf(r.get(i)); s"S${s.length}:$s" }
      }.mkString("|")
    }(Encoders.STRING)

    val flat = grouped.flatMapGroupsWithState[OverState, Row](
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
      (_: String, rows: Iterator[Row], state: GroupState[OverState]) =>

        var st = state.getOption.getOrElse(
          OverState(Nil, 0L, Nil, Vector.empty, List.fill(nFeats)(emptyAcc)))
        val watermark = state.getCurrentWatermarkMs()

        // buffer arrivals; rows at or below the watermark are late → dropped
        rows.foreach { r =>
          if (st.keyVals.isEmpty) st = st.copy(keyVals = keyIdx.map(r.get).toList)
          val t = r.getLong(tIdx)
          if (t > watermark || watermark == StreamingDedup.NoWatermarkYet) {
            st = st.copy(
              seq = st.seq + 1,
              pending = (t, st.seq, r.toSeq.toList) :: st.pending)
          }
        }

        // finalize rows the watermark has passed, in event-time order
        val (ready, stillPending) = st.pending.partition(_._1 <= watermark)
        st = st.copy(pending = stillPending)
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        ready.sortBy(p => (p._1, p._2)).foreach { case (t, _, rowVals) =>
          val vs = vIdx.map(rowVals(_)).toList
          val ms = mIdx.map(i => rowVals(i).asInstanceOf[Boolean]).toList
          st = st.copy(hist = st.hist :+ Entry(t, vs, ms))
          val values = feats.indices.map { i =>
            val f = feats(i)
            if (unbounded(i)) {
              val acc = foldAcc(st.accs(i), vs(i), ms(i), keepVals(i))
              st = st.copy(accs = st.accs.updated(i, acc))
              accResult(f, acc, integral(i))
            } else {
              var frame = st.hist.collect { case e if e.ms(i) => (e.t, e.vs(i)) }
              f.limit.foreach(n => frame = frame.takeRight(n))
              f.windowMs.foreach(d => frame = frame.filter(_._1 >= t - d))
              frameResult(f, frame, integral(i))
            }
          }
          out += Row.fromSeq(outIdx.map(rowVals(_)) ++ values)

          // evict history no future frame can reach: older than the time
          // horizon and than every limit's n-th-newest qualifying row
          if (st.hist.nonEmpty) {
            val thresholds = feats.indices.flatMap { i =>
              val f = feats(i)
              if (unbounded(i)) None
              else {
                val timeTh = f.windowMs.map(d => t - d)
                val limitTh = f.limit.map { n =>
                  val qual = st.hist.collect { case e if e.ms(i) => e.t }
                  if (qual.size < n) Long.MinValue else qual(qual.size - n)
                }
                Seq(timeTh, limitTh).flatten.reduceOption(_ min _)
              }
            }
            if (thresholds.nonEmpty) {
              val cut = thresholds.min
              st = st.copy(hist = st.hist.filter(_.t >= cut))
            }
          }
        }

        if (st.pending.isEmpty && st.hist.isEmpty &&
            st.accs.forall(_.rows == 0L)) {
          state.remove()
        } else {
          state.update(st)
          // wake when the watermark passes the oldest pending row
          st.pending.map(_._1).minOption.foreach { nextT =>
            state.setTimeoutTimestamp(math.max(nextT, watermark + 1))
          }
        }
        out.iterator
    }(Encoders.kryo[OverState], Encoders.row(outSchema))

    flat.toDF()
  }
}
