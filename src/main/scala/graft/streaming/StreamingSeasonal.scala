package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import scala.concurrent.duration.Duration

/** Streaming seasonal-baseline anomaly monitor — "is Tuesday 3am
  * normal FOR Tuesday 3am", live: the streaming counterpart of scoring
  * against [[graft.ops.TimeSeries.seasonalProfile]]'s per-(key, phase)
  * cells, without the batch join. Per key, rows finalize in
  * `(event time, tie)` order once the watermark passes them; each row
  * is z-scored against its OWN PHASE's accumulated history
  * (`phase = (t/bucketMs) mod period`) and THEN folded into it — every
  * score uses strictly earlier data only, so the monitor never leaks a
  * row into its own baseline and the whole run replays
  * deterministically.
  *
  * Exactness: values micro-floor once; per-phase state is exact
  * integer moments (n, Σ, Σ²) in BigInt; the z-score is ONE fixed
  * double tree of those integers (`(n·v − S) / √(n·(n·Q − S²)/(n−1))`
  * — the n-scaled form, no integer mean rounding), floored to milli.
  * NULL z for a phase's first two rows (no variance yet) and for
  * degenerate phases — warm-up rows read "not yet scorable", never
  * "normal".
  *
  * 100 TB shape: one shuffle on the key; per-key state is the lateness
  * buffer plus `period` moment triples (hard require ≤ 10000) —
  * O(period), independent of row rate, kept across idle gaps (an
  * evicted baseline would silently re-warm and mask a regression).
  */
object StreamingSeasonal {

  final case class SeasonalState(
      pending: List[(Long, String, List[Any])], // (tMs, tieKey, out prefix)
      phases: Map[Int, (Long, BigInt, BigInt)]) // phase -> (n, S, Q)

  def monitor(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      period: Int,
      bucketMs: Long,
      zThresholdMilli: Long,
      lateness: Duration): DataFrame = {
    require(df.isStreaming, "score against ops.TimeSeries.seasonalProfile for batch")
    require(period >= 2 && period <= 10000, s"period $period out of [2, 10000]")
    require(bucketMs >= 1, s"bucketMs $bucketMs must be >= 1")
    require(zThresholdMilli > 0, s"zThresholdMilli $zThresholdMilli must be > 0")
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val tieIdx = schema.fieldIndex(tieCol)
    val valIdx = schema.fieldIndex(valueCol)

    val withMs = df
      .withWatermark(tsCol, s"${lateness.toMillis} milliseconds")
      .withColumn("__ts_ms__", unix_millis(col(tsCol)))
    val tIdx = schema.length

    val outSchema = StructType(Seq(
      schema(keyCol), schema(tieCol),
      StructField("ts_ms", LongType, nullable = false),
      StructField("phase", IntegerType, nullable = false),
      StructField("v_micro", LongType, nullable = false),
      StructField("n_prior", LongType, nullable = false),
      StructField("z_milli", LongType, nullable = true),
      StructField("anomalous", BooleanType, nullable = true)))

    val grouped = withMs.groupByKey { r: Row =>
      if (r.isNullAt(keyIdx)) "N"
      else { val s = String.valueOf(r.get(keyIdx)); s"S${s.length}:$s" }
    }(Encoders.STRING)

    val flat = grouped.flatMapGroupsWithState[SeasonalState, Row](
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
      (_: String, rows: Iterator[Row], state: GroupState[SeasonalState]) =>

        var st = state.getOption.getOrElse(SeasonalState(Nil, Map.empty))
        val watermark = state.getCurrentWatermarkMs()

        rows.foreach { r =>
          if (!r.isNullAt(keyIdx) && !r.isNullAt(valIdx) && !r.isNullAt(tIdx)) {
            val t = r.getLong(tIdx)
            if (t > watermark || watermark == StreamingDedup.NoWatermarkYet) {
              val vMicro = math.floor(
                r.get(valIdx).asInstanceOf[Number].doubleValue() * 1e6).toLong
              st = st.copy(pending = (t,
                StreamingDedup.orderKey(r.get(tieIdx)),
                List(r.get(keyIdx), r.get(tieIdx), t, vMicro)) :: st.pending)
            }
          }
        }

        val (ready, stillPending) =
          st.pending.partition(_._1 <= watermark)
        st = st.copy(pending = stillPending)
        val out = ready.sortBy(p => (p._1, p._2)).map { case (_, _, prefix) =>
          val t = prefix(2).asInstanceOf[Long]
          val vMicro = prefix(3).asInstanceOf[Long]
          val phase = ((t / bucketMs) % period).toInt
          val (n, s, q) = st.phases.getOrElse(phase, (0L, BigInt(0), BigInt(0)))
          // score against the PRE-UPDATE moments: strictly earlier data
          val z: Option[Long] =
            if (n < 2) None
            else {
              val varN2 = BigInt(n) * q - s * s // = n²·(n−1)/n · s²ish ≥ 0
              if (varN2 <= 0) None
              else Some(math.floor(1000.0 *
                (BigInt(n) * vMicro - s).toDouble /
                math.sqrt((BigInt(n) * varN2).toDouble / (n - 1).toDouble))
                .toLong)
            }
          st = st.copy(phases = st.phases.updated(phase,
            (n + 1, s + vMicro, q + BigInt(vMicro) * vMicro)))
          Row.fromSeq(prefix.take(2) ++ Seq(t, phase, vMicro, n,
            z.map(Long.box).orNull,
            z.map(zz => Boolean.box(math.abs(zz) >= zThresholdMilli)).orNull))
        }

        if (st.pending.isEmpty && st.phases.isEmpty) {
          state.remove()
        } else {
          state.update(st)
          st.pending.map(_._1).minOption.foreach { nextT =>
            state.setTimeoutTimestamp(math.max(nextT, watermark + 1))
          }
        }
        out.iterator
    }(Encoders.kryo[SeasonalState], Encoders.row(outSchema))

    flat.toDF(keyCol, tieCol, "ts_ms", "phase", "v_micro", "n_prior",
      "z_milli", "anomalous")
  }
}
