package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — emits one COMPACT JSON line on stdout and writes a
  * FULL line to a file (`SPARK_GRAFT_BENCH_OUT`, default
  * `bench_result.json` in the working directory).
  *
  * The split exists because the driver records only a bounded tail of
  * the sbt log (2,000 chars in BENCH_r04/r05): the r5 full line —
  * medians + mins + a second scale point for ~60 queries — overflowed
  * that window and its head was cut off, so the driver's `parsed` field
  * stayed null two rounds running. The stdout line therefore carries
  * exactly the contract fields (metric/value/unit/queries/sf), keyed by
  * the unique per-query id prefix; since r16 ONE wire payload carries
  * the per-query map on BOTH the bare line (the final line — parsed by
  * the driver, so PERF per_query/geomean/scaling populate) and the
  * BENCHJSON sentinel copy; the diagnostics (full names, per-query min
  * and max−min spread, small-SF scale point, super-linearity flags)
  * live in the file artifact.
  *
  * Harness design (r4): every query is timed once per PASS and the
  * passes are interleaved round-robin across the whole suite, so a
  * transient machine-load spike is spread thin over many queries
  * instead of doubling one; the per-query headline is the MEDIAN of
  * the timed passes. The per-query MIN rides along in `queries_min`
  * (r5): a sustained-load run shows median ≫ min, making driver-side
  * inflation diagnosable from the artifact itself.
  *
  * Scale evidence (r5, VERDICT #8): when the benched dir is sf0.1 and
  * a sibling sf0.01 exists (and `SPARK_GRAFT_SCALING` != "0"), the
  * suite also runs at the small scale and the artifact carries the
  * per-query min-time ratio against the 10× data ratio — an empirical
  * super-linearity detector: a quadratic stage shows a ratio well
  * above the data ratio instead of needing plan-reading to spot.
  */
object Bench {
  private val TimedPasses = 3
  private val ScalingPasses = 2

  /** Warmup pass (plan compilation + codegen + JIT) then `passes`
    * interleaved timed passes; returns per-query samples in suite
    * order. A query that throws still gets a (tiny) sample — the suite
    * must finish — but its name lands in `errors` so the artifact can
    * flag it: a broken query benches as a fast time-to-failure, which
    * silently FLATTERS the total unless the error channel rides along
    * (r7: five broken queries recorded ~0.07 s each).
    */
  private def timeSuite(spark: SparkSession,
      queries: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
      sfDir: String, passes: Int,
      errors: scala.collection.mutable.LinkedHashSet[String],
      warm: Boolean = true): Array[Vector[Double]] = {
    if (warm) queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    val samples = Array.fill(queries.size)(Vector.newBuilder[Double])
    for (_ <- 1 to passes; i <- queries.indices) {
      val t0 = System.nanoTime()
      try queries(i)._2(spark, sfDir).count()
      catch { case e: Throwable =>
        errors += queries(i)._1
        // the reason goes to the LOG, not the artifact: a failure whose
        // cause is invisible cost a full rerun to diagnose (sf10, r10)
        System.err.println(s"[bench] ${queries(i)._1} failed at $sfDir: $e")
      }
      samples(i) += (System.nanoTime() - t0) / 1e9
    }
    samples.map(_.result())
  }

  private def jsonMap(entries: Seq[(String, String)]): String =
    entries.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  /** Locale-independent fixed-decimal rendering (an f-interpolator would
    * emit a decimal COMMA — invalid JSON — under comma-decimal locales).
    * Non-finite values render as JSON `null`; negatives format the
    * absolute value and prefix the sign (naive `scaled/pow` on a
    * negative renders "0.-5000").
    */
  private def fixed(v: Double, decimals: Int): String = {
    if (v.isNaN || v.isInfinite) return "null"
    val pow = math.pow(10, decimals).toLong
    val scaled = math.round(math.abs(v) * pow)
    val whole = scaled / pow
    val frac = (scaled % pow).toString.reverse.padTo(decimals, '0').reverse
    val sign = if (v < 0 && scaled != 0) "-" else ""
    s"$sign$whole.$frac"
  }

  private def r4(v: Double): String = fixed(v, 4)

  /** (1-minute, 5-minute) system load averages from /proc/loadavg
    * ((-1,-1) when unreadable, e.g. non-Linux). Recorded before and
    * after the run (r9 VERDICT #2): BENCH_r09 was taken on a loaded
    * machine and overstated the suite ~18% with nothing in the
    * artifact to show it — cross-round per-query deltas were
    * unattributable. With the load fields a reader can tell a
    * measurement from a contention artifact without access to the
    * machine. The 5-minute average rides along since r14 (VERDICT #2):
    * BENCH_r13 started at 1-min 1.83 but 5-min 8.12 — a still-draining
    * machine the 1-min-only gate called quiet — and shipped a headline
    * a uniform 1.40× over the true quiet total.
    */
  private def loadavg(): (Double, Double) =
    try {
      val f = java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .trim.split("\\s+")
      (f(0).toDouble, f(1).toDouble)
    } catch { case _: Throwable => (-1.0, -1.0) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_result.json")
    // Shuffle partitions default to the lane count but scale with the
    // corpus, not the cores: the sf10 (100×) point needs partitions
    // sized so a post-shuffle partition still fits in executor memory
    // — exactly the knob a real cluster job retunes per input size.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Large-heap survival knobs: the sf10 working set under a 100 g
      // heap produced multi-minute full-GC stalls; the default 10 s
      // heartbeat / 120 s network timeout pair then expires the (only)
      // local-mode executor and poisons the SparkContext mid-suite —
      // every remaining query fails instantly and benches as a fast
      // time-to-failure. Same settings a real cluster uses for big
      // executors: heartbeat well under the stall, expiry well over it.
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "800s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Wait for machine quiet before timing (r12, VERDICT #7): the
    // artifact IS the number the round is judged on, and r11's was
    // captured at warm tier while the prose quoted a separate quiet
    // run. Poll until BOTH the 1-min and the 5-min load are under the
    // steady threshold (r14, VERDICT #2: a drained 1-min with a high
    // 5-min is a machine whose contention is still decaying — r13's
    // artifact started at 1-min 1.83 / 5-min 8.12 and read 1.40× over
    // quiet), bounded (default 600 s — a 5-min average needs ~5–7 min
    // to decay from a burst; SPARK_GRAFT_QUIET_WAIT_SEC; 0 disables);
    // if the bound expires, run anyway and record the tier honestly.
    val quietBound = math.max(0.5, cpus.toDouble / 16)
    val quietBound5 = math.max(quietBound, 2.0)
    val waitSec = sys.env.getOrElse("SPARK_GRAFT_QUIET_WAIT_SEC", "600").toInt
    val waitDeadline = System.nanoTime() + waitSec * 1000000000L
    def quietNow(): Boolean = {
      val (l1, l5) = loadavg()
      l1 <= quietBound && l5 <= quietBound5
    }
    while (!quietNow() && System.nanoTime() < waitDeadline) {
      val (l1, l5) = loadavg()
      System.err.println(f"[bench] loadavg $l1%.2f/$l5%.2f (1m/5m) > " +
        f"$quietBound%.2f/$quietBound5%.2f — waiting for quiet")
      Thread.sleep(10000)
    }
    val (loadBefore, load5Before) = loadavg()
    // Optional subset filter (comma-separated gate names or unique id
    // prefixes): the sf10 heavy-gate scale point (r9 VERDICT #5) runs
    // ~10 gates against a 100× corpus — timing the other 110 there
    // would cost minutes for no signal.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) =>
        only.forall(o => o.contains(n) || o.contains(n.takeWhile(_ != '_'))) }

    val errors = scala.collection.mutable.LinkedHashSet.empty[String]
    val samples = timeSuite(spark, queries, sfDir, TimedPasses, errors)
    val medians = samples.map(s => s.sorted.apply(s.size / 2))
    val mins = samples.map(_.min)
    // per-query spread = max − min over the timed passes (r13, VERDICT
    // #6): quiet-tier totals still drift several seconds round-to-round
    // from ambient load; with min AND median AND spread in the artifact
    // a reader can attribute a delta to contention (median ≫ min, wide
    // spread, uniform across floor rows) vs code without re-measuring.
    val spreads = samples.map(s => s.max - s.min)
    val qs = jsonMap(queries.indices.map(i => queries(i)._1 -> r4(medians(i))))
    val qmins = jsonMap(queries.indices.map(i => queries(i)._1 -> r4(mins(i))))
    val qspread = jsonMap(queries.indices.map(i => queries(i)._1 -> r4(spreads(i))))
    val total = medians.sum
    val totalMin = mins.sum

    // Shared assembly for a second scale point: per-query time ratio,
    // flags above 1.5× the data ratio (10× data → flag > 15), and the
    // other dir's mins. Locale-independent 2-decimal rendering for the
    // ratios: f"%.2f" would emit a decimal COMMA (invalid JSON) under
    // comma-decimal locales.
    def scalePoint(otherDir: String, otherMins: Array[Double],
        dirKey: String, minsKey: String, dataRatio: Double,
        ratioOf: Int => Double): String = {
      val ratios = queries.indices.map(i => queries(i)._1 -> ratioOf(i))
      val flagged = ratios.filter(_._2 > 1.5 * dataRatio).map(_._1)
      val r = jsonMap(ratios.map { case (k, v) =>
        k -> (math.round(v * 100.0) / 100.0).toString })
      val f = flagged.map("\"" + _ + "\"").mkString("[", ",", "]")
      val om = jsonMap(queries.indices.map(i => queries(i)._1 -> r4(otherMins(i))))
      s"""{"$dirKey":"$otherDir","data_ratio":$dataRatio,""" +
        s""""$minsKey":$om,"time_ratio":$r,"superlinear":$f}"""
    }

    // Optional second scale point: min-of-passes at the sibling small
    // SF, reported as ratio = min(base) / min(small) per query. With a
    // 10× data ratio, linear-or-better queries stay ≲ 10–15; a
    // quadratic candidate-generation stage reads far above it.
    val scaling = {
      val smallDir = sfDir.replace("sf0.1", "sf0.01")
      if (sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") != "0" &&
          smallDir != sfDir && new java.io.File(smallDir).isDirectory) {
        graft.operators.TextOps.releaseCache(spark)
        val small = timeSuite(spark, queries, smallDir, ScalingPasses, errors)
        val smallMins = small.map(_.min)
        Some(scalePoint(smallDir, smallMins, "small_sf", "queries_min_small",
          10.0, i => mins(i) / math.max(smallMins(i), 1e-9)))
      } else None
    }

    // Optional UPWARD scale point (r8 VERDICT #4): a locally generated
    // ~sf1 corpus (tools/scale_up.py, 10× sf0.1 with shifted keys)
    // turns "the plans are shaped for 100 TB" into a measurement at a
    // second, larger 10× step. Ratio = min(big) / min(base); the flag
    // threshold scales with the configured data ratio. Runs without
    // the extra warmup pass (the JVM is hot from the base suite;
    // min-of-passes absorbs first-pass plan builds).
    val scaleUp = {
      val bigDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_UP_DIR", "target/sf1")
      val upRatio = sys.env.getOrElse("SPARK_GRAFT_SCALE_UP_RATIO", "10.0").toDouble
      // staleness guard: target/sf1 derives from sf0.1 (tools/scale_up.py);
      // if the corpus was regenerated after sf1 was built — or scale_up.py
      // died mid-write — the two dirs describe DIFFERENT data and the
      // ratio would be meaningless. Every source table must have a
      // same-named file in the big dir at least as new as it.
      val fresh = {
        val srcFiles = Option(new java.io.File(sfDir).listFiles())
          .getOrElse(Array.empty[java.io.File])
          .filter(_.getName.endsWith(".parquet"))
        srcFiles.nonEmpty && srcFiles.forall { sf =>
          val df = new java.io.File(bigDir, sf.getName)
          df.isFile && df.lastModified() >= sf.lastModified()
        }
      }
      // an EXPLICIT scale-up dir unlocks any base pair (e.g. the r10
      // sf1 → sf10 heavy-gate step); the default target/sf1 section
      // still only fires from the standard sf0.1 base
      val explicitUp = sys.env.contains("SPARK_GRAFT_SCALE_UP_DIR")
      if (sys.env.getOrElse("SPARK_GRAFT_SCALE_UP", "1") != "0" &&
          (sfDir.endsWith("sf0.1") || explicitUp) && fresh) {
        graft.operators.TextOps.releaseCache(spark)
        val big = timeSuite(spark, queries, bigDir, ScalingPasses, errors,
          warm = false)
        val bigMins = big.map(_.min)
        Some(scalePoint(bigDir, bigMins, "big_sf", "queries_min_big",
          upRatio, i => bigMins(i) / math.max(mins(i), 1e-9)))
      } else None
    }

    // stdout: contract fields only, sized so BOTH emitted copies (bare +
    // sentinel-prefixed, see below) fit together inside the driver's
    // 2,000-char log tail alongside sbt's trailing "[success] …" line.
    // Full query names alone are ~1.2 KB at 70 queries, so the compact
    // lines key queries by their unique id prefix (q1, t46, v40, …);
    // the id→full-name map and full-precision medians/mins live in the
    // file artifact. Each copy sheds precision 4→1 decimals before
    // giving up per-query detail entirely, against its OWN budget: the
    // bare copy fits 950 chars; the sentinel copy — the final line, the
    // one a tail can never truncate mid-head — spends whatever the bare
    // copy left of the 1,900-char pair budget, so when the suite
    // outgrows 950-char maps (89 queries did, r8) the per-query detail
    // survives on the sentinel line instead of vanishing from both.
    // Machine-state fields (r9 VERDICT #2, tightened r11 per VERDICT
    // #7): `steady` means TRUE quiet at run start — 1-min load under
    // max(0.5, cores/16) — because r10's own measurements showed a
    // decaying loadavg of ~3 still inflating the suite ~15% under the
    // old cores/4 bound. The old bound survives as the `load_tier`
    // field: "quiet" (steady), "warm" (under cores/4 — usable but
    // possibly ~5–15% inflated), "loaded" (contention-dominated).
    val (loadAfter, load5After) = loadavg()
    // steady = truly quiet at start on BOTH horizons (r14): the 1-min
    // gate alone blessed r13's still-draining machine
    val steady = loadBefore >= 0 && loadBefore <= quietBound &&
      load5Before >= 0 && load5Before <= quietBound5
    val loadTier =
      if (steady) "quiet"
      else if (loadBefore >= 0 && loadBefore <= math.max(2.0, cpus.toDouble / 4) &&
        load5Before <= math.max(4.0, cpus.toDouble / 4)) "warm"
      else "loaded"
    val loadJson = s""""loadavg":[${fixed(loadBefore, 2)},${fixed(loadAfter, 2)}],""" +
      s""""loadavg5":[${fixed(load5Before, 2)},${fixed(load5After, 2)}],""" +
      s""""steady":$steady,"load_tier":"$loadTier","passes":$TimedPasses"""

    val ids = queries.map(_._1.takeWhile(_ != '_'))
    val useIds = ids.distinct.size == ids.size
    val keys = if (useIds) ids else queries.map(_._1)
    val minimal =
      s"""{"metric":"total","value":${fixed(total, 4)},"unit":"sec",$loadJson,"sf":"$sfDir"}"""
    // r16 (VERDICT #1): the driver json-parses the FIRST PLAIN JSON
    // line and reads `queries` from THAT — r14/r15 carried per-query
    // times only on the sentinel-prefixed copy, so PERF.per_query /
    // geomean / scaling.per_query came up empty two rounds running.
    // There is now exactly ONE wire payload, and it carries the
    // queries map (plus queries_min when it fits): emitted once with
    // the BENCHJSON sentinel for grep-based readers and once bare as
    // the ABSOLUTE FINAL line, so that whether the parser scans the
    // full log (one bare JSON line, with queries) or only a bounded
    // 2,000-char tail (the final line is never head-truncated), it
    // sees the per-query map. Decimals shed 4→1 against the single-
    // line budget before per-query detail is dropped entirely; the
    // full-precision map stays in the file artifact either way.
    def sized(budget: Int): String = {
      val variants = for {
        withMin <- Iterator(true, false)
        dec <- Iterator(4, 3, 2, 1)
      } yield {
        val q = jsonMap(queries.indices.map(i => keys(i) -> fixed(medians(i), dec)))
        val qm =
          if (withMin)
            s""","queries_min":${jsonMap(queries.indices.map(i => keys(i) -> fixed(mins(i), dec)))}"""
          else ""
        s"""{"metric":"total","value":${fixed(total, dec)},"unit":"sec",""" +
          s""""queries":$q$qm,$loadJson,"sf":"$sfDir"}"""
      }
      variants.find(_.length <= budget).getOrElse(minimal)
    }
    val wire = sized(1850)
    // file: the full diagnostic artifact (full names, full precision).
    // `errors` names every query that threw in any timed pass — its
    // median is time-to-FAILURE, not a measurement, and must not be
    // read as a win.
    val names = jsonMap(queries.indices.map(i => keys(i) -> ("\"" + queries(i)._1 + "\"")))
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val full = s"""{"metric":"total","value":${r4(total)},"unit":"sec",""" +
      s""""total_min":${r4(totalMin)},""" +
      s""""queries":$qs,"queries_min":$qmins,"queries_spread":$qspread,""" +
      s""""query_names":$names,""" +
      s""""errors":$errJson,$loadJson,"sf":"$sfDir"""" +
      scaling.map(s => s""","scaling":$s""").getOrElse("") +
      scaleUp.map(s => s""","scale_up":$s""").getOrElse("") + "}"
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), full + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath failed: $e") }
    graft.operators.TextOps.releaseCache(spark)
    spark.stop()
    // The LAST stdout writes, after spark.stop() so no log line can
    // follow or interleave. Two copies of the SAME wire payload: a
    // sentinel-prefixed copy for a parser — or the judge — that greps
    // for it, then the bare JSON line LAST (the one position a bounded
    // log tail can never truncate mid-head) for a driver parser that
    // json.loads() plain lines (build.sbt sets `run / outputStrategy
    // := StdoutOutput` so forked stdout passes through raw).
    println("BENCHJSON " + wire)
    println(wire)
    System.out.flush()
  }
}
