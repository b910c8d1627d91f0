package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the given scale
  * factor and prints ONE JSON line the driver collects into
  * BENCH_r{N}.json. The same line is also written verbatim to
  * `bench_out.json` in the working directory, and a compact (<1 KB)
  * summary line prints LAST, so both a whole-stdout line scan and a
  * bounded tail capture can recover the results (rounds 1–12 lost
  * the line to sbt's "[info] " prefix + tail truncation).
  *
  * Measurement discipline: a FULL untimed warm-up pass runs every
  * query once (JIT-compiling each plan's generated code, loading
  * classes, priming the parquet footer cache), then
  * `SPARK_GRAFT_BENCH_PASSES` (default 3) timed passes run and each
  * query reports its MEDIAN — the standard robust estimator, immune
  * to the one-off GC/compilation hiccup a single pass can catch in a
  * 49-query shared JVM. `value` is the sum of per-query medians.
  * Failures are never reported as fake timings: a failed query gets
  * -1 and its name in the `errors` list, and is excluded from total.
  *
  * `SPARK_GRAFT_ONLY` (comma-separated names) restricts the run for
  * standalone profiling.
  *
  * `SPARK_GRAFT_BENCH_ISOLATE=1` runs every query in its OWN child
  * JVM (same flags as the suite JVM, fresh code cache, fresh Spark
  * session) and merges the children's JSON — the diagnostic mode
  * that separates inherent query cost from shared-JVM state (JIT
  * cache pressure, GC history, broadcast/codegen caches). Slower
  * wall-clock (one SparkSession bring-up per query); same output
  * contract.
  *
  * The DEFAULT (in-suite) mode additionally re-runs the
  * `SPARK_GRAFT_BENCH_ISOLATE_TOP` (default 10) heaviest queries
  * isolated and ships both columns in the one JSON line
  * (`"queries"` = in-suite medians, `"isolated_medians"` = child-JVM
  * medians), flagging any query whose in-suite median exceeds 2× its
  * isolated one as a co-residency artifact on stderr.
  *
  * It also ships the SCALE-SLOPE columns: the family representatives
  * in `SPARK_GRAFT_SF1_EXTRA` (default: a PromQL range-grid query,
  * an NH block ingestion query, a wide-schema select, the
  * reset-aware NH rate fold, and the rollup-layer paths — routed
  * range rate, stitched increase, routed NH quantile, routed classic
  * le-quantile — families the heaviest-N set never samples) FIRST,
  * then the `SPARK_GRAFT_SF1_TOP` (default 10) heaviest queries
  * (extras lead so budget exhaustion can only ever drop heavy-set
  * repeats, never the slope-critical family cells — the r10 lesson);
  * declared-quadratic baselines (dd_embed_neardup) are excluded by
  * name so a healthy run's timeout lists are EMPTY. Each re-runs
  * one-per-child-JVM against a ×`SPARK_GRAFT_SF1_FACTOR` (default
  * 10) replica
  * of the bench SF built by [[graft.tools.ScaleUp]] under /tmp
  * (marker-cached) → `"sf1_medians"`/`"sf1_factor"`/`"sf1_skipped"`
  * /`"sf1_timeout"`; then the `SPARK_GRAFT_SF3X_TOP` (default 5)
  * heaviest re-run against a ×`SPARK_GRAFT_SF3X_FACTOR` (default
  * 30) replica → the same four keys under `sf3x_*`, so the
  * concavity claim (is the curve bending down between ×10 and ×30?)
  * is machine-recorded every round instead of hand-probed. The line
  * also carries `run_band` — the median/p90 of per-query
  * (max − min)/median spread across the timed passes — so the
  * noise-vs-regression call is mechanical from the artifact alone.
  * Each child is capped at 8 min and each column at
  * `SPARK_GRAFT_SF1_BUDGET_MIN` / `SPARK_GRAFT_SF3X_BUDGET_MIN`
  * (default 12 / 10) — a pathological query costs its own cell,
  * never the results line, and lands VISIBLY in `*_timeout` (child
  * cap) or `*_skipped` (column budget): an absent cell is always
  * explained by one of the two lists. s/sf slopes worse than ~1.5×
  * linear are scale smells for the round writeup.
  * `SPARK_GRAFT_SF1_TOP=0` disables both; `SPARK_GRAFT_SF3X_TOP=0`
  * only the ×30 column; children always disable them.
  */
object Bench {

  /** Child-JVM flags: inherit THIS JVM's arguments (the suite JVM
    * the child claims to mirror — picks up build.sbt's javaOptions
    * without a hand-maintained copy that would drift), then append
    * the bench-specific overrides (last occurrence wins for -D and
    * -Xmx in HotSpot).
    */
  private def childJvmFlags: Seq[String] = {
    import scala.jdk.CollectionConverters._
    val inherited = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
      .filterNot(_.startsWith("-agentlib:")) // no debugger port clash
    inherited ++ Seq(
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
      "-XX:ReservedCodeCacheSize=512m",
      "-XX:+UseCodeCacheFlushing")
  }

  /** One child JVM running a single query's bench (warm-up +
    * `passes` timed passes, fresh Spark session); returns its
    * median. `sfDir` overrides the child's scale-factor dir (the
    * sf1 scale-slope column); `timeoutMin` bounds the child.
    */
  private def runChild(name: String, passes: Int,
      sfDir: Option[String] = None, timeoutMin: Long = 10,
      tag: String = "bench-isolate",
      extraEnv: Map[String, String] = Map.empty): Option[Double] = try {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val pb = new ProcessBuilder(
      (Seq(javaBin) ++ childJvmFlags ++ Seq("-cp", cp, "graft.Bench")): _*)
    pb.environment().put("SPARK_GRAFT_ONLY", name)
    pb.environment().put("SPARK_GRAFT_BENCH_CHILD", "1")
    pb.environment().put("SPARK_GRAFT_BENCH_PASSES", passes.toString)
    pb.environment().put("SPARK_GRAFT_BENCH_ISOLATE_TOP", "0")
    pb.environment().put("SPARK_GRAFT_SF1_TOP", "0")
    sfDir.foreach(pb.environment().put("SPARK_GRAFT_SF_DIR", _))
    extraEnv.foreach { case (k, v) => pb.environment().put(k, v) }
    pb.environment().remove("SPARK_GRAFT_BENCH_ISOLATE")
    // child stderr flows straight to ours: reading stdout to EOF
    // while stderr sits in a full pipe would deadlock exactly when
    // a child fails loudly (Spark task retries easily exceed the
    // pipe buffer) — the failure-diagnosis scenario this mode is for
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val proc = pb.start()
    // stdout drained on a daemon thread with a hard deadline on the
    // child: a hung child JVM must cost this query's column, never
    // the whole results line
    val outF = new java.util.concurrent.CompletableFuture[String]()
    val drain = new Thread(() =>
      outF.complete(
        try new String(proc.getInputStream.readAllBytes(), "UTF-8")
        catch { case _: Throwable => "" }))
    drain.setDaemon(true)
    drain.start()
    val finished =
      proc.waitFor(timeoutMin, java.util.concurrent.TimeUnit.MINUTES)
    if (!finished) {
      proc.destroyForcibly()
      System.err.println(s"[$tag] $name timed out after $timeoutMin min; killed child")
      None
    } else {
      val out = outF.get(30, java.util.concurrent.TimeUnit.SECONDS)
      // child prints one JSON line: {"..."queries":{"<name>":sec},...}
      val re = ("\"" + java.util.regex.Pattern.quote(name) + "\":(-?[0-9.]+)").r
      val t = re.findFirstMatchIn(out).map(_.group(1).toDouble).getOrElse(-1.0)
      System.err.println(f"[$tag] $name%-24s ${t}%.3f s")
      if (t >= 0) Some(t) else None
    }
  } catch {
    case t: Throwable =>
      System.err.println(s"[$tag] $name child spawn failed: $t")
      None
  }

  /** Emit the results: the full one-line JSON (the 12-round stdout
    * contract, unchanged) plus two robustness channels the r12
    * verdict asked for — the same line written verbatim to
    * `bench_out.json` in the working directory, and a compact
    * (<1 KB) summary line printed LAST so a bounded stdout-tail
    * capture always contains one complete parseable JSON line (the
    * full line is ~6 KB and every driver tail in rounds 1–12
    * truncated it before the opening brace → `parsed: null`).
    * The compact line carries the same metric/value/unit/sf keys and
    * points at the full artifact via `queries_file`.
    */
  private def emitResult(fullLine: String, compactMid: String): Unit = {
    println(fullLine)
    // child JVMs (runChild) share the parent's cwd: they print their
    // one-liner (the parent regex-scrapes it) but must not clobber
    // the parent run's bench_out.json
    if (!sys.env.get("SPARK_GRAFT_BENCH_CHILD").contains("1")) {
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_out.json"),
        (fullLine + "\n").getBytes("UTF-8"))
      catch { case t: Throwable =>
        System.err.println(s"[bench] bench_out.json write failed: $t") }
      println(compactMid)
    }
  }

  /** Isolated mode: one child JVM per query, merged results. */
  private def runIsolated(names: Seq[String], passes: Int): Unit = {
    val results = names.map(name => (name, runChild(name, passes)))
    val qs = results.map { case (k, m) =>
      "\"" + k + s"""\":${m.map(v => f"$v%.3f").getOrElse("-1")}"""
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, None) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    emitResult(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errors,"passes":$passes,"isolated":true,"sf":"$sfDir"}""",
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"errors":$errors,"passes":$passes,"isolated":true,"queries_file":"bench_out.json","sf":"$sfDir"}""")
  }

  def main(args: Array[String]): Unit = {
    val wall0 = System.nanoTime()
    val phases = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    var phaseT0 = wall0
    def phase(name: String): Unit = {
      val now = System.nanoTime()
      phases(name) = (now - phaseT0) / 1e9
      phaseT0 = now
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // 3 passes by default: the driver's round budget also pays a cold
    // sbt compile and ×10/×30 replica generation, and the r11 run
    // overran it — the run_band spread columns already quantify what
    // the thinner median costs. The full 5-pass protocol stays one
    // env var away (SPARK_GRAFT_BENCH_PASSES=5) for builder-side
    // evidence runs.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt.max(1)
    if (sys.env.get("SPARK_GRAFT_BENCH_ISOLATE").exists(_ == "1")) {
      val only = sys.env.get("SPARK_GRAFT_ONLY")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      runIsolated(
        SparkEntry.queries.keys.toSeq.sorted.filter(n => only.forall(_.contains(n))),
        passes)
      return
    }
    // Shuffle-partition count: defaults to the core count (the
    // sf0.1 sweet spot). The env override exists for PROFILING
    // partition-count sensitivity (use SPARK_GRAFT_SF1_SHUFFLE_
    // PARTITIONS to perturb only the ×N slope children and leave
    // the 1× baseline medians alone); measured at ×10 on local[32]
    // a higher count was not a win — the r9 slope investigation
    // found the superlinearity in the DATA generator, not here.
    val shufflePartitions = sys.env
      .getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // Warm-up: every query once, untimed.
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    phase("warmup")

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Option[Double] = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
      catch { case _: Throwable => None }
    }

    // Sub-second drift bound (r12 verdict item 5): ~37 sub-second
    // cells drifted 15–35% across same-protocol runs with untouched
    // plans — tiny absolute jitter read as large relative drift. A
    // sub-second cell (median < 1 s after the standard passes) now
    // takes extra passes up to SPARK_GRAFT_BENCH_LIGHT_PASSES
    // (default 5) and reports the median of all of them; the cost is
    // bounded by the cells being sub-second (~30 s suite-wide).
    // Heavies (≥ 1 s) keep exactly the 3-pass protocol of rounds
    // 11–12, so cross-round heavy comparisons are untouched. Slope
    // children (passes = 1) are exempt: a slope cell is a single
    // datapoint by design and its ×N timing is often NOT sub-second.
    val lightPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_LIGHT_PASSES", "5")
      .toInt.max(passes)
    val resultsFull = ordered.map { case (name, fn) =>
      val base = (0 until passes).flatMap(_ => timeOnce(fn))
      val med = if (base.isEmpty) None
        else Some(base.sorted.apply((base.size - 1) / 2))
      val times =
        if (passes >= 2 && med.exists(_ < 1.0) && lightPasses > passes)
          base ++ (passes until lightPasses).flatMap(_ => timeOnce(fn))
        else base
      (name, times)
    }
    phase("timed_passes")
    val results = resultsFull.map { case (name, times) =>
      val median = if (times.isEmpty) None
        else Some(times.sorted.apply((times.size - 1) / 2))
      (name, median)
    }
    val qs = results.map { case (k, m) =>
      "\"" + k + s"""\":${m.map(v => f"$v%.3f").getOrElse("-1")}"""
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, None) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum

    // Run-band attestation, machine-recorded IN the artifact (the
    // r10 judge had to re-derive the noise band from three manual
    // runs): per query, spread = (max − min) / median across the
    // timed passes; the line carries the median and p90 of those
    // spreads. Per-query deltas inside ~the p90 band on an unchanged
    // plan are pass-to-pass noise, not regressions — slope RATIOS
    // remain the stable cross-round signal.
    val runBand = {
      def bands(min: Double) = resultsFull.collect {
        case (_, times) if times.size >= 2 && times.min > 0 &&
            times.sorted.apply((times.size - 1) / 2) >= min =>
          val med = times.sorted.apply((times.size - 1) / 2)
          100.0 * (times.max - times.min) / med
      }.sorted
      val spreads = bands(0.0)
      // sub-second queries read large RELATIVE spreads off tiny
      // absolute jitter; the heavy band (median ≥ 1 s) is the one a
      // regression hunt should compare against
      val heavy = bands(1.0)
      def medP90(xs: Seq[Double]): (Double, Double) =
        (xs((xs.size - 1) / 2), xs(((xs.size - 1) * 9) / 10))
      if (spreads.isEmpty) ""
      else {
        val (med, p90) = medP90(spreads)
        val heavyPart = if (heavy.isEmpty) "" else {
          val (hm, hp) = medP90(heavy)
          f""","heavy_median_spread_pct":$hm%.1f,"heavy_p90_spread_pct":$hp%.1f,"heavy_n":${heavy.size}"""
        }
        f""","run_band":{"passes":$passes,"median_spread_pct":$med%.1f,"p90_spread_pct":$p90%.1f$heavyPart}"""
      }
    }

    // Scale-slope datapoints: replicate this SF ×10 and ×30 into
    // /tmp (once each; marker-cached) while the session is still up.
    // Generation is untimed harness work; a failure disables only
    // its own column.
    val sf1Top = sys.env.getOrElse("SPARK_GRAFT_SF1_TOP", "10").toInt
    val sf1Factor = sys.env.getOrElse("SPARK_GRAFT_SF1_FACTOR", "10").toInt
    val sf3xTop = if (sf1Top <= 0) 0
      else sys.env.getOrElse("SPARK_GRAFT_SF3X_TOP", "5").toInt
    val sf3xFactor = sys.env.getOrElse("SPARK_GRAFT_SF3X_FACTOR", "30").toInt
    def replicaDir(factor: Int): String =
      s"/tmp/graft_sf${factor}x_" + sfDir.replaceAll("[^0-9a-zA-Z]", "_")
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR",
      "/tmp/graft_sf1_" + sfDir.replaceAll("[^0-9a-zA-Z]", "_"))
    val sf3xDir = sys.env.getOrElse("SPARK_GRAFT_SF3X_DIR",
      replicaDir(sf3xFactor))
    def ensureReplica(dir: String, factor: Int, tag: String): Boolean =
      try { tools.ScaleUp.ensure(spark, sfDir, dir, factor); true }
      catch {
        case t: Throwable =>
          System.err.println(s"[$tag] scale-up generation failed: $t")
          false
      }
    val sf1Ready = sf1Top > 0 && ensureReplica(sf1Dir, sf1Factor, "bench-sf1")
    val sf3xReady = sf3xTop > 0 &&
      ensureReplica(sf3xDir, sf3xFactor, "bench-sf3x")
    spark.stop()
    phase("replicas")

    // Shared-JVM pressure diagnosis (bench hygiene): the TOP-N
    // heaviest queries get an ISOLATED re-run — a fresh child JVM
    // each (fresh code cache, fresh session) — and both columns ship
    // in the one JSON line. A query whose in-suite median exceeds 2×
    // its isolated median is a co-residency artifact (page-cache /
    // JIT-cache pressure from 130 plans in one JVM), not a plan
    // regression; the flag list makes that call mechanical instead
    // of a per-round investigation. SPARK_GRAFT_BENCH_ISOLATE_TOP=0
    // disables (the child JVMs set it to 0 themselves).
    val isoTop = sys.env.getOrElse("SPARK_GRAFT_BENCH_ISOLATE_TOP", "10")
      .toInt
    // (key is isolated_medians, not the isolated-MODE boolean flag
    // runIsolated prints — a JSON consumer never has to branch on a
    // value's type). The whole block degrades to nothing on any
    // failure: the diagnostic column must never cost the primary
    // results line.
    val isoJson = if (isoTop <= 0) "" else try {
      val heavy = results.collect { case (n, Some(t)) => (n, t) }
        .sortBy(-_._2).take(isoTop)
      val iso = heavy.map { case (n, _) =>
        (n, runChild(n, passes = math.min(passes, 3)))
      }
      val pressured = heavy.zip(iso).collect {
        case ((n, suite), (_, Some(alone))) if suite > 2 * alone => n
      }
      if (pressured.nonEmpty)
        System.err.println(
          s"[bench] in-suite > 2x isolated (pressure artifacts): ${pressured.mkString(", ")}")
      iso.map { case (k, m) =>
        "\"" + k + s"""\":${m.map(v => f"$v%.3f").getOrElse("-1")}"""
      }.mkString(""","isolated_medians":{""", ",", "}")
    } catch {
      case t: Throwable =>
        System.err.println(s"[bench] isolated re-run skipped: $t")
        ""
    }
    phase("isolated")

    // Pinned isolated sample (r12 verdict item 5): a FIXED, named
    // 10-cell sample of sub-second representatives (one per family:
    // PromQL grid, routed rollup, raw instant, wide select, TSDB
    // block read, label index, NH quantile, text, relational window,
    // dedup) re-measured in fresh child JVMs every canonical run.
    // Because each child starts with fresh JIT/GC/code-cache state,
    // these cells are comparable ACROSS rounds regardless of how
    // suite co-residency shifts — the mechanical arbiter for
    // "sub-second drift vs plan regression" the r12 verdict asked
    // for. SPARK_GRAFT_PINNED_ISO overrides the list; empty disables.
    val pinnedNames = sys.env.getOrElse("SPARK_GRAFT_PINNED_ISO",
        "ts_promql_rate_sum,ts_promql_rollup_irate,ts_irate," +
          "ts_wide_select,ts_tsdb_block_select,ts_label_values_indexed," +
          "txt_lang_id,q05_window_topk,ts_native_hist_quantile,dd_exact")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      .filter(n => results.exists { case (q, t) => q == n && t.isDefined })
    val pinnedJson = if (isoTop <= 0 || pinnedNames.isEmpty) "" else try {
      val iso = pinnedNames.map { n =>
        (n, runChild(n, passes = math.min(passes, 3), tag = "bench-pinned"))
      }
      iso.map { case (k, m) =>
        "\"" + k + s"""\":${m.map(v => f"$v%.3f").getOrElse("-1")}"""
      }.mkString(""","pinned_isolated_medians":{""", ",", "}")
    } catch {
      case t: Throwable =>
        System.err.println(s"[bench] pinned isolated sample skipped: $t")
        ""
    }
    phase("pinned")

    // Optional SF1-ONLY shuffle-partition override: perturbs the
    // ×N children without touching the 1× baseline medians the
    // slope ratios divide by. (Measured at ×10 on local[32], a
    // higher count was NOT an improvement — 256 partitions ran
    // 23% slower than 32 — so the default inherits the suite's;
    // the knob exists for profiling other shapes, not as a fix.)
    val slopeEnv = sys.env.get("SPARK_GRAFT_SF1_SHUFFLE_PARTITIONS")
      .map(p => Map("SPARK_GRAFT_SHUFFLE_PARTITIONS" -> p))
      .getOrElse(Map.empty)

    // One scale-slope column: the given queries re-run
    // one-per-child-JVM against the ×`factor` replica dir (1 timed
    // pass — a slope datapoint, not a precision benchmark) under a
    // global wall budget, so a pathological query costs only its own
    // cell — and that absence is ALWAYS explained in the JSON: a
    // child that hits the 8-min per-query cap (or dies) lands in
    // `<key>_timeout`, a query the column budget never reached in
    // `<key>_skipped`. s/sf worse than ~1.5× linear vs the in-suite
    // median is a scale smell the round writeup must diagnose.
    def slopeColumn(key: String, factor: Int, dir: String,
        names: Seq[String], budgetMin: Long): String = try {
      val deadline = System.nanoTime() + budgetMin * 60L * 1_000_000_000L
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
      val timedOut = scala.collection.mutable.ArrayBuffer.empty[String]
      names.foreach { n =>
        if (System.nanoTime() > deadline) skipped += n
        else runChild(n, passes = 1, sfDir = Some(dir),
          timeoutMin = 8, tag = s"bench-$key", extraEnv = slopeEnv) match {
          case Some(t) => m(n) = t
          case None => timedOut += n
        }
      }
      if (skipped.nonEmpty)
        System.err.println(
          s"[bench-$key] $budgetMin-min budget exhausted, skipped: ${skipped.mkString(", ")}")
      if (timedOut.nonEmpty)
        System.err.println(
          s"[bench-$key] per-query cap hit (or child died): ${timedOut.mkString(", ")}")
      val skJson = skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
      val toJson = timedOut.map("\"" + _ + "\"").mkString("[", ",", "]")
      if (m.isEmpty && skipped.isEmpty && timedOut.isEmpty) ""
      else m.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString(
        s""","${key}_factor":$factor,"${key}_skipped":$skJson,"${key}_timeout":$toJson,"${key}_medians":{""",
        ",", "}")
    } catch {
      case t: Throwable =>
        System.err.println(s"[bench] $key column skipped: $t")
        ""
    }

    // Declared-quadratic correctness baselines never ride the slope
    // columns: dd_embed_neardup hits the 8-min child cap at ×10 BY
    // DESIGN every round (its hyperplane-LSH twin is the scale
    // path) — burning the cap proves nothing, so its budget goes to
    // real cells and a healthy run's *_timeout lists stay EMPTY.
    val slopeExclude = Set("dd_embed_neardup")
    val heavyAll = results.collect {
      case (n, Some(t)) if !slopeExclude(n) => (n, t)
    }.sortBy(-_._2)
    // breadth: family representatives the heaviest-N set never
    // samples ride along in the ×10 column
    val sf1Extra = sys.env.getOrElse("SPARK_GRAFT_SF1_EXTRA",
        "ts_promql_range_rate,ts_tsdb_block_nh_select,ts_wide_select," +
          "ts_promql_nh_reset_rate,ts_promql_rollup_range_rate," +
          "ts_rollup_increase,ts_promql_nh_rollup_quantile," +
          "ts_promql_rollup_classic_quantile," +
          // routed-vs-raw slope PAIRS for the r11 families: the
          // instant-rate pair (raw pays a per-series window sort over
          // samples; the layer reads stored last-two pairs) and the
          // label-metadata pair (raw distinct-scans a full label
          // column; the index reads bucket-grain rows)
          "ts_irate,ts_promql_rollup_irate," +
          "ts_label_values,ts_label_values_indexed")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      .filter(n => results.exists { case (q, t) => q == n && t.isDefined })
    val sf1Names = {
      // family representatives FIRST: budget exhaustion must drop
      // heavy-set repeats, never the slope-critical family cells —
      // r10's final recorded run lost its three routed-rollup cells
      // to exactly this ordering (extras sat after the heavy set and
      // the 20-min budget expired mid-extras)
      val heavy = heavyAll.take(sf1Top).map(_._1)
      sf1Extra ++ heavy.filterNot(sf1Extra.contains)
    }
    // Column budgets: 12 + 10 min by default (was 20 + 20) — the
    // family-representatives-first ordering means a tight budget can
    // only ever drop heavy-set repeats, and the driver's round budget
    // must also fit compile + replica generation + the suite itself
    // (the r11 driver run timed out at the old defaults).
    val sf1Json = if (!sf1Ready) ""
      else slopeColumn("sf1", sf1Factor, sf1Dir, sf1Names,
        sys.env.getOrElse("SPARK_GRAFT_SF1_BUDGET_MIN", "12").toLong)
    phase("sf1")
    val sf3xJson = if (!sf3xReady) ""
      else slopeColumn("sf3x", sf3xFactor, sf3xDir,
        heavyAll.take(sf3xTop).map(_._1),
        sys.env.getOrElse("SPARK_GRAFT_SF3X_BUDGET_MIN", "10").toLong)
    phase("sf3x")
    // Wall + per-phase elapsed ride IN the artifact so budget fit is
    // auditable from the JSON alone — no log archaeology when a
    // driver run gets close to its cap.
    val wallSec = (System.nanoTime() - wall0) / 1e9
    val phaseJson = phases.map { case (k, v) => "\"" + k + f"""\":$v%.1f""" }
      .mkString(""","phase_sec":{""", ",", "}")
    emitResult(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errors,"passes":$passes,"light_passes":$lightPasses,"wall_sec":$wallSec%.1f$phaseJson$runBand$isoJson$pinnedJson$sf1Json$sf3xJson,"sf":"$sfDir"}""",
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"errors":$errors,"passes":$passes,"wall_sec":$wallSec%.1f$runBand,"queries_file":"bench_out.json","sf":"$sfDir"}""")
  }
}
