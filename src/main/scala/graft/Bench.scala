package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the given scale
  * factor and prints ONE JSON line the driver collects into
  * BENCH_r{N}.json.
  *
  * Measurement discipline: a FULL untimed warm-up pass runs every
  * query once (JIT-compiling each plan's generated code, loading
  * classes, priming the parquet footer cache), then a second pass is
  * timed. The recorded number therefore measures the PLAN, not
  * one-time JVM state — the defensible steady-state figure for an
  * engine that would run these queries repeatedly on a real cluster.
  * Failures are never reported as fake timings: a failed query gets
  * -1 and its name in the `errors` list, and is excluded from total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional comma-separated query filter for standalone profiling
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // Warm-up: every query once, untimed.
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count()
      catch { case _: Throwable => () }
    }

    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, ok) =>
      val shown = if (ok) f"$v%.3f" else "-1"
      "\"" + k + s"""\":$shown"""
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
