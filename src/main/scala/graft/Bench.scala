package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the given scale
  * factor and prints ONE JSON line the driver collects into
  * BENCH_r{N}.json.
  *
  * Measurement discipline: a FULL untimed warm-up pass runs every
  * query once (JIT-compiling each plan's generated code, loading
  * classes, priming the parquet footer cache), then
  * `SPARK_GRAFT_BENCH_PASSES` (default 3) timed passes run and each
  * query reports its MEDIAN — the standard robust estimator, immune
  * to the one-off GC/compilation hiccup a single pass can catch in a
  * 47-query shared JVM. `value` is the sum of per-query medians.
  * Failures are never reported as fake timings: a failed query gets
  * -1 and its name in the `errors` list, and is excluded from total.
  *
  * `SPARK_GRAFT_ONLY` (comma-separated names) restricts the run for
  * standalone profiling.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Option[Double] = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
      catch { case _: Throwable => None }
    }

    val results = ordered.map { case (name, fn) =>
      val times = (0 until passes).flatMap(_ => timeOnce(fn))
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
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errors,"passes":$passes,"sf":"$sfDir"}""")
    spark.stop()
  }
}
