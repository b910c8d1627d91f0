package graft

import java.sql.Timestamp
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.functions._
import graft.functions.QuantileSketch
import graft.tsdb.QuantileSketchStore

/** The GK quantile-sketch layer ([[graft.functions.QuantileSketch]] +
  * [[graft.tsdb.QuantileSketchStore]]): codec fidelity, the
  * deterministic ±ε·n rank guarantee through the aggregate AND
  * through merged per-window layer sketches, and the non-finite-skip
  * convention. The `ts_quantile_sketch` gate pins the same rank
  * contract against the driver's events table.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("codec roundtrip preserves the summary (count + queries)") {
    var qs = new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, 0.01, Array.empty, 0L, false)
    (1 to 1000).foreach(i => qs = qs.insert(i.toDouble))
    val back = QuantileSketch.fromBytes(QuantileSketch.toBytes(qs))
    assert(back.count == 1000L)
    assert(back.relativeError == 0.01)
    for (q <- Seq(0.0, 0.25, 0.5, 0.9, 1.0))
      assert(back.query(q) == qs.compress().query(q), s"q=$q diverged")
  }

  test("sketchAgg: distributed build obeys the rank bound") {
    // values 1..n → value IS its rank, so the GK guarantee reads
    // directly as |answer − q·n| ≤ ε·n (+1 for rank/value offset)
    val n = 10000
    val df = (1 to n).map(i => ("a", i.toDouble)).toDF("s", "v")
      .repartition(8) // partial buffers must merge across partitions
    val sk = df.groupBy("s")
      .agg(QuantileSketch.sketchAgg(col("v"), 0.01).as("sk"))
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val v = sk.select(QuantileSketch.query(col("sk"), lit(q)))
        .as[Double].head()
      assert(math.abs(v - q * n) <= 0.02 * n + 1,
        s"q=$q answered $v, want within ${0.02 * n + 1} of ${q * n}")
    }
  }

  test("layer: merged per-window sketches hold the 2ε rank contract; " +
      "NaN skipped; empty range empty") {
    def ts(s: String) = Timestamp.valueOf(s)
    val base = 1704067200000L // 2024-01-01T00:00Z
    val day = 86400000L
    // three day-windows, values interleaved so no window is a
    // contiguous value range; one NaN staleness marker
    val rows = (0 until 900).map { i =>
      val d = i % 3
      ("a", new Timestamp(base + d * day + (i / 3) * 60000L),
        ((i * 37) % 900 + 1).toDouble)
    } :+ (("a", ts("2024-01-02 10:00:00"), Double.NaN))
    val df = rows.toDF("s", "ts", "v")
    val p = "/tmp/graft_qsketch_spec"
    QuantileSketchStore.write(df, p, Seq("s"), "ts", "v", day,
      relativeError = 0.01)
    // NaN skipped: total sketched count is 900, not 901
    val counts = QuantileSketchStore.read(spark, p)
      .select(col("qsketch")).collect()
      .map(r => QuantileSketch.fromBytes(r.getAs[Array[Byte]](0)).count)
    assert(counts.sum == 900L)
    // merged 3-day quantile: rank of the answer among the 900 raw
    // values within ±2ε·n of q·n (values are a permutation of
    // 1..900, so rank == value)
    for (q <- Seq(0.5, 0.9)) {
      val v = QuantileSketchStore.quantileOverTime(spark, p, Seq("s"), q,
        base, base + 3 * day).select("value").as[Double].head()
      assert(math.abs(v - q * 900) <= 0.02 * 900 + 1,
        s"q=$q answered $v")
    }
    // an aligned range past the data: no series rows at all
    assert(QuantileSketchStore.quantileOverTime(spark, p, Seq("s"), 0.5,
      base + 10 * day, base + 11 * day).count() == 0)
  }
}
