package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming transforms over an `events`-shaped stream
  * (ts, event_type, user_id, value). The batch engine's time-series
  * operators (PromOps) re-expressed for unbounded input: watermarked
  * windowed aggregation and per-series running state.
  *
  * The reference is a batch storage layer; its consumers (Thanos/
  * Cortex receivers) handle live series — this module is that live
  * path: `readStream` → these transforms → `writeStream` into the
  * same time-bucketed parquet layout [[graft.tsdb.TsdbConverter]]
  * writes, so the batch queryable sees a continuously-growing table.
  */
object EventsStream {

  /** Per-series tumbling-window aggregate with a watermark for state
    * eviction — the streaming form of PromOps.downsample.
    */
  def windowedAgg(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        avg("value").as("avg_value"),
        max("value").as("max_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("avg_value"), col("max_value"))

  /** Append-mode sink into the converter's bucketed layout. */
  def toBucketedParquet(events: DataFrame, path: String, checkpoint: String) =
    events
      .withColumn("bucket", graft.tsdb.TsdbConverter.bucketCol("ts", "1 day"))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("bucket")
}
