package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventsStream

class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedAgg aggregates a micro-batch stream with watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "user_id", "value")
    val agg = EventsStream.windowedAgg(events, "10 minutes", "1 minute")
    val query = agg.writeStream
      .format("memory").queryName("win_agg")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      mem.addData(
        (ts("2024-01-01 00:01:00"), "click", 1L, 10.0),
        (ts("2024-01-01 00:05:00"), "click", 2L, 20.0),
        (ts("2024-01-01 00:11:00"), "view", 1L, 5.0))
      query.processAllAvailable()
      val rows = s.sql(
        "SELECT event_type, n_events, avg_value FROM win_agg ORDER BY event_type")
        .collect()
      assert(rows.length == 2)
      assert(rows(0).getString(0) == "click" && rows(0).getLong(1) == 2L
        && rows(0).getDouble(2) == 15.0)
      assert(rows(1).getString(0) == "view" && rows(1).getLong(1) == 1L)
    } finally query.stop()
  }
}
