package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.DocStream

class DocStreamSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val period = "the cat sat on the mat and the dog ran to " +
    "the park while a bird flew over the house in the morning light "
  private val good = period * 6
  private val other = ("a completely different story where the wizard " +
    "walked through the forest of silver trees to find the hidden city ") * 4
  private val german = ("der hund und die katze und das haus " +
    "und der baum und die tür und das licht und der nicht ein ") * 6

  test("cleanIngest gates and dedups a doc stream within the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val out = DocStream.cleanIngest(docs, "text", "doc_id", "ts", "10 minutes")
    val query = out.writeStream
      .format("memory").queryName("clean_ingest")
      .outputMode(OutputMode.Append())
      .start()
    def ids: Set[Long] =
      s.sql("SELECT doc_id FROM clean_ingest").collect().map(_.getLong(0)).toSet
    try {
      mem.addData(
        (1L, ts("2024-01-01 00:00:00"), good),
        (2L, ts("2024-01-01 00:01:00"), good),      // exact dup in horizon
        (3L, ts("2024-01-01 00:02:00"), "!!! ???"), // quality gate
        (4L, ts("2024-01-01 00:03:00"), german))    // lang gate (de)
      query.processAllAvailable()
      assert(ids == Set(1L))
      // a much later doc advances the watermark past the dup state's
      // (event time + delay) horizon → the hash state is evicted
      mem.addData((5L, ts("2024-01-01 02:00:00"), other))
      query.processAllAvailable()
      // the same content re-appearing after eviction is re-admitted:
      // stream-side dedup is exact WITHIN the horizon by design (the
      // batch near-dup compaction downstream owns cross-horizon dups)
      mem.addData((6L, ts("2024-01-01 02:01:00"), good))
      query.processAllAvailable()
      assert(ids == Set(1L, 5L, 6L))
      // schema carries the annotations the manifest needs
      val r = s.sql("SELECT lang, quality, n_tokens FROM clean_ingest " +
        "WHERE doc_id = 1").collect()(0)
      assert(r.getString(0) == "en" && r.getDouble(1) >= 0.5 && r.getLong(2) > 100L)
    } finally query.stop()
  }

  test("streaming decontaminate drops exactly the batch operator's flag set") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val bench = Seq((100L, "forest of silver trees to find the hidden city"))
      .toDF("doc_id", "text")
    val benchShingles = graft.operators.Dedup
      .shingles(bench, "text", "doc_id", 24)
    val train = Seq(
      (1L, good),                               // clean
      (2L, other),                              // contains the bench 24-grams
      (3L, "short clean text with no overlap at all here")
    )
    // batch keep-set: everything decontaminate does NOT flag
    val batchDocs = train.toDF("doc_id", "text")
    val flagged = graft.operators.Dedup
      .decontaminate(batchDocs, bench, "text", "doc_id", 24)
      .collect().map(_.getLong(0)).toSet
    val batchKeep = train.map(_._1).toSet -- flagged

    val mem = MemoryStream[(Long, String)]
    val query = DocStream.decontaminate(
        mem.toDF().toDF("doc_id", "text"), benchShingles, "text", 24)
      .writeStream.format("memory").queryName("decon_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(train: _*)
      query.processAllAvailable()
      val streamKeep = s.sql("SELECT doc_id FROM decon_stream")
        .collect().map(_.getLong(0)).toSet
      assert(streamKeep == batchKeep)
      assert(flagged.contains(2L) && batchKeep.contains(1L))
    } finally query.stop()
  }
}
