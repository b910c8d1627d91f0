package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMediaTable(
    Seq((1L, "abcdefghij"), (2L, "xy")).toDF("doc_id", "text"),
    "doc_id", "text")

  test("asMediaTable produces binary payloads with typed metadata") {
    val rows = media.orderBy("media_id").collect()
    assert(new String(rows(0).getAs[Array[Byte]](2), "UTF-8") == "abcdefghij")
    assert(rows(0).getInt(3) >= 1 && rows(0).getInt(3) <= 1024)
  }

  test("extractFeatures runs partition-parallel and keeps row count") {
    val out = Multimodal.extractFeatures(media, dims = 4)
    val rows = out.orderBy("media_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(1) == 10) // byte_len of "abcdefghij"
    assert(rows(0).getSeq[Float](2).length == 4)
  }

  test("sampleFrames slices payloads into fixed-size frames") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 4)
      .orderBy("media_id", "frame_idx").collect()
    // 10 bytes / 4 = 3 frames for doc 1; 2 bytes -> 1 frame for doc 2
    assert(frames.count(_.getLong(0) == 1L) == 3)
    assert(frames.count(_.getLong(0) == 2L) == 1)
    assert(new String(frames(0).getAs[Array[Byte]](2), "UTF-8") == "abcd")
    assert(new String(frames(2).getAs[Array[Byte]](2), "UTF-8") == "ij")
  }

  test("sampleFrames everyNth keeps only sampled frames") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 2, everyNth = 2)
      .filter(col("media_id") === 1L).collect()
    assert(frames.map(_.getLong(1)).toSet == Set(0L, 2L, 4L)) // 5 frames -> 3
  }

  test("resizeStub scales metadata and truncates payload proportionally") {
    val tiny = Multimodal.resizeStub(media, maxDim = 1)
      .orderBy("media_id").collect()
    assert(tiny.forall(r => r.getInt(3) <= 1 && r.getInt(4) <= 1))
    assert(tiny.forall(r => r.getAs[Array[Byte]](2).length >= 1))
  }
}
