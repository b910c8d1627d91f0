package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata; decode/feature-
  * extract runs partition-parallel over the binary batches.
  *
  * The decode itself is STUBBED (no codec libraries in this
  * environment): `fakeDecode` derives deterministic pseudo-features
  * from the payload bytes. Everything around it — the schema, the
  * mapPartitions batching, the partition sizing — is the real
  * production shape: swap `fakeDecode` for a JNI/codec call and the
  * plan is unchanged.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta_width", IntegerType, nullable = true),
    StructField("meta_height", IntegerType, nullable = true)))

  /** Wrap any table with a text column as a fake media table: the
    * payload is the UTF-8 bytes. Lets the whole pipeline run against
    * the synthetic `documents` table.
    */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image/fake").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"),
      (pmod(xxhash64(col(idCol)), lit(1024)) + 1).cast("int").as("meta_width"),
      (pmod(xxhash64(col(idCol), lit(1)), lit(1024)) + 1).cast("int").as("meta_height"))

  /** ===== STUB ===== deterministic stand-in for a real decoder:
    * "features" are byte-derived statistics. Real impl would decode
    * the image and pool pixels; signature and batch shape identical.
    */
  private def fakeDecode(payload: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var i = 0
    while (i < payload.length) {
      out(i % dims) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Frame sampling: slice each payload into fixed-size frames and
    * keep every `everyNth` one — the video-frame-extraction shape.
    * Pure Catalyst (sequence + substring on binary), so it fuses
    * into the scan; at 100 TB the frame explosion is a narrow map,
    * no shuffle. Real decoders replace the byte-slicing with codec
    * frame boundaries; the plumbing (explode, batching, schema) is
    * identical.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int,
      everyNth: Int = 1): DataFrame = {
    require(frameBytes > 0 && everyNth > 0, "frameBytes/everyNth must be positive")
    media
      // an empty payload has zero frames, not one empty frame
      .filter(length(col("payload")) > 0)
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0),
          greatest(ceil(length(col("payload")) / lit(frameBytes.toDouble))
            .cast("long") - 1L, lit(0L)))).as("frame_idx"))
      .filter(pmod(col("frame_idx"), lit(everyNth.toLong)) === 0)
      .select(col("media_id"), col("frame_idx"),
        expr(s"substring(payload, cast(frame_idx * $frameBytes + 1 as int), $frameBytes)")
          .as("frame"))
  }

  /** ===== STUB ===== resize: scales the typed metadata exactly as a
    * real resizer would and decimates the payload proportionally
    * (byte truncation stands in for pixel resampling — no codec in
    * this environment). Schema and plan shape are production-real.
    */
  def resizeStub(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim.toDouble) / greatest(col("meta_width"), col("meta_height")))
    media.select(
      col("media_id"), col("media_type"),
      expr("substring(payload, 1, cast(ceil(length(payload) * " +
        s"least(1.0, $maxDim / greatest(meta_width, meta_height))) as int))")
        .as("payload"),
      ceil(col("meta_width") * scale).cast("int").as("meta_width"),
      ceil(col("meta_height") * scale).cast("int").as("meta_height"))
  }

  /** Partition-parallel "decode + featurize": the multimodal hot
    * loop. Binary payloads never hit the driver; each task processes
    * its partition's batch exactly as a codec UDF would.
    */
  def extractFeatures(media: DataFrame, dims: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("byte_len", IntegerType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val ds: Dataset[Row] = media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        Row(id, payload.length, fakeDecode(payload, dims).toSeq)
      }
    }(encoder)
    ds.toDF()
  }
}
