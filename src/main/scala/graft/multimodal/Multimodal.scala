package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata; decode/feature-
  * extract runs partition-parallel over the binary batches.
  *
  * Two decode paths coexist:
  *   - a REAL image path ([[syntheticImageTable]] →
  *     [[decodeImageFeatures]] / [[resizeImages]]) built on
  *     `javax.imageio` — PNG encode, decode, grid-pooled pixel
  *     features and bilinear resampling are all actual pixel work,
  *     no external codec needed;
  *   - a codec-free byte featurizer ([[extractFeatures]]) kept for
  *     payloads whose codec is NOT on the JVM (video/audio): it
  *     derives statistics from raw bytes, standing where a JNI codec
  *     call would go with an identical plan shape.
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

  // ===== real image path (javax.imageio, pure JVM) =====

  /** Deterministic synthetic image parameters — plain modular
    * arithmetic on the id so a SQL oracle can predict every decoded
    * value. The image is two horizontal bands: rows [0, H/2) are
    * solid colour A, rows [H/2, H) solid colour B (H is always even),
    * so pooled means are exact rationals.
    */
  private[graft] def imgW(id: Long): Int = (Math.floorMod(id, 37L) + 12L).toInt
  private[graft] def imgH(id: Long): Int = (2L * (Math.floorMod(id, 12L) + 5L)).toInt
  private[graft] def bandA(id: Long): (Int, Int, Int) =
    (Math.floorMod(id * 5L, 256L).toInt, Math.floorMod(id * 7L, 256L).toInt,
      Math.floorMod(id * 11L, 256L).toInt)
  private[graft] def bandB(id: Long): (Int, Int, Int) =
    (Math.floorMod(id * 13L, 256L).toInt, Math.floorMod(id * 17L, 256L).toInt,
      Math.floorMod(id * 19L, 256L).toInt)

  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def decodePng(payload: Array[Byte],
      mediaId: Long): java.awt.image.BufferedImage = {
    // ImageIO.read signals "no decoder for these bytes" with null,
    // not an exception — surface WHICH row was undecodable instead
    // of letting a bare NPE kill the stage anonymously
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    if (img == null) throw new IllegalArgumentException(
      s"media_id=$mediaId: payload is not a decodable image")
    img
  }

  /** A media table whose payloads are REAL PNG bytes (encoded on the
    * executors, partition-parallel — payload bytes never visit the
    * driver): one two-band synthetic image per input row, its
    * dimensions and band colours deterministic functions of the id.
    * PNG is lossless, so every downstream decode recovers the exact
    * generated pixels — which is what lets a SQL oracle verify a
    * genuine imageio encode→decode round trip.
    */
  def syntheticImageTable(df: DataFrame, idCol: String): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast("long").as("media_id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (w, h) = (imgW(id), imgH(id))
        val (ar, ag, ab) = bandA(id)
        val (br, bg, bb) = bandB(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val top = (ar << 16) | (ag << 8) | ab
        val bot = (br << 16) | (bg << 8) | bb
        var y = 0
        while (y < h) {
          val rgb = if (y < h / 2) top else bot
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        Row(id, "image/png", encodePng(img), w, h)
      }
    }(encoder).toDF()
  }

  /** REAL image decode + featurize: `javax.imageio` parses each PNG
    * payload, and features are grid-pooled pixel statistics —
    * `gridRows`×`gridCols` mean luminances plus whole-image per-
    * channel means, every value accumulated as exact integer sums
    * before one final division (cross-engine float-safe). Width and
    * height come from the DECODED image, not the metadata columns, so
    * a mismatch fails the oracle. Partition-parallel narrow map: the
    * multimodal hot loop at 100 TB, payloads never hit the driver.
    */
  def decodeImageFeatures(media: DataFrame, gridRows: Int = 2,
      gridCols: Int = 2): DataFrame = {
    require(gridRows > 0 && gridCols > 0, "grid dims must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_r", DoubleType, nullable = false),
      StructField("mean_g", DoubleType, nullable = false),
      StructField("mean_b", DoubleType, nullable = false),
      StructField("features", ArrayType(DoubleType), nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val img = decodePng(r.getAs[Array[Byte]](1), id)
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        // per-cell integer sum of (r+g+b) and pixel count
        val cellSum = new Array[Long](gridRows * gridCols)
        val cellN = new Array[Long](gridRows * gridCols)
        var y = 0
        while (y < h) {
          val gy = math.min(y * gridRows / h, gridRows - 1)
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val (pr, pg, pb) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
            sr += pr; sg += pg; sb += pb
            val c = gy * gridCols + math.min(x * gridCols / w, gridCols - 1)
            cellSum(c) += pr + pg + pb
            cellN(c) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Row(id, w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n,
          cellSum.indices.map(i =>
            cellSum(i).toDouble / (3.0 * cellN(i))).toSeq)
      }
    }(encoder).toDF()
  }

  /** Gradient-image parameters for the perceptual-hash path: gray
    * pixel g(x,y) = (x·a + y·b + base) mod 256 with a/b/base plain
    * modular functions of the id — images sharing (a, b) differ only
    * by the constant `base` offset, which shifts every cell mean and
    * the global mean equally, so their aHash is IDENTICAL: the
    * near-dup structure is deterministic and a SQL oracle can replay
    * every pixel. (The two-band [[syntheticImageTable]] is degenerate
    * under aHash — every cell ties with the mean — hence a second
    * generator with real spatial structure.)
    */
  private[graft] def gradA(id: Long): Int = (2L + Math.floorMod(id, 5L)).toInt
  private[graft] def gradB(id: Long): Int = (3L + Math.floorMod(id, 7L)).toInt
  private[graft] def gradBase(id: Long): Int = Math.floorMod(id, 256L).toInt

  /** A media table of REAL grayscale gradient PNGs (encoded on
    * executors) for the perceptual-hash operators. */
  def gradientImageTable(df: DataFrame, idCol: String): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(mediaSchema)
    df.select(col(idCol).cast("long").as("media_id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (w, h) = (imgW(id), imgH(id))
        val (a, b, base) = (gradA(id), gradB(id), gradBase(id))
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = Math.floorMod(x * a + y * b + base, 256)
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        Row(id, "image/png", encodePng(img), w, h)
      }
    }(encoder).toDF()
  }

  /** REAL perceptual hash (aHash): decode the PNG, pool luminance
    * into an 8×8 grid with exact integer sums, set bit (gy,gx) iff
    * the cell's mean luminance exceeds the whole-image mean — the
    * comparison done as an integer cross-multiplication
    * (cellSum·N > totalSum·cellN), so there is no floating point
    * anywhere and a SQL oracle can replay the hash bit for bit. The
    * 64 bits are emitted as 8 row-bytes `b0..b7` (b_g = Σ bit·2^gx):
    * byte-wise XOR+popcount gives hamming distance without signed-
    * 64-bit edge cases in either engine. Partition-parallel narrow
    * map; payloads never visit the driver.
    */
  def perceptualHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(
      StructField("media_id", LongType, nullable = false) +:
        (0 until 8).map(g => StructField(s"b$g", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val img = decodePng(r.getAs[Array[Byte]](1), id)
        val (w, h) = (img.getWidth, img.getHeight)
        val cellSum = new Array[Long](64)
        val cellN = new Array[Long](64)
        var total = 0L
        var y = 0
        while (y < h) {
          val gy = math.min(y * 8 / h, 7)
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            val c = gy * 8 + math.min(x * 8 / w, 7)
            cellSum(c) += lum
            cellN(c) += 1
            total += lum
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val bytes = (0 until 8).map { g =>
          var acc = 0L
          var gx = 0
          while (gx < 8) {
            val c = g * 8 + gx
            if (cellSum(c) * n > total * cellN(c)) acc |= (1L << gx)
            gx += 1
          }
          acc
        }
        Row.fromSeq(id +: bytes)
      }
    }(encoder).toDF()
  }

  /** Image near-duplicate pairs by perceptual-hash hamming distance —
    * the multimodal dedup a training-data pipeline runs on decoded
    * frames. Banded exactly like SimHash: the 8 hash bytes split
    * into `nBands` equal groups and candidates must agree on at
    * least one whole band — the pigeonhole guarantee is exact for
    * `maxHamming < nBands` — then candidates are verified with the
    * full byte-wise XOR popcount.
    *
    * Exact-duplicate collapse (same design as the minhash path):
    * images with IDENTICAL 64-bit hashes — the most duplicated
    * content in a real corpus — band via a single representative;
    * member pairs are expanded afterwards (intra-group at hamming
    * 0, cross-group inheriting the representative pair's hamming,
    * which is exact since hamming depends only on the hash).
    * Without the collapse the banded self-join is quadratic in the
    * largest duplicate group: measured 22.5M pairs / 31 s at 50k
    * synthetic images, where representative pairs are near-linear.
    * The band join keys on (band, band-value) over DISTINCT hashes:
    * corpus-cardinality, bounded fan-out; never an all-pairs
    * product. Expansion joins key on representative id — fan-out
    * equals the output's own size.
    */
  def phashNearDup(media: DataFrame, maxHamming: Int = 3,
      nBands: Int = 4): DataFrame = {
    val (repPairs, memberOf) = phashRepPairs(media, maxHamming, nBands)
    graft.operators.Dedup.expandPairs(repPairs, memberOf,
      Seq("hamming"), Seq(lit(0L)))
  }

  /** Representative-level phash near-dup pairs + the member map.
    * See [[phashNearDup]] for the collapse rationale. */
  private def phashRepPairs(media: DataFrame, maxHamming: Int,
      nBands: Int): (DataFrame, DataFrame) = {
    require(8 % nBands == 0, s"nBands ($nBands) must divide 8")
    require(maxHamming < nBands,
      s"pigeonhole guarantee needs maxHamming ($maxHamming) < nBands ($nBands)")
    val perBand = 8 / nBands
    // both the rep collapse and the member map consume the hashes;
    // without cutting lineage the image decode (the expensive part)
    // runs once per consumer. EAGER for the same AQE-race reason as
    // Dedup.ngramJaccard's candidate checkpoint.
    val hashed = perceptualHash(media).localCheckpoint()
    val hashCols = (0 until 8).map(g => col(s"b$g"))
    val hashNames = (0 until 8).map(g => s"b$g")
    val reps = hashed.groupBy(hashCols: _*)
      .agg(min(col("media_id")).as("media_id"))
    val memberOf = reps.select(col("media_id").as("_rid") +: hashCols: _*)
      .join(hashed.select(col("media_id").as("_mid") +: hashCols: _*),
        hashNames)
      .select(col("_rid"), col("_mid"))
    val bandCol = explode(array((0 until nBands).map { bd =>
      struct(lit(bd).as("band"),
        concat_ws(":", (0 until perBand).map(i =>
          col(s"b${bd * perBand + i}")): _*).as("bval"))
    }: _*)).as("bb")
    val banded = reps.select((col("media_id") +: hashCols :+ bandCol): _*)
      .select((col("media_id") +: hashCols :+
        col("bb.band").as("band") :+ col("bb.bval").as("bval")): _*)
    val ham = (0 until 8).map(g =>
      expr(s"bit_count(x.b$g ^ y.b$g)")).reduce(_ + _)
    val repPairs = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("rid_a"), col("y.media_id").as("rid_b"),
        ham.cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("rid_a", "rid_b")
    (repPairs, memberOf)
  }

  /** Image near-dup CLUSTERS — the scale-correct output contract for
    * duplicate-heavy image corpora, mirroring [[graft.operators.Dedup.clusters]]:
    * M rows per M-member cluster, never the M²/2 pair expansion
    * (measured: 22.5M member pairs at 50k synthetic images where the
    * cluster map is 50k rows). Connected components run over
    * REPRESENTATIVE pairs (distinct hashes); members then inherit
    * their representative's component, and an exact-duplicate group
    * is a cluster even when its hash has no near-neighbor. Cluster
    * id = min member id of the component, the same contract as
    * `dd_clusters`. All joins key on representative/cluster id —
    * cardinality bounded by the corpus, never the pair space.
    */
  def phashClusters(media: DataFrame, maxHamming: Int = 3,
      nBands: Int = 4): DataFrame = {
    val (repPairs, memberOf) = phashRepPairs(media, maxHamming, nBands)
    val cc = graft.operators.Dedup.clusters(
      repPairs.select(col("rid_a").as("id_a"), col("rid_b").as("id_b")))
      .select(col("doc_id").as("_rid"), col("cluster_id").as("_comp"))
    // reps with no near-neighbor edge: their exact-dup group is a
    // component of its own iff it has ≥ 2 members
    val groupSizes = memberOf.groupBy(col("_rid"))
      .agg(count(lit(1)).as("_gsz"))
    val repComp = memberOf.select(col("_rid")).distinct()
      .join(cc, Seq("_rid"), "left")
      .join(groupSizes, Seq("_rid"))
      .filter(col("_comp").isNotNull || col("_gsz") >= 2)
      .select(col("_rid"), coalesce(col("_comp"), col("_rid")).as("_comp"))
    val members = memberOf.join(repComp, Seq("_rid"))
      .select(col("_mid"), col("_comp"))
    val minMember = members.groupBy(col("_comp"))
      .agg(min(col("_mid")).as("cluster_id"))
    members.join(minMember, Seq("_comp"))
      .select(col("_mid").as("media_id"), col("cluster_id"))
  }

  /** REAL resize: decode the PNG, bilinear-resample so the longest
    * edge fits `maxDim` (no-op when it already does), re-encode.
    * Target dimensions are `ceil(dim * scale)` — the same arithmetic
    * a SQL oracle replays — while the pixel resampling is genuine
    * `Graphics2D` bilinear interpolation. Output schema = input
    * schema; metadata reflects the RESIZED image.
    */
  def resizeImages(media: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim > 0, "maxDim must be positive")
    val encoder = org.apache.spark.sql.Encoders.row(mediaSchema)
    media.select("media_id", "media_type", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val src = decodePng(r.getAs[Array[Byte]](2), id)
        val (w, h) = (src.getWidth, src.getHeight)
        if (math.max(w, h) <= maxDim)
          Row(id, r.getString(1), r.getAs[Array[Byte]](2), w, h)
        else {
          val scale = maxDim.toDouble / math.max(w, h)
          val nw = math.ceil(w * scale).toInt.max(1)
          val nh = math.ceil(h * scale).toInt.max(1)
          val dst = new java.awt.image.BufferedImage(
            nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, nw, nh, null)
          g.dispose()
          Row(id, r.getString(1), encodePng(dst), nw, nh)
        }
      }
    }(encoder).toDF()
  }

  /** Codec-free byte featurizer for payload types whose codec is NOT
    * on the JVM (video/audio): "features" are byte-derived
    * statistics standing where the JNI codec call would go; the plan
    * shape (partition-parallel batch decode) is identical.
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

  /** Codec-free resize stand-in for non-image payloads: scales the
    * typed metadata exactly as a real resizer would and decimates the
    * payload proportionally (byte truncation in place of pixel
    * resampling). For images, [[resizeImages]] is the REAL path.
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
