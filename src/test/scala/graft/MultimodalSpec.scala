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

  private def imageTable(ids: Long*) = Multimodal.syntheticImageTable(
    ids.map(Tuple1(_)).toDF("doc_id"), "doc_id")

  test("syntheticImageTable emits real PNGs that decode to exact pixels") {
    val row = imageTable(7L).collect().head
    val png = row.getAs[Array[Byte]](2)
    // PNG magic
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == Multimodal.imgW(7L) && img.getHeight == Multimodal.imgH(7L))
    val (ar, ag, ab) = Multimodal.bandA(7L)
    val (br, bg, bb) = Multimodal.bandB(7L)
    assert(img.getRGB(0, 0) == ((0xff << 24) | (ar << 16) | (ag << 8) | ab))
    assert(img.getRGB(img.getWidth - 1, img.getHeight - 1) ==
      ((0xff << 24) | (br << 16) | (bg << 8) | bb))
  }

  test("decodeImageFeatures pools real pixels to exact band statistics") {
    val id = 11L
    val out = Multimodal.decodeImageFeatures(imageTable(id)).collect().head
    assert(out.getInt(1) == Multimodal.imgW(id) && out.getInt(2) == Multimodal.imgH(id))
    val (ar, ag, ab) = Multimodal.bandA(id)
    val (br, bg, bb) = Multimodal.bandB(id)
    assert(out.getDouble(3) == (ar + br) / 2.0)
    assert(out.getDouble(4) == (ag + bg) / 2.0)
    assert(out.getDouble(5) == (ab + bb) / 2.0)
    val f = out.getSeq[Double](6)
    assert(f == Seq((ar + ag + ab) / 3.0, (ar + ag + ab) / 3.0,
      (br + bg + bb) / 3.0, (br + bg + bb) / 3.0))
  }

  test("resizeImages bilinear-resamples and re-encodes to ceil(dim*scale)") {
    val (w, h) = (Multimodal.imgW(25L), Multimodal.imgH(25L)) // 37 × 12
    val out = Multimodal.resizeImages(imageTable(25L), maxDim = 10)
      .collect().head
    val scale = 10.0 / math.max(w, h)
    val (nw, nh) = (math.ceil(w * scale).toInt, math.ceil(h * scale).toInt)
    assert(out.getInt(3) == nw && out.getInt(4) == nh)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]](2)))
    assert(img.getWidth == nw && img.getHeight == nh)
    // interior of the top band is far from the boundary: bilinear of a
    // solid region is the solid colour
    val (ar, ag, ab) = Multimodal.bandA(25L)
    assert(img.getRGB(0, 0) == ((0xff << 24) | (ar << 16) | (ag << 8) | ab))
  }

  test("resizeImages is a no-op below maxDim") {
    val before = imageTable(3L).collect().head
    val after = Multimodal.resizeImages(imageTable(3L), maxDim = 64)
      .collect().head
    assert(after.getInt(3) == before.getInt(3) && after.getInt(4) == before.getInt(4))
    assert(after.getAs[Array[Byte]](2).sameElements(before.getAs[Array[Byte]](2)))
  }

  test("perceptualHash: identical images hash identically, banding ≡ brute force") {
    val ids = (1L to 40L).toDF("doc_id")
    val media = Multimodal.gradientImageTable(ids, "doc_id")
    val hashed = Multimodal.perceptualHash(media)
    assert(hashed.count() == 40)
    // bytes are 8-bit packs
    val rows = hashed.collect()
    assert(rows.forall(r => (1 to 8).forall { i =>
      val b = r.getLong(i); b >= 0 && b <= 255
    }))
    // banded pairs must equal the brute-force hamming join at
    // maxHamming < nBands (pigeonhole)
    val banded = Multimodal.phashNearDup(media, maxHamming = 3, nBands = 4)
      .select("id_a", "id_b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ham = (0 until 8).map(g =>
      expr(s"bit_count(x.b$g ^ y.b$g)")).reduce(_ + _)
    val brute = hashed.as("x").join(hashed.as("y"),
        col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id"), col("y.media_id"), ham.cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._3 <= 3).toSet
    assert(banded == brute)
    assert(brute.nonEmpty) // the generator produces genuine near-dups
  }

  test("phashNearDup rep-collapse: duplicate-heavy corpus ≡ brute force") {
    // 12 distinct images, each replicated 5× under fresh ids — the
    // duplicate-group shape that made the pre-collapse banded join
    // quadratic. Output must still equal brute force exactly, with
    // intra-group pairs at hamming 0.
    val ids = (1L to 12L).toDF("doc_id")
    val base = Multimodal.gradientImageTable(ids, "doc_id")
    val dup = (0 until 5).map { i =>
      base.select((col("media_id") + lit(i * 1000L)).as("media_id"),
        col("media_type"), col("payload"), col("meta_width"), col("meta_height"))
    }.reduce(_ unionByName _)
    val banded = Multimodal.phashNearDup(dup, maxHamming = 3, nBands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashed = Multimodal.perceptualHash(dup)
    val ham = (0 until 8).map(g =>
      expr(s"bit_count(x.b$g ^ y.b$g)")).reduce(_ + _)
    val brute = hashed.as("x").join(hashed.as("y"),
        col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id"), col("y.media_id"), ham.cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._3 <= 3).toSet
    assert(banded == brute)
    // every replica pair of one source image is present at hamming 0
    assert((1L to 12L).forall(id =>
      banded.contains((id, id + 1000L, 0L))))
  }

  test("phashClusters ≡ clusters over the expanded member pairs") {
    // rep-level components + member inheritance must equal the
    // reference construction (components over ALL member pairs),
    // including clusters that exist only as exact-dup groups
    val ids = (1L to 15L).toDF("doc_id")
    val base = Multimodal.gradientImageTable(ids, "doc_id")
    val dup = (0 until 3).map { i =>
      base.select((col("media_id") + lit(i * 1000L)).as("media_id"),
        col("media_type"), col("payload"), col("meta_width"), col("meta_height"))
    }.reduce(_ unionByName _)
    val fast = Multimodal.phashClusters(dup, maxHamming = 3, nBands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ref = graft.operators.Dedup.clusters(
        Multimodal.phashNearDup(dup, maxHamming = 3, nBands = 4)
          .withColumnRenamed("hamming", "_h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == ref)
    assert(fast.nonEmpty)
  }

  test("resized solid-colour image stays solid under bilinear resampling") {
    // hand-built solid PNG → resize → every pixel must stay that colour
    val img = new java.awt.image.BufferedImage(30, 20,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (200 << 16) | (40 << 8) | 90
    (0 until 20).foreach(y => (0 until 30).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq((1L, "image/png", bos.toByteArray, 30, 20))
      .toDF("media_id", "media_type", "payload", "meta_width", "meta_height")
    val out = Multimodal.resizeImages(media, maxDim = 7).collect().head
    val small = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]](2)))
    assert(small.getWidth == 7 && small.getHeight == 5)
    (0 until small.getHeight).foreach { y =>
      (0 until small.getWidth).foreach { x =>
        assert(small.getRGB(x, y) == ((0xff << 24) | rgb))
      }
    }
  }
}
