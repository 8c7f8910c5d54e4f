package graft

import graft.ops.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Real-decoder legs of the Multimodal seams: perceptual aHash over
  * actual PNG/JPEG bytes via `javax.imageio`, and the delta-sign audio
  * fingerprint over actual WAV-PCM bytes via `javax.sound.sampled`.
  * Fixtures are synthesized in-memory (a gradient photo-like image, a
  * chirped tone) so the spec carries no binary files.
  */
class MultimodalDecodeSpec extends SparkSuite {

  private def hamming(a: String, b: String): Int =
    a.zip(b).count { case (x, y) => x != y }

  // --- image fixtures ------------------------------------------------

  /** A deterministic "photo": smooth two-axis gradient with a bright
    * blob — enough structure that aHash bits are content-driven.
    */
  private def gradientImage(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val blob = math.max(0,
        180 - 3 * (math.abs(x - w / 3) + math.abs(y - h / 4)))
      val r = math.min(255, x * 255 / w + blob)
      val g = math.min(255, y * 255 / h)
      val b = math.min(255, (x + y) * 128 / (w + h) + blob / 2)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  /** A structurally different image: inverted-axis gradient. */
  private def otherImage(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = 255 - ((x * y) % 251)
      img.setRGB(x, y, (v << 16) | ((255 - v) << 8) | (v / 2))
    }
    img
  }

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  private def imageHashes(payloads: Seq[(Long, Array[Byte])]): Map[Long, String] = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(payloads.map { case (i, p) => Row(i, p) }),
      schema)
    Multimodal.perceptualHash(df, "id", "payload", Multimodal.ImageIoDecoder)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        Option(r.getAs[String]("simhash")).orNull)
      .toMap
  }

  test("ImageIo aHash: JPEG re-encode lands within Hamming 8, unrelated image far away") {
    val base = gradientImage(160, 120)
    val png = encode(base, "png")
    // decode the PNG and re-encode lossily: the classic near-dup pair
    val jpeg = encode(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png)), "jpg")
    val other = encode(otherImage(160, 120), "png")
    assert(png.length > 100 && jpeg.length > 100 && other.length > 100)

    val h = imageHashes(Seq(1L -> png, 2L -> jpeg, 3L -> other))
    assert(h(1L) != null && h(1L).length == 64 && h(1L).exists(_ == '1'))
    val near = hamming(h(1L), h(2L))
    val far = hamming(h(1L), h(3L))
    assert(near <= 8, s"re-encode drifted $near bits (${h(1L)} vs ${h(2L)})")
    assert(far > 16, s"unrelated image too close: $far bits")
  }

  test("ImageIo aHash: resized copy stays near (the resample is the hash's whole point)") {
    val base = gradientImage(160, 120)
    val small = new java.awt.image.BufferedImage(
      80, 60, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    g.drawImage(base, 0, 0, 80, 60, null)
    g.dispose()
    val h = imageHashes(Seq(1L -> encode(base, "png"), 2L -> encode(small, "png")))
    assert(hamming(h(1L), h(2L)) <= 8)
  }

  test("ImageIo aHash: undecodable payload yields NULL simhash, null payload too") {
    val h = imageHashes(Seq(1L -> Array[Byte](1, 2, 3, 4), 2L -> null))
    assert(h(1L) == null && h(2L) == null)
  }

  // --- audio fixtures ------------------------------------------------

  /** 16-bit mono PCM WAV of a tone whose frequency chirps over time —
    * adjacent windows carry different energies, so the delta-sign bits
    * are content-driven. `gain` scales amplitude uniformly.
    */
  private def chirpWav(seconds: Double, f0: Double, f1: Double, gain: Double,
      wobbleHz: Double = 1.5): Array[Byte] = {
    import javax.sound.sampled._
    val rate = 8000f
    val n = (seconds * rate).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val t = i / rate.toDouble
      val f = f0 + (f1 - f0) * t / seconds
      // amplitude also wobbles so window energies differ beyond noise
      val amp = gain * (0.4 + 0.3 * math.sin(2 * math.Pi * wobbleHz * t))
      val s = (amp * 32767 * math.sin(2 * math.Pi * f * t)).toInt
        .max(-32768).min(32767)
      pcm(2 * i) = (s & 0xff).toByte // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def audioHashes(payloads: Seq[(Long, Array[Byte])]): Map[Long, String] = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(payloads.map { case (i, p) => Row(i, p) }),
      schema)
    Multimodal.audioFingerprint(df, "id", "payload",
        decoder = Multimodal.WavPcmDecoder)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        Option(r.getAs[String]("simhash")).orNull)
      .toMap
  }

  test("WavPcm fingerprint: half-amplitude copy has IDENTICAL bits, different tone does not") {
    val tone = chirpWav(2.0, 200, 900, gain = 0.9)
    val quiet = chirpWav(2.0, 200, 900, gain = 0.45)
    // the fingerprint keys on the energy ENVELOPE, so "different audio"
    // means a different envelope, not just different pitch
    val other = chirpWav(2.0, 900, 150, gain = 0.9, wobbleHz = 3.7)
    val h = audioHashes(Seq(1L -> tone, 2L -> quiet, 3L -> other))
    assert(h(1L) != null && h(1L).length == 64 && h(1L).exists(_ == '1')
      && h(1L).exists(_ == '0'))
    assert(h(1L) == h(2L),
      s"volume change flipped ${hamming(h(1L), h(2L))} bits")
    assert(hamming(h(1L), h(3L)) > 10, "different tone too close")
  }

  test("WavPcm fingerprint: undecodable payload yields NULL simhash") {
    val h = audioHashes(Seq(1L -> "not audio at all".getBytes, 2L -> null))
    assert(h(1L) == null && h(2L) == null)
  }

  // --- MJPEG demux -----------------------------------------------------

  private def framesOf(payloads: Seq[(Long, Array[Byte])], stride: Int) = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(payloads.map { case (i, p) => Row(i, p) }),
      schema)
    Multimodal.sampleFrames(df, "id", "payload", frameBytes = 0,
        stride = stride, demuxer = Multimodal.MjpegDemuxer)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("frame_idx"),
        r.getAs[Array[Byte]]("frame_bytes")))
      .sortBy(t => (t._1, t._2))
  }

  test("MJPEG demux: 3 concatenated JPEGs split into exact frames; aHash matches the originals") {
    val j1 = encode(gradientImage(64, 48), "jpg")
    val j2 = encode(otherImage(64, 48), "jpg")
    val j3 = encode(gradientImage(48, 64), "jpg")
    val mjpeg = j1 ++ j2 ++ j3
    val got = framesOf(Seq(7L -> mjpeg), stride = 1)
    assert(got.length == 3, s"expected 3 frames, got ${got.length}")
    assert(got.map(_._2).toSeq == Seq(0, 1, 2))
    // each demuxed frame is byte-identical to the JPEG that went in —
    // the frame boundary scan must neither trim nor bleed
    assert(got(0)._3.sameElements(j1) && got(1)._3.sameElements(j2) &&
      got(2)._3.sameElements(j3))
    // and therefore decodes to the SAME aHash as the standalone image,
    // through the same ImageIoDecoder seam the image leg uses
    val orig = imageHashes(Seq(1L -> j1, 2L -> j2, 3L -> j3))
    val fromFrames = imageHashes(
      got.zipWithIndex.map { case ((_, _, f), i) => (i + 1).toLong -> f })
    assert(fromFrames == orig)
    assert(hamming(orig(1L), orig(2L)) > 4,
      "fixture frames must be visually distinct")
  }

  test("MJPEG demux: stride keeps every stride-th frame; garbage and NULL payloads yield none") {
    val j1 = encode(gradientImage(64, 48), "jpg")
    val j2 = encode(otherImage(64, 48), "jpg")
    val j3 = encode(gradientImage(48, 64), "jpg")
    val mjpeg = j1 ++ j2 ++ j3
    val got = framesOf(Seq(7L -> mjpeg), stride = 2)
    assert(got.length == 2 && got.map(_._2).toSeq == Seq(0, 1))
    assert(got(0)._3.sameElements(j1) && got(1)._3.sameElements(j3))
    val none = framesOf(
      Seq(1L -> "no jpeg markers here".getBytes, 2L -> null), stride = 1)
    assert(none.isEmpty)
  }
}
