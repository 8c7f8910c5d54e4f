package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns carried next to a typed
  * metadata struct; decode / feature-extraction steps run as partition-wise
  * batch functions (the Scala analogue of `mapInPandas`) so a real codec
  * library can be dropped in per-executor without changing the plan shape.
  *
  * Decoding runs behind explicit seams. [[perceptualHash]] and
  * [[audioFingerprint]] each take a decoder parameter: the default is a
  * deterministic md5 stub (pure column expressions — what the DuckDB
  * oracle gate can replay), and [[ImageIoDecoder]] / [[WavPcmDecoder]]
  * are REAL decoders built on the JDK's own codecs (`javax.imageio`,
  * `javax.sound.sampled`) running partition-wise with the same
  * downstream hash math — MultimodalDecodeSpec proves the perceptual
  * properties (re-encode tolerance, volume invariance) on real
  * PNG/JPEG/WAV fixtures. [[extractFeatures]]'s embedding model and
  * [[sampleFrames]]'s video demuxer remain deterministic fakes (no
  * model runtime or video codec ships with the JDK); their Spark-side
  * schema, batching, partitioning, and output shape are real and
  * tested.
  *
  * Scale notes: payloads never pass through a shuffle unless the caller
  * repartitions; metadata-only predicates prune before any decode;
  * `spark.sql.files.maxPartitionBytes` governs scan granularity for large
  * binary files as usual.
  */
object Multimodal {

  /** Decode seam for [[perceptualHash]]: where the 64 pixel intensities
    * come from. The HASH math (integer aHash thresholding) is identical
    * for every decoder; only the pixel source changes, so callers can
    * flip a stub-developed pipeline to real decoding without touching
    * anything downstream.
    */
  sealed trait ImageDecoder
  /** Deterministic md5-derived "pixels" — the oracle default. Pure column
    * expressions (whole-stage codegen), reproducible by any engine with
    * md5, which is what the DuckDB correctness gate needs. Produces
    * hash-shaped values, NOT image content: use [[ImageIoDecoder]] for
    * real images.
    */
  case object Md5StubImage extends ImageDecoder
  /** Real decode via `javax.imageio` (PNG/JPEG/BMP/GIF ship with the
    * JDK — no external codec needed): decode, bilinear-resample to 8x8,
    * integer BT.601 luma per pixel. Runs partition-wise (decoders are
    * not expressible as Catalyst columns); payloads that ImageIO cannot
    * parse yield a NULL simhash. Not oracle-replayable (DuckDB has no
    * image codec), hence not the default.
    */
  case object ImageIoDecoder extends ImageDecoder

  /** Decode seam for [[audioFingerprint]]: where the 65 window energies
    * come from. The DELTA-SIGN derivation downstream is identical for
    * every decoder.
    */
  sealed trait AudioDecoder
  /** Deterministic md5-derived window "energies" — the oracle default,
    * pure column expressions. See [[Md5StubImage]] for the rationale.
    */
  case object Md5StubAudio extends AudioDecoder
  /** Real decode via `javax.sound.sampled` (WAV/PCM and AU/AIFF ship
    * with the JDK): the signed-PCM samples of the FIRST channel are
    * split into 65 equal windows spanning the whole track, and each
    * window's energy is its sum of squared samples. Uniform amplitude
    * scaling multiplies every energy by the same factor, so the
    * delta-sign bits are volume-invariant — the property Chromaprint
    * and Shazam-family fingerprints rely on. Undecodable payloads yield
    * a NULL simhash. Partition-wise; not oracle-replayable, hence not
    * the default.
    */
  case object WavPcmDecoder extends AudioDecoder

  /** Demux seam for [[sampleFrames]]: how a video payload becomes a
    * sequence of frame byte-strings. Downstream (fingerprint, overlap
    * pairs) is identical for every demuxer.
    */
  sealed trait FrameDemuxer
  /** Every `stride`-th fixed-size chunk — the oracle default (pure
    * column expressions, replayable by any engine with substr). See
    * [[Md5StubImage]] for the rationale.
    */
  case object FixedChunkDemuxer extends FrameDemuxer
  /** Real motion-JPEG demux: frames are the `FFD8 … FFD9` (SOI…EOI)
    * spans of the payload — the actual on-wire format of MJPEG streams
    * (and of IP-camera multipart feeds with the HTTP framing stripped).
    * Each extracted frame is a complete JPEG, so the SAME
    * [[ImageIoDecoder]] path fingerprints it downstream. Scan caveat
    * (documented, standard for MJPEG tooling): a frame carrying an
    * embedded JPEG thumbnail would split at the inner EOI; camera MJPEG
    * frames do not embed thumbnails. `frameBytes` is ignored (frame
    * size is intrinsic); `stride` keeps every stride-th frame.
    * Partition-wise; not oracle-replayable, hence not the default. The
    * JDK ships no demuxer for generic containers (MP4/MKV) — those
    * still need the fixed-chunk stub or an external library.
    */
  case object MjpegDemuxer extends FrameDemuxer

  /** Metadata struct carried with every media payload. */
  val MetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Wrap a binary payload column with derived metadata. Width/height come
    * from the (stubbed) header sniff: two bytes of the payload's md5 —
    * deterministic, so tests and oracles can reproduce them.
    */
  def withMeta(df: DataFrame, binCol: String, mime: String): DataFrame = {
    val b = col(binCol)
    val hx: Int => Column = off =>
      (conv(substring(md5(b), off, 2), 16, 10).cast("int") % 240 + 16)
    df.withColumn("meta", struct(
      lit(mime).as("mime"),
      octet_length(b).cast("long").as("n_bytes"),
      hx(1).as("width"),
      hx(3).as("height")))
  }

  /** Deterministic fake image-embedding from raw bytes: feature `i` is
    * derived from the first 6 hex digits of md5(payload ++ "-i"), quantized
    * to the grid k/10000 with k ∈ [-10000, 10000] so every feature is
    * engine-reproducible (the md5 recipe is plain SQL for the oracle, and
    * the quantized value round-trips float→double→round(4) exactly).
    * Replace with a real model runtime.
    */
  private def fakeEmbed(payload: Array[Byte], dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { i =>
      md.reset()
      md.update(payload)
      md.update(s"-$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = md.digest().take(3).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      ((h % 20001L) - 10000L).toFloat / 10000.0f
    }.toArray
  }

  /** Partition-wise media feature extraction (the `mapInPandas` analogue):
    * for each row, decode the payload and emit a feature vector. Runs one
    * partition per task with an iterator — constant memory, no per-row JVM
    * call overhead beyond the codec itself.
    */
  def extractFeatures(
      df: DataFrame,
      idCol: String,
      binCol: String,
      dim: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("features", ArrayType(FloatType))))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](binIdx)
        Row(r.get(idIdx), if (payload == null) null else fakeEmbed(payload, dim).toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** Perceptual hash (aHash-style) for image payloads: "decode" the
    * payload to an 8×8 grayscale grid, threshold each pixel against the
    * grid mean, and emit the 64 bits as a `simhash`-format bit string —
    * directly consumable by [[graft.ops.Dedup.simhashPairs]] /
    * [[graft.ops.Dedup.simhashPairsMultiPass]] for prefix-blocked Hamming
    * near-dup pairs over IMAGES (re-encoded/resized copies land within a
    * few bits of each other under a real decoder).
    *
    * The pixel source is the [[ImageDecoder]] seam. Default
    * [[Md5StubImage]]: pixel k is a byte of md5(payload ++ "-p{k/16}") —
    * four md5s per image, hex pairs as 0..255 intensities, pure codegen
    * column expressions, oracle-reproducible. [[ImageIoDecoder]] decodes
    * real PNG/JPEG/BMP/GIF via the JDK's `javax.imageio` and
    * bilinear-resamples to the same 8×8 grid (MultimodalDecodeSpec: a
    * PNG and its JPEG re-encode land within Hamming 8; an unrelated
    * image lands far away). The THRESHOLDING is the real aHash math for
    * both and is exact-integer (`pixel·64 > sum` instead of a float
    * mean). The Hamming pair stage downstream inherits SimHash's scale
    * guards (prefix blocking, rotation recall) either way.
    */
  def perceptualHash(
      df: DataFrame,
      idCol: String,
      binCol: String,
      decoder: ImageDecoder = Md5StubImage): DataFrame = decoder match {
    case Md5StubImage =>
      val b = col(binCol)
      // array HOFs keep the expression tree (and its generated code) small:
      // 4 md5s -> 64-pixel array -> integer sum -> thresholded bit string
      val hhs = array((0 until 4).map(g => md5(concat(b, encode(lit(s"-p$g"), "UTF-8")))): _*)
      val px = flatten(transform(hhs, h =>
        transform(sequence(lit(0), lit(15)),
          i => conv(h.substr(i * 2 + 1, lit(2)), 16, 10).cast("long"))))
      df.select(col(idCol).as("id"), px.as("__px"))
        .withColumn("__sum", aggregate(col("__px"), lit(0L), (acc, x) => acc + x))
        .select(col("id"),
          array_join(transform(col("__px"),
            p => when(p * 64 > col("__sum"), lit("1")).otherwise(lit("0"))), "").as("simhash"))
    case ImageIoDecoder =>
      val outSchema = StructType(Seq(
        StructField("id", df.schema(idCol).dataType),
        StructField("simhash", StringType)))
      val idIdx = df.schema.fieldIndex(idCol)
      val binIdx = df.schema.fieldIndex(binCol)
      df.mapPartitions { it =>
        it.map { r =>
          val payload =
            if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
          Row(r.get(idIdx),
            if (payload == null) null
            else decodeToGrid8(payload).map(aHashBits).orNull)
        }
      }(Encoders.row(outSchema))
  }

  /** `javax.imageio` decode + bilinear 8×8 resample + integer BT.601
    * luma (`(299·R + 587·G + 114·B) / 1000`). None when the payload is
    * not a decodable image.
    */
  private def decodeToGrid8(payload: Array[Byte]): Option[Array[Long]] = {
    import java.awt.RenderingHints
    import java.awt.image.BufferedImage
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val small = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
        val g = small.createGraphics()
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, 8, 8, null)
        g.dispose()
        Some(Array.tabulate(64) { k =>
          val rgb = small.getRGB(k % 8, k / 8)
          val (rr, gg, bb) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
          (299L * rr + 587L * gg + 114L * bb) / 1000L
        })
      }
    } catch {
      // NonFatal, not just IOException: ImageIO plugin readers throw
      // RuntimeExceptions on adversarial payloads (CMMException for
      // broken ICC profiles, IndexOutOfBounds/IllegalArgument from
      // format decoders) — one crawl image must yield the documented
      // NULL simhash, not kill the task (decodePcmEnergies' contract)
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** The shared exact-integer aHash threshold: bit k = 1 iff
    * `pixel(k)·64 > Σ pixels` — same math the stub path runs as column
    * expressions.
    */
  private def aHashBits(px: Array[Long]): String = {
    val sum = px.sum
    val sb = new java.lang.StringBuilder(64)
    px.foreach(p => sb.append(if (p * 64 > sum) '1' else '0'))
    sb.toString
  }

  /** Video near-dup pairs from shared frame fingerprints: sample frames
    * ([[sampleFrames]] — a real demuxer plugs into the same seam),
    * fingerprint each (md5 here; [[perceptualHash]] per frame for
    * re-encode tolerance under a real decoder), and pair videos sharing
    * at least `minShared` distinct fingerprints. Catches re-uploads,
    * clips (a prefix shares all its frames with the original), and
    * compilations — the multimodal analogue of n-gram containment.
    * Output per unordered pair: shared count plus both containment
    * directions (`shared/n_frames` per side, 4 dp).
    *
    * 100 TB shape: the same inverted-index discipline as the text
    * dedups — videos pair only through a shared fingerprint, a
    * `maxDf` broadcast anti-join drops degenerate fingerprints (black
    * frames, station idents) before any pair forms, and the self-join is
    * fingerprint-local. Frame payloads are dropped before the shuffle:
    * only (id, 32-hex hash) rows move.
    */
  def frameOverlapPairs(
      df: DataFrame,
      idCol: String,
      binCol: String,
      frameBytes: Int,
      stride: Int,
      minShared: Long = 1L,
      maxDf: Long = 10000L): DataFrame = {
    val fr = sampleFrames(df, idCol, binCol, frameBytes, stride)
      .select(col("id"), md5(col("frame_bytes")).as("fh"))
      .distinct()
      .localCheckpoint(true)
    val hot = fr.groupBy(col("fh")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxDf).select(col("fh"))
    val kept = fr.join(broadcast(hot), Seq("fh"), "left_anti")
    val sizes = kept.groupBy(col("id")).agg(count(lit(1)).as("nf"))
    kept.as("a")
      .join(kept.as("b"), col("a.fh") === col("b.fh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .join(sizes.select(col("id").as("id_a"), col("nf").as("nf_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("nf").as("nf_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("shared"),
        col("nf_a"), col("nf_b"),
        round(col("shared").cast("double") / col("nf_a"), 4).as("overlap_a"),
        round(col("shared").cast("double") / col("nf_b"), 4).as("overlap_b"))
  }

  /** Frame sampling for "video" payloads: emit every `stride`-th frame
    * as (id, frame_idx, frame_bytes), where frame_idx counts the EMITTED
    * frames. The frame source is the [[FrameDemuxer]] seam: default
    * [[FixedChunkDemuxer]] cuts fixed-size chunks (pure column
    * expressions — whole-stage codegen, oracle-replayable);
    * [[MjpegDemuxer]] is a REAL demuxer for motion-JPEG payloads
    * (SOI/EOI boundary scan, each frame a complete JPEG —
    * MultimodalDecodeSpec drives a 3-frame fixture through it and
    * [[perceptualHash]]'s real decoder).
    */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      binCol: String,
      frameBytes: Int,
      stride: Int,
      demuxer: FrameDemuxer = FixedChunkDemuxer): DataFrame = demuxer match {
    case FixedChunkDemuxer =>
      val b = col(binCol)
      val nFrames = floor(octet_length(b) / frameBytes).cast("int")
      df.select(
          col(idCol).as("id"),
          posexplode(transform(
            sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)),
            i => b.substr((i * frameBytes + 1).cast("int"), lit(frameBytes)))))
        .withColumnRenamed("pos", "frame_idx")
        .withColumnRenamed("col", "frame_bytes")
    case MjpegDemuxer =>
      require(stride >= 1, s"stride $stride must be >= 1")
      val outSchema = StructType(Seq(
        StructField("id", df.schema(idCol).dataType),
        StructField("frame_idx", IntegerType, nullable = false),
        StructField("frame_bytes", BinaryType)))
      val idIdx = df.schema.fieldIndex(idCol)
      val binIdx = df.schema.fieldIndex(binCol)
      df.mapPartitions { it =>
        it.flatMap { r =>
          val payload =
            if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
          if (payload == null) Iterator.empty
          else {
            // single forward scan: a frame opens at FFD8 and closes at
            // the next FFD9 (restart markers FFD0-FFD7 and escaped FF00
            // never match; entropy-coded FF bytes are always escaped)
            val frames =
              scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
            var i = 0
            var start = -1
            while (i + 1 < payload.length) {
              val b0 = payload(i) & 0xff
              val b1 = payload(i + 1) & 0xff
              if (start < 0 && b0 == 0xff && b1 == 0xd8) { start = i; i += 2 }
              else if (start >= 0 && b0 == 0xff && b1 == 0xd9) {
                frames += java.util.Arrays.copyOfRange(payload, start, i + 2)
                start = -1
                i += 2
              } else i += 1
            }
            frames.iterator.zipWithIndex.collect {
              case (f, k) if k % stride == 0 => Row(r.get(idIdx), k / stride, f)
            }
          }
        }
      }(Encoders.row(outSchema))
  }

  /** Chromaprint-style audio fingerprint: 65 successive fixed-size payload
    * windows → per-window "energy" → 64 DELTA-SIGN bits (bit k = 1 iff
    * energy(k+1) > energy(k)) emitted in the `simhash` column format, so
    * the existing prefix-blocked Hamming machinery
    * ([[graft.ops.Dedup.simhashPairs]]) runs the near-dup pair stage
    * unchanged — the audio leg of the image/video/audio triad
    * (aHash / frame-overlap / this).
    *
    * The per-window energy comes from the [[AudioDecoder]] seam. Default
    * [[Md5StubAudio]]: `energy = int(md5(window bytes)[0:8])` — pure
    * column expressions, oracle-reproducible. [[WavPcmDecoder]] decodes
    * real WAV/AU/AIFF via the JDK's `javax.sound.sampled`, splits the
    * first channel's signed-PCM samples into 65 equal windows spanning
    * the track, and uses the sum of squared samples as the energy
    * (MultimodalDecodeSpec: a tone and its half-amplitude copy produce
    * identical bits; a different tone does not). The DELTA-SIGN
    * derivation is the real fingerprint math for both (Chromaprint and
    * Shazam-family fingerprints binarize exactly this way: sign of the
    * energy difference between adjacent frames/bands).
    *
    * Stub-specific caveat, windows are FIXED-SIZE from the payload start:
    * payloads shorter than `65·windowBytes` hash empty tail windows to a
    * shared constant, so tail delta bits are identically 0 across short
    * payloads. Block on the CONTENT-derived leading bits
    * (`simhashPairs(prefixBits = 16)`), not the rotated multi-pass
    * tables — a rotation whose block lands in the constant tail would
    * put every short payload in one bucket and explode the candidate
    * space. Under a real decoder (windows spread over the actual track)
    * the degeneracy disappears and the multi-pass recall guarantee
    * applies as usual.
    *
    * 100 TB shape: map-only — 65 md5s per payload inside whole-stage
    * codegen, one 64-char string out; payload bytes never shuffle (the
    * pair stage moves only (id, 64-bit fingerprint) rows).
    */
  def audioFingerprint(
      df: DataFrame,
      idCol: String,
      binCol: String,
      windowBytes: Int = 256,
      decoder: AudioDecoder = Md5StubAudio): DataFrame = decoder match {
    case Md5StubAudio =>
      require(windowBytes >= 1, s"windowBytes $windowBytes must be >= 1")
      val b = col(binCol)
      val en = transform(sequence(lit(0), lit(64)), k =>
        conv(substring(md5(b.substr((k * windowBytes + 1).cast("int"), lit(windowBytes))), 1, 8),
          16, 10).cast("long"))
      df.select(col(idCol).as("id"), en.as("__en"))
        .select(col("id"),
          array_join(
            zip_with(slice(col("__en"), 1, 64), slice(col("__en"), 2, 64),
              (a, b2) => when(b2 > a, lit("1")).otherwise(lit("0"))),
            "").as("simhash"))
    case WavPcmDecoder =>
      // windowBytes is a stub-path knob: the real decoder windows by
      // SAMPLE COUNT over the decoded track, so window size follows the
      // track length, not a fixed byte stride from the container start.
      val outSchema = StructType(Seq(
        StructField("id", df.schema(idCol).dataType),
        StructField("simhash", StringType)))
      val idIdx = df.schema.fieldIndex(idCol)
      val binIdx = df.schema.fieldIndex(binCol)
      df.mapPartitions { it =>
        it.map { r =>
          val payload =
            if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
          Row(r.get(idIdx),
            if (payload == null) null
            else decodePcmEnergies(payload).map(deltaSignBits).orNull)
        }
      }(Encoders.row(outSchema))
  }

  /** `javax.sound.sampled` decode to 65 window energies: first channel's
    * signed-PCM samples (8/16-bit, either endianness), window k =
    * samples `[k·n/65, (k+1)·n/65)`, energy = Σ sample² (fits int64:
    * 2³⁰ per 16-bit sample² × ≤2³³ samples needs BigInt only past ~11 h
    * of 44.1 kHz audio — summed in Long here, documented bound). None
    * when the payload is not decodable audio.
    */
  private def decodePcmEnergies(payload: Array[Byte]): Option[Array[Long]] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = in.getFormat
      val enc = fmt.getEncoding
      val ok = enc == AudioFormat.Encoding.PCM_SIGNED &&
        (fmt.getSampleSizeInBits == 16 || fmt.getSampleSizeInBits == 8)
      if (!ok) { in.close(); None }
      else {
        val bytes = in.readAllBytes(); in.close()
        val frame = fmt.getFrameSize
        val big = fmt.isBigEndian
        val two = fmt.getSampleSizeInBits == 16
        val n = bytes.length / frame
        val samples = Array.tabulate(n) { i =>
          val o = i * frame // first channel sits at the frame start
          if (two) {
            val (b0, b1) = (bytes(o) & 0xff, bytes(o + 1) & 0xff)
            (if (big) (b0 << 8) | b1 else (b1 << 8) | b0).toShort.toLong
          } else bytes(o).toLong
        }
        val en = Array.tabulate(65) { k =>
          val (from, until) = (k.toLong * n / 65, (k + 1).toLong * n / 65)
          var s = 0L
          var i = from.toInt
          while (i < until) { s += samples(i) * samples(i); i += 1 }
          s
        }
        Some(en)
      }
    } catch { case _: Exception => None }
  }

  /** The shared delta-sign binarization: bit k = 1 iff
    * `energy(k+1) > energy(k)` — same math the stub path runs as column
    * expressions.
    */
  private def deltaSignBits(en: Array[Long]): String = {
    val sb = new java.lang.StringBuilder(64)
    var k = 0
    while (k < 64) { sb.append(if (en(k + 1) > en(k)) '1' else '0'); k += 1 }
    sb.toString
  }
}
