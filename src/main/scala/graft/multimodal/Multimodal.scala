package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, and decode / feature-extract /
  * frame-sample run as partition-batched transforms so a real codec
  * (JNI/native) is invoked once per batch, not once per row.
  *
  * The image METADATA decode is REAL: [[decodeImages]] parses PNG /
  * JPEG / GIF headers ([[ImageHeader]], pure JVM) for width / height /
  * channels / bit depth — the pass a 100 TB pipeline runs for
  * dimension filtering and resize planning without ever touching pixel
  * data. PIXEL decode is REAL for all three image formats —
  * [[PngPixels]] (JDK Inflater + RFC 2083 unfiltering), [[GifPixels]]
  * (LZW + palette), [[JpegPixels]] (Huffman + IDCT, ITU T.81) — no
  * codec library needed, surfaced as per-channel statistics by
  * [[decodePixelStats]]. Only video FRAME rasterization (H.264 etc.)
  * genuinely needs a native codec and rides the byte-stats fallback
  * (`decodeStub`) with the production batching/schema shape; swap in
  * a codec call to go live.
  */
object Multimodal {

  /** The at-rest schema of a media table: payload + envelope metadata.
    * (Mirrors the reference's opaque-value stance: bytes are written
    * untouched, `string/StringRecordWriterProvider.java:71-80`.) */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** The (media_id, mime, payload) shape every synthetic* generator
    * emits — ONE declaration, not one per builder. */
  val syntheticMediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Feature row produced per media item by the decode pass. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false)))

  /** Container-level fallback features: byte statistics + a 16-dim
    * byte-histogram "embedding" over the RAW payload. This is the
    * path for formats whose pixel decode needs a native codec (video
    * frames) — PNG, GIF and JPEG have REAL pixel decodes
    * ([[PngPixels]], [[GifPixels]], [[JpegPixels]],
    * [[decodePixelStats]]). Same signature a codec-backed decoder
    * has: bytes in, fixed-width features out. */
  def decodeStub(payload: Array[Byte]): (Double, Int, Array[Float]) = {
    val n = math.max(payload.length, 1)
    val mean = payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n
    val hist = new Array[Float](16)
    payload.foreach(b => hist((b & 0xff) >> 4) += 1f)
    var i = 0
    while (i < 16) { hist(i) /= n; i += 1 }
    (mean, 1 + payload.length / 4096, hist)
  }

  /** Partition-batched decode: one pass per partition (where a native
    * codec would amortize init), emitting [[featureSchema]] rows.
    * `mapPartitions` over Rows — the Scala analog of a batched Pandas
    * UDF: the engine hands the transform whole batches, keeping the
    * per-record overhead out of the hot loop. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition (per-batch) init happens HERE in a real codec
        rows.map { r =>
          val id = r.getLong(0)
          // payload is declared nullable — treat a missing payload as
          // an empty blob rather than NPE-ing the task
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          val (mean, frames, feat) = decodeStub(bytes)
          Row(id, bytes.length.toLong, mean, frames, feat.toSeq)
        }
      }(enc)
  }

  /** Frame sampling plan: which byte offsets a video decoder would seek
    * to for `k` uniform frames — pure column algebra, no decode. */
  def frameSampleOffsets(media: DataFrame, k: Int): DataFrame = {
    // k <= 0 would build sequence(0, k-1) DESCENDING and divide by
    // zero — fail at plan build, not with null-riddled output
    require(k > 0, s"frame sample count must be positive, got $k")
    media.select(col("media_id"),
      transform(sequence(lit(0), lit(k - 1)),
        i => graft.ingest.Rotation.longDiv(
          i.cast("long") * octet_length(col("payload")).cast("long"),
          lit(k.toLong))).as("frame_offsets"))
  }

  /** [[frameSampleOffsets]] flattened to scalar rows — one
    * (media_id, frame_idx, byte_offset) per planned seek. The exploded
    * shape is what a distributed decode stage actually consumes (each
    * row is an independent unit of work), and it keeps every column
    * scalar for downstream exchange/compare. */
  def frameSamplePlan(media: DataFrame, k: Int): DataFrame =
    frameSampleOffsets(media, k)
      .select(col("media_id"),
        posexplode(col("frame_offsets")).as(Seq("frame_idx", "byte_offset")))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("byte_offset"))

  /** Resize (thumbnail) plan: output dimensions fitting inside
    * `maxDim`, aspect preserved, never upscaled — the metadata-only
    * half of a resize pass, pure column algebra; the byte transform
    * slots into [[extractFeatures]]'s per-partition batch loop where
    * the codec lives. Null dimensions pass through as null. */
  def resizePlan(media: DataFrame, maxDim: Int): DataFrame = {
    val w = col("width").cast("double")
    val h = col("height").cast("double")
    val scale = least(lit(1.0), lit(maxDim.toDouble) / greatest(w, h))
    media.select(col("media_id"), col("width"), col("height"),
      floor(w * scale).cast("int").as("out_w"),
      floor(h * scale).cast("int").as("out_h"))
  }

  /** REAL raster resize: box-filter downscale to `outW`×`outH`
    * (each output pixel is the rounded mean of its integer source
    * box `[x·w/outW, (x+1)·w/outW) × [y·h/outH, (y+1)·h/outH)`) —
    * the thumbnail/training-resolution step of an image pipeline,
    * pure integer accumulation, no library. Upscaling is refused:
    * this plane only shrinks (pair with [[resizePlan]], which never
    * plans an upscale either). */
  def resizeRaster(img: PngPixels.Image, outW: Int,
                   outH: Int): PngPixels.Image = {
    require(outW > 0 && outH > 0 && outW <= img.width && outH <= img.height,
      s"box resize only shrinks: ${img.width}x${img.height} -> ${outW}x$outH")
    val ch = img.channels
    val out = new Array[Byte](outW * outH * ch)
    var oy = 0
    while (oy < outH) {
      val y0 = oy * img.height / outH
      val y1 = (oy + 1) * img.height / outH
      var ox = 0
      while (ox < outW) {
        val x0 = ox * img.width / outW
        val x1 = (ox + 1) * img.width / outW
        var c = 0
        while (c < ch) {
          var sum = 0L
          var yy = y0
          while (yy < y1) {
            var xx = x0
            while (xx < x1) {
              sum += img.pixels((yy * img.width + xx) * ch + c) & 0xff
              xx += 1
            }
            yy += 1
          }
          val n = (y1 - y0).toLong * (x1 - x0)
          out((oy * outW + ox) * ch + c) = ((sum + n / 2) / n).toByte
          c += 1
        }
        ox += 1
      }
      oy += 1
    }
    PngPixels.Image(outW, outH, ch, out)
  }

  /** Per-channel pixel-statistics row produced by the REAL pixel
    * decode. `channel` is -1 for the byte-stats fallback row of a
    * payload no in-JVM codec can rasterize. */
  val pixelStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("channel", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("sum_px", LongType, nullable = false),
    StructField("min_px", IntegerType, nullable = false),
    StructField("max_px", IntegerType, nullable = false),
    StructField("mean_px", DoubleType, nullable = false)))

  /** The raster decode shared by every pixel consumer: PNG via
    * [[PngPixels]] (Inflater + RFC 2083 unfiltering), GIF via
    * [[GifPixels]] (LZW + palette), JPEG via [[JpegPixels]] (Huffman +
    * IDCT) — all pure JVM. None routes to the byte-stats fallback. */
  def decodeRaster(bytes: Array[Byte]): Option[PngPixels.Image] =
    PngPixels.decode(bytes).orElse(GifPixels.decode(bytes))
      .orElse(JpegPixels.decode(bytes))

  /** REAL pixel decode, batched: PNG, GIF and JPEG payloads rasterize
    * in-JVM ([[decodeRaster]]) and emit one stats row per channel;
    * payloads needing a native codec (video frames, …) fall back to
    * ONE byte-stats row at channel = -1, so the pass never fails a task
    * and downstream can route on the channel sign. Sum/min/max are
    * exact integers; the mean is one final IEEE division — the same
    * discipline the SQL oracle follows. */
  def decodePixelStats(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(pixelStatsSchema)
    media.select(col("media_id"), col("payload"))
      .flatMap { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        decodeRaster(bytes) match {
          case Some(img) => channelStatRows(id, img)
          case None => Seq(byteStatRow(id, bytes))
        }
      }(enc)
  }

  /** Per-channel stats rows for a decoded raster — the ONE loop the
    * full-resolution and resized stats passes share. */
  private def channelStatRows(id: Long, img: PngPixels.Image): Seq[Row] = {
    val ch = img.channels
    val n = img.width.toLong * img.height
    val sums = new Array[Long](ch)
    val mins = Array.fill(ch)(255)
    val maxs = new Array[Int](ch)
    var i = 0
    while (i < img.pixels.length) {
      val c = i % ch
      val v = img.pixels(i) & 0xff
      sums(c) += v
      if (v < mins(c)) mins(c) = v
      if (v > maxs(c)) maxs(c) = v
      i += 1
    }
    (0 until ch).map(c => Row(id, c, n, sums(c), mins(c), maxs(c),
      sums(c).toDouble / n.toDouble))
  }

  /** The channel = -1 byte-stats fallback row for payloads no in-JVM
    * codec rasterizes — shared by every stats pass's quarantine arm. */
  private def byteStatRow(id: Long, bytes: Array[Byte]): Row = {
    val n = math.max(bytes.length, 1).toLong
    var sum = 0L; var mn = 255; var mx = 0
    bytes.foreach { b =>
      val v = b & 0xff
      sum += v
      if (v < mn) mn = v
      if (v > mx) mx = v
    }
    if (bytes.isEmpty) { mn = 0 }
    Row(id, -1, n, sum, mn, mx, sum.toDouble / n.toDouble)
  }

  /** REAL decode → REAL resize → per-channel stats, batched: the
    * thumbnail/training-resolution pass of an image pipeline with the
    * downscale actually applied to pixels ([[resizeRaster]], integer
    * box filter), not just planned. Payloads no in-JVM codec can
    * rasterize are dropped (route them through [[decodeImages]]'
    * quarantine instead — a resize pass has nothing to resize). */
  def decodeResizedPixelStats(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"shrink factor must be >= 1, got $factor")
    val enc = RowEncoder.encoderFor(pixelStatsSchema)
    media.select(col("media_id"), col("payload"))
      .flatMap { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        decodeRaster(bytes).filter(i =>
            i.width >= factor && i.height >= factor).toSeq.flatMap { full =>
          channelStatRows(id, resizeRaster(full, full.width / factor,
            full.height / factor))
        }
      }(enc)
  }

  /** EVEN-dimensioned flat-block JPEGs for the resize round-trip:
    * with 8-px blocks and a 2× box filter, every 2×2 source box lies
    * inside ONE flat block (an even x and x+1 never straddle a
    * multiple of 8), so the downscaled raster is exactly the block
    * image at 4-px blocks — SQL-recomputable despite a real resize
    * having run. */
  def syntheticResizeImages(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(syntheticMediaSchema)
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, "image/jpeg", ImageFixtures.jpegPixelBytes(
            w = (96 + 2 * (id % 20)).toInt,
            h = (64 + 2 * ((id * 5) % 18)).toInt,
            ncomp = if ((id / 3) % 2 == 1) 1 else 3,
            seed = (id % 256).toInt))
        }
      }(enc)
  }

  /** Envelope row produced per media item by the REAL header decode. */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("bit_depth", IntegerType)))

  /** REAL image-envelope decode: parse each payload's PNG/JPEG/GIF
    * header ([[ImageHeader]]) inside the same partition-batched
    * boundary as [[extractFeatures]]. Rows whose payload is not a
    * recognizable image come back as format `unknown` with null
    * dimensions — the pipeline's route-to-quarantine signal — instead
    * of failing the task. */
  def decodeImages(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(imageMetaSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          ImageHeader.detect(bytes) match {
            case Some(m) =>
              Row(id, m.format, m.width, m.height, m.channels, m.bitDepth)
            case None => Row(id, "unknown", null, null, null, null)
          }
        }
      }(enc)
  }

  /** Synthesize a REAL image payload per document — format and
    * dimensions derived arithmetically from `doc_id` (so a SQL oracle
    * can recompute the expected envelope), bytes built by
    * [[ImageFixtures]] (spec-valid PNG/JPEG/GIF containers). This is
    * the fixture half of the `multimodal_decode` round-trip: builder
    * and parser meet only at the public byte format. */
  def syntheticImages(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(syntheticMediaSchema)
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = (1 + id % 61).toInt
          val h = (1 + (id * 7) % 53).toInt
          val alt = (id / 3) % 2 == 1
          (id % 3) match {
            case 0 => Row(id, "image/png",
              // gradient content seeded by id (mod 256 distributes, so
              // the oracle can use (x+y+c+id) % 256 directly)
              ImageFixtures.pngBytes(w, h, if (alt) 6 else 2,
                seed = (id % 256).toInt))
            case 1 => Row(id, "image/jpeg",
              // flat 8x8 blocks at (17*bx + 29*by + id) % 256 — the
              // lossless-by-construction baseline stream (see
              // ImageFixtures.jpegPixelBytes), so the oracle recomputes
              // decoded pixels despite JPEG being a lossy format
              ImageFixtures.jpegPixelBytes(w, h, if (alt) 1 else 3,
                seed = (id % 256).toInt))
            case _ => Row(id, "image/gif",
              // seeded checkerboard: channel value 255*((x+y+id) % 2)
              ImageFixtures.gifBytes(w, h, seed = (id % 256).toInt))
          }
        }
      }(enc)
  }

  /** Difference hash (dHash) of a decoded raster — the standard
    * 64-bit perceptual fingerprint: a 9×8 point-sampled grayscale grid
    * (integer channel sums, exact), one bit per horizontally-adjacent
    * pair (`right > left`). Invariant to any CONSTANT brightness shift
    * that neither clamps nor wraps (all comparisons shift together),
    * which is exactly the near-duplicate class exposure-adjusted
    * re-encodes produce. Pure integer algebra — bit-identical
    * everywhere. */
  def dHash(img: PngPixels.Image): Long = {
    val g = Array.ofDim[Long](8, 9)
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 9) {
        val y = (j * img.height) / 8
        val x = (i * img.width) / 9
        val base = (y * img.width + x) * img.channels
        var s = 0L
        var c = 0
        while (c < img.channels) { s += img.pixels(base + c) & 0xff; c += 1 }
        g(j)(i) = s
        i += 1
      }
      j += 1
    }
    var bits = 0L
    var jj = 0
    while (jj < 8) {
      var ii = 0
      while (ii < 8) {
        if (g(jj)(ii + 1) > g(jj)(ii)) bits |= 1L << (jj * 8 + ii)
        ii += 1
      }
      jj += 1
    }
    bits
  }

  /** Perceptual-fingerprint row per decodable image. */
  val imageHashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("dhash", LongType, nullable = false)))

  /** REAL pixel decode → [[dHash]] per PNG/GIF payload, batched.
    * Undecodable payloads are dropped (they have no raster to hash —
    * route them through [[decodeImages]]' quarantine path instead). */
  def decodeDHash(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(imageHashSchema)
    media.select(col("media_id"), col("payload"))
      .flatMap { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        decodeRaster(bytes).map(img => Row(id, dHash(img)))
      }(enc)
  }

  /** Synthesize an image corpus with PLANTED brightness-shifted
    * near-duplicates: documents sharing `doc_id mod 250` share pixel
    * CONTENT (and dims/color type — all key-derived) but carry a
    * copy-dependent brightness offset, bounded so nothing clamps. A
    * perceptual dedup must pair exactly the same-key documents. */
  def syntheticNearDupImages(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(syntheticMediaSchema)
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val key = id % 250
          val ct = (key % 4) match {
            case 0 => 0; case 1 => 2; case 2 => 4; case _ => 6
          }
          Row(id, "image/png", ImageFixtures.pngBytesHashed(
            w = (16 + key % 17).toInt,
            h = (16 + (key * 3) % 13).toInt,
            colorType = ct,
            key = key,
            brightness = ((id / 250) * 13 % 100).toInt))
        }
      }(enc)
  }

  /** Synthesize CROSS-FORMAT near-duplicate pairs: per document, the
    * SAME pseudo-random block raster ([[ImageFixtures.blockMix]],
    * keyed by the doc id) encoded once as a grayscale PNG
    * (media_id = 2·doc) and once as a baseline JPEG
    * (media_id = 2·doc + 1). Both decode to byte-identical rasters
    * (the JPEG is lossless by construction), so a pixel-space
    * perceptual hash must pair exactly the re-encode twins — the
    * "same image saved in another format" duplicate class an
    * image-dedup pipeline has to collapse across container types. */
  def syntheticCrossFormatImages(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(syntheticMediaSchema)
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          // >= 96px a side: the 9x8 dHash sampling grid then lands
          // every point in a DISTINCT 8x8 block (steps >= 10px), so
          // all 64 comparison bits carry independent content and
          // cross-document collisions vanish
          val w = (96 + id % 41).toInt
          val h = (96 + (id * 5) % 37).toInt
          Seq(
            Row(2 * id, "image/png", ImageFixtures.pngBlockBytes(w, h, id)),
            Row(2 * id + 1, "image/jpeg",
              ImageFixtures.jpegBlockBytes(w, h, id)))
        }
      }(enc)
  }

  /** Per-channel sample-statistics row produced by the REAL PCM
    * decode. `channel` is -1 for the byte-stats fallback row of a
    * payload that is not integer PCM at 8/16 bits. */
  val sampleStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("channel", IntegerType, nullable = false),
    StructField("n_smp", LongType, nullable = false),
    StructField("sum_smp", LongType, nullable = false),
    StructField("min_smp", IntegerType, nullable = false),
    StructField("max_smp", IntegerType, nullable = false),
    StructField("mean_smp", DoubleType, nullable = false)))

  /** REAL PCM sample decode, batched ([[PcmSamples]]): WAV payloads
    * emit one exact-integer stats row per channel — the
    * loudness/clipping/silence gate of an audio curation pipeline;
    * anything else falls back to ONE byte-stats row at channel = -1.
    * Same discipline as [[decodePixelStats]]: integer sums, one final
    * IEEE division for the mean. */
  def decodeSampleStats(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(sampleStatsSchema)
    media.select(col("media_id"), col("payload"))
      .flatMap { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        PcmSamples.decode(bytes) match {
          case Some(a) if a.nFrames > 0 =>
            val ch = a.channels
            val sums = new Array[Long](ch)
            val mins = Array.fill(ch)(Int.MaxValue)
            val maxs = Array.fill(ch)(Int.MinValue)
            var i = 0
            while (i < a.samples.length) {
              val c = i % ch
              val v = a.samples(i)
              sums(c) += v
              if (v < mins(c)) mins(c) = v
              if (v > maxs(c)) maxs(c) = v
              i += 1
            }
            (0 until ch).map(c => Row(id, c, a.nFrames, sums(c), mins(c),
              maxs(c), sums(c).toDouble / a.nFrames.toDouble))
          case _ => Seq(byteStatRow(id, bytes))
        }
      }(enc)
  }

  /** Envelope row produced per media item by the REAL audio decode. */
  val audioMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_ms", LongType)))

  /** REAL audio-envelope decode: parse each payload's RIFF/WAVE header
    * ([[AudioHeader]]) inside the same partition-batched boundary.
    * Unrecognized payloads route as `unknown` with null fields — the
    * quarantine signal — instead of failing the task. */
  def decodeAudio(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioMetaSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          AudioHeader.parseWav(bytes) match {
            case Some(m) => Row(id, m.format, m.channels, m.sampleRate,
              m.bitsPerSample, m.nFrames, m.durationMs)
            case None => Row(id, "unknown", null, null, null, null, null)
          }
        }
      }(enc)
  }

  /** Synthesize a REAL PCM WAV payload per document — envelope derived
    * arithmetically from `doc_id` (SQL-recomputable), bytes built by
    * [[AudioFixtures]]. The audio half of the decode round-trip. */
  def syntheticAudio(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(syntheticMediaSchema)
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val rate = (id % 3) match {
            case 0 => 8000; case 1 => 11025; case _ => 16000
          }
          Row(id, "audio/wav", AudioFixtures.wavBytes(
            channels = (1 + id % 2).toInt,
            sampleRate = rate,
            bitsPerSample = if ((id / 3) % 2 == 1) 8 else 16,
            nFrames = (1 + id % 199) * 41,
            seed = id))
        }
      }(enc)
  }

  /** Envelope row produced per media item by the REAL video decode. */
  val videoMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_tracks", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType),
    StructField("decoded", BooleanType, nullable = false)))

  /** REAL video-envelope decode: parse each payload's MP4 `moov` tree
    * ([[VideoHeader]]) inside the same partition-batched boundary.
    * Unrecognized payloads route as `unknown` with null fields.
    * `codec` is the video track's `stsd` fourcc (null when the track
    * names none); `decoded` reports whether the in-JVM pixel path can
    * rasterize this track's samples (MJPEG's "jpeg" entry — see
    * [[decodeFramePixels]]). `decoded = false` with a non-null codec
    * (avc1, …) is the explicit route-to-external-decoder signal:
    * downstream gets honest byte stats, never silently. */
  def decodeVideo(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(videoMetaSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          VideoHeader.parseMp4(bytes) match {
            case Some(m) => Row(id, m.format, m.width, m.height,
              m.nTracks, m.durationMs, m.codec.orNull,
              m.codec.contains("jpeg"))
            case None => Row(id, "unknown", null, null, null, null,
              null, false)
          }
        }
      }(enc)
  }

  /** Synthesize a REAL MP4 envelope per document — dimensions,
    * timescale, duration, track count AND the stsd codec fourcc
    * derived arithmetically from `doc_id` (SQL-recomputable), bytes
    * built by [[VideoFixtures]]. The codec cycle covers the routing
    * space: `jpeg` (in-JVM decodable), `avc1`/`mp4v` (native-codec —
    * route external), and a no-stsd envelope (codec unknown). */
  def syntheticVideo(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(syntheticMediaSchema)
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val ts = (id % 3) match {
            case 0 => 600; case 1 => 1000; case _ => 90000
          }
          val codec = (id % 4) match {
            case 0 => Some("jpeg"); case 1 => Some("avc1")
            case 2 => Some("mp4v"); case _ => None
          }
          Row(id, "video/mp4", VideoFixtures.mp4Bytes(
            w = (16 * (1 + id % 120)).toInt,
            h = (16 * (1 + (id * 7) % 68)).toInt,
            timescale = ts,
            duration = (1 + id % 3599) * 25,
            withAudioTrack = id % 2 == 1,
            codec = codec))
        }
      }(enc)
  }

  /** One frame-plan row per sample of a parseable MP4 sample table:
    * the unit of work a distributed frame extractor consumes.
    * `rel_offset` is the byte position within the `mdat` payload
    * (absolute minus the payload base — stable when the object is
    * re-homed). */
  val framePlanSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_idx", IntegerType, nullable = false),
    StructField("rel_offset", LongType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("pts_ticks", LongType, nullable = false),
    StructField("keyframe", BooleanType, nullable = false)))

  /** REAL sample-table decode, batched ([[VideoSamples]]): per MP4
    * payload, the per-frame (offset, size, pts, keyframe) plan from
    * `stts`/`stsc`/`stsz`/`stco`/`stss` — which byte ranges to fetch
    * and which samples are seekable, no codec touched. Payloads
    * without a table emit no rows (plan seeks with the arithmetic
    * fallback [[frameSamplePlan]] instead). */
  def decodeFramePlan(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(framePlanSchema)
    media.select(col("media_id"), col("payload"))
      .flatMap { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        VideoSamples.parse(bytes).toSeq.flatMap { tbl =>
          tbl.samples.map(s => Row(id, s.idx,
            s.offset - tbl.mdatPayloadStart, s.size, s.ptsTicks,
            s.keyframe))
        }
      }(enc)
  }

  /** Synthesize a PLAYER-SHAPED MP4 per document — full sample table
    * + real mdat ([[VideoFixtures.mp4SampleBytes]]); sample count and
    * sizes derive arithmetically from `doc_id` so a SQL oracle
    * recomputes the whole plan (sizes, prefix-sum offsets, pts grid,
    * keyframe cadence). */
  def syntheticSampledVideos(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(syntheticMediaSchema)
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, "video/mp4", VideoFixtures.mp4SampleBytes(
            w = 320, h = 240, timescale = 600, delta = 25,
            nSamples = (24 + id % 96).toInt, seed = id))
        }
      }(enc)
  }

  /** Per-FRAME pixel stats rows (frame-sampled thumbnail pass). */
  val framePixelsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_idx", IntegerType, nullable = false),
    StructField("pts_ticks", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("sum_px", LongType, nullable = false),
    StructField("min_px", IntegerType, nullable = false),
    StructField("max_px", IntegerType, nullable = false)))

  /** REAL frame-pixel decode for MJPEG-in-MP4, batched: the
    * decode→frame-sample loop CLOSED pure-JVM. Per payload,
    * [[VideoSamples]] yields the seek plan and the `stsd` fourcc; a
    * `jpeg` sample entry means every sample is a complete baseline
    * JPEG, so each SAMPLED frame (the stss sync set — what a
    * thumbnail extractor seeks to) is sliced by its (offset, size)
    * byte range and rasterized by [[JpegPixels]], emitting exact
    * integer stats per frame. Traks behind a native codec (avc1, …)
    * emit no rows here — they stay on the documented byte-stats
    * boundary ([[decodePixelStats]]'s channel = -1 path). At 100 TB
    * this shape is the point: the plan is metadata, the decode
    * touches only the sampled frames' byte ranges, and both live in
    * one batched `mapPartitions`-style pass with no shuffle. */
  def decodeFramePixels(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(framePixelsSchema)
    media.select(col("media_id"), col("payload"))
      .flatMap { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        VideoSamples.parse(bytes).toSeq
          .filter(_.codec.contains("jpeg"))
          .flatMap { tbl =>
            tbl.samples.iterator.filter(_.keyframe).flatMap { s =>
              val from = s.offset
              val to = s.offset + s.size
              if (from < 0 || to > bytes.length || from >= to) None
              else JpegPixels.decode(java.util.Arrays.copyOfRange(
                bytes, from.toInt, to.toInt)).map { img =>
                var sum = 0L; var mn = 255; var mx = 0
                var i = 0
                while (i < img.pixels.length) {
                  val v = img.pixels(i) & 0xff
                  sum += v
                  if (v < mn) mn = v
                  if (v > mx) mx = v
                  i += 1
                }
                Row(id, s.idx, s.ptsTicks, img.width, img.height,
                  img.channels, img.width.toLong * img.height, sum, mn, mx)
              }
            }
          }
      }(enc)
  }

  /** Synthesize an MJPEG-in-MP4 per document
    * ([[VideoFixtures.mp4MjpegBytes]]): frame count and every frame's
    * flat-block levels derive arithmetically from `doc_id`, so a SQL
    * oracle regenerates each sampled frame's decoded raster. */
  def syntheticMjpegVideos(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(syntheticMediaSchema)
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, "video/mp4", VideoFixtures.mp4MjpegBytes(
            w = 24, h = 16, timescale = 600, delta = 25,
            nFrames = (6 + id % 7).toInt, seed = id))
        }
      }(enc)
  }

  /** Wrap a text/doc table as a media table (test fixture path). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("application/octet-stream").as("mime"),
      col("text").cast("binary").as("payload"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms"))
}
