package graft.data

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata. The Spark-side plumbing — schema, batch iteration, partition
  * sizing — is real, and so is IMAGE decoding: [[ImageIoDecoder]] reads
  * PNG/JPEG/GIF/BMP through `javax.imageio` (ships with the JRE — zero
  * added dependencies). Audio/video decoding remains STUBBED behind
  * [[Decoder]] (no such codecs in this build environment; plug a real
  * implementation in production).
  *
  * Scale notes: media rows are orders of magnitude wider than text rows —
  * [[repartitionBySize]] targets a fixed number of BYTES per task (not rows)
  * so one task never holds 2 GiB of video while another holds thumbnails.
  */
object Multimodal {

  // ImageIO's stream cache defaults to FILE-backed: every encode/decode
  // creates, writes and deletes a temp file. Our images live entirely in
  // memory, so under 32-way task parallelism those per-image syscalls —
  // not pixel work — dominated the dhash stage (measured 23× the serial
  // CPU at sf0.1 once the scan was spread). Memory caching is
  // semantically identical; it only changes the scratch medium.
  javax.imageio.ImageIO.setUseCache(false)

  /** Canonical media row schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType),
    StructField("content", BinaryType),
    StructField("meta", MapType(StringType, StringType))))

  /** Extracted feature schema appended by [[extractFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("mean_sample", DoubleType),
    StructField("decode_ok", BooleanType)))

  /** `meanSample` is the mean over every raster sample of every band — a
    * deterministic pixel-stat scalar (−1.0 when the decoder has no pixel
    * access, e.g. the stub). */
  final case class Decoded(width: Int, height: Int, channels: Int, nFrames: Int,
      meanSample: Double = -1.0)

  /** The decode seam. A real implementation wraps an image/audio codec;
    * [[StubDecoder]] is a clearly-marked deterministic fake. */
  trait Decoder extends Serializable {
    def decode(mime: String, bytes: Array[Byte]): Option[Decoded]
  }

  /** STUB: deterministic pseudo-decode from the byte content (NOT a real
    * codec — stands in for one so the distributed plumbing is testable). */
  object StubDecoder extends Decoder {
    def decode(mime: String, bytes: Array[Byte]): Option[Decoded] = {
      if (bytes == null || bytes.isEmpty) return None
      var h = 0xcbf29ce484222325L
      bytes.foreach { b => h ^= (b & 0xff); h *= 0x100000001b3L }
      def pick(shift: Int, mod: Int, base: Int) = (((h >>> shift) & 0xffff) % mod + base).toInt
      Option(mime).getOrElse("") match {
        case m if m.startsWith("image/") =>
          Some(Decoded(pick(0, 2048, 16), pick(16, 2048, 16), 3, 1))
        case m if m.startsWith("video/") =>
          Some(Decoded(pick(0, 1920, 16), pick(16, 1080, 16), 3, pick(32, 1000, 1)))
        case m if m.startsWith("audio/") =>
          Some(Decoded(0, 0, pick(0, 2, 1), pick(16, 100000, 1)))
        case _ => None
      }
    }
  }

  /** Real image decode through `javax.imageio`: dimensions, raster band
    * count, and the mean raster sample. None for non-image mimes, empty
    * payloads, and bytes no installed reader accepts — chain with
    * [[StubDecoder]] via [[DefaultDecoder]] for those. */
  object ImageIoDecoder extends Decoder {
    def decode(mime: String, bytes: Array[Byte]): Option[Decoded] = {
      if (bytes == null || bytes.isEmpty) return None
      if (mime == null || !mime.startsWith("image/")) return None
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val raster = img.getRaster
          val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var b = 0
              while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h * bands
          Some(Decoded(w, h, bands, 1, if (n > 0) sum / n else -1.0))
        }
      } catch { case _: Throwable => None }
    }
  }

  /** Default decode chain: real `javax.imageio` image decode, real
    * RIFF/PCM WAV audio decode, the deterministic stub for whatever no
    * installed codec accepts (video in this build). */
  object DefaultDecoder extends Decoder {
    def decode(mime: String, bytes: Array[Byte]): Option[Decoded] =
      ImageIoDecoder.decode(mime, bytes)
        .orElse(WavDecoder.decode(mime, bytes))
        .orElse(StubDecoder.decode(mime, bytes))
  }

  /** REAL audio decode: RIFF/WAVE PCM parse with zero added dependencies
    * (the container format is a public byte layout — no codec library
    * needed for uncompressed PCM). Validates the RIFF/WAVE magic, walks
    * chunks to `fmt ` (must be PCM format 1, 16-bit) and `data`, and
    * computes frames plus the mean ABSOLUTE sample amplitude (exact
    * integer sum / n, one IEEE division). Decoded mapping for audio:
    * `width` carries the sample rate, `height` the bits per sample,
    * `nFrames` the per-channel sample frames, `meanSample` the mean |s|.
    * Closes the audio leg of the multimodal tier the same way
    * javax.imageio closed images — the stub now stands in for video
    * codecs only. */
  object WavDecoder extends Decoder {
    def decode(mime: String, bytes: Array[Byte]): Option[Decoded] = {
      if (bytes == null || bytes.length < 44) return None
      if (mime == null || !mime.startsWith("audio/")) return None
      def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
      try {
        if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
        var off = 12
        var channels = 0
        var rate = 0
        var bits = 0
        var dataOff = -1
        var dataLen = 0
        while (off + 8 <= bytes.length && (dataOff < 0 || bits == 0)) {
          val id = tag(off)
          val len = u32(off + 4).toInt
          if (id == "fmt ") {
            if (u16(off + 8) != 1) return None // PCM only
            channels = u16(off + 10)
            rate = u32(off + 12).toInt
            bits = u16(off + 22)
          } else if (id == "data") {
            dataOff = off + 8
            dataLen = math.min(len, bytes.length - dataOff)
          }
          off += 8 + len + (len & 1)
        }
        if (bits != 16 || channels <= 0 || dataOff < 0) return None
        val nSamples = dataLen / 2
        var sumAbs = 0L
        var i = 0
        while (i < nSamples) {
          val o = dataOff + i * 2
          val s = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toInt
          sumAbs += math.abs(s)
          i += 1
        }
        val frames = nSamples / channels
        Some(Decoded(rate, bits, channels, frames,
          if (nSamples > 0) sumAbs.toDouble / nSamples else -1.0))
      } catch { case _: Throwable => None }
    }
  }

  /** Deterministic synthetic 16-bit mono PCM WAV: sample i is the integer
    * sawtooth `((i * step) % 2000) - 1000` — pure integer waveform, so
    * expected decode stats are an exact function of (nSamples, step) that
    * an oracle replicates in SQL. */
  def syntheticWav(nSamples: Int, step: Int, sampleRate: Int = 16000): Array[Byte] = {
    val dataLen = nSamples * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      out.putShort((((i.toLong * step) % 2000) - 1000).toShort)
      i += 1
    }
    out.array()
  }

  /** Deterministic synthetic PNG — a constant-gray `width`×`height` RGB
    * image, so a decode of the emitted bytes is a pure function of the
    * arguments (dimensions, 3 bands, mean sample = gray). Test and oracle
    * fixture generator. */
  def syntheticPng(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = gray & 0xff
    val rgb = (g << 16) | (g << 8) | g
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic ANIMATED GIF: one constant-gray frame per
    * element of `grays`. Frames are written `TYPE_BYTE_INDEXED` over an
    * explicit 256-entry gray palette (entry i = rgb(i,i,i)) so encoding is
    * LOSSLESS — no quantizer in the loop — and a decode of frame k yields
    * exactly `grays(k)` at every pixel. Test and oracle fixture generator
    * for the real frame-sampling path.
    *
    * Heights 2–4 are rejected: the JDK's GIF writer emits interlaced image
    * data whose row sequence drops one row exactly at those heights
    * (measured empirically on this JRE — one full row decodes as palette
    * index 0), which would silently break the losslessness contract. */
  def syntheticGif(width: Int, height: Int, grays: Seq[Int]): Array[Byte] = {
    require(height == 1 || height >= 5,
      s"height $height hits the JDK GIF writer's interlace row-drop (2..4)")
    val ramp = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      grays.foreach { g =>
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) { raster.setSample(x, y, 0, g & 0xff); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Decode/feature-extract over partitions (the Scala analogue of a
    * mapInPandas batch UDF: one decoder instance per partition, rows
    * streamed). Appends [[featureSchema]] columns; decode failures yield
    * decode_ok=false rather than failing the job (DLQ-able downstream). */
  def extractFeatures(df: DataFrame, decoder: Decoder = DefaultDecoder): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ featureSchema.fields)
    val mimeIdx = inSchema.fieldIndex("mime")
    val contentIdx = inSchema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.map { r =>
        val decoded = decoder.decode(r.getString(mimeIdx), r.getAs[Array[Byte]](contentIdx))
        val extra: Array[Any] = decoded match {
          case Some(d) => Array(d.width, d.height, d.channels, d.nFrames, d.meanSample, true)
          case None => Array(null, null, null, null, null, false)
        }
        new GenericRowWithSchema(Array.tabulate(inSchema.length)(r.get) ++ extra, outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** Resize decodable images to fit within `maxW`×`maxH` (aspect
    * preserved, never upscaled; floor rounding, min dimension 1),
    * re-encoding as PNG — real bilinear scaling via the JRE's Graphics2D,
    * zero added dependencies. Rows whose content no installed reader
    * accepts (audio/video here) pass through unchanged, so the operator
    * composes with mixed-media frames. Scaling a constant-fill image is
    * exactly constant (any convex combination of equal samples), which is
    * what lets the resize oracle pin the mean sample bit-for-bit. */
  def resizeImages(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val schema = df.schema
    val mimeIdx = schema.fieldIndex("mime")
    val contentIdx = schema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.map { r =>
        val mime = r.getString(mimeIdx)
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val resized =
          if (mime == null || !mime.startsWith("image/") || bytes == null || bytes.isEmpty) None
          else
            try {
              val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              if (img == null) None
              else {
                val (w, h) = (img.getWidth, img.getHeight)
                val s = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
                if (s >= 1.0) Some(bytes) // already fits; keep original bytes
                else {
                  val (ow, oh) = (math.max(1, math.floor(w * s).toInt),
                    math.max(1, math.floor(h * s).toInt))
                  val out = new java.awt.image.BufferedImage(
                    ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
                  val g2 = out.createGraphics()
                  g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                    java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                  g2.drawImage(img, 0, 0, ow, oh, null)
                  g2.dispose()
                  val bos = new ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(out, "png", bos)
                  Some(bos.toByteArray)
                }
              }
            } catch { case _: Exception => None }
        resized match {
          case Some(b) =>
            val vals = Array.tabulate[Any](schema.length)(r.get)
            vals(contentIdx) = b
            new GenericRowWithSchema(vals, schema): Row
          case None => r
        }
      }
    }(Encoders.row(schema))
  }

  /** Frame sampling: one output row per sampled frame index (0, every,
    * 2·every, … below `framesCol`). The row explosion, partition shape,
    * and index arithmetic — the parts that matter at 100 TB — are real;
    * pixel extraction is a STUB seam (`frame` = null binary) because no
    * video codec ships in this build: a real decoder replaces the null
    * with the decoded frame without touching the distribution shape. */
  def sampleFrames(df: DataFrame, every: Int, framesCol: String): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0L), greatest(col(framesCol).cast("long"), lit(1L)) - 1,
          lit(every.toLong))))
      .withColumn("frame", lit(null).cast("binary"))

  /** Columns [[sampleFramesDecoded]] appends per sampled frame. */
  val frameSchema: StructType = StructType(Seq(
    StructField("frame_idx", LongType, nullable = false),
    StructField("frame_w", IntegerType),
    StructField("frame_h", IntegerType),
    StructField("frame_mean", DoubleType),
    StructField("frame", BinaryType)))

  /** Frame sampling with REAL pixel extraction where the JRE has a codec:
    * multi-frame images (animated GIF, via `javax.imageio`'s per-index
    * `ImageReader.read(i)`) decode each sampled frame — frame count from
    * the container itself, `frame` = the decoded frame re-encoded as PNG,
    * `frame_mean` = mean over the frame's RGB samples. Containers with no
    * installed codec (true video here) keep the stub seam: indices explode
    * off the `framesCol` metadata count and the pixel columns stay null.
    * One reader per row, streamed per partition — the explosion shape is
    * identical in both paths, so swapping a real video codec into the seam
    * changes no distribution property. */
  def sampleFramesDecoded(df: DataFrame, every: Int, framesCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ frameSchema.fields)
    val mimeIdx = inSchema.fieldIndex("mime")
    val contentIdx = inSchema.fieldIndex("content")
    val framesIdx = inSchema.fieldIndex(framesCol)
    val step = math.max(1, every).toLong
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val mime = r.getString(mimeIdx)
        val bytes = r.getAs[Array[Byte]](contentIdx)
        def stubRows: Iterator[Row] = {
          val n = math.max(1L, r.getLong(framesIdx))
          (0L until n by step).iterator.map { i =>
            new GenericRowWithSchema(
              Array.tabulate[Any](inSchema.length)(r.get) ++
                Array[Any](i, null, null, null, null), outSchema): Row
          }
        }
        if (mime == null || !mime.startsWith("image/") || bytes == null || bytes.isEmpty)
          stubRows
        else {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) { iis.close(); stubRows }
          else {
            val reader = readers.next()
            // materialized per row (frame counts are small) so the reader
            // and stream close deterministically, not at GC time
            try {
              reader.setInput(iis)
              val n = reader.getNumImages(true)
              (0L until n.toLong by step).map { i =>
                val img = reader.read(i.toInt)
                val (w, h) = (img.getWidth, img.getHeight)
                var sum = 0.0
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val rgb = img.getRGB(x, y)
                    sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                    x += 1
                  }
                  y += 1
                }
                val mean = if (w > 0 && h > 0) sum / (3.0 * w * h) else -1.0
                // re-encode via an RGB copy: the JDK PNG writer mishandles
                // palette-indexed sources (writes the palette INDEX as a
                // scaled gray sample), which silently corrupts GIF frames
                val rgbImg = new java.awt.image.BufferedImage(
                  w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g2 = rgbImg.createGraphics()
                g2.drawImage(img, 0, 0, null)
                g2.dispose()
                val png = new ByteArrayOutputStream()
                javax.imageio.ImageIO.write(rgbImg, "png", png)
                new GenericRowWithSchema(
                  Array.tabulate[Any](inSchema.length)(r.get) ++
                    Array[Any](i, w, h, mean, png.toByteArray), outSchema): Row
              }.iterator
            } catch {
              case _: Exception => stubRows
            } finally {
              reader.dispose(); iis.close()
            }
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Repartition so each task handles ~targetBytes of media content.
    * Total size comes from FILE METADATA when the frame is file-backed
    * (listing status of the input files — no data scan at all: at 100 TB an
    * extra pass over the content bytes just to count them would double the
    * read); the content-length sum job only runs for in-memory frames. */
  def repartitionBySize(df: DataFrame, targetBytes: Long): DataFrame = {
    val files = df.inputFiles
    val totalBytes =
      if (files.nonEmpty) {
        val conf = df.sparkSession.sparkContext.hadoopConfiguration
        files.iterator.map { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(conf).getFileStatus(p).getLen
        }.sum
      } else df.select(sum(coalesce(length(col("content")), lit(0)))).head.getLong(0)
    val parts = math.max(1, (totalBytes / math.max(1L, targetBytes)).toInt)
    df.repartition(parts, col("media_id"))
  }

  /** Deterministic synthetic gradient PNG (32×32 gray written as RGB):
    * `gray(x, y) = ((Ax + By + 179·seed + Cxy + 11) mod 200) + offset`
    * with seed-dependent slopes `A = 73 + seed%29, B = 151 + seed%31,
    * C = 7 + seed%23` — a pure integer function of the arguments, so an
    * oracle can replay every pixel, and `offset ≤ 55` never wraps 255.
    * The seed must steer the gradient DIRECTIONS, not only its phase: a
    * phase-only term cancels in dHash's differences and collapsed every
    * seed to a handful of hashes (measured: 2,382 spurious ≤3-bit pairs
    * at sf0.01; with the slope mixing, cross-seed hamming concentrates
    * near 28/56 and band buckets hold ≤19 of 5,100 images at sf0.1). The
    * uniform offset models a brightness-shifted re-encode: [[dHash56]]
    * is invariant to it, which is exactly the robustness perceptual
    * hashing exists for. */
  def gradientPng(seed: Long, offset: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val a = 73L + seed % 29
    val b = 151L + seed % 31
    val cc = 7L + seed % 23
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        val g = (((a * x + b * y + 179L * seed + cc * x * y + 11)
          % 200).toInt + offset) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 56-bit difference hash (dHash, Krawetz 2013) over a REAL image
    * decode: `javax.imageio` reads the bytes, 4×4 integer block means
    * reduce 32×32 → an 8×8 gray grid (exact: `sum div 16`, no resampling
    * kernel, no float), and bit `r·7+c` records `grid(r,c+1) > grid(r,c)`
    * — 7 comparisons × 8 rows = 56 bits, so the hash stays in positive
    * int64 and every engine's shift/xor/popcount agrees. Uniform
    * brightness shifts cancel in the comparisons; that invariance is the
    * point of dHash over raw-byte hashing. Requires a 32×32 input (the
    * pipeline resizes first — [[resizeImages]]). */
  def dHash56(bytes: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null && img.getWidth == 32 && img.getHeight == 32,
      "dHash56 expects a decodable 32x32 image")
    val bm = Array.ofDim[Long](8, 8)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        var s = 0L
        var dy = 0
        while (dy < 4) {
          var dx = 0
          while (dx < 4) {
            s += img.getRGB(4 * c + dx, 4 * r + dy) & 0xff
            dx += 1
          }
          dy += 1
        }
        bm(r)(c) = s / 16
        c += 1
      }
      r += 1
    }
    var h = 0L
    r = 0
    while (r < 8) {
      var c = 0
      while (c < 7) {
        if (bm(r)(c + 1) > bm(r)(c)) h |= 1L << (r * 7 + c)
        c += 1
      }
      r += 1
    }
    h
  }

  /** Near-duplicate IMAGE pairs by dHash hamming distance ≤ `maxHamming`:
    * the standard perceptual-hash image dedup (re-encodes, brightness
    * shifts, minor edits hash within a few bits; unrelated images sit
    * near hamming 28 of 56).
    *
    * Scale shape (100 TB): the 56-bit hash splits into 4 × 14-bit bands;
    * pairs are generated ONLY inside shared band buckets (pigeonhole: ≤ 3
    * differing bits cannot dirty all 4 bands, so recall at maxHamming ≤ 3
    * is guaranteed, not probabilistic) and exact-verified by popcount —
    * the same band-bucket-join shape as SimHash text dedup, no all-pairs
    * stage anywhere. Decode + hash are scan-local; one shuffle by band
    * bucket, one distinct on surviving pairs. */
  def dhashPairs(df: DataFrame, idCol: String, bytesCol: String,
                 maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4, "4 bands guarantee recall only below 4 bits")
    val hashUdf = udf { bytes: Array[Byte] => dHash56(bytes) }
    // Spread before the decode+hash UDF (single-row-group inputs floor the
    // scan at ONE task — guide §2.5; no-op when the scan is already wide),
    // and checkpoint after it: `bands` below feeds BOTH sides of the
    // band-bucket self-join, so under lazy lineage every image was decoded
    // and hashed twice, single-threaded. The checkpointed frame is the
    // 16-byte (id, hash) proxy — image bytes are read once, never joined.
    val hashed = Spread.byKey(df, col(idCol))
      .select(col(idCol).cast("long").as("id"),
        hashUdf(col(bytesCol)).as("h"))
      .localCheckpoint()
    val bands = hashed.select(col("id"), col("h"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bucket",
        expr("shiftright(h, 14 * band) & 16383"))
    val pairs = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.h").as("h_a"), col("b.h").as("h_b"))
      .distinct()
    pairs
      .withColumn("hamming",
        expr("CAST(bit_count(h_a ^ h_b) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
