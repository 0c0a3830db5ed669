package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payloads + typed metadata structs, with
  * decode/feature-extract as per-partition batch transforms.
  *
  * Image and audio decode are REAL on JDK built-in codecs
  * ([[MediaDecoder.ImageIo]]: PNG/BMP/GIF/JPEG via `javax.imageio`;
  * [[MediaDecoder.AudioIo]]: WAV/PCM via `javax.sound.sampled` — no
  * external dependency, no audio device needed for parsing); video
  * kernels remain deterministic stand-ins
  * ([[MediaDecoder.Deterministic]]) since no video library ships in
  * this environment. Everything Spark-side is real either way: the
  * schema convention, the mapPartitions batch shape (one decoder
  * instance per partition, reused across rows, the Scala analogue of
  * a pandas-batched UDF), partition sizing by byte budget, and the
  * feature-column contract.
  */
object Multimodal {

  /** Canonical multimodal schema: payload + sidecar metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image|audio|video
    StructField("format", StringType, nullable = true),    // jpeg|wav|mp4...
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true))),
      nullable = true)))

  /** Decoder contract: bytes -> fixed-length feature vector. Real
    * implementations wrap an image/audio codec; instantiated once per
    * partition so model/codec init cost amortizes across the batch. */
  trait MediaDecoder extends Serializable {
    def featureDim: Int
    def decodeToFeatures(format: String, payload: Array[Byte]): Array[Float]
  }

  object MediaDecoder {
    /** Deterministic stand-in: hash-derived pseudo-features. Keeps the
      * full pipeline runnable and testable; swap for a real codec via
      * the same trait. */
    final case class Deterministic(featureDim: Int = 8) extends MediaDecoder {
      def decodeToFeatures(format: String, payload: Array[Byte]): Array[Float] = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val d = md.digest(payload)
        Array.tabulate(featureDim)(i =>
          ((d(i % d.length) & 0xff) / 255.0f))
      }
    }

    /** Real image decode kernel on the JDK's built-in codecs
      * (`javax.imageio`: PNG, BMP, GIF, JPEG — no external library).
      * Features (dim 6): [width, height, mean R, mean G, mean B,
      * fraction of pixels with R+G+B >= 384]. Channel sums accumulate
      * as exact longs and divide once in double, so the features are
      * bit-reproducible across JVMs and re-derivable arithmetically by
      * an oracle that knows the pixel function. Undecodable payloads
      * (truncated file, unknown container) return null rather than
      * throwing — one poison row must not kill a 100 TB scan; count
      * nulls downstream. */
    final case class ImageIo(fallback: Option[MediaDecoder] = None)
        extends MediaDecoder {
      val featureDim: Int = 6
      def decodeToFeatures(format: String, payload: Array[Byte]): Array[Float] = {
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          catch { case _: java.io.IOException => null }
        if (img == null)
          fallback.map(_.decodeToFeatures(format, payload)).orNull
        else {
          val w = img.getWidth; val h = img.getHeight
          var rs = 0L; var gs = 0L; var bs = 0L; var bright = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              rs += r; gs += g; bs += b
              if (r + g + b >= 384) bright += 1
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          Array(w.toFloat, h.toFloat,
            (rs.toDouble / n).toFloat, (gs.toDouble / n).toFloat,
            (bs.toDouble / n).toFloat, (bright.toDouble / n).toFloat)
        }
      }
    }

    /** Real audio decode kernel on the JDK's built-in WAV/PCM parser
      * (`javax.sound.sampled.AudioSystem` — pure container/sample
      * parsing, no audio device). Supports 16-bit signed PCM, any
      * channel count (frames averaged to mono is NOT done — channel 0
      * is analyzed, the common feature-extraction convention).
      * Features (dim 6): [sample rate, n samples, mean |s|, RMS,
      * fraction of non-negative samples, max |s|] — every accumulator
      * is an exact long, divided once in double (sqrt is correctly
      * rounded in IEEE), so features are bit-reproducible and oracle
      * re-derivable when the sample values are known arithmetic.
      * Undecodable payloads return null (or the fallback's features),
      * matching [[ImageIo]]. */
    final case class AudioIo(fallback: Option[MediaDecoder] = None)
        extends MediaDecoder {
      val featureDim: Int = 6
      def decodeToFeatures(format: String, payload: Array[Byte]): Array[Float] = {
        val in =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => null
            case _: java.io.IOException => null
          }
        if (in == null || in.getFormat.getSampleSizeInBits != 16 ||
            in.getFormat.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          fallback.map(_.decodeToFeatures(format, payload)).orNull
        else try {
          val fmt = in.getFormat
          val frameBytes = fmt.getFrameSize
          val bytes = in.readAllBytes()
          val nFrames = bytes.length / frameBytes
          var absSum = 0L; var sqSum = 0L; var nonNeg = 0L; var maxAbs = 0L
          var i = 0
          while (i < nFrames) {
            val off = i * frameBytes // channel 0 of each frame
            val lo = bytes(off) & 0xff
            val hi = bytes(off + 1)
            val s = if (fmt.isBigEndian) ((lo << 8) | (hi & 0xff)).toShort.toInt
                    else ((hi << 8) | lo).toShort.toInt
            val a = math.abs(s.toLong)
            absSum += a; sqSum += s.toLong * s; if (s >= 0) nonNeg += 1
            if (a > maxAbs) maxAbs = a
            i += 1
          }
          if (nFrames == 0)
            fallback.map(_.decodeToFeatures(format, payload)).orNull
          else Array(fmt.getSampleRate, nFrames.toFloat,
            (absSum.toDouble / nFrames).toFloat,
            math.sqrt(sqSum.toDouble / nFrames).toFloat,
            (nonNeg.toDouble / nFrames).toFloat, maxAbs.toFloat)
        } finally in.close()
      }
    }
  }

  /** Decode/feature-extract over partitions: one decoder per partition,
    * rows streamed through it (the batched-UDF shape). Adds
    * `features: array<float>` and `payload_bytes: int`; drops the
    * payload so downstream stages shuffle features, not media bytes. */
  def extractFeatures(df: DataFrame, decoder: Multimodal.MediaDecoder)
      : DataFrame = {
    val outSchema = StructType(
      df.schema.fields.filterNot(_.name == "payload") ++ Seq(
        StructField("payload_bytes", IntegerType),
        StructField("features", ArrayType(FloatType))))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    val formatIdx = df.schema.fieldIndex("format")
    val keepIdx = df.schema.fields.zipWithIndex
      .filterNot(_._1.name == "payload").map(_._2)
    df.mapPartitions { it =>
      // decoder is instantiated per partition via closure capture;
      // heavyweight codec/model init would live here.
      it.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val fmt = r.getAs[String](formatIdx)
        val feats =
          if (payload == null) null
          else decoder.decodeToFeatures(fmt, payload)
        Row.fromSeq(keepIdx.toSeq.map(r.get) ++
          Seq(if (payload == null) null else payload.length,
            if (feats == null) null else feats.toSeq))
      }
    }
  }

  /** Payload->payload kernel contract (resize, re-encode, resample):
    * same per-partition batching as [[MediaDecoder]]. Real kernels
    * wrap an image/audio library; the stub is deterministic. */
  trait MediaTransform extends Serializable {
    def apply(format: String, payload: Array[Byte]): Array[Byte]
  }

  object MediaTransform {
    /** Deterministic stand-in for a resize/downsample: keep every
      * `stride`-th byte up to `maxBytes` (shape-correct, content-fake:
      * output is smaller and a pure function of the input). */
    final case class DownsampleStub(maxBytes: Int, stride: Int = 2)
        extends MediaTransform {
      def apply(format: String, payload: Array[Byte]): Array[Byte] = {
        val out = payload.indices.collect {
          case i if i % stride == 0 => payload(i) }
        out.take(maxBytes).toArray
      }
    }
  }

  /** Resize/re-encode over partitions: payload is replaced in place
    * (schema and metadata untouched), kernel instantiated per
    * partition. The 100 TB contract: media bytes stream through one
    * task each, never shuffled — pair with [[repartitionByBytes]] to
    * bound per-task memory. */
  def transformPayload(df: DataFrame, t: MediaTransform): DataFrame = {
    implicit val enc: Encoder[Row] = Encoders.row(df.schema)
    val payloadIdx = df.schema.fieldIndex("payload")
    val formatIdx = df.schema.fieldIndex("format")
    df.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val out = if (payload == null) null else
          t(r.getAs[String](formatIdx), payload)
        Row.fromSeq(r.toSeq.updated(payloadIdx, out))
      }
    }
  }

  /** Partition a media frame by cumulative byte budget so each task
    * holds ~`targetBytes` of payload — media rows are wildly skewed
    * and default row-count splits OOM on video partitions. */
  def repartitionByBytes(df: DataFrame, targetBytes: Long): DataFrame = {
    val stats = df.select(sum(length(col("payload")))).head()
    val total = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val parts = math.max(1, (total / targetBytes).toInt)
    df.repartition(parts, col("media_id"))
  }

  /** Deterministic synthetic media for fixtures and oracle pinning:
    * real, decodable image bytes whose pixel values are a pure
    * arithmetic function of a seed — so an external oracle (DuckDB)
    * can re-derive the decoded features without any image library. */
  object SyntheticMedia {

    /** Uncompressed 24-bit bottom-up BMP (BITMAPINFOHEADER), the
      * simplest container `javax.imageio` decodes losslessly. `px`
      * maps top-left-origin (x, y) to (r, g, b) in 0..255. */
    def bmp24(w: Int, h: Int)(px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val rowBytes = (w * 3 + 3) / 4 * 4
      val dataSize = rowBytes * h
      val fileSize = 54 + dataSize
      val buf = java.nio.ByteBuffer.allocate(fileSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte).putInt(fileSize)
        .putInt(0).putInt(54)                      // reserved, data offset
      buf.putInt(40).putInt(w).putInt(h)           // info header, +h = bottom-up
        .putShort(1).putShort(24).putInt(0)        // planes, bpp, BI_RGB
        .putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
      var y = h - 1                                // bottom-up row order
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val (r, g, b) = px(x, y)
          buf.put(b.toByte).put(g.toByte).put(r.toByte)
          x += 1
        }
        var pad = rowBytes - w * 3
        while (pad > 0) { buf.put(0.toByte); pad -= 1 }
        y -= 1
      }
      buf.array()
    }

    /** Per-document test image: pixel channels are small linear
      * congruences of (seed, x, y) — trivially re-derivable in SQL via
      * a generate_series cross join. */
    def docBmp(seed: Long, w: Int = 8, h: Int = 8): Array[Byte] = {
      val s = java.lang.Math.floorMod(seed, 256L).toInt
      bmp24(w, h) { (x, y) =>
        ((s * 3 + x * 7 + y * 11) % 256,
         (s * 5 + x * 11 + y * 3) % 256,
         (s * 7 + x * 3 + y * 13) % 256)
      }
    }

    /** Canonical 44-byte-header RIFF/WAVE container around 16-bit
      * signed little-endian mono PCM — the shape `javax.sound.sampled`
      * decodes losslessly. `sample` maps index 0..n-1 to a value in
      * [-32768, 32767]. */
    def wavPcm16(sampleRate: Int, n: Int)(sample: Int => Int): Array[Byte] = {
      val dataSize = n * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
      buf.put("fmt ".getBytes).putInt(16)
        .putShort(1)                      // PCM
        .putShort(1)                      // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2)           // byte rate
        .putShort(2)                      // block align
        .putShort(16)                     // bits/sample
      buf.put("data".getBytes).putInt(dataSize)
      var i = 0
      while (i < n) { buf.putShort(sample(i).toShort); i += 1 }
      buf.array()
    }

    /** Per-document test audio: samples are a linear congruence of
      * (seed, i) mapped onto the full 16-bit range — re-derivable in
      * SQL via generate_series. */
    def docWav(seed: Long, sampleRate: Int = 8000, n: Int = 256)
        : Array[Byte] = {
      val s = java.lang.Math.floorMod(seed, 1009L).toInt
      wavPcm16(sampleRate, n)(i => ((s * 131 + i * 997) % 65536) - 32768)
    }
  }

  /** Deterministic frame sampling for video-like payloads: take every
    * `stride`-th chunk of `chunkBytes` as a pseudo-frame (stub for a
    * real frame extractor; the explode shape is the real contract). */
  def sampleChunks(df: DataFrame, chunkBytes: Int, stride: Int): DataFrame =
    df.withColumn("chunk_idx",
        explode(sequence(lit(0),
          greatest(lit(0),
            (length(col("payload")) / (chunkBytes * stride)).cast("int") - 1))))
      .withColumn("chunk", expr(
        s"substring(payload, chunk_idx * ${chunkBytes * stride} + 1, $chunkBytes)"))
}
