package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payloads + typed metadata structs, with
  * decode/feature-extract as per-partition batch transforms.
  *
  * The decode kernels themselves are STUBBED (no media libraries in
  * this environment — see [[MediaDecoder.Deterministic]]); everything
  * Spark-side is real: the schema convention, the mapPartitions batch
  * shape (one decoder instance per partition, reused across rows, the
  * Scala analogue of a pandas-batched UDF), partition sizing by byte
  * budget, and the feature-column contract.
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
