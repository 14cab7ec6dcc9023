package graft.multimodal

import graft.signal.Signal
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video ride as opaque `binary`
  * payloads with typed metadata; decode / feature-extraction runs as
  * batched partition-local compute (the Scala analog of a Pandas UDF
  * over mapInPandas — same batch shape, same schema contract).
  *
  * The audio path is REAL (PCM WAV codec in graft.signal). The image
  * path is a clearly-marked deterministic STUB: this container has no
  * image libraries, so `StubImageDecoder` fabricates stable features
  * from the bytes; the Spark-side plumbing (schema, batching,
  * partition locality) is identical to what a real decoder needs.
  */
object Multimodal {

  /** Magic-byte sniffing — metadata without decoding. */
  def sniffKind(payloadCol: String): org.apache.spark.sql.Column = {
    val head = hex(expr(s"substring($payloadCol, 1, 4)"))
    when(head.startsWith("52494646"), "audio/wav")      // RIFF
      .when(head.startsWith("89504E47"), "image/png")   // \x89PNG
      .when(head.startsWith("FFD8"), "image/jpeg")
      .when(head.startsWith("00000018") || head.startsWith("00000020"), "video/mp4")
      .otherwise("application/octet-stream")
  }

  /** Typed metadata columns over an opaque payload. */
  def describe(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("byte_len", expr(s"octet_length($payloadCol)").cast("long"))
      .withColumn("kind", sniffKind(payloadCol))
      .withColumn("digest", md5(col(payloadCol)))

  import org.apache.spark.sql.Column

  /** Batched feature extraction: rows stream through mapPartitions in
    * fixed-size batches (the real control knob for model inference —
    * G4's batch-per-video generalized). Output schema: id + featureDim
    * floats.
    */
  def extractFeatures(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      decoder: MediaDecoder,
      batchSize: Int = 32
  ): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("features", ArrayType(FloatType))
    ))
    val rdd = df
      .select(col(idCol).cast("long"), col(payloadCol))
      .rdd
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          val ids = batch.map(_.getLong(0))
          val payloads = batch.map(_.getAs[Array[Byte]](1))
          val feats = decoder.decodeBatch(payloads)
          ids.zip(feats).map { case (id, f) => Row(id, f) }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }
}

/** Batch decode contract (one call per batch, mirrors predict_batch
  * shapes).
  */
trait MediaDecoder extends Serializable {
  def featureDim: Int
  def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]]
}

/** REAL audio features from WAV bytes: duration, rms, zero-crossing
  * rate, peak, band-energy quartiles — deterministic DSP, no models.
  */
object WavFeatureDecoder extends MediaDecoder {
  val featureDim = 8
  def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]] =
    payloads.map { bytes =>
      val (sr, w) = Signal.wavDecode(bytes)
      var e = 0.0; var peak = 0.0; var zc = 0
      var i = 0
      while (i < w.length) {
        e += w(i) * w(i)
        if (math.abs(w(i)) > peak) peak = math.abs(w(i))
        if (i > 0 && w(i) * w(i - 1) < 0) zc += 1
        i += 1
      }
      val n = math.max(1, w.length)
      val q = n / 4
      def bandRms(s: Int, len: Int): Float = {
        var acc = 0.0; var j = s
        val end = math.min(n, s + len)
        while (j < end) { acc += w(j) * w(j); j += 1 }
        math.sqrt(acc / math.max(1, end - s)).toFloat
      }
      Array(
        (w.length.toDouble / sr).toFloat, math.sqrt(e / n).toFloat,
        (zc.toDouble / n).toFloat, peak.toFloat,
        bandRms(0, q), bandRms(q, q), bandRms(2 * q, q), bandRms(3 * q, q)
      )
    }
}

/** STUB image decoder — no image libs in this container. Produces
  * deterministic pseudo-features from a rolling hash of the bytes so
  * plumbing/tests are stable; a production build swaps this for a real
  * JPEG/PNG decode + CNN embedding behind the same trait.
  */
object StubImageDecoder extends MediaDecoder {
  val featureDim = 16
  def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]] =
    payloads.map { bytes =>
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      Array.tabulate(featureDim) { j =>
        val x = h * (2862933555777941757L * (j + 1) + 3037000493L)
        ((x >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
      }
    }
}
