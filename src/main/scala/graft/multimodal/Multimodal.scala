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
  * The audio path is REAL (PCM WAV codec in graft.signal) and so is
  * the image path (`ImageIoDecoder`/`ImageIoHalveResize` on the JDK's
  * javax.imageio — PNG/JPEG/BMP/GIF). Only formats the JDK lacks
  * (video containers, webp, ...) fall back to the clearly-marked
  * deterministic stubs, which keep the Spark-side plumbing (schema,
  * batching, partition locality) identical to a real codec's.
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

  /** Frame sampling — the 1→N multimodal generator: each payload row
    * expands to up to `n` frame rows (frame_idx, ts_ms, frame bytes),
    * extracted batch-at-a-time inside the partition (no payload ever
    * crosses a shuffle to be sampled). Output schema:
    * (id long, frame_idx long, ts_ms long, frame binary).
    */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      sampler: FrameSampler,
      n: Int,
      batchSize: Int = 32
  ): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", LongType),
      StructField("ts_ms", LongType),
      StructField("frame", BinaryType)
    ))
    val rdd = df
      .select(col(idCol).cast("long"), col(payloadCol))
      .rdd
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          val ids = batch.map(_.getLong(0))
          val payloads = batch.map(_.getAs[Array[Byte]](1))
          ids.zip(sampler.sampleBatch(payloads, n)).flatMap {
            case (id, frames) =>
              frames.map { case (idx, ts, bytes) =>
                Row(id, idx.toLong, ts, bytes)
              }
          }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Payload transform (resize / transcode shape): binary→binary in
    * partition-local batches; metadata of the result rides as columns.
    */
  def transformPayloads(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      transform: PayloadTransform,
      batchSize: Int = 32
  ): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload_out", BinaryType)
    ))
    val rdd = df
      .select(col(idCol).cast("long"), col(payloadCol))
      .rdd
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          val ids = batch.map(_.getLong(0))
          val outs = transform.transformBatch(batch.map(_.getAs[Array[Byte]](1)))
          ids.zip(outs).map { case (id, b) => Row(id, b) }
        }
      }
    spark
      .createDataFrame(rdd, outSchema)
      .withColumn("out_len", expr("octet_length(payload_out)").cast("long"))
  }

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

  /** The feature function itself, reusable on an already-decoded
    * waveform (the pipeline's classifier hook consumes waveforms, not
    * WAV bytes): [duration_s, rms, zcr, peak, band_rms ×4].
    */
  def featuresOf(sr: Int, w: Array[Double]): Array[Float] = {
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

  def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]] =
    payloads.map { bytes =>
      val (sr, w) = Signal.wavDecode(bytes)
      featuresOf(sr, w)
    }
}

/** Frame-extraction contract: one call per batch; per payload a list
  * of (frame_idx, ts_ms, frame_bytes).
  */
trait FrameSampler extends Serializable {
  def sampleBatch(payloads: Seq[Array[Byte]], n: Int): Seq[Seq[(Int, Long, Array[Byte])]]
}

/** STUB frame sampler — no video codecs in this container. Treats the
  * payload as UTF-8 text and cuts n equal CHAR slices (char-based so
  * the behavior stays expressible as portable SQL for the oracle); a
  * real implementation seeks keyframes in the container behind this
  * same trait. Payloads too short for n frames yield one whole-payload
  * frame.
  */
object StubFrameSampler extends FrameSampler {
  def sampleBatch(payloads: Seq[Array[Byte]], n: Int): Seq[Seq[(Int, Long, Array[Byte])]] =
    payloads.map { bytes =>
      val s = new String(bytes, "UTF-8")
      val flen = s.length / n
      if (flen == 0) Seq((0, 0L, bytes))
      else (0 until n).map { i =>
        (i, i * 1000L, s.substring(i * flen, i * flen + flen).getBytes("UTF-8"))
      }
    }
}

/** REAL container-level video frame sampler: walks the MP4 sample
  * tables ([[VideoMeta.videoTrack]] — stts/stsz/stsc/stco byte
  * arithmetic, no codec) and slices the n sampled frames' CODED bytes
  * straight out of the payload at their stco/stsz-addressed ranges,
  * stamped with their stts decode time in ms. This is exactly what a
  * production keyframe sampler does before handing coded frames to a
  * decoder; pixel decode is the one step this container lacks codecs
  * for (the reference ships audio, not video — extension mandate).
  * Non-MP4 payloads (or tracks without sample tables) fall back to
  * one whole-payload frame so a mixed column keeps flowing.
  */
object Mp4FrameSampler extends FrameSampler {
  def sampleBatch(
      payloads: Seq[Array[Byte]], n: Int): Seq[Seq[(Int, Long, Array[Byte])]] =
    payloads.map { bytes =>
      VideoMeta.videoTrack(bytes) match {
        case Some(t) if t.frames.nonEmpty && t.timescale > 0 =>
          val k = t.frames.length
          (0 until n).map(i => i * k / n).distinct.map { s =>
            val f = t.frames(s)
            val end = f.offset + f.size
            if (f.offset < 0 || end > bytes.length || f.size < 0)
              (f.idx, f.dts * 1000L / t.timescale, Array.emptyByteArray)
            else
              (f.idx, f.dts * 1000L / t.timescale,
                java.util.Arrays.copyOfRange(bytes, f.offset.toInt, end.toInt))
          }
        case _ => Seq((0, 0L, bytes))
      }
    }
}

/** Payload→payload transform contract (resize / transcode shape). */
trait PayloadTransform extends Serializable {
  def transformBatch(payloads: Seq[Array[Byte]]): Seq[Array[Byte]]
}

/** STUB resize — no image libs here. Deterministically downsamples the
  * byte stream to `targetLen` by striding (every production concern a
  * real bilinear resize has — batching, partition locality, binary
  * in/out schema — is exercised; only the pixel math is faked).
  */
final case class StubResize(targetLen: Int) extends PayloadTransform {
  def transformBatch(payloads: Seq[Array[Byte]]): Seq[Array[Byte]] =
    payloads.map { bytes =>
      if (bytes.length <= targetLen) bytes
      else {
        val out = new Array[Byte](targetLen)
        val stride = bytes.length.toDouble / targetLen
        var i = 0
        while (i < targetLen) { out(i) = bytes((i * stride).toInt); i += 1 }
        out
      }
    }
}

/** STUB decoder for formats the JDK cannot decode (ImageIoDecoder
  * falls back here per-payload). Produces deterministic
  * pseudo-features from a rolling hash of the bytes so plumbing/tests
  * are stable; a production build swaps this for a real video/webp
  * decode + embedding behind the same trait.
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
