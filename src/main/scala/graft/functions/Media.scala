package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star): image/audio/video as opaque
  * BINARY columns + typed metadata, with decode / feature-extraction /
  * resize / frame-sampling as per-partition batch transforms.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container): [[decodeStub]] produces deterministic fake features from the
  * bytes. Everything around it — the schema contract, the
  * `mapPartitions` batch shape (one JVM-side batch per partition, the Scala
  * analog of Arrow-batched pandas UDFs), partition sizing — is real and
  * unit-tested, so swapping in a real codec is a one-function change.
  */
object Media {

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                      width: Int, height: Int, duration_ms: Long)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType), StructField("kind", StringType),
    StructField("bytes", BinaryType), StructField("width", IntegerType),
    StructField("height", IntegerType), StructField("duration_ms", LongType)))

  /** STUB decode: a real implementation would decode the image/audio frame
    * here; this derives a deterministic d-dim float vector from the bytes
    * (stable across JVMs — pure integer mixing). */
  def decodeStub(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var k = 0
    while (k < dim) {
      var z = h + k * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = z ^ (z >>> 31)
      out(k) = ((z & 0xFFFF).toFloat / 65535.0f) * 2.0f - 1.0f
      k += 1
    }
    out
  }

  /** Feature extraction over a media Dataset: per-partition batches (the
    * decode amortizes any per-batch codec init across the partition). */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition codec init would go here
      rows.map(r => MediaFeatures(r.media_id, r.kind, r.bytes.length,
        decodeStub(r.bytes, dim)))
    }
  }

  /** Resize stub: a real implementation decodes + resamples pixels; this
    * deterministically folds the byte payload into a w×h "thumbnail" grid
    * (averaged byte buckets), preserving the batch/schema contract. */
  def resizeStub(ds: Dataset[MediaRow], w: Int, h: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val n = math.max(1, r.bytes.length / (w * h))
        val thumb = Array.tabulate(w * h) { i =>
          val from = i * n
          val until = math.min(r.bytes.length, from + n)
          if (from >= r.bytes.length) 0
          else {
            var s = 0; var j = from
            while (j < until) { s += r.bytes(j) & 0xFF; j += 1 }
            s / math.max(1, until - from)
          }
        }
        (r.media_id, w, h, thumb)
      }
    }.toDF("media_id", "out_w", "out_h", "thumb")
  }

  /** Frame sampling stub: every nth "frame" of a video payload, modeled as
    * fixed-size byte windows (a real impl would seek keyframes). */
  def sampleFrames(ds: Dataset[MediaRow], frameBytes: Int, everyNth: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val nFrames = r.bytes.length / math.max(frameBytes, 1)
      (0 until nFrames by math.max(everyNth, 1)).map { f =>
        (r.media_id, f, r.bytes.slice(f * frameBytes, (f + 1) * frameBytes))
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }

  /** Synthesize a deterministic media table (test/demo helper). */
  def synthesize(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val bytes = Array.tabulate[Byte](64 + (i % 64).toInt)(j => ((i * 131 + j * 7) % 251).toByte)
      MediaRow(i, if (i % 3 == 0) "image" else if (i % 3 == 1) "audio" else "video",
        bytes, 64, 48, 1000L * (i % 10))
    }
  }
}
