package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Multimodal-column plumbing (SURVEY.md §7.6): treat media as opaque
  * `binary` payloads with typed metadata, processed in per-partition batches.
  *
  * The testdata has no real image/audio bytes, so the payload is the
  * document's UTF-8 bytes and `decodeStub` stands in for the real
  * decoder — but everything Spark-side is the real production shape:
  *  - schema: (doc_id: long, payload: binary) → (doc_id, meta struct);
  *  - execution: `mapPartitions` over a typed Dataset, i.e. the decoder is
  *    invoked once per partition batch with plain JVM arrays — exactly how a
  *    JNI/FFI media decoder (libjpeg, ffmpeg) would be driven, amortizing
  *    per-batch setup over all rows of the partition;
  *  - parallelism: per-file-split partitions; no shuffle before the decode,
  *    one presentation sort after.
  *
  * The stub's "features" are deterministic byte-level functions (length,
  * mod-256 checksum, head byte, frame count at stride 100) so the whole
  * pipeline — including the typed-Dataset round trip — is verified against
  * the DuckDB oracle, not just smoke-tested.
  */
object Multimodal {

  /** Decoded-media metadata — what a real decoder would emit (width/height/
    * duration map onto nBytes/headByte/nFrames here). */
  final case class MediaMeta(doc_id: Long, n_bytes: Int, checksum: Int,
      head_byte: Int, n_frames: Int)

  /** STUB — replace with the real decoder (libjpeg/ffmpeg via JNI/FFI).
    * Deterministic fake: byte-level stats + frame sampling at stride 100.
    * NOTE the oracle computes the same features per CHARACTER (ascii/substr)
    * — equal only because the fixture text is ASCII (asserted true for all
    * SFs); a non-ASCII or empty document would diverge bytes-vs-chars. */
  private def decodeStub(id: Long, payload: Array[Byte]): MediaMeta = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    MediaMeta(
      doc_id = id,
      n_bytes = payload.length,
      checksum = (sum % 256).toInt,
      head_byte = if (payload.nonEmpty) payload(0) & 0xff else -1,
      n_frames = if (payload.isEmpty) 0 else (payload.length - 1) / 100 + 1)
  }

  /** m01 — binary ingest → per-partition batch decode → typed metadata. */
  def m01Decode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // real decoder: acquire codec context once per batch here
        batch.map { case (id, payload) => decodeStub(id, payload) }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Resize result: original size, resized payload stats. */
  final case class Resized(doc_id: Long, n_bytes: Int, resized_bytes: Int,
      resized_checksum: Int)

  /** m03 — media resize: payload → smaller payload, the thumbnail /
    * downsample step of an ingest pipeline. STUB: nearest-neighbor
    * "resize" keeping every `stride`-th byte (a real impl calls
    * libjpeg/libvips scale-on-decode here — same per-partition-batch
    * shape, same contract: binary in, smaller binary out). The output
    * carries deterministic stats of the RESIZED payload so the
    * transformation itself — not just the plumbing — is oracle-checked. */
  def m03Resize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stride = 3
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // real resizer: acquire scaler context once per batch here
        batch.map { case (id, payload) =>
          // stats straight off the strided indices — the resized payload is
          // never materialized (the only per-row allocation is the Resized
          // record; a real resizer would of course allocate its output)
          val n = (payload.length + stride - 1) / stride
          var sum = 0L
          var k = 0
          while (k < n) { sum += payload(k * stride) & 0xff; k += 1 }
          Resized(id, payload.length, n, (sum % 256).toInt)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** One sampled frame of a media payload. */
  final case class Frame(doc_id: Long, frame_no: Int, n_bytes: Int,
      checksum: Int)

  /** m02 — frame sampling: one output row per fixed-stride chunk of the
    * payload (video frame extraction / audio windowing shape: a flatMap
    * that EXPANDS rows, the UDTF pattern). Runs as a typed mapPartitions so
    * a real demuxer would be driven per partition batch; chunk features stay
    * deterministic byte math so the expansion is oracle-checked. */
  def m02Frames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stride = 100
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, payload) =>
          // real demuxer: seek + decode one frame per stride here
          payload.grouped(stride).zipWithIndex.map { case (chunk, i) =>
            var sum = 0L
            var j = 0
            while (j < chunk.length) { sum += chunk(j) & 0xff; j += 1 }
            Frame(id, i, chunk.length, (sum % 256).toInt)
          }
        }
      }
      .toDF()
      .orderBy("doc_id", "frame_no")
  }
}
