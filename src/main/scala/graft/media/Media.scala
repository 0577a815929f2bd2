package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns: image/audio/video as opaque BINARY payloads with
 * typed metadata, plus the decode / feature-extract / resize / frame-sample
 * operators a training-data pipeline needs.
 *
 * The Spark-side plumbing — schema, partitioning, batch shape, operator
 * signatures — is real and tested; the codec itself is STUBBED with a
 * deterministic fake (this container has no image/audio libraries; see
 * `StubCodec`). Swapping in a real decoder changes one function, not the
 * dataflow.
 *
 * Scala-Spark shape notes:
 *  - metadata ops (resize, frame timestamps) are pure Column expressions —
 *    they never touch the payload, so column pruning keeps the binary out
 *    of the scan entirely (the big win at 100 TB: `.select(meta ops)` reads
 *    KBs of footer-adjacent columns, not the blobs);
 *  - payload ops run via `mapPartitions` over a typed Dataset — the Scala
 *    equivalent of arrow-batched mapInPandas: one JVM-side pass per
 *    partition, no per-row lambda dispatch, codec state reused across the
 *    partition (decoder init happens once per partition, not per row).
 */
object Media {

  val schema: StructType = StructType(Seq(
    StructField("media_id", StringType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", IntegerType),
      StructField("codec", StringType))), nullable = false)))

  /** Deterministic synthetic media table: payload bytes derived from the id
    * hash (pure f(seed,i), no randomness — FIXTURES.md discipline). */
  def synth(s: SparkSession, rows: Long, seed: Long = 42L): DataFrame = {
    val id = col("id")
    val kind = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (pmod(xxhash64(id, lit(seed)), lit(3)) + 1).cast("int"))
    s.range(rows)
      .withColumn("media_id",
        concat(lpad(lower(hex(xxhash64(id, lit(seed + 1)))), 16, "0"), lit("-"), id))
      .withColumn("kind", kind)
      // payload: 64–2048 hash-derived bytes; unhex of repeated hex keeps it
      // a pure Column expression (no UDF in the generator)
      .withColumn("payload", unhex(repeat(
        lpad(lower(hex(xxhash64(id, lit(seed + 2)))), 16, "0"),
        (pmod(xxhash64(id, lit(seed + 3)), lit(125)) + 4).cast("int"))))
      .withColumn("meta", struct(
        (pmod(xxhash64(id, lit(seed + 4)), lit(1920)) + 64).cast("int").as("width"),
        (pmod(xxhash64(id, lit(seed + 5)), lit(1080)) + 64).cast("int").as("height"),
        when(kind === "image", lit(0))
          .otherwise((pmod(xxhash64(id, lit(seed + 6)), lit(600000)) + 1000).cast("int"))
          .as("duration_ms"),
        element_at(array(lit("raw"), lit("j2k"), lit("opus"), lit("av1")),
          (pmod(xxhash64(id, lit(seed + 7)), lit(4)) + 1).cast("int")).as("codec")))
      .select("media_id", "kind", "payload", "meta")
  }

  /** Metadata-only resize plan: recompute target dims to fit a bounding box,
    * preserving aspect ratio — pure INTEGER Column math (exact, so an
    * external SQL oracle replays it bit-identically; no float rounding),
    * payload never read. */
  def resizePlan(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("meta.width").cast("long")
    val h = col("meta.height").cast("long")
    // fits → unchanged; else the binding side pins to the box and the other
    // scales by the exact rational floor(x * bound / binding)
    val dstW = when(w <= maxW && h <= maxH, w)
      .when(w * maxH <= h * maxW, floor(w * lit(maxH.toLong) / h)) // height binds
      .otherwise(lit(maxW.toLong))
    val dstH = when(w <= maxW && h <= maxH, h)
      .when(w * maxH <= h * maxW, lit(maxH.toLong))
      .otherwise(floor(h * lit(maxW.toLong) / w)) // width binds
    df.select(col("media_id"), col("kind"),
      col("meta.width").as("src_w"), col("meta.height").as("src_h"),
      dstW.cast("int").as("dst_w"), dstH.cast("int").as("dst_h"))
  }

  /** Frame-sample plan for video/audio: one row per sampled timestamp —
    * explode over a sequence Column, metadata only. */
  def frameSamplePlan(df: DataFrame, everyMs: Int): DataFrame = {
    df.filter(col("kind").isin("video", "audio"))
      .select(col("media_id"), col("kind"), col("meta.duration_ms").as("dur"),
        explode(sequence(lit(0),
          greatest((col("meta.duration_ms") / everyMs).cast("int") - 1, lit(0))))
          .as("frame_idx"))
      .withColumn("ts_ms", col("frame_idx") * everyMs)
      .drop("dur")
  }

  final case class MediaRow(media_id: String, kind: String,
      payload: Array[Byte], meta: MediaMeta)
  final case class MediaMeta(width: Int, height: Int,
      duration_ms: Int, codec: String)
  final case class Features(media_id: String, kind: String,
      n_bytes: Int, features: Array[Float])

  /**
   * Payload feature extraction: typed mapPartitions (the Scala analog of
   * arrow-batched mapInPandas — per-partition batch loop, decoder
   * initialized once per partition). The decode itself is `StubCodec`.
   */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[Features] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val codec = new StubCodec() // per-partition init, reused across rows
      rows.map { r =>
        val f = codec.decodeToFeatures(r.payload, dims = 8)
        Features(r.media_id, r.kind, r.payload.length, f)
      }
    }
  }
}

/**
 * STUB decoder — deterministic fake standing in for a real image/audio
 * codec (none available in this container). Produces stable
 * pseudo-features from the payload bytes so the pipeline around it is
 * fully testable; a real implementation would replace `decodeToFeatures`
 * only.
 */
final class StubCodec {
  def decodeToFeatures(payload: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var h = 1125899906842597L // deterministic FNV-ish fold
    var i = 0
    while (i < payload.length) {
      h = h * 31 + payload(i)
      i += 1
      out(i % dims) += ((h >>> 32).toInt % 1000) / 1000.0f
    }
    out
  }
}
