package graft

import org.apache.spark.sql.functions._

import graft.media.Media

/** Multimodal-column plumbing: schema, pruning, batch shape (the codec is
  * a documented deterministic stub — the dataflow around it is real). */
class MediaSpec extends SparkTestBase {

  lazy val df = Media.synth(spark, 2000, 42L).cache()

  test("media generator is deterministic and schema-correct") {
    // compare shape (names + types); expression-derived nullability differs
    def shape(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
      s.fields.map(f =>
        f.name -> f.dataType.sql.replace(" NOT NULL", "")).toSeq
    assert(shape(df.schema) === shape(Media.schema))
    assert(df.count() === 2000)
    val a = Media.synth(spark, 500, 42L)
      .select(md5(col("payload")).as("h")).orderBy("h").collect().map(_.getString(0))
    val b = Media.synth(spark, 500, 42L).repartition(13)
      .select(md5(col("payload")).as("h")).orderBy("h").collect().map(_.getString(0))
    assert(a.toSeq === b.toSeq)
    // images have no duration; video/audio do
    assert(df.filter(col("kind") === "image" && col("meta.duration_ms") =!= 0)
      .count() === 0)
  }

  test("metadata-only plans never read the binary payload (column pruning)") {
    val dir = tmpDir("graft-media") + "/t"
    df.write.parquet(dir)
    val plan = Media.resizePlan(spark.read.parquet(dir), 512, 512)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("payload"), s"payload must be pruned:\n$plan")
  }

  test("resize plan preserves aspect ratio within bounds") {
    val out = Media.resizePlan(df, 512, 512)
      .filter(col("dst_w") > 512 || col("dst_h") > 512).count()
    assert(out === 0)
    // no upscaling
    assert(Media.resizePlan(df, 4000, 4000)
      .filter(col("dst_w") > col("src_w")).count() === 0)
  }

  test("frame sampling yields one row per interval, none for images") {
    val fs = Media.frameSamplePlan(df, everyMs = 10000)
    assert(fs.filter(col("kind") === "image").count() === 0)
    // every sampled ts lies within the duration
    val joined = fs.join(df.select(col("media_id"), col("meta.duration_ms").as("dur")),
      "media_id")
    assert(joined.filter(col("ts_ms") >= col("dur")).count() === 0)
  }

  test("feature extraction runs as typed mapPartitions and is deterministic") {
    import spark.implicits._
    val ds = df.limit(200).as[Media.MediaRow]
    val f1 = Media.extractFeatures(ds).orderBy("media_id").collect()
    val f2 = Media.extractFeatures(ds.repartition(7)).orderBy("media_id").collect()
    assert(f1.length === 200)
    assert(f1.map(_.features.toSeq).toSeq === f2.map(_.features.toSeq).toSeq)
    assert(f1.forall(_.features.length === 8))
  }

  /** Deterministic real PNG bytes: w×h image filled from a hash. */
  private def pngBytes(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 31 + y * 131 + seed) * 2654435761L.toInt & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic real WAV bytes: 16-bit mono PCM square-ish wave. */
  private def wavBytes(nFrames: Int, rateHz: Int, seed: Int): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until nFrames)
      bb.putShort(i * 2, (((i * seed) % 200 - 100) * 300).toShort)
    val fmt = new javax.sound.sampled.AudioFormat(rateHz.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real image decode: JDK ImageIO recovers dims and channel means") {
    import spark.implicits._
    val rows = Seq(
      Media.MediaRow("img-1", "image", pngBytes(17, 9, 7),
        Media.MediaMeta(17, 9, 0, "raw")),
      Media.MediaRow("img-2", "image", pngBytes(32, 32, 99),
        Media.MediaMeta(32, 32, 0, "raw")))
    val out = Media.extractFeatures(spark.createDataset(rows))
      .orderBy("media_id").collect()
    assert(out(0).features(0) === 17.0f) // width
    assert(out(0).features(1) === 9.0f) // height
    assert(out(0).features(7) === 1.0f) // real-image marker
    assert(out(1).features(0) === 32.0f)
    // decode is exact → repeatable across partitionings
    val again = Media.extractFeatures(
      spark.createDataset(rows).repartition(2)).orderBy("media_id").collect()
    assert(out.map(_.features.toSeq).toSeq === again.map(_.features.toSeq).toSeq)
  }

  test("real audio decode: JDK WAV reader recovers duration and rate") {
    import spark.implicits._
    val rows = Seq(Media.MediaRow("aud-1", "audio", wavBytes(8000, 16000, 3),
      Media.MediaMeta(0, 0, 500, "pcm")))
    val out = Media.extractFeatures(spark.createDataset(rows)).collect()
    assert(out(0).features(0) === 500.0f) // 8000 frames @16 kHz = 500 ms
    assert(out(0).features(1) === 16000.0f) // sample rate
    assert(out(0).features(2) === 1.0f) // channels
    assert(out(0).features(7) === 2.0f) // real-audio marker
    assert(out(0).features(3) > 0.0f) // RMS of a non-silent wave
  }

  test("undecodable payloads fall back to the deterministic stub") {
    import spark.implicits._
    val junk = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val rows = Seq(
      Media.MediaRow("x-img", "image", junk, Media.MediaMeta(1, 1, 0, "j2k")),
      Media.MediaRow("x-vid", "video", junk, Media.MediaMeta(1, 1, 9, "av1")))
    val out = Media.extractFeatures(spark.createDataset(rows))
      .orderBy("media_id").collect()
    val stub = new graft.media.StubCodec().decodeToFeatures(junk, 8)
    assert(out(0).features.toSeq === stub.toSeq)
    assert(out(1).features.toSeq === stub.toSeq)
  }
}
