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
}
