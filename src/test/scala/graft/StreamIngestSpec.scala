package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.maint.{Expire, Rewrite, RewriteConfig}
import graft.streaming.StreamOps

/** Streaming ingestion: exactly-once micro-batch appends into the token
  * table (idempotent foreachBatch keyed by `stream-batch-<id>` snapshot
  * markers). */
class StreamIngestSpec extends SparkTestBase {

  private def batchDF(ids: Range) = {
    import spark.implicits._
    ids.toDF("v").select(
      concat(lit("st-"), col("v")).as("doc_id"),
      array(col("v"), col("v") + 1).cast("array<int>").as("tokens"),
      lit(2).as("n_tok"),
      lit("stream").as("source"))
  }

  test("appendBatch is idempotent per batch id, across maintenance commits") {
    val t = TokenTable.create(tmpDir("graft-ingest"), spark)
    assert(StreamOps.appendBatch(t, batchDF(0 until 100), "s1", 0L))
    assert(t.describe()("rows").toLong === 100)
    // crash-replay of the same batch id: no-op, no duplicate rows
    assert(!StreamOps.appendBatch(t, batchDF(0 until 100), "s1", 0L))
    assert(t.describe()("rows").toLong === 100)
    // next batch lands
    assert(StreamOps.appendBatch(t, batchDF(100 until 150), "s1", 1L))
    assert(t.describe()("rows").toLong === 150)
    // marker survives an interleaved maintenance commit (carried forward)
    Rewrite.compact(t, spark,
      RewriteConfig(targetFileBytes = 1L * 1024 * 1024), nowMs = 9L)
    assert(!StreamOps.appendBatch(t, batchDF(100 until 150), "s1", 1L))
    assert(t.describe()("rows").toLong === 150)
    // an independent stream id has its own sequence
    assert(StreamOps.appendBatch(t, batchDF(150 until 160)
      .withColumn("source", lit("stream2")), "s2", 0L))
    assert(t.describe()("rows").toLong === 160)
    // rows are exactly the union of the committed batches
    assert(t.scan()._1.select("doc_id").distinct().count() === 160)
  }

  test("markers survive rewrite-manifests and expire — replay stays a no-op") {
    // VERDICT r4 confirmed bug: Expire.rewriteManifests rebuilt the
    // snapshot summary carrying only `source-dict`, dropping the
    // stream-batch-* exactly-once markers — a stream replay after routine
    // metadata compaction double-appended. This test fails on that code.
    val t = TokenTable.create(tmpDir("graft-ingest3"), spark)
    assert(StreamOps.appendBatch(t, batchDF(0 until 80), "s1", 0L))
    assert(StreamOps.appendBatch(t, batchDF(80 until 120), "s1", 1L))
    assert(t.log.current().get.manifestList.size > 1)
    Expire.rewriteManifests(t, nowMs = 5L)
    assert(t.log.current().get.operation === "rewrite_manifests")
    assert(!StreamOps.appendBatch(t, batchDF(80 until 120), "s1", 1L))
    assert(t.describe()("rows").toLong === 120)
    // ...and across snapshot expiry (the retained head keeps its summary)
    Expire.run(t, retain = 1)
    assert(!StreamOps.appendBatch(t, batchDF(80 until 120), "s1", 1L))
    assert(!StreamOps.appendBatch(t, batchDF(0 until 80), "s1", 0L))
    assert(t.describe()("rows").toLong === 120)
    // the sequence is still open: the next batch id lands exactly once
    assert(StreamOps.appendBatch(t, batchDF(120 until 130), "s1", 2L))
    assert(t.describe()("rows").toLong === 130)
    assert(t.scan()._1.select("doc_id").distinct().count() === 130)
  }

  test("appendStream commits one snapshot per micro-batch through a real query") {
    val t = TokenTable.create(tmpDir("graft-ingest2"), spark)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Int]
    val stream = ms.toDF().select(
      concat(lit("st-"), col("value")).as("doc_id"),
      array(col("value"), col("value") + 1).cast("array<int>").as("tokens"),
      lit(2).as("n_tok"),
      lit("stream").as("source"))
    val ckpt = tmpDir("graft-ingest2-ckpt")
    val q = StreamOps.appendStream(t, stream, "mem", ckpt)
    try {
      ms.addData(1 to 500: _*)
      q.processAllAvailable()
      assert(t.describe()("rows").toLong === 500)
      assert(t.log.current().get.operation === "stream_append")
      val v1 = t.log.currentVersion().get
      ms.addData(501 to 600: _*)
      q.processAllAvailable()
      assert(t.describe()("rows").toLong === 600)
      assert(t.log.currentVersion().get === v1 + 1) // one snapshot per batch
      assert(t.log.current().get.summary("stream-batch-mem") === "1")
    } finally q.stop()
  }
}
