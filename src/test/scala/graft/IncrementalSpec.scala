package graft

import org.apache.spark.sql.functions._

import graft.maint.{Expire, Merge, Rewrite, RewriteConfig}

/** Incremental append scan (appends-between) + rollback (restore an
  * earlier state as a new commit) — the consume-only-what's-new read and
  * the operator-error escape hatch a continuously-ingesting table needs. */
class IncrementalSpec extends SparkTestBase {

  private def gen(ids: Range, source: String) = {
    import spark.implicits._
    ids.toDF("v").select(
      concat(lit(s"$source-"), col("v")).as("doc_id"),
      array(col("v"), col("v") * 2).cast("array<int>").as("tokens"),
      lit(2).as("n_tok"),
      lit(source).as("source"))
  }

  test("scanAdded returns exactly the appended delta, skipping rewrites") {
    val t = TokenTable.create(tmpDir("graft-inc"), spark) // v0
    t.append(gen(0 until 100, "a"), targetFileCount = 4, nowMs = 1L)  // v1
    t.append(gen(0 until 60, "b"), targetFileCount = 4, nowMs = 2L)   // v2
    // row-neutral rewrite between appends must NOT double-count: its
    // output files contain every row of a and b again
    Rewrite.compact(t, spark,
      RewriteConfig(targetFileBytes = 1L * 1024 * 1024), nowMs = 3L)  // v3
    t.append(gen(0 until 30, "c"), targetFileCount = 2, nowMs = 4L)   // v4

    val (d1, m1) = t.scanAdded(1)
    assert(d1.count() === 90) // b + c only
    assert(d1.select("source").distinct().collect().map(_.getString(0)).sorted
      === Array("b", "c"))
    assert(m1.filesTotal === m1.filesKept)

    // bounded upper version
    val (d2, _) = t.scanAdded(0, Some(2))
    assert(d2.count() === 160) // a + b
    // empty range
    assert(t.scanAdded(2, Some(3))._1.count() === 0) // only the compact
    // stats pruning applies to the delta too — the b-append's manifest is
    // skipped WHOLE (its source rollup cannot match), so fewer candidate
    // files are even considered than the unfiltered delta saw
    val (d3, m3) = t.scanAdded(1, None, Predicate.Eq("source", "c"))
    assert(d3.count() === 30)
    assert(m3.filesTotal < m1.filesTotal)
  }

  test("scanAdded refuses a range straddling a row-changing commit") {
    val t = TokenTable.create(tmpDir("graft-inc2"), spark)
    t.append(gen(0 until 50, "a"), targetFileCount = 2, nowMs = 1L)   // v1
    val changes = gen(0 until 10, "a")
      .withColumn("_op", lit("delete"))
    Merge.run(t, spark, changes, nowMs = 2L)                          // v2 merge
    t.append(gen(0 until 20, "b"), targetFileCount = 2, nowMs = 3L)   // v3
    val e = intercept[IllegalStateException] { t.scanAdded(0) }
    assert(e.getMessage.contains("merge"))
    // a range past the merge still works
    assert(t.scanAdded(2)._1.count() === 20)
  }

  test("rollback restores an earlier state; expire GCs the rolled-over files") {
    val root = tmpDir("graft-rb")
    val t = TokenTable.create(root, spark)                            // v0
    t.append(gen(0 until 100, "a"), targetFileCount = 4, nowMs = 1L)  // v1
    t.append(gen(0 until 40, "b"), targetFileCount = 2, nowMs = 2L)   // v2
    val factsV2 = t.scan()._1.agg(
      count(lit(1)), sum(xxhash64(col("doc_id")).cast("decimal(38,0)")))
      .collect()(0)
    t.append(gen(0 until 25, "c"), targetFileCount = 2, nowMs = 3L)   // v3
    Rewrite.compact(t, spark,
      RewriteConfig(targetFileBytes = 1L * 1024 * 1024), nowMs = 4L)  // v4

    val s = t.rollback(2L, nowMs = 5L)                                // v5
    assert(s.operation === "rollback")
    assert(s.summary("rollback-to") === "2")
    assert(s.summary("rollback-from") === "4")
    // state is byte-identical to v2: same manifest list, same facts
    assert(s.manifestList === t.log.snapshot(2L).manifestList)
    val factsNow = t.scan()._1.agg(
      count(lit(1)), sum(xxhash64(col("doc_id")).cast("decimal(38,0)")))
      .collect()(0)
    assert(factsNow === factsV2)

    // history preserved: the rollback can itself be rolled back
    t.rollback(4L, nowMs = 6L)                                        // v6
    assert(t.describe()("rows").toLong === 165)
    t.rollback(5L, nowMs = 7L)                                        // v7 = v2 state
    assert(t.describe()("rows").toLong === 140)

    // expire keeps only the head; files referenced by the restored state
    // survive (reachability), the rolled-over c/compact files are GC'd
    val before = SnapshotLog_liveParquet(root)
    val rep = Expire.run(t, retain = 1)
    assert(rep.expiredVersions.nonEmpty)
    val after = SnapshotLog_liveParquet(root)
    assert(after < before)
    assert(t.scan()._1.count() === 140) // still readable, exact rows
  }

  test("rollback carries stream markers from the head, not the target") {
    import graft.streaming.StreamOps
    val t = TokenTable.create(tmpDir("graft-rb2"), spark)             // v0
    assert(StreamOps.appendBatch(t, gen(0 until 30, "s"), "st", 0L))  // v1
    assert(StreamOps.appendBatch(t, gen(30 until 50, "s"), "st", 1L)) // v2
    t.rollback(1L, nowMs = 3L)                                        // v3
    // the stream already delivered batch 1 — replaying it into the
    // restored table must stay a no-op (its checkpoint owns progress)
    assert(!StreamOps.appendBatch(t, gen(30 until 50, "s"), "st", 1L))
    assert(t.describe()("rows").toLong === 30)
  }

  private def SnapshotLog_liveParquet(root: String): Int =
    graft.meta.SnapshotLog.walk(java.nio.file.Paths.get(root, "data"))
      .count(p => p.toString.endsWith(".parquet"))
}
