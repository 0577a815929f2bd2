package graft

import org.apache.spark.sql.functions._

import graft.maint.Expire
import graft.meta.Snapshot

/** Manifest-level pruning: per-column min/max rollups carried in each
  * ManifestRef let planners skip a manifest WITHOUT opening it — at 10^6
  * manifests the planner must be O(matching manifests), not O(commits). */
class ManifestPruneSpec extends SparkTestBase {

  private def gen(ids: Range, source: String, tokBase: Int) = {
    import spark.implicits._
    ids.toDF("v").select(
      concat(lit(s"$source-"), col("v")).as("doc_id"),
      array(col("v"), col("v")).cast("array<int>").as("tokens"),
      (lit(tokBase) + pmod(col("v"), lit(8))).as("n_tok"),
      lit(source).as("source"))
  }

  test("scan skips whole manifests by rollup; kept files identical to file-level") {
    val t = TokenTable.create(tmpDir("graft-mp"), spark)
    t.append(gen(0 until 50, "a", 10), targetFileCount = 3, nowMs = 1L)
    t.append(gen(0 until 50, "b", 100), targetFileCount = 3, nowMs = 2L)
    t.append(gen(0 until 50, "c", 1000), targetFileCount = 3, nowMs = 3L)

    val (df, m) = t.scan(Predicate.Eq("source", "b"))
    assert(df.count() === 50)
    assert(m.manifestsTotal === 3)
    assert(m.manifestsKept === 1)
    // totals still describe the WHOLE snapshot (from rollup counts)
    assert(m.filesTotal === t.log.dataFiles(t.log.current().get).size)

    // soundness: the kept set equals what pure file-level pruning gives —
    // a rollup may only skip manifests whose every file would be skipped
    val pred = Predicate.Between("n_tok", 100, 107) // source b's range
    val (df2, m2) = t.scan(pred)
    val fileLevel = t.log.dataFiles(t.log.current().get)
      .filter(f => pred.mightMatch(f.stats))
    assert(m2.filesKept === fileLevel.size)
    assert(df2.count() === 50)
    assert(m2.manifestsKept === 1)
  }

  test("rewrite-manifests per-source coalescing keeps rollups prunable") {
    val t = TokenTable.create(tmpDir("graft-mp2"), spark)
    t.append(gen(0 until 30, "a", 10), targetFileCount = 2, nowMs = 1L)
    t.append(gen(0 until 30, "b", 10), targetFileCount = 2, nowMs = 2L)
    t.append(gen(30 until 60, "a", 10), targetFileCount = 2, nowMs = 3L)
    Expire.rewriteManifests(t, nowMs = 4L)
    assert(t.log.current().get.manifestList.size === 2) // one per source
    val (df, m) = t.scan(Predicate.Eq("source", "a"))
    assert(df.count() === 60)
    assert(m.manifestsKept === 1 && m.manifestsTotal === 2)
  }

  test("rollup-less refs (pre-upgrade metadata) are conservatively kept") {
    val t = TokenTable.create(tmpDir("graft-mp3"), spark)
    t.append(gen(0 until 20, "a", 10), targetFileCount = 2, nowMs = 1L)
    t.append(gen(0 until 20, "b", 10), targetFileCount = 2, nowMs = 2L)
    // simulate a snapshot written before rollups existed
    t.log.commit() { base =>
      val prev = base.get
      Snapshot(0L, -1L, 3L, "append", prev.summary, prev.schemaDDL,
        prev.partitionCols, prev.manifestList.map(_.copy(stats = None)))
    }
    val (df, m) = t.scan(Predicate.Eq("source", "a"))
    assert(df.count() === 20)
    assert(m.manifestsKept === m.manifestsTotal) // nothing skipped
    assert(m.filesKept < m.filesTotal) // file-level pruning still works
  }

  test("SQL scans prune manifests through GraftFileIndex") {
    val t = TokenTable.create(tmpDir("graft-mp4"), spark)
    t.append(gen(0 until 40, "a", 10), targetFileCount = 2, nowMs = 1L)
    t.append(gen(0 until 40, "b", 10), targetFileCount = 2, nowMs = 2L)
    graft.sources.GraftSql.register(spark, t, "mp4_view")
    val n = spark.sql("SELECT count(*) FROM mp4_view WHERE source = 'b'")
      .collect()(0).getLong(0)
    assert(n === 40)
  }
}
