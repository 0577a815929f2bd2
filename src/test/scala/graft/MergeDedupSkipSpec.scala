package graft

import org.apache.spark.sql.functions._

import graft.gen.Synth
import graft.maint.Merge

/** `Merge.run(sourceKeysUnique = true)` (the round-6 dedup-window skip
  * for SQL DELETE/UPDATE change-sets) must not corrupt a merge when the
  * claimed uniqueness is false: the small-path planning collect detects
  * duplicate keys for free and falls back to the dedup window, so the
  * result is identical to the default path. */
class MergeDedupSkipSpec extends SparkTestBase {
  import spark.implicits._

  private def freshTable(tag: String): TokenTable = {
    val t = TokenTable.create(tmpDir(s"graft-dedupskip-$tag"), spark)
    t.append(Synth.table(spark, 2000, seed = 7L, minTok = 8, maxTok = 32),
      targetFileCount = 8, nowMs = 1L)
    t
  }

  private def facts(t: TokenTable) =
    t.scan()._1
      .select(col("doc_id"), xxhash64(col("tokens")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq

  test("unique-keyed change-set: skip path equals dedup path") {
    val a = freshTable("uniq-skip")
    val b = freshTable("uniq-dedup")
    def changes(t: TokenTable) = t.scan()._1
      .filter(pmod(xxhash64(col("doc_id")), lit(5)) === 0)
      .withColumn("tokens", transform(col("tokens"), x => x + 1))
      .withColumn("_op", lit("upsert"))
    Merge.run(a, spark, changes(a), nowMs = 2L, sourceKeysUnique = true)
    Merge.run(b, spark, changes(b), nowMs = 2L)
    assert(facts(a) == facts(b))
  }

  test("false uniqueness claim: duplicate keys detected, dedup fallback") {
    val a = freshTable("dup-skip")
    val b = freshTable("dup-dedup")
    // two conflicting upserts for every selected key — dedupSource's
    // deterministic tiebreak (least token fingerprint) must decide on
    // BOTH paths, and the post-merge table must stay key-unique
    def dupChanges(t: TokenTable) = {
      val base = t.scan()._1
        .filter(pmod(xxhash64(col("doc_id")), lit(7)) === 0)
      val v1 = base.withColumn("tokens", transform(col("tokens"), x => x + 1))
      val v2 = base.withColumn("tokens", transform(col("tokens"), x => x + 2))
      v1.unionByName(v2).withColumn("_op", lit("upsert"))
    }
    Merge.run(a, spark, dupChanges(a), nowMs = 2L, sourceKeysUnique = true)
    Merge.run(b, spark, dupChanges(b), nowMs = 2L)
    val fa = facts(a)
    assert(fa == facts(b))
    assert(fa.map(_._1).distinct.size == fa.size, "doc_id uniqueness lost")
  }
}
