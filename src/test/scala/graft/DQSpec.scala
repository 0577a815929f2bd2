package graft

import org.apache.spark.sql.functions._

import graft.dq.DQ
import graft.gen.Synth
import graft.maint.{Merge, Salt}

/** DQ-gate suite mirroring the reference's expectation classes
  * (SURVEY.md §2.11) plus the salted-aggregation equivalence proof. */
class DQSpec extends SparkTestBase {

  test("DQ gate passes on a healthy table and persists the audit record") {
    val root = tmpDir("graft-dq")
    val t = TokenTable.create(root, spark)
    t.append(Synth.table(spark, 5000, 42L, 16, 128), targetFileCount = 10, nowMs = 1L)
    val r = DQ.gate(t, spark)
    assert(r.passed)
    assert(r.checks("row_count") === 5000L)
    val recs = new graft.lineage.LineageLog(root).records("dq-v1")
    assert(recs.exists(_.status == "done"))
  }

  test("DQ gate fails on violated invariants and still writes the audit row") {
    val root = tmpDir("graft-dq-bad")
    val t = TokenTable.create(root, spark)
    // corrupt: duplicate keys + n_tok mismatch
    val good = Synth.table(spark, 100, 42L, 16, 64)
    val bad = good.limit(10)
      .withColumn("n_tok", col("n_tok") + 1) // size(tokens) != n_tok
    t.append(good.unionByName(bad), targetFileCount = 4, nowMs = 1L)
    val e = intercept[IllegalStateException] { DQ.gate(t, spark) }
    assert(e.getMessage.contains("DQ FAILED"))
    val recs = new graft.lineage.LineageLog(root).records("dq-v1")
    assert(recs.exists(_.status == "failed"))
  }

  test("salted two-phase aggregation equals the direct groupBy") {
    val df = Synth.table(spark, 20000, 42L, 16, 128).cache()
    try {
      val direct = df.groupBy("source")
        .agg(sum(col("n_tok")).as("total_tokens"), count(lit(1)).as("n_rows"))
        .orderBy("source").collect()
      val salted = Salt.aggBySaltedKey(df, "source", salts = 16,
          Map("n_tok" -> "sum", "doc_id" -> "count"))
        .withColumnRenamed("sum_n_tok", "total_tokens")
        .withColumnRenamed("count_doc_id", "n_rows")
        .orderBy("source").collect()
      assert(direct.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
        salted.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    } finally df.unpersist()
  }

  test("merge source dedup is deterministic: delete beats upsert on ties") {
    import spark.implicits._
    val src = Seq(
      ("k1", Array(1, 2), 2, "web", "upsert"),
      ("k1", Array(3, 4), 2, "web", "delete"),
      ("k2", Array(5), 1, "web", "upsert"))
      .toDF("doc_id", "tokens", "n_tok", "source", "_op")
    val out = Merge.dedupSource(src).orderBy("doc_id").collect()
    assert(out.length === 2)
    assert(out(0).getAs[String]("_op") === "delete")
    assert(out(1).getAs[String]("_op") === "upsert")
  }
}
