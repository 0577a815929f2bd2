package graft

import org.apache.spark.sql.functions._

import graft.gen.Synth
import graft.maint.{Rewrite, RewriteConfig}
import graft.sources.GraftSql

/** SQL front door: spark.sql over a graft table must reach manifest
  * pruning (VERDICT r1 "What's missing" #2 / next-step 5). */
class SqlSpec extends SparkTestBase {

  lazy val table: TokenTable = {
    val t = TokenTable.create(tmpDir("graft-sql"), spark)
    t.append(Synth.table(spark, 12000, 42L, 16, 256), targetFileCount = 32, nowMs = 1L)
    Rewrite.cluster(t, spark,
      RewriteConfig(targetFileBytes = 512L * 1024, sortBy = "zkey"), nowMs = 2L)
    t
  }

  test("spark.sql results equal the programmatic scan") {
    val index = GraftSql.register(spark, table, "graft_tokens")
    val viaSql = spark.sql(
      """SELECT source, count(*) AS n, CAST(sum(n_tok) AS BIGINT) AS toks
        |FROM graft_tokens WHERE source = 'code' AND n_tok BETWEEN 32 AND 128
        |GROUP BY source""".stripMargin).collect()
    val viaScan = table.scan()._1
      .filter(col("source") === "code" && col("n_tok").between(32, 128))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("n_tok")).cast("long").as("toks"))
      .collect()
    assert(viaSql.toSeq.map(_.toSeq) === viaScan.toSeq.map(_.toSeq))
    // manifest pruning fired inside SQL planning
    val m = index.lastScan.get
    assert(m.filesKept < m.filesTotal, s"no pruning: $m")
    // and the engine's own stats-pruned scan agrees on the kept count
    val pred = Predicate.And(Predicate.Eq("source", "code"),
      Predicate.Between("n_tok", 32, 128))
    assert(m.filesKept === table.scan(pred)._2.filesKept)
  }

  test("filters are pushed to the parquet scan in the SQL plan") {
    GraftSql.register(spark, table, "graft_tokens")
    val plan = spark.sql(
      "SELECT doc_id FROM graft_tokens WHERE source = 'wiki' AND n_tok > 100")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [EqualTo(source,wiki), GreaterThan(n_tok,100)]"), plan)
    // column pruning: only the projected + filter columns are read
    assert(plan.contains("ReadSchema") && !plan.contains("tokens:"), plan)
  }

  test("snapshot pinning: the view is immutable under later commits") {
    val (df0, _) = GraftSql.toDF(spark, table)
    val before = df0.count()
    table.append(Synth.table(spark, 500, 7L, 16, 64)
      .withColumn("doc_id", concat(lit("zz-"), col("doc_id"))),
      targetFileCount = 2, nowMs = 3L)
    assert(df0.count() === before) // pinned snapshot unaffected
    val (df1, _) = GraftSql.toDF(spark, table)
    assert(df1.count() === before + 500) // fresh handle sees the append
  }

  test("INSERT INTO commits a snapshot; the pinned view serves the pre-insert version") {
    val before = table.describe()("rows").toLong
    val vBefore = table.log.currentVersion().get
    GraftSql.register(spark, table, "graft_ins")
    spark.sql(
      """INSERT INTO graft_ins
        |SELECT concat('ins-', doc_id) AS doc_id, tokens, n_tok, source
        |FROM graft_ins WHERE source = 'code' AND n_tok < 64""".stripMargin)
    val added = spark.sql(
      "SELECT count(*) FROM graft_ins WHERE source = 'code' AND n_tok < 64")
      .head().getLong(0)
    assert(added > 0)
    // a NEW snapshot landed with exactly those rows appended
    assert(table.log.currentVersion().get === vBefore + 1)
    val snap = table.log.current().get
    assert(snap.operation === "sql_insert")
    assert(table.describe()("rows").toLong === before + added)
    // the registered view stays pinned at the pre-insert snapshot
    assert(spark.sql("SELECT count(*) FROM graft_ins").head().getLong(0) === before)
    // a fresh registration sees the inserted rows
    GraftSql.register(spark, table, "graft_ins2")
    assert(spark.sql("SELECT count(*) FROM graft_ins2 WHERE doc_id LIKE 'ins-%'")
      .head().getLong(0) === added)
  }

  test("INSERT OVERWRITE replaces exactly the sources present in the result") {
    GraftSql.register(spark, table, "graft_ovw")
    val othersBefore = table.scan()._1.filter(col("source") =!= "legal").count()
    spark.sql(
      """INSERT OVERWRITE graft_ovw
        |SELECT concat('ovw-', cast(id AS string)) AS doc_id,
        |       array(1, 2, 3) AS tokens, 3 AS n_tok, 'legal' AS source
        |FROM range(100)""".stripMargin)
    val df = table.scan()._1
    assert(df.filter(col("source") === "legal").count() === 100) // replaced
    assert(df.filter(col("source") =!= "legal").count() === othersBefore) // untouched
    assert(table.log.current().get.operation === "replace_partitions")
  }

  test("time travel: a view registered at an old version serves it via spark.sql") {
    // (runs after the pinning test's append — history has >= 2 data versions)
    val versions = table.log.versions()
    val old = versions(versions.size - 2)
    val oldCount = table.scan(version = Some(old))._1.count()
    val curCount = table.scan()._1.count()
    assert(oldCount != curCount, "history must differ for the test to bite")
    GraftSql.register(spark, table, "graft_tokens_asof", Some(old))
    assert(spark.sql("SELECT count(*) FROM graft_tokens_asof")
      .head().getLong(0) === oldCount)
    // current-version view still sees the latest snapshot
    GraftSql.register(spark, table, "graft_tokens_now")
    assert(spark.sql("SELECT count(*) FROM graft_tokens_now")
      .head().getLong(0) === curCount)
  }

  def fp(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
    df.select(xxhash64(col("doc_id"), col("tokens"), col("n_tok"), col("source"))
        .cast("decimal(38,0)").as("h"))
      .agg(sum(col("h"))).collect()(0).getDecimal(0)

  test("DELETE FROM removes exactly the matched rows through a merge commit") {
    val t = TokenTable.create(tmpDir("graft-del"), spark)
    t.append(Synth.table(spark, 6000, 11L, 16, 64), targetFileCount = 8, nowMs = 1L)
    GraftSql.register(spark, t, "graft_del")
    val before = t.describe()("rows").toLong
    val matched = t.scan()._1.filter(pmod(col("n_tok"), lit(5)) === 0).count()
    val keepFp = fp(t.scan()._1.filter(pmod(col("n_tok"), lit(5)) =!= 0))
    assert(matched > 0)
    spark.sql("DELETE FROM graft_del WHERE n_tok % 5 = 0")
    assert(t.log.current().get.operation === "merge")
    assert(t.describe()("rows").toLong === before - matched)
    val after = t.scan()._1
    assert(after.filter(pmod(col("n_tok"), lit(5)) === 0).count() === 0)
    assert(fp(after) === keepFp) // survivors bit-identical
  }

  test("UPDATE applies SET to matched rows; provenance rewrites are rejected") {
    val t = TokenTable.create(tmpDir("graft-upd"), spark)
    t.append(Synth.table(spark, 6000, 12L, 16, 64), targetFileCount = 8, nowMs = 1L)
    GraftSql.register(spark, t, "graft_upd")
    val expected = fp(t.scan()._1.select(
      col("doc_id"),
      when(col("n_tok") < 32, transform(col("tokens"), x => x + 7))
        .otherwise(col("tokens")).as("tokens"),
      col("n_tok"), col("source")))
    assert(t.scan()._1.filter(col("n_tok") < 32).count() > 0)
    spark.sql(
      "UPDATE graft_upd SET tokens = transform(tokens, x -> x + 7) WHERE n_tok < 32")
    assert(t.log.current().get.operation === "merge")
    assert(fp(t.scan()._1) === expected)
    // the merge key and provenance column are not assignable
    val e1 = intercept[Exception](
      spark.sql("UPDATE graft_upd SET source = 'x' WHERE n_tok < 20"))
    assert(e1.getMessage.contains("provenance"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("UPDATE graft_upd SET doc_id = 'x' WHERE n_tok < 20"))
    assert(e2.getMessage.contains("merge key"), e2.getMessage)
  }

  test("MERGE INTO: matched delete/update + not-matched insert in one commit") {
    val t = TokenTable.create(tmpDir("graft-mrg"), spark)
    t.append(Synth.table(spark, 6000, 13L, 16, 64), targetFileCount = 8, nowMs = 1L)
    GraftSql.register(spark, t, "graft_mrg")
    val base = t.scan()._1.cache()
    val slot = pmod(xxhash64(col("doc_id")), lit(10))
    val upd = base.filter(slot === 0).select(col("doc_id"),
      transform(col("tokens"), x => x + 1).as("tokens"),
      col("n_tok"), col("source"), lit(0).as("del"))
    val dels = base.filter(slot === 1).select(col("doc_id"), col("tokens"),
      col("n_tok"), col("source"), lit(1).as("del"))
    val ins = base.filter(slot === 2).limit(200).select(
      concat(lit("new-"), col("doc_id")).as("doc_id"), col("tokens"),
      col("n_tok"), col("source"), lit(0).as("del"))
    upd.unionByName(dels).unionByName(ins).createOrReplaceTempView("m_src")
    // expected post-state, computed independently
    val expected = fp(
      base.filter(slot =!= 1).select(col("doc_id"),
          when(slot === 0, transform(col("tokens"), x => x + 1))
            .otherwise(col("tokens")).as("tokens"),
          col("n_tok"), col("source"))
        .unionByName(ins.drop("del")))
    spark.sql(
      """MERGE INTO graft_mrg t USING m_src s ON t.doc_id = s.doc_id
        |WHEN MATCHED AND s.del = 1 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET tokens = s.tokens, n_tok = s.n_tok
        |WHEN NOT MATCHED THEN INSERT (doc_id, tokens, n_tok, source)
        |  VALUES (s.doc_id, s.tokens, s.n_tok, s.source)""".stripMargin)
    assert(t.log.current().get.operation === "merge")
    assert(fp(t.scan()._1) === expected)
    base.unpersist()
  }

  test("MERGE INTO: star actions and NOT MATCHED BY SOURCE") {
    val t = TokenTable.create(tmpDir("graft-mrg2"), spark)
    t.append(Synth.table(spark, 4000, 14L, 16, 64), targetFileCount = 6, nowMs = 1L)
    GraftSql.register(spark, t, "graft_mrg2")
    val base = t.scan()._1.cache()
    val slot = pmod(xxhash64(col("doc_id")), lit(7))
    // star source: same shape as the table
    base.filter(slot === 0).select(col("doc_id"),
        transform(col("tokens"), x => x + 3).as("tokens"),
        col("n_tok"), col("source"))
      .createOrReplaceTempView("m_src2")
    val expected = fp(base.select(col("doc_id"),
        when(slot === 0, transform(col("tokens"), x => x + 3))
          .otherwise(col("tokens")).as("tokens"),
        col("n_tok"), col("source"))
      .filter(slot === 0 || col("n_tok") >= 32))
    spark.sql(
      """MERGE INTO graft_mrg2 t USING m_src2 s ON t.doc_id = s.doc_id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE AND t.n_tok < 32 THEN DELETE""".stripMargin)
    assert(fp(t.scan()._1) === expected)
    // the merge key stays non-assignable through the MERGE door too
    val e = intercept[Exception](spark.sql(
      """MERGE INTO graft_mrg2 t USING m_src2 s ON t.doc_id = s.doc_id
        |WHEN MATCHED THEN UPDATE SET doc_id = 'x'""".stripMargin))
    assert(e.getMessage.contains("merge key"), e.getMessage)
    base.unpersist()
  }

  test("INSERT by name rejects unknown columns instead of dropping data") {
    // ADVICE r4 #3: a typo'd column name in the by-name path was silently
    // dropped — null-filling the intended column AND discarding the
    // supplied data. Must fail loudly, like the positional count check.
    GraftSql.register(spark, table, "graft_badcol")
    val before = table.describe()("rows").toLong
    val e = intercept[Exception](spark.sql(
      """INSERT INTO graft_badcol (doc_id, tokens, n_tok, sorce)
        |SELECT concat('bad-', doc_id), tokens, n_tok, source
        |FROM graft_badcol WHERE n_tok < 64""".stripMargin))
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e).contains("sorce"), msgs(e))
    assert(table.describe()("rows").toLong === before) // nothing committed
  }
}
