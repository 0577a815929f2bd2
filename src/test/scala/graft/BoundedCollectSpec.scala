package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BoundedCollect
import graft.queries.TextOps

/** BoundedCollectList: the cap-guarded collect_list backing the d02
  * rare-shingle posting lists. The cap is a 100-TB skew guard — a hot
  * key's aggregation buffer stays O(cap) — and `df <= cap-1` alongside
  * a same-pass count(*) proves kept lists are complete. */
class BoundedCollectSpec extends SparkTestBase {
  import spark.implicits._

  test("caps hot groups, keeps small groups complete, count stays exact") {
    // key "hot" has 10_000 members spread over many partitions (forces
    // the partial-aggregate serialize/merge path); "cold" keys have 2-5
    val rows = (0 until 10000).map(i => ("hot", s"v$i")) ++
      (0 until 40).map(i => (s"cold${i % 10}", s"w$i"))
    val df = rows.toDF("k", "v").repartition(8)
    val out = df.groupBy("k")
      .agg(BoundedCollect.list(col("v"), 21).as("vs"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[String](1).toSet, r.getLong(2)))).toMap
    val (hotVs, hotN) = out("hot")
    assert(hotN === 10000L, "count must be exact, not capped")
    assert(hotVs.size === 21, s"hot buffer must cap at 21: ${hotVs.size}")
    (0 until 10).foreach { i =>
      val (vs, n) = out(s"cold$i")
      assert(n === 4L)
      assert(vs.size === 4, s"under-cap group must be complete: $vs")
    }
  }

  test("struct elements survive the partial-aggregate round trip") {
    val rows = (0 until 2000).map(i => (s"g${i % 3}", s"id$i", i.toLong))
    val df = rows.toDF("g", "s", "l").repartition(8)
    val out = df.groupBy("g")
      .agg(BoundedCollect.list(struct(col("s"), col("l")), 1000).as("xs"))
      .select(col("g"), explode(col("xs")).as("x"))
      .select(col("g"), col("x.s"), col("x.l"))
      .as[(String, String, Long)].collect().toSet
    assert(out === rows.map(t => (t._1, t._2, t._3)).toSet)
  }

  /** round-3 d02 formulation (df-join + aliased self-join) kept as the
    * semantic reference the bounded-list rewrite must match. */
  private def referenceJaccard(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val bigrams = array_distinct(
      transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
    val d = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), bigrams.as("sh"))
      .withColumn("nsh", size(col("sh")).cast("long"))
    val posts = d.select(col("doc_id"), col("nsh"), col("lang"),
        explode(col("sh")).as("g"))
      .select(col("doc_id"), col("nsh"), col("lang"),
        xxhash64(col("g")).as("gh"))
    val rare = posts.groupBy("gh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 20 && col("df") >= 2)
    val p = posts.join(rare, "gh")
    val a = p.select(col("gh"), col("lang"),
      col("doc_id").as("a"), col("nsh").as("na"))
    val b = p.select(col("gh").as("gh_b"), col("lang").as("lang_b"),
      col("doc_id").as("b"), col("nsh").as("nb"))
    a.join(b, col("gh") === col("gh_b") && col("lang") === col("lang_b") &&
        col("a") < col("b"))
      .groupBy("a", "b", "na", "nb")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jacc",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jacc") >= 0.002)
      .select(col("a"), col("b"), col("jacc"))
      .orderBy(desc("jacc"), asc("a"), asc("b"))
      .limit(100)
  }

  test("d02 bounded-list formulation == df-join/self-join reference") {
    // corpus: overlapping word windows (cross-lang rare shingles), a
    // boilerplate bigram in EVERY doc (df >> 20 → must be dropped by
    // both formulations without blowup), and exact near-dups
    val words = (0 until 60).map(i => s"w$i")
    val docs = (0 until 120).map { i =>
      val lang = if (i % 3 == 0) "es" else "en"
      val start = i % 40
      val body = (start until math.min(start + 12, 60)).map(words).mkString(" ")
      (f"doc$i%03d", lang, s"common boilerplate $body")
    } ++ Seq(
      ("dup_a", "en", "common boilerplate " + words.take(12).mkString(" ")),
      ("dup_b", "en", "common boilerplate " + words.take(12).mkString(" ")))
    val dir = tmpDir("d02eq")
    docs.toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = TextOps.queries("d02_dedup_ngram_jaccard")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1),
        math.round(r.getDouble(2) * 1e9)))
    val want = referenceJaccard(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1),
        math.round(r.getDouble(2) * 1e9)))
    assert(got.nonEmpty, "equivalence corpus produced no pairs")
    assert(got.toSeq === want.toSeq)
  }
}
