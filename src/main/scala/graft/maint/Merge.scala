package graft.maint

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft._
import graft.lineage.{LineageLog, LineageRecord}
import graft.meta.{DataFile, Snapshot}

/**
 * MERGE INTO over the token table: upsert/delete a change-set Dataset keyed
 * on doc_id, with touched-file pruning, a sorted-merge (SortMergeJoin) on
 * doc_id, and write amplification limited to files that actually contain
 * matched keys.
 *
 * Semantics preserved from the reference (SURVEY.md §7.5):
 *  - source dedup uses the reference's rank-to-1 pattern
 *    (/root/reference/spark/jobs/silver/drivers.py:57-66) with a total-order
 *    tiebreak (delete beats upsert, then lexicographic payload hash) so ties
 *    are deterministic — the reference's version is tie-nondeterministic,
 *    flagged in SURVEY.md §2.5 W2;
 *  - the commit is a partition-scoped file swap like dynamic partition
 *    overwrite (/root/reference/spark/jobs/silver/meetings.py:19,68-73):
 *    untouched files and manifests carry through byte-identical;
 *  - post-merge doc_id uniqueness is the reference's
 *    expect_column_values_to_be_unique invariant
 *    (/root/reference/spark/jobs/tests/dq_expectations.py:3).
 *
 * Scale/skew design:
 *  - Touched files are found by joining the (metadata-sized) manifest range
 *    index against the source keys — a file is read only if its
 *    [min,max] doc_id window contains at least one source key. On a
 *    doc_id-clustered layout (post compact/zorder) this prunes most of the
 *    table; the benchmark reports the ratio.
 *  - The join itself is an equi-join on unique doc_id: hash-distributed by
 *    construction (doc_id carries an xxhash64 prefix), so per-key skew is
 *    impossible; residual partition-size skew is handled by AQE skew-join
 *    (enabled in the session) and the broadcast path is disabled for the
 *    big join so the planner keeps the sorted-merge shape the north rule
 *    requires.
 *  - groupBy("source")-shaped metric aggregations over the Zipf-hot `web`
 *    key use the salted two-phase pattern (Salt.aggBySaltedKey).
 */
object Merge {

  /** Change-set schema: TokenRow columns + `_op` in {upsert, delete}. */
  val opCol = "_op"

  /** Deterministic source dedup: exactly one action per doc_id.
    * delete < upsert lexicographically — delete wins ties; among upserts the
    * lexicographically-least token fingerprint wins. */
  def dedupSource(src: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col(opCol).asc, xxhash64(col("tokens")).asc, col("n_tok").asc)
    src.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Files whose [min,max] doc_id window can contain any source key.
    * Runs as a broadcast range join: manifests are metadata-sized. */
  def touchedFiles(spark: SparkSession, files: Seq[DataFile],
      sourceKeys: DataFrame): Seq[DataFile] = {
    import spark.implicits._
    val ranges = files.zipWithIndex.map { case (f, i) =>
      val s = f.stats.get("doc_id")
      (i, s.map(_.min).orNull, s.map(_.max).orNull)
    }.toDF("__fid", "__min", "__max")
    val hit = ranges.join(sourceKeys,
        col("__min").isNull || col("__max").isNull ||
          col("doc_id").between(col("__min"), col("__max")),
        "left_semi")
      .select("__fid").as[Int].collect().toSet
    files.zipWithIndex.collect { case (f, i) if hit(i) => f }
  }

  /**
   * Execute the merge against the current snapshot.
   * @param source change-set DataFrame (doc_id, tokens, n_tok, source, _op)
   */
  def run(table: TokenTable, spark: SparkSession, source: DataFrame,
      nowMs: Long = 0L): Snapshot = {
    val snap = table.log.current().getOrElse(sys.error("empty table"))
    val files = table.log.dataFiles(snap)
    val passId = s"merge-v${snap.version}"
    val lin = new LineageLog(table.root)

    val src = dedupSource(source).cache()
    try {
      val keys = src.select("doc_id")
      val touched = touchedFiles(spark, files, keys)

      val done = lin.completed(passId)
      val out = done.get("all") match {
        case Some(rec) => table.log.absolute(rec.filesOut.head)
        case None =>
          val target =
            if (touched.isEmpty)
              spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], TokenRow.schema)
            else spark.read.schema(TokenRow.schema)
              .parquet(touched.map(f => table.log.absolute(f.path).toString): _*)

          // Sorted-merge full-outer on doc_id. Broadcast is suppressed so the
          // planner keeps SortMergeJoin even when one side is small (the
          // north rule names the sorted-merge shape; at 10^12-sequence scale
          // neither side broadcasts anyway).
          val t = target.select(
            col("doc_id").as("t_doc_id"), col("tokens").as("t_tokens"),
            col("n_tok").as("t_n_tok"), col("source").as("t_source"))
          val s = src.select(
            col("doc_id").as("s_doc_id"), col("tokens").as("s_tokens"),
            col("n_tok").as("s_n_tok"), col("source").as("s_source"),
            col(opCol).as("s_op"))
          val merged = t.hint("merge").join(s.hint("merge"),
              col("t_doc_id") === col("s_doc_id"), "full_outer")
            .select(
              // action matrix: matched+delete → drop; matched+upsert →
              // source row; target-only → keep; source-only+upsert →
              // insert; source-only+delete → no-op
              when(col("s_doc_id").isNull, col("t_doc_id"))
                .otherwise(col("s_doc_id")).as("doc_id"),
              when(col("s_doc_id").isNull, col("t_tokens"))
                .otherwise(col("s_tokens")).as("tokens"),
              when(col("s_doc_id").isNull, col("t_n_tok"))
                .otherwise(col("s_n_tok")).as("n_tok"),
              when(col("s_doc_id").isNull, col("t_source"))
                .otherwise(col("s_source")).as("source"),
              col("s_op"))
            .filter(col("s_op").isNull || col("s_op") =!= "delete")
            .filter(col("doc_id").isNotNull)
            .drop("s_op")

          val outDir = table.log.newDataSubdir()
          val bytes = touched.map(_.bytes).sum
          val nOut = math.max(1,
            math.ceil(bytes.toDouble / (128L * 1024 * 1024)).toInt)
          // cache the join output: the range exchange would otherwise run
          // the full-outer SortMergeJoin twice (sampling + shuffle)
          val cached = merged
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            cached
              .repartitionByRange(
                math.max(nOut, spark.sparkContext.defaultParallelism),
                col("source"), col("doc_id"))
              .sortWithinPartitions(col("doc_id"))
              .withColumn("p_source", col("source"))
              .write.partitionBy("p_source").parquet(outDir.toString)
          } finally cached.unpersist(false)
          lin.append(LineageRecord(passId, "merge", "all", "done",
            touched.size, Seq(table.log.relativize(outDir)),
            touched.map(_.rows).sum, bytes, 1))
          outDir
      }

      table.commitRewrite(touched.map(_.path).toSet, Seq(out), nowMs, "merge",
        Map("pass-id" -> passId,
          "touched-files" -> touched.size.toString,
          "touched-ratio" ->
            (if (files.isEmpty) "0"
             else f"${touched.size.toDouble / files.size}%.4f")))
    } finally src.unpersist()
  }
}

/**
 * Salted two-phase aggregation for Zipf-hot grouping keys (the `web`
 * source holds ~45% of all rows — FIXTURES.md §1). Phase 1 aggregates by
 * (key, salt) spreading the hot key over `salts` reducers; phase 2 folds
 * the partials. Works for any algebraic aggregate set.
 */
object Salt {
  def aggBySaltedKey(df: DataFrame, key: String, salts: Int,
      aggs: Map[String, String]): DataFrame = {
    // deterministic salt from the row identity, not rand(): SURVEY.md §7.4
    val salted = df.withColumn("__salt",
      pmod(xxhash64(col("doc_id")), lit(salts)))
    val phase1 = salted.groupBy(col(key), col("__salt"))
      .agg(
        aggs.head match { case (c, f) => partialAgg(f, c).as(s"p_${f}_$c") },
        aggs.tail.map { case (c, f) => partialAgg(f, c).as(s"p_${f}_$c") }.toSeq: _*)
    val finals = aggs.map { case (c, f) =>
      finalAgg(f, s"p_${f}_$c").as(s"${f}_$c") }.toSeq
    phase1.groupBy(col(key)).agg(finals.head, finals.tail: _*)
  }

  private def partialAgg(f: String, c: String) = f match {
    case "count" => count(lit(1))
    case "sum" => sum(col(c))
    case "min" => min(col(c))
    case "max" => max(col(c))
    case other => sys.error(s"unsupported salted agg: $other")
  }
  private def finalAgg(f: String, pc: String) = f match {
    case "count" => sum(col(pc))
    case "sum" => sum(col(pc))
    case "min" => min(col(pc))
    case "max" => max(col(pc))
    case other => sys.error(s"unsupported salted agg: $other")
  }
}
