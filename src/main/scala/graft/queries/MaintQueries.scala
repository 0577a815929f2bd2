package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft._
import graft.gen.Synth
import graft.maint.{Expire, Merge, Rewrite, RewriteConfig}

/**
 * Maintenance-engine operators exposed as driver queries (rows-only checks:
 * these exercise the engine's own table format, so no ANSI-SQL oracle
 * exists — correctness is asserted by the scalatest suites instead,
 * SURVEY.md §5.2). Each query builds a self-contained deterministic token
 * table in a fresh temp dir, runs the pass, and returns its metrics as a
 * DataFrame.
 */
object MaintQueries {

  private val rows = 12000L

  private def freshTable(s: SparkSession, tag: String): TokenTable = {
    val root = java.nio.file.Files
      .createTempDirectory(s"graft-q-$tag").toString
    val t = TokenTable.create(root, s)
    t.append(Synth.table(s, rows, 42L, 16, 512), targetFileCount = 48, nowMs = 1L)
    t
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // FFD bin-packing compaction: per-source file counts before/after
    "m01_compact" -> ((s, _) => {
      import s.implicits._
      val t = freshTable(s, "compact")
      val before = t.log.dataFiles(t.log.current().get)
        .groupBy(_.partition.getOrElse("source", "")).view.mapValues(_.size).toMap
      Rewrite.compact(t, s, RewriteConfig(targetFileBytes = 2L * 1024 * 1024,
        sortBy = "docid"), nowMs = 2L)
      val after = t.log.dataFiles(t.log.current().get)
        .groupBy(_.partition.getOrElse("source", ""))
      after.map { case (src, fs) =>
        (src, before.getOrElse(src, 0).toLong, fs.size.toLong,
          fs.map(_.rows).sum)
      }.toSeq.sortBy(_._1)
        .toDF("source", "files_before", "files_after", "rows")
    }),

    // Z-order clustering + stats-pruned scan: the pruning-ratio evidence
    "m02_zorder_prune" -> ((s, _) => {
      import s.implicits._
      val t = freshTable(s, "zorder")
      Rewrite.compact(t, s, RewriteConfig(targetFileBytes = 2L * 1024 * 1024,
        sortBy = "docid"), nowMs = 2L)
      val pred = Predicate.And(Predicate.Eq("source", "web"),
        Predicate.Between("n_tok", 64, 128))
      val mBefore = t.scan(pred)._2
      Rewrite.cluster(t, s, RewriteConfig(targetFileBytes = 256L * 1024,
        sortBy = "zkey"), nowMs = 3L)
      val (df, mAfter) = t.scan(pred)
      Seq((mBefore.filesKept.toLong, mBefore.filesTotal.toLong,
        mAfter.filesKept.toLong, mAfter.filesTotal.toLong,
        df.count()))
        .toDF("kept_before", "total_before", "kept_after", "total_after",
          "rows_matched")
    }),

    // MERGE INTO upsert/delete accounting
    "m03_merge" -> ((s, _) => {
      import s.implicits._
      val t = freshTable(s, "merge")
      val before = t.describe()("rows").toLong
      val changes = Synth.changeSet(s, rows, 42L,
        updates = 400, inserts = 250, deletes = 120, minTok = 16, maxTok = 512)
      Merge.run(t, s, changes, nowMs = 2L)
      val after = t.describe()("rows").toLong
      val snap = t.log.current().get
      Seq((before, after, snap.summary.getOrElse("touched-files", "0").toLong,
        snap.summary.getOrElse("touched-ratio", "0").toDouble))
        .toDF("rows_before", "rows_after", "touched_files", "touched_ratio")
    }),

    // snapshot isolation + expire: version history and reachability GC
    "m04_snapshot_expire" -> ((s, _) => {
      import s.implicits._
      val t = freshTable(s, "expire")
      Rewrite.compact(t, s, RewriteConfig(targetFileBytes = 2L * 1024 * 1024,
        sortBy = "docid"), nowMs = 2L)
      Rewrite.cluster(t, s, RewriteConfig(targetFileBytes = 1L * 1024 * 1024,
        sortBy = "zkey"), nowMs = 3L)
      val versionsBefore = t.log.versions().size.toLong
      val r = Expire.run(t, retain = 1)
      val rowsAfter = t.describe()("rows").toLong
      Seq((versionsBefore, t.log.versions().size.toLong,
        r.deletedDataFiles.size.toLong, r.deletedManifests.size.toLong,
        rowsAfter))
        .toDF("versions_before", "versions_after", "gc_data_files",
          "gc_manifests", "rows")
    }),

    // multimodal pipeline: synth media -> metadata resize + frame-sample +
    // stub-codec feature extraction (payload column pruned on metadata ops)
    "m06_media_pipeline" -> ((s, _) => {
      import s.implicits._
      val m = graft.media.Media.synth(s, 2000, 42L)
      val feats = graft.media.Media.extractFeatures(
        m.as[graft.media.Media.MediaRow])
      val frames = graft.media.Media.frameSamplePlan(m, everyMs = 10000)
      feats.groupBy("kind")
        .agg(count(lit(1)).as("n_media"), sum(col("n_bytes")).as("sum_bytes"))
        .join(frames.groupBy("kind").agg(count(lit(1)).as("n_frames")),
          Seq("kind"), "left")
        .orderBy("kind")
    }),

    // salted two-phase aggregation over the Zipf-hot source key
    "m05_salted_agg" -> ((s, _) => {
      val df = Synth.table(s, rows, 42L, 16, 512)
      Salt.saltedStats(df).orderBy("source")
    }))

  /** queries with no SQL oracle → driver does a rows-only check */
  val oracle: Map[String, String] = Map.empty
}

private object Salt {
  import graft.maint.{Salt => S}
  def saltedStats(df: DataFrame): DataFrame =
    S.aggBySaltedKey(df, "source", salts = 16,
      Map("n_tok" -> "sum", "doc_id" -> "count"))
      .withColumnRenamed("sum_n_tok", "total_tokens")
      .withColumnRenamed("count_doc_id", "n_rows")
}
