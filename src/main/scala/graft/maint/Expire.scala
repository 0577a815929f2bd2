package graft.maint

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.TokenTable
import graft.meta.{ManifestRef, Snapshot}

/**
 * Snapshot retention + reachability GC, and manifest-list rewrite.
 *
 * The reference's bronze layer keeps every ingestion generation forever
 * (append-only with `ingestion_ts` tags, replayability by construction —
 * /root/reference/spark/jobs/bronze/bronze_ingestion_by_year.py:43-48,
 * README.md:63); expiry is the missing maintenance half that makes that
 * model viable at scale. Invariant (SURVEY.md §7.4 item 1): a file is
 * deleted iff it is unreachable from EVERY retained snapshot.
 */
object Expire {

  final case class Report(
      expiredVersions: Seq[Long],
      deletedDataFiles: Seq[String],
      deletedManifests: Seq[String])

  /** Keep the newest `retain` snapshots; GC everything reachable only from
    * the expired ones. Metadata-only — no row data is read. */
  def run(table: TokenTable, retain: Int): Report = {
    require(retain >= 1, "must retain at least the current snapshot")
    val log = table.log
    val versions = log.versions()
    if (versions.size <= retain) return Report(Seq.empty, Seq.empty, Seq.empty)

    val (expired, retained) = versions.splitAt(versions.size - retain)
    val retainedSnaps = retained.map(log.snapshot)
    val expiredSnaps = expired.map(log.snapshot)

    val liveManifests = retainedSnaps.flatMap(_.manifestList.map(_.path)).toSet
    val liveData = retainedSnaps
      .flatMap(s => s.manifestList.flatMap(m => log.readManifest(m).entries))
      .map(_.path).toSet

    val deadManifests = expiredSnaps
      .flatMap(_.manifestList.map(_.path)).distinct
      .filterNot(liveManifests)
    // data files referenced by dead manifests, minus anything still live
    val deadData = deadManifests
      .flatMap(p => log.readManifest(ManifestRef(p, 0, 0, 0)).entries)
      .map(_.path).distinct
      .filterNot(liveData)

    // Deletion order is crash-safe: data first, then manifests, then
    // snapshot files — a crash mid-GC leaves dangling metadata pointing at
    // deleted files only in already-expired snapshots, never in retained.
    deadData.foreach(p => Files.deleteIfExists(log.absolute(p)))
    deadManifests.foreach(p => Files.deleteIfExists(log.absolute(p)))
    expired.foreach { v =>
      Files.deleteIfExists(Paths.get(log.root, "meta", f"v$v%08d.json"))
    }
    // sweep now-empty data subdirs (cosmetic)
    if (Files.isDirectory(log.dataDir)) {
      Files.list(log.dataDir).iterator().asScala.foreach { d =>
        if (Files.isDirectory(d)) {
          Files.walk(d).iterator().asScala.toSeq.reverse
            .filter(Files.isDirectory(_))
            .foreach(dir => if (!Files.list(dir).iterator().hasNext)
              Files.deleteIfExists(dir))
        }
      }
    }
    Report(expired, deadData, deadManifests)
  }

  /**
   * Manifest-list rewrite: coalesce a snapshot's manifests into one
   * manifest per table partition (metadata compaction — keeps planner
   * latency O(partitions), not O(commits), after long append histories).
   * Data files are untouched; the commit swaps only metadata.
   */
  def rewriteManifests(table: TokenTable, nowMs: Long = 0L): Snapshot = {
    val log = table.log
    val snap = log.current().getOrElse(sys.error("empty table"))
    if (snap.manifestList.size <= 1) return snap
    val files = log.dataFiles(snap)
    val grouped = files.groupBy(_.partition.getOrElse("source", ""))
      .toSeq.sortBy(_._1)
    val refs = grouped.map { case (_, fs) =>
      log.writeManifest(fs.sortBy(_.path))
    }
    log.commit() { base =>
      val prev = base.getOrElse(sys.error("no table"))
      require(prev.version == snap.version,
        "concurrent commit during manifest rewrite — rerun against the new snapshot")
      Snapshot(0L, -1L, nowMs, "rewrite_manifests",
        prev.summary.view.filterKeys(_ == "source-dict").toMap ++ Map(
          "manifests-before" -> snap.manifestList.size.toString,
          "manifests-after" -> refs.size.toString),
        prev.schemaDDL, prev.partitionCols, refs)
    }
  }
}
