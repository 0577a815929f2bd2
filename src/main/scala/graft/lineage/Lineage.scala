package graft.lineage

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

import graft.meta.Json

/**
 * Per-partition lineage log — the engine's resumable checkpoint.
 *
 * Mirrors the reference's two lineage mechanisms in one structure: the
 * uniform per-row lineage columns (run_ts/request_id,
 * /root/reference/spark/jobs/silver/meetings.py:55-57) and the append-only
 * dq.dq_runs audit ledger (/root/reference/spark/jobs/tests/dq_runner.py:36-51)
 * — but kept OUT of the data rows (token files stay pure) and keyed by
 * (pass_id, unit) where unit is a partition or bin.
 *
 * Protocol (SURVEY.md §7.4 item 5): each work unit writes its data files
 * first, then appends a `done` record naming them; the snapshot commit
 * happens ONCE at pass end from the union of done records. A killed pass
 * re-runs with the same deterministic pass_id, skips every unit with a
 * `done` record (reusing its staged files), and reaches the same single
 * commit — no duplicates, no partial snapshots.
 */
final case class LineageRecord(
    passId: String,
    kind: String, // compact | zorder | merge | expire | rewrite_manifests
    unit: String, // partition value or bin id
    status: String, // done | failed
    filesIn: Int,
    filesOut: Seq[String], // root-relative staged output files
    rows: Long,
    bytes: Long,
    attempt: Int)

final class LineageLog(root: String) {
  private val dir: Path = Paths.get(root, "meta", "lineage")

  private def logPath(passId: String): Path = dir.resolve(s"$passId.jsonl")

  /** Append one record (single atomic O_APPEND write of one line).
    * Synchronized: partition units may complete concurrently. */
  def append(r: LineageRecord): Unit = synchronized {
    Files.createDirectories(dir)
    Files.writeString(logPath(r.passId), Json.write(r) + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Touch the pass log's mtime — called at every unit START so a pass
    * grinding through many units keeps renewing its `prune` grace window
    * (ADVICE r3 #4: a pass stalled longer than the grace on its units
    * while a concurrent commit advanced the table could otherwise have
    * its log pruned and its staged dirs swept mid-flight). A single unit
    * longer than the grace period remains out of scope — grace defaults
    * to 24 h against units sized in GBs. */
  def heartbeat(passId: String): Unit = synchronized {
    val p = logPath(passId)
    if (Files.exists(p))
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
  }

  /** All records of a pass; tolerates a torn trailing line from a crash. */
  def records(passId: String): Seq[LineageRecord] = {
    val p = logPath(passId)
    if (!Files.exists(p)) return Seq.empty
    Files.readAllLines(p).asScala.toSeq.flatMap { line =>
      try Some(Json.read[LineageRecord](line))
      catch { case _: Throwable => None } // torn write → unit simply re-runs
    }
  }

  /** unit -> completed record (latest attempt wins). */
  def completed(passId: String): Map[String, LineageRecord] =
    records(passId).filter(_.status == "done")
      .groupBy(_.unit).map { case (u, rs) => u -> rs.maxBy(_.attempt) }

  def passes(): Seq[String] =
    graft.meta.SnapshotLog.listNames(dir).filter(_.endsWith(".jsonl"))
      .map(_.stripSuffix(".jsonl")).sorted

  /** Root-relative staged output dirs of every in-flight pass — referenced
    * by lineage but possibly not yet committed; the orphan sweep must not
    * delete them. */
  def stagedDirs(): Set[String] =
    passes().flatMap(records).flatMap(_.filesOut).toSet

  /** Base snapshot version encoded in a pass id ("compact-v12",
    * "merge-v5-<fp>", ...). */
  def baseVersionOf(passId: String): Option[Long] =
    LineageLog.BaseV.findFirstMatchIn(passId).map(_.group(1).toLong)

  /**
   * GC lineage logs that can never drive a resume (ADVICE r2 #3: without
   * this, staged output of abandoned passes is protected forever and the
   * orphan classes the sweep exists for still accumulate unbounded).
   *
   * A pass resumes only under its original pass id, which is derived from
   * the CURRENT snapshot version at (re)invocation — so a log whose base
   * version is behind `currentVersion` belongs to a pass that either
   * already committed (its output is live and stays protected via the
   * manifests) or was abandoned (its staged dirs become sweepable once the
   * log is gone). Logs younger than `cutoffMs` (mtime) are kept: an
   * in-flight pass racing a concurrent commit may briefly run with an
   * older base and must keep its crash-resume record. Returns pruned ids.
   */
  def prune(currentVersion: Long, cutoffMs: Long): Seq[String] =
    passes().filter { id =>
      baseVersionOf(id).exists(_ < currentVersion) && {
        val p = logPath(id)
        Files.exists(p) && Files.getLastModifiedTime(p).toMillis <= cutoffMs
      }
    }.map { id => Files.deleteIfExists(logPath(id)); id }
}

object LineageLog {
  private val BaseV = "-v(\\d+)(?:-|$)".r
}
