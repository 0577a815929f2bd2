package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gen.Synth
import graft.maint.{Merge, Rewrite, RewriteConfig}

/**
 * Benchmark main (driver contract): one JSON line with per-query seconds
 * plus the engine's headline metrics — maintenance throughput
 * (sequences/sec and GB/sec for compaction + Z-order + MERGE, BASELINE.md)
 * and N-vs-4N scaling efficiency evidenced at two local parallelism levels
 * (the sandbox stand-in for two cluster sizes).
 *
 * Measurement discipline for this sandbox (all three effects measured):
 *  - the first pipeline in a JVM pays C2 JIT compilation of the whole
 *    Spark/parquet/zstd stack (2-4x) → one warmup pipeline first;
 *  - the sandbox throttles DIRTY-PAGE CREATION globally (sustained
 *    ~6 MB/s; bursts are fast) → a large JVM heap is fatal: G1 grows the
 *    heap instead of collecting and every young-gen cycle touches new
 *    pages (round 1 ran with -Xmx48g and inverse-scaled at 32 threads;
 *    build.sbt now pins 8g so pages are reused);
 *  - whichever level runs later pays any drained page budget → levels are
 *    interleaved SYMMETRICALLY (hi,lo,lo,hi) and each level reports its
 *    per-stage minimum.
 * Stage INPUTS are identical at both levels by construction: the
 * generator, FFD bins, cluster boundaries (driver-side, from a
 * hash-filtered sample) and merge bins (driver-side, from manifest stats)
 * are all pure functions of the data, never of the core count.
 *
 * Env knobs: SPARK_GRAFT_SF_DIR (query input), SPARK_GRAFT_CPUS (main
 * level, default 32), SPARK_GRAFT_BENCH_ROWS (maintenance table size,
 * default 1M), SPARK_GRAFT_SCALING=0 to skip the second (N/4) run.
 */
object Bench {

  final case class StageStat(sec: Double, rows: Long, bytes: Long,
      extra: Map[String, String] = Map.empty)

  private def session(cpus: Int): SparkSession = {
    // Shuffle/spill on tmpfs when available: the scaling comparison is
    // about CPU parallelism; one slow local disk would bottleneck both
    // levels identically (a real cluster's shuffle IO scales with
    // executors). Falls back to the default local dir silently.
    val localDir = {
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (java.nio.file.Files.isWritable(shm))
        java.nio.file.Files.createDirectories(shm.resolve("spark-local")).toString
      else System.getProperty("java.io.tmpdir")
    }
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.local.dir", localDir)
      // Raw local FS: Hadoop's default LocalFileSystem checksums every
      // write/read in 512-byte chunks and keeps .crc sidecars — pure
      // overhead for throughput measurement (HDFS/S3 integrity lives
      // elsewhere in a real deployment)
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      // smaller input splits → enough map tasks to fill 32 cores even when
      // a partition unit only holds a few hundred MB
      .config("spark.sql.files.maxPartitionBytes", (8L * 1024 * 1024).toString)
      // spend parallel CPU to shrink bytes: zstd entropy-codes the
      // ~15.6-bit random token ints (lz4/snappy are match-based and get
      // ~0% there) and parquet v2 delta-bit-packs the int arrays. Sound
      // defaults on a real cluster too — shuffle/storage bytes are the
      // scarce resource.
      .config("spark.io.compression.codec", "zstd")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.hadoop.parquet.writer.version", "v2")
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  /** (result, wall seconds, GC milliseconds during the stage) — GC time is
    * reported per stage so a collector pathology is visible in the JSON
    * instead of masquerading as poor scaling. */
  private def time[A](f: => A): (A, Double, Long) = {
    val g0 = gcMs
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9, gcMs - g0)
  }

  /** Bench tables live on tmpfs when available: the scaling-efficiency
    * measurement should compare CPU parallelism levels, not contend on one
    * local disk (a real cluster's IO scales with executors). */
  private def benchRoot(cpus: Int): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base = if (java.nio.file.Files.isWritable(shm)) shm
               else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    java.nio.file.Files.createTempDirectory(base, s"graft-bench-$cpus").toString
  }

  /** One full maintenance pipeline at a given parallelism. */
  private def maintenance(cpus: Int, rows: Long): Map[String, StageStat] = {
    val spark = session(cpus)
    val root = benchRoot(cpus)
    val target = 8L * 1024 * 1024 // small targets: >2x-cores tasks per stage
    try {
      val t = TokenTable.create(root, spark, 1L)
      // shorter sequences than the correctness fixture: the write-throttled
      // sandbox makes bytes-written the scarce resource, and per-sequence
      // size does not change the plan shape
      val df = Synth.tableDistributed(spark, rows, 42L,
        files = math.max(256, cpus * 8), minTok = 16, maxTok = 512)
      val (_, tAppend, gAppend) = time { t.appendPrepared(df, nowMs = 1L) }
      val bytes1 = t.describe()("bytes").toLong

      val (_, tCompact, gCompact) = time {
        Rewrite.compact(t, spark,
          RewriteConfig(targetFileBytes = target, sortBy = "docid"), nowMs = 2L)
      }
      val bytes2 = t.describe()("bytes").toLong

      val (_, tZorder, gZorder) = time {
        Rewrite.cluster(t, spark,
          RewriteConfig(targetFileBytes = target, sortBy = "zkey"), nowMs = 3L)
      }
      val bytes3 = t.describe()("bytes").toLong

      val nChange = math.max(1000L, rows / 50)
      val changes = Synth.changeSet(spark, rows, 42L,
        updates = nChange, inserts = nChange / 2, deletes = nChange / 4,
        minTok = 16, maxTok = 512)
      val (_, tMerge, gMerge) = time {
        Merge.run(t, spark, changes, nowMs = 4L, targetFileBytes = target)
      }
      val ratioMerge = t.log.current().get.summary.getOrElse("touched-ratio", "?")
      val bytes4 = t.describe()("bytes").toLong

      // range-local merge: touched keys confined to one doc_id prefix
      // slice — on the clustered layout the manifest-range pruning skips
      // most files (the uniform change-set above necessarily touches all)
      val changesLocal = Synth.changeSetLocal(spark, rows, 42L,
        updates = nChange, minTok = 16, maxTok = 512)
      val (_, tMergeL, gMergeL) = time {
        Merge.run(t, spark, changesLocal, nowMs = 5L, targetFileBytes = target)
      }
      val ratioLocal = t.log.current().get.summary.getOrElse("touched-ratio", "?")
      val bytes5 = t.describe()("bytes").toLong

      // CPU-scaling probe: full scan + Z-key + row fingerprint + partial
      // aggregation — the compute front-end every rewrite pass shares,
      // with a KB-sized shuffle and NO writes; isolates compute scaling
      // from the sandbox's global write throttle.
      import graft.cluster.ZOrder
      val dict = Rewrite.sourceDict(
        t.log.current().get, t.log.dataFiles(t.log.current().get))
      val (_, tProbe, gProbe) = time {
        t.scan()._1
          .withColumn("zkey", ZOrder.zkey(col("source"), col("n_tok"),
            col("doc_id"), dict))
          .withColumn("h", xxhash64(col("doc_id"), col("tokens")))
          .groupBy("source")
          .agg(sum(col("n_tok")).as("toks"),
            sum(col("h").cast("decimal(38,0)")).as("fp"),
            min(col("zkey")), max(col("zkey")), count(lit(1)))
          .collect()
      }

      Map(
        "append" -> StageStat(tAppend, rows, bytes1, Map("gc_ms" -> gAppend.toString)),
        "compact" -> StageStat(tCompact, rows, bytes1, Map("gc_ms" -> gCompact.toString)),
        "zorder" -> StageStat(tZorder, rows, bytes2, Map("gc_ms" -> gZorder.toString)),
        "merge" -> StageStat(tMerge, rows, bytes3,
          Map("touched_ratio" -> ratioMerge, "gc_ms" -> gMerge.toString)),
        "merge_local" -> StageStat(tMergeL, nChange, bytes4,
          Map("touched_ratio" -> ratioLocal, "gc_ms" -> gMergeL.toString)),
        "probe_scan_agg" -> StageStat(tProbe, rows, bytes5, Map("gc_ms" -> gProbe.toString)))
    } finally {
      spark.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "1000000").toLong
    val cooldownMs = sys.env.getOrElse("SPARK_GRAFT_BENCH_COOLDOWN_MS", "45000").toLong
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") != "0"

    // 1. per-query timings at the main parallelism level. Failures are
    // REPORTED (error string per query), never swallowed into a timing.
    var queryErrors = Map.empty[String, String]
    val results =
      if (sys.env.get("SPARK_GRAFT_SKIP_QUERIES").contains("1"))
        Seq.empty[(String, Double)]
      else {
        val spark = session(cpus)
        val rs = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() }
          catch { case e: Throwable =>
            queryErrors += name -> e.toString.linesIterator.next().take(200)
          }
          name -> (System.nanoTime() - t0) / 1e9
        }
        spark.stop()
        rs
      }

    // 2. maintenance throughput at N cores, and at N/4 for scaling
    // evidence, symmetrically interleaved with cooldowns (see header).
    def minStages(a: Map[String, StageStat],
        b: Map[String, StageStat]): Map[String, StageStat] =
      a.map { case (k, v) => k -> (if (b.get(k).exists(_.sec < v.sec)) b(k) else v) }
    maintenance(cpus, math.max(benchRows / 10, 20000)) // JIT warmup
    val loCpus = math.max(1, cpus / 4)
    def cooled[A](f: => A): A = { Thread.sleep(cooldownMs); f }
    val (hi, lo) =
      if (doScaling) {
        val h1 = cooled(maintenance(cpus, benchRows))
        val l1 = cooled(maintenance(loCpus, benchRows))
        val l2 = cooled(maintenance(loCpus, benchRows))
        val h2 = cooled(maintenance(cpus, benchRows))
        (minStages(h1, h2), minStages(l1, l2))
      } else (maintenance(cpus, benchRows), Map.empty[String, StageStat])

    def fmt(d: Double): String = f"$d%.4f"
    val qs = results.map { case (k, v) => s""""$k":${fmt(v)}""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val errJson = queryErrors.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":"${v.replace("\\", "\\\\").replace("\"", "\\\"")}"""" }
      .mkString("{", ",", "}")

    val maintJson = hi.toSeq.sortBy(_._1).map { case (st, s) =>
      val extras = s.extra.toSeq.sortBy(_._1)
        .map { case (k, v) => s""","$k":"$v"""" }.mkString
      s""""$st":{"sec":${fmt(s.sec)},"seq_per_s":${fmt(s.rows / s.sec)},"gb_per_s":${fmt(s.bytes / s.sec / 1e9)}$extras""" +
        lo.get(st).map { l =>
          // efficiency = (T_lo * N_lo) / (T_hi * N_hi): 1.0 = linear scaling
          val eff = (l.sec * loCpus) / (s.sec * cpus)
          s""","sec_n4":${fmt(l.sec)},"scaling_eff":${fmt(eff)}"""
        }.getOrElse("") + "}"
    }.mkString("{", ",", "}")

    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"query_errors":$errJson,"sf":"$sfDir","bench_rows":$benchRows,"cpus":$cpus,"lo_cpus":$loCpus,"maintenance":$maintJson}""")
  }
}
