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
 * Measurement discipline for this sandbox (each point measured, see
 * BASELINE.md "Measurement discipline"):
 *  - the first pipeline in a JVM pays C2 JIT of the whole
 *    Spark/parquet/zstd stack (2-4x) → one warmup pipeline first;
 *  - a large JVM heap is fatal: G1 grows the heap instead of collecting
 *    (round 1 ran -Xmx48g and inverse-scaled; build.sbt pins 8g);
 *  - the box's DRAM bandwidth scales ~linearly from 2 to 8 threads but
 *    only ~1.6x from 8 to 32 (one shared memory bus) — so the N-vs-4N
 *    pair runs at (2, 8) cores where hardware scaling is linear, the
 *    32-core run reports absolute throughput, and an embedded bandwidth
 *    probe puts the envelope in the JSON;
 *  - levels are interleaved symmetrically with cooldowns; per-level
 *    per-stage minimum of 2 runs.
 * Stage INPUTS are identical at both levels by construction: the
 * generator, FFD bins, cluster boundaries (driver-side, from a
 * hash-filtered sample) and merge bins (driver-side, from manifest stats)
 * are all pure functions of the data, never of the core count.
 *
 * Env knobs: SPARK_GRAFT_SF_DIR (query input), SPARK_GRAFT_CPUS
 * (throughput level, default 32), SPARK_GRAFT_BENCH_ROWS (default 4M),
 * SPARK_GRAFT_SCALE_CPUS (N of the N/4N pair, default 2),
 * SPARK_GRAFT_SCALE_ROWS (default BENCH_ROWS/2),
 * SPARK_GRAFT_SCALING=0 to skip the scaling pair.
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
      // ~32 MB splits: the local-mode scheduler dispatches tasks from one
      // event loop at ~6 ms/task (measured: a column-pruned count over 155
      // near-empty tasks takes ~1.0 s at EVERY core count) — scaling
      // efficiency needs per-task work >> dispatch cost, so fewer, bigger
      // tasks beat many small ones
      .config("spark.sql.files.maxPartitionBytes", (32L * 1024 * 1024).toString)
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

  /** Raw memory-bandwidth probe (read+write long-array streaming) at a
    * given thread count — the hardware envelope every bandwidth-bound
    * stage lives inside. Reported in the bench JSON so the scaling pair's
    * core counts are justified by data in the same file. */
  private def memBwGbps(threads: Int): Double = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val latch = new java.util.concurrent.CountDownLatch(threads)
    val sink = new java.util.concurrent.atomic.AtomicLong
    val t0 = System.nanoTime()
    (0 until threads).foreach { _ =>
      pool.submit(new Runnable { def run(): Unit = {
        val arr = new Array[Long](8 * 1024 * 1024) // 64 MB per thread
        var s = 0L
        var pass = 0
        while (pass < 8) {
          var i = 0
          while (i < arr.length) { arr(i) += i; s += arr(i); i += 1 }
          pass += 1
        }
        sink.addAndGet(s); latch.countDown()
      }})
    }
    latch.await(); pool.shutdown()
    val sec = (System.nanoTime() - t0) / 1e9
    threads * 8 * 64.0 * 2 / 1024 / sec // read+write GB/s
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
    val target = 32L * 1024 * 1024 // ~5 waves of 32 at the default table size
    try {
      val t = TokenTable.create(root, spark, 1L)
      // shorter sequences than the correctness fixture — more rows per GB
      // exercises the per-row machinery harder and per-sequence size does
      // not change the plan shape
      val df = Synth.tableDistributed(spark, rows, 42L,
        files = math.max(256, (rows / 50000).toInt), minTok = 16, maxTok = 512)
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

      // compute probe: full scan + Z-key + row fingerprint + partial
      // aggregation — the compute front-end every rewrite pass shares,
      // with a KB-sized shuffle and NO writes; isolates read+compute
      // scaling from writer effects.
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
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "4000000").toLong
    val cooldownMs = sys.env.getOrElse("SPARK_GRAFT_BENCH_COOLDOWN_MS", "30000").toLong
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

    // 2. Maintenance measurements, three parts:
    //    (a) absolute throughput at the full core count (seq/s, GB/s);
    //    (b) the N vs 4N scaling pair at (scaleCpus, 4*scaleCpus) — by
    //        default 2 vs 8, NOT 8 vs 32: this VM's DRAM bandwidth scales
    //        only ~1.6x from 8 to 32 threads (measured below and reported
    //        in the JSON), so 8->32 efficiency is capped ~0.4 by the
    //        MEMORY BUS for any bandwidth-bound engine. 2->8 is the range
    //        where the box scales linearly — and the honest analog of a
    //        real cluster, where every added executor brings its own
    //        memory controllers (per-core bandwidth stays constant);
    //    (c) a raw memory-bandwidth probe at both scaling levels plus the
    //        full count, embedded so the JSON carries its own hardware
    //        envelope.
    def minStages(a: Map[String, StageStat],
        b: Map[String, StageStat]): Map[String, StageStat] =
      a.map { case (k, v) => k -> (if (b.get(k).exists(_.sec < v.sec)) b(k) else v) }
    val scaleCpus = sys.env.getOrElse("SPARK_GRAFT_SCALE_CPUS", "2").toInt
    val scale4Cpus = scaleCpus * 4
    // scaling-pair table: same size as the throughput table (measured to
    // be the stable point: bigger pairs make the N-level pipeline long
    // enough to drift into a degraded JVM state mid-run, and smaller ones
    // sink below the ~1 s/job dispatch floor)
    val scaleRows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS",
      benchRows.toString).toLong
    val bw = Seq(scaleCpus, scale4Cpus, cpus).map(n => n -> memBwGbps(n)).toMap
    maintenance(cpus, math.max(benchRows / 10, 20000)) // JIT warmup
    def cooled[A](f: => A): A = { Thread.sleep(cooldownMs); f }
    val (hi, lo4, lo1) =
      if (doScaling) {
        val h1 = cooled(maintenance(cpus, benchRows))
        val a4 = cooled(maintenance(scale4Cpus, scaleRows))
        val a1 = cooled(maintenance(scaleCpus, scaleRows))
        val b1 = cooled(maintenance(scaleCpus, scaleRows))
        val b4 = cooled(maintenance(scale4Cpus, scaleRows))
        val h2 = cooled(maintenance(cpus, benchRows))
        (minStages(h1, h2), minStages(a4, b4), minStages(a1, b1))
      } else (maintenance(cpus, benchRows),
        Map.empty[String, StageStat], Map.empty[String, StageStat])

    def fmt(d: Double): String = f"$d%.4f"
    val qs = results.map { case (k, v) => s""""$k":${fmt(v)}""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val errJson = queryErrors.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":"${v.replace("\\", "\\\\").replace("\"", "\\\"")}"""" }
      .mkString("{", ",", "}")

    val maintJson = hi.toSeq.sortBy(_._1).map { case (st, h) =>
      val extras = h.extra.toSeq.sortBy(_._1)
        .map { case (k, v) => s""","$k":"$v"""" }.mkString
      val scalingPart = (lo1.get(st), lo4.get(st)) match {
        case (Some(n), Some(n4)) =>
          // efficiency = (T_N * N) / (T_4N * 4N): 1.0 = linear scaling
          val eff = (n.sec * scaleCpus) / (n4.sec * scale4Cpus)
          s""","sec_n":${fmt(n.sec)},"sec_n4":${fmt(n4.sec)}""" +
            s""","seq_per_s_n":${fmt(n.rows / n.sec)},"seq_per_s_n4":${fmt(n4.rows / n4.sec)}""" +
            s""","gb_per_s_n":${fmt(n.bytes / n.sec / 1e9)},"gb_per_s_n4":${fmt(n4.bytes / n4.sec / 1e9)}""" +
            s""","scaling_eff":${fmt(eff)}"""
        case _ => ""
      }
      s""""$st":{"sec":${fmt(h.sec)},"seq_per_s":${fmt(h.rows / h.sec)},"gb_per_s":${fmt(h.bytes / h.sec / 1e9)}$extras$scalingPart}"""
    }.mkString("{", ",", "}")

    val bwJson = bw.toSeq.sortBy(_._1)
      .map { case (n, g) => s""""t$n":${fmt(g)}""" }.mkString("{", ",", "}")

    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"query_errors":$errJson,"sf":"$sfDir","bench_rows":$benchRows,"scale_rows":$scaleRows,"cpus":$cpus,"scale_cpus":$scaleCpus,"scale4_cpus":$scale4Cpus,"mem_bw_gbps":$bwJson,"maintenance":$maintJson}""")
  }
}
