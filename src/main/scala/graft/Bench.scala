package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gen.Synth
import graft.maint.{Merge, Rewrite, RewriteConfig}

/**
 * Benchmark main (driver contract): ONE compact JSON line on stdout with
 * per-query seconds plus the engine's headline metrics — maintenance
 * throughput (sequences/sec and GB/sec for compaction + Z-order + MERGE,
 * BASELINE.md) and N-vs-4N scaling efficiency evidenced at two local
 * parallelism levels (the sandbox stand-in for two cluster sizes).
 *
 * HARNESS DISCIPLINE (VERDICT r2 "What's wrong" #1 — the round-2 artifact
 * was an rc-124 timeout and even round 1's completed run was never parsed):
 *  - the driver keeps only a ~2000-char TAIL of the output, so the final
 *    stdout JSON line is kept COMPACT (< ~1850 chars: short stage keys,
 *    2-decimal query timings, no per-stage extras) and is the last thing
 *    printed; the FULL verbose metrics are written to BENCH_FULL.json in
 *    the working directory (committed to the repo each round);
 *  - every phase runs under try/catch — a failure is recorded in the JSON
 *    `errors` field and the run continues; a partial artifact always
 *    parses (rc 0), never dies mid-write;
 *  - a soft DEADLINE (SPARK_GRAFT_BENCH_DEADLINE_S, default 1750 s)
 *    gates every phase on time REMAINING vs the phase's own estimated
 *    cost; phases run in gate-evidence order — probes → warmup → the
 *    (N,4N) scaling pair (the north-rule number; its first iteration is
 *    unconditional) → 32-core absolute → query timings LAST (their
 *    correctness is separately driver-verified; VERDICT r3 next-step 1:
 *    three driver rounds spent the wall budget on queries-first ordering
 *    and never held a maintenance scaling number);
 *  - the maintenance JSON is assembled from whichever phases completed —
 *    scaling numbers are never dropped because a LATER phase was skipped;
 *  - the scaling-pair SIZE derives from the warmup's measured wall cost
 *    so the required pair AND the query suite fit the deadline even at a
 *    half-speed envelope (VERDICT r4 next-step 1: a fixed 5.5M-row pair
 *    cost ~2000 s in a degraded window and the artifact shipped with
 *    queries:{}); the second pair and the 32-core absolute stay
 *    opportunistic and are recorded in `skipped` when dropped —
 *    `truncated` now means the GATE evidence (first pair or queries)
 *    itself is missing;
 *  - the contention guard watches TWO canaries (read-only scan+agg AND a
 *    fixed-size write probe — round 4 collapsed on the write path while
 *    the read canary was healthy), and any gated eff outside the
 *    physically plausible [0.40, 1.05] band that the guard could not
 *    repair is disclosed in errors["envelope"] UNCONDITIONALLY.
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
 *  - stage INPUTS are identical at both levels by construction: the
 *    generator bins, FFD bins, cluster boundaries and merge bins are all
 *    driver-computed pure functions of the data, never of the core count.
 *
 * Env knobs: SPARK_GRAFT_SF_DIR (query input), SPARK_GRAFT_CPUS
 * (throughput level, default 32), SPARK_GRAFT_BENCH_ROWS (default 4M),
 * SPARK_GRAFT_SCALE_CPUS (N of the N/4N pair, default 2),
 * SPARK_GRAFT_SCALE_ROWS (default BENCH_ROWS), SPARK_GRAFT_BENCH_RUNS
 * (timed runs per scaling level, default 1 — the warmup pipeline absorbs
 * JIT; 2 interleaves and takes the min), SPARK_GRAFT_SCALING=0 to skip
 * the scaling pair, SPARK_GRAFT_SKIP_QUERIES=1 to skip the query suite.
 */
object Bench {

  final case class StageStat(sec: Double, rows: Long, bytes: Long,
      extra: Map[String, String] = Map.empty)

  private def session(cpus: Int, aqe: Boolean): SparkSession = {
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
      .config("spark.sql.extensions", "graft.sources.GraftExtensions")
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
      .config("spark.io.compression.zstd.level",
        sys.env.getOrElse("SPARK_GRAFT_ZSTD_LEVEL", "1"))
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.hadoop.parquet.writer.version", "v2")
      // bound fused-task memory: writer row groups at the file target
      // (not the 128 MB default buffer) and plain stream reads instead
      // of vectored range buffers — see Maintain.session
      .config("spark.hadoop.parquet.block.size", (32L * 1024 * 1024).toString)
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      // scan-shaping configs are MAINTENANCE-session-only: single-file
      // tasks and small reader batches bound fused read+write task
      // memory (see Maintain.session) but penalize many-small-file
      // query reads (measured: the streaming query 5x slower when the
      // 32 MB openCost leaked into the query session)
      .config("spark.sql.parquet.columnarReaderBatchSize",
        if (aqe) "4096" else "1024")
      .config("spark.sql.maxConcurrentOutputFileWriters", if (aqe) "0" else "4")
      .config("spark.sql.files.openCostInBytes",
        (if (aqe) 4L * 1024 * 1024 else 32L * 1024 * 1024).toString)
      .config("spark.shuffle.file.buffer", "1m")
      // scans pass EXACT file paths; with >32 of them Spark launches a
      // distributed listing job (~0.3-0.5 s of pure dispatch floor) before
      // every read — driver-side listing of local files is microseconds
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "8192")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      // AQE off for the maintenance pipeline: every exchange there is an
      // explicit repartition(n, exact-placement key) AQE may not coalesce
      // or skew-split anyway, so adaptive execution only adds per-stage
      // re-planning on the driver's serial floor. Query sessions keep it
      // ON (skew-join + coalescing genuinely help there).
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.adaptive.skewJoin.enabled", aqe.toString)
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

  /** Per-core CPU throughput (M ops/s of dependent FP multiplies) with
    * `threads` cores active — the frequency envelope. Measured on this VM:
    * a core runs ~12% SLOWER with 8 active than with 2 (host turbo/power
    * coupling), which alone caps raw 2→8 scaling efficiency at ~0.88 for
    * CPU-bound work. A real cluster scales by adding NODES, so per-core
    * frequency does not drop as the fleet grows — the bench therefore
    * embeds this probe in the JSON and reports frequency-NORMALIZED
    * efficiency (effn = eff · spin_N / spin_4N) next to the raw number,
    * the same in-artifact-evidence doctrine as the DRAM probe. */
  private def cpuSpinMops(threads: Int): Double = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val rates = new java.util.concurrent.atomic.DoubleAdder
    val latch = new java.util.concurrent.CountDownLatch(threads)
    (0 until threads).foreach { _ =>
      pool.submit(new Runnable { def run(): Unit = {
        var x = 1.0001d
        var ops = 0L
        val warmEnd = System.nanoTime() + 300000000L // 0.3 s JIT warm
        while (System.nanoTime() < warmEnd) { x = x * 1.0000001d % 7.3d }
        val t0 = System.nanoTime()
        val end = t0 + 1200000000L // 1.2 s timed
        while (System.nanoTime() < end) {
          var i = 0
          while (i < 100000) { x = x * 1.0000001d % 7.3d; i += 1 }
          ops += 100000
        }
        val sec = (System.nanoTime() - t0) / 1e9
        if (x != 0d) rates.add(ops / sec / 1e6)
        latch.countDown()
      }})
    }
    latch.await(); pool.shutdown()
    rates.sum() / threads
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
    val spark = session(cpus, aqe = false)
    // diagnosis only (SPARK_GRAFT_JOBLOG=1): print job boundaries so the
    // serial gaps between jobs — the scaling-efficiency killer — are
    // directly visible in pipeline-probe output
    if (sys.env.get("SPARK_GRAFT_JOBLOG").contains("1")) {
      val t0 = System.nanoTime()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = j.stageInfos.lastOption.map(_.name.linesIterator.next().take(70)).getOrElse("?")
          println(f"joblog cpus=$cpus job=${j.jobId}%3d START t=${(System.nanoTime() - t0) / 1e9}%8.2f $site")
        }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          println(f"joblog cpus=$cpus job=${j.jobId}%3d END   t=${(System.nanoTime() - t0) / 1e9}%8.2f")
      })
    }
    val root = benchRoot(cpus)
    try {
      val t = TokenTable.create(root, spark, 1L)
      // shorter sequences than the correctness fixture — more rows per GB
      // exercises the per-row machinery harder and per-sequence size does
      // not change the plan shape
      val df = Synth.tableDistributed(spark, rows, 42L,
        files = math.max(256, (rows / 50000).toInt), minTok = 16, maxTok = 512)
      val (_, tAppend, gAppend) = time { t.appendPrepared(df, nowMs = 1L) }
      val bytes1 = t.describe()("bytes").toLong
      // file-size target sized so rewrites produce ~64 output bins: bin
      // count is a pure function of the DATA (layout identical at every
      // core count), so the only lever against reduce-wave quantization —
      // ceil(bins/cores) waves; 36 bins over 8 cores idles a ~11% tail,
      // ~64 bins divide 8 AND 32 exactly (±per-source ceil rounding).
      // Per-task work (~1.5 s) stays far above the ~6 ms dispatch floor.
      val target = sys.env.get("SPARK_GRAFT_TARGET_MB")
        .map(_.toLong * 1024 * 1024)
        .getOrElse(math.max(8L * 1024 * 1024, bytes1 / 64))

      val (_, tCompact, gCompact) = time {
        Rewrite.compact(t, spark,
          RewriteConfig(targetFileBytes = target, sortBy = "docid"), nowMs = 2L)
      }
      val bytes2 = t.describe()("bytes").toLong

      val nChange = math.max(1000L, rows / 50)
      // change-sets are MATERIALIZED to parquet before the clock starts: a
      // real merge's source arrives as data, and timing the synthetic
      // generator's three narrow 4M-row scans inside the merge overstated
      // the stage's serial share by seconds at both levels
      def materialize(df: org.apache.spark.sql.DataFrame, name: String) = {
        val p = s"$root/$name"
        df.write.parquet(p)
        spark.read.parquet(p)
      }

      // range-local merge runs on the doc_id-COMPACTED layout (tight
      // per-file doc_id spans → manifest-range pruning skips most files).
      // It runs BEFORE zorder since round 4's copy-forward merge no
      // longer re-sorts the table — layout comes from clustering passes,
      // merges preserve whatever layout they find (the Delta/Iceberg
      // contract).
      val changesLocal = materialize(Synth.changeSetLocal(spark, rows, 42L,
        updates = nChange, minTok = 16, maxTok = 512), "changes-local")
      val (_, tMergeL, gMergeL) = time {
        Merge.run(t, spark, changesLocal, nowMs = 3L, targetFileBytes = target)
      }
      val ratioLocal = t.log.current().flatMap(_.summary.get("touched-ratio"))
        .getOrElse("?")
      val bytes3 = t.describe()("bytes").toLong

      val (_, tZorder, gZorder) = time {
        Rewrite.cluster(t, spark,
          RewriteConfig(targetFileBytes = target, sortBy = "zkey"), nowMs = 4L)
      }
      val bytes4 = t.describe()("bytes").toLong

      // uniform merge on the zkey-clustered layout: every file is touched;
      // the copy-forward path streams the touched bytes once (no exchange,
      // no sort) and lands the change rows as new ranged files
      val changes = materialize(Synth.changeSet(spark, rows, 42L,
        updates = nChange, inserts = nChange / 2, deletes = nChange / 4,
        minTok = 16, maxTok = 512), "changes-uniform")
      val (_, tMerge, gMerge) = time {
        Merge.run(t, spark, changes, nowMs = 5L, targetFileBytes = target)
      }
      val ratioMerge = t.log.current().flatMap(_.summary.get("touched-ratio"))
        .getOrElse("?")
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

      // WRITE canary (VERDICT r4 next-step 2): a FIXED-size generate+write
      // through the same session — rows independent of the pipeline size,
      // 8 output files so task waves divide both 2 and 8 cores evenly.
      // The round-4 driver window collapsed exactly here (59-76 s of GC
      // per 8-core WRITE stage) while the read-only scan canary measured a
      // healthy 0.91 — the guard needs an envelope check on the path that
      // actually failed.
      val wcRows = 200000L
      val wcDir = s"$root/probe-write"
      val (_, tWc, gWc) = time {
        Synth.tableDistributed(spark, wcRows, 7L, files = 8,
          minTok = 16, maxTok = 512)
          .write.parquet(wcDir)
      }
      val wcBytes = org.apache.commons.io.FileUtils
        .sizeOfDirectory(new java.io.File(wcDir))

      Map(
        "append" -> StageStat(tAppend, rows, bytes1, Map("gc_ms" -> gAppend.toString)),
        "compact" -> StageStat(tCompact, rows, bytes1, Map("gc_ms" -> gCompact.toString)),
        "merge_local" -> StageStat(tMergeL, nChange, bytes2,
          Map("touched_ratio" -> ratioLocal, "gc_ms" -> gMergeL.toString)),
        "zorder" -> StageStat(tZorder, rows, bytes3, Map("gc_ms" -> gZorder.toString)),
        "merge" -> StageStat(tMerge, rows, bytes4,
          Map("touched_ratio" -> ratioMerge, "gc_ms" -> gMerge.toString)),
        "probe_scan_agg" -> StageStat(tProbe, rows, bytes5, Map("gc_ms" -> gProbe.toString)),
        "probe_write" -> StageStat(tWc, wcRows, wcBytes, Map("gc_ms" -> gWc.toString)))
    } finally {
      spark.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  private def fmt(d: Double): String = f"$d%.4f"
  private def fmt2(d: Double): String = f"$d%.2f"
  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def main(args: Array[String]): Unit = {
    // Manual probe mode (not the driver path): `pipeline c1 r1 c2 r2 ...`
    // runs the full maintenance pipeline at each (cpus, rows) pair in ONE
    // JVM (first pair doubles as JIT warmup) and prints per-stage stats.
    // Manual A/B mode: `absort <cpus> <rows> <passesPerMode>` builds one
    // table then alternates cluster passes with the within-file sort forced
    // ON/OFF (graft.cluster.sort prop) in a single JVM — the only honest
    // comparison on a shared host whose envelope drifts minute-to-minute.
    // Pass k re-clusters pass k-1's output, so all passes after the first
    // see the same bytes/layout; per-mode MIN filters contention spikes.
    if (args.nonEmpty && args(0) == "absort") {
      val (cp, rw, per) = (args(1).toInt, args(2).toLong, args(3).toInt)
      val spark = session(cp, aqe = false)
      val root = benchRoot(cp)
      try {
        val t = TokenTable.create(root, spark, 1L)
        val df = Synth.tableDistributed(spark, rw, 42L,
          files = math.max(256, (rw / 50000).toInt), minTok = 16, maxTok = 512)
        t.appendPrepared(df, nowMs = 1L)
        val bytes1 = t.describe()("bytes").toLong
        val target = math.max(8L * 1024 * 1024, bytes1 / 64)
        Rewrite.compact(t, spark,
          RewriteConfig(targetFileBytes = target, sortBy = "docid"), nowMs = 2L)
        // warmup cluster pass (JIT) — discarded
        sys.props("graft.cluster.sort") = "always"
        Rewrite.cluster(t, spark,
          RewriteConfig(targetFileBytes = target, sortBy = "zkey"), nowMs = 3L)
        var now = 4L
        (1 to per).foreach { i =>
          Seq("always", "never").foreach { mode =>
            sys.props("graft.cluster.sort") = mode
            System.gc(); Thread.sleep(3000)
            val (_, sec, gc) = time { Rewrite.cluster(t, spark,
              RewriteConfig(targetFileBytes = target, sortBy = "zkey"), nowMs = now) }
            now += 1
            val bytes = t.describe()("bytes").toLong
            println(f"absort cpus=$cp rows=$rw pass=$i mode=$mode%-6s " +
              f"sec=$sec%8.2f gc_ms=$gc%6d bytes=$bytes")
          }
        }
      } finally {
        spark.stop()
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      }
      return
    }
    if (args.nonEmpty && args(0) == "pipeline") {
      args.drop(1).grouped(2).foreach { case Array(c, r) =>
        val (cp, rw) = (c.toInt, r.toLong)
        System.gc(); Thread.sleep(4000) // settle heap between pipelines
        val t0 = System.nanoTime()
        val st = maintenance(cp, rw)
        val tot = (System.nanoTime() - t0) / 1e9
        st.toSeq.sortBy(_._1).foreach { case (k, s) =>
          println(f"pipeline cpus=$cp rows=$rw stage=$k%-15s sec=${s.sec}%8.2f " +
            f"gc_ms=${s.extra.getOrElse("gc_ms", "?")}%s")
        }
        println(f"pipeline cpus=$cp rows=$rw TOTAL sec=$tot%8.2f")
      }
      return
    }

    val wall0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - wall0) / 1e9
    val deadlineS = sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE_S", "1750").toInt
    def remainingS: Double = deadlineS - elapsed
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "4000000").toLong
    val cooldownMs = sys.env.getOrElse("SPARK_GRAFT_BENCH_COOLDOWN_MS", "8000").toLong
    // 2 timed runs per scaling level, min per stage: single runs measured
    // ±15-30% noise (GC state carry-over); the min filters collector
    // pathology without biasing the comparison (both levels get the same
    // treatment)
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") != "0"
    val scaleCpus = sys.env.getOrElse("SPARK_GRAFT_SCALE_CPUS", "2").toInt
    val scale4Cpus = scaleCpus * 4
    // expected wall cost of the query suite (48 queries at sf0.1 measured
    // ~60 s of query time + ~40 s session/first-run overhead in a healthy
    // window, BENCH_r03; 240 keeps headroom for a degraded one)
    val queryEst = sys.env.getOrElse("SPARK_GRAFT_QUERY_EST_S", "240").toInt

    var errors = Map.empty[String, String]
    // phases skipped for budget — distinct from `truncated`, which now
    // means "the gate evidence itself is incomplete" (first scaling pair
    // or the query suite missing). Skipping an OPTIONAL repeat (second
    // pair, 32-core absolute) is a disclosed economy, not a truncation.
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    // which scaling levels the contention guard re-measured ("N"/"4N"),
    // in order — emitted in the artifact so a reader can tell a clean
    // first-interleave pair from one the guard had to repair
    val guardReruns = scala.collection.mutable.ArrayBuffer.empty[String]
    /** Run a phase unless the wall budget is spent. `estCost` is the
      * phase's expected seconds: a phase only STARTS if it can plausibly
      * finish inside the deadline (VERDICT r3 "What's wrong" #6 — checking
      * only `elapsed > deadline` let a phase entered at 1749 s run the
      * driver 90 s past its kill line). `required` phases run regardless:
      * the scaling pair is the artifact's whole reason to exist. */
    def phase[A](name: String, estCost: Double = 0.0,
        required: Boolean = false)(f: => A): Option[A] = {
      if (!required && remainingS < estCost) { skipped += name; None }
      else try Some(f) catch { case e: Throwable =>
        errors += name -> e.toString.linesIterator.next().take(160)
        None
      }
    }

    // PHASE ORDER (VERDICT r3 next-step 1 — three rounds of driver runs
    // never held a maintenance scaling number): the (N, 4N) scaling pair —
    // the ONE number the north rule gates on — runs FIRST among the
    // expensive phases; the 32-core absolute and the query suite (whose
    // correctness is already driver-verified via CORRECTNESS_rN; timings
    // are gravy) run LAST, each gated on time remaining vs its own
    // estimated cost.

    // 1. hardware envelope probes. Each probe runs ONCE discarded before
    // the timed passes: the first artifact shipped a 2-thread DRAM number
    // measured while C2 was still compiling the probe loop itself
    // (3.2 GB/s vs the true ~13).
    val bw = phase("membw", required = true) {
      memBwGbps(scale4Cpus) // JIT+page-touch warmup, discarded
      Seq(scaleCpus, scale4Cpus, cpus).distinct.map(n => n -> memBwGbps(n)).toMap
    }.getOrElse(Map.empty)
    val spin = phase("cpuspin", required = true) {
      cpuSpinMops(scale4Cpus) // JIT warmup, discarded
      Seq(scaleCpus, scale4Cpus, cpus).distinct.map(n => n -> cpuSpinMops(n)).toMap
    }.getOrElse(Map.empty)
    // frequency-normalization factor: how much slower one core runs with
    // 4N active vs N active (host turbo coupling a real cluster lacks)
    val freqRatio = (spin.get(scaleCpus), spin.get(scale4Cpus)) match {
      case (Some(a), Some(b)) if b > 0 => a / b
      case _ => 1.0
    }

    // 2. JIT warmup pipeline (small rows — C2 compiles the whole
    // Spark/parquet/zstd stack on the first pipeline in a JVM). Its
    // measured wall cost is ALSO the sizing input for the scaling pair.
    val warmupRows = math.max(benchRows / 8, 20000)
    val tWarm0 = System.nanoTime()
    phase("warmup", required = true) {
      maintenance(scale4Cpus, warmupRows)
    }
    val warmupWall = (System.nanoTime() - tWarm0) / 1e9

    // THE BUDGET DRIVES THE PAIR SIZE (VERDICT r4 next-step 1 — fourth
    // round asking for a valid driver-clock artifact; round 4's fixed
    // 5.5M-row pair cost ~2000 s in a degraded host window, blowing the
    // 1750 s deadline before the query phase could start). Cost model
    // from the warmup's measured wall, calibrated on this VM (one-JVM
    // pipeline probe, healthy window: 8-core 500k JIT=80.1 s,
    // post-JIT=37.2 s, 2M=61.2 s -> floor ~29 s, v ~1.6e-5 s/row; see
    // BASELINE.md "Bench sizing"):
    //  - pipeline(rows) at 4N cores ≈ floor + v·rows, floor ≈ 30 s
    //    (session start/stop, probes, commits, job gaps);
    //  - the warmup's wall carries C2 JIT of the whole stack — post-JIT
    //    pipelines measure ~0.47x of it (jitDiscount 0.5, slightly
    //    conservative: the derived per-row cost lands ~1.25x above true);
    //  - the N=2-core pipeline costs ~4.3x the 4N compute (linear DRAM
    //    range, eff ~0.9) plus the same floor.
    // Everything the artifact needs — the REQUIRED first pair and the
    // query suite — must fit even if the envelope halves mid-run
    // (safety = 2); the second pair and the 32-core absolute stay
    // opportunistic, gated on measured cost.
    val scaleRows: Long = sys.env.get("SPARK_GRAFT_SCALE_ROWS") match {
      case Some(v) => v.toLong
      case None =>
        val floorS = sys.env.getOrElse("SPARK_GRAFT_FLOOR_S", "30").toDouble
        val jitDiscount = 0.5
        val nMult = 4.3
        val safety = sys.env.getOrElse("SPARK_GRAFT_BENCH_SAFETY", "2.0").toDouble
        val perRow4 = math.max(1e-7,
          (warmupWall * jitDiscount - floorS) / warmupRows)
        val endProbesS = 25.0
        val budget = (remainingS - 2 * cooldownMs / 1000.0 - endProbesS -
          safety * queryEst) / safety - 2 * floorS
        val fit = (budget / ((1.0 + nMult) * perRow4)).toLong
        // lower clamp: below ~1.2M rows the ~5-6 s/stage serial floor eats
        // the 0.8 efficiency ceiling; upper clamp: the round-3/4 size that
        // a healthy window fits comfortably. (Lower bounded by benchRows
        // so a small-rows smoke run is not inflated.)
        val r = math.max(math.min(1200000L, benchRows),
          math.min(benchRows * 11 / 8, fit))
        println(f"bench sizing: warmup=${warmupWall}%.1fs perRow4=$perRow4%.2e " +
          f"budget=$budget%.0fs scaleRows=$r (fit=$fit)")
        r
    }
    // explicit GC before each timed pipeline: heap state carried over from
    // the previous pipeline (old-gen occupancy, fragmented humongous
    // regions) measured as ±30% stage noise without it
    def cooled[A](f: => A): A = { System.gc(); Thread.sleep(cooldownMs); f }
    def minStages(a: Map[String, StageStat],
        b: Map[String, StageStat]): Map[String, StageStat] =
      a.map { case (k, v) => k -> (if (b.get(k).exists(_.sec < v.sec)) b(k) else v) }

    // 3. the N vs 4N scaling pair at (scaleCpus, 4*scaleCpus) — by default
    // 2 vs 8, NOT 8 vs 32: this VM's DRAM bandwidth scales only ~1.6x from
    // 8 to 32 threads (the membw probe above reports it in the JSON), so
    // 8->32 efficiency is capped ~0.4 by the MEMORY BUS for any
    // bandwidth-bound engine. 2->8 is the range where the box scales
    // linearly — and the honest analog of a real cluster, where every
    // added executor brings its own memory controllers. The two levels
    // are INTERLEAVED (4N, N, 4N, N): host-side contention (shared box)
    // drifts on a minutes scale, and back-to-back same-level runs would
    // let a noisy window hit one level only and skew the ratio.
    // The FIRST pair is `required` (it IS the artifact); the second runs
    // only if the first pair's measured wall cost fits the remaining
    // budget — the deadline is checked INSIDE the loop, per level.
    var pairCost = 0.0 // measured wall seconds of the slowest completed pair
    var cost4 = 0.0 // measured wall of one 4N-level pipeline (incl. cooldown)
    var costN = 0.0 // measured wall of one N-level pipeline
    var lo4: Option[Map[String, StageStat]] = None
    var lo1: Option[Map[String, StageStat]] = None
    def foldLevel(acc: Option[Map[String, StageStat]],
        next: Option[Map[String, StageStat]]): Option[Map[String, StageStat]] =
      (acc, next) match {
        case (Some(a), Some(b)) => Some(minStages(a, b))
        case _ => acc.orElse(next)
      }
    def run4(required: Boolean): Unit = {
      val t0 = System.nanoTime()
      val r = phase(s"maint-$scale4Cpus", required = required,
        estCost = math.max(cost4, pairCost * 0.3))(
        cooled(maintenance(scale4Cpus, scaleRows)))
      if (r.isDefined) cost4 = (System.nanoTime() - t0) / 1e9
      lo4 = foldLevel(lo4, r)
    }
    def runN(required: Boolean): Unit = {
      val t0 = System.nanoTime()
      val r = phase(s"maint-$scaleCpus", required = required,
        estCost = math.max(costN, pairCost * 0.7))(
        cooled(maintenance(scaleCpus, scaleRows)))
      if (r.isDefined) costN = (System.nanoTime() - t0) / 1e9
      lo1 = foldLevel(lo1, r)
    }
    if (doScaling) {
      (1 to runs).foreach { r =>
        if (r > 1 && remainingS < pairCost * 1.1 + 60.0) skipped += s"pair-$r"
        else {
          val t0 = System.nanoTime()
          run4(required = r == 1)
          runN(required = r == 1)
          pairCost = math.max(pairCost, (System.nanoTime() - t0) / 1e9)
        }
      }
      // CONTENTION GUARD: nothing in this engine scales superlinearly, and
      // per-job quiet-window scaling never measured below ~0.5 — so a
      // gated-stage efficiency > 1.05 means the N level ran inside a
      // contended host window (observed: a 2-core pipeline 12x slower than
      // its 8-core sibling minutes earlier, eff "3.1"), and < 0.40 means
      // the 4N level did. Re-run ONLY the suspect level while the budget
      // allows (its wall cost is now measured) and fold by per-stage min —
      // a driver artifact with a physically impossible ratio is worse than
      // one that spent its slack re-measuring.
      // TWO envelope-validity CANARIES with tighter bounds than the gated
      // stages (which have real serial floors):
      //  - the no-write scan+agg probe (pure read bandwidth + CPU; healthy
      //    2->8 eff 0.84-1.13 — observed 0.49 in a run whose DRAM probe
      //    scaled 8.7 -> 9.1 GB/s from 2 to 8 threads, i.e. not at all);
      //  - the fixed-size WRITE probe (VERDICT r4 next-step 2: the round-4
      //    driver window collapsed on the WRITE path — 59-76 s GC per
      //    8-core write stage — while the read canary measured a healthy
      //    0.91, so the guard never fired and garbage shipped undisclosed).
      //    Its band is wider: small fixed writes carry more per-level
      //    noise (file open/commit floors) than the scan probe.
      val gatedStages = Seq("append", "compact", "zorder", "merge")
      def effOf(st: String): Option[Double] =
        for (n <- lo1.flatMap(_.get(st)); n4 <- lo4.flatMap(_.get(st)))
          yield (n.sec * scaleCpus) / (n4.sec * scale4Cpus)
      def gatedEffs: Seq[Double] = gatedStages.flatMap(effOf)
      def canaryEff: Double = effOf("probe_scan_agg").getOrElse(0.8)
      def writeCanaryEff: Double = effOf("probe_write").getOrElse(0.8)
      def canaryHot: Boolean = canaryEff > 1.25 || writeCanaryEff > 1.40
      def canaryCold: Boolean = canaryEff < 0.60 || writeCanaryEff < 0.45
      // a guard re-run must never starve the query phase entirely: with
      // per-query dispatch gating a 60 s reserve still yields a PARTIAL
      // suite (non-empty queries => not truncated) — round 5's second run
      // spent 3 guard re-runs and shipped queries:{} truncated:true
      val queryReserveS = 60.0
      var guards = 3
      var acted = true
      while (guards > 0 && acted) {
        acted = false
        val effs = gatedEffs
        if ((effs.exists(_ > 1.05) || canaryHot) &&
            remainingS > costN * 1.1 + queryReserveS) {
          runN(required = false); acted = true; guardReruns += "N"
        } else if ((effs.exists(_ < 0.40) || canaryCold) &&
            remainingS > cost4 * 1.1 + queryReserveS) {
          run4(required = false); acted = true; guardReruns += "4N"
        }
        guards -= 1
      }
      // the guard can only spend budget, not invent a quiet host: if a
      // canary STILL sits outside its healthy band after the re-runs, the
      // artifact says so instead of letting a physically implausible
      // ratio read as an engine property
      if (canaryCold || canaryHot)
        errors += "envelope" ->
          f"canaries outside healthy band after ${guardReruns.size} guard re-runs (scan-agg 2->8 eff $canaryEff%.2f healthy 0.60-1.25, write $writeCanaryEff%.2f healthy 0.45-1.40): host window contended, pair invalid"
      // UNCONDITIONAL plausibility disclosure (VERDICT r4 next-step 2b):
      // nothing in this engine scales superlinearly and no quiet-window
      // stage ever measured below 0.40 — a gated eff outside [0.40, 1.05]
      // that the guard could not repair (no budget, or the window never
      // recovered) is physically implausible and must not read as a
      // measured engine property, REGARDLESS of what the canaries say.
      val implausible = gatedStages.flatMap(st => effOf(st).collect {
        case e if e < 0.40 || e > 1.05 => f"$st=$e%.2f"
      })
      if (implausible.nonEmpty && !errors.contains("envelope"))
        errors += "envelope" ->
          s"gated eff outside plausible [0.40,1.05]: ${implausible.mkString(", ")} — envelope-invalid, do not read as engine scaling"
    }

    // 4. absolute throughput at the full core count (single run — the
    // scaling gate lives on the pair above; this is the headline number).
    // Cost estimate: the 4N-level pipeline scaled by the row ratio (the
    // 32-core run is floor-bound, rarely much faster than the 8-core one).
    // the absolute only STARTS if the query suite (required gate evidence)
    // still fits afterwards — starting it must never starve the queries
    val hiEst = pairCost * 0.3 * (benchRows.toDouble / scaleRows) + 30
    val hi = phase(s"maint-$cpus", estCost = hiEst + queryEst)(
      cooled(maintenance(cpus, benchRows)))

    // 5. per-query timings at the main parallelism level — LAST and
    // PARTIAL-CAPABLE: their correctness is already gated by
    // CORRECTNESS_rN, so timings are gravy — but an artifact with
    // queries:{} reads as truncated (round 4 shipped exactly that). Each
    // query is individually gated on the wall remaining, so a short
    // budget yields a PARTIAL suite plus `skipped` entries instead of an
    // empty one. Failures are REPORTED (error string per query), never
    // swallowed into a timing.
    var queryErrors = Map.empty[String, String]
    val results: Seq[(String, Double)] =
      if (sys.env.get("SPARK_GRAFT_SKIP_QUERIES").contains("1"))
        Seq.empty
      else phase("queries", estCost = 30) {
        val spark = session(cpus, aqe = true)
        val rs = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          // ~1 s/query typical at sf0.1; the first pays session+codegen
          // JIT. Stop DISPATCHING when the wall is nearly spent — a query
          // already running is allowed to finish (single-digit seconds).
          if (remainingS < 15) skipped += s"query:$name"
          else {
            val t0 = System.nanoTime()
            try { fn(spark, sfDir).count() }
            catch { case e: Throwable =>
              queryErrors += name -> e.toString.linesIterator.next().take(160)
            }
            rs += name -> (System.nanoTime() - t0) / 1e9
          }
        }
        spark.stop()
        rs.toSeq
      }.getOrElse(Seq.empty)

    // 6. re-probe the hardware envelope AFTER the measurements: the box is
    // shared, its effective bandwidth drifts on a minutes scale, and the
    // start/end pair brackets the conditions the stage numbers ran under
    val bwEnd = phase("membw-end", required = true) {
      Seq(scaleCpus, scale4Cpus).map(n => n -> memBwGbps(n)).toMap
    }.getOrElse(Map.empty)

    // Envelope-validity disclosures from the BRACKETED hardware probes
    // (round 5: a run STARTED in a collapsed bus window — 2.3 GB/s at 2
    // threads vs ~20 healthy, recovering 9x by the end bracket — and both
    // canaries stayed inside their bands, so nothing disclosed it). Each
    // check keys on numbers already in the artifact:
    //  - a collapsed START bus (absolute floor, or no 2->8 headroom) caps
    //    every bandwidth-bound stage's eff regardless of engine quality
    //    (healthy brackets: t2 13-21 GB/s, t8/t2 ~2-3x; r4's degraded-but-
    //    usable window was 16.8 and 2.06x);
    //  - a >2x start->end drift means the pair and the absolute ran in
    //    DIFFERENT host windows;
    //  - a freq-normalization ratio beyond the ~12% turbo coupling this
    //    host actually exhibits (healthy spin ratio 1.04-1.12) means the
    //    spin probes straddled a window change and effn is inflated —
    //    normalized numbers then carry LESS evidence than raw ones.
    if (doScaling) {
      for (b2 <- bw.get(scaleCpus); b8 <- bw.get(scale4Cpus)) {
        if (b2 < 7.0 || b8 < 1.8 * b2)
          errors += "envelope_bw" ->
            f"start DRAM probes collapsed (t$scaleCpus=$b2%.1f GB/s, t$scale4Cpus=$b8%.1f; healthy ~20/~48): bandwidth-bound stage effs are window artifacts, not engine properties"
        for (e2 <- bwEnd.get(scaleCpus)) {
          val drift = e2 / b2
          if (drift > 2.0 || drift < 0.5)
            errors += "envelope_drift" ->
              f"DRAM envelope drifted $drift%.1fx start->end (t$scaleCpus $b2%.1f -> $e2%.1f GB/s): the run mixes host windows"
        }
      }
      if (freqRatio > 1.25 || freqRatio < 0.85)
        errors += "envelope_freq" ->
          f"cpu-spin normalization ratio $freqRatio%.2f outside the plausible turbo-coupling band [0.85,1.25]: spin probes straddled a window change; trust raw eff over effn"
    }

    // --- emission: verbose file first, compact line LAST on stdout ---
    // The maintenance section is built from WHATEVER phases completed:
    // scaling numbers come straight from the pair results, absolute
    // numbers from the 32-core run if it happened. (The round-3 driver
    // artifact shipped `maintenance:{}` although the scaling pair had
    // almost certainly completed — the old emission only rendered stages
    // present in the deadline-skipped absolute map, silently discarding
    // the pair. The gate evidence must never depend on a later phase.)
    val total = results.map(_._2).sum
    def stageJson(st: String, compact: Boolean): String = {
      val scaling = (lo1.flatMap(_.get(st)), lo4.flatMap(_.get(st))) match {
        case (Some(n), Some(n4)) =>
          // efficiency = (T_N * N) / (T_4N * 4N): 1.0 = linear scaling;
          // effn additionally normalizes by the measured per-core
          // frequency drop between the two active-core counts (cpu_mops)
          val eff = (n.sec * scaleCpus) / (n4.sec * scale4Cpus)
          val effn = eff * freqRatio
          if (compact)
            s""""n":[${fmt2(n.sec)},${(n.rows / n.sec).toLong}]""" +
              s""","n4":[${fmt2(n4.sec)},${(n4.rows / n4.sec).toLong}]""" +
              s""","eff":${fmt2(eff)},"effn":${fmt2(effn)}"""
          else
            s""""sec_n":${fmt(n.sec)},"sec_n4":${fmt(n4.sec)}""" +
              s""","seq_per_s_n":${fmt(n.rows / n.sec)},"seq_per_s_n4":${fmt(n4.rows / n4.sec)}""" +
              s""","gb_per_s_n":${fmt(n.bytes / n.sec / 1e9)},"gb_per_s_n4":${fmt(n4.bytes / n4.sec / 1e9)}""" +
              s""","gc_ms_n":${n.extra.getOrElse("gc_ms", "0")},"gc_ms_n4":${n4.extra.getOrElse("gc_ms", "0")}""" +
              s""","scaling_eff":${fmt(eff)},"scaling_eff_freq_normalized":${fmt(effn)}"""
        case _ => ""
      }
      val abs = hi.flatMap(_.get(st)) match {
        // compact line: the absolute is redundant when the stage has the
        // scaling pair (the gate evidence) — it stays in the verbose file.
        // The compact line must fit the driver's ~2000-char stdout tail
        // WITH 48 query timings AND the full maintenance matrix.
        case Some(_) if compact && scaling.nonEmpty => ""
        case Some(h) if compact =>
          s""""sec":${fmt2(h.sec)},"sps":${(h.rows / h.sec).toLong}"""
        case Some(h) =>
          val extras = h.extra.toSeq.sortBy(_._1)
            .map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
          s""""sec":${fmt(h.sec)},"seq_per_s":${fmt(h.rows / h.sec)},"gb_per_s":${fmt(h.bytes / h.sec / 1e9)},"rows":${h.rows},"bytes":${h.bytes}""" +
            (if (extras.isEmpty) "" else s",$extras")
        case None => ""
      }
      s""""$st":{${Seq(abs, scaling).filter(_.nonEmpty).mkString(",")}}"""
    }
    def maintJson(compact: Boolean): String = {
      val stages = (hi.map(_.keySet).getOrElse(Set.empty) ++
        lo4.map(_.keySet).getOrElse(Set.empty) ++
        lo1.map(_.keySet).getOrElse(Set.empty)).toSeq.sorted
      stages.map(st => stageJson(st, compact)).mkString("{", ",", "}")
    }
    def kvJson(m: Map[String, String]): String = m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    def bwJson(compact: Boolean) = (bw.toSeq.sortBy(_._1)
        .map { case (n, g) => s""""t$n":${fmt2(g)}""" } ++
      (if (compact) Seq.empty else bwEnd.toSeq.sortBy(_._1)
        .map { case (n, g) => s""""t${n}_end":${fmt2(g)}""" }))
      .mkString("{", ",", "}")
    val spinJson = spin.toSeq.sortBy(_._1)
      .map { case (n, g) => s""""t$n":${fmt2(g)}""" }.mkString("{", ",", "}")

    // `truncated` = the GATE EVIDENCE is incomplete: the required first
    // scaling pair or the query suite is missing. Budget-skipping an
    // optional repeat (second pair, 32-core absolute) is disclosed in
    // `skipped`, not flagged as truncation — VERDICT r4 next-step 1's done
    // criterion is BOTH maintenance and queries present, truncated:false.
    val pairMissing = doScaling && (lo1.isEmpty || lo4.isEmpty)
    val queriesMissing = results.isEmpty &&
      !sys.env.get("SPARK_GRAFT_SKIP_QUERIES").contains("1")
    val truncated = pairMissing || queriesMissing

    def header(compact: Boolean) = {
      val trunc = if (truncated || !compact) s""","truncated":$truncated""" else ""
      s""""unit":"sec","sf":${jstr(sfDir.split('/').last)},"cpus":$cpus,"scale_cpus":$scaleCpus,"scale4_cpus":$scale4Cpus,"rows":$benchRows,"srows":$scaleRows,"wall_s":${fmt2(elapsed)}$trunc,"cpu_mops":$spinJson"""
    }

    // verbose artifact (everything). Committed by the builder under a
    // round-tagged name via SPARK_GRAFT_BENCH_FULL_PATH; the driver's
    // untagged runs land on the default name so they stop clobbering the
    // committed healthy-run artifact (VERDICT r4 "What's wrong" #5).
    val verboseQs = results.map { case (k, v) => s""""$k":${fmt(v)}""" }
      .mkString("{", ",", "}")
    val guardJson = guardReruns.map(jstr).mkString("[", ",", "]")
    val skippedJson = skipped.map(jstr).mkString("[", ",", "]")
    val verbose = s"""{"metric":"total","value":${fmt(total)},${header(compact = false)},"queries":$verboseQs,"query_errors":${kvJson(queryErrors)},"errors":${kvJson(errors)},"guard_reruns":$guardJson,"skipped":$skippedJson,"mem_bw_gbps":${bwJson(compact = false)},"maintenance":${maintJson(compact = false)}}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_BENCH_FULL_PATH", "BENCH_FULL.json")), verbose + "\n")
    catch { case _: Throwable => () }

    // compact driver line — LAST line on stdout, sized to fit the tail.
    // Query keys shrink to their unique 3-char prefixes (q01, d02, m10 …;
    // the driver contract's own example uses "q1"-style keys) — full
    // names + 4-decimal values live in the verbose artifact.
    val compactQs = results.map { case (k, v) => s""""${k.take(3)}":${fmt2(v)}""" }
      .mkString("{", ",", "}")
    // compact line collapses per-query skip entries to a count — 50
    // `query:<name>` strings would blow the ~1850-char stdout budget;
    // the verbose artifact keeps the full list
    val skippedCompact = {
      val (qs, rest) = skipped.partition(_.startsWith("query:"))
      (rest ++ (if (qs.nonEmpty) Seq(s"queries-skipped:${qs.size}") else Nil))
        .map(jstr).mkString("[", ",", "]")
    }
    // error values truncated to 70 chars on the compact line (the four
    // envelope disclosures at ~150 chars each would overflow the tail);
    // full text lives in the verbose artifact
    val errPart =
      (if (queryErrors.isEmpty && errors.isEmpty) ""
       else s""","query_errors":${kvJson(queryErrors.map { case (k, v) => k -> v.take(70) })},"errors":${kvJson(errors.map { case (k, v) => k -> v.take(70) })}""") +
      (if (skipped.isEmpty) "" else s""","skipped":$skippedCompact""")
    println(s"""{"metric":"total","value":${fmt2(total)},${header(compact = true)},"mem_bw_gbps":${bwJson(compact = true)},"queries":$compactQs$errPart,"maintenance":${maintJson(compact = true)}}""")
  }
}
