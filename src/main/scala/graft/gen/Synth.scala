package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic synthetic token-table generator: pure `f(seed, i)` over
 * `spark.range` — no `rand()`, no wall clock — so every run at every
 * parallelism level produces byte-identical rows (BASELINE.md correctness
 * gate; SURVEY.md §7.4 determinism requirement).
 *
 * Shape per FIXTURES.md §1:
 *   doc_id  unique, hash-distributed hex (+ row ordinal for collision-free
 *           uniqueness — the hash prefix still drives the shuffle
 *           distribution);
 *   tokens  per-row reproducible pseudo-stream, vocab 50,257, generated with
 *           a Catalyst higher-order function (transform∘sequence) — the same
 *           pattern the reference uses for array columns
 *           (/root/reference/spark/lib/utils.py:100-103) — so generation is
 *           fully codegen'd and distributed;
 *   n_tok   log-uniform in [minTok, maxTok], invariant n_tok == size(tokens);
 *   source  Zipf-skewed categorical, hot key "web" ≈ 45% — drives the
 *           salted-merge / AQE skew paths.
 */
object Synth {

  /** (label, cumulative per-mille threshold). web is deliberately hot. */
  val sourceCdf: Seq[(String, Int)] = Seq(
    "web" -> 450, "books" -> 580, "code" -> 680, "wiki" -> 760,
    "news" -> 820, "social" -> 870, "papers" -> 910, "forums" -> 940,
    "patents" -> 960, "legal" -> 980, "subtitles" -> 990, "math" -> 1000)

  val sources: Seq[String] = sourceCdf.map(_._1)

  val vocabSize = 50257

  private def pick(u: Column): Column =
    sourceCdf.init.foldRight(lit(sourceCdf.last._1): Column) {
      case ((label, cum), elseC) => when(u < cum, label).otherwise(elseC)
    }

  /** `rows` TokenRow-shaped rows, deterministic in (seed, rows, tok range). */
  def table(spark: SparkSession, rows: Long, seed: Long = 42L,
      minTok: Int = 16, maxTok: Int = 2048): DataFrame = {
    val id = col("id")
    val lnMin = math.log(minTok.toDouble)
    val lnMax = math.log(maxTok.toDouble)
    spark.range(rows)
      .withColumn("doc_id",
        concat(lpad(lower(hex(xxhash64(id, lit(seed)))), 16, "0"), lit("-"), id))
      .withColumn("source",
        pick(pmod(xxhash64(id, lit(seed + 1)), lit(1000))))
      .withColumn("n_tok",
        floor(exp(lit(lnMin) +
          (pmod(xxhash64(id, lit(seed + 2)), lit(1000000)).cast("double") / 1e6) *
          lit(lnMax - lnMin))).cast("int"))
      .withColumn("tokens",
        transform(sequence(lit(0), col("n_tok") - 1),
          j => pmod(xxhash64(id, j, lit(seed + 3)), lit(vocabSize)).cast("int")))
      .select("doc_id", "tokens", "n_tok", "source")
  }

  /**
   * MERGE change-set fixture (FIXTURES.md §2): rows keyed so a fraction hit
   * existing doc_ids (updates/deletes) and the rest are new inserts.
   * `_op` ∈ {upsert, delete}. Updated token arrays differ from the target's
   * (different generation seed), deletes target existing keys.
   *
   *  - ids in [0, baseRows)               → existing keys
   *  - ids in [baseRows, baseRows+extra)  → new keys
   */
  def changeSet(spark: SparkSession, baseRows: Long, seed: Long = 42L,
      updates: Long = 1000, inserts: Long = 500, deletes: Long = 200,
      minTok: Int = 16, maxTok: Int = 2048): DataFrame = {
    // deterministic disjoint picks of existing ids: stride over the base range
    val upd = table(spark, baseRows, seed, minTok, maxTok)
      .withColumn("rk", pmod(xxhash64(col("doc_id"), lit(seed + 10)), lit(1000000)))
      .orderBy("rk", "doc_id").limit(updates.toInt)
      .select(col("doc_id"),
        // regenerated payload with a different seed → differs in ≥1 element
        transform(sequence(lit(0), col("n_tok") - 1),
          j => pmod(xxhash64(col("doc_id"), j, lit(seed + 11)), lit(vocabSize)).cast("int"))
          .as("tokens"),
        col("n_tok"), col("source"), lit("upsert").as("_op"))
    val del = table(spark, baseRows, seed, minTok, maxTok)
      .withColumn("rk", pmod(xxhash64(col("doc_id"), lit(seed + 12)), lit(1000000)))
      .orderBy(org.apache.spark.sql.functions.desc("rk"), col("doc_id"))
      .limit(deletes.toInt)
      .select(col("doc_id"), col("tokens"), col("n_tok"), col("source"),
        lit("delete").as("_op"))
    val ins = table(spark, inserts, seed + 13, minTok, maxTok)
      .withColumn("doc_id", concat(lit("new-"), col("doc_id")))
      .withColumn("_op", lit("upsert"))
    upd.unionByName(del).unionByName(ins)
  }
}
