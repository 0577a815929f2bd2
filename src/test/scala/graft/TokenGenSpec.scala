package graft

import org.apache.spark.sql.functions._

import graft.functions.TokenGen

/** The custom codegen'd generator expression: codegen path == scalar
  * reference, invariants hold, and the plan really fuses into
  * whole-stage codegen (no interpreted HOF boundary). */
class TokenGenSpec extends SparkTestBase {

  test("codegen output matches the scalar reference implementation") {
    val df = spark.range(500).select(col("id"),
      (pmod(col("id") * 7, lit(100)) + 1).cast("int").as("n"),
      TokenGen.tokens(col("id"), (pmod(col("id") * 7, lit(100)) + 1).cast("int"),
        seed = 45L, vocab = 50257).as("tokens"))
    df.collect().foreach { r =>
      val expect = TokenGen.generate(r.getLong(0), r.getInt(1), 45L, 50257)
      assert(r.getSeq[Int](2) === expect.toSeq)
      assert(r.getSeq[Int](2).length === r.getInt(1))
      assert(r.getSeq[Int](2).forall(t => t >= 0 && t < 50257))
    }
  }

  test("interpreted eval (codegen disabled) agrees with codegen") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val a = gen().collect().map(_.getSeq[Int](0))
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      val b = gen().collect().map(_.getSeq[Int](0))
      assert(a.map(_.toList).toSeq === b.map(_.toList).toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  private def gen() = spark.range(200).select(
    TokenGen.tokens(col("id"), lit(37), seed = 9L, vocab = 101).as("t"))

  test("the generator plan stays inside whole-stage codegen") {
    val plan = gen().queryExecution.executedPlan.toString
    // "*(n)" marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [tokengen"), plan)
    // no interpreted HOF boundary
    assert(!plan.contains("ArrayTransform"), plan)
  }
}
