package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/**
 * Deterministic token-array generator as a native Catalyst expression with
 * whole-stage codegen.
 *
 * Why not `transform(sequence(0, n_tok-1), j -> pmod(xxhash64(...)))`?
 * Catalyst higher-order functions are CodegenFallback at the LAMBDA level:
 * every array element walks an interpreted Expression tree with boxed
 * values. At 10^6 rows × ~150 tokens that is ~10^8 interpreted evals and
 * tens of GB of short-lived garbage — measured here as a GC collapse that
 * got WORSE with more threads (allocation rate outruns the collector).
 * This expression evaluates once per row and fills a primitive int[] in a
 * tight loop — with doGenCode, so it fuses into the surrounding
 * whole-stage-codegen span; the interpreted eval path exists as fallback.
 *
 * Formula (pure f(seed, id, j), stable across Spark versions — XXH64 is
 * the same xxHash64 the builtin xxhash64 uses):
 *   h0 = hashLong(id, 42); t_j = pmod(hashLong(seed, hashLong(j, h0)), V)
 */
case class TokenGen(left: Expression, right: Expression, seed: Long, vocab: Int)
    extends BinaryExpression {

  // inputs are coerced by the `tokens` builder (AbstractDataType — and with
  // it ExpectsInputTypes — is private[sql] in Spark 4)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(id: Any, nTok: Any): Any = {
    val arr = TokenGen.generate(id.asInstanceOf[Long],
      nTok.asInstanceOf[Int], seed, vocab)
    UnsafeArrayData.fromPrimitiveArray(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TokenGen.getClass.getName.stripSuffix("$") + "$"
    val arr = ctx.freshName("graftTokens") // unique per occurrence in the stage
    nullSafeCodeGen(ctx, ev, (id, n) =>
      s"""
         |int[] $arr = $cls.MODULE$$.generate($id, $n, ${seed}L, $vocab);
         |${ev.value} = ${classOf[UnsafeArrayData].getName}.fromPrimitiveArray($arr);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenGen =
    copy(left = newLeft, right = newRight)
}

object TokenGen {
  /** Tight-loop primitive generation — shared by eval and codegen. */
  def generate(id: Long, nTok: Int, seed: Long, vocab: Int): Array[Int] = {
    val n = math.max(nTok, 0)
    val arr = new Array[Int](n)
    val h0 = XXH64.hashLong(id, 42L)
    var j = 0
    while (j < n) {
      val h = XXH64.hashLong(seed, XXH64.hashLong(j.toLong, h0))
      val m = (h % vocab).toInt
      arr(j) = if (m < 0) m + vocab else m
      j += 1
    }
    arr
  }

  def tokens(id: Column, nTok: Column, seed: Long, vocab: Int): Column =
    Bridge.column(TokenGen(
      Bridge.expression(id.cast("long")), Bridge.expression(nTok.cast("int")),
      seed, vocab))
}
