package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * All `salts` MinHash signatures of a word array in ONE pass (round 6,
 * guide §1.2 step 2). d03's six signatures were six interpreted
 * `array_min(transform(dw, w => md5(concat("i:", w))))` HOF folds: per
 * salt, an intermediate array of 32-char hex strings was built just to
 * take its min — 6 array traversals, 6·|dw| UTF8String hex allocations,
 * all CodegenFallback. This expression walks the word array once,
 * computes the 6 salted digests per word with a thread-cached
 * MessageDigest, keeps the running min per salt as raw 16-byte digests,
 * and hex-encodes only the 6 winners.
 *
 * Value equivalence with the HOF formulation (oracle-checked at three
 * scale factors, spec-checked against the Column formulation directly):
 *  - md5("i:" + w) hashes the identical byte stream (salt-prefix bytes
 *    then the word's UTF-8 bytes — string concat of ASCII prefix + UTF-8
 *    word is exactly that byte concatenation);
 *  - lexicographic order of lowercase-hex MD5 strings equals unsigned
 *    byte order of the digests (each byte maps monotonically to its two
 *    hex chars, and '0'<'9'<'a'<'f' in ASCII), so the byte-wise min IS
 *    the hex-string min;
 *  - null elements are skipped (md5(concat(lit, null)) was null and
 *    array_min ignores nulls); a salt with no non-null word yields a
 *    null signature (array_min of all-null), and a null input array
 *    yields null (UnaryExpression null-intolerance).
 */
case class MinhashSigs(child: Expression, salts: Int) extends UnaryExpression {

  require(salts >= 1 && salts <= 64, s"salts out of range: $salts")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"MinhashSigs expects array<string>, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    MinhashSigs.sigs(v.asInstanceOf[ArrayData], salts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinhashSigs.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $cls.MODULE$$.sigs($v, $salts);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

object MinhashSigs {

  private val mdCache = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val cs = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      cs(2 * i) = hexDigits((d(i) >> 4) & 0xf).toByte
      cs(2 * i + 1) = hexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(cs)
  }

  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    false
  }

  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def prefixesFor(salts: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(salts, s => Array.tabulate(s)(i =>
      (i.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** One-pass salted minhash: array of `salts` lowercase-hex MD5 minima
    * (null signature where no non-null word exists). */
  def sigs(words: ArrayData, salts: Int): ArrayData = {
    val md = mdCache.get()
    val prefixes = prefixesFor(salts)
    val mins = new Array[Array[Byte]](salts)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val wb = words.getUTF8String(i).getBytes
        var s = 0
        while (s < salts) {
          md.reset()
          md.update(prefixes(s))
          md.update(wb)
          val dig = md.digest()
          if (mins(s) == null || lessThan(dig, mins(s))) mins(s) = dig
          s += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](salts)
    var s = 0
    while (s < salts) { out(s) = if (mins(s) == null) null else hex(mins(s)); s += 1 }
    new GenericArrayData(out)
  }

  def of(words: Column, salts: Int): Column =
    Bridge.column(MinhashSigs(Bridge.expression(words), salts))
}
