package graft

import org.apache.spark.sql.functions._

import graft.functions.MinhashSigs

/** MinhashSigs (the round-6 one-pass d03 signature expression) must be
  * value-identical to the Column formulation it replaced:
  * sig(i) = array_min(transform(dw, w => md5(concat("i:", w)))). */
class MinhashSigSpec extends SparkTestBase {
  import spark.implicits._

  private def hofSig(i: Int, dw: org.apache.spark.sql.Column) =
    array_min(transform(dw, w => md5(concat(lit(s"$i:"), w))))

  test("one-pass sigs equal the 6 HOF folds, incl. unicode/empty/dup words") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a",                      // duplicates collapse via distinct
      "",                             // split("") -> [""]: md5 of "i:"
      "naïve café 東京 emoji ", // multi-byte UTF-8 words
      "single",
      (1 to 300).map(k => s"w$k").mkString(" ")) // wide array
    val df = texts.toDF("text")
      .select(array_distinct(split(col("text"), " ")).as("dw"))
    val both = df.select(
      MinhashSigs.of(col("dw"), 6).as("fast"),
      array((0 until 6).map(i => hofSig(i, col("dw"))): _*).as("ref"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"fast=${r.getSeq[String](0)} ref=${r.getSeq[String](1)}")
    }
  }

  test("null words are skipped; all-null yields null signatures") {
    val df = Seq(
      (Seq[String](null, "x", null), false),
      (Seq[String](null, null), true)).toDF("dw", "allNull")
    val rows = df.select(
        MinhashSigs.of(col("dw"), 2).as("fast"),
        array(hofSig(0, col("dw")), hofSig(1, col("dw"))).as("ref"),
        col("allNull"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
      if (r.getBoolean(2)) assert(r.getSeq[String](0).forall(_ == null))
    }
  }

  test("null input array yields null") {
    val df = Seq(Tuple1(Option.empty[Seq[String]])).toDF("dw")
    val r = df.select(MinhashSigs.of(col("dw"), 3).as("s")).collect()(0)
    assert(r.isNullAt(0))
  }
}
