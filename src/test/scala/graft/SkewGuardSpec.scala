package graft

import org.apache.spark.sql.functions._

import graft.queries.{TextOps, VectorOps}

/** Adversarial-corpus skew guards (VERDICT r1 next-step 6): a degenerate
  * LSH bucket — boilerplate text or constant embeddings — must yield a
  * BOUNDED candidate set instead of a quadratic self-join. */
class SkewGuardSpec extends SparkTestBase {
  import spark.implicits._

  test("minhash LSH: constant-text corpus stays bounded under the cap") {
    // 5000 identical docs → one band bucket of 5000; uncapped this is
    // 12.5M pairs; with cap 50 the bucket is excluded entirely
    val boiler = (0 until 5000).map(i => (s"doc$i", "the same boilerplate text"))
    // plus a genuine near-dup pair that must SURVIVE the guard: same
    // DISTINCT word set (one word repeated) → identical minhash signature
    // by construction, different text
    val real = Seq(
      ("realA1", "alpha beta gamma delta epsilon"),
      ("realA2", "alpha beta gamma delta epsilon epsilon"))
    val docs = (boiler ++ real).toDF("doc_id", "text")
    val pairs = TextOps.minhashLshPairs(docs, bucketCap = 50)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // bounded: nothing from the boilerplate bucket
    assert(!pairs.exists { case (a, b) => a.startsWith("doc") || b.startsWith("doc") })
    // the real near-dup pair is still found
    assert(pairs.contains(("realA1", "realA2")), s"real near-dups lost: $pairs")
    assert(pairs.size <= 4, s"pair blowup: ${pairs.size}")
  }

  test("ANN LSH: constant-embedding corpus yields no quadratic bucket") {
    val dim = 64
    val constant = (0 until 3000).map(i => (i.toLong, Array.fill(dim)(1.0f)))
    val distinct = (3000 until 3006).map { i =>
      (i.toLong, Array.tabulate(dim)(j => if (j == i % dim) -5.0f else -0.1f))
    }
    val emb = (constant ++ distinct).toDF("vec_id", "embedding")
    val out = VectorOps.annLsh(emb, maxQ = 5000, bucketCap = 100).collect()
    // every constant vector sits in one 3000-member bucket → excluded;
    // only the 6 distinct vectors may produce neighbors
    assert(out.length <= 6, s"quadratic bucket leaked: ${out.length} rows")
    assert(out.forall(_.getLong(0) >= 3000))
  }
}
