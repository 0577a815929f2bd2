package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gen.Synth
import graft.maint.Merge

/**
 * Plan inspection main: prints `explain("formatted")` for the engine's hot
 * plans so pushdown / pruning / codegen coverage is reviewable
 * ("after each operator works, explain the plan and iterate"):
 *
 *  1. pruned snapshot scan   — PushedFilters + pruned ReadSchema expected
 *  2. q01 aggregation        — one WholeStageCodegen span over scan→agg
 *  3. merge full-outer join  — SortMergeJoin on doc_id, no broadcast
 *  4. zorder key computation — bit-math inside codegen (no UDF boundary)
 *
 * Run: sbt "runMain graft.Explain <tableRoot>" (root from Maintain init).
 */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Maintain.session()
    try {
      args.headOption match {
        case Some(root) =>
          val t = TokenTable.load(root, spark)
          val pred = Predicate.And(Predicate.Eq("source", "web"),
            Predicate.Between("n_tok", 64, 128))
          val (df, m) = t.scan(pred)
          println(s"=== 1. pruned scan ($m) ===")
          df.explain("formatted")

          println("=== 3. merge full-outer SMJ ===")
          val src = Synth.changeSet(spark, 1000, 42L, 50, 20, 10, 16, 64)
          val tgt = t.scan()._1
          tgt.select(col("doc_id").as("t_doc_id"), col("tokens").as("t_tokens"))
            .hint("merge")
            .join(Merge.dedupSource(src).hint("merge"),
              col("t_doc_id") === col("doc_id"), "full_outer")
            .explain("formatted")

          println("=== 4. zorder key (pure Column bit-math) ===")
          graft.cluster.ZOrder.withZKey(tgt, Seq("web", "books", "code"))
            .select("zkey").explain("formatted")
        case None =>
          println("(no table root given; showing q01 only)")
      }
      println("=== 2. q01 aggregation over testdata ===")
      SparkEntry.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")
        .explain("formatted")
    } finally spark.stop()
  }
}
