package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{GraftFunctions, LshJoinRewrite}

/** The LSH similarity-join rewrite rule: same rows, different plan.
  * Without LshJoinRewrite the `graft_lsh_match` predicate forces a
  * nested-loop join; with it, Catalyst extracts the bucket equality as an
  * equi-join key.
  */
class SimJoinRuleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def joined() = {
    val emb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    emb.as("a").join(emb.as("b"),
        expr("graft_lsh_match(a.embedding, b.embedding, 0.2D)") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
  }

  test("rule turns the nested-loop join into an equi-join, same rows") {
    GraftFunctions.register(spark)
    val saved = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = Seq()
      val naive = joined()
      val naivePlan = naive.queryExecution.executedPlan.toString
      assert(naivePlan.contains("NestedLoopJoin"), naivePlan)
      val naiveRows = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      spark.experimental.extraOptimizations = Seq(LshJoinRewrite)
      val fast = joined()
      val fastPlan = fast.queryExecution.executedPlan.toString
      assert(!fastPlan.contains("NestedLoopJoin"), fastPlan)
      assert(fastPlan.contains("HashJoin") || fastPlan.contains("SortMergeJoin"),
        fastPlan)
      val fastRows = fast.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      assert(naiveRows == fastRows)
      assert(fastRows.nonEmpty)
    } finally spark.experimental.extraOptimizations = saved
  }

  test("bucket key and cosine refinement stay inside WholeStageCodegen") {
    GraftFunctions.register(spark)
    val saved = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = Seq(LshJoinRewrite)
      val df = joined()
      df.collect() // finalize the AQE plan — codegen ids appear after exec
      val plan = df.queryExecution.executedPlan.toString
      // the rewritten join (bucket-key hash join + cosine post-predicate)
      // must be codegen'd — LshBucket/CosineSim implement doGenCode, so
      // the join node carries a codegen-stage id ("*(n) ...HashJoin")
      val joinLine = plan.linesIterator
        .find(l => l.contains("HashJoin") || l.contains("SortMergeJoin"))
        .getOrElse(fail(s"no hash join in plan:\n$plan"))
      assert(joinLine.trim.matches("""^[+\-:\s]*\*\(\d+\).*"""),
        s"join not inside WholeStageCodegen:\n$plan")
    } finally spark.experimental.extraOptimizations = saved
  }
}
