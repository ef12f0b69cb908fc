package graft

import org.apache.spark.sql.functions._

/** Dev A/B harness (test-scoped main): the dq_uniqueness aggregate forms
  * side by side — the r16 two-level groupBy (no distinct-rewrite Expand)
  * vs the pre-r16 single agg mixing count with countDistinct — timed
  * interleaved in ONE session so host drift cancels.
  *
  * `sbt "Test/runMain graft.UniqAb <sfDir> [reps]"`
  */
object UniqAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local("graft-uniqab",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.read.parquet(s"$dir/region.parquet").count() // warmup
    def newForm(): Unit =
      graft.operators.Profiling.dqUniqueness(spark, dir)
        .write.format("noop").mode("overwrite").save()
    def oldForm(): Unit = {
      def audit(table: String, df: org.apache.spark.sql.DataFrame,
          key: Seq[String]) = {
        // the pre-r16 uniqKeyExpr, inlined: single key cast, composite
        // keys length-prefixed and '#'-joined
        def enc(c: org.apache.spark.sql.Column) = {
          val s = c.cast("string")
          when(s.isNull, lit("N"))
            .otherwise(concat(length(s).cast("string"), lit(":"), s))
        }
        val keyExpr =
          if (key.size == 1) col(key.head).cast("string")
          else concat_ws("#", key.map(c => enc(col(c))): _*)
        df.agg(count(lit(1)).as("n_rows"),
            countDistinct(keyExpr).as("n_keys"))
          .select(lit(table).as("table_name"), col("n_rows"), col("n_keys"))
      }
      def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")
      audit("orders", t("orders"), Seq("o_orderkey"))
        .unionByName(audit("customer", t("customer"), Seq("c_custkey")))
        .unionByName(audit("lineitem", t("lineitem"),
          Seq("l_orderkey", "l_linenumber")))
        .unionByName(audit("events", t("events"), Seq("event_id")))
        .unionByName(audit("documents", t("documents"), Seq("doc_id")))
        .unionByName(audit("embeddings", t("embeddings"), Seq("vec_id")))
        .write.format("noop").mode("overwrite").save()
    }
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to reps; (name, body) <- Seq(
        "new_two_level" -> (() => newForm()),
        "old_expand" -> (() => oldForm()))) {
      val t0 = System.nanoTime()
      body()
      acc(name) = acc.getOrElse(name, Nil) :+ (System.nanoTime() - t0) / 1e9
    }
    acc.toSeq.sortBy(_._1).foreach { case (n, ts) =>
      println(f"UNIQAB $n%-14s min=${ts.min}%.3f " +
        s"reps=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    GraftSession.release(spark)
    spark.stop()
  }
}
