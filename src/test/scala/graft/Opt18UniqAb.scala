package graft

import org.apache.spark.sql.functions._

/** Dev A/B harness (test-scoped main) for the r18 optimization-round
  * raw-key rewrite of the uniqueness audits: HEAD's raw-column forms vs
  * the immediate predecessor (the length-prefixed string key feeding the
  * same two-level aggregate / HLL sketch), timed interleaved in ONE
  * session so today's host drift (co-tenant steal, cal_st spreading
  * 1.26–1.73 s across back-to-back runs) cancels.
  *
  * `sbt "Test/runMain graft.Opt18UniqAb <sfDir> [reps]"`
  */
object Opt18UniqAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local("graft-opt18uniqab",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.read.parquet(s"$dir/region.parquet").count() // warmup

    def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    val tables: Seq[(String, org.apache.spark.sql.DataFrame, Seq[String])] =
      Seq(
        ("orders", t("orders"), Seq("o_orderkey")),
        ("customer", t("customer"), Seq("c_custkey")),
        ("lineitem", t("lineitem"), Seq("l_orderkey", "l_linenumber")),
        ("events", t("events"), Seq("event_id")),
        ("documents", t("documents"), Seq("doc_id")),
        ("embeddings", t("embeddings"), Seq("vec_id")))

    // the pre-r18 string key, inlined (same as Profiling.uniqKeyExpr)
    def strKey(key: Seq[String]): org.apache.spark.sql.Column = {
      def enc(c: org.apache.spark.sql.Column) = {
        val s = c.cast("string")
        when(s.isNull, lit("N"))
          .otherwise(concat(length(s).cast("string"), lit(":"), s))
      }
      if (key.size == 1) col(key.head).cast("string")
      else concat_ws("#", key.map(c => enc(col(c))): _*)
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def exactRaw(): Unit =
      noop(graft.operators.Profiling.dqUniqueness(spark, dir))
    def exactStr(): Unit =
      noop(tables.map { case (n, df, key) =>
        df.groupBy(strKey(key).as("k")).agg(count(lit(1)).as("c"))
          .agg(coalesce(sum(col("c")), lit(0L)).as("n_rows"),
            count(col("k")).as("n_keys"))
          .select(lit(n).as("table_name"), col("n_rows"), col("n_keys"))
      }.reduce(_ unionByName _))
    def prodRaw(): Unit =
      noop(graft.operators.Profiling.dqUniquenessApproxProd(spark, dir))
    def prodStr(): Unit =
      noop(tables.map { case (n, df, key) =>
        df.agg(count(lit(1)).as("n_rows"),
            approx_count_distinct(strKey(key), rsd = 0.02).as("n_keys_est"))
          .select(lit(n).as("table_name"), col("n_rows"), col("n_keys_est"))
      }.reduce(_ unionByName _))

    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to reps; (name, body) <- Seq(
        "exact_raw" -> (() => exactRaw()),
        "exact_str" -> (() => exactStr()),
        "prod_raw" -> (() => prodRaw()),
        "prod_str" -> (() => prodStr()))) {
      val t0 = System.nanoTime()
      body()
      acc(name) = acc.getOrElse(name, Nil) :+ (System.nanoTime() - t0) / 1e9
    }
    acc.toSeq.sortBy(_._1).foreach { case (n, ts) =>
      println(f"OPT18UNIQAB $n%-10s min=${ts.min}%.3f " +
        s"reps=${ts.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
