package graft

/** Benchmark main (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR at local[N], prints ONE JSON line.
  *
  * Measurement notes: results go to the `noop` sink — full materialization
  * of every column (a bare .count() would let Catalyst prune the work to a
  * row count). One tiny warmup action absorbs session/codegen start-up so
  * per-query numbers measure the queries.
  */
object Bench {

  /** Representative spread: scan+agg, the standings pipeline, joins, top-k,
    * windowed events, dedup family (LSH variants, not the quadratic
    * baselines), similarity, and per-row text ops.
    */
  val headline: Seq[String] = Seq(
    "q5_star_join", "q6_selective_agg", "st4_sessionize", "o4_window_funcs",
    "a2_group_sum", "a3_standings", "j1_full_outer", "j2_semi_exists",
    "o3_topk_limit", "st3_window_agg", "f3_date_window", "x7_date_parse",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "corpus_clean",
    "sim_topk_bruteforce", "sim_lsh_ann", "text_quality", "text_fingerprint",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local("graft-bench", cpus)

    spark.read.parquet(s"$sfDir/region.parquet").count() // warmup

    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
