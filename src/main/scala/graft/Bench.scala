package graft

/** Benchmark main (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR at local[N], prints ONE JSON line.
  *
  * Measurement notes: results go to the `noop` sink — full materialization
  * of every column (a bare .count() would let Catalyst prune the work to a
  * row count). One tiny warmup action absorbs session/codegen start-up so
  * per-query numbers measure the queries. A failed query is emitted as -1
  * and listed in "failed" (never summed into total) — a broken query must
  * not read as a fast pass.
  *
  * When tools/oracle_times.json carries DuckDB wall-times for this sf
  * (recorded on the same host via tools/time_oracle.py), the line also
  * emits per-query "oracle" seconds and "spark_vs_duckdb" ratios — the
  * single-node-baseline comparison made computable.
  */
object Bench {

  /** Representative spread: scan+agg, the standings pipeline, joins, top-k,
    * windowed events, dedup family (LSH variants, not the quadratic
    * baselines), similarity, and per-row text ops.
    */
  val headline: Seq[String] = Seq(
    "q5_star_join", "q6_selective_agg", "st4_sessionize", "o4_window_funcs",
    "a2_group_sum", "a3_standings", "j1_full_outer", "j2_semi_exists",
    "o3_topk_limit", "o5_topk_per_key", "st3_window_agg", "f3_date_window",
    "x7_date_parse",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "corpus_clean",
    "sim_topk_bruteforce", "sim_lsh_ann", "sim_ivf_ann", "text_quality",
    "text_fingerprint",
  )

  private def oracleTimes(sfDir: String): Map[String, Double] = {
    val f = new java.io.File("tools/oracle_times.json")
    if (!f.exists()) return Map.empty
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
      val sf = root.get(new java.io.File(sfDir).getName)
      if (sf == null) Map.empty
      else headline.flatMap { q =>
        Option(sf.get(q)).map(n => q -> n.asDouble)
      }.toMap
    } catch { case _: Exception => Map.empty }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local("graft-bench", cpus)

    spark.read.parquet(s"$sfDir/region.parquet").count() // warmup

    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) v else -1)
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val oracle = oracleTimes(sfDir)
    val ratioPart =
      if (oracle.isEmpty) ""
      else {
        val o = oracle.toSeq.sortBy(_._1)
          .map { case (k, v) => "\"" + k + "\":" + v }
          .mkString("{", ",", "}")
        val r = results.collect { case (k, v, true) if oracle.contains(k) =>
          "\"" + k + "\":" + math.round(v / oracle(k) * 1000) / 1000.0
        }.mkString("{", ",", "}")
        s""","oracle":$o,"spark_vs_duckdb":$r"""
      }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed$ratioPart,"sf":"$sfDir"}""")
    spark.stop()
  }
}
