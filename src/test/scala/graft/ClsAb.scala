package graft

import org.apache.spark.sql.functions._

/** Dev probe (test-scoped main): where does text_classifier_train spend
  * its seconds — the one-time feature build (per-token md5 bucketing) or
  * the 10 cached-table gradient rounds? Times each component in ONE
  * session (the Opt18UniqAb convention for the drifting r18 host).
  *
  * `sbt "Test/runMain graft.ClsAb <sfDir> [reps]"`
  */
object ClsAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local("graft-clsab",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.read.parquet(s"$dir/region.parquet").count() // warmup

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    def rec(n: String, t: Double): Unit =
      acc(n) = acc.getOrElse(n, Nil) :+ t

    for (_ <- 1 to reps) {
      // full row, as benched
      rec("full_train", time {
        graft.operators.TextAnalysis.textClassifierTrain(spark, dir)
          .write.format("noop").mode("overwrite").save()
      })
      // the feature table alone: build + repartition + sort + persist +
      // materialize (the same shape classifierWeights caches)
      val feats = graft.operators.TextAnalysis
        .classifierFeaturesForProbe(spark, dir)
        .repartition(col("doc_id")).sortWithinPartitions(col("doc_id"))
        .persist()
      rec("feat_build", time {
        feats.write.format("noop").mode("overwrite").save()
      })
      rec("ndocs_pass", time {
        feats.select(col("doc_id")).distinct().count(); ()
      })
      // one gradient round over the cached table (zero weights)
      val wm = Array.fill(66)(0L)
      val wmap = typedLit(wm.zipWithIndex.map { case (v, i) => i -> v }.toMap)
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
      rec("one_round", time {
        feats
          .withColumn("wmc", coalesce(element_at(wmap, col("b")), lit(0L)))
          .withColumn("tz",
            expr("((wmc + 4000000) * xm) div 1000000 - 4 * xm"))
          .withColumn("z", sum(col("tz")).over(wDoc))
          .withColumn("pm", least(greatest(
            expr("(z + 40000000) div 5 - 8000000 + 500000"),
            lit(10000L)), lit(990000L)))
          .withColumn("g",
            expr("((ym - pm + 1000000) * xm) div 1000000 - xm"))
          .groupBy(col("b")).agg(sum(col("g")).as("gsum"))
          .collect(); ()
      })
      // decomposition of one round: cached scan + 66-row agg WITHOUT the
      // per-doc window (not the round's semantics — a cost attribution)
      rec("scan_agg", time {
        feats
          .withColumn("wmc", coalesce(element_at(wmap, col("b")), lit(0L)))
          .withColumn("tz",
            expr("((wmc + 4000000) * xm) div 1000000 - 4 * xm"))
          .groupBy(col("b")).agg(sum(col("tz")).as("s"))
          .collect(); ()
      })
      // floor: cached scan + count only (job overhead + IMR read)
      rec("scan_only", time { feats.groupBy().count().collect(); () })
      rec("cache_rows", feats.count().toDouble)
      feats.unpersist(blocking = true)
    }
    acc.toSeq.sortBy(_._1).foreach { case (n, ts) =>
      println(f"CLSAB $n%-11s min=${ts.min}%.3f " +
        s"reps=${ts.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
