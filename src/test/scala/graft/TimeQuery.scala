package graft

/** Dev timing harness (test-scoped main): time individual query keys the
  * way graft.Bench does (noop write, min of N reps) without running the
  * whole headline suite — for A/B work on one operator.
  *
  * `sbt "Test/runMain graft.TimeQuery <sfDir> <k1,k2,...> [reps]"`
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val keys = args(1).split(',').toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local("graft-timeq",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.read.parquet(s"$dir/region.parquet").count() // warmup
    keys.foreach { k =>
      val fn = SparkEntry.queries(k)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $k%-28s min=${ts.min}%.3f reps=${
        ts.map(t => f"$t%.3f").mkString(",")}")
    }
    GraftSession.release(spark)
    spark.stop()
  }
}
