package graft

import org.apache.spark.sql.SaveMode

/** Dev probe (test-scoped main, not a spec): execute EVERY registered
  * query against a zero-row corpus and print the outcome per key. Used to
  * derive EdgeCaseSpec's empty-input contract; run with
  * `sbt "Test/runMain graft.EmptyCorpusProbe"`.
  */
object EmptyCorpusProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val src = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$dir/$t.parquet")
    }
    val outcomes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (k, q) =>
      val r = try {
        val n = q(spark, dir).count()
        s"ok rows=$n"
      } catch {
        case e: Throwable =>
          s"CRASH ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(1)
              .mkString.take(120)
      }
      s"$k\t$r"
    }
    println("=== EMPTY-CORPUS PROBE ===")
    outcomes.foreach(println)
    println("=== END PROBE ===")
    spark.stop()
  }
}
