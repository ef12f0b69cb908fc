package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg (dev iteration only; the driver always passes 2):
    // comma-separated query keys — run just those. A typo'd name must
    // fail fast (ADVICE r7: a silently-empty filter made an all-skip run
    // look green).
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown query name(s) in subset arg: ${unknown.toSeq.sorted.mkString(",")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local("graft-verify", cpus)
    new java.io.File(outDir).mkdirs()
    val attempted = SparkEntry.queries.keys.toSeq.sorted
      .filter(name => only.forall(_.contains(name)))
    // Manifest FIRST, listing every query this run will attempt: a query
    // that crashes (dir never written) must read as a FAILURE downstream,
    // not as "not dumped" (ADVICE r7 — check_oracle.py skips missing dirs
    // to support subset runs, which hid crashed queries in full runs).
    Files.writeString(Paths.get(s"$outDir/manifest.json"),
      attempted.map("\"" + _ + "\"").mkString("[", ",", "]"))
    attempted.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        // caller-owned eager checkpoints pin one RDD per invocation;
        // free them once consumed (ADVICE r16)
        if (SparkEntry.callerOwnedCheckpoints(name))
          operators.Curation.freeCheckpoint(df)
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    GraftSession.release(spark) // unpin operator caches before teardown
    spark.stop()
  }
}
