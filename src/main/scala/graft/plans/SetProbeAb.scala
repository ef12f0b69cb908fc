package graft.plans

import org.apache.spark.sql.functions._

/** Dev/evidence main (r16 judge #3): A/B of the decontamination probe
  * kernel's two set transports — the foldable `typedlit` literal
  * ([[SetMemberCount]]) vs the broadcast handle ([[SetMemberCountBc]]) —
  * at a synthetically LARGE eval artifact (default 3·10⁵ shingles, the
  * size a real benchmark suite reaches), where the literal rides inside
  * every serialized plan fragment the driver ships. Both forms run the
  * same aggregation over the same shingled corpus; the probe asserts the
  * results are IDENTICAL and reports per-rep wall times (each rep is a
  * fresh query → fresh analysis + task-binary serialization, the cost
  * the literal pays per micro-batch in the streaming curate stage).
  *
  * Usage: runMain graft.plans.SetProbeAb <sfDir> [nShingles] [reps]
  */
object SetProbeAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 300000
    val reps = if (args.length > 2) args(2).toInt else 5
    val spark = graft.GraftSession.local("graft-setprobe-ab",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // synthetic artifact: n distinct shingle-shaped strings, plus the
    // corpus' REAL eval shingles so the probe takes real hits too
    val real = graft.streaming.DocStream.evalShingleSet(spark, dir)
    val set: Array[String] =
      ((0 until n).iterator.map(i => s"ev$i w${i % 97} q${i % 89}") ++
        real.iterator).toArray.distinct
    val shingled = graft.Tables.t(spark, dir, "documents")
      .withColumn("sh",
        call_function("graft_shingles3", split(col("text"), " ")))
    def litSum(): Long = shingled
      .select(sum(call_function("graft_leak_count", col("sh"),
        typedlit(set.toSeq)).cast("long")).as("s"))
      .collect().head.getLong(0)
    def bcSum(): Long = shingled
      .select(sum(SetMemberCountBc.column(spark, col("sh"), set)
        .cast("long")).as("s"))
      .collect().head.getLong(0)
    // interleaved reps; rep 1 of each carries the first-shipment cost
    var (litRes, bcRes) = (-1L, -1L)
    val samples = (1 to reps).map { _ =>
      val lt = time { litRes = litSum() }
      val bt = time { bcRes = bcSum() }
      (lt, bt)
    }
    require(litRes == bcRes,
      s"transport changed the result: literal=$litRes broadcast=$bcRes")
    def fmt(d: Double) = math.round(d * 1000) / 1000.0
    println(s"""{"metric":"set_probe_ab","sf":"${new java.io.File(dir)
      .getName}","set_size":${set.length},"reps":$reps,"hits":$litRes,"lit_first":${
      fmt(samples.head._1)},"bc_first":${fmt(samples.head._2)},"lit_min":${
      fmt(samples.map(_._1).min)},"bc_min":${fmt(samples.map(_._2).min)},"samples":${
      samples.map { case (l, b) => s"[${fmt(l)},${fmt(b)}]" }
        .mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
