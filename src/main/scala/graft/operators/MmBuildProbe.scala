package graft.operators

/** Dev/evidence main (VERDICT r15 #3): A/B attribution of the
  * `index_build_dhash` r14→r15 move (2.66 → 3.85 s at sf0.1). The r15
  * pixel-index change intentionally moved the PNG render→decode codec
  * pass from every perceptual-hash QUERY into the dhash-family BUILD
  * (`buildDhashSketch = pixelIndex + dhashSketch`; mm_phash dropped
  * 3.26 → 0.28 s in exchange). This probe times the two components
  * separately per rep, so "the regression is the absorbed decode, not a
  * plan drift" is a measurement: `pixel_sec` should ≈ the r14→r15 row
  * delta and `sketch_sec` should ≈ the r14 build cost.
  *
  * Usage: runMain graft.operators.MmBuildProbe <sfDir> [reps]
  */
object MmBuildProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MmBuildProbe <sfDir> [reps]")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.local("graft-mm-ab",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // warm the JIT + parquet footer caches once, untimed
    Multimodal.release(spark, Some(dir))
    Multimodal.buildDhashSketch(spark, dir)
    val rows = (1 to reps).map { _ =>
      Multimodal.release(spark, Some(dir))
      val pixel = time(Multimodal.pixelIndex(spark, dir))
      val sketch = time { Multimodal.dhashSketch(spark, dir); () }
      (pixel, sketch)
    }
    def fmt(d: Double) = math.round(d * 1000) / 1000.0
    val pix = rows.map(_._1).min
    val skt = rows.map(_._2).min
    println(s"""{"metric":"mm_build_ab","sf":"${new java.io.File(dir)
      .getName}","reps":$reps,"pixel_sec":${fmt(pix)},"sketch_sec":${
      fmt(skt)},"total_sec":${fmt(pix + skt)},"samples":${
      rows.map { case (p, s) => s"[${fmt(p)},${fmt(s)}]" }
        .mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
