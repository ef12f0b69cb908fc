package graft.operators

/** Dev/evidence main (r17, task #1): the r17 full bench read
  * `index_build_dhash` at ~6.7 s min while [[MmBuildProbe]] reads the
  * same build at ~3.5 s in a fresh session — this probe reproduces the
  * bench's in-session CONTEXT stepwise in one JVM to name the component:
  *
  *   phase A: evict+rebuild reps, nothing else in the session
  *            (the MmBuildProbe condition);
  *   phase B: same reps AFTER the dedup + IVF index families are built
  *            and pinned (the bench-pass precondition — dhash is the
  *            third family row);
  *   phase C: same reps after a System.gc() before each build (is it
  *            old-gen debris / GC pressure, or the pinned blocks?);
  *   phase D: same reps after releasing the other families again (does
  *            the cost go AWAY with the context?).
  *
  * Per rep it also records the JVM GC-time delta, so "the render loop
  * is GC-contended in a loaded heap" is a number, not a story.
  *
  * CORRECTION (r18): the r17 run of this probe never actually passed
  * gcFirst=true for phase C (ADVICE r17), so its "6.9 s vs 3.7 s purely
  * on pre-build GC state" conclusion was unsupported. The FIXED probe on
  * the post-ImageIO-fix build measures B (no gc) 2.468 ≈ C (gc) 2.500 ≈
  * D 2.460 min at sf0.1 — the dhash build is context-insensitive now;
  * the r17 creep was the ImageIO temp-file cache (independently
  * measured), not GC state. Bench keeps its pre-build System.gc() as a
  * condition-pin only and records un-gc'd twins per run (index_nogc).
  *
  * Usage: runMain graft.operators.DhashContextAb <sfDir> [reps=3]
  */
object DhashContextAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.local("graft-dhash-ctx-ab",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    def rep(gcFirst: Boolean): (Double, Long) = {
      Multimodal.release(spark, Some(dir))
      if (gcFirst) { System.gc(); Thread.sleep(200) }
      val g0 = gcMs
      val t0 = System.nanoTime()
      Multimodal.buildDhashSketch(spark, dir)
      ((System.nanoTime() - t0) / 1e9, gcMs - g0)
    }
    def phase(name: String, gcFirst: Boolean = false): Unit = {
      val rows = (1 to reps).map(_ => rep(gcFirst))
      def fmt(d: Double) = math.round(d * 1000) / 1000.0
      println(s"""{"phase":"$name","sec_min":${fmt(rows.map(_._1).min)},"samples":${
        rows.map(r => fmt(r._1)).mkString("[", ",", "]")},"gc_ms":${
        rows.map(_._2).mkString("[", ",", "]")}}""")
    }
    // warmup (JIT) once, untimed — both conditions get the same treatment
    Multimodal.buildDhashSketch(spark, dir)
    phase("A_fresh_session")
    graft.operators.Dedup.buildIndexes(spark, dir)
    graft.operators.Similarity.buildIvfIndex(spark, dir)
    phase("B_after_dedup_ivf_built")
    phase("C_after_dedup_ivf_built_gc_before_each", gcFirst = true)
    graft.operators.Dedup.release(spark, Some(dir))
    graft.operators.Similarity.release(spark, Some(dir))
    phase("D_other_families_released")
    // phase E: occupy the storage pool the way a full 172-row suite does
    // (dozens of memoized frames) — if THIS reproduces the in-bench
    // number, the creep is heap/storage pressure, not the build plan
    import org.apache.spark.sql.functions._
    val hog = spark.range(0, 40000000L, 1, 32)
      .select(col("id"), md5(col("id").cast("string")).as("a"),
        md5((col("id") + 1).cast("string")).as("b"),
        md5((col("id") + 2).cast("string")).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    hog.count()
    println(s"""{"phase":"E_hog","pinned_gb":${math.round(
      spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum / 1e8) / 10.0}}""")
    phase("E_storage_pool_occupied")
    hog.unpersist(blocking = true)
    phase("F_hog_released")
    spark.stop()
  }
}
