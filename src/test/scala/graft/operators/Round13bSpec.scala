package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Round-13b contracts: triangle census over the near-dup pair graph.
  * Each distributed result is checked against a driver-side brute-force
  * recompute from the same pair list — the spec owns the semantics, the
  * oracle SQL owns cross-engine parity.
  */
class Round13bSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("graph_triangles: per-node counts match an adjacency-set " +
      "brute-force; clique members close, isolated pairs do not") {
    val pairs = Dedup.dedupMinhashLsh(spark, dir)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "sf0.001 corpus should have planted near-dups")
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val triExpect = adj.map { case (n, ns) =>
      // count unordered neighbor pairs that are themselves adjacent
      n -> ns.toSeq.combinations(2).count {
        case Seq(x, y) => adj(x).contains(y)
        case _         => false
      }.toLong
    }
    val out = Curation.graphTriangles(spark, dir).collect()
    assert(out.length == adj.size, "one row per pair-graph node")
    out.foreach { r =>
      val (id, deg, tri, cc) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(deg == adj(id).size, s"doc $id degree")
      assert(tri == triExpect(id), s"doc $id triangles: $tri vs ${triExpect(id)}")
      val expCc =
        if (deg >= 2) math.rint(2.0 * tri / (deg * (deg - 1)) * 1e6) / 1e6
        else 0.0
      assert(cc == expCc, s"doc $id clustering coeff")
    }
    // the planted duplicate families should produce at least one closed
    // triangle somewhere (three mutual near-dups); a graph with zero
    // triangles would make this operator vacuous on its own fixture
    assert(out.map(_.getLong(2)).sum > 0, "no triangles in pair graph")
    // output ordered by doc_id for deterministic hashing
    val ids = out.map(_.getLong(0)).toSeq
    assert(ids == ids.sorted)
  }
}
