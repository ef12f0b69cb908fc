package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Golden-value + property tests for the flagship standings pipeline
  * (U1 + A3 + O1 + O2, SURVEY §2). ScalaCheck generators are driven with
  * explicit seeds (no scalatestplus bridge in the offline cache).
  */
class StandingsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def standings(rows: Seq[(Long, Long, Long, Long)]) =
    Relational.standingsOf(
      rows.toDF("home", "away", "hs", "as_")).collect().toSeq

  test("golden micro-league") {
    // A beats B 2-0; B draws C 1-1; C beats A 3-1.
    val s = standings(Seq((1L, 2L, 2L, 0L), (2L, 3L, 1L, 1L), (3L, 1L, 3L, 1L)))
      .map(r => (r.getAs[Long]("club"), r.getAs[Int]("id"),
        r.getAs[Long]("points"), r.getAs[Long]("goal_diff")))
    // C: 4 pts gd +2 → rank 1; A: 3 pts gd 0 → 2; B: 1 pt gd -2 → 3.
    assert(s.toSet == Set((3L, 1, 4L, 2L), (1L, 2, 3L, 0L), (2L, 3, 1L, -2L)))
  }

  test("tie ranks break by club ascending") {
    // identical mirror results: both clubs 1 draw, same goals
    val s = standings(Seq((1L, 2L, 1L, 1L)))
      .map(r => (r.getAs[Int]("id"), r.getAs[Long]("club")))
    assert(s.sorted == Seq((1, 1L), (2, 2L)))
  }

  test("null scores are excluded") {
    val df = Seq[(java.lang.Long, java.lang.Long, java.lang.Long, java.lang.Long)](
      (1L, 2L, 2L, 0L), (1L, 2L, null, null))
      .toDF("home", "away", "hs", "as_")
    val s = Relational.standingsOf(df).collect()
    assert(s.map(_.getAs[Long]("match")).sum == 2) // one match, two clubs
  }

  private val matchGen = Gen.listOfN(60, for {
    h <- Gen.choose(0L, 7L); d <- Gen.choose(1L, 7L) // total: no suchThat retries
    hs <- Gen.choose(0L, 5L); as_ <- Gen.choose(0L, 5L)
  } yield (h, (h + d) % 8, hs, as_))

  test("invariants: points identity, goal_diff sums to zero, dense ids") {
    (1L to 5L).foreach { seed =>
      val ms = matchGen(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail(s"generator exhausted for seed $seed"))
      val rows = standings(ms)
      val pts = rows.map(r => (r.getAs[Long]("points"),
        r.getAs[Long]("win"), r.getAs[Long]("draw")))
      assert(pts.forall { case (p, w, d) => p == 3 * w + d })
      assert(rows.map(_.getAs[Long]("goal_diff")).sum == 0L)
      assert(rows.map(_.getAs[Int]("id")).sorted == (1 to rows.length))
      assert(rows.map(_.getAs[Long]("match")).sum == 2L * ms.length)
    }
  }
}
