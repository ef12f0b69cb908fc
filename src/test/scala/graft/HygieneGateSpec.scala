package graft

import org.scalatest.funsuite.AnyFunSuite

/** Self-enforcing hygiene gates (r16 judge #7): the driver writes
  * LEAKCHECK.json / COPYCHECK.json per round, but until now nothing in
  * `sbt test` failed when they reported hits — the gates were artifacts,
  * not enforcement. This spec makes a nonzero leak count or a non-empty
  * copy-flag list a RED test, the way EntryContractSpec made the
  * operator counts self-enforcing. Skips (does not silently pass) when
  * an artifact is absent, e.g. on a fresh clone before the first
  * driver round.
  */
class HygieneGateSpec extends AnyFunSuite {

  private def artifact(name: String): Option[String] = {
    val f = new java.io.File(RepoRoot.dir, name)
    if (f.exists()) Some(scala.io.Source.fromFile(f).mkString) else None
  }

  test("LEAKCHECK.json reports zero hits") {
    val body = artifact("LEAKCHECK.json")
    assume(body.isDefined, "LEAKCHECK.json not present (pre-round clone)")
    val m = "\"n_hits\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(body.get)
    assert(m.isDefined, "LEAKCHECK.json carries no n_hits field")
    assert(m.get.group(1).toInt == 0,
      s"LEAKCHECK reports ${m.get.group(1)} hit(s) — see LEAKCHECK.json")
  }

  test("COPYCHECK.json flags no files") {
    val body = artifact("COPYCHECK.json")
    assume(body.isDefined, "COPYCHECK.json not present (pre-round clone)")
    val m = "\"flagged\"\\s*:\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(body.get)
    assert(m.isDefined, "COPYCHECK.json carries no flagged field")
    assert(m.get.group(1).trim.isEmpty,
      s"COPYCHECK flagged: ${m.get.group(1).trim} — see COPYCHECK.json")
  }

  /** The bench sidecar in the tree must be a committable full-run
    * artifact (r17 judge #2): twice now a local subset/loaded-host probe
    * overwrote the committed full-run `bench_samples.json` and the
    * end-of-round snapshot commit baked the overwrite in (r16: alongside
    * a silently-reverted fix; r17: the sidecar itself). The bench now
    * stamps `subset`, `rows` and `loadavg_p90` into the sidecar; this
    * gate red-tests a tree whose sidecar is a subset run, covers fewer
    * than the full guarded surface, or was measured on a loaded host —
    * so the clobber fails `sbt test` instead of reaching a commit. For a
    * pre-stamp sidecar (no `subset` field), rows and loadavg fall back
    * to being computed from the samples/loadavg maps.
    */
  test("bench_samples.json is a full-run quiet-host sidecar") {
    val body = artifact("bench_samples.json")
    assume(body.isDefined, "bench_samples.json not present (pre-round clone)")
    val b = body.get
    "\"subset\"\\s*:\\s*(true|false)".r.findFirstMatchIn(b).foreach { m =>
      assert(m.group(1) == "false",
        "sidecar is a SPARK_GRAFT_BENCH_ONLY subset probe — restore the " +
          "committed full-run sidecar (git checkout bench_samples.json)")
    }
    val rows =
      "\"rows\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(b).map(_.group(1).toInt)
        .getOrElse {
          // pre-stamp fallback: count keys of the samples map (first
          // top-level object in the sidecar)
          val samples = b.drop(b.indexOf("\"samples\"")).takeWhile(_ != '}')
          "\"([a-z0-9_]+)\"\\s*:\\s*\\[".r.findAllMatchIn(samples).length
        }
    assert(rows >= 172,
      s"sidecar covers $rows rows — the committed artifact must cover the " +
        "full guarded surface (>=172)")
    val p90: Double =
      "\"loadavg_p90\"\\s*:\\s*([0-9.]+)".r.findFirstMatchIn(b)
        .map(_.group(1).toDouble).getOrElse {
          val la = b.drop(b.indexOf("\"loadavg\""))
          val arrs = la.drop(la.indexOf('{')).takeWhile(_ != '}')
          // numbers inside the bracketed arrays only — row NAMES carry
          // digits too ("q5_star_join") and would deflate the percentile
          val vals = "\\[([^\\]]*)\\]".r.findAllMatchIn(arrs)
            .flatMap(m => "[0-9]+\\.?[0-9]*".r.findAllIn(m.group(1)))
            .map(_.toDouble).toSeq.sorted
          if (vals.isEmpty) 0.0
          else vals(math.min(vals.length - 1, (vals.length * 0.9).toInt))
        }
    assert(p90 <= 6.0,
      s"sidecar loadavg p90 $p90 > 6.0 — loaded-host leg; re-run the full " +
        "bench on a quiet host or restore the committed sidecar")
  }
}
