package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps README parity claims honest, mechanically.
  *
  * Rounds 5 and 6 both shipped a README "N/M bitwise" count that
  * contradicted the driver's own `CORRECTNESS_r{N}.json` artifact. The
  * artifact is the parity claim; prose must either defer to it or match
  * it. This spec fails whenever a hard-coded `N/M bitwise` figure in
  * README.md disagrees with the newest artifact in the repo root.
  */
class ReadmeParitySpec extends AnyFunSuite {

  private def latestArtifact: Option[java.io.File] = {
    val root = new java.io.File(".")
    Option(root.listFiles((_, n) => n.matches("CORRECTNESS_r\\d+\\.json")))
      .map(_.toSeq).getOrElse(Seq.empty)
      .sortBy(_.getName).lastOption
  }

  // Count hash_match:true rows without a JSON library: the artifact is
  // flat {"name": {"hash_match": bool, ...}, ...} written by the driver.
  private def bitwiseCounts(text: String): (Int, Int) = {
    val entries = "\"hash_match\":\\s*(true|false|null)".r
      .findAllMatchIn(text).map(_.group(1)).toSeq
    (entries.count(_ == "true"), entries.size)
  }

  test("the README entry-point appendix covers every driver-contract query") {
    val readme =
      java.nio.file.Files.readString(java.nio.file.Paths.get("README.md"))
    val missing = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(q => readme.contains(s"| $q |"))
    assert(missing.isEmpty,
      s"README appendix is missing ${missing.size} queries: " +
        missing.take(10).mkString(", "))
    // and no stale rows for queries that no longer exist
    val listed = "\\| (q\\d+_\\w+) \\|".r.findAllMatchIn(readme)
      .map(_.group(1)).toSet
    val stale = listed -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"README appendix lists removed queries: ${stale.mkString(", ")}")
  }

  test("any README 'N/M bitwise' claim matches the newest CORRECTNESS artifact") {
    val claims = "(\\d+)\\s*(?:of the\\s*|/)\\s*(\\d+)\\s+(?:queries\\s+)?(?:hash-match\\s+DuckDB\\s+)?bitwise".r
      .findAllMatchIn(
        java.nio.file.Files.readString(java.nio.file.Paths.get("README.md")))
      .map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
    latestArtifact match {
      case None => assume(false, "no CORRECTNESS artifact in repo root")
      case Some(f) =>
        val (ok, all) = bitwiseCounts(
          java.nio.file.Files.readString(f.toPath))
        assert(all > 0, s"${f.getName} parsed to zero entries")
        claims.foreach { case (n, m) =>
          assert(n == ok && m == all,
            s"README claims $n/$m bitwise but ${f.getName} records $ok/$all — " +
              "update the README (or let it defer to the artifact)")
        }
    }
  }
}
