package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** r10 VERDICT task 4, the grep-auditable invariant: every
  * un-partitioned `Window.orderBy` in main sources is a single-task
  * global sort at 1000 executors, so each site must either
  *  - carry a `bounded grain:` comment within the 8 preceding lines
  *    stating WHY its input can never be corpus-sized (day grids,
  *    fixed bucket rollups, post-limit frames, ...), or
  *  - live in operators/PrefixSum.scala (whose ≤|parallelism|-row
  *    offsets window is the sanctioned bounded leg of the
  *    range-partitioned two-pass rank/cumsum).
  * A new corpus-grain window lands here unmarked and fails the suite;
  * the fix is PrefixSum.rank / rankAndCumSum / sortedPositions /
  * competitionRank / ntileExpr, not a comment.
  */
class WindowAuditSpec extends AnyFunSuite {

  private def scalaSources(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq

  test("every un-partitioned Window.orderBy is marked bounded or is PrefixSum's") {
    val root = Paths.get("src/main/scala")
    assume(Files.isDirectory(root))
    val offenders = Seq.newBuilder[String]
    for (p <- scalaSources(root)) {
      val isPrefixSum = p.toString.toLowerCase.contains("prefixsum")
      val lines = new String(Files.readAllBytes(p), "UTF-8").split("\n", -1)
      for (i <- lines.indices) {
        val l = lines(i)
        // a site is any Window.orderBy spelling: single-line (bare or
        // fully qualified — substring match covers both), or wrapped —
        // a line ENDING in `Window` (any qualification, e.g.
        // `val w = org.apache.spark.sql.expressions.Window`) whose
        // next line carries the `.orderBy` (r11 VERDICT task 1: the
        // qualified wrapped spelling used to slip past this matcher)
        val site = l.contains("Window.orderBy") ||
          (l.trim.endsWith("Window") && !l.trim.startsWith("import") &&
            i + 1 < lines.length && lines(i + 1).contains(".orderBy"))
        if (site && !isPrefixSum) {
          val ctx = lines.slice(math.max(0, i - 1), math.min(lines.length, i + 3))
            .mkString(" ")
          if (!ctx.contains("partitionBy")) {
            val back = lines.slice(math.max(0, i - 8), i + 1)
              .mkString("\n").toLowerCase
            if (!back.contains("bounded") && !back.contains("grain"))
              offenders += s"${p}:${i + 1}"
          }
        }
      }
    }
    val bad = offenders.result()
    assert(bad.isEmpty,
      "un-partitioned windows with no bounded-grain justification:\n" +
        bad.mkString("\n"))
  }
}
