package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r14 lazy-checkpoint race sweep (BASELINE.md §G16 addendum
  * 2, VERDICT r13 #2): a LAZY shared checkpoint whose first
  * materialization is pulled from multiple plan sites inside one
  * action is raced by the per-block getOrCompute lock into a
  * schedule-dependent pathology (19.7 s vs 353 s on identical code) —
  * bit-correct, so invisible to every oracle. The sweep classified
  * every sharing point; this audit keeps the classification honest:
  *
  *   1. The API must stay declaration-forced: `Checkpoints.shared` and
  *      `sharedCheckpoint` must have NO default for `eager`, so a new
  *      call site cannot silently inherit the raced lazy mode.
  *   2. Every `eager = false` site must carry a written justification
  *      within 6 lines above it — `lazy-safe:` naming the single-site
  *      action that materializes it, or `forced` for the curation
  *      facade's lazy-plus-fused-aggregate shape (materialized
  *      immediately by forceCount, the cheapest race-free pattern).
  *
  * A source-shape audit, like PlanAuditSpec's whitelist honesty
  * checks: it cannot prove a justification TRUE, but it makes
  * reintroducing an unclassified lazy site a loud, reviewable act
  * instead of a silent default.
  */
class CheckpointAuditSpec extends AnyFunSuite {

  private def mainSources: Seq[Path] = {
    val root = Paths.get("src/main/scala")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq.sortBy(_.toString)
  }

  test("Checkpoints API has no lazy default — every site must declare its race class") {
    val src = new String(
      Files.readAllBytes(Paths.get("src/main/scala/graft/ops/Checkpoints.scala")),
      "UTF-8")
    assert(src.contains("def shared(df: DataFrame, eager: Boolean): DataFrame"),
      "Checkpoints.shared must keep `eager` default-free (the r14 race-class pin)")
    assert(src.contains("def sharedCheckpoint(eager: Boolean): DataFrame"),
      "SharedOps.sharedCheckpoint must keep `eager` default-free (the r14 race-class pin)")
    assert(!src.contains("eager: Boolean = false"),
      "no lazy default may reappear anywhere in the Checkpoints API")
  }

  test("every eager = false sharing point carries a lazy-safe/forced justification") {
    val offenders = Seq.newBuilder[String]
    for (p <- mainSources) {
      val lines = Files.readAllLines(p).asScala
      for (i <- lines.indices) {
        val l = lines(i)
        val isLazySite =
          (l.contains(".sharedCheckpoint(eager = false)") ||
            (l.contains("Checkpoints.shared(") && l.contains("eager = false")) ||
            // multi-line direct call: `Checkpoints.shared(` with the
            // eager = false argument up to 6 lines below the open paren
            (l.contains("eager = false") && !l.contains("sharedCheckpoint") &&
              lines.slice(math.max(0, i - 6), i + 1)
                .exists(_.contains("Checkpoints.shared("))))
        if (isLazySite) {
          val context = lines.slice(math.max(0, i - 8), math.min(lines.size, i + 3))
          // the justification must be an EXPLICIT marker — `lazy-safe`
          // or the word `forced` (word-bounded: a nearby unrelated
          // 'forces a shuffle' comment must not satisfy it). Keeps the
          // check aligned with the doc above (ADVICE r14: the doc
          // promised `forced` but the code only accepted `lazy-safe`).
          val justified = context.exists(c =>
            c.contains("lazy-safe") || c.matches(".*\\bforced\\b.*"))
          if (!justified) offenders += s"$p:${i + 1}: $l"
        }
      }
    }
    val bad = offenders.result()
    assert(bad.isEmpty,
      "lazy shared checkpoints without a written justification (add a " +
        "`lazy-safe: <materializing action>` or `forced` comment, or make " +
        s"the site eager):\n${bad.mkString("\n")}")
  }
}
