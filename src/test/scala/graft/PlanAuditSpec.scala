package graft

/** Global plan audit: no query in the driver surface may plan a
  * cartesian product or fall back to a nested-loop join — the two
  * shapes that silently stop scaling. The one exemption is the
  * documented brute-force baseline (e_cosine_topk broadcasts the tiny
  * query set against one corpus scan: that nested loop IS the
  * operator, and the ANN paths exist to avoid it at scale).
  */
class PlanAuditSpec extends SparkSpec {

  private val exempt = Set(
    "e_cosine_topk", // intentional broadcast×scan baseline
    "e_knn_labels"   // builds on the same brute-force baseline scan
  )

  test("no CartesianProduct / BroadcastNestedLoopJoin anywhere in the surface") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (exempt(name)) None
      else {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(plan.contains)
        if (bad.nonEmpty) Some(s"$name -> ${bad.mkString(",")}") else None
      }
    }
    assert(offenders.isEmpty, s"scale-killer join shapes:\n${offenders.mkString("\n")}")
  }
}
