package graft

import graft.ops.Dedup

/** Exercises the DISTRIBUTED connected-components path of
  * [[Dedup.dupClusters]] on the real sf0.1 near-dup pair graph — the
  * exact frame every oracle/bench run feeds it — rather than only on
  * the random graphs the property spec generates. Every shipped scale
  * factor's edge count sits under the default driverEdgeCap, so
  * without this forcing the min-label-propagation branch that carries
  * the operator's 100 TB claim would never consume corpus-shaped data
  * (long-chain components, skewed shingle overlap, id gaps).
  */
class DupClustersScaleSpec extends SparkSpec {

  test("distributed label propagation equals driver union-find on the sf0.1 pair graph") {
    val corpus = Tables.documents(spark, "/root/testdata/sf0.1")
    // threshold 0.5, k=3: the same pair set the d_dup_clusters query
    // builds; lazily checkpointed so both closure passes share one
    // shingle/join evaluation
    val pairs = Dedup.jaccardPairsAdaptive(corpus, k = 3, threshold = 0.5)
      .localCheckpoint(eager = false)
    def run(cap: Long): Seq[(Long, Long)] =
      Dedup.dupClusters(pairs, driverEdgeCap = cap)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaDriver = run(Long.MaxValue) // always collects: union-find
    val viaDist = run(0L)              // never collects: label propagation
    assert(viaDriver.nonEmpty, "sf0.1 pair graph is unexpectedly empty")
    assert(viaDist == viaDriver,
      s"paths disagree on ${viaDist.diff(viaDriver).take(5)} ...")
  }
}
