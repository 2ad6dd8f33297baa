package graft.tools

import org.apache.spark.sql.functions._

/** BASELINE.md §G21: the LEARNED-quality curation facade at the §G16
  * decades — does replacing the heuristic stage-2 gate with a trained
  * classifier ([[graft.ops.TextAnalysis.trainQualityClassifier]] via
  * `Params(classifierWeights = Some(w))`) hold the naked-defaults
  * sub-linear scaling, or does the per-doc featurize + σ-score pass
  * bend the curve?
  *
  * Per the §G16 convention: GenScaleData corpus at <dir>, JIT warm pass
  * on sf0.001 first, timings from THIS position in a fresh JVM (one
  * decade per invocation — §G16's cross-row contention note).
  * Training is SELF-DISTILLED (pos = heuristic quality ≥ corpus
  * median, neg = rest — the FastText-style "train a cheap classifier
  * to reproduce an expensive signal" setup): the GenScaleData corpus
  * has a uniform vocab across sources, so the d_quality_train
  * src0-vs-rest convention has no signal here and a gate trained on it
  * keeps ZERO docs (measured), which would let every later stage run
  * empty and fake the scaling. Train and gate are timed separately
  * because a deployment trains once per corpus rev but gates every run.
  *
  * Usage: Test/runMain graft.tools.TrainedGateStudy <decadeDir>
  */
object TrainedGateStudy {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.builder(32, 32)
      .appName("graft-trained-gate-study").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(d: String): (Double, Double, Long, Long) = {
      val docs = graft.Tables.documents(spark, d)
      val t0 = System.nanoTime()
      val scored = docs.select(col("doc_id"), col("text"),
        graft.ops.TextAnalysis.qualityScore(col("text")).as("__q"))
        .localCheckpoint()
      val med = scored.stat.approxQuantile("__q", Array(0.5), 0.001)(0)
      val w = graft.ops.TextAnalysis.trainQualityClassifier(
        scored.where(col("__q") >= med),
        scored.where(col("__q") < med), steps = 2).localCheckpoint()
      val nW = w.count() // force training
      val tTrain = (System.nanoTime() - t0) / 1e9
      // the §G16 corpus/benchmark split, for row comparability. NOTE
      // (as in §G16): on this synthetic corpus the 31-word vocab makes
      // every survivor share shingles with the benchmark, so stage 5
      // decontaminates to 0 kept — the COST is still real (stages 1-4
      // plus the full probe pass run on real survivor volumes), and it
      // is the same property the §G16 heuristic-gate rows carry.
      val t1 = System.nanoTime()
      val (curated, funnel) = graft.ops.Curation.run(
        docs.where(col("doc_id") % 10 =!= 0),
        docs.where(col("doc_id") % 10 === 0),
        graft.ops.Curation.Params(classifierWeights = Some(w)))
      graft.Bench.force(curated)
      graft.Bench.force(funnel)
      val tRun = (System.nanoTime() - t1) / 1e9
      (tTrain, tRun, nW, curated.count())
    }
    runOnce("/root/testdata/sf0.001") // JIT/codegen warm
    val (tTrain, tRun, nW, kept) = runOnce(dir)
    println(f"""{"dir":"$dir","train_sec":$tTrain%.2f,"run_sec":$tRun%.2f,"weight_rows":$nW,"kept":$kept}""")
    spark.stop()
  }
}
