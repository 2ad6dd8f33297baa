package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Sign projection (JL) and centroid outliers — round-7 embedding
  * additions. */
class ProjectionSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  test("sign projection: deterministic, linear, norm-preserving in expectation") {
    val p1 = Similarity.signProject(emb, outDims = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val p2 = Similarity.signProject(emb, outDims = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(p1 == p2, "projection not deterministic")
    val n = emb.count()
    assert(p1.size == n * 16, s"expected ${n * 16} rows, got ${p1.size}")
    // E[y_j^2] = ||q||^2 for independent ±1 signs; with 16 samples the
    // mean concentrates — require the ratio within [0.4, 2.5] for at
    // least 90% of vectors (a loose JL sanity bound, not a tail case)
    val qNorms = emb
      .select(col("vec_id"), aggregate(
        transform(col("embedding").cast("array<double>"),
          x => round(x * 1000).cast("long")),
        lit(0L), (acc, v) => acc + v * v).as("q2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ratios = qNorms.collect { case (id, q2) if q2 > 0 =>
      val meanY2 = (0 until 16).map(j => { val y = p1((id, j.toLong)); y.toDouble * y }).sum / 16.0
      meanY2 / q2.toDouble
    }
    val inBand = ratios.count(r => r >= 0.4 && r <= 2.5)
    assert(inBand.toDouble / ratios.size >= 0.9,
      s"JL norm preservation violated: ${inBand}/${ratios.size} in band")
  }

  test("centroid outliers: hand-computed fixture, floor centroid, rank order") {
    import spark.implicits._
    val fx = Seq(
      (1L, 0, Array(0f, 0f)),
      (2L, 0, Array(0f, 2f)),
      (3L, 0, Array(10f, 10f)),
      (4L, 1, Array(1f, 1f))
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.centroidOutliers(fx, k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // group 0: centroid = (floor(10000/3), floor(12000/3)) = (3333, 4000)
    //   dist2: id3 = 6667^2 + 6000^2 = 80448889; id1 = 3333^2 + 4000^2 =
    //   27108889; id2 = 3333^2 + 2000^2 = 15108889
    assert(got.filter(_._1 == 0).sortBy(_._2).toSeq == Seq(
      (0, 1L, 3L, 80448889L), (0, 2L, 1L, 27108889L), (0, 3L, 2L, 15108889L)))
    // singleton group: its only vector IS the centroid, dist 0
    assert(got.filter(_._1 == 1).toSeq == Seq((1, 1L, 4L, 0L)))
  }

  test("centroid outliers on the driver table: k bounds each group, dist2 descending") {
    val got = Similarity.centroidOutliers(emb, k = 5).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    for ((label, rows0) <- got.groupBy(_._1)) {
      val rows = rows0.sortBy(_._2)
      assert(rows.length <= 5, s"label $label got ${rows.length} rows")
      assert(rows.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
        s"label $label dist2 not descending")
    }
  }
}
