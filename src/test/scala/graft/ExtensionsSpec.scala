package graft

import org.apache.spark.sql.SparkSessionExtensions

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects all engine functions without error") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // builder-time injection path
  }

  test("registered functions are callable from SQL") {
    graft.functions.ensureRegistered(spark)
    val row = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       word_shingles('a b c d', 3) AS sh""".stripMargin).collect()(0)
    assert(row.getDouble(0) == 11.0)
    assert(row.getSeq[String](1) == Seq("a b c", "b c d"))
    val agg = spark.sql(
      """SELECT hdr_summary(hdr_sketch(v)).p50 AS p50
        |FROM VALUES (1L), (2L), (3L), (4L), (100L) AS t(v)""".stripMargin).collect()(0)
    assert(agg.getLong(0) == 3L)
  }

  test("lsh_sigs and ivf_probe are callable from SQL") {
    graft.functions.ensureRegistered(spark)
    val sigs = spark.sql(
      "SELECT lsh_sigs(array(1.0D, -2.0D, 0.5D, 3.0D), 4, 2, 3, 42) AS s")
      .collect()(0).getSeq[Long](0)
    assert(sigs.length == 3 && sigs.forall(s => s >= 0 && s < 4))
    val probe = spark.sql(
      """SELECT ivf_probe(array(1.0D, 0.0D),
        |  array(array(1.0D, 0.0D), array(0.0D, 1.0D), array(-1.0D, 0.0D)), 2) AS p""".stripMargin)
      .collect()(0).getSeq[Int](0)
    assert(probe == Seq(0, 1)) // nearest centroid first
  }
}
