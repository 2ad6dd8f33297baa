package graft.tools

import graft.{GraftSession, SparkEntry}

/** Adversarial-input parity corpus for the DoReMi oracle rows (r10
  * ADVICE): domains the driver corpus never exercises —
  *
  *   - a NULL-source domain (missing metadata; a real group whose
  *     factor must compound and whose counts must survive every join)
  *   - a domain whose docs are ALL single-token (present in the
  *     unigram store but absent from the bigram/n_docs stores — its
  *     unigram mass must scale by the DEFAULT factor, not vanish)
  *   - a single-domain corpus (ma = 0 every round: the degenerate
  *     all-factors-1e6 state, where the engine must scale round 2
  *     unconditionally exactly like the SQL)
  *
  * Usage: Test/runMain graft.tools.GenDoremiParity <outBase>
  * Writes <outBase>/mixed/documents.parquet and
  * <outBase>/single/documents.parquet, the engine results as
  * <outBase>/<case>/engine.parquet, and the oracle SQL as
  * <outBase>/oracle_sql.txt. scripts/doremi_parity.py replays the SQL
  * in DuckDB and diffs.
  */
object GenDoremiParity {
  def main(args: Array[String]): Unit = {
    val base = args(0)
    val spark = GraftSession.builder(8, 8).appName("graft-doremi-parity").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val vocab = Seq("the", "cat", "sat", "on", "mat", "and", "dog", "ran")
    val fluent = (0 until 6).map(i =>
      (i.toLong, "fluent", "the cat sat on the mat and the dog ran"))
    val garbled = (6 until 12).map { i =>
      val r = new scala.util.Random(i)
      (i.toLong, "garbled", r.shuffle(vocab ++ vocab).mkString(" "))
    }
    val nullSrc = (20 until 26).map { i =>
      val r = new scala.util.Random(100 + i)
      (i.toLong, null.asInstanceOf[String], r.shuffle(vocab ++ vocab).mkString(" "))
    }
    // ALL docs single-token: unigram mass only, never scored
    val oneTok = (30 until 34).map(i => (i.toLong, "terse", vocab(i % vocab.size)))
    val mixed = (fluent ++ garbled ++ nullSrc ++ oneTok)
      .toDF("doc_id", "source", "text")
    val single = fluent.toDF("doc_id", "source", "text")

    for ((name, df) <- Seq("mixed" -> mixed, "single" -> single)) {
      val dir = s"$base/$name"
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      SparkEntry.queries("d_doremi_weights")(spark, dir)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/engine.parquet")
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/oracle_sql.txt"),
      SparkEntry.oracleSql("d_doremi_weights")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
