package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** Gopher rule battery, CCNet perplexity buckets, and per-source token
  * KL — the round-7 quality/drift additions. */
class TextRulesSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("gopher rules: hand-built fixture trips each rule independently") {
    import spark.implicits._
    val fluent = ("the quick brown fox and the lazy dog of the farm " * 4).trim // 40 words
    val fixture = Seq(
      // 0: clean multi-line prose — passes everything
      (0L, fluent),
      // 1: too short (3 words)
      (1L, "the of and"),
      // 2: hash spam — 8 hashes on 20 words trips r_symbol (8*10 > 20)
      (2L, "# # # # # # # # " + ("the cat sat on a mat in the warm sun and " +
        "the dog ran to the red barn").trim),
      // 3: every line a bullet (trips r_bullet: 3/3 > 9/10)
      (3L, "- the first point of the list\n- the second point of the list\n" +
        "- the third point of the list and more words to pass the count " +
        "for the test of the rule here now"),
      // 4: every line ends with ellipsis (2/2 > 3/10)
      (4L, "the story begins with a fox and a dog in the woods...\n" +
        "and then it continues for a while with more of the tale..."),
      // 5: numeric soup — no letters in most words (trips r_alpha)
      (5L, "111 222 333 444 555 666 777 888 999 000 111 222 333 444 555 " +
        "666 777 888 999 000 the of"),
      // 6: no stopwords (trips r_stopwords)
      (6L, "quick brown fox jumps over lazy dog near red barn every dawn " +
        "quick brown fox jumps over lazy dog near red barn every dawn")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(fixture, minWords = 10L, maxWords = 1000L)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    def flag(id: Long, name: String): Boolean =
      got(id).getBoolean(got(id).fieldIndex(name))
    assert(flag(0L, "keep"), s"clean doc rejected: ${got(0L)}")
    assert(!flag(1L, "r_word_count") && !flag(1L, "keep"))
    assert(!flag(2L, "r_symbol") && !flag(2L, "keep"))
    assert(!flag(3L, "r_bullet") && !flag(3L, "keep"))
    assert(!flag(4L, "r_ellipsis") && !flag(4L, "keep"))
    assert(!flag(5L, "r_alpha") && !flag(5L, "keep"))
    assert(!flag(6L, "r_stopwords") && !flag(6L, "keep"))
    // each trap doc fails ONLY its targeted rule family (word count can
    // co-trip on the short doc; the others are engineered to pass it)
    for ((id, rule) <- Seq(2L -> "r_symbol", 3L -> "r_bullet",
        4L -> "r_ellipsis", 5L -> "r_alpha", 6L -> "r_stopwords"))
      assert(flag(id, "r_word_count"), s"doc $id tripped word count too")
  }

  test("gopher rules: empty doc fails word count and stopwords, no crash") {
    import spark.implicits._
    val got = TextAnalysis.gopherRules(Seq((0L, "")).toDF("doc_id", "text"))
      .collect()(0)
    assert(!got.getBoolean(got.fieldIndex("keep")))
    assert(got.getLong(got.fieldIndex("n_words")) == 0L)
    assert(got.getLong(got.fieldIndex("mean_len_e6")) == 0L)
  }

  test("perplexity buckets: tiles partition each source, head outranks tail") {
    val got = TextAnalysis.perplexityBuckets(docs).collect()
    assert(got.nonEmpty)
    val bySource = got.groupBy(_.getString(1))
    for ((src, rows) <- bySource) {
      val buckets = rows.map(_.getLong(4)).toSet
      assert(buckets.subsetOf(Set(1L, 2L, 3L)), s"$src buckets $buckets")
      // tile sizes differ by at most 1 (NTILE contract)
      val sizes = rows.groupBy(_.getLong(4)).values.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"$src tile sizes $sizes")
      // every head doc scores >= every tail doc within the source
      val head = rows.filter(_.getLong(4) == 1L).map(_.getDouble(3))
      val tail = rows.filter(_.getLong(4) == buckets.max).map(_.getDouble(3))
      if (head.nonEmpty && tail.nonEmpty)
        assert(head.min >= tail.max - 1e-9, s"$src head/tail inverted")
    }
  }

  test("source KL: identical halves score 0, disjoint-vocab source dominates") {
    import spark.implicits._
    val same = Seq.tabulate(40)(i =>
      (i.toLong, if (i % 2 == 0) "alpha" else "beta", "the cat sat on the mat"))
      .toDF("doc_id", "source", "text")
    val kl0 = TextAnalysis.sourceTokenKl(same).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(kl0.values.forall(_ <= 1L), s"identical sources drifted: $kl0")
    // a source whose vocabulary is disjoint from everything else
    val mixed = same.union(Seq.tabulate(10)(i =>
      ((100 + i).toLong, "gamma", "zorp blix quux fnord zorp blix"))
      .toDF("doc_id", "source", "text"))
    val kl = TextAnalysis.sourceTokenKl(mixed).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(kl("gamma") > kl("alpha") && kl("gamma") > kl("beta"),
      s"disjoint source not dominant: $kl")
    assert(kl("gamma") > 500000L, s"gamma KL suspiciously small: $kl")
  }

  test("tokenEntropy: exact quantized unigram entropy, no shuffle") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b b"),          // uniform over 2 tokens: ln 2
      (2L, "a a a a"),          // single token type: 0
      (3L, "a b c d"),          // uniform over 4: ln 4
      (4L, "a a a b"),          // skewed: (3·ln(4/3) + 1·ln 4) / 4
      (5L, ""),                 // empty: 0, 0 tokens
      (6L, "z y x w z y x w")   // order/sortedness must not matter: ln 4
    ).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.tokenEntropy(docs).orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    def q(x: Double) = math.round(x * 1e6)
    val ln2 = q(math.log(2.0))   // 693147
    val ln4 = q(math.log(4.0))   // 1386294
    val skew = (3 * q(math.log(4.0 / 3.0)) + q(math.log(4.0))) / 4
    assert(got == Seq(
      (1L, 4L, 2L, 2 * ln2 * 2 / 4),
      (2L, 4L, 1L, 0L),
      (3L, 4L, 4L, ln4),
      (4L, 4L, 2L, skew),
      (5L, 0L, 0L, 0L),
      (6L, 8L, 4L, ln4)), s"got $got")
    // the plan is a pure projection: no exchange anywhere
    val plan = graft.ops.TextAnalysis.tokenEntropy(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"tokenEntropy must not shuffle:\n$plan")
  }
}
