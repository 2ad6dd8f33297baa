package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property tests for the round-4 curation operators: invariants that
  * must hold for ANY input, not just the oracle corpus.
  */
class PipelineOpsPropertySpec extends SparkSpec {

  private def forAllSeeded[A](gen: Gen[A], trials: Int = 30)(body: A => Unit): Unit =
    (0 until trials).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  test("dup clusters: distributed and driver paths agree on random graphs") {
    import graft.ops.Dedup
    import spark.implicits._
    // random edge lists over a small id space force merged components,
    // chains, self-contained cliques and isolated pairs
    val genEdges = for {
      n <- Gen.choose(1, 40)
      edges <- Gen.listOfN(n, for {
        a <- Gen.choose(0L, 25L); b <- Gen.choose(0L, 25L) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges
    forAllSeeded(genEdges, trials = 8) { edges =>
      val df = edges.toDF("id_a", "id_b")
      val driver = Dedup.dupClusters(df).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val dist = Dedup.dupClusters(df, driverEdgeCap = 0L).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(dist == driver, s"paths disagree on $edges")
      // every label is the component min: labels are fixpoints
      driver.foreach { case (_, l) => assert(driver(l) == l) }
    }
  }

  test("epoch shuffle: bijection and determinism for any id set, incl. overflow-adjacent") {
    import graft.ops.Sampling
    import spark.implicits._
    val genIds = for {
      n <- Gen.choose(1, 60)
      ids <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(0L, 100L),
        Gen.choose(1000000000L, 1000000014L),   // around the mix prime
        Gen.choose(Long.MaxValue - 20L, Long.MaxValue))) // ANSI-overflow edge
    } yield ids.distinct
    forAllSeeded(genIds, trials = 8) { ids =>
      val df = ids.toDF("doc_id")
      val out = Sampling.epochShuffle(df, seed = 3L).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // total, positions a bijection onto [0, n)
      assert(out.keySet == ids.toSet)
      assert(out.values.toSeq.sorted == ids.indices.map(_.toLong))
      // stable under partitioning
      val out2 = Sampling.epochShuffle(df.repartition(5), seed = 3L).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out2 == out)
    }
  }

  test("span dedup: token conservation and idempotence on any corpus") {
    import graft.ops.TextAnalysis
    import spark.implicits._
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val genDocs = for {
      n <- Gen.choose(1, 12)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 10)
        ws <- Gen.listOfN(len, word)
      } yield ws.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    forAllSeeded(genDocs, trials = 8) { rows =>
      val df = rows.toDF("doc_id", "text")
      val out = TextAnalysis.spanDedup(df, n = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      // kept tokens reconcile: |text_dedup| = n_tokens - n_removed
      out.foreach { case (_, n, rem, txt) =>
        val kept = if (txt.isEmpty) 0 else txt.split(" ").length
        assert(kept == n - rem && rem >= 0 && rem <= n)
      }
      // re-running on the survivor text removes nothing new WITHIN a
      // document (cross-doc windows can newly align after excision, so
      // idempotence is per-doc: a doc with no removals stays fixed)
      val untouched = out.filter(_._3 == 0L).map(x => x._1 -> x._4).toMap
      if (untouched.nonEmpty) {
        val again = TextAnalysis.spanDedup(
            untouched.toSeq.toDF("doc_id", "text"), n = 3)
          .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
        // the untouched docs' MUTUAL duplicates may still trigger; only
        // pin that tokenization round-trips (normalization stability)
        again.foreach { case (id, txt) =>
          assert(txt.split(" ").filter(_.nonEmpty).length <=
            untouched(id).split(" ").filter(_.nonEmpty).length)
        }
      }
    }
  }

  test("detHash lands in [0, Buckets) and is stable for any non-negative id") {
    import graft.ops.Sampling
    import spark.implicits._
    val ids = Seq(0L, 1L, 96L, 97L, 1000000006L, 1000000007L, Long.MaxValue)
    val df = ids.toDF("doc_id")
    val h1 = df.select(Sampling.detHash(col("doc_id"))).collect().map(_.getLong(0))
    val h2 = df.select(Sampling.detHash(col("doc_id"))).collect().map(_.getLong(0))
    assert(h1.toSeq == h2.toSeq)
    assert(h1.forall(h => h >= 0 && h < Sampling.Buckets))
  }

  test("mixture sample: f=1 keeps all, f=0 drops all, samples nest by fraction") {
    import graft.ops.Sampling
    import spark.implicits._
    val rows = for { g <- Seq("a", "b", "c"); i <- 0 until 60 }
      yield (g, g.hashCode.abs.toLong * 1000 + i)
    val df = rows.toDF("grp", "doc_id")
    def ids(fr: Map[String, Double], d: Double = 0.0) =
      Sampling.mixtureSample(df, "grp", fr, defaultFraction = d)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    // full keep / full drop per group
    val full = ids(Map("a" -> 1.0))
    assert(full == rows.filter(_._1 == "a").map(_._2).toSet)
    assert(ids(Map("a" -> 0.0), d = 0.0).isEmpty)
    // nesting: a smaller fraction's sample is a subset of a larger's
    val half = ids(Map("a" -> 0.5, "b" -> 0.5))
    val fifth = ids(Map("a" -> 0.2, "b" -> 0.2))
    assert(fifth.subsetOf(half))
    // default fraction applies to groups not in the map
    val withDefault = ids(Map("a" -> 1.0), d = 1.0)
    assert(withDefault == rows.map(_._2).toSet)
  }

  test("stratified sample: per-stratum counts = min(k, stratum size); subset of input") {
    import graft.ops.Sampling
    import spark.implicits._
    val rows = for { g <- 'a' to 'e'; i <- 0 until (g - 'a') * 3 + 1 }
      yield (g.toString, (g - 'a') * 100L + i)
    val df = rows.toDF("grp", "doc_id")
    val out = Sampling.stratifiedSample(df, "grp", k = 4, idCol = "doc_id")
    val counts = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    sizes.foreach { case (g, n) => assert(counts(g) == math.min(4L, n)) }
    val inIds = rows.map(_._2).toSet
    assert(out.select("doc_id").collect().forall(r => inIds(r.getLong(0))))
  }

  test("int8 quantization: |q| <= 127 and max|v| maps to ±127, any vector") {
    import graft.ops.Similarity
    import spark.implicits._
    val vecGen: Gen[List[Float]] = for {
      n <- Gen.chooseNum(1, 16)
      vs <- Gen.listOfN(n, Gen.chooseNum(-1000f, 1000f))
    } yield vs
    forAllSeeded(vecGen) { vs =>
      val df = Seq((1L, vs.toArray)).toDF("vec_id", "embedding")
      val r = Similarity.quantizeInt8(df).collect()(0)
      val (qMin, qMax) = (r.getLong(3), r.getLong(4))
      assert(qMin >= -127 && qMax <= 127, s"q out of range for $vs")
      val m = vs.map(math.abs).max
      if (m > 0f) // the max-magnitude element quantizes to ±127 exactly
        assert(qMax == 127 || qMin == -127, s"no extreme hit for $vs")
    }
  }

  test("repetition ratio in (0, 1]; 1 iff all n-grams identical") {
    import graft.ops.TextAnalysis
    import spark.implicits._
    val docGen: Gen[String] = for {
      n <- Gen.chooseNum(1, 30)
      ws <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta"))
    } yield ws.mkString(" ")
    forAllSeeded(docGen) { text =>
      val r = TextAnalysis.ngramRepetition(Seq((1L, text)).toDF("doc_id", "text"))
        .collect()(0)
      val (total, maxFreq, rep) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(maxFreq >= 1 && maxFreq <= total)
      assert(rep > 0.0 && rep <= 1.0, s"rep=$rep for '$text'")
    }
  }

  test("pmi pairs equal a naive self-join reference on random corpora") {
    import spark.implicits._
    import graft.ops.{Dedup, TextAnalysis}
    val rnd = new scala.util.Random(13)
    val words = Seq("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docs = Seq.tabulate(120) { i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(6))(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val got = TextAnalysis.pmiPairs(docs, vocabSize = 5, minPairDocs = 2L)
      .as[(String, String, Long, Double)].collect().toSeq
    // reference: explicit df/pair-count self-join over the same vocab
    val docTok = docs.select(col("doc_id"),
      explode(array_distinct(Dedup.tokens(col("text")))).as("token"))
    val dfm = docTok.groupBy("token").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val vocab = dfm.toSeq.sortBy { case (t, d) => (-d, t) }.take(5).toMap
    val perDoc = docTok.as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet.filter(vocab.contains)).toMap
    val n = docs.count()
    val want = perDoc.values
      .flatMap(s => s.toSeq.sorted.combinations(2).map { case Seq(a, b) => (a, b) })
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter(_._2 >= 2L)
      .map { case ((a, b), dab) =>
        val pmi = math.log(dab.toDouble * n / (vocab(a).toDouble * vocab(b).toDouble))
        // HALF_UP like Spark round, not rint's half-even
        (a, b, dab, java.math.BigDecimal.valueOf(pmi)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
      }.sortBy(p => (p._1, p._2))
    assert(got == want)
  }

  test("redaction is idempotent: redacting redacted text changes nothing") {
    import graft.ops.TextAnalysis
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a@b.co or see https://x.io/p?id=1234567 ref 99887766"),
      (2L, "nested http://a.b/c@d.ef 123456789012"),
      (3L, "plain words only")).toDF("doc_id", "text")
    val once = TextAnalysis.redact(docs).select(col("doc_id"), col("redacted").as("text"))
    val twice = TextAnalysis.redact(once).orderBy("doc_id").collect()
    val first = TextAnalysis.redact(docs).orderBy("doc_id").collect()
    twice.zip(first).foreach { case (t, f) =>
      assert(t.getString(1) == f.getString(1))
      assert(t.getLong(2) == 0 && t.getLong(3) == 0 && t.getLong(4) == 0,
        s"second pass still found matches: $t")
    }
  }

  test("repeated spans equal a naive reference on random corpora") {
    import graft.ops.TextAnalysis
    import spark.implicits._
    val genCorpus = for {
      nDocs <- Gen.choose(2, 12)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(0, 14)
        toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e"))
      } yield toks.mkString(" "))
      n <- Gen.choose(2, 5)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, n)
    forAllSeeded(genCorpus, trials = 12) { case (docs, n) =>
      def spansOf(text: String): Seq[String] = {
        val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
        if (toks.isEmpty) Seq("") // blank text → one empty whole-doc span
        else if (toks.size < n) Seq(toks.mkString(" "))
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      }
      val all = docs.map { case (id, t) => id -> spansOf(t) }
      val shared = all.flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
        .groupBy(_._1).filter(_._2.size >= 2).keySet
      val expect = all.map { case (id, ss) =>
        val hits = ss.count(shared)
        (id, ss.size.toLong, hits.toLong,
          BigDecimal(hits.toDouble / ss.size)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSet
      val got = TextAnalysis.repeatedSpans(docs.toDF("doc_id", "text"), n = n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == expect, s"n=$n docs=$docs")
    }
  }

  test("misra-gries: local+merged summaries keep the n/(cap+1) bound on any stream") {
    import graft.ops.TextAnalysis.{mgLocal, mgMerge}
    // random token streams over a skewed alphabet, random partition
    // splits, random merge arity — the mergeable-summaries guarantee
    // must survive every shape
    val genStream = for {
      n <- Gen.choose(1, 400)
      toks <- Gen.listOfN(n, Gen.frequency(
        8 -> Gen.const("hot"), 4 -> Gen.const("warm"),
        2 -> Gen.oneOf("t1", "t2", "t3"),
        1 -> Gen.choose(0, 50).map("cold" + _)))
      cap <- Gen.choose(1, 8)
      cuts <- Gen.listOfN(3, Gen.choose(0, n))
    } yield (toks, cap, cuts.sorted)
    forAllSeeded(genStream, trials = 40) { case (toks, cap, cuts) =>
      val truth = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = toks.size.toLong / (cap + 1) // floor: est error is integral
      val bounds = (0 +: cuts :+ toks.size).distinct.sorted
      val parts = bounds.zip(bounds.tail).map { case (a, b) => toks.slice(a, b) }
      val merged = parts.map(p => mgLocal(p.iterator, cap))
        .reduce((a, b) => mgMerge(a, b, cap))
      assert(merged.size <= cap)
      val est = merged.toMap
      truth.foreach { case (t, c) =>
        val e = est.getOrElse(t, 0L)
        assert(e <= c, s"overestimate for $t: $e > $c")
        assert(c - e <= bound, s"error past n/(cap+1) for $t: ${c - e} > $bound")
      }
    }
  }

  test("CMS: never undercounts on random corpora; split-merge equals whole") {
    import graft.ops.TextAnalysis
    import spark.implicits._
    val genDocs = for {
      n <- Gen.choose(1, 25)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(0, 12)
        ws <- Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff"))
      } yield ws.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    forAllSeeded(genDocs, trials = 6) { rows =>
      val docs = rows.toDF("doc_id", "text")
      // tight width forces collisions: est >= truth must still hold
      val rep = TextAnalysis.cmsTopEstimates(docs, k = 10, depth = 3, width = 4L)
        .collect()
      rep.foreach(r => assert(r.getLong(2) >= r.getLong(1),
        s"CMS undercounted ${r.getString(0)}"))
      val whole = TextAnalysis.cmsSketch(docs, 3, 4L)
        .orderBy("r", "b").collect().toSeq
      val a = TextAnalysis.cmsSketch(docs.where(col("doc_id") % 2 === 0), 3, 4L)
      val b = TextAnalysis.cmsSketch(docs.where(col("doc_id") % 2 === 1), 3, 4L)
      val merged = a.unionByName(b).groupBy("r", "b").agg(sum("cnt").as("cnt"))
        .orderBy("r", "b").collect().toSeq
      assert(merged == whole)
    }
  }

  test("rrfFuse: invariant under arm order and candidate row order") {
    import graft.ops.Retrieval
    import spark.implicits._
    val genArms = for {
      nA <- Gen.choose(1, 8); nB <- Gen.choose(1, 8)
      idsA <- Gen.listOfN(nA, Gen.choose(0L, 15L)).map(_.distinct)
      idsB <- Gen.listOfN(nB, Gen.choose(0L, 15L)).map(_.distinct)
    } yield (idsA.zipWithIndex.map { case (id, r) => (0L, id, r + 1L) },
             idsB.zipWithIndex.map { case (id, r) => (0L, id, r + 1L) })
    forAllSeeded(genArms, trials = 8) { case (armA, armB) =>
      def df(rows: Seq[(Long, Long, Long)]) = rows.toDF("q_id", "n_id", "rank")
      val ab = Retrieval.rrfFuse(Seq(df(armA), df(armB)), k = 20)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val ba = Retrieval.rrfFuse(Seq(df(armB), df(armA)), k = 20)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(ab == ba, s"arm order changed the fusion: $armA / $armB")
      val shuf = Retrieval.rrfFuse(
        Seq(df(scala.util.Random.shuffle(armA)), df(armB)), k = 20)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(shuf == ab)
    }
  }

  test("temperature rates: expected kept volume hits the target up to caps, any mix") {
    import graft.ops.Sampling
    import spark.implicits._
    val genMix = for {
      k <- Gen.choose(1, 6)
      sizes <- Gen.listOfN(k, Gen.choose(1, 400))
    } yield sizes
    forAllSeeded(genMix, trials = 8) { sizes =>
      var next = 0L
      val rows = sizes.zipWithIndex.flatMap { case (n, s) =>
        (0 until n).map { _ => next += 1; (next, s"src$s") }
      }
      val docs = rows.toDF("doc_id", "source")
      val rates = Sampling.temperatureRates(docs, alpha = 0.5, targetFrac = 0.4)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      rates.foreach { case (_, _, r) => assert(r >= 0 && r <= 1000000L) }
      val n = sizes.sum.toLong
      val target = math.floor(n * 0.4).toLong
      val expect = rates.map { case (_, ns, r) => ns * r / 1e6 }.sum
      // uncapped sources are sized to jointly hit the target; caps can
      // only LOSE volume (a boosted tail source cannot keep > 100%),
      // and quantization costs at most ~1 doc per source
      assert(expect <= target + rates.length,
        s"expected kept $expect above target $target for $sizes")
      if (rates.forall(_._3 < 1000000L))
        assert(expect >= target * 0.9 - rates.length,
          s"expected kept $expect far below target $target for $sizes")
    }
  }

  test("chunkDocs at stride = size partitions the token stream losslessly") {
    import graft.ops.{Dedup, TextAnalysis}
    import spark.implicits._
    val genDocs = for {
      n <- Gen.choose(1, 10)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(0, 30)
        ws <- Gen.listOfN(len, Gen.oneOf("w1", "w2", "w3", "w4"))
      } yield ws.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    forAllSeeded(genDocs, trials = 6) { rows =>
      val docs = rows.toDF("doc_id", "text")
      val size = 7
      val rebuilt = TextAnalysis.chunkDocs(docs, size, size)
        .orderBy("doc_id", "chunk_id")
        .collect().groupBy(_.getLong(0))
        .map { case (id, cs) =>
          id -> cs.sortBy(_.getLong(1)).map(_.getString(2)).mkString(" ") }
      val want = docs.select(col("doc_id"), concat_ws(" ",
          Dedup.tokens(col("text"))).as("nt"))
        .collect().map(r => r.getLong(0) -> r.getString(1))
        .filter(_._2.nonEmpty).toMap
      assert(rebuilt == want)
    }
  }

  test("textOverlapF1 invariants: containment pins precision, bounds always hold") {
    import graft.ops.Eval
    import spark.implicits._
    val words = Vector("aa", "bb", "cc", "dd", "ee")
    val genPairs = for {
      n <- Gen.choose(1, 10)
      rows <- Gen.listOfN(n, for {
        ref <- Gen.nonEmptyListOf(Gen.oneOf(words))
        cut <- Gen.choose(0, ref.length) // prefix ⊆ ref as a multiset
        extra <- Gen.listOf(Gen.oneOf(words))
      } yield (ref, ref.take(cut), extra))
    } yield rows.zipWithIndex.map { case ((ref, pre, extra), i) =>
      (i.toLong, pre.mkString(" "), ref.mkString(" "), extra.mkString(" "))
    }
    forAllSeeded(genPairs, trials = 8) { rows =>
      val contained = rows.map { case (id, pre, ref, _) => (id, pre, ref) }
        .toDF("doc_id", "pred", "ref")
      Eval.textOverlapF1(contained).collect().foreach { r =>
        val (np, ov, p) = (r.getLong(1), r.getLong(3), r.getLong(4))
        assert(ov == np, s"containment must make overlap = |pred|: $r")
        assert(np == 0L || p == 1000000L, s"contained pred must read precision 1: $r")
      }
      // arbitrary preds: every metric stays a valid e6 ratio and the
      // overlap never exceeds either side
      val arb = rows.map { case (id, _, ref, extra) => (id, extra, ref) }
        .toDF("doc_id", "pred", "ref")
      Eval.textOverlapF1(arb).collect().foreach { r =>
        val (np, nr, ov) = (r.getLong(1), r.getLong(2), r.getLong(3))
        assert(ov <= math.min(np, nr))
        Seq(4, 5, 6).foreach(i =>
          assert(r.getLong(i) >= 0L && r.getLong(i) <= 1000000L, s"ratio bound: $r"))
      }
    }
  }

  test("simhash pigeonhole pairs equal brute force for any corpus and maxHamming") {
    import graft.ops.Dedup
    import spark.implicits._
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val genCorpus = for {
      n <- Gen.choose(2, 25)
      d <- Gen.choose(0, 6)
      bits <- Gen.oneOf(30, 64)
      docs <- Gen.listOfN(n, Gen.nonEmptyListOf(Gen.oneOf(words)))
    } yield (docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) },
             d, bits)
    forAllSeeded(genCorpus, trials = 12) { case (rows, d, bits) =>
      val df = rows.toDF("doc_id", "text")
      val got = Dedup.simhashPairs(df, maxHamming = d, bits = bits)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val sig = Dedup.simhash(df, bits = bits)
      val want = sig.as("a").join(sig.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"),
          Dedup.hamming(col("a.simhash"), col("b.simhash")).cast("long").as("h"))
        .where(col("h") <= d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"pigeonhole missed pairs at d=$d bits=$bits")
    }
  }

  test("curriculum order: bijection, difficulty-monotone, stable across bucket counts") {
    import graft.ops.Sampling
    import spark.implicits._
    val genRows = for {
      n <- Gen.choose(1, 40)
      ids <- Gen.listOfN(n, Gen.choose(0L, 1000000L)).map(_.distinct)
      diffs <- Gen.listOfN(ids.size, Gen.choose(0L, 5L))
    } yield ids.zip(diffs)
    forAllSeeded(genRows, trials = 8) { rows =>
      val df = rows.toDF("doc_id", "d")
      val got = Sampling.curriculumOrder(df, "d", seed = 7L, buckets = 8L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // bijection onto [0, n)
      assert(got.values.toSeq.sorted == (0L until rows.size.toLong).toList)
      // difficulty never decreases along pos
      val dOf = rows.toMap
      val byPos = got.toSeq.sortBy(_._2).map(t => dOf(t._1))
      assert(byPos == byPos.sorted, s"difficulty order broken: $byPos")
      // the (d, b, k, id) order is bucket-count-INDEPENDENT in its
      // difficulty grouping: a different bucket count permutes within
      // levels only, never across
      val other = Sampling.curriculumOrder(df, "d", seed = 7L, buckets = 3L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val byPos2 = other.toSeq.sortBy(_._2).map(t => dOf(t._1))
      assert(byPos2 == byPos, "bucket count leaked across difficulty levels")
    }
  }

  test("token entropy: in [0, ln n]; 0 iff one distinct token; max iff all distinct") {
    import graft.ops.TextAnalysis
    import spark.implicits._
    val words = Vector("a", "b", "c", "d", "e", "f")
    val genDoc = Gen.nonEmptyListOf(Gen.oneOf(words)).map(_.mkString(" "))
    forAllSeeded(genDoc, trials = 20) { text =>
      val r = TextAnalysis.tokenEntropy(Seq((1L, text)).toDF("doc_id", "text"))
        .collect()(0)
      val (n, nd, e6) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val toks = text.split("\\s+").filter(_.nonEmpty)
      assert(n == toks.length && nd == toks.distinct.length)
      assert(e6 >= 0L && e6 <= math.round(math.log(n.toDouble) * 1e6) + 1,
        s"entropy out of range: $e6 for n=$n")
      if (nd == 1L) assert(e6 == 0L, s"single-type doc must score 0: $text")
      if (nd == n) assert(math.abs(e6 - math.round(math.log(n.toDouble) * 1e6)) <= 1,
        s"all-distinct doc must score ~ln n: $e6 vs n=$n")
    }
  }

  test("post-filter tail: rank-order-preserving renumber equals the per-query replay for any shortlist and keep set") {
    import spark.implicits._
    // the shared machinery BOTH filtered serves end in
    // (Similarity.filteredTopK's Post arm and PqIndexStore.filteredTopK):
    // semi-join survivors, renumber in shortlist rank order, cut at k.
    // Replayed per query in plain Scala over random shortlists/keep sets.
    val gen = for {
      nq <- Gen.choose(1, 5)
      depth <- Gen.choose(1, 12)
      k <- Gen.choose(1, 6)
      keep <- Gen.listOf(Gen.choose(0L, 30L)).map(_.toSet)
    } yield (nq, depth, k, keep)
    forAllSeeded(gen, trials = 12) { case (nq, depth, k, keep) =>
      val rnd = new scala.util.Random(nq * 1000 + depth * 10 + k)
      // a shortlist is a ranked list of DISTINCT neighbor ids per query
      val rows = (0 until nq).flatMap { q =>
        rnd.shuffle((0L to 30L).toList).take(depth).zipWithIndex
          .map { case (nid, i) => (q.toLong, (i + 1).toLong, nid) }
      }
      val shortlist = rows.toDF("q_id", "rank", "n_id")
      val keepIds = keep.toSeq.toDF("n_id")
      val queries = (0 until nq).map(_.toLong).toDF("vec_id")
      val got = graft.ops.Similarity.postFilterTopK(shortlist, keepIds,
          queries, k, topUp = false, "vec_id")(identity)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = rows.groupBy(_._1).flatMap { case (q, rs) =>
        rs.sortBy(_._2).map(_._3).filter(keep).take(k)
          .zipWithIndex.map { case (nid, i) => (q, (i + 1).toLong, nid) }
      }.toSet
      assert(got == want, s"nq=$nq depth=$depth k=$k keep=$keep")
    }
  }
}
