package graft.ops

import graft.ops.Checkpoints.SharedOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language-marker heuristics, and document
  * fingerprinting — all built-in expressions (whole-stage codegen),
  * no UDFs, one scan per call.
  */
object TextAnalysis {

  import Dedup.{normText, tokens}

  // NOTE on the `...Of(toks)` variants: Spark does not common-
  // subexpression-eliminate higher-order-function subtrees, so a column
  // that references an inline `tokens(text)` k times re-runs the
  // tokenizer k times per row. Every multi-use call path here projects
  // the token array ONCE and computes from the bound attribute; the
  // text-based overloads remain for single-use convenience.

  /** Whitespace token count; empty/blank text counts 0. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** English-marker stopword ratio — a deterministic stand-in for
    * n-gram language ID, SQL-reproducible for the oracle. */
  val EnglishMarkers: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

  def stopwordRatioOf(toks: Column, markers: Seq[String] = EnglishMarkers): Column = {
    val matches = size(filter(toks, t => t.isInCollection(markers)))
    when(size(toks) === 0, 0.0)
      .otherwise(matches.cast("double") / size(toks).cast("double"))
  }

  def stopwordRatio(text: Column, markers: Seq[String] = EnglishMarkers): Column =
    stopwordRatioOf(tokens(text), markers)

  /** Non-word (punctuation/symbol) character ratio over non-space
    * characters. */
  def punctRatio(text: Column): Column = {
    val chars = length(regexp_replace(text, "\\s", ""))
    val punct = length(regexp_replace(text, "[\\w\\s]", ""))
    when(chars === 0, 0.0).otherwise(punct.cast("double") / chars.cast("double"))
  }

  /** Mean token length (characters), 0 for blank docs. */
  def meanTokenLenOf(toks: Column): Column =
    when(size(toks) === 0, 0.0)
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))

  def meanTokenLen(text: Column): Column = meanTokenLenOf(tokens(text))

  /** Composite quality score in [0,1]: length component + stopword
    * component − punctuation penalty (simple, deterministic, and
    * monotone in the usual quality signals). */
  def qualityScoreOf(toks: Column, text: Column): Column = {
    val lenScore = least(size(toks).cast("double") / 100.0, lit(1.0))
    val swScore = least(stopwordRatioOf(toks) * 5.0, lit(1.0))
    val punctPenalty = least(punctRatio(text) * 2.0, lit(1.0))
    greatest(lit(0.0), least(lit(1.0), lenScore * 0.5 + swScore * 0.5 - punctPenalty * 0.25))
  }

  def qualityScore(text: Column): Column = qualityScoreOf(tokens(text), text)

  /** BPE-ish regex tokenization: letter runs, digit runs, and single
    * non-alphanumeric symbols — the pre-tokenizer split most BPE vocabs
    * start from, kept RE2-safe (no lookaheads) so any engine reproduces
    * it. */
  val BpeTokenPattern: String = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeTokenPattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Stopword-marker language ID: score each language by its marker-set
    * hit count over the doc's tokens; predict the argmax (ties break by
    * language order), 'und' when nothing matches. Deterministic and
    * SQL-reproducible — the shape of an n-gram language classifier with
    * a trivially small profile table. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un"),
    "fr" -> Seq("le", "la", "de", "et", "que", "en", "un"),
    "de" -> Seq("der", "die", "das", "und", "zu", "den", "ist"))

  def langIdOf(toks: Column): Column = {
    val scores = LangMarkers.map { case (lang, markers) =>
      (lang, size(filter(toks, t => t.isInCollection(markers))))
    }
    // argmax with first-wins tie-break, 'und' if best score is 0
    val best = scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), greatest(s, bs))
    }
    when(best._2 === 0, "und").otherwise(best._1)
  }

  def langId(text: Column): Column = langIdOf(tokens(text))

  /** Polynomial rolling hash over characters, mod 1e9+7, seeded 7 —
    * cheap, stable, and reproducible in any engine with 64-bit integer
    * arithmetic (unlike xxhash64, whose exact constants SQL engines
    * don't expose). Values are < 2^30, so bits 0..29 are usable as
    * independent-ish hash bits. One codegen'd scan expression
    * ([[graft.functions.PolyHash]] — the per-character lambda chain it
    * replaces dominated every hashed-feature pass); callers must have
    * graft functions registered, as with [[Dedup.shingles]]. */
  def polyHash(s: Column): Column = graft.functions.poly_hash(s)

  /** Document fingerprint: [[polyHash]] of the normalized text. */
  def fingerprint(text: Column): Column = polyHash(normText(text))

  /** Per-document text stats frame: one tokenizer pass feeds all three
    * token-derived stats (see the CSE note at the top). */
  def stats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.ensureRegistered(docs.sparkSession)
    docs.select(col(idCol), col(textCol), tokens(col(textCol)).as("w"))
      .select(
        col(idCol),
        size(col("w")).cast("long").as("n_tokens"),
        round(meanTokenLenOf(col("w")), 4).as("mean_token_len"),
        round(stopwordRatioOf(col("w")), 4).as("stopword_ratio"),
        fingerprint(col(textCol)).as("fingerprint"))
  }

  /** Word n-grams WITH repetitions (unlike [[Dedup.shingles]], which is
    * the distinct set for Jaccard): the multiset a repetition detector
    * needs. Docs shorter than n collapse to one whole-doc gram.
    * `toks` MUST be a materialized token-array attribute, not an inline
    * `tokens(text)` expression — this column references it ~3n times,
    * and higher-order-function subtrees are re-evaluated per reference
    * (no CSE), which turns an inline tokenizer into O(tokens²) work
    * (measured: 11.6 s → 1.0 s at sf0.1 for the repetition query). */
  def ngramsAll(toks: Column, n: Int): Column =
    when(size(toks) < n, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))

  /** Repetition score per document: frequency of the most repeated word
    * n-gram over the total n-gram count — the standard boilerplate /
    * degenerate-generation signal (a looping doc scores → 1, clean prose
    * → 1/n_grams). One explode + one count shuffle; grams travel as
    * xxhash64 keys (8 B) rather than strings, like the dedup paths. */
  def ngramRepetition(docs: DataFrame, n: Int = 3,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), tokens(col(textCol)).as("w"))
      .select(col(idCol), explode(ngramsAll(col("w"), n)).as("g"))
      .select(col(idCol), xxhash64(col("g")).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum("c").as("n_grams"), max("c").as("max_gram_freq"))
      .select(col(idCol), col("n_grams"), col("max_gram_freq"),
        round(col("max_gram_freq").cast("double") / col("n_grams").cast("double"), 4)
          .as("repetition"))

  /** Per-document unigram (token) entropy — the information-density
    * quality signal (the Dolma/RedPajama "unigram entropy" heuristic:
    * keyword-stuffed and template pages score low, natural prose
    * high). entropy = −Σ (c/n)·ln(c/n) over the doc's own token
    * frequencies, emitted as (idCol, n_tokens, n_distinct,
    * entropy_e6): each distinct token's ln(n/c) is 1e6-quantized (the
    * [[unigramLogProb]] convention — engines agree bit-for-bit on
    * ln of an integer ratio), weighted by its count in exact integer
    * arithmetic, and divided once at the end. Empty docs score 0.
    *
    * Scale: a pure per-row projection — token run-lengths come from
    * ONE array_sort of the doc's own tokens plus element-wise lambdas,
    * so there is no explode, no (doc, token) aggregate, NO shuffle at
    * all (contrast [[ngramRepetition]], whose cross-gram max genuinely
    * needs the keyed aggregate).
    *
    * Inlining safety (load-bearing): every lambda body below touches
    * ONLY its own arguments — derived arrays enter the higher-order
    * functions as arguments, never by reference from inside a lambda.
    * When a downstream `.where(entropy_e6 >= x)` pushes this whole
    * chain into one Filter condition, alias substitution re-derives
    * each intermediate a CONSTANT number of times per row; the
    * original element_at(__sw, i)-inside-a-lambda formulation
    * re-evaluated the array_sort PER LAMBDA STEP under that inlining —
    * O(n² log n) per doc, measured 842 s for the sf0.1 curation gate
    * vs ~2 s for this shape. */
  def tokenEntropy(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(col(idCol), tokens(col(textCol)).as("__w"))
      .select(col(idCol), expr("array_sort(__w)").as("__sw"),
        size(col("__w")).cast("long").as("n_tokens"))
      // run-start flags: each sorted element vs its left neighbor (the
      // shifted self enters zip_with as an ARGUMENT; element 1 pairs
      // with the padded NULL and is always a start)
      .withColumn("__bd", expr(
        "zip_with(__sw, concat(array(CAST(NULL AS STRING)), " +
          "slice(__sw, 1, greatest(size(__sw) - 1, 0))), " +
          "(a, b) -> a IS DISTINCT FROM b)"))
      // 1-based run-start positions
      .withColumn("__st", expr(
        "filter(transform(__bd, (f, i) -> IF(f, i + 1, -1)), p -> p > 0)"))
      // run lengths: next start (or n+1) minus this start
      .withColumn("__cnts", expr(
        "zip_with(__st, concat(slice(__st, 2, greatest(size(__st) - 1, 0)), " +
          "array(CAST(size(__bd) + 1 AS INT))), (s, nx) -> nx - s)"))
      // per-run 1e6-quantized ln(n/c) terms; n rides in as an argument
      // array so the lambda never references a derived scalar
      .withColumn("__terms", expr(
        "zip_with(__cnts, array_repeat(n_tokens, size(__cnts)), (c, n) -> " +
          "c * CAST(round(ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT))"))
      .select(col(idCol), col("n_tokens"),
        size(col("__st")).cast("long").as("n_distinct"),
        expr("CASE WHEN n_tokens = 0 THEN 0L ELSE " +
          "aggregate(__terms, 0L, (acc, t) -> acc + t) div n_tokens END")
          .as("entropy_e6"))

  /** Cross-document repeated token spans — the exact-substring-dedup
    * signal (Lee et al. 2022 trigger condition: a length-n token
    * window shared VERBATIM by ≥ minDocs distinct documents). Emits
    * per doc its total span count, how many of its span positions are
    * cross-document-shared, and the shared ratio — the score a
    * span-level dedup/trim stage keys on. Complements
    * [[ngramRepetition]] (within-doc loops) and boilerplate removal
    * (line-granularity): this is token-window granularity ACROSS docs.
    *
    * Scale: spans travel as xxhash64 keys (8 B, text never shuffles);
    * the span frame is lazily checkpointed so the shared-span lexicon
    * and the per-doc stats reuse ONE explode; the lexicon is bounded
    * by spans that actually repeat across docs, not the corpus. Docs
    * shorter than n collapse to one whole-doc span (ngramsAll rule). */
  def repeatedSpans(docs: DataFrame, n: Int = 8, minDocs: Int = 2,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n > 0 && minDocs > 1, s"need n > 0 and minDocs > 1, got ($n, $minDocs)")
    val spans = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
      .select(col("id"), explode(ngramsAll(col("w"), n)).as("g"))
      .select(col("id"), xxhash64(col("g")).as("h"))
      .sharedCheckpoint(eager = true) // reused: lexicon + per-doc stats
    val lex = spans.select("id", "h").distinct()
      .groupBy("h").agg(count(lit(1)).as("df"))
      .where(col("df") >= minDocs)
      .select(col("h"), lit(1L).as("shared"))
    spans
      .join(lex, Seq("h"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("shared"), lit(0L))).as("n_shared"))
      .select(col("id").as(idCol), col("n_spans"), col("n_shared"),
        round(col("n_shared").cast("double") / col("n_spans").cast("double"), 4)
          .as("shared_ratio"))
  }

  /** Cross-document exact-substring dedup — the span EXCISION stage
    * [[repeatedSpans]] is the detector for (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better",
    * ExactSubstr): every length-n token window whose gram text has an
    * EARLIER occurrence anywhere in the corpus — global (doc_id,
    * position) order — is a duplicate window, and every token it
    * covers is excised. Keep-first semantics: the globally first
    * occurrence of each span survives verbatim; a document that
    * arrives later keeps only its novel text. Docs shorter than n
    * collapse to one whole-doc gram (the [[ngramsAll]] rule), so exact
    * short duplicates dedup to their first copy too.
    *
    * Returns (idCol, n_tokens, n_removed, text_dedup) per document —
    * text_dedup is the whitespace-normalized survivor text ('' when
    * everything was excised).
    *
    * Scale: gram occurrences shuffle as (xxhash64, doc, pos) — 8 B
    * keys, text never shuffles (the 2⁻⁶⁴ collision risk is the
    * standard trade; the oracle compares gram STRINGS and agrees).
    * The occurrence frame is checkpoint-shared between the
    * first-occurrence reduce and the duplicate scan, so the corpus
    * tokenizes once. Removed positions aggregate to one int set per
    * doc (bounded by doc length), and reassembly is a single
    * higher-order filter over the already-held token array — the
    * final join is doc-count-sized, never token-count-sized. */
  def spanDedup(docs: DataFrame, n: Int = 8,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n > 1, s"span length must be > 1, got $n")
    val toked = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
    val occ = spanOccurrences(toked, n)
    val firsts = occ.groupBy("h").agg(min(struct(col("id"), col("s"))).as("f"))
    val dups = occ.join(firsts, "h")
      .where(struct(col("id"), col("s")) > col("f"))
      .select(col("id"), col("s"))
    exciseSpans(toked, dups, n, idCol)
  }

  /** 1-based (id, start, gram-hash) occurrence frame, checkpoint-shared
    * between the first-occurrence reduce and the duplicate scan. */
  private def spanOccurrences(toked: DataFrame, n: Int): DataFrame =
    toked
      .select(col("id"), posexplode(ngramsAll(col("w"), n)).as(Seq("s0", "g")))
      .select(col("id"), (col("s0") + 1).as("s"), xxhash64(col("g")).as("h"))
      .sharedCheckpoint(eager = true)

  /** Shared excision tail: duplicate windows (id, s) → removed-position
    * sets → survivor text. The final join is doc-count-sized. */
  private def exciseSpans(toked: DataFrame, dups: DataFrame, n: Int,
                          idCol: String): DataFrame = {
    val removed = dups
      .select(col("id"), explode(sequence(col("s"), col("s") + (n - 1))).as("p"))
      .groupBy("id").agg(collect_set(col("p")).as("rem0"))
    toked.join(removed, Seq("id"), "left")
      // whole-doc grams of short docs cover positions past the real
      // token count — clip before counting
      .select(col("id"), col("w"),
        filter(coalesce(col("rem0"), array().cast("array<int>")),
          p => p <= size(col("w"))).as("rem"))
      .select(col("id").as(idCol),
        size(col("w")).cast("long").as("n_tokens"),
        size(col("rem")).cast("long").as("n_removed"),
        concat_ws(" ",
          filter(col("w"), (t, i) => !array_contains(col("rem"), i + 1)))
          .as("text_dedup"))
  }

  /** Surgical span-level decontamination: excise every length-n token
    * window that appears ANYWHERE in the benchmark set, keeping the
    * rest of the document — the span-granular alternative to
    * [[Dedup.contamination]]'s drop-the-document rule (dropping loses
    * the whole doc for one quoted test item; an absolute-overlap
    * filter misses the quote if the doc is long). Same store shape as
    * [[spanDedupIncremental]]: the benchmark participates only as its
    * distinct gram hashes. Intra-corpus repetition is deliberately NOT
    * excised here — compose with [[spanDedup]] for that. */
  def decontaminateSpans(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
                         idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n > 1, s"span length must be > 1, got $n")
    val toked = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
    val occ = spanOccurrences(toked, n)
    val dups = occ.join(spanGramStore(benchmark, n, textCol),
        Seq("h"), "left_semi")
      .select(col("id"), col("s"))
    exciseSpans(toked, dups, n, idCol)
  }

  /** Per-source quality-threshold calibration: the exact score
    * quantile at (1 − keepFrac) per source and each doc's keep flag —
    * "keep the top keepFrac of EVERY source" instead of one global
    * threshold that silently drops entire domains whose score
    * distribution sits low (the classic crawl-mix failure). Scores are
    * rounded to 4 dp BEFORE the quantile so the cutoff interpolates
    * identical values in any engine; keep compares against the
    * unrounded interpolation (deterministic: same two 4-dp neighbors,
    * same arithmetic).
    *
    * Plan: one tokenizer pass (checkpoint-shared between the cutoff
    * aggregate and the tag join); the cutoff frame is |sources| rows,
    * which the planner broadcasts — no second corpus shuffle. */
  def qualityCalibration(docs: DataFrame, keepFrac: Double = 0.5,
                         groupCol: String = "source",
                         idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0, s"keepFrac must be in (0, 1], got $keepFrac")
    val scored = docs.select(col(idCol), col(groupCol),
        round(qualityScoreOf(tokens(col(textCol)), col(textCol)), 4).as("score"))
      .sharedCheckpoint(eager = true) // one score pass: cutoff agg + tag join
    val cuts = scored.groupBy(col(groupCol).as("__g"))
      .agg(expr(s"percentile(score, ${1.0 - keepFrac})").as("cut"))
    // null-safe equality: a NULL group is a group like any other — a
    // plain using-column join would silently drop its documents
    scored.join(cuts, col(groupCol) <=> col("__g"))
      .select(col(idCol), col(groupCol), col("score"),
        round(col("cut"), 4).as("cutoff"),
        (col("score") >= col("cut")).as("keep"))
  }

  /** Distinct gram-hash store of a seen corpus — the ingest-time
    * persistable state for [[spanDedupIncremental]]: 8 B per UNIQUE
    * length-n gram ever observed, not per occurrence, and never the
    * text. The streaming twin appends each batch's novel hashes. */
  def spanGramStore(docs: DataFrame, n: Int = 8,
                    textCol: String = "text"): DataFrame =
    docs.select(tokens(col(textCol)).as("w"))
      .select(explode(ngramsAll(col("w"), n)).as("g"))
      .select(xxhash64(col("g")).as("h")).distinct()

  /** Gram-novelty score: per document, the fraction of its length-n
    * token windows NOT present in a seen-gram store
    * ([[spanGramStore]]) — the "newness" signal that separates a fresh
    * crawl from a re-crawl before any expensive dedup runs (a doc at
    * novelty ≈ 0 is redundant even when no single span is long enough
    * for span dedup to excise profitably). Counts DISTINCT grams per
    * doc, so internal repetition doesn't inflate either side.
    * Returns (idCol, n_grams, n_seen, novelty_e6) with novelty_e6 =
    * (n_grams − n_seen)·1e6 div n_grams. Docs shorter than n collapse
    * to one whole-text gram (the family-wide [[ngramsAll]] rule), so
    * an exact short re-crawl scores novelty 0.
    *
    * Scale: grams travel as 8-byte xxhash64 keys; the store side is
    * per-unique-gram. The membership probe is ONE pass: a left join
    * flags each gram as seen-or-not and a single doc-keyed aggregate
    * counts both sides, so the tokenize/explode/distinct gram build is
    * consumed from exactly one plan subtree (r14's verdict found the
    * old two-subtree shape — a left-semi branch plus a separate
    * n_grams aggregate — re-ran the whole gram build twice whenever
    * exchange reuse didn't fire). Text never shuffles. */
  def gramNovelty(docs: DataFrame, seenGrams: DataFrame, n: Int = 8,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n > 1, s"span length must be > 1, got $n")
    val grams = docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
      .select(col("id"), explode(ngramsAll(col("w"), n)).as("g"))
      .select(col("id"), xxhash64(col("g")).as("h")).distinct()
    // distinct() keeps the membership left join duplicate-store-safe
    // (spanGramStore is already distinct, but callers may union raw
    // batch hashes); count(col) skips the unmatched nulls, so n_seen
    // is exactly the count of grams present in the store
    val store = seenGrams.select(col("h")).distinct().withColumn("__seen", lit(1))
    grams.join(store, Seq("h"), "left")
      .groupBy("id").agg(
        count(lit(1)).as("n_grams"), count(col("__seen")).as("n_seen"))
      .select(col("id").as(idCol), col("n_grams"), col("n_seen"),
        expr("(n_grams - n_seen) * 1000000 div n_grams").as("novelty_e6"))
  }

  /** Incremental exact-substring span dedup — [[spanDedup]] for the
    * corpus-ingest shape: excise from `newDocs` every length-n window
    * whose gram is in the seen-gram store (anything ever ingested
    * counts as earlier) or has an earlier (id, pos) occurrence within
    * the batch itself. When every seen id precedes every new id, the
    * output equals [[spanDedup]] over seen ∪ new restricted to the new
    * rows — but the seen corpus participates only as `seenGrams` (one
    * 8-byte hash column, duplicate store rows harmless to the
    * semi-join), so the per-batch cost is the batch's own gram build
    * plus one hash semi-join against the store. */
  def spanDedupIncremental(newDocs: DataFrame, seenGrams: DataFrame, n: Int = 8,
                           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n > 1, s"span length must be > 1, got $n")
    val toked = newDocs.select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
    val occ = spanOccurrences(toked, n)
    val dupSeen = occ.join(seenGrams.select(col("h")), Seq("h"), "left_semi")
      .select(col("id"), col("s"))
    val firsts = occ.groupBy("h").agg(min(struct(col("id"), col("s"))).as("f"))
    val dupIntra = occ.join(firsts, "h")
      .where(struct(col("id"), col("s")) > col("f"))
      .select(col("id"), col("s"))
    // a window can be both seen-dup and intra-dup; the position
    // collect_set downstream absorbs the overlap
    exciseSpans(toked, dupSeen.union(dupIntra), n, idCol)
  }

  /** Cross-document boilerplate removal: newline-delimited lines whose
    * normalized form appears in at least `minDocs` DISTINCT documents
    * are dropped from every document — the header/nav/footer stripper
    * that precedes dedup in a web-corpus pipeline. Blank lines are
    * never treated as boilerplate. Returns
    * (idCol, n_lines, n_removed, clean_text).
    *
    * Scale: line statistics travel as (xxhash64, doc_id) pairs — line
    * TEXT never shuffles. The boilerplate lexicon (lines repeated
    * across ≥ minDocs documents) is template-bounded, not corpus-
    * bounded; when it fits under `maxLexicon` hashes it is folded into
    * the plan as a literal IN-set (the optimizer converts it to an
    * O(1) hash-set probe) and every document is rewritten in place with
    * ZERO joins — the corpus never shuffles at all. Above the cap, a
    * positional fallback joins per-doc drop-position lists back on the
    * id (the only exchange whose size scales with the corpus carries
    * (id, positions) longs, still never line text). */
  def removeBoilerplate(docs: DataFrame, minDocs: Int = 3,
                        idCol: String = "doc_id", textCol: String = "text",
                        maxLexicon: Int = 100000): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val ls = split(col(textCol), "\n")
    val common = docs
      .select(col(idCol).as("id"), explode(ls).as("line"))
      .select(col("id"), normText(col("line")).as("ln"))
      .where(length(col("ln")) > 0) // blank lines are structure, not boilerplate
      .select(col("id"), xxhash64(col("ln")).as("lh"))
      .groupBy("lh").agg(countDistinct(col("id")).as("df"))
      .where(col("df") >= minDocs)
      .select("lh")
    val lex = common.limit(maxLexicon + 1).collect().map(_.getLong(0))
    if (lex.isEmpty)
      docs.select(col(idCol), size(ls).cast("long").as("n_lines"),
        lit(0L).as("n_removed"), col(textCol).as("clean_text"))
    else if (lex.length <= maxLexicon) {
      val kept = filter(ls, l => !xxhash64(normText(l)).isin(lex.toSeq: _*))
      docs.select(col(idCol), ls.as("all_ls"), kept.as("kept_ls"))
        .select(col(idCol),
          size(col("all_ls")).cast("long").as("n_lines"),
          (size(col("all_ls")) - size(col("kept_ls"))).cast("long").as("n_removed"),
          array_join(col("kept_ls"), "\n").as("clean_text"))
    } else {
      val drops = docs
        .select(col(idCol), posexplode(ls).as(Seq("pos", "line")))
        .select(col(idCol), col("pos"), xxhash64(normText(col("line"))).as("lh"))
        .join(common, "lh")
        .groupBy(col(idCol))
        .agg(collect_list(col("pos")).as("drop_pos"), count(lit(1)).as("n_removed"))
      docs.join(drops, Seq(idCol), "left")
        .select(col(idCol),
          size(ls).cast("long").as("n_lines"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed"),
          when(col("drop_pos").isNull, col(textCol))
            .otherwise(array_join(
              filter(ls, (l, i) => !array_contains(col("drop_pos"), i)), "\n"))
            .as("clean_text"))
    }
  }

  /** TRAIN the quality classifier [[hashedLinearScore]] serves: full-
    * batch logistic regression on hashed unigram+bigram bucket
    * fractions (the [[graft.functions.gram_buckets]] featurizer DSIR
    * uses), positive = a curated exemplar set, negative = raw corpus —
    * the classic "wiki-vs-crawl" quality filter every large pretraining
    * pipeline trains (CCNet / GPT-3 style; fastText's linear regime).
    * Returns (bucket, w_e6) for every bucket the pooled corpus
    * touches; weights are ×1e6 longs.
    *
    * Engine-portable determinism, so the ORACLE can replay training:
    * features quantize to L1 fractions ×1e6 (exact longs); each step's
    * per-doc margin is one double division; the error quantizes to
    * ×1e6 before the gradient sum (exact integer, partition-order
    * independent); the weight update floors `lr·g/(N·1e6)` (floor, not
    * round — no half-boundary ambiguity across engines).
    *
    * Scale: the corpus is featurized ONCE into a lazily-checkpointed
    * (doc, bucket, c, f_e6) frame; each step is one doc-keyed margin
    * aggregate (weights ride in as a dim-sized plan literal — no join)
    * plus one bucket-keyed gradient aggregate, with only dim rows ever
    * collected. steps·2 passes over the FEATURE frame (not the text),
    * driver state = one dim-long array.
    */
  def trainQualityClassifier(pos: DataFrame, neg: DataFrame, dim: Int = 4096,
                             steps: Int = 2, lr: Double = 1.0,
                             idCol: String = "doc_id", textCol: String = "text",
                             trainCap: Int = 100000): DataFrame = {
    require(dim > 0 && steps >= 1, s"dim/steps must be positive, got $dim/$steps")
    graft.functions.ensureRegistered(pos.sparkSession)
    val session = pos.sparkSession
    import session.implicits._
    // trainCap: per-class deterministic sample cap, default 100k. A
    // FastText-style quality classifier saturates long before corpus
    // scale, but the feature build is corpus×grams rows and each GD
    // step shuffles all of them — measured ×30 per decade at the 500k
    // level (§G21). The r9 store-lever convention: the scale-critical
    // cap is ON by default; 0 disables (full-corpus training, the
    // exactness-replay config). Sampling is a HASH-threshold Bernoulli
    // gate sized from one count (expected ≈ cap) — seed-free,
    // order-invariant, shuffle-free; a rank-exact cap would need the
    // global unpartitioned window the plan audit forbids. Classes
    // already at or under the cap pass through bit-identically — the
    // sf0.01 oracle row trains 500-vs-4500 docs and keeps its hash.
    def capped(df: DataFrame): DataFrame =
      if (trainCap <= 0) df
      else {
        val n = df.count()
        if (n <= trainCap) df
        else df.where(pmod(xxhash64(col(idCol)), lit(1000000L)) <
          lit(math.round(trainCap.toDouble / n.toDouble * 1000000L)))
      }
    def featsOf(df: DataFrame, y: Int): DataFrame = capped(df)
      .select(col(idCol).as("id"), lit(y).as("y"),
        explode(graft.functions.gram_buckets(tokens(col(textCol)), dim)).as("b0"))
      .select(col("id"), col("y"), col("b0").cast("long").as("bucket"))
      .groupBy("id", "y", "bucket").agg(count(lit(1)).as("c"))
    val fb = featsOf(pos, 1).union(featsOf(neg, 0))
    val totals = fb.groupBy("id", "y").agg(sum("c").as("n"))
    val feats = fb.join(totals.select("id", "n"), "id")
      .select(col("id"), col("y"), col("bucket"), col("c"), col("n"),
        round(col("c").cast("double") / col("n").cast("double") * 1e6)
          .cast("long").as("f_e6"))
      // lazy-safe: materialized by the nDocs count on the next line
      .sharedCheckpoint(eager = false)
    val nDocs = feats.select("id").distinct().count()
    if (nDocs == 0L)
      return Seq.empty[(Long, Long)].toDF("bucket", "w_e6")
    val w = Array.fill[Long](dim)(0L)
    var present: Array[Long] = Array.empty
    for (_ <- 1 to steps) {
      val wLit = typedlit(w.toSeq)
      // margin s = Σ c·w_e6[b] / 1e6 / n; quantized logistic error
      val docErr = feats.groupBy(col("id"), col("y"), col("n"))
        .agg(sum(col("c") *
          element_at(wLit, (col("bucket") + 1).cast("int"))).as("swc"))
        .select(col("id"),
          round((lit(1.0) / (lit(1.0) +
            exp(-(col("swc").cast("double") / 1e6 / col("n").cast("double")))) -
            col("y").cast("double")) * 1e6).cast("long").as("err_e6"))
      val grad = feats.join(docErr, "id")
        .groupBy("bucket").agg(sum(col("err_e6") * col("f_e6")).as("g"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      present = grad.map(_._1)
      grad.foreach { case (b, g) =>
        w(b.toInt) -= math.floor(g.toDouble * lr / (nDocs.toDouble * 1e6)).toLong
      }
    }
    present.sorted.toSeq.map(b => (b, w(b.toInt))).toDF("bucket", "w_e6")
  }

  /** Serve a [[trainQualityClassifier]] weight frame: per-doc margin
    * s = Σ c·w/1e6/n over the same hashed-gram features, score = s
    * rounded 4 dp, keep ⇔ s > 0 (σ(s) > ½). The dim-bounded weight
    * frame broadcasts into the bucket join; docs with no grams drop. */
  def classifierScore(docs: DataFrame, weights: DataFrame, dim: Int = 4096,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.ensureRegistered(docs.sparkSession)
    val fb = docs
      .select(col(idCol), explode(
        graft.functions.gram_buckets(tokens(col(textCol)), dim)).as("b0"))
      .select(col(idCol), col("b0").cast("long").as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("c"))
    fb.join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(sum("c").as("n"),
        sum(col("c") * coalesce(col("w_e6"), lit(0L))).as("swc"))
      .select(col(idCol),
        round(col("swc").cast("double") / 1e6 / col("n").cast("double"), 4)
          .as("score"),
        (col("swc") > 0L).as("keep"))
  }

  /** Learn `numMerges` BPE merges from the corpus (the byte-pair-
    * encoding training loop of Sennrich et al. 2016, public algorithm)
    * — the tokenizer-TRAINING side of the [[bpeTokens]] pre-tokenizer:
    * start from characters, repeatedly merge the most frequent
    * adjacent symbol pair (ties → lexicographically first), until
    * `numMerges` merges are learned or no pair reaches `minPairFreq`.
    * Returns (rank, left, right, pair_count) — byte-for-byte
    * deterministic for a given corpus, so the merge table is a
    * reproducible artifact.
    *
    * Scale: the corpus is scanned ONCE (word-frequency build); every
    * iteration then runs on the DISTINCT-WORD frame (vocabulary-sized,
    * locally checkpointed — at 100 TB that is millions of rows, not
    * billions), exactly how production BPE trainers work. Each merge
    * is one pair-count aggregate + argmax on that small frame; the
    * driver holds only the ≤ numMerges merge list.
    */
  def bpeMerges(docs: DataFrame, numMerges: Int, minPairFreq: Long = 2L,
                textCol: String = "text"): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val session = docs.sparkSession
    var syms = docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(concat_ws(" ", split(col("w"), "")).as("sym"), col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    val pairStructs = transform(sequence(lit(1), size(col("u")) - 1),
      j => struct(element_at(col("u"), j).as("l"),
        element_at(col("u"), j + 1).as("r")))
    var done = false
    while (merges.length < numMerges && !done) {
      val top = syms.select(split(col("sym"), " ").as("u"), col("freq"))
        .where(size(col("u")) >= 2)
        .select(explode(pairStructs).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < minPairFreq) done = true
      else {
        val (l, r) = (top.head.getString(0), top.head.getString(1))
        merges += ((l, r, top.head.getLong(2)))
        syms = syms
          .withColumn("sym", regexp_replace(col("sym"), mergePattern(l, r),
            java.util.regex.Matcher.quoteReplacement(l + r)))
          .localCheckpoint()
      }
    }
    import session.implicits._
    merges.toSeq.zipWithIndex
      .map { case ((l, r, c), i) => (i.toLong + 1L, l, r, c) }
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Whole-symbol occurrence of `l r` in a space-joined symbol string
    * (bounded-width lookbehind/ahead, so replacement is the standard
    * leftmost non-overlapping BPE pass). */
  private def mergePattern(l: String, r: String): String =
    "(?<=^| )" + java.util.regex.Pattern.quote(l) + " " +
      java.util.regex.Pattern.quote(r) + "(?= |$)"

  /** Apply a learned merge table: per-document whitespace-token and
    * BPE-unit counts — the "how many units will this corpus cost"
    * budgeting pass. Merges apply in rank order to the DISTINCT-word
    * lexicon (one chained-regex evaluation per distinct word, not per
    * occurrence), then join back to the exploded token stream —
    * occurrences shuffle as words once, unit counts are exact integer
    * sums. */
  def bpeSegmentCounts(docs: DataFrame, merges: Seq[(String, String)],
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .sharedCheckpoint(eager = true)
    val segmented = merges.foldLeft(concat_ws(" ", split(col("w"), ""))) {
      case (c, (l, r)) => regexp_replace(c, mergePattern(l, r),
        java.util.regex.Matcher.quoteReplacement(l + r))
    }
    val lex = toks.select("w").distinct()
      .select(col("w"), size(split(segmented, " ")).cast("long").as("units"))
    toks.join(lex, "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum("units").as("n_units"))
  }

  /** Intra-document repeated-line dedup — the within-doc complement of
    * [[removeBoilerplate]]'s cross-doc stripper: scraped pages repeat
    * their own nav menus, cookie banners, and list templates dozens of
    * times inside ONE document, which cross-doc df thresholds can't
    * see. Keeps the FIRST occurrence of each normalized non-blank line
    * and every blank line (blank = structure, same rule as
    * removeBoilerplate); emits (id, n_lines, n_removed, clean_text).
    *
    * Scale: pure per-row HOF expressions — NO shuffle, no lexicon, no
    * join; the whole operator rides whole-stage codegen inside
    * whatever scan feeds it. Each line normalizes ONCE into an 8-byte
    * hash array; the first-occurrence test is an O(L²) long-compare
    * over that array (L = lines per doc, bounded by doc size — at
    * 100 TB the cost stays embarrassingly parallel and shuffle-free).
    */
  def dedupLines(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val ls = split(col(textCol), "\n")
    docs
      .select(col(idCol), ls.as("ls"))
      .select(col(idCol), col("ls"),
        transform(col("ls"), l => xxhash64(normText(l))).as("nh"),
        transform(col("ls"), l => length(normText(l))).as("bl"))
      .select(col(idCol),
        size(col("ls")).cast("long").as("n_lines"),
        filter(col("ls"), (_, i) =>
          (element_at(col("bl"), i + 1) === 0) ||
            !exists(slice(col("nh"), lit(1), i),
              h => h === element_at(col("nh"), i + 1))).as("kept"))
      .select(col(idCol), col("n_lines"),
        (col("n_lines") - size(col("kept"))).cast("long").as("n_removed"),
        array_join(col("kept"), "\n").as("clean_text"))
  }

  /** Sentence statistics: segments split on `[.!?]+` runs, blank
    * segments dropped after space-trimming — sentence count and mean
    * sentence length (chars) are standard fluency/quality inputs (very
    * long or very short mean sentences flag tables, logs, boilerplate).
    * Pure per-row expressions, exact integer sums, no shuffle. */
  def sentenceStats(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val segs = filter(
      transform(split(col(textCol), "[.!?]+"), s => trim(s)),
      s => length(s) > 0)
    docs.select(col(idCol), segs.as("__s"))
      .select(
        col(idCol),
        size(col("__s")).cast("long").as("n_sentences"),
        when(size(col("__s")) === 0, lit(null).cast("double"))
          .otherwise(round(
            aggregate(col("__s"), lit(0L), (acc, s) => acc + length(s)).cast("double") /
              size(col("__s")).cast("double"), 4))
          .as("mean_sent_chars"))
  }

  /** Redaction patterns, applied in this order (URLs first so their
    * query strings can't later match as emails/numbers). RE2-safe and
    * identical under Java regex, so any engine reproduces the output. */
  val UrlPattern = "https?://[^\\s]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val DigitRunPattern = "[0-9]{6,}"

  /** PII/noise scrub for training corpora: URLs, emails, and long digit
    * runs (ids, phone-ish numbers) replaced by typed placeholders, with
    * per-kind match counts. Counts are taken on the text each pattern
    * actually saw (post-prior-redactions), so they equal the number of
    * placeholders inserted. Pure per-row expressions — no shuffle. */
  def redact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, UrlPattern, "<URL>")
    val t2 = regexp_replace(t1, EmailPattern, "<EMAIL>")
    val t3 = regexp_replace(t2, DigitRunPattern, "<NUM>")
    docs.select(
      col(idCol),
      t3.as("redacted"),
      size(regexp_extract_all(t0, lit(UrlPattern), lit(0))).cast("long").as("n_urls"),
      size(regexp_extract_all(t1, lit(EmailPattern), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t2, lit(DigitRunPattern), lit(0))).cast("long").as("n_digit_runs"))
  }

  /** Document-level PMI co-occurrence: for every pair of top-`vocabSize`
    * tokens appearing together in ≥ `minPairDocs` documents,
    * pmi = ln(df_ab·N / (df_a·df_b)) — the association score behind
    * collocation mining and embedding-matrix (PPMI) builds.
    *
    * Scale: the pair space is capped at C(vocabSize, 2) regardless of
    * corpus size — each doc contributes pairs only over its vocab-member
    * tokens (generated per-row from the sorted vocab-id set, no
    * self-join of the exploded frame), and the pair aggregate shuffles
    * at most C(vocabSize, 2) LONG keys. The vocabulary is driver-sized
    * by construction, so its id/df lookups are folded into literal map
    * expressions — no join anywhere; the hot path explodes 8-byte
    * encoded pair ids, not string structs (measured 3.7 s → ~1 s at
    * sf0.1). One explode feeds both the df aggregate and the pair path
    * via a lazily-checkpointed frame.
    *
    * `nDocs` lets a caller that already knows the corpus size skip the
    * count; when absent, N computes INSIDE the plan as the audited
    * single-row broadcast (same shape as [[tfidfTopK]]) — not an eager
    * driver-side count(), which would cost a full extra corpus scan
    * and a sync before the real work (the vocabulary collect below is
    * already one driver job; the count was a second).
    */
  def pmiPairs(docs: DataFrame, vocabSize: Int = 100, minPairDocs: Long = 5L,
               idCol: String = "doc_id", textCol: String = "text",
               nDocs: Option[Long] = None): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val docTok = docs
      .select(col(idCol).as("__id"),
        explode(array_distinct(tokens(col(textCol)))).as("token"))
      // lazy-safe: materialized single-site by the vocabulary collect below
      .sharedCheckpoint(eager = false)
    val docFreq = docTok.groupBy("token").agg(count(lit(1)).as("df"))
    val vocab = docFreq.orderBy(col("df").desc, col("token").asc).limit(vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val V = math.max(vocab.length.toLong, 1L)
    val vidMap = typedlit(vocab.zipWithIndex.map { case ((t, _), i) => (t, i.toLong) }.toMap)
    val tokMap = typedlit(vocab.zipWithIndex.map { case ((t, _), i) => (i.toLong, t) }.toMap)
    val dfMap = typedlit(vocab.zipWithIndex.map { case ((_, d), i) => (i.toLong, d) }.toMap)
    val sets = docTok
      .select(col("__id"), element_at(vidMap, col("token")).as("vid"))
      .where(col("vid").isNotNull)
      .groupBy("__id").agg(sort_array(collect_set(col("vid"))).as("w"))
    // all (w[j], w[i]) j<i unordered pairs, encoded as one long each
    val pairs = sets.where(size(col("w")) >= 2)
      .select(explode(flatten(transform(
        sequence(lit(1), size(col("w")) - 1), i =>
          transform(sequence(lit(0), i - 1), j =>
            element_at(col("w"), j + 1) * V + element_at(col("w"), i + 1))))).as("pid"))
      .groupBy("pid").agg(count(lit(1)).as("df_ab"))
      .where(col("df_ab") >= minPairDocs)
    val withN = nDocs match {
      case Some(n) => pairs.withColumn("__n", lit(n))
      case None =>
        // guaranteed-one-row global aggregate, broadcast-attached: the
        // audited single-row-scalar exception (PlanAuditSpec verifies
        // the 1-row bound), O(|pairs|) — not a scale-killer
        val nFrame = docs.agg(count(lit(1)).as("__n"))
        pairs.crossJoin(broadcast(nFrame))
    }
    // decode: vid order is df-desc, so re-order lexicographically here
    val ta = element_at(tokMap, expr(s"pid DIV $V"))
    val tb = element_at(tokMap, col("pid") % V)
    val dfProduct = element_at(dfMap, expr(s"pid DIV $V")) * element_at(dfMap, col("pid") % V)
    withN
      .select(least(ta, tb).as("token_a"), greatest(ta, tb).as("token_b"),
        col("df_ab"),
        round(log((col("df_ab") * col("__n")).cast("double") / dfProduct.cast("double")), 4)
          .as("pmi"))
      .orderBy("token_a", "token_b")
  }

  /** Per-document mean token log-probability under the corpus's own
    * unigram MLE — the cheapest "language-model" quality signal: docs
    * full of rare tokens (OCR noise, code dumps, other languages) score
    * far below fluent prose. mean_logprob = Σ tf·ln(freq/total) / Σ tf,
    * natural log, over whitespace tokens; empty docs emit no row.
    *
    * Numerics: each token's ln p is quantized to 1e-6 and carried as a
    * LONG, so the per-doc sums are exact integers — the float work is
    * one ln and one final division per row, order-independent and
    * reproducible in any engine (a raw double sum would be
    * partition-order-dependent).
    *
    * Plan shape: same lazily-checkpointed term frame as [[tfidfTopK]]
    * (one explode+shuffle feeds tf and the vocabulary aggregate); the
    * vocabulary frame joins back broadcast-sized. The corpus total is
    * the one driver scalar (vocabulary-frame sum, same precedent as
    * tfidf's N).
    */
  def unigramLogProb(docs: DataFrame,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val terms = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
      // lazy-safe: materialized single-site by the corpus-total head() below
      .sharedCheckpoint(eager = false)
    val freq = terms.groupBy("token").agg(sum("tf").as("freq"))
    // sum over an all-empty corpus is NULL; the result frame is empty
    // then, so the placeholder total never reaches an output row
    val totalRow = freq.agg(sum("freq")).head()
    val total = if (totalRow.isNullAt(0)) 1L else totalRow.getLong(0)
    val lpE6 = round(log(col("freq").cast("double") / lit(total.toDouble)) * 1e6)
      .cast("long")
    terms.join(freq, "token")
      .withColumn("lp_e6", lpE6 * col("tf"))
      .groupBy(col(idCol))
      .agg(sum("tf").as("n_tokens"), sum("lp_e6").as("s"))
      .select(col(idCol), col("n_tokens"),
        round(col("s").cast("double") / 1e6 / col("n_tokens").cast("double"), 4)
          .as("mean_logprob"))
  }

  /** Per-document mean bigram log-probability under the corpus's own
    * interpolated bigram MLE — the CCNet-style perplexity filter one
    * rung above [[unigramLogProb]]: P̂(w|v) = λ·c(v,w)/c(v,·) +
    * (1−λ)·freq(w)/total, mean of ln P̂ over a doc's adjacent token
    * pairs. Fluent prose scores high (its bigrams recur corpus-wide);
    * shuffled/garbled text with plausible unigrams drops to the
    * (1−λ)-backoff floor — the signal the unigram filter cannot see.
    * Docs with fewer than 2 tokens emit no row.
    *
    * Numerics: per-pair ln is quantized to 1e-6 and carried as LONG
    * (exact, order-independent integer sums — same discipline as
    * [[unigramLogProb]]); λ and 1−λ are interpolated into the plan as
    * the exact same double literals the oracle SQL carries.
    *
    * Plan shape: the token array materializes once per doc; pairs
    * derive per-row from `transform(sequence(...))` — no self-join, no
    * window. One (doc,prev,cur) count is lazily checkpointed and feeds
    * both the bigram lexicon and the per-doc scoring join; the context
    * counts c(v,·) aggregate the ALREADY-reduced bigram lexicon (a
    * vocabulary²-bounded frame, not the corpus). The corpus total is
    * the audited single-row broadcast, not an eager driver count. At
    * 100 TB the only corpus-sized shuffle is the (prev,cur) string
    * count — identical in kind to the unigram term shuffle.
    */
  def bigramLogProb(docs: DataFrame, lam: Double = 0.7,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    bigramScoreRaw(docs, lam, idCol, textCol)
      .select(col(idCol), col("n_bigrams"),
        round(col("s").cast("double") / 1e6 / col("n_bigrams").cast("double"), 4)
          .as("mean_logprob"))

  /** The exact-integer frame behind [[bigramLogProb]]: per doc,
    * (n_bigrams, s) where `s` is the Σ tf·lp_e6 quantized log-prob sum
    * — shared with [[Sampling.hardDomainWeights]], whose per-source
    * aggregation must run on the raw integers, not the rounded
    * per-doc means. */
  /** Per-key adjacent-pair counts (keyCols…, prev, cur, tf) — the
    * (prev, cur) derivation shared by [[bigramScoreRaw]] (key = doc)
    * and the streaming domain-reweight controller (key = source). */
  private[graft] def bigramPairCounts(docs: DataFrame, keyCols: Seq[String],
                                      textCol: String): DataFrame = {
    val w = tokens(col(textCol))
    val pairStructs = transform(sequence(lit(1), size(col("w")) - 1),
      i => struct(element_at(col("w"), i).as("prev"),
        element_at(col("w"), i + 1).as("cur")))
    docs
      .select(keyCols.map(col) :+ w.as("w"): _*)
      .where(size(col("w")) >= 2)
      .select(keyCols.map(col) :+ explode(pairStructs).as("p"): _*)
      .select(keyCols.map(col) ++ Seq(col("p.prev").as("prev"),
        col("p.cur").as("cur")): _*)
      .groupBy(keyCols.map(col) ++ Seq(col("prev"), col("cur")): _*)
      .agg(count(lit(1)).as("tf"))
  }

  /** Unigram counts (token, ufreq) over every doc — shared the same
    * way as [[bigramPairCounts]]. */
  private[graft] def unigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("ufreq"))

  private[ops] def bigramScoreRaw(docs: DataFrame, lam: Double,
                                  idCol: String, textCol: String): DataFrame = {
    require(lam > 0.0 && lam < 1.0, s"lam must be in (0,1), got $lam")
    val ptf = bigramPairCounts(docs, Seq(idCol), textCol)
      .sharedCheckpoint(eager = true)
    val bf = ptf.groupBy("prev", "cur").agg(sum("tf").as("bfreq"))
      .sharedCheckpoint(eager = true)
    val uf = unigramCounts(docs, textCol)
    ptf.join(bigramLexiconOf(bf, uf, lam), Seq("prev", "cur"))
      .groupBy(col(idCol))
      .agg(sum("tf").as("n_bigrams"), sum(col("tf") * col("lp_e6")).as("s"))
  }

  /** The interpolated-bigram lexicon (prev, cur, lp_e6) from a bigram
    * count frame (prev, cur, bfreq) and a unigram count frame (token,
    * ufreq) — extracted from [[bigramScoreRaw]] so the streaming
    * domain-reweight controller can price CURRENT log-probs over its
    * cumulative count stores (an old doc's contribution must re-price
    * as the lexicon evolves; storing per-doc scores would freeze it). */
  private[graft] def bigramLexiconOf(bf: DataFrame, uf: DataFrame,
                                   lam: Double): DataFrame = {
    val oneMinusLam = 1.0 - lam
    val cf = bf.groupBy("prev").agg(sum("bfreq").as("cfreq"))
    // guaranteed-one-row global aggregate, broadcast-attached (the
    // audited single-row-scalar exception; empty corpus → NULL total →
    // empty lexicon → empty result, never a bad division)
    val totFrame = uf.agg(sum("ufreq").cast("double").as("__total"))
    bf.join(cf, "prev")
      .join(uf.withColumnRenamed("token", "cur"), "cur")
      .crossJoin(broadcast(totFrame))
      .select(col("prev"), col("cur"),
        round(log(
          (lit(lam) * col("bfreq").cast("double")) / col("cfreq").cast("double") +
          (lit(oneMinusLam) * col("ufreq").cast("double")) / col("__total")) * 1e6)
          .cast("long").as("lp_e6"))
  }

  /** Per-document top-k terms by TF-IDF — the classic keyword /
    * salient-term extractor (tf × ln(N/df), natural log, document
    * frequency over the whole corpus). Rank is deterministic: rounded
    * score descending, then token ascending, so engines agree even at
    * score ties.
    *
    * Plan shape: explode → (doc, token) count with map-side partials;
    * the document-frequency frame is an aggregate of that same term
    * frame (vocabulary-sized — AQE broadcasts it); top-k per doc is one
    * row_number window on the doc key. The corpus size N is the one
    * driver-side scalar (a metadata-served count on the id column).
    * Nothing moves text after the explode: terms shuffle as strings
    * once into the count, everything downstream is (id, token, counts).
    */
  /** Misra–Gries heavy-hitters summary over the corpus token stream:
    * at most `capacity` (token, est) rows, with the mergeable-summary
    * guarantee (Agarwal et al., PODS '12) that for EVERY token
    * `0 ≤ true_count − est ≤ n / (capacity + 1)` where n is the total
    * token count — so every token whose frequency exceeds
    * n/(capacity+1) is guaranteed present.
    *
    * Scale: this is the fixed-memory alternative to the full
    * vocabulary groupBy — ONE pass over the corpus, NO shuffle. Each
    * task folds its partition into a ≤ capacity-entry map; partials
    * merge pairwise (sum, then subtract the (capacity+1)-th largest
    * count and drop non-positives — the merge that preserves the error
    * bound) up `Dataset.reduce`'s per-partition-then-driver tree, so
    * the driver ever sees ≤ capacity entries per merge step. At 100 TB
    * the whole reduction moves capacity·partitions short strings,
    * while the exact groupBy would shuffle the full vocabulary.
    *
    * The retained SET below the guarantee line can vary with merge
    * order (partition scheduling); everything the bound promises —
    * presence above the threshold, est ≤ true, error ≤ n/(capacity+1)
    * — holds on every run. Callers needing a deterministic result
    * should filter to tokens above the guarantee threshold (the
    * d_heavy_hitters query shape). */
  def heavyHitters(docs: DataFrame, capacity: Int,
                   textCol: String = "text"): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(tokens(col(textCol))).as("t")).as[String]
    val partials = toks.mapPartitions { it =>
      Iterator.single(mgLocal(it, capacity))
    }
    // one summary row per partition, so only a ZERO-partition input can
    // empty the reduce — detected without a job (Dataset.isEmpty would
    // tokenize and fold all of partition 0 just to fetch its probe row)
    val merged =
      if (partials.rdd.getNumPartitions == 0) Seq.empty[(String, Long)]
      else partials.reduce((a, b) => mgMerge(a, b, capacity))
    merged.toDF("token", "est").orderBy(col("est").desc, col("token").asc)
  }

  /** Single-pass local Misra–Gries: counter on hit; new slot while
    * below capacity; otherwise decrement-all (amortized O(1): each
    * decrement pass is paid for by the insertions it cancels). */
  private[graft] def mgLocal(it: Iterator[String], capacity: Int): Seq[(String, Long)] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      m.get(t) match {
        case Some(c) => m.update(t, c + 1L)
        case None if m.size < capacity => m.update(t, 1L)
        case None =>
          m.mapValuesInPlace((_, c) => c - 1L)
          m.filterInPlace((_, c) => c > 0L)
      }
    }
    m.toSeq
  }

  /** Merge two MG summaries at `capacity`: sum shared counters, then
    * if over capacity subtract the (capacity+1)-th largest count from
    * every counter and drop non-positives. Errors add: the merged
    * summary keeps the n/(capacity+1) bound over the combined stream. */
  private[graft] def mgMerge(a: Seq[(String, Long)], b: Seq[(String, Long)],
                             capacity: Int): Seq[(String, Long)] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    a.foreach { case (t, c) => m.update(t, m.getOrElse(t, 0L) + c) }
    b.foreach { case (t, c) => m.update(t, m.getOrElse(t, 0L) + c) }
    if (m.size <= capacity) m.toSeq
    else {
      val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(capacity)
      m.iterator.map { case (t, c) => (t, c - cut) }.filter(_._2 > 0L).toSeq
    }
  }

  /** Hashing-trick linear classifier scoring — the "quality classifier
    * filter" stage of a curation pipeline (à la CCNet / GPT-3 quality
    * filtering) with the learned weights swapped for a deterministic
    * per-bucket weight so the whole thing is oracle-reproducible. The
    * Spark-side plumbing is the real thing: tokens hash into `dim`
    * buckets ([[polyHash]] mod dim), bucket weights accumulate as
    * EXACT integer sums (one final float division, so the score is
    * partition-order-independent — same trick as unigramLogProb), one
    * scan, all codegen. Plugging in trained weights = swapping the
    * in-plan weight expression for a literal array lookup.
    *
    * Weight of bucket b: ((b·2654435761 + 12345) mod 1000003) /
    * 1000003 − 0.5 ∈ [−0.5, 0.5) — the mod-prime reduction decorrelates
    * the multiplier's power-of-two structure (see Sampling.detHashMod).
    * score(doc) = mean over tokens of weight(bucket(token)).
    * Output: (id, quality_w = score rounded 4 dp, keep = score > 0);
    * empty-token docs drop (no tokens → no score). */
  def hashedLinearScore(docs: DataFrame, dim: Int = 4096,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    graft.functions.ensureRegistered(docs.sparkSession)
    val WM = 1000003L // prime weight modulus
    val tok = docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("t"))
    val bucket = pmod(polyHash(col("t")), lit(dim.toLong))
    val wq = pmod(bucket * lit(2654435761L) + lit(12345L), lit(WM))
    tok.select(col("id"), wq.as("wq"))
      .groupBy("id").agg(sum(col("wq")).as("s"), count(lit(1)).as("n"))
      .select(col("id").as(idCol),
        round(col("s").cast("double") / (col("n") * WM).cast("double") - 0.5, 4)
          .as("quality_w"),
        (col("s").cast("double") / (col("n") * WM).cast("double") > 0.5).as("keep"))
  }

  /** Inverted-index postings: one row per token with its document
    * frequency and the first `maxPostings` doc ids (ascending). The
    * posting list is capped BEFORE the list aggregation — a row_number
    * over the token partition drops everything past the cap — so a
    * stopword's postings never materialize as one giant array in any
    * aggregation buffer; df still counts the full partition via an
    * unbounded-frame window on the same partitioning. One exchange on
    * token: the two window functions and the final groupBy all reuse
    * the same hash partitioning (asserted by spec).
    *
    * `minDf` prunes the long hapax tail from the OUTPUT only (df is
    * computed over everything); at 100 TB emit-worthy tokens are a
    * tiny fraction of the vocabulary. */
  def postings(docs: DataFrame, maxPostings: Int = 10, minDf: Long = 1L,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxPostings > 0, s"maxPostings must be positive, got $maxPostings")
    val td = docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(tokens(col(textCol)))).as("token"))
    val part = Window.partitionBy("token")
    val ordered = part.orderBy("doc_id")
    td
      .withColumn("df", count(lit(1)).over(part))
      .withColumn("__rn", row_number().over(ordered))
      .where(col("__rn") <= maxPostings)
      .groupBy("token")
      .agg(first(col("df")).as("df"),
        sort_array(collect_list(col("doc_id"))).as("doc_ids"))
      .where(col("df") >= minDf)
  }

  /** BM25 ranked retrieval (Robertson/Lucene form) for a literal term
    * query — the lexical-search complement of the embedding ANN family
    * (the other half of a hybrid retrieval stack):
    * score(d) = Σ_t ln((N − df + ½)/(df + ½) + 1) ·
    *            tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)).
    * Returns the top-k (doc_id, score_e6), score quantized ×1e6 per
    * (doc, term) and summed as exact longs — rank order is
    * deterministic and any engine replays it.
    *
    * Scale: the query-term IN-filter sits directly on the exploded
    * token stream — Catalyst pushes it below the aggregate, so only
    * matching-term postings ever shuffle (|terms|·df rows, not the
    * corpus). Corpus stats (N, Σdl) are one tiny aggregate attached as
    * the audited single-row broadcast; the final top-k is an
    * orderBy+limit (TakeOrdered — no global window, no full sort). */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0, s"k must be positive, got $k")
    val base = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).cast("long").as("dl"))
      .sharedCheckpoint(eager = true)
    val stats = base.agg(count(lit(1)).as("n"), sum("dl").as("sumdl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("w")).as("token"))
      .where(col("token").isInCollection(queryTerms))
      .groupBy("doc_id", "dl", "token").agg(count(lit(1)).as("tf"))
    bm25Rank(tf, stats, k, k1, b)
  }

  /** BM25 ranking core over prepared stats — shared by the scan-time
    * operator above and index-serve paths ([[graft.streaming.StreamingBm25]])
    * so the quantized formula lives in exactly one place. `tf` carries
    * (doc_id, dl, token, tf) for the QUERY TERMS only; `stats` is the
    * one-row (n, sumdl) corpus frame (attached via the audited
    * single-row broadcast). */
  def bm25Rank(tf: DataFrame, stats: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val dfq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val avgdl = col("sumdl").cast("double") / col("n").cast("double")
    val idf = log((col("n").cast("double") - col("df") + 0.5) /
      (col("df").cast("double") + 0.5) + 1.0)
    val tfc = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl").cast("double")) / avgdl))
    tf.join(dfq, "token")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(idf * tfc * 1e6).cast("long").as("s_e6"))
      .groupBy("doc_id").agg(sum("s_e6").as("score_e6"))
      .orderBy(col("score_e6").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Overlapping token-window chunking — the unit-of-retrieval split a
    * RAG/embedding indexing pipeline runs before embedding: windows of
    * `size` tokens starting every `stride` tokens (stride < size ⇒
    * overlap so no span is cut at a boundary without a second window
    * covering it). Chunk ids are dense per doc in text order; the last
    * window is partial rather than dropped (its tokens appear nowhere
    * else when stride = size). Docs that tokenize empty emit nothing.
    *
    * Scale: one scan, zero shuffle — starts derive per row from the
    * token count, chunks are array slices of the already-held token
    * array (the output explode multiplies rows ~n/stride, which IS the
    * output, not overhead). */
  def chunkDocs(docs: DataFrame, size: Int = 128, stride: Int = 64,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(size >= 1, s"size must be positive, got $size")
    require(stride >= 1 && stride <= size,
      s"stride must be in [1, size], got $stride (size $size)")
    docs
      // empty-doc drop WITHOUT referencing the token array: tokens() is
      // empty iff the trimmed/collapsed text is empty (normText trims
      // and collapses runs, so any non-empty normText has >= 1 token) —
      // a `size(tokens) > 0` predicate would alias-inline the tokens()
      // HOF chain into the pushed Filter and evaluate it twice per row
      // (the §G17b class, policed by PlanAuditSpec)
      .where(length(graft.ops.Dedup.normText(col(textCol))) > 0)
      .select(col(idCol), tokens(col(textCol)).as("w"))
      .select(col(idCol), col("w"),
        explode(sequence(lit(1), size_(col("w")), lit(stride))).as("s"))
      .select(col(idCol),
        expr(s"(s - 1) div $stride").cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("w"), col("s"), lit(size))).as("chunk"),
        least(size_(col("w")) - col("s") + 1, lit(size)).cast("long").as("n_tokens"))
  }

  // functions.size shadowed by the Int parameter above
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)

  /** Attribution / containment lookup: every document containing the
    * token-aligned phrase `needle` — the memorization probe a training
    * pipeline runs ("which documents contain this eval answer / this
    * copyrighted passage?"). The needle normalizes through the SAME
    * pipeline as document text (lower, trim, whitespace-collapse,
    * split), and a match is n-gram EQUALITY at token alignment — so
    * 'he cat' does not match inside 'the cat', and the DuckDB oracle
    * is the space-padded contains over normalized text.
    *
    * Scale: the equality predicate sits directly on the exploded gram
    * stream — nothing survives the scan except actual matches, so the
    * only exchange is the distinct over matching doc ids (hits-sized,
    * not corpus-sized). One corpus scan; for repeated lookups against
    * a fixed corpus, build [[spanDedup]]'s persisted gram store once
    * and equi-join needle hashes instead. */
  def spanLookup(docs: DataFrame, needle: String,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = needle.toLowerCase.trim.replaceAll("\\s+", " ")
      .split(" ").filter(_.nonEmpty).toSeq
    require(toks.nonEmpty, "needle must contain at least one token")
    val phrase = toks.mkString(" ")
    docs
      .select(col(idCol), tokens(col(textCol)).as("w"))
      .select(col(idCol), explode(ngramsAll(col("w"), toks.length)).as("g"))
      .where(col("g") === phrase)
      .select(col(idCol)).distinct()
  }

  /** Per-document top-k terms by tf·idf (idf = ln(N/df), ties broken by
    * token). `nDocs` lets a caller that already knows the corpus size
    * (a catalog, a previous stage) skip the count entirely; when absent
    * the count runs INSIDE the plan — a zero-column scan (parquet
    * answers it from footers) aggregated to one row and attached to the
    * df frame via a broadcast equi-join on a constant key — instead of
    * an eager driver-side count() that costs a full extra job and a
    * sync before the real work. */
  def tfidfTopK(docs: DataFrame, k: Int = 3,
                idCol: String = "doc_id", textCol: String = "text",
                nDocs: Option[Long] = None): DataFrame = {
    // lazily checkpointed: the term frame feeds BOTH the tf side of the
    // join and the document-frequency aggregate — without it Catalyst
    // plans two scan+explode+shuffle subtrees (exchange reuse doesn't
    // fire across the differing aggregates)
    val terms = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
      .sharedCheckpoint(eager = true)
    val docFreq = terms.groupBy("token").agg(count(lit(1)).as("df"))
    val withN = nDocs match {
      case Some(n) => docFreq.withColumn("__n", lit(n.toDouble))
      case None =>
        // oracle semantics: N counts ALL documents, including ones that
        // tokenize empty — so count docs, not distinct ids in `terms`.
        // The global aggregate is GUARANTEED one row, so the broadcast
        // nested loop that attaches it is O(|docFreq|) — the audited
        // single-row-scalar exception, not a scale-killer (an equi-join
        // on a literal key folds to the same shape anyway).
        val nFrame = docs.agg(count(lit(1)).cast("double").as("__n"))
        docFreq.crossJoin(broadcast(nFrame))
    }
    val w = Window.partitionBy(idCol)
      .orderBy(col("tfidf").desc, col("token").asc)
    terms.join(withN, "token")
      .withColumn("tfidf",
        round(col("tf").cast("double") * log(col("__n") / col("df").cast("double")), 4))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col(idCol), col("token"), col("tfidf"), col("rnk"))
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005) over the corpus
    * token stream, materialized AS DATA: one row per (hash row r,
    * bucket b) with the bucket's total count — `depth`·`width` rows no
    * matter the corpus size, the bounded mergeable summary a fleet of
    * shards unions and sums (CMS cells are counters: merge ≡ groupBy
    * (r, b) sum, exactly the aggregate below). Row hashes are
    * pairwise-salted rescalings of the shared [[polyHash]] value in
    * plain 64-bit integer arithmetic — (2r+1)·H + 97·r mod P mod width,
    * with H < P = 1e9+7 so (2·depth−1)·H stays far inside Int64 — and
    * any engine reproduces every cell bit-for-bit.
    *
    * Scale: tokenize → per-token corpus counts (map-side combined) →
    * `depth` bucket rows per DISTINCT token (not per occurrence) →
    * groupBy (r, b). Nothing wider than the vocabulary ever shuffles,
    * and the sketch itself is ~depth·width longs of state. */
  def cmsSketch(docs: DataFrame, depth: Int = 4, width: Long = 1024L,
                textCol: String = "text"): DataFrame = {
    cmsBucketed(docs, depth, width, textCol)
      .groupBy("r", "b").agg(sum("freq").as("cnt"))
  }

  /** The `depth` salted (r, b) bucket rows per input token row — the
    * ONE definition of the CMS row-hash family, shared by the sketch
    * build, the probe side of [[cmsTopEstimates]], and the streaming
    * twin's estimate reads. Extra input columns ride along. */
  def cmsTokenBuckets(toks: DataFrame, depth: Int, width: Long,
                      tokenCol: String = "token"): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
    require(width >= 1, s"width must be positive, got $width")
    graft.functions.ensureRegistered(toks.sparkSession)
    toks
      .withColumn("__hh", polyHash(col(tokenCol)))
      .withColumn("r", explode(lit((0 until depth).toArray)))
      .withColumn("b",
        pmod((lit(2L) * col("r") + lit(1L)) * col("__hh") + lit(97L) * col("r"),
          lit(1000000007L)) % lit(width))
      .drop("__hh")
  }

  /** Per-distinct-token (token, freq, r, b) frame — the shared
    * sub-plan of [[cmsSketch]] and [[cmsTopEstimates]]. */
  private def cmsBucketed(docs: DataFrame, depth: Int, width: Long,
                          textCol: String): DataFrame =
    cmsTokenBuckets(
      docs.select(explode(tokens(col(textCol))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("freq")),
      depth, width)

  /** CMS accuracy report for the corpus's own top-`k` tokens: each
    * probe's true count, its sketch estimate (min over the `depth`
    * rows of the probed cell — ≥ true by construction), and the
    * overcount. The practical use is the inverse — size (depth, width)
    * until overcount is acceptable, then keep only the sketch — but as
    * a query the report pins estimate semantics end-to-end against the
    * oracle. Probes and sketch share one tokenize/count sub-plan
    * (checkpoint-shared); the probe cut is a TakeOrdered, the estimate
    * join touches depth·k sketch cells. */
  def cmsTopEstimates(docs: DataFrame, k: Int = 30, depth: Int = 4,
                      width: Long = 1024L, textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val bucketed = cmsBucketed(docs, depth, width, textCol).sharedCheckpoint(eager = true)
    val sketch = bucketed.groupBy("r", "b").agg(sum("freq").as("cnt"))
    val probes = bucketed.where(col("r") === 0)
      .select(col("token"), col("freq"))
      .orderBy(col("freq").desc, col("token").asc).limit(k)
    probes
      .join(bucketed.select(col("token"), col("r"), col("b")), "token")
      .join(sketch, Seq("r", "b"))
      .groupBy("token").agg(first(col("freq")).as("freq"), min("cnt").as("est"))
      .select(col("token"), col("freq"), col("est"),
        (col("est") - col("freq")).as("overcount"))
  }

  /** Gopher-style document-quality rule suite (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", §A1.1 — the public heuristic filter
    * battery most pre-training pipelines start from): per document, one
    * boolean per rule plus the conjunction `keep`. Unlike
    * [[qualityScoreOf]]'s scalar score, the per-rule breakdown is the
    * operational artifact — a corpus report aggregates WHICH rule kills
    * documents per source, which is how thresholds actually get tuned.
    *
    * Rules (all ratio comparisons are exact integer cross-products, so
    * any engine replays them bit-for-bit — no float thresholds):
    *   - word count in [minWords, maxWords]
    *   - mean word length in [3, 10] characters (×1e6 integer mean)
    *   - '#' symbol-to-word ratio ≤ 1/10
    *   - ≤ 3/10 of lines end with an ellipsis "..."
    *   - ≤ 9/10 of lines start with a bullet ('-', '*', '•')
    *   - ≥ 4/5 of words contain at least one letter
    *   - at least 2 occurrences of [[EnglishMarkers]] stopwords
    *
    * Scale: one scan, zero shuffles — every rule is a per-row
    * expression over the token array / raw text; at 100 TB this is a
    * map-only pass whose output is (id, 2×long, 8×boolean). */
  def gopherRules(docs: DataFrame,
                  minWords: Long = 50L, maxWords: Long = 100000L,
                  minMeanLenE6: Long = 3000000L, maxMeanLenE6: Long = 10000000L,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minWords >= 0 && maxWords >= minWords,
      s"bad word-count bounds [$minWords, $maxWords]")
    val lines = split(col(textCol), "\n")
    docs
      .select(col(idCol), col(textCol), tokens(col(textCol)).as("__w"))
      .withColumn("n_words", size(col("__w")).cast("long"))
      .withColumn("__sumlen",
        aggregate(col("__w"), lit(0L), (acc, t) => acc + length(t)))
      .withColumn("mean_len_e6",
        when(col("n_words") === 0, lit(0L))
          .otherwise(expr("__sumlen * 1000000 div n_words")))
      .withColumn("__nhash",
        (length(col(textCol)) - length(translate(col(textCol), "#", ""))).cast("long"))
      .withColumn("__lines", lines)
      .withColumn("__nlines", size(col("__lines")).cast("long"))
      .withColumn("__nell",
        size(filter(col("__lines"), l => rtrim(l).endsWith("..."))).cast("long"))
      .withColumn("__nbul",
        size(filter(col("__lines"),
          l => substring(ltrim(l), 1, 1).isInCollection(Seq("-", "*", "•")))).cast("long"))
      .withColumn("__nalpha",
        size(filter(col("__w"), t => t.rlike("[a-z]"))).cast("long"))
      .withColumn("__nstop",
        size(filter(col("__w"), t => t.isInCollection(EnglishMarkers))).cast("long"))
      .select(col(idCol), col("n_words"), col("mean_len_e6"),
        (col("n_words") >= minWords && col("n_words") <= maxWords).as("r_word_count"),
        (col("mean_len_e6") >= minMeanLenE6 &&
          col("mean_len_e6") <= maxMeanLenE6).as("r_mean_len"),
        (col("__nhash") * 10 <= col("n_words")).as("r_symbol"),
        (col("__nell") * 10 <= col("__nlines") * 3).as("r_ellipsis"),
        (col("__nbul") * 10 <= col("__nlines") * 9).as("r_bullet"),
        (col("__nalpha") * 5 >= col("n_words") * 4).as("r_alpha"),
        (col("__nstop") >= 2).as("r_stopwords"))
      .withColumn("keep",
        col("r_word_count") && col("r_mean_len") && col("r_symbol") &&
          col("r_ellipsis") && col("r_bullet") && col("r_alpha") && col("r_stopwords"))
  }

  /** CCNet-style perplexity buckets (Wenzek et al. 2020): rank each
    * source's documents by their [[bigramLogProb]] fluency score and
    * cut the ranking into `nBuckets` equal tiles — head (most fluent),
    * middle, tail. CCNet keeps head+middle and drops tail per language;
    * here the bucket id is emitted so the caller picks the policy.
    *
    * Determinism: the rank order is (mean_logprob DESC, id ASC) — a
    * total order, so NTILE assigns identically in any engine (the
    * 4-dp-rounded score is itself integer-derived and exact). Docs
    * with fewer than 2 tokens have no bigram score and emit no row,
    * as in [[bigramLogProb]].
    *
    * Scale: the LM scoring is [[bigramLogProb]]'s plan (lexicon-sized
    * joins, integer sums); the tile assignment is one window over the
    * (id, source, score) projection — a per-source sort of 16-byte
    * rows, not text. Skew bound = the largest single source; CCNet's
    * own per-(language, shard) sharding is the 100 TB mitigation and
    * composes here by feeding finer `groupCol` values. */
  def perplexityBuckets(docs: DataFrame, nBuckets: Int = 3, lam: Double = 0.7,
                        groupCol: String = "source",
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val scored = bigramLogProb(docs, lam, idCol, textCol)
    scored
      .join(docs.select(col(idCol), col(groupCol)), idCol)
      .withColumn("bucket",
        ntile(nBuckets).over(Window.partitionBy(col(groupCol))
          .orderBy(col("mean_logprob").desc, col(idCol).asc)).cast("long"))
      .select(col(idCol), col(groupCol), col("n_bigrams"),
        col("mean_logprob"), col("bucket"))
  }

  /** Per-source token-distribution KL divergence against the corpus
    * distribution — D(P_source ‖ P_corpus) = Σ_t p_s(t) · ln(p_s(t) /
    * p_c(t)), the standard drift / domain-shift magnitude (a source of
    * boilerplate or another language scores high; a source that looks
    * like the corpus average scores ≈ 0). Always finite: every source
    * token is a corpus token, so p_c > 0 wherever p_s > 0.
    *
    * Numerics: the per-token log-ratio ln((cs·T)/(Ts·ct)) is quantized
    * to 1e-6 and carried as LONG; the divergence is the exact integer
    * Σ cs·lr_e6 div Ts — order-independent, engine-reproducible (the
    * [[unigramLogProb]] discipline). Output kl_e6 ≥ 0 up to
    * quantization (±1e-6 per distinct token).
    *
    * Scale: one token-count shuffle keyed (source, token) — the same
    * frame then aggregates to the corpus marginal (vocabulary-sized,
    * broadcast back), so text is scanned once and only counts move. */
  def sourceTokenKl(docs: DataFrame, groupCol: String = "source",
                    textCol: String = "text"): DataFrame = {
    val st = docs
      .select(col(groupCol).as("source"), explode(tokens(col(textCol))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("cs"))
      .sharedCheckpoint(eager = true)
    val ct = st.groupBy("token").agg(sum("cs").as("ct"))
    val ts = st.groupBy("source").agg(sum("cs").as("ts"))
    val totFrame = ct.agg(sum("ct").cast("double").as("__total"))
    st.join(ct, "token").join(ts, "source")
      .crossJoin(broadcast(totFrame))
      .withColumn("lr_e6", round(
        log((col("cs").cast("double") * col("__total")) /
            (col("ts").cast("double") * col("ct").cast("double"))) * 1e6).cast("long"))
      .groupBy("source")
      .agg(first(col("ts")).as("n_tokens"),
        sum(col("cs") * col("lr_e6")).as("__s"))
      .select(col("source"), col("n_tokens"),
        // clamp at 0: true KL is ≥ 0 (Gibbs); quantization noise could
        // dip a near-identical source below it, and engines disagree on
        // negative integer division (truncate vs floor) — the clamp
        // makes the output exact everywhere
        greatest(lit(0L), expr("__s div n_tokens")).as("kl_e6"))
  }

  /** Corpus token-frequency frame (token, cnt) — the reference snapshot
    * [[tokenDrift]] and [[graft.streaming.StreamingDrift]] compare
    * against. Vocabulary-sized, one count shuffle. */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Batch-vs-reference token-distribution drift — the corpus-drift
    * alarm a continuously-ingesting pipeline watches: one row of
    *   n_tokens     batch token occurrences,
    *   n_in_vocab   occurrences whose token exists in the reference,
    *   drift_e6     floor(mean signed log-ratio ln(p̂/q̂) ×1e6) over the
    *                in-vocab mass (p̂ renormalized to in-vocab, q̂ the
    *                reference marginal) — 0 when nothing overlaps,
    *   oov_e6       out-of-vocabulary mass ×1e6 (the other half of the
    *                signal: a batch in a NEW language shows drift 0 /
    *                oov 1e6, a same-vocab style shift shows oov 0 /
    *                drift ≠ 0).
    * drift_e6 is signed (restricting q̂ to the overlap breaks the Gibbs
    * bound), so it is floored via exact-in-double arithmetic rather
    * than integer division — engines disagree on negative int div.
    *
    * Scale: one batch token-count shuffle; the reference joins on the
    * token key (vocabulary-sized — AQE broadcasts it); the two scalar
    * totals are audited single-row broadcasts. Nothing retains text. */
  def tokenDrift(batch: DataFrame, reference: DataFrame,
                 textCol: String = "text"): DataFrame = {
    val bt = tokenCounts(batch, textCol).withColumnRenamed("cnt", "cs")
    val ref = reference.select(col("token"), col("cnt").as("ct"))
    val refTot = ref.agg(sum("ct").cast("double").as("__rt"))
    val joined = bt.join(ref, Seq("token"), "left")
      .crossJoin(broadcast(refTot))
      .sharedCheckpoint(eager = true)
    val inTot = joined.where(col("ct").isNotNull)
      .agg(sum("cs").cast("double").as("__ts"))
    joined.crossJoin(broadcast(inTot))
      .withColumn("lr_e6",
        when(col("ct").isNotNull && col("__ts") > 0.0,
          round(log((col("cs").cast("double") * col("__rt")) /
            (col("__ts") * col("ct").cast("double"))) * 1e6).cast("long"))
          .otherwise(lit(0L)))
      .agg(
        coalesce(sum("cs"), lit(0L)).as("n_tokens"),
        coalesce(sum(when(col("ct").isNotNull, col("cs")).otherwise(0L)), lit(0L))
          .as("n_in_vocab"),
        coalesce(sum(col("cs") * col("lr_e6")), lit(0L)).as("__s"))
      .select(col("n_tokens"), col("n_in_vocab"),
        when(col("n_in_vocab") > 0,
          floor(col("__s").cast("double") / col("n_in_vocab").cast("double"))
            .cast("long")).otherwise(0L).as("drift_e6"),
        when(col("n_tokens") > 0,
          expr("(n_tokens - n_in_vocab) * 1000000 div n_tokens"))
          .otherwise(0L).as("oov_e6"))
  }

  /** Lexicon screening (the C4-style blockword filter): per-doc hit
    * count and rate against a caller-supplied word list, with a flag at
    * `maxHitRate` — the policy stage every public-corpus release runs
    * (blockwords, PII trigger words, domain-specific deny lists).
    * Matching is on normalized whitespace tokens (the corpus's own
    * tokenization), not substrings — "class" never trips a "lass"
    * entry. Output: (idCol, n_tokens, n_hits, hit_rate_e6, flagged).
    *
    * Scale: the lexicon compiles into the projection as a literal
    * `isInCollection` set (sized for word lists, thousands of entries);
    * one codegen'd scan, no shuffle, no join. */
  def lexiconFlags(docs: DataFrame, lexicon: Seq[String],
                   maxHitRate: Double = 0.0,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(lexicon.nonEmpty, "lexicon must be non-empty")
    require(maxHitRate >= 0 && maxHitRate <= 1, "maxHitRate must be in [0, 1]")
    val rateE6 = math.round(maxHitRate * 1e6)
    docs
      .select(col(idCol), tokens(col(textCol)).as("__w"))
      .select(col(idCol),
        size(col("__w")).cast("long").as("n_tokens"),
        size(filter(col("__w"), t => t.isInCollection(lexicon)))
          .cast("long").as("n_hits"))
      .select(col(idCol), col("n_tokens"), col("n_hits"),
        expr("CASE WHEN n_tokens = 0 THEN 0 " +
          "ELSE n_hits * 1000000 div n_tokens END").as("hit_rate_e6"))
      .withColumn("flagged",
        col("n_hits") > 0 && col("hit_rate_e6") > lit(rateE6))
  }

  /** Markup stripping — the extraction step between a raw HTML crawl
    * and every text operator above: removes tags, unescapes the five
    * core entities, collapses whitespace, and counts the tags it
    * removed (a high `n_tags` density is itself a boilerplate/quality
    * signal). Entity unescape runs AFTER tag removal, so text that
    * spells `&lt;script&gt;` re-reads as literal `<script>` without
    * ever being treated as a tag — single-pass safety, no
    * double-unescape. Output: (idCol, text, n_tags).
    *
    * Deliberately regex-simple (`<[^>]*>`): real-world robustness on
    * par with the extraction rules trafilatura-class pipelines start
    * from, exactly reproducible in any SQL engine, and map-only —
    * one codegen'd projection, no shuffle at any corpus size. */
  def stripMarkup(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val noTags = regexp_replace(col(textCol), "<[^>]*>", " ")
    val unesc = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    docs.select(col(idCol),
      trim(regexp_replace(unesc, "\\s+", " ")).as(textCol),
      size(regexp_extract_all(col(textCol), lit("<[^>]*>"), lit(0)))
        .cast("long").as("n_tags"))
  }

  /** Tokenizer fertility by group: BPE-pretokens per whitespace word,
    * the standard "how well does the tokenizer fit this slice" metric
    * (fertility ≈ 1 for languages the tokenizer was built for; high
    * fertility means the slice pays more sequence length per word —
    * a cost input to mixture planning). One row per group: (group,
    * n_docs, n_words, n_bpe, fertility_e6 = Σbpe·10⁶ div Σwords).
    * Scale: one scan, one |groups|-row aggregate with map-side
    * partials. */
  def fertilityByGroup(docs: DataFrame, groupCol: String = "lang",
                       textCol: String = "text"): DataFrame =
    docs
      .select(col(groupCol),
        size(tokens(col(textCol))).cast("long").as("__w"),
        bpeTokenCount(col(textCol)).cast("long").as("__b"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"), sum("__w").as("n_words"),
        sum("__b").as("n_bpe"))
      .select(col(groupCol), col("n_docs"), col("n_words"), col("n_bpe"),
        expr("CASE WHEN n_words = 0 THEN 0 " +
          "ELSE n_bpe * 1000000 div n_words END").as("fertility_e6"))

  /** Robust length-outlier flags: median ± k·MAD on a numeric column
    * (default `n_chars`) — the distribution-free trim every corpus
    * release runs before histogramming ("drop the 40 MB page dump and
    * the 3-character stubs without hand-picking thresholds"). MAD
    * (median absolute deviation) resists exactly the contamination a
    * mean/stddev cut is blinded by: one giant document shifts a mean
    * cut's own threshold, but not the median's. Output: (idCol, the
    * measured column, is_outlier).
    *
    * `exact = true` (the oracle configuration) computes interpolated
    * medians with the exact `percentile` aggregate — a per-partition
    * value buffer, fine to the low billions of longs but not the
    * 100 TB arm. `exact = false` (default) uses `approx_percentile`
    * at accuracy 1e4: a bounded-memory sketch whose answer is an
    * actual data value within 0.01% rank error — at corpus scale the
    * flag disagrees with exact only for docs within ulps of a cut
    * that is itself a population estimate. Two single-row reduction
    * passes over a one-column pruned scan either way. */
  def lengthOutliers(docs: DataFrame, k: Double = 3.0,
                     idCol: String = "doc_id", valCol: String = "n_chars",
                     exact: Boolean = false): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    def med(c: String): Column =
      if (exact) expr(s"percentile($c, 0.5d)")
      else expr(s"approx_percentile($c, 0.5d, 10000)").cast("double")
    val v = docs.select(col(idCol), col(valCol).cast("double").as("__v"))
    val m = v.agg(med("__v").as("med"))
    val dev = v.crossJoin(broadcast(m)) // audited single-row broadcast
      .select(col(idCol), col("__v"), col("med"),
        abs(col("__v") - col("med")).as("__d"))
    val mad = dev.agg(med("__d").as("mad"))
    dev.crossJoin(broadcast(mad)) // audited single-row broadcast
      .select(col(idCol), col("__v").cast("long").as(valCol),
        (col("__d") > lit(k) * col("mad")).as("is_outlier"))
  }

  /** Zipf-slope corpus naturalness diagnostic: the least-squares slope
    * of log frequency on log rank over the top `topN` vocabulary —
    * natural language sits near −1 (Zipf's law); template/boilerplate
    * corpora flatten (head tokens too uniform), spam/generated text
    * steepens. One row out: (n_types, slope) — slope a 4-dp double,
    * 0.0 for a degenerate single-type corpus (n = 1 makes the
    * least-squares denominator exactly 0). The regression runs
    * on e6-quantized logs (x = ⌊ln rank·10⁶⌋, y = ⌊ln freq·10⁶⌋), so
    * the Σx/Σy/Σxy/Σx² moments are exact integers and the single
    * closed-form division (num/den as one double op, rounded to 4 dp)
    * replays identically on any IEEE engine.
    *
    * Scale: token counting is the [[vocabTopK]] shape (map-side
    * combine on the token key); the regression itself runs on topN
    * rows. The rank window is a single-partition TakeOrdered over the
    * topN frame — bounded by construction. */
  def zipfSlope(docs: DataFrame, topN: Int = 100,
                textCol: String = "text"): DataFrame = {
    require(topN > 1, s"topN must be > 1, got $topN")
    val freq = docs
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(topN)
    val w = Window.orderBy(col("freq").desc, col("token").asc)
    val xy = freq.withColumn("rank", row_number().over(w))
      .select(
        floor(log(col("rank").cast("double")) * 1e6).cast("long").as("x"),
        floor(log(col("freq").cast("double")) * 1e6).cast("long").as("y"))
    xy.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
      .select(col("n").as("n_types"),
        when(col("n") * col("sxx") - col("sx") * col("sx") === 0L, lit(0.0))
          .otherwise(
            round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 4))
          .as("slope"))
  }
}
