package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Text-pipeline operator semantics on hand-built goldens plus
  * stability properties on the driver tables.
  */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cleanText strips tags and entities and collapses whitespace") {
    val got = Seq(
      "<p>Hello <b>world</b></p>",
      "a &amp; b&nbsp;c",
      "  spaced\t\tout \n text  ",
      "plain").toDF("text")
      .select(TextAnalysis.cleanText(col("text")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("Hello world", "a b c", "spaced out text", "plain"))
  }

  test("piiFlags counts emails, digit runs, and phone shapes") {
    val r = TextAnalysis.piiFlags(Seq(
      ("reach me at jo.doe+x@mail.example.org or admin@ex.co",
        2L, 0L, 0L),
      ("card 1234567890123456 and id 987654321", 0L, 2L, 0L),
      ("call +1 555 867 5309 today", 0L, 0L, 1L),
      ("nothing here", 0L, 0L, 0L)).toDF("text", "e", "d", "p"), "text")
      .collect()
    r.foreach { row =>
      assert(row.getAs[Long]("n_emails") == row.getAs[Long]("e"), row.getString(0))
      assert(row.getAs[Long]("n_long_digit_runs") == row.getAs[Long]("d"), row.getString(0))
      assert(row.getAs[Long]("n_phone_like") == row.getAs[Long]("p"), row.getString(0))
    }
  }

  test("assignSplit: deterministic, repartition-stable, near the requested ratios") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val once = TextAnalysis.assignSplit(docs, "doc_id")
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val again = TextAnalysis.assignSplit(docs.repartition(7), "doc_id")
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(once == again, "split must not depend on partitioning")
    val n = once.size.toDouble
    val train = once.values.count(_ == "train") / n
    assert(train > 0.8 && train < 0.98, s"train fraction $train implausible for 90%")
    // A subset keeps its assignment (stability under appends/deletes).
    val subset = TextAnalysis.assignSplit(docs.where(col("doc_id") % 3 === 0), "doc_id")
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    subset.foreach { case (id, s) => assert(once(id) == s) }
  }

  test("shingleStrings: word 3-grams, and short docs have none") {
    val got = Seq("a b c d", "x y", "", "one two three")
      .toDF("text")
      .select(TextAnalysis.shingleStrings(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1).isEmpty && got(2).isEmpty,
      "docs under k tokens must yield zero shingles, never a flipped range")
    assert(got(3) == Seq("one two three"))
  }

  test("redactPii replaces emails, digit runs, and phone shapes with tokens") {
    val got = Seq("mail a@b.com num 123456789 phone +1 555 1234 ok")
      .toDF("text")
      .select(TextAnalysis.redactPii(col("text")).as("r"))
      .first().getString(0)
    // The phone pattern's optional trailing `[- .]?[0-9]{0,4}` greedily
    // consumes the separator after the number — identical in the SQL
    // twin, so it's pinned as-is.
    assert(got == "mail <EMAIL> num <NUM> phone <PHONE>ok")
  }

  test("topTfIdfTerm: corpus-df scoring, lexical tiebreak, rare term wins") {
    // Corpus of 4 docs; docs 1-2 are the scored slice.
    val corpus = Seq(
      (1L, "apple apple banana zebra"),  // zebra: tf 1 df 1 (1.0) beats apple: tf 2 df 3 (0.667)
      (2L, "banana apple cherry cherry"),// cherry: tf 2 df 1 (2.0)
      (3L, "apple banana banana"),
      (4L, "apple banana")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.topTfIdfTerm(
        corpus.where(col("doc_id") <= 2), corpus, "doc_id", "text")
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, "zebra", 1L, 1L), (2L, "cherry", 2L, 1L)))
  }

  test("tfidfLog pins the classic log-idf values exactly") {
    // tf=2, df=4, N=8 -> 2*ln(2); tf=3, df=8, N=8 -> 0.
    val vals = Seq((2L, 4L), (3L, 8L)).toDF("tf", "df")
      .select(TextAnalysis.tfidfLog(col("tf"), col("df"), nDocs = 8L).as("s"))
      .collect().map(_.getDouble(0))
    assert(vals(0) == 2.0 * math.log(2.0))
    assert(vals(1) == 0.0)
  }

  test("contaminationReport flags exactly the docs sharing a 3-gram") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),     // contains "quick brown fox"
      (2L, "totally unrelated training text here"),
      (3L, "quick brown dog sits quietly"),  // 2-word overlap only -> clean
      (4L, "end of quick brown fox")         // contaminated too
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "benchmark says quick brown fox wins")).toDF("doc_id", "text")
    val r = TextAnalysis.contaminationReport(train, bench, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_train_docs") == 4L)
    assert(r.getAs[Long]("n_contaminated") == 2L)
    assert(r.getAs[Long]("n_shared_shingles") == 1L)
  }

  test("repetitionStats pins n-gram repetition on hand-counted goldens") {
    val rows = TextAnalysis.repetitionStats(Seq(
      (1L, "a b a b a b"), // bigrams: 'a b'x3 'b a'x2; trigrams: 'a b a'x2 'b a b'x2
      (2L, "w x y z"),     // no repetition anywhere
      (3L, "q q q q q"),   // total degeneracy
      (4L, "one two"),     // bigrams but no trigram can repeat
      (5L, "solo")         // no bigrams at all
    ).toDF("doc_id", "text"), "text").collect()
      .map(r => r.getLong(0) -> r).toMap

    val d1 = rows(1L)
    assert(d1.getAs[Long]("n_tok") == 6L && d1.getAs[Long]("n_distinct") == 2L)
    assert(d1.getAs[Double]("dup_tok_frac") == 4.0 / 6.0)
    assert(d1.getAs[Long]("top_bigram_n") == 3L)
    assert(d1.getAs[Double]("top_bigram_frac") == 3.0 / 5.0)
    assert(d1.getAs[Long]("dup_trigram_mass") == 4L)

    val d2 = rows(2L)
    assert(d2.getAs[Double]("dup_tok_frac") == 0.0)
    assert(d2.getAs[Long]("top_bigram_n") == 1L)
    assert(d2.getAs[Long]("dup_trigram_mass") == 0L)

    val d3 = rows(3L)
    assert(d3.getAs[Double]("dup_tok_frac") == 4.0 / 5.0)
    assert(d3.getAs[Long]("top_bigram_n") == 4L)
    assert(d3.getAs[Double]("top_bigram_frac") == 1.0)
    assert(d3.getAs[Long]("dup_trigram_mass") == 3L)

    val d4 = rows(4L)
    assert(d4.getAs[Long]("top_bigram_n") == 1L)
    assert(d4.getAs[Long]("dup_trigram_mass") == 0L)

    // A one-token doc has zero bigrams AND trigrams: both left joins
    // miss and the coalesced counts must read 0, not null.
    val d5 = rows(5L)
    assert(d5.getAs[Long]("n_tok") == 1L)
    assert(d5.getAs[Long]("top_bigram_n") == 0L)
    // 0/(n_tok-1) is 0/0 here — the guard must pin it to 0.0, not
    // NULL (ANSI off) / error (ANSI on) / NaN (some DuckDB builds).
    assert(d5.getAs[Double]("top_bigram_frac") == 0.0)
    assert(d5.getAs[Long]("dup_trigram_mass") == 0L)
  }

  test("memorizedBigramStats: corpus-frequent bigram fraction, short docs kept at 0") {
    // Corpus bigram counts: 'a b' x3 (docs 1,2,3), 'b c' x2 (docs 1,2),
    // 'x y' x1 (doc 4). minCount=2 → memorized grams {'a b','b c'}.
    val rows = TextAnalysis.memorizedBigramStats(Seq(
      (1L, "a b c"),   // grams: a b, b c → 2/2 memorized
      (2L, "a b c"),   // same
      (3L, "a b"),     // 1/1
      (4L, "x y"),     // 0/1
      (5L, "solo")     // no bigrams: 0/0 → frac 0.0, row KEPT
    ).toDF("doc_id", "text"), "doc_id", "text", minCount = 2L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows(1L) == ((2L, 2L, 1.0)))
    assert(rows(2L) == ((2L, 2L, 1.0)))
    assert(rows(3L) == ((1L, 1L, 1.0)))
    assert(rows(4L) == ((1L, 0L, 0.0)))
    assert(rows(5L) == ((0L, 0L, 0.0)))
  }

  test("surprisalStats: integer-exact bits from the corpus bigram LM, short docs kept at 0") {
    // Bigrams (with multiplicity): doc 1 'a b' x2, 'b a' x1 (from
    // "a b a b"); doc 2 'a c' x1. Corpus: c('a b')=2, c('b a')=1,
    // c('a c')=1. Prefix mass: c1(a)=3, c1(b)=1.
    // bits = floor(log2(c1 DIV c)): 'a b' → 3 DIV 2 = 1 → 0;
    // 'b a' → 1 DIV 1 = 1 → 0; 'a c' → 3 DIV 1 = 3 → 1.
    val rows = TextAnalysis.surprisalStats(Seq(
      (1L, "a b a b"), // n=3, bits_sum = 2*0 + 1*0 = 0, mean 0.0
      (2L, "a c"),     // n=1, bits_sum = 1, mean 1.0
      (3L, "solo")     // no bigrams: all-zero row KEPT
    ).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows(1L) == ((3L, 0L, 0.0)))
    assert(rows(2L) == ((1L, 1L, 1.0)))
    assert(rows(3L) == ((0L, 0L, 0.0)))
    // The predictability direction: a doc made of the corpus's dominant
    // continuations scores strictly below one made of rare ones.
    val contrast = TextAnalysis.surprisalStats(Seq(
      (1L, "the cat sat"), (2L, "the cat sat"), (3L, "the cat sat"),
      (4L, "the cat sat"), (5L, "the cat sat"), (6L, "the cat sat"),
      (7L, "the dog ran")
    ).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(contrast(1L) < contrast(7L),
      s"boilerplate must score below rare text: ${contrast(1L)} vs ${contrast(7L)}")
  }

  test("oovStats: corpus-derived vocab, count-then-token tiebreak, per-doc fractions") {
    // Corpus counts: a=4, b=3, c=3, d=1, e=1. vocabSize=2 keeps {a, b}
    // (b beats c only by the lexical tiebreak at count 3 — pinned).
    val rows = TextAnalysis.oovStats(Seq(
      (1L, "a b c a"),
      (2L, "b c d a"),
      (3L, "e c b a"),
      (4L, "e")
    ).toDF("doc_id", "text"), "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("n_oov") == 1L) // c
    assert(rows(2L).getAs[Long]("n_oov") == 2L) // c d
    assert(rows(3L).getAs[Long]("n_oov") == 2L) // e c
    assert(rows(4L).getAs[Long]("n_oov") == 1L && rows(4L).getAs[Double]("oov_frac") == 1.0)
    assert(rows(1L).getAs[Double]("oov_frac") == 0.25)
  }

  test("pmiBigrams: hand-computed ratios, (ratio DESC, bigram) order, minCount floor") {
    // Tokens: a,b,a,b,a,c → c_a=3, c_b=2, c_c=1, N=6.
    // Bigrams: "a b"×2, "b a"×1, "a c"×1.
    // pmi_ratio: "a b" = 2·6/(3·2) = 2.0, "a c" = 1·6/(3·1) = 2.0,
    //            "b a" = 1·6/(2·3) = 1.0. Tie at 2.0 → lexical order.
    val got = TextAnalysis.pmiBigrams(
      Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text"),
      "text", minCount = 1L, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("a b", 2L, 3L, 2L, 2.0),
      ("a c", 1L, 3L, 1L, 2.0),
      ("b a", 1L, 2L, 3L, 1.0)))
    // minCount floors hapax pairs out.
    val floored = TextAnalysis.pmiBigrams(
      Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text"),
      "text", minCount = 2L, topK = 10)
      .collect().map(_.getString(0))
    assert(floored.toSeq == Seq("a b"))
  }

  test("bpePairs: vocab-census weighting and overlapping adjacent pairs") {
    // Word census: "abab"×2, "aaa"×1, "b"×1 (dropped: length < 2).
    // Pairs: abab → a b, b a, a b (weight 2 each); aaa → a a, a a (1).
    // n_occ: "a b" = 4, "b a" = 2, "a a" = 2; n_words 1 each.
    val got = TextAnalysis.bpePairs(
      Seq((1L, "abab aaa b"), (2L, "abab")).toDF("doc_id", "text"),
      "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a b", 4L, 1L), ("a a", 2L, 1L), ("b a", 2L, 1L)))
  }

  test("dropRepeatedBlocks: shared nav-bar blocks drop everywhere, unique bodies and within-doc repeats survive") {
    val nav = (1 to 10).map(i => s"nav$i").mkString(" ")     // one exact 10-word block
    val docs = Seq(
      (1L, s"$nav unique body of document one right here"),
      (2L, s"$nav a different body for document two instead"),
      (3L, "totally original document with no shared blocks at all yes"),
      // Within-doc repetition: the same 10 words twice in ONE doc —
      // df = 1, so boilerplate removal must NOT touch it.
      (4L, ("rep " * 10).trim + " " + ("rep " * 10).trim))
      .toDF("doc_id", "text")
    val got = TextAnalysis.dropRepeatedBlocks(docs, "doc_id", "text",
        blockTokens = 10, minDf = 2L)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // Docs 1 and 2 share exactly the nav block: it drops from BOTH,
    // each keeps its unique tail (a short final block).
    assert(got(1L)._1 == "unique body of document one right here", got(1L))
    assert(got(2L)._1 == "a different body for document two instead")
    assert(got(1L)._3 == 1L && got(2L)._3 == 1L, "exactly the nav block drops")
    // Doc 3 is untouched.
    assert(got(3L)._1 == "totally original document with no shared blocks at all yes")
    assert(got(3L)._3 == 0L)
    // Doc 4's within-doc repeat survives whole (df = 1).
    assert(got(4L)._1 == ("rep " * 20).trim && got(4L)._3 == 0L)
  }

  test("nfcNormalize: composition collapses canonical twins; ASCII passes through; idempotent") {
    val composed = "café"            // precomposed é
    val decomposed = "café"         // e + combining acute
    val hangulDecomp = "가"     // ᄀ + ᅡ → 가
    val docs = Seq((1L, composed), (2L, decomposed), (3L, "plain ascii"),
      (4L, hangulDecomp), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.nfcNormalize(docs, "text", "norm")
      .select(col("doc_id"), col("norm"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L) == composed)
    assert(got(2L) == composed, "decomposed é must compose to the precomposed form")
    assert(got(3L) == "plain ascii", "NFC is the identity on ASCII")
    assert(got(4L) == "가", "decomposed Hangul jamo must compose to the syllable")
    assert(got(5L) == null, "null text → null")
    // Canonical twins now collapse under exact dedup.
    val distinct = TextAnalysis.nfcNormalize(
        docs.where(col("text").isNotNull), "text", "norm")
      .agg(count_distinct(col("norm")), count_distinct(col("text"))).head()
    assert(distinct.getLong(0) == 3L && distinct.getLong(1) == 4L,
      "composed+decomposed café must be ONE normalized doc, two raw docs")
    // Idempotence: normalizing the normalized column changes nothing.
    val again = TextAnalysis.nfcNormalize(
        TextAnalysis.nfcNormalize(docs.where(col("text").isNotNull),
          "text", "n1"), "n1", "n2")
      .where(col("n1") =!= col("n2")).count()
    assert(again == 0, "NFC must be idempotent")
  }

  test("bpeTrain: hand-derived merge order, census weighting, tie-break, minCount floor") {
    // Word census: abab ×3, aaa ×1, bb ×1.
    // Iter 1: "a b" 6, "b a" 3, "a a" 2, "b b" 1 → merge "a b".
    // Iter 2: abab = [ab, ab] → "ab ab" 3, "a a" 2, "b b" 1 → "ab ab".
    // Iter 3: "a a" 2, "b b" 1 → "a a"; then everything < minCount 2.
    val docs = Seq((1L, "abab abab aaa"), (2L, "abab bb")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrain(docs, "text", nMerges = 10) ==
      Seq("a b", "ab ab", "a a"))
    // minCount floor: "ab ab" (count 3) falls under 4, training stops.
    assert(TextAnalysis.bpeTrain(docs, "text", nMerges = 10, minCount = 4L) ==
      Seq("a b"))
    // Tied counts pick the lexicographically smallest pair — the same
    // (n_occ desc, pair asc) order bpePairs pins.
    val tie = Seq((1L, "ab cd ab cd")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrain(tie, "text", nMerges = 1) == Seq("a b"))
    // maxVocab census prune: keep only the top word (abab ×3) — the
    // tail's merges (a a from aaa) vanish, the head's survive.
    assert(TextAnalysis.bpeTrain(docs, "text", nMerges = 10, maxVocab = 1) ==
      Seq("a b", "ab ab"))
  }

  test("bpeEncode: greedy rank-order merges, all-occurrence passes, reconstruction, null/empty") {
    val merges = Seq("a b", "ab ab", "a a")
    val docs = Seq((1L, "abab"), (2L, "aaa"), (3L, "bb"), (4L, "ababab"),
      (5L, "ba"), (6L, ""), (7L, null.asInstanceOf[String]),
      (8L, "abab aaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncode(docs, "text", merges, "toks")
      .select(col("doc_id"), col("toks"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(got(1L) == Seq("abab"))
    // All occurrences of the chosen pair merge left-to-right: aaa →
    // [aa, a], never [a, aa].
    assert(got(2L) == Seq("aa", "a"))
    assert(got(3L) == Seq("b", "b"), "untrained pairs must not merge")
    // Rank order beats position: "a b" (rank 0) fires everywhere
    // before "ab ab" (rank 1) — ababab → [ab,ab,ab] → [abab, ab].
    assert(got(4L) == Seq("abab", "ab"))
    assert(got(5L) == Seq("b", "a"), "merges are ordered: ba is not ab")
    assert(got(6L) == Seq(), "empty text → zero tokens")
    assert(got(7L) == null, "null text → null")
    assert(got(8L) == Seq("abab", "aa", "a"), "words segment independently")
    // Reconstruction invariant over a broader random-ish corpus.
    val wide = (1L to 60L).map(i =>
        (i, s"lower newest low${i % 7} widest lowest new est ${i}x"))
      .toDF("doc_id", "text")
    val rec = TextAnalysis.bpeEncode(wide, "text",
        TextAnalysis.bpeTrain(wide, "text", nMerges = 20), "toks")
      .select((concat_ws("", col("toks")) ===
        regexp_replace(col("text"), " ", "")).as("ok"))
      .collect()
    assert(rec.nonEmpty && rec.forall(_.getBoolean(0)),
      "concat of BPE tokens must reproduce the text minus spaces")
  }

  test("dsirContrastBits: all-target contrast is zero; disjoint doc is all-OOV") {
    // Target = everything → bits_t == bits_raw for every gram → w_bits
    // and n_oov_target are identically zero.
    val allTarget = TextAnalysis.dsirContrastBits(
      Seq((1L, "a b a b"), (2L, "b a c d")).toDF("doc_id", "text"),
      "doc_id", "text", lit(true))
      .collect()
    assert(allTarget.forall(r => r.getAs[Long]("w_bits") == 0L &&
      r.getAs[Long]("n_oov_target") == 0L))
    // A doc sharing no bigram with the target corpus: every gram OOV,
    // w_bits 0 (OOV grams carry no contrast mass by contract).
    val oov = TextAnalysis.dsirContrastBits(
      Seq((1L, "a b a b"), (2L, "x y z")).toDF("doc_id", "text"),
      "doc_id", "text", col("doc_id") === 1L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(oov(2L).getAs[Long]("n_oov_target") == 2L)
    assert(oov(2L).getAs[Long]("w_bits") == 0L)
    // And the target doc itself: raw census has 5 bigram tokens
    // ("a b"×2, "b a"×1, "x y", "y z"), target census only doc 1's.
    // Doc 1's grams exist in both → no OOV.
    assert(oov(1L).getAs[Long]("n_oov_target") == 0L)
  }

  test("dsirContrastBits direction: target-like docs outscore off-target docs") {
    // Target grams are common in target, rare in raw → positive
    // contrast for docs made of them; doc 9 (off-target grams) gets
    // no positive mass from the target LM.
    val docs = (1L to 8L).map(i => (i, "the cat sat on the mat")) :+
      ((9L, "stock market index fund")) :+
      ((10L, "the cat sat on the mat"))
    val got = TextAnalysis.dsirContrastBits(
      docs.toDF("doc_id", "text"), "doc_id", "text", col("doc_id") <= 8L)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("w_bits"), r.getAs[Long]("n_oov_target"))).toMap
    assert(got(10L)._1 >= 0L, s"target-like doc must not score negative: ${got(10L)}")
    assert(got(9L)._2 == 3L, "off-target doc is all-OOV under the target LM")
    assert(got(10L)._1 > got(9L)._1 || got(9L)._2 > 0L)
  }

  test("bm25TopK: rare-term docs outrank common-term docs; dl normalization; tf columns") {
    val docs = Seq(
      (1L, "rare common common common"),          // has the rare term
      (2L, "common common common common"),        // common only
      (3L, "rare common"),                        // rare term, shorter doc
      (4L, "filler filler filler filler filler")) // no query term
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      Seq("rare", "common"), topK = 10).collect()
    val ids = got.map(_.getLong(0)).toSeq
    // Doc 4 has no query term → absent from candidates.
    assert(!ids.contains(4L))
    // Both rare-term docs rank above the common-only doc; the shorter
    // rare-term doc (3) beats the longer one (1) on dl normalization.
    assert(ids.take(2).toSet == Set(1L, 3L))
    assert(ids.head == 3L, s"shorter doc must rank first: $ids")
    assert(ids.last == 2L)
    val byId = got.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Long]("tf_0") == 1L && byId(1L).getAs[Long]("tf_1") == 3L)
    assert(byId(2L).getAs[Long]("tf_0") == 0L && byId(2L).getAs[Long]("tf_1") == 4L)
    assert(got.map(_.getAs[Double]("score")).toSeq ==
      got.map(_.getAs[Double]("score")).sortBy(-_).toSeq)
  }

  test("gopherRules: each rule trips on its own violation") {
    val good = (1 to 50).map(i => s"word$i").mkString(" ") + " the and"
    val docs = Seq(
      (1L, good),                                              // all pass
      (2L, "too short to pass"),                               // < 50 words
      (3L, (1 to 50).map(_ => "a").mkString(" ") + " the and"), // mean len < 3
      (4L, ((1 to 40).map(_ => "word") ++ (1 to 20).map(_ => "12345"))
        .mkString(" ") + " the and"),                          // alpha < 80%
      (5L, good + (1 to 10).map(_ => " #").mkString),          // symbols > 10%
      (6L, (1 to 50).map(i => s"xyz$i").mkString(" ")))        // no req stops
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("pass_all") == 1L)
    assert(got(2L).getAs[Long]("ok_nwords") == 0L && got(2L).getAs[Long]("n_words") == 4L)
    assert(got(3L).getAs[Long]("ok_mean_len") == 0L && got(3L).getAs[Long]("ok_nwords") == 1L)
    assert(got(4L).getAs[Long]("ok_alpha") == 0L && got(4L).getAs[Long]("n_alpha_words") == 42L)
    assert(got(5L).getAs[Long]("ok_symbol") == 0L && got(5L).getAs[Long]("n_sym") == 10L)
    assert(got(6L).getAs[Long]("ok_stops") == 0L && got(6L).getAs[Long]("n_req_stops") == 0L)
    Seq(2L, 3L, 4L, 5L, 6L).foreach(id =>
      assert(got(id).getAs[Long]("pass_all") == 0L, s"doc $id"))
  }

  test("gopherRules: ellipsis runs count by thirds; mean-len bounds inclusive") {
    val base = (1 to 60).map(i => s"ab$i").mkString(" ")    // 60 words, has 'the and' no
    val docs = Seq(
      (1L, base + " the and ......"),   // 6 dots = 2 ellipsis runs
      (2L, base + " the and")).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_sym") == 2L)
    assert(got(2L).getAs[Long]("n_sym") == 0L)
    assert(got(2L).getAs[Long]("pass_all") == 1L)
  }

  test("sourceQuality dashboard: per-source masses cover the corpus; rates bounded") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val rows = graft.SparkEntry.queries("x_source_quality")(spark, TestSpark.sf0001)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      docs.where(col("text").isNotNull).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pass_gopher") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_pii_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("surprisal_milli_bits") >= 0L)
    }
  }

  // Split buckets for small ids: b(id) = (61*id + 29) % 100 (the
  // canonical multiplicative hash reduced mod 100). Train = b < 80:
  // ids 0,2,3,5 train; 1,6,14,19 holdout.
  test("nbClassify: hand-derived bits, prediction, tie-break, OOV default") {
    val docs = Seq(
      (0L, "the cat sat", "en"),
      (2L, "the dog ran", "en"),
      (3L, "le chat noir", "fr"),
      (5L, "le chien brun", "fr"),
      (1L, "the cat ran", "en"),
      (6L, "le chat brun", "fr"),
      (14L, "zzz qqq", "fr"),
      (19L, "the le", "fr")).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.nbClassify(docs, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(got.keySet == Set(1L, 6L, 14L, 19L), "holdout = buckets >= 80")
    // V_en = V_fr = 6; bits: the/le -> 1, count-1 words -> 2,
    // unseen-in-class penalty -> 3, prior (4 DIV 2) -> 1 bit each.
    assert(got(1L) == (("en", "en", 6L, 3L, 0L, 1L)))   // 1+2+2 + 1
    assert(got(6L) == (("fr", "fr", 6L, 3L, 0L, 1L)))   // 1+2+2 + 1
    // Tie at 5 bits both classes -> label-asc tiebreak picks en.
    assert(got(19L) == (("fr", "en", 5L, 2L, 0L, 0L)))
    // All-OOV doc: default = min-(prior, label) class, zero scored.
    assert(got(14L) == (("fr", "en", 1L, 0L, 2L, 0L)))
  }

  test("streamClassify: accumulated predictions equal batch scoring; shard-split-invariant") {
    import java.nio.file.{Files, Paths}
    val docs = (0L until 40L).map { id =>
      if (id % 2 == 0) (id, "alpha beta alpha gamma", "A")
      else (id, "omega psi omega chi", "B")
    }.toDF("doc_id", "text", "lang")
    val base = docs.withColumn("__b", TextAnalysis.splitBucket(col("doc_id")))
    val (grid, dflt) = TextAnalysis.nbModel(base.where(col("__b") < 80), "text", "lang")
    val holdout = base.where(col("__b") >= 80).select(col("doc_id"), col("text"), col("lang"))
    val batch = TextAnalysis.nbScore(holdout, "doc_id", "text", "lang", grid, dflt)
      .collect().map(_.toSeq).toSet
    def run(splitAt: Long, tag: String): Set[Seq[Any]] = {
      val root = Files.createTempDirectory(s"graft_stream_cls_$tag").toString
      val inDir = s"$root/in"
      Files.createDirectories(Paths.get(inDir))
      Seq(holdout.where(col("doc_id") < splitAt), holdout.where(col("doc_id") >= splitAt))
        .zipWithIndex.foreach { case (df, i) =>
          val w = s"$root/w$i"
          df.coalesce(1).write.mode("overwrite").parquet(w)
          val part = new java.io.File(w).listFiles()
            .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
          Files.move(part.toPath, Paths.get(inDir, s"shard_$i.parquet"))
        }
      val stream = spark.readStream.schema(holdout.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      val (acc, n) = TextAnalysis.streamClassify(spark,
        s"graft_stream_cls_spec_$tag", stream, "doc_id", "text", "lang",
        grid, dflt, queryName = s"stream_cls_spec_$tag")
      assert(n == 2, s"expected 2 micro-batches, got $n")
      acc.collect().map(_.toSeq).toSet
    }
    val a = run(20L, "a")
    assert(a == batch,
      s"streamed predictions diverged: extra=${a -- batch} missing=${batch -- a}")
    assert(run(10L, "b") == a, "shard split must not change predictions")
  }

  test("nbClassify: separable vocab classifies the holdout perfectly; repartition-stable") {
    val docs = (0L until 40L).map { id =>
      if (id % 2 == 0) (id, "alpha beta alpha gamma", "A")
      else (id, "omega psi omega chi", "B")
    }.toDF("doc_id", "text", "lang")
    val out = TextAnalysis.nbClassify(docs, "doc_id", "text", "lang")
    val rows = out.collect()
    assert(rows.length == 8, "8 of 40 ids hash into buckets >= 80")
    assert(rows.forall(_.getAs[Long]("correct") == 1L),
      "disjoint vocabularies must classify perfectly")
    assert(rows.forall(_.getAs[Long]("n_oov") == 0L))
    val again = TextAnalysis.nbClassify(docs.repartition(7), "doc_id", "text", "lang")
      .collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "prediction must not depend on partitioning")
  }

  test("unigramSegment: min-bits Viterbi, longer-piece tie-break, OOV fallback") {
    import graft.functions.{Kernels, UnigramTable}
    def tab(es: (String, Long)*) =
      new UnigramTable(es.map { case (p, b) => s"$p\t$b" }.toArray)
    // A cheap "ab" piece beats character paths.
    val t1 = tab("a" -> 3L, "b" -> 3L, "c" -> 4L, "ab" -> 2L)
    assert(Kernels.unigramSegment("ababc", t1).toSeq == Seq("ab", "ab", "c"))
    // Exact cost tie ("ab" = 6 = a + b): the LONGER last piece wins.
    val t2 = tab("a" -> 3L, "b" -> 3L, "ab" -> 6L)
    assert(Kernels.unigramSegment("ab", t2).toSeq == Seq("ab"))
    // Global min-bits beats greedy-longest-prefix: a+bc = 4 < ab+c = 10.
    val t3 = tab("a" -> 2L, "b" -> 5L, "c" -> 9L, "ab" -> 1L, "bc" -> 2L)
    assert(Kernels.unigramSegment("abc", t3).toSeq == Seq("a", "bc"))
    // An out-of-inventory codepoint falls back to itself at OOV cost —
    // segmentation never throws.
    assert(Kernels.unigramSegment("axb", t1).toSeq == Seq("a", "x", "b"))
    assert(Kernels.unigramSegment("", t1).isEmpty)
  }

  test("unigramEncode: the codegen kernel, per-word concatenation, null/empty") {
    val pieces = Seq("a\t3", "b\t3", "c\t4", "ab\t2")
    val docs = Seq((1L, "ababc ab"), (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.unigramEncode(docs, "text", pieces, "toks")
      .orderBy("doc_id").collect()
    assert(got(0).getSeq[String](2) == Seq("ab", "ab", "c", "ab"))
    assert(got(1).getSeq[String](2).isEmpty)
    assert(got(2).isNullAt(2))
  }

  test("unigramTrain: char coverage, determinism, vocab cut, kernel reconstruction, compression") {
    val docs = Seq((1L, "abab abab cd"), (2L, "abab cd xyz"))
      .toDF("doc_id", "text")
    val inv = TextAnalysis.unigramTrain(docs, "text", vocabSize = 8,
      maxPieceLen = 4)
    assert(inv == TextAnalysis.unigramTrain(docs, "text", vocabSize = 8,
      maxPieceLen = 4), "training must be bit-deterministic")
    val piecesOnly = inv.map(e => e.substring(0, e.lastIndexOf('\t')))
    Seq("a", "b", "c", "d", "x", "y", "z").foreach(ch =>
      assert(piecesOnly.contains(ch), s"char coverage must include '$ch'"))
    // vocabSize 8 with 7 single chars leaves exactly one multi piece.
    assert(piecesOnly.size == 8 &&
      piecesOnly.count(_.length > 1) == 1, inv.toString)
    inv.foreach { e =>
      val i = e.lastIndexOf('\t')
      assert(i > 0 && e.substring(i + 1).toLong >= 0L, e)
    }
    // The training corpus reconstructs through the encode kernel, and
    // the multi-char piece actually engages (compression).
    val enc = TextAnalysis.unigramEncode(docs, "text", inv, "toks")
    assert(enc.where(concat_ws("", col("toks")) =!=
      regexp_replace(col("text"), " ", "")).count() == 0L)
    val nPieces = enc.agg(sum(size(col("toks")))).head().getLong(0)
    assert(nPieces < 19L, s"expected compression below 19 chars, got $nPieces")
  }
}
