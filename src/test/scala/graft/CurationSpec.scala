package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Curation

/** Behavioral tests for the curation operators (decontamination,
  * repetition stats, PII redaction, sequence packing) on planted inputs —
  * the sf-level hash checks live in the Verify/oracle gate.
  */
class CurationSpec extends SparkSpec with Matchers {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("decontaminate flags an eval-identical doc at 100%, clean docs at 0%") {
    val leaked = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = docs(
      1L -> leaked,
      2L -> "uno dos tres cuatro cinco seis siete ocho nueve diez",
      3L -> ("prefix words here then " + leaked)) // partial overlap
    val eval = docs(100L -> leaked)
    val out = Curation.decontaminate(corpus, eval, "doc_id", "text",
        shingleSize = 5, thresholdPct = 20)
      .orderBy("doc_id").collect()
    // doc 1: all 6 5-shingles shared -> 100%, contaminated
    out(0).getAs[Long]("matched_shingles") shouldBe out(0).getAs[Long]("total_shingles")
    out(0).getAs[Long]("overlap_pct") shouldBe 100L
    out(0).getAs[Boolean]("contaminated") shouldBe true
    // doc 2: nothing shared
    out(1).getAs[Long]("matched_shingles") shouldBe 0L
    out(1).getAs[Boolean]("contaminated") shouldBe false
    // doc 3: the leaked suffix contributes shared shingles but the prefix
    // dilutes the ratio below 100
    out(2).getAs[Long]("matched_shingles") should be > 0L
    out(2).getAs[Long]("overlap_pct") should be < 100L
  }

  test("semanticDecontaminate: nearest eval vector sets the max, threshold splits the flag") {
    import spark.implicits._
    // eval = x-axis unit vector. Corpus: parallel (cos 1), 45-degree
    // (cos ~0.707), orthogonal (cos 0).
    val corpus = Seq(
      (1L, Array(2.0f, 0.0f)), (2L, Array(1.0f, 1.0f)), (3L, Array(0.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    val eval = Seq((100L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Curation.semanticDecontaminate(corpus, eval, "vec_id",
        "embedding", threshold = 0.7)
      .orderBy("vec_id").collect()
    out.map(_.getAs[Boolean]("contaminated")).toSeq shouldBe Seq(true, true, false)
    out(0).getAs[Double]("max_eval_cosine") shouldBe 1.0 +- 1e-12
    out(1).getAs[Double]("max_eval_cosine") shouldBe math.sqrt(0.5) +- 1e-12
    out(2).getAs[Double]("max_eval_cosine") shouldBe 0.0 +- 1e-12
  }

  test("semanticDecontaminate: zero-norm eval vectors are dropped, all-zero eval fails loudly") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(2.0f, 0.0f)), (2L, Array(0.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    // a zero-norm eval vector used to NaN every cosine (max propagates
    // NaN → every corpus row flagged); it must be ignored now
    val eval = Seq(
      (100L, Array(0.0f, 0.0f)), (101L, Array(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Curation.semanticDecontaminate(corpus, eval, "vec_id",
        "embedding", threshold = 0.7)
      .orderBy("vec_id").collect()
    out.map(_.getAs[Boolean]("contaminated")).toSeq shouldBe Seq(true, false)
    // an eval set that is ONLY zero vectors is as misconfigured as an
    // empty one — same loud failure
    val allZero = Seq((100L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    an[IllegalArgumentException] should be thrownBy
      Curation.semanticDecontaminate(corpus, allZero, "vec_id", "embedding", 0.7)
    // a zero-norm CORPUS vector matches nothing: it keeps its row and
    // reports (0.0, false) instead of a NaN max flagging it contaminated
    val corpusWithZero = Seq(
      (1L, Array(2.0f, 0.0f)), (2L, Array(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val z = Curation.semanticDecontaminate(corpusWithZero, eval, "vec_id",
        "embedding", threshold = 0.7)
      .orderBy("vec_id").collect()
    z.map(_.getAs[Boolean]("contaminated")).toSeq shouldBe Seq(true, false)
    z(1).getAs[Double]("max_eval_cosine") shouldBe 0.0
  }

  test("repetition stats: modal n-gram dominance and repeated mass are exact") {
    // "spam spam spam spam ham": 2-grams = [spam spam]x3, [spam ham]x1
    val out = Curation.repetitionStats(docs(1L -> "spam spam spam spam ham"),
      "doc_id", "text", n = 2).collect().head
    out.getAs[Long]("total_ngrams") shouldBe 4L
    out.getAs[Long]("distinct_ngrams") shouldBe 2L
    out.getAs[Long]("top_ngram_count") shouldBe 3L
    out.getAs[Long]("top_ngram_pct") shouldBe 75L
    out.getAs[Long]("dup_ngram_pct") shouldBe 50L // (4-2)/4
  }

  test("repetition stats: fully unique text has zero repetition") {
    val out = Curation.repetitionStats(docs(1L -> "one two three four five"),
      "doc_id", "text", n = 2).collect().head
    out.getAs[Long]("top_ngram_count") shouldBe 1L
    out.getAs[Long]("dup_ngram_pct") shouldBe 0L
  }

  test("PII redaction counts and replaces emails, IPs, phones") {
    val out = Curation.redactPii(docs(
      1L -> "mail a.user+tag@sub.example.org then ping 192.168.0.1 or call 555-123-4567 twice 555-987-6543",
      2L -> "no pii here at all"), "doc_id", "text")
      .orderBy("doc_id").collect()
    out(0).getAs[Int]("emails") shouldBe 1
    out(0).getAs[Int]("ips") shouldBe 1
    out(0).getAs[Int]("phones") shouldBe 2
    out(0).getAs[String]("redacted") shouldBe
      "mail <EMAIL> then ping <IP> or call <PHONE> twice <PHONE>"
    out(1).getAs[Int]("emails") + out(1).getAs[Int]("ips") +
      out(1).getAs[Int]("phones") shouldBe 0
    out(1).getAs[String]("redacted") shouldBe "no pii here at all"
  }

  test("sequence packing: per-doc token mass is conserved and sequences fill to capacity") {
    val corpus = docs((1L to 40L).map(i =>
      i -> (1L to (i % 7 + 3)).map(j => s"w$j").mkString(" ")): _*)
    val packed = Curation.packSequences(corpus, "doc_id", "text",
      capacity = 16, numShards = 2)
    // conservation: every doc's tokens_in_seq sums to its token count
    val bad = packed.groupBy("doc_id", "doc_tokens")
      .agg(sum("tokens_in_seq").as("packed"))
      .filter(col("packed") =!= col("doc_tokens"))
    bad.count() shouldBe 0L
    // every sequence except each shard's last holds exactly `capacity`
    val perSeq = packed.groupBy("shard", "seq_id")
      .agg(sum("tokens_in_seq").as("fill"))
    val lastSeq = perSeq.groupBy("shard").agg(max("seq_id").as("last_seq"))
    perSeq.join(lastSeq, Seq("shard"))
      .filter(col("seq_id") < col("last_seq") && col("fill") =!= 16L)
      .count() shouldBe 0L
    // offsets stay inside the sequence window
    packed.filter(col("offset_in_seq") < 0 || col("offset_in_seq") >= 16 ||
      col("tokens_in_seq") <= 0 || col("offset_in_seq") + col("tokens_in_seq") > 16)
      .count() shouldBe 0L
  }

  test("rarity score: common-vocabulary docs score higher mean df than unique ones") {
    val corpus = docs(
      1L -> "shared words appear here",
      2L -> "shared words appear here too",
      3L -> "utterly unique vocabulary nowhere else")
    val out = Curation.rarityScore(corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 3's tokens each appear in exactly 1 doc -> mean df = 100
    out(2).getAs[Long]("mean_df_x100") shouldBe 100L
    // docs 1/2 share 4 tokens (df=2 each) -> mean well above 100
    out(0).getAs[Long]("mean_df_x100") should be > 100L
    out(0).getAs[Long]("distinct_tokens") shouldBe 4L
  }

  test("invisibleClean strips and counts the three classes separately; NFKC expands compat forms") {
    val out = Curation.invisibleClean(docs(
        1L -> "a\u200Bb\u200Cc",          // 2 zero-width
        2L -> "x\u202Ay\u2069z\u200E",    // 3 bidi (override, isolate-pop, LRM)
        3L -> "\uFEFFlead and mid\uFEFF", // 2 BOM
        4L -> "clean text"),
      "doc_id", "text").orderBy("doc_id").collect()
    out.map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq shouldBe
      Seq((2L, 0L, 0L), (0L, 3L, 0L), (0L, 0L, 2L), (0L, 0L, 0L))
    out.map(_.getString(1)).toSeq shouldBe
      Seq("abc", "xyz", "lead and mid", "clean text")
    out.map(_.getBoolean(5)).toSeq shouldBe Seq.fill(4)(false)

    // NFKC path: ligature, superscript, fullwidth expand; zw strip runs
    // AFTER normalization; was_compat_changed flags the rows NFKC touched
    val k = Curation.invisibleClean(docs(
        10L -> "\uFB03ce \u00B9\u00B2 \uFF26\uFF35\uFF2C\uFF2C\u200B",
        11L -> "plain ascii"),
      "doc_id", "text", compatNormalize = true).orderBy("doc_id").collect()
    k.map(_.getString(1)).toSeq shouldBe Seq("ffice 12 FULL", "plain ascii")
    k.map(r => (r.getLong(2), r.getBoolean(5))).toSeq shouldBe
      Seq((1L, true), (0L, false))
    // NFKC is idempotent: a second pass changes nothing
    val once = Curation.invisibleClean(docs(10L -> "\uFB01\uFF11"), "doc_id",
      "text", compatNormalize = true).select("cleaned")
    val twice = Curation.invisibleClean(
      once.withColumnRenamed("cleaned", "text").withColumn("doc_id", lit(10L)),
      "doc_id", "text", compatNormalize = true).select("cleaned")
    twice.first().getString(0) shouldBe once.first().getString(0)
    // SQL surface: graft_nfkc is registered via GraftExtensions
    spark.sql("SELECT graft_nfkc('\uFF41\uFB01') AS t").first()
      .getString(0) shouldBe "afi"
  }

  test("stratified sample rates nest: the 10% slice is inside the 20% slice") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    def ids(rate: Int): Set[Long] =
      Curation.stratifiedSample(rows, "doc_id", "lang",
        rates = Map("en" -> rate), defaultRate = 0)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val s10 = ids(10); val s20 = ids(20)
    s10.subsetOf(s20) shouldBe true
    s10.size should be < s20.size
    // defaultRate 0 drops the other stratum entirely
    ids(100).size shouldBe 250
  }

  test("replicateByWeight emits weight copies, drops weight-0 strata") {
    import spark.implicits._
    val rows = Seq((1L, "en"), (2L, "de"), (3L, "und"), (4L, "fr"))
      .toDF("doc_id", "lang")
    val out = Curation.replicateByWeight(rows, "lang",
      weights = Map("en" -> 1, "de" -> 2, "und" -> 0), defaultWeight = 3)
      .orderBy("doc_id", "copy").collect()
    out.map(r => (r.getLong(0), r.getInt(2))).toSeq shouldBe Seq(
      (1L, 1), (2L, 1), (2L, 2), (4L, 1), (4L, 2), (4L, 3))
  }

  test("funnel: greedy earliest match, strictly-after stages, id tie-break") {
    import spark.implicits._
    import graft.operators.Sequence
    // u1 completes view->click->purchase in order; u2's click precedes its
    // view (must not count -> depth 1); u3 has view+click only (depth 2);
    // u4 has purchase first then nothing (depth 0); u5: view and click at
    // the SAME ts — event_id tie-break orders view (id 50) before click
    // (id 51), so both match (depth 2)
    val ev = Seq(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "purchase"),
      (2L, 10L, 4L, "click"), (2L, 20L, 5L, "view"), (2L, 15L, 6L, "error"),
      (3L, 10L, 7L, "view"), (3L, 40L, 8L, "click"),
      (4L, 5L, 9L, "purchase"),
      (5L, 10L, 50L, "view"), (5L, 10L, 51L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Sequence.funnel(ev, "user_id", "ts", "event_id", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("key").collect()
    out.map(r => (r.getLong(0), r.getInt(1))).toSeq shouldBe Seq(
      (1L, 3), (2L, 1), (3L, 2), (4L, 0), (5L, 2))
  }

  test("sequence packing: a doc longer than capacity spans consecutive sequences") {
    val long = (1 to 40).map(i => s"t$i").mkString(" ") // 40 tokens, capacity 16
    val out = Curation.packSequences(docs(1L -> long), "doc_id", "text",
        capacity = 16, numShards = 1)
      .orderBy("seq_id").collect()
    out.map(_.getAs[Long]("seq_id")).toSeq shouldBe Seq(0L, 1L, 2L)
    out.map(_.getAs[Long]("tokens_in_seq")).toSeq shouldBe Seq(16L, 16L, 8L)
    out.map(_.getAs[Long]("offset_in_seq")).toSeq shouldBe Seq(0L, 0L, 0L)
  }

  test("distinctive terms: tf dominates, df breaks ties toward rarer tokens") {
    // doc 1: "rare" appears twice (tf=2, top); "common" and "unique" tie at
    // tf=1 — "unique" (df=1) outranks "common" (df=2)
    val out = Curation.distinctiveTerms(docs(
        1L -> "rare rare common unique",
        2L -> "common other words here"),
      "doc_id", "text", k = 2)
      .filter(col("doc_id") === 1L).orderBy("rank").collect()
    out.map(r => (r.getAs[Int]("rank"), r.getAs[String]("token"),
      r.getAs[Long]("tf"), r.getAs[Long]("df"))).toSeq shouldBe Seq(
      (1, "rare", 2L, 1L), (2, "unique", 1L, 1L))
  }

  test("incremental dedup: index hits drop, in-batch dups collapse, novel docs survive") {
    import graft.operators.Dedup
    val index = docs(10L -> "already ingested doc", 11L -> "another old doc")
    val batch = docs(
      20L -> "already   INGESTED doc", // fingerprint-matches index 10 -> dropped
      21L -> "brand new content",
      22L -> "Brand New   content", // in-batch dup of 21 -> same fingerprint
      23L -> "fully novel text")
    val out = Dedup.incrementalNew(batch, index, "doc_id", "text")
      .orderBy("keeper_id").collect()
    out.map(r => (r.getAs[Long]("keeper_id"), r.getAs[Long]("dup_count"))).toSeq shouldBe
      Seq((21L, 2L), (23L, 1L))
  }
}
