package graft

import org.apache.spark.sql.functions.col
import org.scalatest.matchers.should.Matchers

import graft.operators.Retrieval

/** Invariant pins for the large composition queries (x88, x101) beyond
  * their oracle checks.
  */
class CompositionSpec extends SparkSpec with Matchers {

  test("x88 funnel: stage counts only shrink, packing conserves the quality stage's tokens") {
    val rows = SparkEntry.queries("x88_curation_funnel")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("stage_ord"))
      .map(r => (r.getAs[String]("stage"), r.getAs[Long]("docs"),
        r.getAs[Long]("tokens")))
    rows.map(_._1).toSeq shouldBe Seq("raw", "exact_dedup", "near_dedup",
      "decontaminated", "quality", "packed")
    // docs monotone non-increasing through the doc-level stages 0..4
    rows.take(5).map(_._2).sliding(2).foreach {
      case Array(a, b) => b should be <= a
      case _ => ()
    }
    // token mass likewise shrinks, and packing CONSERVES stage 4's mass
    rows.take(5).map(_._3).sliding(2).foreach {
      case Array(a, b) => b should be <= a
      case _ => ()
    }
    rows(5)._3 shouldBe rows(4)._3
    all(rows.map(_._2)) should be > 0L
  }

  test("rrfFuse: exact contributions, both-list docs beat single-list docs at equal rank") {
    import spark.implicits._
    val l1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc", "rank")
    val l2 = Seq((10L, 2), (40L, 1)).toDF("doc", "rank")
    val out = Retrieval.rrfFuse(Seq(l1, l2), "doc", "rank", kRrf = 60)
      .collect().map(r => r.getAs[Long]("doc") ->
        (r.getAs[Long]("rrf_x1e6"), r.getAs[Long]("systems"))).toMap
    out(10L) shouldBe ((1000000L / 61 + 1000000L / 62, 2L))
    out(20L) shouldBe ((1000000L / 62, 1L))
    out(30L) shouldBe ((1000000L / 63, 1L))
    out(40L) shouldBe ((1000000L / 61, 1L))
    // doc 10 (rank 1 + rank 2) outscores every single-list doc
    out(10L)._1 should be > out(40L)._1
  }

  test("x131 composition: a near-copy below direct threshold is flagged transitively") {
    import spark.implicits._
    import graft.operators.{Curation, Dedup}
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val evalSet = Seq((100L, base)).toDF("doc_id", "text")
    val corpus = Seq(
      1L -> base,                                  // verbatim leak: direct
      2L -> base.replace("iota", "changed"),       // near-copy: overlap 55% < 90
      3L -> "completely unrelated words only here nothing shared at all")
      .toDF("doc_id", "text")
    val direct = Curation.decontaminate(corpus, evalSet, "doc_id", "text",
        shingleSize = 5, thresholdPct = 90)
      .select(col("doc_id"), col("contaminated"))
    val pairs = Dedup.minHashLsh(corpus, "doc_id", "text",
        shingleSize = 3, numHashes = 16, bands = 8, threshold = 0.5)
      .select("doc_a", "doc_b")
    val labels = Dedup.canonicalize(corpus, "doc_id", pairs)
      .select(col("doc").as("doc_id"), col("canonical_id"))
    val dirty = labels.join(direct.filter(col("contaminated")), Seq("doc_id"))
      .select("canonical_id").distinct()
      .withColumn("__dirty", org.apache.spark.sql.functions.lit(true))
    val out = labels.join(direct, Seq("doc_id"))
      .join(dirty, Seq("canonical_id"), "left")
      .select(col("doc_id"), col("contaminated"),
        org.apache.spark.sql.functions.coalesce(col("__dirty"),
          org.apache.spark.sql.functions.lit(false)).as("transitive"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    out(1L) shouldBe ((true, true))   // the verbatim leak
    out(2L) shouldBe ((false, true))  // below direct threshold, caught via cluster
    out(3L) shouldBe ((false, false)) // clean stays clean
  }

  test("x132 curriculum: anneal-to-zero drops the stratum, epochs permute independently") {
    val rows = SparkEntry.queries("x132_curriculum_mixture")(spark, sfDir)
      .collect().map(r => (r.getAs[Int]("epoch"), r.getAs[Int]("shard"),
        r.getAs[Long]("pos"), r.getAs[Long]("doc_id"),
        r.getAs[String]("lang"), r.getAs[Long]("copy")))
    // epoch 3 anneals zh to 0 — no zh row survives
    rows.filter(t => t._1 == 3 && t._5 == "zh") shouldBe empty
    // epoch 1 is uniform: exactly one copy of every doc
    val e1 = rows.filter(_._1 == 1)
    e1.map(_._4).distinct.length shouldBe e1.length
    // the shard permutation reseeds per epoch: the same (doc, copy) does
    // not keep its (shard, pos) across epochs (byte-identical replay per
    // epoch, different order between them)
    val byEpoch = (1 to 2).map(e =>
      rows.filter(_._1 == e).map(t => (t._4, t._6) -> (t._2, t._3)).toMap)
    val common = byEpoch(0).keySet intersect byEpoch(1).keySet
    common.count(k => byEpoch(0)(k) == byEpoch(1)(k)) should be < (common.size / 2)
  }

  test("x104 recall: IVF recall is bounded by 100 and the harness reports every query") {
    val rows = SparkEntry.queries("x104_ann_recall")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("hits"), r.getAs[Long]("recall_x100")))
    rows.map(_._1).toSeq shouldBe (0L until 10L)
    all(rows.map(_._3)) should (be >= 0L and be <= 100L)
    all(rows.map(r => r._3 == r._2 * 10)) shouldBe true
  }
}
