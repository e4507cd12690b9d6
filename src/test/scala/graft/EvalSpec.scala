package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.functions.Portable
import graft.operators.{Dedup, Eval}

/** Behavioral tests for the detector-quality / reproducibility audit
  * operators (x114–x117). Planted inputs with hand-checkable expectations;
  * the sf-level hash checks live in the Verify/oracle gate.
  */
class EvalSpec extends SparkSpec with Matchers {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def srcDocs(rows: (String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("source", "text")
  }

  // ---- x114 sourceOverlap ----

  test("sourceOverlap: identical sources estimate AND measure Jaccard 1; disjoint measure 0") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "uno dos tres cuatro cinco seis siete ocho nueve diez"
    val out = Eval.sourceOverlap(srcDocs(
        "a" -> text, "b" -> text, "c" -> other),
        "source", "text", shingleSize = 3, numHashes = 16)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("est_jaccard_x1m"), r.getAs[Long]("exact_jaccard_x1m")))
      .toSeq
    val ab = out.find(p => p._1 == "a" && p._2 == "b").get
    ab._3 shouldBe 1000000L // all 16 signature positions agree
    ab._4 shouldBe 1000000L
    out.filter(p => p._2 == "c").foreach { p =>
      p._4 shouldBe 0L // disjoint shingle sets
    }
  }

  test("sourceOverlap estimate-only path skips the exact columns") {
    val out = Eval.sourceOverlap(srcDocs(
        "a" -> "one two three four five", "b" -> "one two three four six"),
        "source", "text", withExact = false)
    out.columns.toSeq shouldBe Seq("source_a", "source_b", "agree", "est_jaccard_x1m")
    out.count() shouldBe 1L
  }

  // ---- x115 lshRecallByBucket ----

  test("LSH detected pairs are a subset of the exact ground truth (real corpus)") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val truth = Eval.shingleJaccardExact(d, "doc_id", "text")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val det = Dedup.minHashLsh(d, "doc_id", "text",
        shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    det.subsetOf(truth) shouldBe true
    truth should not be empty
  }

  test("recall S-curve: weak banding misses mid-similarity pairs that strong banding catches") {
    // Six planted pairs at shingle-Jaccard ~0.556 (share 20 of 28+28
    // 3-shingles): with 2 bands of 8 rows P(collide) ≈ 2·j⁸ ≈ 2%, with 8
    // bands of 2 rows P(miss) ≈ (1-j²)⁸ ≈ 6%. The hash family is
    // deterministic, so outcomes are fixed; we assert the ORDERING (weak
    // strictly below strong), which holds unless every weak-band pair
    // collides — astronomically outside the family's behavior.
    val ns = Seq("a", "b", "c", "d", "e", "f")
    val pairs = ns.zipWithIndex.flatMap { case (p, i) =>
      val base = (1 to 30).map(w => s"${p}tok$w")
      val variant = base.take(22) ++ (23 to 30).map(w => s"${p}alt$w")
      Seq((2L * i + 1) -> base.mkString(" "), (2L * i + 2) -> variant.mkString(" "))
    }
    val df = docs(pairs: _*)
    def recallAt(bands: Int): Long =
      Eval.lshRecallByBucket(df, "doc_id", "text", shingleSize = 3,
          numHashes = 16, bands = bands, threshold = 0.5)
        .filter(col("jac_x10") === 5)
        .select("recall_x100").collect().headOption.map(_.getLong(0)).getOrElse(-1L)
    val weak = recallAt(2)
    val strong = recallAt(8)
    weak should be >= 0L // bucket exists: truth sees all six pairs
    strong should be > weak
  }

  test("recall buckets use the exact rational floor (bucket 10 only at identity)") {
    val out = Eval.lshRecallByBucket(docs(
        1L -> "one two three four five six", 2L -> "one two three four five six",
        3L -> "x1 x2 x3 x4 x5"), "doc_id", "text",
        numHashes = 16, bands = 8)
      .collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(10L)
    out.head.getAs[Long]("recall_x100") shouldBe 100L
  }

  // ---- x116 epochShuffle ----

  test("epochShuffle: every epoch is a full permutation; shard/pos follow the portable hash") {
    val ids = (1L to 40L)
    val df = docs(ids.map(i => i -> s"doc $i"): _*)
    val out = Eval.epochShuffle(df, "doc_id", epochs = 2, shards = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    out.length shouldBe 80
    // permutation per epoch
    out.filter(_._1 == 0).map(_._4).toSet shouldBe ids.toSet
    out.filter(_._1 == 1).map(_._4).toSet shouldBe ids.toSet
    // shard + pos agree with the driver-side twin of the portable hash
    val byKey = out.map { case (epoch, shard, pos, id) =>
      val key = Portable.hash56Local(s"graft:$epoch:$id")
      shard shouldBe (key * 4) / (1L << 56)
      (epoch, shard, key, pos, id)
    }
    byKey.groupBy(t => (t._1, t._2)).foreach { case (_, rows) =>
      rows.sortBy(_._3).map(_._4).toSeq shouldBe (1L to rows.length).toSeq
    }
    // epochs are DIFFERENT permutations
    def order(e: Int) = out.filter(_._1 == e).sortBy(t => (t._2, t._3)).map(_._4).toSeq
    order(0) should not be order(1)
  }

  test("epochShuffle is deterministic across runs and rejects overflow-risk shards") {
    val df = docs((1L to 10L).map(i => i -> s"d $i"): _*)
    val a = Eval.epochShuffle(df, "doc_id", 1, 2).collect().toSeq
    val b = Eval.epochShuffle(df, "doc_id", 1, 2).collect().toSeq
    a shouldBe b
    an[IllegalArgumentException] should be thrownBy
      Eval.epochShuffle(df, "doc_id", 1, 128)
  }

  test("shardOrder generalizes epochShuffle: uniform copies yield the same (shard, key-order)") {
    import spark.implicits._
    val ids = (1L to 30L)
    val df = docs(ids.map(i => i -> s"doc $i"): _*)
    // epochShuffle with 2 epochs == shardOrder over copies {0, 1}, up to
    // the per-(epoch|shard) vs per-shard position numbering
    val es = Eval.epochShuffle(df, "doc_id", epochs = 2, shards = 4)
      .collect().map(r => (r.getInt(1), r.getLong(3), r.getInt(0))).toSet
    val copies = ids.flatMap(i => Seq((i, 0), (i, 1))).toDF("doc_id", "copy")
    val so = Eval.shardOrder(copies, "doc_id", "copy", shards = 4)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getInt(3))).toSet
    // same (shard, doc_id, copy/epoch) assignment for every row
    so shouldBe es
    // all input columns pass through, pos is dense per shard
    val out = Eval.shardOrder(copies.withColumn("extra", lit("x")),
      "doc_id", "copy", shards = 4)
    out.columns.toSeq shouldBe Seq("shard", "pos", "doc_id", "copy", "extra")
    out.groupBy("shard").agg(max("pos").as("mx"), count(lit(1)).as("n"))
      .select("mx", "n")
      .collect().foreach(r => r.getLong(0) shouldBe r.getLong(1))
  }

  // ---- x117 splitLeakage ----

  test("splitLeakage: cluster policy is structurally leak-free; naive matches hand computation") {
    val near1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near2 = near1.replace("kappa", "kappa2")
    val near3 = "uno dos tres cuatro cinco seis siete ocho nueve diez"
    val near4 = near3.replace("diez", "diez2")
    val df = docs(1L -> near1, 2L -> near2, 3L -> near3, 4L -> near4,
      5L -> "solo one unique document here entirely")
    val pairs = Dedup.minHashLsh(df, "doc_id", "text",
      shingleSize = 3, numHashes = 16, bands = 8, threshold = 0.5)
      .select("doc_a", "doc_b")
    pairs.count() shouldBe 2L // (1,2) and (3,4)
    val out = Eval.splitLeakage(df, "doc_id", pairs, valPct = 20, testPct = 30)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val cluster = out.find(_._1 == "cluster").get
    cluster._2 shouldBe 2L
    cluster._3 shouldBe 0L // both endpoints share the cluster id -> same split
    cluster._4 shouldBe 0L
    // naive: recompute the hash slices the operator should have used
    def slice(id: Long) = Portable.hash56Local(id.toString) % 100
    def split(s: Long) = if (s < 30) "test" else if (s < 50) "val" else "train"
    val expCross = Seq((1L, 2L), (3L, 4L))
      .count { case (a, b) => split(slice(a)) != split(slice(b)) }
    val naive = out.find(_._1 == "naive").get
    naive._3 shouldBe expCross.toLong
  }

  test("splitLeakage: an empty pair table (the audit's success case) reads 0, not null") {
    import spark.implicits._
    val df = docs(1L -> "only document")
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val out = Eval.splitLeakage(df, "doc_id", noPairs, valPct = 5, testPct = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.toSeq shouldBe Seq(("cluster", 0L, 0L, 0L), ("naive", 0L, 0L, 0L))
  }

  test("rankAuc: perfect, inverted, tie-averaged, and degenerate inputs") {
    import spark.implicits._
    def auc(rows: Seq[(Long, Long)]): org.apache.spark.sql.Row =
      Eval.rankAuc(rows.toDF("score", "pos"), "score", "pos").collect().head
    // perfect separation: every positive outranks every negative
    val perfect = auc(Seq((10L, 1L), (11L, 1L), (1L, 0L), (2L, 0L)))
    perfect.getLong(2) shouldBe 2L * 2 * 2 // 2U = 2·n1·n0
    perfect.getLong(3) shouldBe 10000L
    // inverted: every positive UNDER every negative
    auc(Seq((1L, 1L), (2L, 1L), (10L, 0L), (11L, 0L))).getLong(3) shouldBe 0L
    // all scores tied: average ranks give exactly 0.5
    auc(Seq((5L, 1L), (5L, 1L), (5L, 0L), (5L, 0L))).getLong(3) shouldBe 5000L
    // one class absent: auc is null, not a division error
    assert(auc(Seq((1L, 1L), (2L, 1L))).isNullAt(3))
  }

  test("liftTable: equal scores share a bin; rate and lift are exact") {
    import spark.implicits._
    // 4 rows, 2 bins: scores (1,1) tie into bin 0; (5,9) fill bin 1.
    // positives: one in each half -> rate 5000 each, lift 10000 (base
    // rate = 1/2 matches both bins exactly)
    val out = Eval.liftTable(
        Seq((1L, 0L), (1L, 1L), (5L, 0L), (9L, 1L)).toDF("score", "pos"),
        "score", "pos", bins = 2)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    out.toSeq shouldBe Seq(
      (0, 2L, 1L, 5000L, 10000L),
      (1, 2L, 1L, 5000L, 10000L))
  }
}
