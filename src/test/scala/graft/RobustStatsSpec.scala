package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.matchers.should.Matchers

import graft.operators.{Profile, Skew, TextAnalysis}

/** Planted-input tests for LM-surprise scoring, hot-key diagnostics, and
  * median/MAD outliers (x82–x84).
  */
class RobustStatsSpec extends SparkSpec with Matchers {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("lmSurprise: deterministic transitions score 1e6, rare ones higher") {
    // corpus: "a b" x3 and "a c" x1 -> P(b|a)=3/4, P(c|a)=1/4.
    val out = TextAnalysis.lmSurprise(docs(
      1L -> "a b", 2L -> "a b", 3L -> "a b", 4L -> "a c"),
      "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("surprise_x1e6"))).toMap
    // doc 1: one bigram (a,b): ac=4, pc=3 -> div(4e6, 3) = 1333333
    out(1L) shouldBe ((1L, 1333333L))
    // doc 4: (a,c): ac=4, pc=1 -> 4e6
    out(4L) shouldBe ((1L, 4000000L))
  }

  test("lmSurprise: single-token docs drop out; score is mean over bigrams") {
    val out = TextAnalysis.lmSurprise(docs(
      1L -> "x x x", 2L -> "solo"), "doc_id", "text").collect()
    out.map(_.getAs[Long]("doc")).toSeq shouldBe Seq(1L)
    // both bigrams are (x,x): ac=2, pc=2 -> sup=1e6; mean = 1e6
    out.head.getAs[Long]("n_bigrams") shouldBe 2L
    out.head.getAs[Long]("surprise_x1e6") shouldBe 1000000L
  }

  test("hotKeys: shares and skew factors are exact; cut is deterministic") {
    import spark.implicits._
    val rows = (Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++ Seq.fill(10)("cold"))
      .toDF("k")
    val out = Skew.hotKeys(rows, "k", topK = 2, partitions = 10)
      .orderBy(org.apache.spark.sql.functions.col("cnt").desc).collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("cnt"),
        r.getAs[Long]("pct_x10000"), r.getAs[Long]("skew_x100")))
    out.length shouldBe 2
    // hot: 60/100 -> 6000 bp; at 10 partitions it is 6x an average reducer
    out(0) shouldBe (("hot", 60L, 6000L, 600L))
    out(1) shouldBe (("warm", 30L, 3000L, 300L))
  }

  test("madOutliers: inverse-CDF median/MAD, heavy tail does not mask the outlier") {
    import spark.implicits._
    // key a: values 1,2,3,4,5 + one wild 1000.
    // median (ceil(6/2)=3rd) = 3; |v-3| = 2,1,0,1,2,997 -> MAD (3rd of
    // 0,1,1,2,2,997) = 1; outliers: |v-3|*100 > 300 -> 997 only.
    val rows = Seq(1L, 2L, 3L, 4L, 5L, 1000L).map(("a", _)).toDF("g", "v")
    val out = Profile.madOutliers(rows, "g", "v", kX100 = 300).collect()
    out.length shouldBe 1
    val r = out.head
    r.getAs[Long]("n") shouldBe 6L
    r.getAs[Long]("med") shouldBe 3L
    r.getAs[Long]("mad") shouldBe 1L
    r.getAs[Long]("outliers") shouldBe 1L
  }

  test("madOutliers: mean/stddev would have masked it (the robustness claim)") {
    // same data: mean = 169.2, stddev ~ 406 -> 1000 is only ~2 sigma, and
    // every other point is within 0.5 sigma; a 3-sigma filter flags
    // NOTHING. median/MAD flags exactly the wild point (asserted above) —
    // here we pin the zero-outlier behavior of the classic z-score.
    import spark.implicits._
    val vs = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 1000.0)
    val mean = vs.sum / vs.size
    val sigma = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / vs.size)
    vs.count(v => math.abs(v - mean) > 3 * sigma) shouldBe 0
  }

  test("madOutliers: all-identical values have MAD 0 and no outliers") {
    import spark.implicits._
    val rows = Seq.fill(5)(("a", 7L)).toDF("g", "v")
    val r = Profile.madOutliers(rows, "g", "v").collect().head
    r.getAs[Long]("mad") shouldBe 0L
    r.getAs[Long]("outliers") shouldBe 0L
  }
}
