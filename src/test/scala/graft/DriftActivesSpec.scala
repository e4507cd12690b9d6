package graft

import org.apache.spark.sql.functions.col
import org.scalatest.matchers.should.Matchers

import graft.operators.{Profile, Sequence}

/** Planted-input tests for rolling distinct actives and per-category
  * distribution drift (x91/x92).
  */
class DriftActivesSpec extends SparkSpec with Matchers {

  test("rollingActives: trailing window counts distinct keys, observed days only") {
    import spark.implicits._
    // activity (day, user): u1 on days 0,1; u2 on day 1; u3 on day 9.
    // 3-day window: day0 -> {u1}, day1 -> {u1(d0,d1), u2} = 2,
    // day9 -> {u3} (u1/u2 aged out). Days 2..8 unobserved -> absent.
    val ev = Seq((0L, 1L), (0L, 1L), (1L, 1L), (1L, 2L), (9L, 3L))
      .toDF("day", "user_id")
      .select((col("day") * 86400000000L).as("t"), col("user_id"))
    val out = Sequence.rollingActives(ev, "user_id", "t", windowDays = 3)
      .orderBy("day").collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("actives"))).toSeq
    out shouldBe Seq((0L, 1L), (1L, 2L), (9L, 1L))
  }

  test("rollingActives: repeat activity inside the window counts once") {
    import spark.implicits._
    val ev = (0 until 5).map(i => (i.toLong * 86400000000L, 42L)).toDF("t", "user_id")
    val out = Sequence.rollingActives(ev, "user_id", "t", windowDays = 7)
      .collect()
    all(out.map(_.getAs[Long]("actives"))) shouldBe 1L
  }

  test("categoryDrift: shifted category lands its mass in one bucket; uniform categories stay calm") {
    import spark.implicits._
    // a and b uniform over 1..40 (near-corpus shape); c concentrates all
    // its 20 rows at the top value -> c's bucket-3 share is 10000 bp
    // against a much smaller corpus share, while a/b deviate mildly.
    val rows = ((1 to 40).map(v => ("a", v.toLong)) ++
      (1 to 40).map(v => ("b", v.toLong)) ++
      Seq.fill(20)(("c", 40L))).toDF("cat", "v")
    val out = Profile.categoryDrift(rows, "cat", "v", Seq(2500, 5000, 7500))
      .collect().map(r => r.getAs[String]("cat") ->
        (r.getAs[Int]("worst_bucket"), r.getAs[Long]("max_dev_x10000"))).toMap
    out("c")._1 shouldBe 3 // the concentration bucket is the worst one
    out("c")._2 should be > out("a")._2
    out("c")._2 should be >= 5000L
    out("a") shouldBe out("b") // identical distributions, identical drift
  }

  test("categoryDrift: a category missing a whole bucket still registers drift") {
    import spark.implicits._
    // corpus: values 1..4 evenly; cat c only has 1s -> missing buckets.
    val rows = (Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L)) ++
      Seq.fill(4)(("c", 1L))).toDF("cat", "v")
    val out = Profile.categoryDrift(rows, "cat", "v", Seq(2500, 5000, 7500))
      .collect().map(r => r.getAs[String]("cat") -> r.getAs[Long]("max_dev_x10000")).toMap
    out("c") should be > 0L
  }
}
