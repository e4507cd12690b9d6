package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.matchers.should.Matchers

import graft.config.ConfigLoader
import graft.middleware.Middleware

/** Property tests (SURVEY.md §5 rebuild strategy item 4): batch assignment
  * partitions the id space, backoff stays bounded, config preprocessing is
  * total on defined env vars. (Plain scalacheck Gen sampling — the
  * scalatest bridge artifact isn't on the offline classpath.)
  */
class PropertySpec extends SparkSpec with Matchers {

  private def samples[A](g: Gen[A], n: Int = 50): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: hash batching is a partition of unity — every id lands in exactly one batch 0..n-1") {
    import org.apache.spark.sql.functions._
    samples(Gen.zip(Gen.chooseNum(1, 16), Gen.chooseNum(10, 200)), 8).foreach {
      case (n, rows) =>
        val df = spark.range(rows).select(col("id").cast("string").as("request_id"))
          .withColumn("batch_id", pmod(hash(col("request_id")), lit(n)))
        val stats = df.agg(
          min("batch_id").as("mn"), max("batch_id").as("mx"), count(lit(1)).as("cnt")).first()
        stats.getAs[Int]("mn") should be >= 0
        stats.getAs[Int]("mx") should be < n
        stats.getAs[Long]("cnt") shouldBe rows.toLong
    }
  }

  test("property: full-jitter backoff is within [0, min(max, base*2^attempt)]") {
    samples(Gen.zip(Gen.chooseNum(1, 20), Gen.chooseNum(0.01, 1.0),
      Gen.chooseNum(0.1, 10.0)), 200).foreach { case (attempt, base, max) =>
      val d = Middleware.backoffDelay(attempt, base, max)
      d should be >= 0.0
      d should be <= math.min(max, base * math.pow(2, attempt)) + 1e-9
    }
  }

  test("property: env preprocessing substitutes every defined {{env.X}} and leaves no markers") {
    val ident = Gen.identifier.suchThat(s => s.nonEmpty && s.head.isLetter)
    samples(Gen.zip(ident, Gen.alphaNumStr), 200).foreach { case (name, value) =>
      val out = ConfigLoader.preprocess(s"""{"k": "{{env.$name}}"}""",
        Map(name -> value).get)
      out shouldBe s"""{"k": "$value"}"""
    }
  }
}
