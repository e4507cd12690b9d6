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

  test("property: portable batch assignment lands every id in exactly one batch 0..n-1") {
    import org.apache.spark.sql.functions._
    samples(Gen.zip(Gen.chooseNum(1, 16), Gen.chooseNum(10, 100)), 6).foreach {
      case (n, rows) =>
        val df = spark.range(rows).select(col("id").cast("string").as("request_id"))
          .withColumn("batch_id",
            graft.orchestration.BatchProcessor.portableBatchId(col("request_id"), n))
        val stats = df.agg(
          min("batch_id").as("mn"), max("batch_id").as("mx"), count(lit(1)).as("cnt")).first()
        stats.getAs[Long]("mn") should be >= 0L
        stats.getAs[Long]("mx") should be < n.toLong
        stats.getAs[Long]("cnt") shouldBe rows.toLong
    }
  }

  test("property: frame sampling at stride 1 covers every byte exactly once") {
    import spark.implicits._
    import graft.operators.Multimodal
    samples(Gen.zip(Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.chooseNum(1, 16)), 20)
      .foreach { case (text, frameSize) =>
        val media = Seq((1L, text)).toDF("doc_id", "text")
        val frames = Multimodal.sampleFrames(spark,
          Multimodal.mediaFromDocuments(spark, media), frameSize, stride = 1)
        val (lenSum, byteSum) = frames
          .agg(org.apache.spark.sql.functions.sum("frame_len"),
            org.apache.spark.sql.functions.sum("frame_sum"))
          .as[(Long, Long)].first()
        lenSum shouldBe text.getBytes("UTF-8").length.toLong
        byteSum shouldBe text.getBytes("UTF-8").map(_ & 0xff).map(_.toLong).sum
      }
  }

  test("property: canonicalize is idempotent and never increases ids") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(6,
      Gen.zip(Gen.chooseNum(1L, 12L), Gen.chooseNum(1L, 12L))).map(_.filter(p => p._1 != p._2))
    samples(edgeGen, 6).foreach { edges =>
      val ids = (1L to 12L).toDF("doc_id")
      val pairs = (if (edges.isEmpty) Seq((1L, 1L)).filter(_ => false) else edges)
        .toDF("doc_a", "doc_b")
      val out = graft.operators.Dedup.canonicalize(ids, "doc_id", pairs)
      out.count() shouldBe 12L
      out.filter($"canonical_id" > $"doc").count() shouldBe 0L
      // every canonical id is itself a keeper (representatives are fixed points)
      val canonSet = out.select($"canonical_id").distinct()
        .as[Long].collect().toSet
      val keeperSet = out.filter($"is_keeper").select($"doc")
        .as[Long].collect().toSet
      canonSet shouldBe keeperSet
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

  test("property: TopKAggregator merge is associative, commutative, and order-insensitive") {
    val agg = new graft.functions.TopKAggregator(5)
    def fold(xs: Seq[(Long, Long)]) = xs.foldLeft(agg.zero)(agg.reduce)
    val gen = Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(-100L, 100L)))
    samples(gen, 40).foreach { xs =>
      val (a, b) = xs.splitAt(xs.length / 2)
      val merged = agg.merge(fold(a), fold(b))
      // order-insensitive: any split/merge equals the straight fold
      merged shouldBe fold(xs)
      // commutative
      agg.merge(fold(b), fold(a)) shouldBe merged
      // k-capped, sorted by (value desc, id asc)
      merged.size should be <= 5
      merged shouldBe merged.sortBy { case (id, v) => (-v, id) }
      // the top entry matches the naive maximum under the same ordering
      if (xs.nonEmpty)
        merged.head shouldBe xs.minBy { case (id, v) => (-v, id) }
    }
  }

  test("property: upsert result has exactly one row per key, updates win") {
    import spark.implicits._
    val gen = Gen.zip(
      Gen.listOfN(25, Gen.chooseNum(0L, 15L)).map(_.distinct),
      Gen.listOfN(10, Gen.chooseNum(0L, 20L)).map(_.distinct))
    samples(gen, 6).foreach { case (baseKeys, updKeys) =>
      val base = baseKeys.map(k => (k, s"b$k")).toDF("k", "v")
      val upd = updKeys.map(k => (k, s"u$k")).toDF("k", "v")
      val out = graft.operators.Merge.upsertByKey(base, upd, "k")
        .as[(Long, String)].collect().toMap
      out.keySet shouldBe (baseKeys.toSet ++ updKeys.toSet)
      updKeys.foreach(k => out(k) shouldBe s"u$k")
      (baseKeys.toSet -- updKeys.toSet).foreach(k => out(k) shouldBe s"b$k")
    }
  }

  test("property: http id-range partitioning is a partition of unity over [start, end)") {
    val gen = Gen.zip(Gen.chooseNum(0L, 1000L), Gen.chooseNum(0L, 500L), Gen.chooseNum(1, 40))
    samples(gen, 50).foreach { case (start, span, parts) =>
      val end = start + span
      val ranges = graft.sources.HttpRanges.slices(start, end, parts)
      // contiguous, non-overlapping, covering
      ranges.head.lo shouldBe start
      ranges.last.hi shouldBe end
      ranges.sliding(2).foreach {
        case Seq(a, b) => a.hi shouldBe b.lo
        case _ => ()
      }
      ranges.map(r => r.hi - r.lo).sum shouldBe span
      all(ranges.map(r => r.hi - r.lo)) should be >= 0L
    }
  }
}
