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

  test("property: winnowing guarantee — any shared span of w+k-1 chars yields a shared fingerprint") {
    import org.apache.spark.unsafe.types.UTF8String
    val k = 12; val w = 8
    def fps(s: String): Set[Long] = {
      val a = graft.functions.WinnowFingerprints.compute(
        UTF8String.fromString(s), k, w)
      (0 until a.numElements()).map(a.getLong).toSet
    }
    val letters = Gen.listOfN(40, Gen.alphaLowerChar).map(_.mkString)
    val span = Gen.choose(k + w - 1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    samples(Gen.zip(span, letters, letters), 100).foreach {
      case (shared, pre, post) =>
        // the MOSS theorem: the shared span contributes at least one
        // identical fingerprint to both docs regardless of its offset
        val a = fps(pre + shared + post.take(7))
        val b = fps(post + pre.take(13) + shared)
        withClue(s"span='$shared' ") {
          (a intersect b) should not be empty
        }
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

  test("property: sequence packing conserves tokens and fills every non-final sequence") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val gen = Gen.zip(Gen.chooseNum(4L, 64L), Gen.chooseNum(1, 6),
      Gen.listOfN(60, Gen.chooseNum(1, 30)))
    samples(gen, 5).foreach { case (capacity, shards, tokenCounts) =>
      val corpus = tokenCounts.zipWithIndex.map { case (n, i) =>
        (i.toLong, (1 to n).map(j => s"w$j").mkString(" "))
      }.toDF("doc_id", "text")
      val packed = graft.operators.Curation.packSequences(
        corpus, "doc_id", "text", capacity, shards)
      // conservation per doc
      packed.groupBy("doc_id", "doc_tokens")
        .agg(sum("tokens_in_seq").as("packed"))
        .filter(col("packed") =!= col("doc_tokens")).count() shouldBe 0L
      // every sequence except each shard's last is exactly full
      val perSeq = packed.groupBy("shard", "seq_id").agg(sum("tokens_in_seq").as("fill"))
      perSeq.join(perSeq.groupBy("shard").agg(max("seq_id").as("last")), Seq("shard"))
        .filter(col("seq_id") < col("last") && col("fill") =!= capacity)
        .count() shouldBe 0L
      // offsets inside the window
      packed.filter(col("offset_in_seq") < 0 || col("tokens_in_seq") <= 0 ||
        col("offset_in_seq") + col("tokens_in_seq") > capacity).count() shouldBe 0L
    }
  }

  test("property: stratified-sample slices nest as the rate grows") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "st")
    def ids(r0: Int, r1: Int, r2: Int): Set[Long] =
      graft.operators.Curation.stratifiedSample(rows, "doc_id", "st",
          Map("s0" -> r0, "s1" -> r1), r2)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    samples(Gen.listOfN(3, Gen.chooseNum(0, 90)), 6).foreach {
      case Seq(a, b, c) =>
        val lo = ids(a, b, c)
        val hi = ids(a + 10, b + 10, c + 10)
        lo.subsetOf(hi) shouldBe true
      case _ => ()
    }
  }

  test("property: repetition stats obey count identities") {
    import spark.implicits._
    val gen = Gen.listOfN(8, Gen.listOfN(20, Gen.chooseNum(1, 5)))
    samples(gen, 4).foreach { wordIds =>
      val corpus = wordIds.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.map(w => s"t$w").mkString(" "))
      }.toDF("doc_id", "text")
      graft.operators.Curation.repetitionStats(corpus, "doc_id", "text", n = 2)
        .collect().foreach { r =>
          val total = r.getAs[Long]("total_ngrams")
          val distinct = r.getAs[Long]("distinct_ngrams")
          val top = r.getAs[Long]("top_ngram_count")
          distinct should be <= total
          top should be <= total
          // the modal count is at least the average bucket size
          top * distinct should be >= total
        }
    }
  }

  test("property: decontamination overlap is bounded and threshold-consistent") {
    import spark.implicits._
    val gen = Gen.zip(Gen.listOfN(10, Gen.chooseNum(1, 9)), Gen.chooseNum(0, 100))
    samples(gen, 4).foreach { case (seedWords, threshold) =>
      val corpus = (1L to 6L).map(i =>
        (i, (seedWords ++ Seq(i * 100, i * 100 + 1)).map(w => s"w$w").mkString(" ")))
        .toDF("doc_id", "text")
      val eval = Seq((99L, seedWords.map(w => s"w$w").mkString(" ")))
        .toDF("doc_id", "text")
      graft.operators.Curation.decontaminate(corpus, eval, "doc_id", "text",
          shingleSize = 3, thresholdPct = threshold)
        .collect().foreach { r =>
          val total = r.getAs[Long]("total_shingles")
          val matched = r.getAs[Long]("matched_shingles")
          val pct = r.getAs[Long]("overlap_pct")
          matched should be <= total
          pct shouldBe (100 * matched) / math.max(total, 1L)
          r.getAs[Boolean]("contaminated") shouldBe (pct >= threshold)
        }
    }
  }

  test("property: exact quantiles match brute-force inverse-CDF on random integer lists") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val gen = Gen.zip(Gen.nonEmptyListOf(Gen.chooseNum(-50L, 50L)),
      Gen.nonEmptyListOf(Gen.chooseNum(1, 10000)))
    samples(gen, 12).foreach { case (values, qs0) =>
      val qs = qs0.distinct
      val out = graft.operators.Profile.exactQuantiles(values.toDF("v"), "v", qs)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val sorted = values.sorted
      qs.foreach { q =>
        // PERCENTILE_DISC: element at rank ceil(q·n/10000) (1-based)
        val target = ((q.toLong * sorted.size + 9999) / 10000).toInt
        out(q) shouldBe sorted(math.max(target, 1) - 1)
      }
    }
  }

  test("property: line dedup equals order-preserving distinct; counts are consistent") {
    import spark.implicits._
    val lineGen = Gen.oneOf("a", "b", "c", "dd", "")
    samples(Gen.nonEmptyListOf(lineGen), 20).foreach { lines =>
      val text = lines.mkString("\n")
      val row = graft.operators.TextAnalysis.dedupLines(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text").first()
      // split/mkString round-trip drops nothing: counts cover every line
      row.getAs[Long]("line_count") shouldBe lines.size.toLong
      row.getAs[Long]("dup_lines") shouldBe (lines.size - lines.distinct.size).toLong
      row.getAs[String]("deduped_text") shouldBe lines.distinct.mkString("\n")
    }
  }

  test("property: bigram counts match the naive sliding-window count") {
    import spark.implicits._
    val tok = Gen.oneOf("x", "y", "z")
    samples(Gen.nonEmptyListOf(tok), 15).foreach { toks =>
      val text = toks.mkString(" ")
      val out = graft.operators.TextAnalysis.bigramTable(
        Seq((1L, text)).toDF("doc_id", "text"), "text", k = 1000)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val naive = toks.zip(toks.drop(1)).groupBy(identity).view.mapValues(_.size.toLong).toMap
      out shouldBe naive
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

  test("property: resampled grid values are bounded by the bracketing observations") {
    import spark.implicits._
    val serieGen = Gen.zip(
      Gen.chooseNum(1L, 5L), // step
      Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 60L), Gen.chooseNum(-50L, 50L))))
    samples(serieGen, 12).foreach { case (step, raw) =>
      val obs = raw.toMap.toSeq // unique ts
      val df = obs.map { case (t, v) => ("k", t, v) }.toDF("k", "t", "v")
      val out = graft.operators.TimeSeries.resampleLinear(df, "k", "t", "v", step)
        .collect()
      val sorted = obs.sortBy(_._1)
      out.foreach { r =>
        val g = r.getAs[Long]("grid_us"); val vc = r.getAs[Long]("value_cents")
        val before = sorted.filter(_._1 <= g)
        val after = sorted.filter(_._1 >= g)
        // bracketing observation values bound the interpolation
        val v0 = before.last._2
        val v1 = if (after.nonEmpty) after.head._2 else v0
        vc should be >= math.min(v0, v1)
        vc should be <= math.max(v0, v1)
        // exact hits are never marked interpolated
        if (sorted.exists(_._1 == g))
          r.getAs[Boolean]("interpolated") shouldBe false
      }
    }
  }

  test("property: token-budget waterfilling fills but never exceeds the budget") {
    import spark.implicits._
    val gen = Gen.zip(Gen.chooseNum(0L, 60L),
      Gen.nonEmptyListOf(Gen.chooseNum(1, 12)))
    samples(gen, 12).foreach { case (budget, sizes) =>
      val docs = sizes.zipWithIndex.flatMap { case (n, i) =>
        Seq.fill(n)((s"s$i", "t"))
      }.toDF("source", "text")
      val out = graft.operators.Curation.tokenBudget(docs, "source", "text", budget)
        .collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("tokens"),
          r.getAs[Long]("allocated")))
      val total = out.map(_._3).sum
      total should be <= math.max(budget, 0L)
      // every allocation within [0, tokens]
      out.foreach { case (_, t, a) => a should (be >= 0L and be <= t) }
      // waterfilling optimality: if anything was capped, the budget is
      // filled to within one token per capped source (floor loss only)
      val capped = out.count(o => o._3 < o._2)
      if (capped > 0) (budget - total) should be < capped.toLong
      else total shouldBe math.min(budget, out.map(_._2).sum)
    }
  }

  test("property: pageRank conserves bounded mass and respects the base floor") {
    import spark.implicits._
    val edgeGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(1L, 12L), Gen.chooseNum(1L, 12L)))
    samples(edgeGen, 8).foreach { raw =>
      val edges = raw.filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val out = graft.operators.Graph.pageRank(
          edges.toDF("src", "dst"), "src", "dst", iterations = 2)
          .collect().map(_.getAs[Long]("rank_x1e12"))
        val n = out.length.toLong
        val base = 15L * (1000000000000L / n) / 100L
        all(out) should be >= base
        // dangling nodes only LOSE mass; floors only lose mass
        out.sum should be <= 1000000000000L
      }
    }
  }

  test("property: morton interleave is a bijection on the bucket grid") {
    import spark.implicits._
    val pts = (0 until 1024).map(i => (i.toLong % 32, i.toLong / 32))
    val zs = pts.toDF("a", "b")
      .select(graft.operators.Layout.mortonKey(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b"), bits = 5).as("z"))
      .collect().map(_.getLong(0))
    zs.distinct.length shouldBe 1024
    zs.min shouldBe 0L
    zs.max shouldBe 1023L
  }

  test("property: fractional epochs emit exactly div(w,100) or +1 copies, slice-deterministically") {
    import spark.implicits._
    samples(Gen.chooseNum(0, 350), 10).foreach { w =>
      val docs = (1L to 40L).map(i => (i, "s")).toDF("doc_id", "lang")
        .withColumn("text", org.apache.spark.sql.functions.lit("t"))
      val out = graft.operators.Curation.fractionalEpochs(
        docs, "doc_id", "lang", Map("s" -> w))
        .groupBy("doc_id").count().collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("count")).toMap
      val lo = w / 100
      (1L to 40L).foreach { id =>
        out.getOrElse(id, 0L) should (be(lo.toLong) or be(lo.toLong + 1))
      }
      // total matches the target rate within one copy per row
      val total = out.values.sum
      total should be >= (40L * lo)
      total should be <= (40L * (lo + 1))
    }
  }

  test("property: two-pass MG heavy hitters equals brute force on random" +
      " streams, any k, any layout") {
    import spark.implicits._
    // small alphabets force heavy collisions; skewed choice makes some
    // symbols genuinely heavy and others hover at the threshold
    val streamGen = for {
      alpha <- Gen.chooseNum(2, 12)
      n <- Gen.chooseNum(20, 300)
      xs <- Gen.listOfN(n, Gen.frequency(
        (4, Gen.const(0)), (2, Gen.const(1)),
        (1, Gen.chooseNum(0, alpha - 1))))
      k <- Gen.chooseNum(2, 8)
      parts <- Gen.chooseNum(1, 6)
    } yield (xs.map(i => s"t$i"), k, parts)
    samples(streamGen, 12).foreach { case (xs, k, parts) =>
      val brute = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
        .filter { case (_, c) => c * k > xs.size }
      val out = graft.operators.Skew.heavyHitters(
          spark.sparkContext.parallelize(xs, parts).toDF("t"), "t", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      out shouldBe brute
    }
  }
}
