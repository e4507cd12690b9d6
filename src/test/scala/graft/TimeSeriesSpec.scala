package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.matchers.should.Matchers

import graft.operators.TimeSeries

/** Planted-input tests for the time-series resampling operators (x80/x81).
  */
class TimeSeriesSpec extends SparkSpec with Matchers {

  private def series(rows: (String, Long, Long)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("k", "t", "v")
  }

  private def grid(df: DataFrame): Seq[(Long, Long, Boolean)] =
    df.orderBy("grid_us").collect()
      .map(r => (r.getAs[Long]("grid_us"), r.getAs[Long]("value_cents"),
        r.getAs[Boolean]("interpolated"))).toSeq

  test("resampleLinear: interpolates interior grid points, keeps exact hits") {
    val out = TimeSeries.resampleLinear(
      series(("a", 0L, 0L), ("a", 10L, 100L)), "k", "t", "v", stepUs = 2L)
    grid(out) shouldBe Seq(
      (0L, 0L, false), (2L, 20L, true), (4L, 40L, true),
      (6L, 60L, true), (8L, 80L, true), (10L, 100L, false))
  }

  test("resampleLinear: descending slope floors by magnitude (engine-portable)") {
    // 10 -> 0 over [0, 3], grid step 1: true values 6.67, 3.33 ->
    // magnitude division gives 10 - 10*1 div 3 = 7 and 10 - 10*2 div 3 = 4.
    val out = TimeSeries.resampleLinear(
      series(("a", 0L, 10L), ("a", 3L, 0L)), "k", "t", "v", stepUs = 1L)
    grid(out) shouldBe Seq(
      (0L, 10L, false), (1L, 7L, true), (2L, 4L, true), (3L, 0L, false))
  }

  test("resampleLinear: no extrapolation — unaligned last observation emits nothing") {
    val out = TimeSeries.resampleLinear(
      series(("a", 0L, 0L), ("a", 5L, 50L)), "k", "t", "v", stepUs = 2L)
    // last point t=5 is off-grid: the grid stops at 4
    grid(out) shouldBe Seq(
      (0L, 0L, false), (2L, 20L, true), (4L, 40L, true))
  }

  test("resampleLinear: grid anchors at each key's own first observation") {
    val out = TimeSeries.resampleLinear(
      series(("a", 0L, 0L), ("a", 4L, 40L), ("b", 1L, 5L), ("b", 5L, 45L)),
      "k", "t", "v", stepUs = 2L)
    val byKey = out.collect().groupBy(_.getAs[String]("k"))
    byKey("a").map(_.getAs[Long]("grid_us")).sorted.toSeq shouldBe Seq(0L, 2L, 4L)
    byKey("b").map(_.getAs[Long]("grid_us")).sorted.toSeq shouldBe Seq(1L, 3L, 5L)
  }

  test("resampleLinear: negative values interpolate exactly") {
    val out = TimeSeries.resampleLinear(
      series(("a", 0L, -100L), ("a", 4L, -60L)), "k", "t", "v", stepUs = 2L)
    grid(out) shouldBe Seq(
      (0L, -100L, false), (2L, -80L, true), (4L, -60L, false))
  }

  test("resampleLinear: reserved-column clash rejected") {
    import spark.implicits._
    val bad = Seq(("a", 1L, 2L, 3L)).toDF("k", "t", "v", "grid_us")
    an[IllegalArgumentException] should be thrownBy
      TimeSeries.resampleLinear(bad, "k", "t", "v", 2L)
  }

  test("ohlc: single-pass candles with deterministic tie-breaks") {
    import spark.implicits._
    val ticks = Seq(
      // key a, bucket 0 (t in [0,10)): open at t=1, close at t=9
      ("a", 1L, 1L, 50L), ("a", 5L, 2L, 90L), ("a", 9L, 3L, 20L),
      // same timestamp: seq breaks the tie -> open = eid 4, close = eid 5
      ("a", 12L, 4L, 70L), ("a", 12L, 5L, 30L))
      .toDF("k", "t", "eid", "v")
    val out = TimeSeries.ohlc(ticks, "k", "t", "eid", "v", bucketUs = 10L)
      .orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("open"),
        r.getAs[Long]("high"), r.getAs[Long]("low"), r.getAs[Long]("close"),
        r.getAs[Long]("n"), r.getAs[Long]("sum_cents"))).toSeq
    out shouldBe Seq(
      (0L, 50L, 90L, 20L, 20L, 3L, 160L),
      (1L, 70L, 70L, 30L, 30L, 2L, 100L))
  }

  test("decayedScore: power-of-two half-life weights, horizon cutoff, exact x1024 scale") {
    import spark.implicits._
    val day = 86400000000L
    // tmax = 40·day. Ages: 0, 1, 31 (beyond the 30-half-life horizon -> 0),
    // and a second key with one age-0 event.
    val ev = Seq(
      ("u", 40L * day, 100L), ("u", 39L * day, 100L), ("u", 9L * day, 999L),
      ("v", 40L * day, 7L)
    ).toDF("k", "t_us", "cents")
    val out = graft.operators.TimeSeries.decayedScore(ev, "k", "t_us", "cents",
        halfLifeDays = 1, horizonHalfLives = 30)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.toSeq shouldBe Seq(
      // 100·1024 (age 0) + 100·512 (age 1) + 0 (age 31, beyond horizon)
      ("u", 3L, 1199L, 153600L),
      ("v", 1L, 7L, 7168L)) // 7·1024
    an[IllegalArgumentException] should be thrownBy
      graft.operators.TimeSeries.decayedScore(ev, "k", "t_us", "cents",
        halfLifeDays = 1, horizonHalfLives = 50)
    // cents >= 2^23 at horizon 40: a long product would wrap negative;
    // the decimal multiply keeps it exact (2^24 · 2^40 / 2^30 = 2^34)
    val big = Seq(("w", 40L * day, 1L << 24)).toDF("k", "t_us", "cents")
    graft.operators.TimeSeries.decayedScore(big, "k", "t_us", "cents",
        halfLifeDays = 1, horizonHalfLives = 40)
      .collect().head.getLong(3) shouldBe (1L << 34)
  }

  test("linearTrend: rising, falling, and flat series keep the exact rational slope") {
    import spark.implicits._
    val pts = Seq(
      ("up", 0L, 0L), ("up", 1L, 2L), ("up", 2L, 4L),      // slope 2
      ("down", 0L, 4L), ("down", 1L, 2L), ("down", 2L, 0L), // slope -2
      ("flat", 0L, 1L), ("flat", 1L, 1L))                   // slope 0
      .toDF("k", "x", "y")
    val out = graft.operators.TimeSeries.linearTrend(pts, "k", "x", "y")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    // (n·Σxy − Σx·Σy, n·Σx² − (Σx)²): up = (12, 6) → slope 12/6 = 2
    out.toSeq shouldBe Seq(
      ("down", 3L, -12L, 6L, false),
      ("flat", 2L, 0L, 1L, false), // den = 2·1 − 1² = 1
      ("up", 3L, 12L, 6L, true))
  }
}
