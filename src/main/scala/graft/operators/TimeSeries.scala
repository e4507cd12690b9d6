package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling operators (the tempo/Flint surface): regular-grid
  * resampling with interpolation, and OHLC-style bucket downsampling.
  * Everything is exact integer arithmetic over microsecond timestamps and
  * ×100-scaled values (cents), the same fixed-point discipline as the rest
  * of the engine, so the DuckDB oracles hash-match. (Division sign rule:
  * Spark `div` truncates toward zero, DuckDB `//` floors — they agree only
  * on non-negative operands, so the interpolation splits on the slope sign
  * and divides magnitudes.)
  */
object TimeSeries {

  /** Resample each key's irregular series onto a regular `stepUs` grid
    * anchored at the key's first observation, with per-point linear
    * interpolation between the bracketing observations:
    *   v(g) = v₀ ± div(|v₁ − v₀| · (g − t₀), t₁ − t₀)
    * Exact-hit grid points return the observed value untouched
    * (`interpolated` = false); the grid never extrapolates — points beyond
    * the key's last observation are not emitted (the last observation
    * appears only when it lands exactly on the grid). Output:
    * (key, grid_us, value_cents, interpolated).
    *
    * Input contract: one observation per (key, ts) — enforce upstream with
    * an aggregate if the raw feed can double-report; values arrive ×100
    * (cents) so the interpolation stays in exact integer space.
    *
    * Scale (100 TB): one shuffle on key for the lead() window, then a
    * map-side explode of each OBSERVATION INTERVAL into the grid points it
    * covers — grid rows never shuffle; per-row fan-out is bounded by
    * gap/stepUs (pick stepUs within ~1000× of the median gap). The window
    * partitions by key, so a hot key is one partition — same caveat (and
    * same salting remedy) as every keyed window op.
    */
  def resampleLinear(df: DataFrame, keyCol: String, tsUsCol: String,
      valueCentsCol: String, stepUs: Long): DataFrame = {
    require(stepUs > 0, "resampleLinear: stepUs must be positive")
    val reserved = Seq("__t0", "__t1", "__v0", "__v1", "__g0", "grid_us",
      "value_cents", "interpolated")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"resampleLinear: input already has reserved column(s) ${clash.mkString(", ")} — rename them upstream")

    val w = Window.partitionBy(keyCol).orderBy("__t0")
    val wAll = Window.partitionBy(keyCol)
    df.select(col(keyCol), col(tsUsCol).cast("long").as("__t0"),
        col(valueCentsCol).cast("long").as("__v0"))
      .withColumn("__t1", lead(col("__t0"), 1).over(w))
      .withColumn("__v1", lead(col("__v0"), 1).over(w))
      .withColumn("__g0", min(col("__t0")).over(wAll))
      // Grid points owned by THIS observation: the first aligned point at
      // or after __t0, through the last point before __t1 (the final
      // observation owns only its own timestamp, and only when aligned).
      // Both bounds are data-dependent, so guard the empty case — Spark's
      // sequence() rejects stop < start with a positive step.
      .withColumn("grid_us", explode(expr(
        s"""CASE WHEN __g0 + ((__t0 - __g0 + ${stepUs}L - 1) div ${stepUs}L) * ${stepUs}L
           |          <= coalesce(__t1 - 1, __t0)
           |     THEN sequence(
           |       __g0 + ((__t0 - __g0 + ${stepUs}L - 1) div ${stepUs}L) * ${stepUs}L,
           |       coalesce(__t1 - 1, __t0),
           |       ${stepUs}L)
           |     ELSE array() END""".stripMargin)))
      .select(col(keyCol), col("grid_us"),
        when(col("grid_us") === col("__t0"), col("__v0"))
          .when(col("__v1") >= col("__v0"), col("__v0") +
            expr("div((__v1 - __v0) * (grid_us - __t0), __t1 - __t0)"))
          .otherwise(col("__v0") -
            expr("div((__v0 - __v1) * (grid_us - __t0), __t1 - __t0)"))
          .as("value_cents"),
        (col("grid_us") =!= col("__t0")).as("interpolated"))
  }

  /** OHLC downsampling: per (key, bucket of `bucketUs`) emit open/high/low/
    * close (first/max/min/last by timestamp) plus count and sum. One
    * shuffle, all aggregates in a single pass via min_by/max_by keyed on
    * the (ts, seq) tie-break — no window, no self-join. `seqCol` breaks
    * ties for same-timestamp observations so open/close are deterministic.
    */
  def ohlc(df: DataFrame, keyCol: String, tsUsCol: String, seqCol: String,
      valueCentsCol: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "ohlc: bucketUs must be positive")
    val ord = struct(col(tsUsCol).cast("long"), col(seqCol))
    df.groupBy(col(keyCol), expr(s"div(cast($tsUsCol as bigint), ${bucketUs}L)").as("bucket"))
      .agg(
        min_by(col(valueCentsCol).cast("long"), ord).as("open"),
        max(col(valueCentsCol).cast("long")).as("high"),
        min(col(valueCentsCol).cast("long")).as("low"),
        max_by(col(valueCentsCol).cast("long"), ord).as("close"),
        count(lit(1)).as("n"),
        sum(col(valueCentsCol).cast("long")).as("sum_cents"))
  }

  /** Recency-weighted (exponentially decayed) per-key rollup — the
    * engagement/freshness score every ranking and retention system keeps:
    * an event `a` half-lives ago contributes `value / 2^a`. EXACT
    * fixed-point: ages quantize to whole half-lives (integer division
    * from the corpus max timestamp), weights are powers of two
    * (`shiftleft`, no floating decay factor), and contributions multiply
    * and sum in decimal(38,0), so neither a large cents value nor corpus
    * size can overflow the SUM. The final ×1024-rescaled output does
    * ride a long: a key whose decayed mass exceeds Long.Max/1024 ≈
    * 9.2×10^15 cents-at-age-zero equivalents would overflow that slot
    * (Spark's decimal IntegralDivide nulls/wraps silently) — orders of
    * magnitude past representable business values, but the bound is the
    * output's, not the arithmetic's. Output per key:
    * (events, cents_total, decayed_x1024) where decayed_x1024 is the
    * score scaled so an age-zero event contributes its cents × 1024 —
    * engine-portable integer arithmetic end to end (non-negative cents
    * required: Spark `div` truncates while DuckDB `//` floors, which
    * only agree ≥ 0; the floor(value·100+0.5) cents convention upstream
    * satisfies this).
    *
    * Scale: one 1-row max-timestamp broadcast, one map-side weight
    * expression, ONE keyed aggregate with partial aggregation — the
    * same shuffle count as a plain sum. Events older than
    * `horizonHalfLives` contribute exactly 0 (their true weight is below
    * the ×1024 resolution anyway), which is what makes the fixed-point
    * representation closed.
    */
  def decayedScore(events: DataFrame, keyCol: String, tsUsCol: String,
      centsCol: String, halfLifeDays: Int = 1,
      horizonHalfLives: Int = 30): DataFrame = {
    require(halfLifeDays >= 1, "decayedScore: halfLifeDays must be >= 1")
    require(horizonHalfLives >= 10 && horizonHalfLives <= 40,
      "decayedScore: horizonHalfLives must be in [10, 40] (>= 10 so the " +
        "x1024 output scale divides out; <= 40 keeps the weight range " +
        "sane — products and sums ride decimal(38,0); see the scaladoc " +
        "for the long-output bound)")
    val mx = events.agg(max(col(tsUsCol)).as("__tmax"))
    events.crossJoin(broadcast(mx))
      .withColumn("__age", expr(
        s"div(div(__tmax - $tsUsCol, 86400000000), $halfLifeDays)"))
      .withColumn("__w", when(col("__age") <= horizonHalfLives,
        expr(s"shiftleft(1L, cast($horizonHalfLives - __age as int))"))
        .otherwise(lit(0L)))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("events"),
        sum(col(centsCol)).as("cents_total"),
        // cast BEFORE the multiply: cents * 2^40 as a long product would
        // wrap for cents >= 2^23; in decimal(38,0) it cannot
        sum(col(centsCol).cast("decimal(38,0)") * col("__w")).as("__dsum"))
      .withColumn("decayed_x1024",
        expr(s"div(__dsum, ${1L << (horizonHalfLives - 10)})"))
      .select(col(keyCol), col("events"), col("cents_total"),
        col("decayed_x1024"))
  }

  /** Exact per-key least-squares trend over integer (x, y) points — the
    * closed-form slope kept in its rational form:
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    * emitted as `slope_num` / `slope_den` plus `rising` = num > 0, never
    * divided: the division sign rule (Spark `div` truncates toward zero,
    * DuckDB `//` floors — see the object scaladoc) makes a negative-slope
    * quotient engine-dependent, while the numerator/denominator pair and
    * the sign are exact integers in both. Callers that need a scaled
    * slope divide magnitudes downstream under their own rounding policy.
    *
    * One keyed aggregation with map-side partials over five running sums
    * — the textbook "fit a trend per key at any scale" shape (drift
    * detection per source, volume trend per type). Arithmetic stays in
    * Int64: callers keep |x|,|y| small enough that n·Σxy fits (pre-scale
    * y or re-index x if a century of microseconds would overflow).
    */
  def linearTrend(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame =
    df.select(col(keyCol), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .select(col(keyCol), col("n"),
        (col("n") * col("__sxy") - col("__sx") * col("__sy")).as("slope_num"),
        (col("n") * col("__sxx") - col("__sx") * col("__sx")).as("slope_den"),
        (col("n") * col("__sxy") - col("__sx") * col("__sy") > 0).as("rising"))
}
