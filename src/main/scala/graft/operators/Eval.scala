package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable._

/** Detector-quality and reproducibility audits — the measurements a
  * curation team runs ON its own pipeline: how much do two sources
  * overlap, how much near-dup mass does the production LSH config miss
  * and at what similarity, and does the split policy actually prevent
  * leakage. Same discipline as the rest of the §7.5 family: codegen'd
  * built-ins only, exact integer outputs, every result DuckDB-oracle
  * checkable via the shared portable primitives.
  */
object Eval {

  /** Corpus-level source-overlap matrix — pairwise shingle-set Jaccard
    * between data SOURCES, the "are these two crawls the same data"
    * audit that decides whether ingesting a new source is worth it.
    * (Complementary to the x45 source-dup matrix: x45 counts individual
    * near-dup DOC pairs across sources and needs the full per-doc LSH;
    * this measures whole-source content similarity and needs only one
    * collapse pass.)
    *
    * Two measurements per source pair:
    *  - `est_jaccard_x1m` from per-source MinHash UNION signatures: each
    *    source collapses to `numHashes` longs via `min(h_i(shingle))`
    *    partial aggregation DIRECTLY on the exploded shingle stream (min
    *    is duplicate-blind, so no distinct shuffle is needed) — ONE
    *    map-side-combined pass over the corpus, then the pairwise compare
    *    runs on a #sources-row table. This is the only pass you'd run at
    *    100 TB.
    *  - `exact_jaccard_x1m` from the distinct (source, shingle-hash)
    *    table: sizes per source plus an inverted-index self-join on the
    *    hash for pairwise intersections. Per-hash fan-out is bounded by
    *    #sources² (sources are few), but the distinct + join shuffles are
    *    corpus-sized — the audit mode that certifies the estimate, run at
    *    sample scale. `withExact = false` skips it.
    *
    * Emitting both makes the operator self-certifying the way the ANN
    * recall eval (x104) is: the oracle checks the estimate AND its error
    * against ground truth in one result.
    */
  def sourceOverlap(df: DataFrame, groupCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 16,
      withExact: Boolean = true): DataFrame = {
    val hs = Dedup.shingles(df, groupCol, textCol, shingleSize)
      .select(col("doc").as("grp"), hash56(col("shingle")).as("h"))

    val minCols = (0 until numHashes).map(i =>
      min(uhash(col("h"), coeffA(i), coeffB(i))).as(s"m$i"))
    val sigs = hs.groupBy("grp").agg(minCols.head, minCols.tail: _*)

    val agree = (0 until numHashes).map(i =>
      when(col(s"l.m$i") === col(s"r.m$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val pairs = sigs.as("l").join(sigs.as("r"), col("l.grp") < col("r.grp"))
      .select(col("l.grp").as("source_a"), col("r.grp").as("source_b"),
        agree.as("agree"))
      .withColumn("est_jaccard_x1m", expr(s"div(1000000 * agree, $numHashes)"))

    if (!withExact) return pairs.orderBy("source_a", "source_b")

    val dh = hs.distinct()
    val sizes = dh.groupBy("grp").agg(count(lit(1)).as("sz"))
    val common = dh.as("l").join(dh.as("r"),
        col("l.h") === col("r.h") && col("l.grp") < col("r.grp"))
      .groupBy(col("l.grp").as("source_a"), col("r.grp").as("source_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(common, Seq("source_a", "source_b"), "left")
      .na.fill(0L, Seq("common"))
      .join(sizes.select(col("grp").as("source_a"), col("sz").as("size_a")),
        Seq("source_a"))
      .join(sizes.select(col("grp").as("source_b"), col("sz").as("size_b")),
        Seq("source_b"))
      .withColumn("exact_jaccard_x1m",
        expr("div(1000000 * common, size_a + size_b - common)"))
      .select("source_a", "source_b", "agree", "est_jaccard_x1m",
        "common", "size_a", "size_b", "exact_jaccard_x1m")
      .orderBy("source_a", "source_b")
  }

  /** Exact word-shingle Jaccard pair table — the ground truth the LSH
    * recall eval measures against, in the SAME feature space as
    * Dedup.minHashLsh (word k-shingles → 56-bit hashes → distinct
    * per-doc sets). Inverted-index candidate generation with the standard
    * `maxBucket` flood guard (a pair is missed only if every shared
    * shingle is corpus-flooded — the no-discriminative-content pairs);
    * verification uses the full feature arrays, so Jaccard values are
    * exact.
    *
    * Returns (doc_a, doc_b, common, size_a, size_b, jaccard) for pairs
    * with jaccard ≥ threshold — Dedup.minHashLsh's exact-baseline twin.
    */
  def shingleJaccardExact(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5,
      maxBucket: Long = 256L): DataFrame = {
    require(maxBucket >= 2, "shingleJaccardExact: maxBucket must be >= 2")
    val feats = Dedup.shingleFeatureSets(df, idCol, textCol, shingleSize)
    Dedup.verifyJaccardArrays(
      Dedup.guardedCandidates(feats, maxBucket), feats, threshold)
  }

  /** MinHash-LSH recall S-curve — the banding theory (P[collide] =
    * 1-(1-j^r)^b) made measurable on the actual corpus: ground-truth
    * near-dup pairs (exact shingle Jaccard ≥ threshold) bucketed by true
    * similarity, each bucket scored by how many pairs the production LSH
    * config (numHashes/bands) actually detected. The output is the table
    * that answers "we dedup at 0.5 — how much 0.5–0.6 mass does 16/4
    * banding silently miss, and is the miss where the theory says it is".
    *
    * `jac_x10` is the exact rational floor div(10·common, union) — no
    * float bucketing drift between engines. Detected pairs are a subset
    * of truth by construction (both verify exact Jaccard on the same
    * feature sets; LSH only restricts candidate discovery), so
    * recall_x100 ∈ [0, 100].
    *
    * Scale: truth is the expensive leg (inverted-index candidates), run
    * at audit scale with the flood guard; the detector leg is the
    * production config itself. Joins are all equi-joins on (doc_a, doc_b).
    */
  def lshRecallByBucket(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, maxBucket: Long = 256L): DataFrame = {
    val truth = shingleJaccardExact(df, idCol, textCol, shingleSize,
        threshold, maxBucket)
      .withColumn("jac_x10", expr("div(10 * common, size_a + size_b - common)"))
      .select("doc_a", "doc_b", "jac_x10")
    val detected = Dedup.minHashLsh(df, idCol, textCol, shingleSize,
        numHashes, bands, threshold)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("hit"))
    truth.join(detected, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("hit"))
      .groupBy("jac_x10")
      .agg(count(lit(1)).as("truth_pairs"), sum("hit").as("detected_pairs"))
      .withColumn("recall_x100", expr("div(100 * detected_pairs, truth_pairs)"))
      .orderBy("jac_x10")
  }

  /** Split-leakage audit — does the split policy keep near-copies out of
    * each other's splits? Scores TWO policies on the same similarity
    * edges: `naive` (hash-slice of the DOC id — what most pipelines ship
    * first) and `cluster` (hash-slice of the near-dup CLUSTER id —
    * Curation.leakageSafeSplit). For each policy: total edges, edges
    * crossing any split boundary, and the worst kind — train↔test edges,
    * a held-out doc with a near-copy in train. The cluster policy's
    * cross counts are structurally zero (both endpoints share a
    * canonical id, hence a split); the naive policy's counts are the
    * measured leakage a random row split would ship.
    *
    * Scale: canonicalize's label propagation dominates; the audit itself
    * is two broadcast-free equi-joins of the slim edge table against the
    * labeled docs, then a two-row aggregate.
    */
  def splitLeakage(docs: DataFrame, idCol: String, pairs: DataFrame,
      valPct: Int, testPct: Int): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100,
      "splitLeakage: valPct/testPct must be >= 0 and sum to <= 100")
    def sliceToSplit(slice: org.apache.spark.sql.Column) =
      when(slice < testPct, "test")
        .when(slice < testPct + valPct, "val")
        .otherwise("train")
    val labeled = Dedup.canonicalize(docs, idCol, pairs)
      .select(col("doc"),
        sliceToSplit(hash56(col("doc").cast("string")) % 100).as("naive"),
        sliceToSplit(hash56(col("canonical_id").cast("string")) % 100)
          .as("cluster"))
    val edges = pairs.select(col("doc_a"), col("doc_b"))
      .join(labeled.select(col("doc").as("doc_a"), col("naive").as("na"),
        col("cluster").as("ca")), Seq("doc_a"))
      .join(labeled.select(col("doc").as("doc_b"), col("naive").as("nb"),
        col("cluster").as("cb")), Seq("doc_b"))
    // coalesce: sum over ZERO edges is null, and an empty pair table is
    // the audit's success case — it must read (0, 0), not (null, null)
    def crossCnt(a: String, b: String) =
      coalesce(sum(when(col(a) =!= col(b), 1L).otherwise(0L)), lit(0L))
    def ttCnt(a: String, b: String) =
      coalesce(sum(when((col(a) === "train" && col(b) === "test") ||
               (col(a) === "test" && col(b) === "train"), 1L).otherwise(0L)),
        lit(0L))
    // Both policies in ONE pass over the edge join (a stack unpivot of a
    // single 5-column aggregate — not two scans).
    edges.agg(
        count(lit(1)).as("pairs_total"),
        crossCnt("na", "nb").as("n_cross"), ttCnt("na", "nb").as("n_tt"),
        crossCnt("ca", "cb").as("c_cross"), ttCnt("ca", "cb").as("c_tt"))
      .select(
        expr("stack(2, 'cluster', c_cross, c_tt, 'naive', n_cross, n_tt) " +
          "as (policy, cross_split_pairs, train_test_pairs)"),
        col("pairs_total"))
      .select("policy", "pairs_total", "cross_split_pairs", "train_test_pairs")
      .orderBy("policy")
  }

  /** Reproducible per-epoch training order — the data-ordering half of a
    * reproducible training run: every epoch is a DIFFERENT deterministic
    * permutation of the corpus (seeded hash of (seed, epoch, id)), cut
    * into `shards` independent files, with a stable position inside each
    * shard. Re-running on any partitioning, cluster size, or engine
    * yields byte-identical order — the property that lets a crashed run
    * resume mid-epoch and an ablation replay the exact data stream.
    *
    * Scale: there is NO global sort — the shard is the top bits of the
    * hash-key space (contiguous range per shard, so the permutation is
    * globally ordered across shards by construction), and positions are
    * rank-within-shard windows that sort each shard independently. At
    * 100 TB: thousands of shards, each window a single executor-local
    * sort. `repartition` on (epoch, shard) would co-locate each output
    * file's rows with its window — one shuffle, then sorted writes.
    */
  /** Deterministic shard-ordered stream for an arbitrary weighted
    * multiset — [[epochShuffle]]'s general form: the input already
    * carries its copies (e.g. Curation.fractionalEpochs' mixture
    * expansion), and every (id, copy) row gets a seeded-hash key, a
    * contiguous-key-range shard, and a rank-within-shard position. The
    * concatenation shard 0, 1, … read in pos order IS a global
    * deterministic permutation of the whole weighted stream — the exact
    * token-order replay artifact of a training run, with NO global sort
    * (per-shard windows, executor-local). All input columns pass
    * through.
    */
  def shardOrder(df: DataFrame, idCol: String, copyCol: String, shards: Int,
      seed: String = "graft"): DataFrame = {
    require(shards >= 1 && shards <= 127,
      "shardOrder: 1 <= shards <= 127 (key * shards must stay below 2^63)")
    val inputCols = df.columns.toSeq
    df.withColumn("__key", hash56(
        concat_ws(":", lit(seed), col(copyCol), col(idCol))))
      .withColumn("shard", expr(s"div(__key * $shards, ${1L << 56})").cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard")
          .orderBy(col("__key"), col(idCol), col(copyCol))).cast("long"))
      .select((Seq(col("shard"), col("pos")) ++ inputCols.map(col)): _*)
  }

  def epochShuffle(df: DataFrame, idCol: String, epochs: Int, shards: Int,
      seed: String = "graft"): DataFrame = {
    require(epochs >= 1 && shards >= 1 && shards <= 127,
      "epochShuffle: epochs >= 1 and 1 <= shards <= 127 " +
        "(key * shards must stay below 2^63; widen via a second level " +
        "of sharding if you need more output files)")
    val keyed = df.select(col(idCol))
      .withColumn("epoch", explode(sequence(lit(0), lit(epochs - 1))))
      .withColumn("key", hash56(
        concat_ws(":", lit(seed), col("epoch"), col(idCol))))
      .withColumn("shard", expr(s"div(key * $shards, ${1L << 56})").cast("int"))
    keyed
      .withColumn("pos", row_number().over(
        Window.partitionBy("epoch", "shard").orderBy("key", idCol)))
      .select(col("epoch"), col("shard"), col("pos").cast("long").as("pos"),
        col(idCol))
  }

  /** Curriculum mixture schedule — the multi-epoch composition of
    * [[graft.operators.Curation.fractionalEpochs]] and [[shardOrder]]
    * with PER-EPOCH weights: real training runs anneal the mixture
    * (epoch 1 near-uniform for coverage, later epochs leaning into
    * curated/high-quality strata; a stratum can anneal to 0 and drop
    * out), and the whole schedule must replay byte-identically for a
    * resume or ablation. Each epoch gets its own fractional-extra hash
    * slice (salted by epoch — the same docs are not always the repeated
    * ones) and its own shard permutation (seeded by epoch, x116's
    * property). Scale: per-epoch map-only expansion + one rank window
    * per (epoch, shard) — no global sort, same as shardOrder.
    *
    * `schedule` is one weights-map per epoch (×100 fixed-point, missing
    * strata get `defaultX100`). Output: (epoch, shard, pos, input cols).
    */
  def curriculumMixture(df: DataFrame, idCol: String, stratumCol: String,
      schedule: Seq[Map[String, Int]], shards: Int,
      defaultX100: Int = 100, seed: String = "graft"): DataFrame = {
    require(schedule.nonEmpty, "curriculumMixture: schedule must be non-empty")
    schedule.zipWithIndex.map { case (weights, i) =>
      val e = i + 1
      val mix = Curation.fractionalEpochs(df, idCol, stratumCol, weights,
        defaultX100, salt = s"$seed-e$e:")
      shardOrder(mix, idCol, "copy", shards, seed = s"$seed-e$e")
        .withColumn("epoch", lit(e))
    }.reduce(_ unionByName _)
  }

  /** Exact AUC of an integer score against a binary label, via the
    * Mann–Whitney rank-sum over the SCORE HISTOGRAM: ranks are
    * tie-averaged and DOUBLED so they stay integral, and the cumulative
    * window runs over distinct scores only — the per-row work is one
    * keyed count, so the corpus can be any size while the window input
    * is bounded by score cardinality (x64's histogram discipline).
    *
    * Output (one row): n1 (positives), n0, `two_u` = 2·(R₁ − n1(n1+1)/2),
    * and `auc_x10000` = div(10⁴·2U, 2·n1·n0) — exact integers; AUC is
    * nonneg so truncating div agrees between engines. Degenerate inputs
    * (no positives or no negatives) yield a null auc_x10000 rather than
    * a misleading number.
    */
  def rankAuc(df: DataFrame, scoreCol: String, posCol: String): DataFrame = {
    val h = df.select(col(scoreCol).cast("long").as("__s"),
        col(posCol).cast("long").as("__p"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("cnt"), sum(col("__p")).as("posc"))
    val w = Window.orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, -1)
    h.withColumn("cumb", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .agg(sum(col("posc")).as("n1"), sum(col("cnt")).as("n"),
        sum(col("posc") * (lit(2) * col("cumb") + col("cnt") + 1))
          .as("two_r1"))
      .select(col("n1"), (col("n") - col("n1")).as("n0"),
        (col("two_r1") - col("n1") * (col("n1") + 1)).as("two_u"),
        when(col("n1") > 0 && col("n") > col("n1"),
          expr("div(10000 * (two_r1 - n1*(n1+1)), 2 * n1 * (n - n1))"))
          .as("auc_x10000"))
  }

  /** Score-decile lift/calibration table — `rankAuc`'s companion report:
    * rows bin into `bins` score quantiles and each bin reports its doc
    * count, positive count, positive rate and lift over the base rate
    * (both ×10⁴, exact integer div). Binning is BY DISTINCT SCORE via
    * the cumulative histogram (`bin = min(bins−1, div(bins·cum_before,
    * n))`), so equal scores always share a bin — the tie-splitting
    * nondeterminism of `ntile` (equal scores straddling a boundary in
    * engine-dependent order) cannot occur, at the price of uneven bin
    * sizes under heavy ties. Windows run over the score histogram only.
    */
  def liftTable(df: DataFrame, scoreCol: String, posCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "liftTable: bins must be >= 2")
    val h = df.select(col(scoreCol).cast("long").as("__s"),
        col(posCol).cast("long").as("__p"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("cnt"), sum(col("__p")).as("posc"))
    val w = Window.orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = h.agg(sum(col("cnt")).as("n"), sum(col("posc")).as("n1"))
    h.withColumn("cumb", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .crossJoin(broadcast(totals))
      .withColumn("bin",
        least(lit(bins - 1), expr(s"div($bins * cumb, n)")).cast("int"))
      .groupBy(col("bin"))
      .agg(sum(col("cnt")).as("docs"), sum(col("posc")).as("positives"),
        first(col("n")).as("__n"), first(col("n1")).as("__n1"))
      .select(col("bin"), col("docs"), col("positives"),
        expr("div(10000 * positives, docs)").as("rate_x10000"),
        when(col("__n1") > 0,
          expr("div(10000 * positives * __n, docs * __n1)"))
          .as("lift_x10000"))
  }

  /** Preference-PAIR construction — the RLHF/DPO data shape: within each
    * candidate group (all responses to one prompt; here any grouping the
    * caller chooses), pick the best- and worst-scored members as the
    * (chosen, rejected) pair and keep pairs whose score margin clears
    * `minMargin` (near-tie pairs teach a preference model noise — the
    * standard margin filter). Deterministic under ties both ways:
    * chosen = highest score then SMALLEST id, rejected = lowest score
    * then smallest id, so replays and engines agree row-for-row.
    *
    * Scale: ONE map-side-combined groupBy over the corpus — `max_by`/
    * `min_by` on (score, id) structs are partial-aggregable, so the
    * shuffle carries one row per group, never the group's members
    * (a window formulation would shuffle the corpus and hold whole
    * groups in the sorter). Groups of one collapse to chosen == rejected
    * and are dropped by the margin/identity filter.
    *
    * Output: (group cols…, chosen_id, rejected_id, chosen_score,
    * rejected_score, margin), margin ≥ minMargin, chosen ≠ rejected.
    */
  def preferencePairs(df: DataFrame, groupCols: Seq[String], idCol: String,
      score: Column, minMargin: Long = 1L): DataFrame = {
    require(groupCols.nonEmpty, "preferencePairs: groupCols must be non-empty")
    // fail loud on non-numeric ids/scores (round-13 advisory, relaxed
    // per the round-14 one): the long casts below turn a non-numeric
    // value into NULL silently, and a null id corrupts the chosen/
    // rejected selection instead of erroring. Numeric columns pass;
    // STRING columns are accepted (numeric text like "123" casts
    // cleanly and real feeds carry it) but guarded VALUE-wise — a
    // string that fails the cast raises in-plan at execution, zero
    // extra jobs. Any other type is rejected at plan time.
    import org.apache.spark.sql.types.{NumericType, StringType}
    def checkedLong(c: Column, dt: org.apache.spark.sql.types.DataType,
        what: String): Column = dt match {
      case _: NumericType => c.cast("long")
      case StringType =>
        // try_cast, not cast: under ANSI the plain cast throws its own
        // (row-context-free) error, without ANSI it NULLs silently —
        // try_cast nulls in BOTH modes, so the guard below owns the
        // failure with the offending value in the message
        val casted = c.try_cast("long")
        when(c.isNotNull && casted.isNull,
          raise_error(concat(lit(s"preferencePairs: $what value '"), c,
            lit("' is not numeric — it would cast to NULL and silently " +
              "corrupt the pair selection"))))
          .otherwise(casted)
      case other => throw new IllegalArgumentException(
        s"preferencePairs: $what must be numeric or numeric text " +
          s"(got ${other.catalogString}) — a non-numeric $what would " +
          "cast to NULL and silently corrupt the pair selection")
    }
    val idCast = checkedLong(col(idCol), df.schema(idCol).dataType,
      s"id column '$idCol'")
    val scoreCast = checkedLong(score,
      df.select(score.as("__s")).schema("__s").dataType, "score")
    df.select(groupCols.map(col) :+ idCast.as("__id")
        :+ scoreCast.as("__s"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        max_by(col("__id"), struct(col("__s"), -col("__id"))).as("chosen_id"),
        max(col("__s")).as("chosen_score"),
        min_by(col("__id"), struct(col("__s"), col("__id"))).as("rejected_id"),
        min(col("__s")).as("rejected_score"))
      .withColumn("margin", col("chosen_score") - col("rejected_score"))
      .filter(col("margin") >= minMargin &&
        col("chosen_id") =!= col("rejected_id"))
  }

  /** First-relevant rank / reciprocal rank per query — the MRR eval of a
    * retrieval run (the metric behind "is the embedding+index stack
    * finding the right documents", complementing x104's recall: recall
    * counts hits anywhere in the top-k, MRR prices WHERE the first hit
    * landed). `topk` is any ranked result table (query_id, rank,
    * neighbor_id); `labels` maps ids to relevance classes; a neighbor is
    * relevant when its class equals the query's. Output per query:
    * (query_id, first_rel_rank — null when no relevant neighbor
    * surfaced, rr_x1m = div(10⁶, first_rel_rank), 0 on a miss). The
    * corpus-level MRR is div(Σ rr_x1m, #queries) — one fold the caller
    * runs; exact integers end to end (reciprocals of small integer
    * ranks — no float mean).
    *
    * Scale: two broadcast joins of the (small) label table against the
    * top-k result (|Q|·k rows), one min-aggregate keyed by query.
    */
  def firstRelevantRank(topk: DataFrame, labels: DataFrame,
      idCol: String, labelCol: String): DataFrame = {
    val lab = labels.select(col(idCol).as("__id"),
      col(labelCol).as("__lab"))
    val qLab = lab.withColumnRenamed("__id", "query_id")
      .withColumnRenamed("__lab", "__qlab")
    val nLab = lab.withColumnRenamed("__id", "neighbor_id")
      .withColumnRenamed("__lab", "__nlab")
    topk.join(broadcast(qLab), Seq("query_id"))
      .join(broadcast(nLab), Seq("neighbor_id"))
      .groupBy("query_id")
      .agg(min(when(col("__qlab") === col("__nlab"), col("rank")))
        .as("first_rel_rank"))
      .withColumn("rr_x1m",
        coalesce(expr("div(1000000, first_rel_rank)"), lit(0L)))
  }

  /** kNN label-vote classification over a retrieval run — the standard
    * "do my embeddings cluster by class" eval: each query's top-k
    * neighbors vote with their class label, majority wins (ties → the
    * smaller label, deterministic), and the prediction is scored
    * against the query's own label. Output per query: (query_id,
    * true_label, predicted_label, votes, correct); corpus accuracy is
    * one avg over `correct` the caller folds. Same join shape as
    * [[firstRelevantRank]]; the vote is a (query, label)-keyed count —
    * map-side combinable, never holds a neighbor list.
    */
  def knnLabelVote(topk: DataFrame, labels: DataFrame, idCol: String,
      labelCol: String): DataFrame = {
    val lab = labels.select(col(idCol).as("__id"),
      col(labelCol).as("__lab"))
    val qLab = lab.withColumnRenamed("__id", "query_id")
      .withColumnRenamed("__lab", "true_label")
    val nLab = lab.withColumnRenamed("__id", "neighbor_id")
      .withColumnRenamed("__lab", "__nlab")
    topk.join(broadcast(qLab), Seq("query_id"))
      .join(broadcast(nLab), Seq("neighbor_id"))
      .groupBy(col("query_id"), col("true_label"), col("__nlab"))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col("query_id"), col("true_label"))
      .agg(
        // tie-break WITHOUT negating the label (round-13 verdict #3):
        // unary minus on a string label silently casts to double → null
        // and the documented "ties → smaller label" determinism is lost.
        // Negate `votes` (always numeric) instead: min over
        // (-votes, label) = max votes, then the SMALLEST label — string
        // labels order lexicographically, exactly the documented contract.
        min_by(col("__nlab"), struct(-col("votes"), col("__nlab")))
          .as("predicted_label"),
        max(col("votes")).as("votes"))
      .withColumn("correct", col("predicted_label") === col("true_label"))
  }
}
