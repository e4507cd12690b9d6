package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §7.5). Pure built-in expressions (zip_with / aggregate — all
  * codegen'd); no UDFs.
  */
object Similarity {

  /** Sequential-fold dot product: aggregate(zip_with(a,b,*), 0.0, +).
    * Left-to-right IEEE order — the DuckDB oracle reproduces it bit-exact
    * with list_reduce(list_prepend(0.0, products), +).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Fused native cosine (graft.functions.CosineSimilarity — one codegen'd
    * loop instead of three interpreted folds). Bit-identical to `cosine`;
    * requires spark.sql.extensions=graft.functions.GraftExtensions.
    */
  def cosineNative(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Two-stage MATRYOSHKA retrieval: coarse candidates from a persisted
    * IVF index built over the first `dims` dimensions of each embedding
    * (the matryoshka serving trick x163 prices — a dims/64 fraction of
    * the index bytes and of the stage-1 dot-product work), then an
    * EXACT full-dimension rerank of only the `candK` candidates per
    * query. This is the standard production ANN shape: the truncated
    * index bounds stage-1 cost; the rerank touches candK · |Q| full
    * vectors, never the corpus. Recall is bounded by stage 1's
    * (x163's measured truncation curve at the index dims, times the
    * x104-style nprobe recall); the rerank ORDERING within the
    * candidate set is exact. Returns (query_id, rank, neighbor_id,
    * cosine) with full-dimension cosines, rank 1..k, ties by neighbor
    * id.
    */
  def truncatedIndexRerank(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, indexPath: String, dims: Int,
      candK: Int, k: Int, nprobe: Int = 2): DataFrame = {
    require(dims >= 1, "truncatedIndexRerank: dims must be >= 1")
    require(candK >= k, "truncatedIndexRerank: candK must be >= k")
    val cand = VectorIndex.probeIvfIndex(
        queries.select(col(idCol),
          slice(col(vecCol).cast("array<double>"), 1, dims).as(vecCol)),
        indexPath, idCol, vecCol, k = candK, nprobe = nprobe)
      .select("query_id", "neighbor_id")
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    // candidates are |Q| × candK — broadcast into the corpus-side join;
    // full vectors are fetched for candidates only
    val scored = broadcast(cand).join(c, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Brute-force cosine top-k: every query against the whole corpus.
    * The exact baseline — O(|Q|·|C|) comparisons. Correct at any scale when
    * |Q| is small (the broadcast side); the corpus side streams.
    * Returns (query_id, rank, neighbor_id, cosine).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      scorer: (Column, Column) => Column = cosine): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), scorer(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Truncated-dimension recall audit — the measurement behind
    * matryoshka-style embedding deployment: serve ANN from a PREFIX of
    * each vector (8/16/32 of 64 dims — index shrinks proportionally)
    * and quantify what the truncation costs against the full-dimension
    * exact top-k. One row per candidate dim: (dim, hits, total,
    * recall_x10000) aggregated across the query set — the table a team
    * reads to pick the serving dimension. Self-certifying like x104's
    * IVF recall: both legs are exact brute force, just at different
    * dims, so the report is deterministic end to end (ties broken by
    * neighbor id).
    *
    * Scale: each leg is the bruteForceTopK shape — queries broadcast,
    * corpus streamed once per dim; the full-dim exact leg is computed
    * ONCE (checkpointed) and joined by every dim's hit count.
    */
  def truncatedDimRecall(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, dims: Seq[Int],
      scorer: (Column, Column) => Column = cosine): DataFrame = {
    require(dims.nonEmpty, "truncatedDimRecall: empty dim list")
    require(dims.forall(_ >= 1), "truncatedDimRecall: dims must be >= 1")
    val spark = queries.sparkSession
    import spark.implicits._
    val exact = bruteForceTopK(queries, corpus, idCol, vecCol, k, scorer)
      .select("query_id", "neighbor_id").localCheckpoint()
    val perDim = dims.map { d =>
      val qd = queries.select(col(idCol),
        slice(col(vecCol), 1, d).as(vecCol))
      val cd = corpus.select(col(idCol),
        slice(col(vecCol), 1, d).as(vecCol))
      bruteForceTopK(qd, cd, idCol, vecCol, k, scorer)
        .select(col("query_id"), col("neighbor_id"), lit(d).as("dim"))
    }.reduce(_ unionByName _)
    val hits = perDim.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy("dim").agg(count(lit(1)).as("hits"))
    val total = exact.agg(count(lit(1)).as("total"))
    dims.toDF("dim")
      .join(hits, Seq("dim"), "left")
      .na.fill(0L, Seq("hits"))
      .crossJoin(broadcast(total))
      .withColumn("recall_x10000", expr("div(10000 * hits, total)"))
      .orderBy("dim")
  }

  /** Hard-negative mining — the contrastive-training data op: for each
    * anchor, the `k` MOST similar corpus vectors that are NOT
    * near-duplicates. The exclusion band matters as much as the
    * ranking: the highest-cosine neighbors of an anchor are usually its
    * crops/paraphrases/exact dups, and training against those as
    * "negatives" teaches the model to separate a pair that should
    * attract (false negatives, the classic contrastive-data bug) — so
    * anything at or above `dupThreshold` is dropped BEFORE the top-k,
    * and what remains is the hardest genuine negative set. Output:
    * (query_id, rank, neighbor_id, cosine), rank 1..k over the kept
    * band, ties broken by neighbor id.
    *
    * Scale: the bruteForceTopK shape — anchors broadcast, corpus
    * streamed; swap the corpus side for an ANN candidate set
    * (lshTopK/ivfTopK with a larger k, then this band filter) when the
    * anchor set itself is corpus-sized.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, dupThreshold: Double,
      scorer: (Column, Column) => Column = cosine): DataFrame = {
    require(k >= 1, "hardNegatives: k must be >= 1")
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        scorer(col("qv"), col("cv")).as("cosine"))
      .filter(col("cosine") < dupThreshold)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Sign-bit LSH bucket over the first `bits` dimensions: bit j set when
    * vec[j] > 0. A deterministic random-hyperplane sketch that needs no
    * stored hyperplanes — the scale path for bucketed ANN and the blocking
    * key for embedding near-dup. (With `bits`=8: 256 buckets; corpus-side
    * shuffle is on the bucket id.)
    */
  def signBucket(vec: Column, bits: Int): Column =
    (0 until bits).map(j =>
      when(element_at(vec, j + 1) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Bucketed ANN: queries only compare against corpus vectors in the same
    * sign-LSH bucket. Recall < 1.0 by construction; the candidate set per
    * query is |corpus| / 2^bits in expectation instead of |corpus|.
    * Returns (query_id, rank, neighbor_id, cosine).
    *
    * `broadcastQueries` (default true) fits the common shape — a small
    * query set probing a huge corpus. When the query side is itself too
    * big to broadcast (batch scoring, corpus-vs-corpus), pass false: the
    * bucket join becomes a plain shuffle equi-join (AQE still broadcasts
    * if the side turns out small), and the per-query top-k runs through
    * the bounded-state TopKDoubleAggregator instead of a row_number
    * window — a window sorts EVERY candidate of a query inside one
    * partition, while the aggregator's state never exceeds k entries and
    * partial-aggregates map-side. Requires a BIGINT id column (the
    * aggregator's key type); the broadcast path takes any id type.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, bits: Int = 8,
      broadcastQueries: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("bucket", signBucket(col("qv"), bits))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
      .withColumn("bucket", signBucket(col("cv"), bits))
    val qSide = if (broadcastQueries) broadcast(q) else q
    val scored = qSide.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cosine"))
    if (broadcastQueries) {
      val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    } else {
      scored
        .groupBy("query_id")
        .agg(graft.functions.TopKAggregator.topKDouble(k)(
          col("neighbor_id"), col("cosine")).as("tk"))
        .select(col("query_id"), posexplode(col("tk")))
        .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
          col("col._1").as("neighbor_id"), col("col._2").as("cosine"))
    }
  }

  /** Fixed-point scale for the k-means centroid mean: 2^20 fractional
    * bits. Scaling by a power of two is EXACT for float-valued doubles
    * (pure exponent shift), so `floor(x * 2^20)` is identical in every
    * engine, and summing the resulting longs is commutative-associative —
    * the mean is independent of partitioning and merge order, unlike a
    * floating-point sum. That is what makes the trained codebook
    * bit-reproducible (and therefore oracle-checkable offline).
    */
  private[operators] val KMeansScale = 1L << 20

  /** The fixed-point centroid mean update shared by [[trainCodebook]] and
    * Quantize.pqTopK's per-subspace trainer: posexplode members into
    * (keys..., pos, x), sum floor(x·2^20) longs per (keys, pos) — exact,
    * merge-order-independent — and reassemble position-sorted centroid
    * arrays per `keys`. `assigned` must carry `keys` plus the member
    * vector in `vecCol`; the last key is the cell id.
    */
  private[operators] def fixedPointCentroids(assigned: DataFrame,
      vecCol: String, keys: Seq[String]): DataFrame = {
    val sums = assigned
      .select(keys.map(col) :+ posexplode(col(vecCol)): _*)
      .groupBy((keys :+ "pos").map(col): _*)
      .agg(sum(floor(col("col") * KMeansScale)).as("s"), count(lit(1)).as("n"))
    sums.groupBy(keys.map(col): _*)
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("s"), col("n")))),
        e => e.getField("s").cast("double") /
          (e.getField("n") * KMeansScale).cast("double")).as("centroid"))
  }

  /** Deterministic Lloyd k-means codebook trainer for IVF.
    *
    * Init: the first `nlist` corpus vectors by id (the same deterministic
    * seed as the sample quantizer). Each iteration: assign every vector to
    * its argmax-cosine centroid (broadcast codebook + map-side max_by — the
    * corpus never shuffles its vectors), then recompute each centroid as
    * the element-wise mean of its members in fixed point (see KMeansScale).
    * Cells that attract no members die (both engines drop them
    * identically). Returns (cid, centroid) — cid is the seed vector's id.
    *
    * Scale: per iteration, one tiny broadcast (nlist × dim), one partial
    * aggregate per (vector), one (cell, pos)-keyed aggregate of longs —
    * all map-side-combinable; nothing grows with |corpus|² and the only
    * shuffled payload is nlist × dim running sums per partition. Train on
    * a TextAnalysis.deterministicSample slice at 100 TB — the trainer is
    * agnostic to what corpus it receives.
    */
  def trainCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iterations: Int): DataFrame = {
    val vecs = corpus.select(col(idCol).as("vid"),
      col(vecCol).cast("array<double>").as("v"))
    var codebook = vecs.orderBy("vid").limit(nlist)
      .select(col("vid").as("cid"), col("v").as("centroid"))
    for (_ <- 1 to iterations) {
      val assigned = vecs.crossJoin(broadcast(codebook))
        .select(col("vid"), col("v"), col("cid"),
          cosine(col("v"), col("centroid")).as("cc"))
        .groupBy("vid")
        .agg(max_by(col("cid"), struct(col("cc"), -col("cid"))).as("cell"),
          first(col("v")).as("v"))
      val next = fixedPointCentroids(assigned, "v", Seq("cell"))
        .withColumnRenamed("cell", "cid")
      // Materialize each iteration: the codebook is nlist × dim doubles, so
      // collect it to a LocalRelation. Without this, `codebook` is a lazy
      // plan that nests one full corpus-scan assignment subtree PER
      // iteration, and every consumer of the trained index re-executes all
      // of them (round-5 verdict item #3). With it, training runs exactly
      // `iterations` corpus passes once, and the returned plan is a literal.
      codebook = corpus.sparkSession.createDataFrame(
        java.util.Arrays.asList(next.collect(): _*), next.schema)
    }
    codebook
  }

  /** IVF (inverted-file) ANN: partition the corpus into `nlist` cells
    * around a small centroid codebook; a query probes only its `nprobe`
    * nearest cells, shrinking candidates to ~|corpus|·nprobe/nlist.
    *
    * The default codebook is the deterministic "sample" quantizer — the
    * first `nlist` corpus vectors by id; pass `trainIterations > 0` to
    * refine it with that many fixed-point Lloyd iterations
    * (`trainCodebook`), which tightens cells around the data's actual
    * clusters and raises recall at the same nprobe. Either way the
    * dataflow (broadcast codebook → max_by cell assignment → cell-key
    * equi-join) is identical, and determinism keeps the operator
    * oracle-checkable.
    *
    * Scale (100 TB): the codebook broadcast is tiny (nlist × dim doubles);
    * cell assignment is one map-side broadcast join + a max_by partial
    * aggregate (no corpus shuffle of vectors beyond the final cell-key
    * join); the candidate join shuffles on cell id, so cells are the unit
    * of parallelism — size nlist ≈ √|corpus| to balance cell width vs
    * probe fan-out.
    *
    * SIZE CONTRACT — `broadcastProbes` (default true) pins the probe side
    * (queries × nprobe rows, each carrying its vector) as the broadcast
    * build: right for the interactive-retrieval shape where the query set
    * is orders smaller than the corpus. A batch-scoring job with a LARGE
    * query set must pass false — the candidate join then degrades to a
    * cell-key shuffle join and the final top-k runs as a map-side-partial
    * TopKAggregator instead of a per-query window (the same pair of
    * shapes `lshTopK` exposes via `broadcastQueries`). Forcing a huge
    * broadcast would OOM the driver/executors silently; the flag makes
    * the trade explicit at the call site. Type note: the false path's
    * TopKAggregator buffers (bigint id, score) pairs, so ids must be
    * integral (the same constraint `lshTopK`'s aggregator path has); the
    * default window path accepts any orderable id type.
    *
    * Zero-norm vectors are DROPPED from both sides before scoring: a
    * zero-norm vector makes every cosine against it NaN, and the two
    * top-k paths order NaN differently (the desc window sorts NaN first,
    * TopKDoubleAggregator sorts it last), so a single such vector could
    * make broadcastProbes=true/false disagree on identical data. Cosine
    * against the zero vector is undefined anyway — dropping is the
    * principled answer, and it guarantees the two paths agree.
    *
    * Returns (query_id, rank, neighbor_id, cosine).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, nlist: Int = 16,
      nprobe: Int = 2, trainIterations: Int = 0,
      broadcastProbes: Boolean = true): DataFrame = {
    // The zero-norm drop must also cover the TRAINING input: a zero-norm
    // seed centroid makes every assignment cosine NaN, and Spark orders
    // NaN above all doubles, so max_by would funnel the whole corpus into
    // the dead cell and collapse the codebook to one live cell.
    val nonZero = corpus.filter(
      exists(col(vecCol).cast("array<double>"), v => v =!= 0.0))
    val c = nonZero.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val codebook =
      if (trainIterations > 0)
        trainCodebook(nonZero, idCol, vecCol, nlist, trainIterations)
      else c.orderBy("neighbor_id").limit(nlist)
        .select(col("neighbor_id").as("cid"), col("cv").as("centroid"))

    // Cell assignment: argmax-cosine centroid per corpus vector (ties →
    // smaller cid). max_by over (cosine, -cid) needs no window shuffle —
    // it partial-aggregates map-side after the broadcast join.
    val assigned = c.crossJoin(broadcast(codebook))
      .select(col("neighbor_id"), col("cv"), col("cid"),
        cosine(col("cv"), col("centroid")).as("cc"))
      .groupBy("neighbor_id")
      .agg(max_by(col("cid"), struct(col("cc"), -col("cid"))).as("cell"),
        first(col("cv")).as("cv"))

    // Queries probe their nprobe nearest cells.
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .filter(exists(col("qv"), v => v =!= 0.0))
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("qc").desc, col("cid"))
    val probes = q.crossJoin(broadcast(codebook))
      .select(col("query_id"), col("qv"), col("cid"),
        cosine(col("qv"), col("centroid")).as("qc"))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid").as("cell"))

    val probeSide = if (broadcastProbes) broadcast(probes) else probes
    val scored = probeSide.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    if (broadcastProbes) {
      val w = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    } else {
      scored.groupBy("query_id")
        .agg(graft.functions.TopKAggregator.topKDouble(k)(
          col("neighbor_id"), col("cosine")).as("tk"))
        .select(col("query_id"), posexplode(col("tk")))
        .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
          col("col._1").as("neighbor_id"), col("col._2").as("cosine"))
    }
  }

  /** Cluster-balanced sampling — the diversity-sampling stage of a
    * curation pipeline: assign every embedding to its argmax-cosine IVF
    * cell (same broadcast-codebook + max_by assignment as `ivfTopK`; pass
    * `trainIterations > 0` for a Lloyd-refined codebook), then keep a
    * deterministic `perCell` quota per cell ranked by the portable 56-bit
    * hash of the id — a "random" slice that is identical on every rerun,
    * partitioning, and engine, but spread across embedding space instead
    * of dominated by the head cluster. Returns (id, cell, cell_rank).
    *
    * Scale: the codebook broadcast is nlist × dim doubles; assignment
    * partial-aggregates map-side (vectors never shuffle); the quota is one
    * (cell)-keyed window whose rank filter pushes down to a
    * WindowGroupLimit — each task keeps at most `perCell` rows per cell
    * before the exchange, so a billion-doc head cluster shuffles `perCell`
    * rows, not a partition-sized sort.
    */
  def clusterBalancedSample(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, perCell: Int, trainIterations: Int = 0): DataFrame = {
    require(idCol != "cell" && idCol != "cell_rank",
      s"clusterBalancedSample: id column '$idCol' collides with a reserved output column")
    val c = corpus.select(col(idCol).as("vid"),
      col(vecCol).cast("array<double>").as("cv"))
    val codebook =
      if (trainIterations > 0)
        trainCodebook(corpus, idCol, vecCol, nlist, trainIterations)
      else c.orderBy("vid").limit(nlist)
        .select(col("vid").as("cid"), col("cv").as("centroid"))
    val assigned = c.crossJoin(broadcast(codebook))
      .select(col("vid"), col("cid"), cosine(col("cv"), col("centroid")).as("cc"))
      .groupBy("vid")
      .agg(max_by(col("cid"), struct(col("cc"), -col("cid"))).as("cell"))
    val w = Window.partitionBy("cell")
      .orderBy(graft.functions.Portable.hash56(col("vid").cast("string")), col("vid"))
    assigned.withColumn("cell_rank", row_number().over(w))
      .filter(col("cell_rank") <= perCell)
      .select(col("vid").as(idCol), col("cell"), col("cell_rank"))
  }
}
