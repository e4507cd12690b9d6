package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization — symmetric per-vector int8 scalar quantization,
  * the standard 4× compression applied before a 100 TB embedding corpus is
  * indexed (FAISS SQ8, ScaNN's fixed-point leaves): per vector,
  * `scale = 127 / max|v_i|` and `q_i = floor(v_i·scale + 0.5)` ∈
  * [-127, 127]. Map-only projection over codegen'd array expressions — no
  * shuffle, no UDF; linear at any corpus size and trivially chained in
  * front of the ANN operators (Similarity.*) to shrink their shuffle and
  * state 4×.
  *
  * Determinism: |v_i| and max are computed in FLOAT (exact), widened to
  * double (exact), and the divide / multiply / floor(x+0.5) sequence is
  * bit-identical IEEE-754 double arithmetic in any engine — the DuckDB
  * oracle reproduces q_i exactly. floor(x+0.5) is used instead of round()
  * because engines disagree on round-half semantics; the +0.5-floor trick
  * is the same one every *_cents oracle query uses. All-zero vectors get
  * scale = 0 and an all-zero q (guarded division).
  */
object Quantize {

  /** Adds `scale` (double) and `q` (array<int>) columns; original columns
    * pass through. `embCol` must be an array of float/double. `scale` and
    * `q` are RESERVED output names — a caller column with either name
    * would be silently clobbered by withColumn, so their presence is an
    * error (rename upstream); the internal temp uses a graft-prefixed name
    * for the same reason.
    */
  def int8(df: DataFrame, embCol: String): DataFrame = {
    val clash = Seq("scale", "q").filter(df.columns.contains)
    require(clash.isEmpty,
      s"Quantize.int8: input already has reserved output column(s) ${clash.mkString(", ")} — rename them upstream")
    df.withColumn("__graft_q_maxabs",
        expr(s"cast(array_max(transform(`$embCol`, x -> abs(x))) as double)"))
      .withColumn("scale",
        when(col("__graft_q_maxabs") > 0, lit(127.0) / col("__graft_q_maxabs")).otherwise(lit(0.0)))
      .withColumn("q",
        expr(s"transform(`$embCol`, x -> cast(floor(cast(x as double) * scale + 0.5d) as int))"))
      .drop("__graft_q_maxabs")
  }

  /** Quantized-dot-product top-k: brute-force ANN over the int8 codes —
    * the compressed-domain scorer (ScaNN/FAISS-SQ shape: score in the
    * quantized space, never dequantize). The integer dot is EXACT
    * arithmetic, so unlike float cosine the result is bit-reproducible on
    * any engine — and the corpus side streams 4× less data than the float
    * path. Queries broadcast (small side); ranking is dot desc with
    * neighbor-id tie-break. Note the metric: raw quantized dot product —
    * callers wanting cosine-faithful ranking normalize vectors upstream
    * (then per-vector scales are ~equal and dot order tracks cosine
    * order).
    */
  def dotTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      embCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = int8(queries, embCol).select(col(idCol).as("query_id"), col("q").as("qq"))
    val c = int8(corpus, embCol).select(col(idCol).as("neighbor_id"), col("q").as("cq"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        expr("aggregate(zip_with(qq, cq, (a, b) -> cast(a as bigint) * b), 0L, (acc, x) -> acc + x)")
          .as("qdot"))
    val w = Window.partitionBy("query_id").orderBy(col("qdot").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "qdot")
  }

  /** Exact integer dot product over two int arrays (long accumulator —
    * 127² × dim never overflows).
    */
  private def idot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y), lit(0L),
      (acc, v) => acc + v)

  /** IVF over int8 codes — the FAISS IVF-SQ composition: coarse cells and
    * in-cell scoring both run on the quantized codes, so the float vectors
    * never leave the map side and every shuffled payload is 4× smaller
    * than the float IVF path (Similarity.ivfTopK). Cell seeds are the
    * first `nlist` corpus codes by id (the same deterministic quantizer as
    * the float path); assignment is argmax integer dot (ties → smaller
    * cid) via broadcast codebook + map-side max_by — the corpus shuffles
    * once, on its cell key. Scoring inside the probed cells is the exact
    * integer dot, so the whole operator is bit-reproducible and carries a
    * full hash oracle (nothing to freeze). Returns
    * (query_id, rank, neighbor_id, qdot).
    *
    * SIZE CONTRACT — `broadcastProbes` mirrors `Similarity.ivfTopK`:
    * default true pins the (queries × nprobe) probe side as the broadcast
    * build, which a batch-scoring job with a large query set must turn
    * off — the candidate join then shuffles on the cell key and the
    * top-k runs as a map-side-partial TopKAggregator (which buffers
    * bigint ids — integral id columns only on that path).
    */
  def ivfDotTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      embCol: String, k: Int, nlist: Int = 16, nprobe: Int = 2,
      broadcastProbes: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = int8(corpus, embCol).select(col(idCol).as("neighbor_id"), col("q").as("cq"))
    val codebook = c.orderBy("neighbor_id").limit(nlist)
      .select(col("neighbor_id").as("cid"), col("cq").as("ccode"))
    val assigned = c.crossJoin(broadcast(codebook))
      .select(col("neighbor_id"), col("cq"), col("cid"),
        idot(col("cq"), col("ccode")).as("cc"))
      .groupBy("neighbor_id")
      .agg(max_by(col("cid"), struct(col("cc"), -col("cid"))).as("cell"),
        first(col("cq")).as("cq"))
    val q = int8(queries, embCol).select(col(idCol).as("query_id"), col("q").as("qq"))
    val probeW = Window.partitionBy("query_id").orderBy(col("qc").desc, col("cid"))
    val probes = q.crossJoin(broadcast(codebook))
      .select(col("query_id"), col("qq"), col("cid"),
        idot(col("qq"), col("ccode")).as("qc"))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qq"), col("cid").as("cell"))
    val probeSide = if (broadcastProbes) broadcast(probes) else probes
    val scored = probeSide.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        idot(col("qq"), col("cq")).as("qdot"))
    if (broadcastProbes) {
      val w = Window.partitionBy("query_id")
        .orderBy(col("qdot").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "qdot")
    } else {
      scored.groupBy("query_id")
        .agg(graft.functions.TopKAggregator.topK(k)(
          col("neighbor_id"), col("qdot")).as("tk"))
        .select(col("query_id"), posexplode(col("tk")))
        .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
          col("col._1").as("neighbor_id"), col("col._2").as("qdot"))
    }
  }

  private val PqScale = 1L << 20

  /** Exact double L2 between two equal-length arrays — sequential
    * index-order fold, bit-identical in any engine.
    */
  private def l2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0),
      (acc, v) => acc + v)

  /** Product-quantization ANN (the FAISS PQ/ADC composition): split each
    * `dim`-vector into `subspaces` contiguous subvectors, learn an
    * independent `codebookSize`-centroid codebook per subspace (Lloyd
    * iterations from a deterministic seed — the first `codebookSize`
    * corpus vectors by id — with argmin-L2 assignment, ties to the
    * smaller centroid id, and fixed-point means exactly like
    * `Similarity.trainCodebook`), encode every corpus vector as
    * `subspaces` centroid ids (the PQ code: log2(codebookSize) bits per
    * subspace — 64-dim floats compress 256→8 bytes at 8×8), and answer
    * queries by ASYMMETRIC DISTANCE COMPUTATION: the query precomputes a
    * (subspace × centroid) dot-product lookup table and every corpus
    * code is scored as the sum of `subspaces` table lookups — no float
    * vector is ever touched at scoring time.
    *
    * Determinism/oracle contract: per-subspace partial dots are floored
    * into 2^20 fixed point BEFORE the cross-subspace sum, so the ADC
    * score (`adc_fp`) is an exact integer — summation order cannot
    * drift between engines.
    *
    * Scale: codebooks are subspaces × codebookSize × (dim/subspaces)
    * doubles — broadcast-size by construction; training and encoding are
    * broadcast joins + one keyed aggregate each; the LUT is queries ×
    * subspaces × codebookSize rows (broadcast). Scoring shuffles
    * (query × corpus) pairs with map-side partial aggregation over the
    * subspace partials — the standard flat-ADC scan; at 100 TB compose
    * with IVF cell pruning in front (ivfDotTopK's shape) so only probed
    * cells are scored.
    *
    * Returns (query_id, rank, neighbor_id, adc_fp).
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      embCol: String, k: Int, dim: Int, subspaces: Int = 8,
      codebookSize: Int = 8, trainIterations: Int = 1): DataFrame = {
    require(subspaces >= 1 && dim % subspaces == 0,
      "pqTopK: dim must divide evenly into subspaces")
    require(codebookSize >= 1 && k >= 1 && trainIterations >= 0,
      "pqTopK: bad parameters")
    val sd = dim / subspaces
    def subs(df: DataFrame, id: String, out: String): DataFrame =
      df.select(col(idCol).as(id), col(embCol).cast("array<double>").as("__v"))
        .select(col(id), explode(expr(
          s"transform(sequence(0, ${subspaces - 1}), s -> " +
            s"struct(s AS sub, slice(__v, s * $sd + 1, $sd) AS sv))")).as("e"))
        .select(col(id), col("e.sub").as("sub"), col("e.sv").as(out))
    val csubs = subs(corpus, "vid", "sv")
    val seedIds = corpus.select(col(idCol).as("__sid"))
      .orderBy("__sid").limit(codebookSize)
    var codebook = subs(
        corpus.join(seedIds, col(idCol) === col("__sid")).drop("__sid"),
        "cid", "centroid")
      .select(col("sub"), col("cid"), col("centroid"))
    def assign(v: DataFrame): DataFrame = v
      .join(broadcast(codebook), Seq("sub"))
      .select(col("vid"), col("sub"), col("sv"), col("cid"),
        l2(col("sv"), col("centroid")).as("d2"))
      .groupBy("vid", "sub")
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cell"),
        first(col("sv")).as("sv"))
    for (_ <- 1 to trainIterations) {
      // the subtle fixed-point mean lives in ONE place —
      // Similarity.fixedPointCentroids (same 2^20 scale, extra sub key)
      val next = Similarity.fixedPointCentroids(assign(csubs), "sv",
          Seq("sub", "cell"))
        .withColumnRenamed("cell", "cid")
      // materialize per iteration — same rationale as trainCodebook: the
      // codebook is subspaces × codebookSize × sd doubles, and a lazy
      // plan would nest one corpus pass per iteration into every consumer
      codebook = corpus.sparkSession.createDataFrame(
        java.util.Arrays.asList(next.collect(): _*), next.schema)
    }
    val enc = assign(csubs).select(col("vid"), col("sub"), col("cell").as("cid"))
    val lut = subs(queries, "qid", "qv")
      .join(broadcast(codebook), Seq("sub"))
      .select(col("qid"), col("sub"), col("cid"),
        floor(Similarity.dot(col("qv"), col("centroid")) * PqScale)
          .cast("long").as("partial_fp"))
    val scored = enc.join(broadcast(lut), Seq("sub", "cid"))
      .filter(col("qid") =!= col("vid"))
      .groupBy(col("qid").as("query_id"), col("vid").as("neighbor_id"))
      .agg(sum("partial_fp").as("adc_fp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adc_fp").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "adc_fp")
  }
}
