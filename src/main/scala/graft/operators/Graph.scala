package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-analysis operators over edge-list DataFrames. The iterative
  * join-agg shape here is the Pregel pattern expressed in plain relational
  * operators: ranks live in a (node, rank) table, each superstep is one
  * equi-join with the edge list plus one keyed aggregate, and the loop is
  * driver-side over lazy plans with an explicit materialization barrier per
  * step (same discipline as Similarity.trainCodebook and
  * Dedup.canonicalize — never `iterations` nested corpus scans).
  */
object Graph {

  /** Fixed-point PageRank: `iterations` supersteps of
    *   r₀(v)    = div(S, n)
    *   rₜ₊₁(v) = base + div(d · Σ_{(u,v)∈E} div(rₜ(u), outdeg(u)), 100)
    *   base     = div((100 − d) · div(S, n), 100)
    * with damping `d` = dampingX100 (×100) and rank mass scaled by
    * S = 10¹² so integral division keeps ~12 significant digits. All
    * arithmetic is exact 64-bit integer (S·100 < 2⁶³), so results are
    * bit-identical across engines and partitionings. Mass that flows out
    * of dangling nodes (no out-edges) is dropped, the common simplified
    * formulation; ranks are a centrality ORDERING, not a probability.
    *
    * Input is an edge list; self-loops and duplicate edges are removed.
    * Output: (node, outdeg, rank_x1e12) for every node appearing as a
    * source or destination.
    *
    * Scale (100 TB): each superstep shuffles the edge list once on src
    * (join with ranks) and once on dst (contribution aggregate) — the
    * canonical edge-partitioned PR dataflow; rank state is one slim
    * (node, long) table localCheckpoint'ed per step so the final plan
    * embeds NO nested per-iteration subtrees, and lineage stays O(1).
    * Edge dedup is one up-front shuffle reused by the outdeg aggregate.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, dampingX100: Int = 85): DataFrame = {
    require(iterations >= 1, "pageRank: iterations must be >= 1")
    require(dampingX100 >= 0 && dampingX100 <= 100,
      "pageRank: dampingX100 must be in [0, 100]")
    val S = 1000000000000L

    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    val n = nodes.count()
    require(n > 0,
      "pageRank: edge list has no non-self-loop edges — nothing to rank")
    val r0 = S / n
    val base = (100L - dampingX100) * r0 / 100L

    var ranks = nodes.select(col("node"), lit(r0).as("rank"))
    var superseded: Option[DataFrame] = None
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(ranks.join(outdeg, Seq("node")).withColumnRenamed("node", "src"),
          Seq("src"))
        .select(col("dst").as("node"), expr("div(rank, outdeg)").as("c"))
        .groupBy("node").agg(sum(col("c")).as("contrib"))
      val next = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(
            expr(s"div($dampingX100 * contrib, 100)"), lit(0L))).as("rank"))
        .localCheckpoint(true)
      // Drop the superseded rank snapshot: only the newest checkpoint is
      // ever read again, and without the unpersist a k-iteration run pins
      // k rank tables in the block manager — at graph scale that evicts
      // the edge cache and the supersteps start re-shuffling from scratch.
      superseded.foreach(_.unpersist())
      superseded = Some(next)
      ranks = next
    }
    nodes.join(outdeg, Seq("node"), "left")
      .na.fill(0L, Seq("outdeg"))
      .join(ranks, Seq("node"))
      .select(col("node"), col("outdeg"), col("rank").as("rank_x1e12"))
  }

  /** Personalized PageRank — the seed-set expansion primitive: teleport
    * mass returns only to `seeds`, so rank measures proximity TO THE SEED
    * SET through the link structure ("find everything related to these
    * documents/users"). Same fixed-point arithmetic and superstep
    * dataflow as [[pageRank]]; the only change is the base term —
    * div((100−d)·div(S, |seeds|), 100) for seeds, 0 elsewhere — and the
    * r₀ vector (seeds start with div(S, |seeds|), everything else 0).
    * Non-seed nodes with no inbound path keep rank 0: the expansion
    * frontier is exactly the reachable set.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, iterations: Int = 3, dampingX100: Int = 85): DataFrame = {
    require(iterations >= 1, "personalizedPageRank: iterations must be >= 1")
    require(dampingX100 >= 0 && dampingX100 <= 100,
      "personalizedPageRank: dampingX100 must be in [0, 100]")
    val S = 1000000000000L

    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    val seedSet = seeds.select(col(seeds.columns.head).as("node")).distinct()
      .join(nodes, Seq("node"))
      .withColumn("__seed", lit(true))
      .localCheckpoint(true)
    val nSeeds = seedSet.count()
    require(nSeeds > 0,
      "personalizedPageRank: no seed appears in the edge list's node set")
    val r0 = S / nSeeds
    val base = (100L - dampingX100) * r0 / 100L

    def withSeedBase(contrib: DataFrame, seedVal: Long): DataFrame = nodes
      .join(contrib, Seq("node"), "left")
      .join(seedSet, Seq("node"), "left")
      .select(col("node"),
        (when(col("__seed"), seedVal).otherwise(0L) + coalesce(
          expr(s"div($dampingX100 * contrib, 100)"), lit(0L))).as("rank"))

    var ranks = nodes.join(seedSet, Seq("node"), "left")
      .select(col("node"), when(col("__seed"), r0).otherwise(0L).as("rank"))
    var superseded: Option[DataFrame] = None
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(ranks.join(outdeg, Seq("node")).withColumnRenamed("node", "src"),
          Seq("src"))
        .select(col("dst").as("node"), expr("div(rank, outdeg)").as("c"))
        .groupBy("node").agg(sum(col("c")).as("contrib"))
      val next = withSeedBase(contrib, base).localCheckpoint(true)
      superseded.foreach(_.unpersist())
      superseded = Some(next)
      ranks = next
    }
    nodes.join(ranks, Seq("node"))
      .select(col("node"), col("rank").as("rank_x1e12"))
  }

  /** Bipartite co-engagement projection — the "users who touched the same
    * item" edge list behind co-click embeddings and collaborative
    * filtering: distinct (user, item) incidence, items above
    * `maxUsersPerItem` distinct users DROPPED (the standard popularity
    * guard — a head item connects everyone to everyone, c²/2 pairs of
    * pure noise, exactly the LSH bucket-flood shape maxBucket caps), then
    * the per-item self-join and a pair count, cut to the strongest `topK`
    * edges (shared_items desc, then (u1, u2) asc — deterministic).
    *
    * Scale: the quadratic step is bounded by construction — each
    * surviving item contributes ≤ maxUsersPerItem²/2 pairs — and the cut
    * is TakeOrdered, never a full sort. The guard is a cliff, not a cap:
    * size it from a candidate-pair count (Σ c(c−1)/2 over c ≤ max), the
    * x125 lesson.
    */
  def coEngagement(df: DataFrame, userCol: String, itemCol: String,
      maxUsersPerItem: Int, topK: Int): DataFrame = {
    require(maxUsersPerItem > 1, "coEngagement: maxUsersPerItem must be > 1")
    require(topK > 0, "coEngagement: topK must be > 0")
    val e = df.select(col(userCol).cast("long").as("u"),
        col(itemCol).cast("long").as("item"))
      .filter(col("u").isNotNull && col("item").isNotNull)
      .distinct()
    val kept = e.groupBy(col("item"))
      .agg(count(lit(1)).as("cu"))
      .filter(col("cu") <= maxUsersPerItem)
      .select("item")
    val g = e.join(kept, Seq("item"))
    val pairs = g.select(col("item"), col("u").as("u1"))
      .join(g.select(col("item"), col("u").as("u2")), Seq("item"))
      .filter(col("u1") < col("u2"))
    pairs.groupBy(col("u1"), col("u2"))
      .agg(count(lit(1)).as("shared_items"))
      .orderBy(col("shared_items").desc, col("u1"), col("u2"))
      .limit(topK)
  }
}
