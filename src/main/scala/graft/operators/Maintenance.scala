package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The maintenance EXECUTOR (round-13 verdict #4) — what closes the
  * artifact-ops loop as one call: `ArtifactStore.census` measures,
  * `ArtifactStore.maintenanceAdvice` decides, and this dispatches each
  * advice row to the store's own maintenance operation:
  *
  *  - `repair`    → `ArtifactStore.repairStore` (family-agnostic — the
  *                  crash protocol is shared store discipline)
  *  - `compact`   → the FAMILY's compactor, dispatched on the root's
  *                  substore shape: an IVF index (`vectors` +
  *                  `centroids`) folds via `VectorIndex.compactIvfIndex`
  *                  (layout- and sidecar-preserving), an LSH index
  *                  (`features` + `buckets`) via `Dedup.compactLshIndex`,
  *                  a histogram artifact (`shards` + `absorbed`) via
  *                  `Profile.compactHistogram`
  *  - `rebalance` → the family's re-partitioner: a bucketed labels
  *                  store (`num_buckets` meta) via `Dedup
  *                  .rebalanceLabels` at N = ceil(bytes / target), an
  *                  LSH index via `Dedup.rebalanceLshIndex` (auto-sized)
  *  - `retrain`   → the IVF family's geometry maintenance (round-14
  *                  verdict #2): `VectorIndex.retrainIvfIndex` — its
  *                  cells are codebook-derived, so drift is fixed by
  *                  retraining the quantizer, never by re-hashing
  *  - `ok`        → nothing.
  *
  * An advice row whose action has no registered operation for the
  * root's shape is SURFACED (`executed = false`, detail says why) —
  * never silently dropped: the advisor told the operator to act, and an
  * executor that can't must say so. `dryRun = true` plans everything
  * and executes nothing — the "what would tonight's window do" report.
  *
  * The advice rows are takedown-fleet-sized (one per artifact), so the
  * driver-side dispatch loop is not a scale term; each dispatched
  * operation is the family's own batch-bounded/amortized maintenance
  * primitive. Returns (artifact, action, executed, detail), ordered by
  * artifact.
  */
object Maintenance {

  def executeMaintenance(spark: SparkSession,
      artifacts: Seq[(String, String)], debtX10000: Long = 1000L,
      dryRun: Boolean = false): DataFrame = {
    import spark.implicits._
    // a duplicate alias would silently keep only the LAST root in the
    // dispatch map while the census/advice rows keep both — one store's
    // advice would then run against the other's root (round-14 verdict
    // #5): refuse loud
    val dup = artifacts.groupBy(_._1).collect {
      case (a, rs) if rs.size > 1 => a
    }
    require(dup.isEmpty, "executeMaintenance: duplicate artifact " +
      s"alias(es) ${dup.mkString(", ")} — aliases must be distinct or " +
      "advice would mis-route to the wrong root")
    val advice = ArtifactStore.maintenanceAdvice(
      ArtifactStore.census(spark, artifacts), debtX10000)
    val rootOf = artifacts.toMap
    val out = advice.select("artifact", "action").collect().map { r =>
      val alias = r.getString(0)
      val action = r.getString(1)
      val root = rootOf(alias)
      val (executed, detail) = action match {
        case _ if dryRun && action != "ok" => (false, "dry-run")
        case "ok" => (false, "clean")
        case "repair" =>
          ArtifactStore.repairStore(spark, root)
          (true, "repairStore")
        case "compact" => compactFor(spark, root)
        case "rebalance" => rebalanceFor(spark, root)
        case "retrain" => retrainFor(spark, root)
        case other => (false, s"unknown action '$other'")
      }
      (alias, action, executed, detail)
    }
    out.toSeq.toDF("artifact", "action", "executed", "detail")
      .orderBy("artifact")
  }

  private def has(spark: SparkSession, root: String, sub: String) =
    ArtifactStore.exists(spark, s"$root/$sub")

  private def compactFor(spark: SparkSession,
      root: String): (Boolean, String) =
    if (has(spark, root, "vectors") && has(spark, root, "centroids")) {
      VectorIndex.compactIvfIndex(spark, root); (true, "compactIvfIndex")
    } else if (has(spark, root, "features") && has(spark, root, "buckets")) {
      Dedup.compactLshIndex(spark, root); (true, "compactLshIndex")
    } else if (has(spark, root, "shards") && has(spark, root, "absorbed")) {
      Profile.compactHistogram(spark, root); (true, "compactHistogram")
    } else
      (false, "no compactor for this store shape — fold manually")

  private def rebalanceFor(spark: SparkSession,
      root: String): (Boolean, String) = {
    val meta = ArtifactStore.cachedMeta(spark, root)
    val isLabels = meta.exists(_.schema.fieldNames.contains("num_buckets"))
    if (isLabels) {
      val n = meta.get.getAs[Int]("num_buckets")
      val target = meta.get.getAs[Long]("bucket_target_bytes")
      val total = ArtifactStore.bucketDirBytes(spark, root, "b").sum
      val newN =
        if (target > 0L)
          math.max(n + 1, math.ceil(total.toDouble / target).toInt)
        else n + 1
      Dedup.rebalanceLabels(spark, root, newN)
      (true, s"rebalanceLabels(n=$newN)")
    } else if (has(spark, root, "features") && has(spark, root, "buckets")) {
      Dedup.rebalanceLshIndex(spark, root)
      (true, "rebalanceLshIndex")
    } else
      (false, "no rebalancer for this store shape")
  }

  private def retrainFor(spark: SparkSession,
      root: String): (Boolean, String) =
    if (has(spark, root, "vectors") && has(spark, root, "centroids")) {
      VectorIndex.retrainIvfIndex(spark, root)
      (true, "retrainIvfIndex")
    } else
      (false, "no retrainer for this store shape")
}
