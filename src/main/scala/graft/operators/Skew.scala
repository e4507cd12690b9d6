package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins (100 TB guardrail). When one join key
  * carries a disproportionate share of the fact rows, the single reducer
  * owning that key becomes the job's critical path. Salting shards the hot
  * key: fact rows get a deterministic salt in [0, S), the (smaller) build
  * side is replicated S times, and the join key becomes (key, salt) — the
  * hot key's rows spread over S reducers. The result set is IDENTICAL to
  * the unsalted join, which is exactly what the oracle checks.
  *
  * When to reach for it: both sides too large to broadcast AND key skew
  * beyond what AQE's skew-join splitting handles (AQE splits oversized
  * partitions of a shuffle join, but a single giant KEY cannot be split
  * without salting). For broadcast-able dims, `broadcast()` already
  * sidesteps skew entirely.
  */
object Skew {

  /** Salted inner equi-join of `fact` with `dim` on `factKey = dimKey`.
    *
    * @param saltSource fact-side expression providing per-row entropy for
    *                   the salt (e.g. the fact's unique id); deterministic,
    *                   so re-runs produce identical partitioning
    * @param salt       shard fan-out S — the hot key spreads over S reducers;
    *                   dim-side rows replicate ×S (keep S modest, 8-32)
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltSource: Column, salt: Int): DataFrame = {
    require(salt > 0, "salt fan-out must be positive")
    val saltedFact = fact.withColumn("__salt", pmod(hash(saltSource), lit(salt)))
    val repDim = dim
      .withColumn("__salt", explode(array((0 until salt).map(lit(_)): _*)))
      .withColumnRenamed(dimKey, factKey)
    saltedFact.join(repDim, Seq(factKey, "__salt")).drop("__salt")
  }
}
