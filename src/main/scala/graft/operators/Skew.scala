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

  /** Hot-key diagnostics — the measurement that DECIDES when saltedJoin
    * (or a bigger AQE skew threshold) is worth it: per-key row counts for
    * the heaviest `topK` keys, each with its corpus share
    * (`pct_x10000` = div(10⁴·count, total)) and its skew factor
    * (`skew_x100` = div(100·count·partitions, total) — how many times one
    * average reducer's load this single key is at the given shuffle
    * fan-out; ≥ 100 means the key alone overflows a reducer and a plain
    * keyed shuffle will hot-spot no matter how many partitions you add).
    *
    * Scale: one keyed count with map-side partials, a TakeOrdered top-k
    * cut (count desc, key asc — deterministic), and a one-row total
    * broadcast back. Never sorts the full key-frequency table.
    */
  def hotKeys(df: DataFrame, keyCol: String, topK: Int,
      partitions: Int): DataFrame = {
    require(topK > 0, "hotKeys: topK must be positive")
    require(partitions > 0, "hotKeys: partitions must be positive")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    counts.orderBy(col("cnt").desc, col("key")).limit(topK)
      .crossJoin(broadcast(total))
      .select(col("key"), col("cnt"),
        expr("div(10000 * cnt, total)").as("pct_x10000"),
        expr(s"div(100 * cnt * $partitions, total)").as("skew_x100"))
  }
}
