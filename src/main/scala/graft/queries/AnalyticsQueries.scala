package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.QueryDef.tbl

/** Classic analytics shapes over the star schema — beyond the reference's
  * own surface (it performs only anti-join/count; SURVEY.md §2.A "not
  * present" list) but the natural companions for a bronze→silver layer, and
  * the bench headliners for scan/agg/join/window throughput. Money is
  * summed as exact integer cents (floor(x*100+0.5) per row) so oracles
  * hash-match.
  */
object AnalyticsQueries {

  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * 100 + 0.5).cast("long")

  val all: Seq[QueryDef] = Seq(

    // Scan-heavy grouped aggregation (TPC-H Q1 shape): map-side partial
    // aggregation into a 4-group shuffle; projection pruned to 6 columns.
    QueryDef("b01_agg_lineitem",
      (s, d) => tbl(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("cnt"),
          sum(cents(col("l_quantity"))).as("sum_qty_cents"),
          sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price_cents"))
        .orderBy("l_returnflag", "l_linestatus"),
      // sum(BIGINT) is HUGEINT in DuckDB — cast back so the dtype-sensitive
      // hash gate sees int64 on both sides (r1: hash_match=false, values equal).
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
             |  sum((floor(l_quantity*100 + 0.5))::BIGINT)::BIGINT AS sum_qty_cents,
             |  sum((floor(l_extendedprice*100 + 0.5))::BIGINT)::BIGINT AS sum_price_cents,
             |  sum((floor(l_extendedprice*(1 - l_discount)*100 + 0.5))::BIGINT)::BIGINT AS sum_disc_price_cents
             |FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Star join: fact orders ⋈ customer ⋈ nation with the dimension sides
    // broadcast — zero shuffle for the joins, one for the final group.
    QueryDef("b02_join_star",
      (s, d) => tbl(s, d, "orders")
        .join(broadcast(tbl(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(tbl(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("orders"), sum(cents(col("o_totalprice"))).as("revenue_cents"))
        .orderBy("n_name"),
      Some("""SELECT n_name, count(*) AS orders,
             |  sum((floor(o_totalprice*100 + 0.5))::BIGINT)::BIGINT AS revenue_cents
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY 1 ORDER BY n_name""".stripMargin)),

    // Window top-k: top-3 orders per customer by price (single shuffle on
    // the partition key, rank pushdown via WindowGroupLimit).
    QueryDef("b03_window_topk",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        tbl(s, d, "orders")
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("o_custkey"), col("rank"), col("o_orderkey"),
            cents(col("o_totalprice")).as("price_cents"))
          .orderBy("o_custkey", "rank")
      },
      Some("""SELECT o_custkey, rank, o_orderkey, price_cents FROM (
             |  SELECT o_custkey, o_orderkey,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rank,
             |    (floor(o_totalprice*100 + 0.5))::BIGINT AS price_cents
             |  FROM orders)
             |WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin)),

    // Multi-way aggregation over the event stream table (batch view).
    QueryDef("b04_events_by_type",
      (s, d) => QueryDef.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("events"),
          countDistinct(col("user_id")).as("users"),
          sum(floor(col("value") * 100 + 0.5).cast("long")).as("sum_cents"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS events, count(DISTINCT user_id) AS users,
             |  sum((floor(value*100 + 0.5))::BIGINT)::BIGINT AS sum_cents
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin))
  )
}
