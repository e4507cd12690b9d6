package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Portable._

/** Sparse lexical retrieval — BM25 ranking over the corpus, the scoring
  * half of the "retrieve → filter/rerank" loop a training-data pipeline
  * runs for targeted corpus queries (find all docs about X, score relevance
  * against a seed query, data-selection-by-retrieval a la DSIR).
  *
  * All arithmetic is fixed-point integer so results are bit-exact across
  * engines (same discipline as Curation.distinctiveTerms): k1 and b arrive
  * ×100, the idf is Robertson's (N − df + ½)/(df + ½) kept as an exact
  * rational (×2 to clear the halves) rather than its log — monotone in df,
  * so ranking order is preserved — and every division is integral `div`
  * with documented floor points.
  */
object Retrieval {

  /** BM25 scores for `queryTerms` against every matching document.
    *
    * Output: (doc, matched_terms, dl, score_x1e3) — one row per document
    * containing at least one query term; `score_x1e3` = Σ over matched
    * terms of div(idf_x1e3 · tfc_x1e6, 10⁶) where
    *   idf_x1e6 = div(10⁶·(2N − 2df + 1), 2df + 1); idf_x1e3 = div(idf_x1e6, 10³)
    *   tfc_x1e6 = div(10⁶·tf·(k1x100+100)·100·avgdl_x100, D)
    *   D        = avgdl_x100·(10⁴·tf + k1x100·(100 − bx100)) + k1x100·bx100·100·dl
    *   avgdl_x100 = div(100·Σdl, N)
    * The tfc numerator/denominator and the idf·tfc product are evaluated
    * in decimal(38,0) — int64 would overflow the tfc numerator once
    * tf·avgdl_x100 > ~4·10⁸ (e.g. tf ~ 10⁴ against a 500-token-average
    * corpus), well inside real-corpus range. Decimal keeps every
    * intermediate exact while it stays under 10³⁸, which holds for any
    * physical corpus (the largest term, 2.2·10¹⁰·tf·avgdl_x100, needs
    * tf·avgdl ~ 10²⁶ to break — a yottabyte-class document). Remaining
    * int64 terms are linear in N and Σdl and safe to Σdl ≤ 9·10¹⁶ tokens
    * (~400× a 100 TB text corpus).
    *
    * Scale (100 TB): the term filter runs map-side BEFORE the postings
    * shuffle — only tokens matching the (tiny, literal) query set leave the
    * scan stage, so the (doc, term) aggregate moves ~|postings of the query
    * terms|, never the corpus token stream. The df table is ≤ |queryTerms|
    * rows and the corpus stats are one row; both join back as broadcasts.
    * Net: one slim shuffle + two scalar-ish aggregates, zero corpus-wide
    * wide exchanges.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1X100: Int = 120, bX100: Int = 75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: queryTerms must be non-empty")
    require(k1X100 >= 0, "bm25: k1X100 must be >= 0")
    require(bX100 >= 0 && bX100 <= 100, "bm25: bX100 must be in [0, 100]")
    val reserved = Seq("doc", "dl", "term", "tf", "df", "n_docs", "avgdl_x100")
    val clash = docs.columns.filter(c => reserved.contains(c) && c != idCol)
    require(clash.isEmpty,
      s"bm25: input already has reserved column(s) ${clash.mkString(", ")} — rename them upstream")
    val terms = queryTerms.map(_.toLowerCase).distinct

    val tok = docs.select(col(idCol).as("doc"), tokens(col(textCol)).as("__toks"))
      .select(col("doc"), size(col("__toks")).cast("long").as("dl"), col("__toks"))
    val stats = tok.agg(count(lit(1)).as("n_docs"),
      expr("div(100 * sum(dl), count(1))").as("avgdl_x100"))
    val post = tok
      .select(col("doc"), col("dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val dfTable = post.groupBy("term").agg(count(lit(1)).as("df"))

    post.join(broadcast(dfTable), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_x1e3", expr(
        "div(div(1000000 * (2 * n_docs - 2 * df + 1), 2 * df + 1), 1000)"))
      .withColumn("tfc_x1e6", expr(
        s"div(cast(1000000 as decimal(38,0)) * tf * ${k1X100 + 100} * 100 * avgdl_x100, " +
          s"cast(avgdl_x100 as decimal(38,0)) * (10000 * tf + $k1X100 * ${100 - bX100}) + " +
          s"cast($k1X100 as decimal(38,0)) * $bX100 * 100 * dl)"))
      .groupBy("doc")
      .agg(count(lit(1)).as("matched_terms"), first(col("dl")).as("dl"),
        sum(expr("div(cast(idf_x1e3 as decimal(38,0)) * tfc_x1e6, 1000000)"))
          .as("score_x1e3"))
  }

  /** Reciprocal-rank fusion — the standard hybrid-search combiner: each
    * ranked list contributes div(10⁶, kRrf + rank) per document, summed
    * across systems (Cormack et al.'s RRF, fixed-point). Rank-based, so
    * it fuses incomparable score scales (BM25 vs cosine) without
    * normalization, and the integer arithmetic keeps it oracle-exact.
    * Input lists carry (idCol, rankCol with rank ≥ 1); output:
    * (doc, rrf_x1e6, systems). One union + one keyed aggregate — the
    * lists are top-k-bounded, so this never touches corpus scale.
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
      kRrf: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: at least one ranked list")
    require(kRrf >= 0, "rrfFuse: kRrf must be >= 0")
    lists.map(df => df.select(col(idCol).as("doc"),
        expr(s"div(1000000, $kRrf + $rankCol)").as("__c")))
      .reduce(_ unionByName _)
      .groupBy("doc")
      .agg(sum(col("__c")).as("rrf_x1e6"), count(lit(1)).as("systems"))
  }
}
