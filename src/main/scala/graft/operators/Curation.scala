package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable._

/** Corpus-curation operators beyond dedup/quality: benchmark
  * decontamination, repetition (boilerplate) detection, PII redaction, and
  * training-sequence packing. Like the rest of the §7.5 family these are
  * pure DataFrame transformations over codegen'd built-ins — no UDFs — with
  * exact integer/string outputs so the DuckDB oracles hash-match.
  */
object Curation {

  /** Benchmark decontamination — flag corpus documents that overlap an
    * evaluation set (the "did my training data leak the test set" check
    * every serious LLM pipeline runs before training).
    *
    * Method: word-`shingleSize`-gram overlap. Per corpus doc, count how
    * many of its DISTINCT shingle hashes appear anywhere in the eval set;
    * `overlap_pct = 100·matched ÷ total` (integer division, exact), and
    * `contaminated = overlap_pct >= thresholdPct`.
    *
    * Scale plan: eval sets are TINY next to a 100 TB corpus (benchmarks are
    * a few MB), so the eval shingle-hash set is globally deduped and
    * BROADCAST — the corpus side is never shuffled for the membership
    * probe. The only corpus-wide shuffle is the per-doc `collect_set`
    * feature aggregation (map-side dedup, same shape as Dedup.minHashLsh);
    * the matched-count aggregate and the totals join both key on `doc`, so
    * they reuse that exchange's partitioning. Never corpus × eval.
    */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, shingleSize: Int = 5, thresholdPct: Int = 20): DataFrame = {
    require(thresholdPct >= 0 && thresholdPct <= 100,
      "decontaminate: thresholdPct must be in [0, 100]")
    val corpusFeats = Dedup.shingleFeatureSets(corpus, idCol, textCol,
      shingleSize)
    val evalHashes = broadcast(evalSet.select(explode(
        graft.functions.ShingleHashes.ofCol(col(textCol), shingleSize))
        .as("h")).distinct())

    val totals = corpusFeats.select(col("doc"),
      size(col("features")).cast("long").as("total_shingles"))
    // features arrays are distinct per doc, so post-join count() = distinct
    // matched shingles — no second dedup needed.
    val matched = corpusFeats
      .select(col("doc"), explode(col("features")).as("h"))
      .join(evalHashes, Seq("h"))
      .groupBy("doc").agg(count(lit(1)).as("matched_shingles"))

    totals.join(matched, Seq("doc"), "left")
      .select(col("doc").as(idCol), col("total_shingles"),
        coalesce(col("matched_shingles"), lit(0L)).as("matched_shingles"))
      .withColumn("overlap_pct",
        expr("div(100 * matched_shingles, greatest(total_shingles, 1))"))
      .withColumn("contaminated", col("overlap_pct") >= thresholdPct)
  }

  /** SEMANTIC (embedding-space) decontamination — the modern complement
    * to shingle `decontaminate`: a paraphrased, translated, or
    * reformatted benchmark item shares few-to-no word n-grams with its
    * source yet sits next to it in embedding space, so n-gram overlap
    * misses it. Per corpus vector, the max cosine against ANY eval-set
    * vector; `contaminated = max_eval_cosine >= threshold`. Output:
    * (id, max_eval_cosine, contaminated) — one row per corpus vector
    * (eval must be non-empty; an empty eval set would silently flag
    * nothing, which is the one failure mode this check exists to catch).
    *
    * Scale: eval sets are tiny next to a 100 TB corpus (a benchmark is
    * thousands of rows), so the eval VECTORS broadcast and the per-row
    * max collapses map-side — the corpus never shuffles its vectors; the
    * only exchange carries one (id, max) row per corpus vector. For an
    * eval set too big to broadcast, block both sides first (the
    * `Dedup.embeddingCosineLsh` sign-bucket discipline) and take the max
    * per corpus id over bucket-local pairs — same output, candidate-
    * bounded.
    *
    * NOTE: this method runs ONE EAGER Spark job at DataFrame-construction
    * time (a limit-1 existence probe of the eval set) — callers composing
    * lazy plans should construct it once, not per branch. Zero-norm eval
    * vectors are dropped before scoring (cosine against the zero vector
    * is NaN, and `max` propagates NaN, which would flag EVERY corpus row
    * contaminated); the non-empty requirement applies AFTER the drop, so
    * an eval set of only zero vectors still fails loudly instead of
    * silently flagging everything or nothing. Zero-norm CORPUS vectors
    * keep their row but score 0.0 / contaminated = false — they match
    * nothing, and without the guard their NaN max would flag them.
    */
  def semanticDecontaminate(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val reserved = Seq("max_eval_cosine", "contaminated")
    require(!reserved.contains(idCol),
      s"semanticDecontaminate: id column collides with an output column")
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("__cv"))
    val e = evalSet.select(col(vecCol).cast("array<double>").as("__ev"))
      .filter(exists(col("__ev"), v => v =!= 0.0))
    // Enforce the documented precondition eagerly (one limit-1 job): an
    // empty (post-drop) eval set would make the crossJoin return ZERO
    // rows — a nothing-is-contaminated report from a misconfigured eval
    // path is the exact silent failure this check exists to catch.
    require(!e.isEmpty,
      "semanticDecontaminate: eval set is empty (or all zero-norm) — every corpus row would be reported uncontaminated")
    // Zero-norm CORPUS vectors score 0.0 against everything (cosine would
    // be NaN, max propagates NaN, and NaN >= threshold holds in Spark —
    // which would silently flag the row contaminated); a zero vector
    // matches nothing, so it reports (0.0, false) like any far-away row.
    c.crossJoin(broadcast(e))
      .select(col("id"),
        when(exists(col("__cv"), v => v =!= 0.0),
          Similarity.cosine(col("__cv"), col("__ev")))
          .otherwise(lit(0.0)).as("__cos"))
      .groupBy("id")
      .agg(max(col("__cos")).as("max_eval_cosine"))
      .select(col("id").as(idCol), col("max_eval_cosine"),
        (col("max_eval_cosine") >= threshold).as("contaminated"))
  }

  /** Repetition / boilerplate detection — the Gopher-style repetition
    * signals: per document, how dominated is it by its most frequent word
    * n-gram, and what fraction of n-gram occurrences are repeats.
    *
    * Outputs (all exact integers): `total_ngrams`, `distinct_ngrams`,
    * `top_ngram_count` (occurrences of the modal n-gram),
    * `top_ngram_pct` = 100·top ÷ total, `dup_ngram_pct` =
    * 100·(total − distinct) ÷ total. A scraped page that is 90% repeated
    * boilerplate shows up as high dup_ngram_pct; a looping generation shows
    * up as high top_ngram_pct. Callers threshold downstream (Gopher drops
    * docs with top-2-gram fraction > 0.20).
    *
    * Plan shape: explode n-grams (bounded by text length) → count per
    * (doc, gram) → aggregate per doc. Two shuffles, both with map-side
    * partial aggregation; the (doc, gram) key spreads even a single giant
    * document across partitions, so one pathological doc cannot hot-spot a
    * task the way a per-doc array-mode computation (O(grams²) per row)
    * would.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame =
    Dedup.shingles(df, idCol, textCol, n)
      .groupBy(col("doc"), col("shingle")).agg(count(lit(1)).as("cnt"))
      .groupBy("doc").agg(
        sum("cnt").as("total_ngrams"),
        count(lit(1)).as("distinct_ngrams"),
        max("cnt").as("top_ngram_count"))
      .select(col("doc").as(idCol), col("total_ngrams"), col("distinct_ngrams"),
        col("top_ngram_count"),
        expr("div(100 * top_ngram_count, greatest(total_ngrams, 1))").as("top_ngram_pct"),
        expr("div(100 * (total_ngrams - distinct_ngrams), greatest(total_ngrams, 1))")
          .as("dup_ngram_pct"))

  /** PII patterns shared with the oracle: kept to RE2-safe syntax (both
    * Java regex and DuckDB's RE2 agree on these exactly — no lookarounds,
    * no backrefs).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** PII detection + redaction — emails, IPv4 addresses, and NNN-NNN-NNNN
    * phone numbers replaced with typed placeholders, with per-type match
    * counts kept for auditing (a curation pipeline reports how much PII it
    * scrubbed, not just the scrubbed text).
    *
    * The three patterns cannot match overlapping spans (emails contain `@`,
    * phones contain `-` between digit groups, IPs contain dots between
    * digit groups), so counts on the ORIGINAL text and sequential
    * replacement agree no matter the order. Map-only projection: counting
    * and replacing are codegen'd regexp expressions — no shuffle, pushes
    * through to the scan, trivially linear at 100 TB.
    */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      regexp_count(t, lit(EmailRe)).as("emails"),
      regexp_count(t, lit(Ipv4Re)).as("ips"),
      regexp_count(t, lit(PhoneRe)).as("phones"),
      regexp_replace(regexp_replace(regexp_replace(t,
        EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"), PhoneRe, "<PHONE>")
        .as("redacted"))
  }

  /** Corpus-informed rarity scoring — the two-pass "global statistics,
    * then score each row against them" pattern (the TF-IDF building
    * block): pass 1 computes every token's document frequency across the
    * corpus; pass 2 joins the DF table back onto each doc's distinct
    * tokens and aggregates. `mean_df_x100` = 100·Σdf ÷ distinct_tokens —
    * LOW means rare vocabulary (specialist/noisy text), HIGH means the doc
    * is built from corpus-common words. Exact integer output.
    *
    * Scale: three equi-shuffles (doc→token explode + groupBy token;
    * join back on token; groupBy doc) — all hash-partitionable,
    * map-side-combined, never quadratic. The DF table side of the join
    * arrives already partitioned by token from its aggregation, so only
    * the doc-token side pays a second token shuffle; stop-word-scale skew
    * (the token "the" in half the corpus) spreads because the groupBy key
    * is (token) for counting but (doc) for scoring — no single hot
    * reducer sees a whole token's postings in pass 2.
    */
  def rarityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docTok = df.select(col(idCol),
      explode(array_distinct(tokens(col(textCol)))).as("token"))
    val dfTable = docTok.groupBy("token").agg(count(lit(1)).as("df"))
    docTok.join(dfTable, Seq("token"))
      .groupBy(idCol).agg(
        count(lit(1)).as("distinct_tokens"),
        sum("df").as("df_sum"))
      .select(col(idCol), col("distinct_tokens"), col("df_sum"),
        expr("div(100 * df_sum, greatest(distinct_tokens, 1))").as("mean_df_x100"))
  }

  /** Stratified deterministic sampling — per-stratum keep rates over the
    * same seedless hash56 slice as TextAnalysis.deterministicSample, so a
    * language-balanced (or source-balanced) subsample is reproducible
    * across runs, partitionings, and engines, and slices NEST: a stratum's
    * 10% sample is a subset of its 20% sample. Pure filter — pushes to the
    * scan, no shuffle; the mixing knob of a 100 TB curation pipeline.
    */
  /** URL/domain curation — the crawl-side gate every web-scale corpus
    * runs before any text-level processing: extract the registrable
    * domain from each document's URL, drop blocklisted domains, and cap
    * how many documents any single domain may contribute (the
    * Gopher/C4-style "no domain dominates the mix" rule).
    *
    * Registrable-domain extraction is public-suffix-list logic reduced to
    * its load-bearing core: host = the URL authority (userinfo and port
    * stripped, lowercased), and the registrable domain is the last TWO
    * labels — unless the last two form a listed multi-label public suffix
    * ("co.uk", "com.au", …), in which case it is the last THREE. Pass the
    * suffix list that matters for your crawl; it is evaluated as a
    * broadcast-size literal, map-only.
    *
    * The per-domain cap ranks docs within a domain by (`orderCol` DESC,
    * id) — quality-first, deterministic — with ONE window trick that
    * avoids a rank-then-join-back shuffle: blocked rows sort AFTER all
    * unblocked rows inside their domain partition, so unblocked docs get
    * exactly ranks 1..n_unblocked and `keep = !blocked && rank <=
    * maxPerDomain` needs no second pass. Scale: extraction and
    * blocklisting are map-side; the only shuffle is the domain-keyed
    * window, and a downstream `filter(keep)` consumer that instead
    * filters `domain_rank <= maxPerDomain` gets Spark's WindowGroupLimit
    * pushdown (per-domain top-k in the sort buffer, never the full
    * domain in memory — the hot-domain skew guard).
    *
    * Output: (doc, url, domain, blocked, domain_rank, keep), one row per
    * input row. Bracketed IPv6 authorities keep the whole literal as their
    * domain; URLs with no extractable host (scheme-less, relative, garbage)
    * get domain NULL and keep=false, and are salted into per-row window
    * partitions so dirty data can't manufacture one hot partition.
    */
  def domainCurate(df: DataFrame, idCol: String, urlCol: String,
      orderCol: String, multiPartSuffixes: Seq[String],
      blockedDomains: Seq[String], maxPerDomain: Int): DataFrame = {
    require(maxPerDomain >= 1, "domainCurate: maxPerDomain must be >= 1")
    // authority terminates at '/', '?' or '#': a pathless URL with a
    // query string must not leak "?utm_source=x" into the domain (and a
    // crafted "?ref=user@evil.org" must not choose its own domain via
    // the userinfo strip)
    val rawAuth = regexp_extract(col(urlCol), "^[a-zA-Z]+://([^/?#]+)", 1)
    // A bracketed IPv6 authority ("[::1]:8080", possibly with userinfo)
    // keeps the whole literal as its host — the generic userinfo/port strip
    // stops at the FIRST colon and would otherwise hand back "[".
    val bracketHost = regexp_extract(rawAuth, "^(?:[^@/]*@)?\\[([^\\]]+)\\]", 1)
    val host = lower(when(bracketHost =!= "", bracketHost)
      .otherwise(regexp_extract(rawAuth, "^(?:[^@]*@)?([^:]+)", 1)))
    val labels = split(host, "\\.")
    val last2 = concat_ws(".", slice(labels, -2, 2))
    // Dirty crawl data: scheme-less/relative URLs (and plain garbage) have
    // no extractable host. They get domain NULL and keep=false instead of
    // domain '' — '' pooled every such row into ONE window partition, a
    // manufactured hot partition on exactly the data most likely to be
    // dirty at scale. IP-literal hosts have no registrable domain; the
    // literal itself is the domain (per-IP capping is the right behavior
    // for IP-hosted crawl spam anyway).
    val domain = when(host === "", lit(null).cast("string"))
      .when(bracketHost =!= "", host)
      .when(size(labels) <= 2, concat_ws(".", labels))
      .when(last2.isin(multiPartSuffixes: _*),
        concat_ws(".", slice(labels, -3, 3)))
      .otherwise(last2)
    val withDomain = df.select(col(idCol).as("doc"), col(urlCol).as("url"),
      col(orderCol).as("__ord"), domain.as("domain"))
      .withColumn("blocked",
        coalesce(col("domain").isin(blockedDomains: _*), lit(false)))
    withDomain
      .withColumn("domain_rank", row_number().over(
        // NULL-domain rows ride a per-row partition key (doc id is unique)
        // so they can never form a hot partition; real domains partition
        // by domain exactly as before. One shuffle either way.
        Window.partitionBy(coalesce(col("domain"),
            concat(lit("\u0000nohost:"), col("doc").cast("string"))))
          .orderBy(col("blocked").asc, col("__ord").desc, col("doc").asc))
        .cast("long"))
      .withColumn("keep", col("domain").isNotNull && !col("blocked") &&
        col("domain_rank") <= maxPerDomain)
      .drop("__ord")
  }

  /** Checksum-validated payment-card audit — the PII class where a bare
    * regex is the wrong tool: any 13–19 digit run LOOKS like a card
    * number (ids, timestamps, hashes all collide with the pattern), so a
    * regex-only redactor both over-fires and under-reports. Each digit-run
    * candidate is verified with the Luhn mod-10 checksum IN-PLAN (double
    * every second digit from the right, subtract 9 above 9, sum ≡ 0 mod
    * 10 — the check digit every real card number carries), via
    * transform/aggregate over the digit positions: pure codegen'd
    * builtins, no UDF, map-only — the same per-row cost profile as the
    * regex redactor (x37) with ~90% fewer false positives (a uniform
    * random digit run passes Luhn 1 time in 10).
    *
    * Output: (id, card_candidates, cards_valid, redacted) — `redacted`
    * masks only VERIFIED numbers, leaving benign digit runs untouched
    * (over-redaction destroys training text too).
    */
  def luhnCardAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    // Luhn mod-10 over lambda var `c` (a digit string), positions counted
    // from the right via reverse()
    // digit i counted from the RIGHT is substring(c, length(c)-i+1, 1) —
    // indexing from the left avoids re-reversing the whole string inside
    // every (interpreted) lambda application
    val d = "(ascii(substring(c, length(c) - i + 1, 1)) - 48)"
    val luhn = "aggregate(transform(sequence(1, length(c)), i -> " +
      s"CASE WHEN i % 2 = 0 THEN if($d * 2 > 9, $d * 2 - 9, $d * 2) " +
      s"ELSE $d END), 0, (a, x) -> a + x) % 10 = 0"
    df.select(col(idCol), t.as("__t"))
      // Column-API extract: the regex constant stays single-backslash and
      // serves the DuckDB oracle interpolation unchanged
      .withColumn("__cands", regexp_extract_all(col("__t"), lit(CardRe), lit(0)))
      .withColumn("__valid", expr(s"filter(__cands, c -> $luhn)"))
      .select(col(idCol),
        size(col("__cands")).cast("long").as("card_candidates"),
        size(col("__valid")).cast("long").as("cards_valid"),
        // boundary-anchored replace: a verified card embedded inside a
        // LONGER benign digit run must not be masked (candidates are
        // digit-only, so the dynamic pattern needs no quoting)
        expr("""aggregate(__valid, __t, (acc, c) ->
            regexp_replace(acc, concat('\\b', c, '\\b'), '<CARD>'))""")
          .as("redacted"))
  }

  /** 13–19 digit runs on word boundaries — the card-number candidate
    * surface `luhnCardAudit` verifies.
    */
  val CardRe = "\\b[0-9]{13,19}\\b"

  /** Longest-prefix URL policy gate — the robots/blocklist rule semantics
    * a crawl pipeline applies per URL: each rule is a literal URL prefix
    * with an allow/deny verdict, the LONGEST matching prefix wins (the
    * robots.txt longest-match rule: "deny /a/, allow /a/public/" must
    * admit /a/public/x), and URLs matching no rule fall through to
    * `defaultAllow`. Complements `domainCurate` (domain-level capping)
    * with path-level policy.
    *
    * Scale: the rule set is policy-sized (thousands), so it broadcasts;
    * the match is a broadcast theta-join on `startsWith` — each URL meets
    * each rule map-side, never a corpus shuffle against the rules — and
    * the longest-match pick is a max_by whose PARTIAL aggregation
    * collapses the ≤|rules| matches map-side, so the one keyed exchange
    * carries a single slim row per URL. Rules are literal prefixes, not
    * patterns; pattern rules belong in a pushed-down regexp filter.
    *
    * Output: (id, url, matched_rule — null if none, allowed), one row per
    * DISTINCT (id, url) input combination — the groupBy that picks the
    * longest match collapses duplicate (id, url) rows (ids are expected
    * unique per url, as everywhere in this module; exact duplicates gate
    * identically, so nothing is lost).
    */
  def urlPolicyGate(df: DataFrame, idCol: String, urlCol: String,
      rules: Seq[(String, Boolean)], defaultAllow: Boolean = true): DataFrame = {
    require(rules.nonEmpty, "urlPolicyGate: empty rule set")
    require(rules.map(_._1).distinct.size == rules.size,
      "urlPolicyGate: duplicate rule prefixes")
    val spark = df.sparkSession
    import spark.implicits._
    val ruleDf = broadcast(
      rules.toDF("__rule", "__allow")
        .withColumn("__rlen", length(col("__rule"))))
    df.select(col(idCol), col(urlCol).as("url"))
      .join(ruleDf, col("url").startsWith(col("__rule")), "left")
      .groupBy(col(idCol), col("url"))
      .agg(max_by(col("__rule"), col("__rlen")).as("matched_rule"),
        max_by(col("__allow"), col("__rlen")).as("__ma"))
      .select(col(idCol), col("url"), col("matched_rule"),
        coalesce(col("__ma"), lit(defaultAllow)).as("allowed"))
  }

  /** The robots-SCALE shape of `urlPolicyGate` — same longest-prefix
    * semantics, different join algebra for rule sets too large for a
    * nested-loop probe: the theta variant's broadcast `startsWith` join
    * is O(urls × rules) per task, the right plan for a config-sized list
    * but the scale-killer at a real robots/policy corpus (10⁵–10⁶
    * prefixes). This variant exploits that a PREFIX match of known
    * length is an EQUALITY: group the rules by prefix length L (distinct
    * lengths are few — bounded by max URL-prefix length, not rule
    * count), and for each L probe `substring(url, 1, L) = rule` through
    * a broadcast HASH join. Per URL that is |lengths| O(1) hash lookups
    * instead of |rules| startsWith calls.
    *
    * The longest-match pick costs no aggregate here: equal-length
    * distinct prefixes cannot both match one URL, so each per-length
    * left join yields AT MOST ONE match, and `coalesce` over the
    * per-length match columns in DESCENDING length order IS the
    * longest-win rule — evaluated map-side in the same codegen stage.
    * Zero exchanges end to end (plan-pinned): one pass over the URLs,
    * every join a BroadcastHashJoin. Unlike the theta variant there is
    * no groupBy, so the output is genuinely one row per INPUT row, with
    * duplicate (id, url) rows preserved.
    *
    * Value-equivalent to `urlPolicyGate` on distinct-(id, url) input
    * (spec-pinned on the x150 corpus). Output: (id, url, matched_rule —
    * null if none, allowed). Rule sets past `broadcastRuleLimit` hand
    * off to `urlPolicyGateShuffle` — the per-length broadcast sides
    * stop fitting an executor past ~10⁶ prefixes, and beyond that only
    * the shuffle algebra survives.
    */
  def urlPolicyGateByLength(df: DataFrame, idCol: String, urlCol: String,
      rules: Seq[(String, Boolean)], defaultAllow: Boolean = true,
      broadcastRuleLimit: Int = 1000000): DataFrame = {
    require(rules.nonEmpty, "urlPolicyGateByLength: empty rule set")
    require(rules.map(_._1).distinct.size == rules.size,
      "urlPolicyGateByLength: duplicate rule prefixes")
    val spark = df.sparkSession
    import spark.implicits._
    if (rules.size > broadcastRuleLimit) {
      // beyond the broadcast cliff the per-length join sides stop
      // fitting an executor broadcast — hand off to the shuffle shape
      urlPolicyGateShuffle(df, idCol, urlCol,
        rules.toDF("rule", "allow"), defaultAllow)
    } else gateByLengthBroadcast(df, idCol, urlCol, rules, defaultAllow)
  }

  private def gateByLengthBroadcast(df: DataFrame, idCol: String,
      urlCol: String, rules: Seq[(String, Boolean)],
      defaultAllow: Boolean): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // group key is the CODEPOINT count, because the probe side is
    // Spark `substring`, which slices codepoints: a rule prefix with
    // non-BMP characters (emoji in IDN paths) has String.length >
    // codePointCount, and keying on UTF-16 units made the probe
    // substring one codepoint LONGER than the rule — it silently never
    // matched (round-10 advisory). Descending lengths: the coalesce
    // pick below reads them in order.
    val byLen = rules.groupBy(r => r._1.codePointCount(0, r._1.length))
      .toSeq.sortBy(-_._1)
    val urls = df.select(col(idCol), col(urlCol).as("url"))
    val joined = byLen.zipWithIndex.foldLeft(urls) {
      case (acc, ((l, rs), i)) =>
        acc.join(
          broadcast(rs.toDF(s"__r$i", s"__a$i")),
          substring(col("url"), 1, l) === col(s"__r$i"), "left")
    }
    val n = byLen.size
    joined.select(col(idCol), col("url"),
      coalesce((0 until n).map(i => col(s"__r$i")): _*).as("matched_rule"),
      coalesce(((0 until n).map(i => col(s"__a$i")) :+ lit(defaultAllow)): _*)
        .as("allowed"))
  }

  /** The beyond-broadcast shape of the longest-prefix URL gate — for
    * rule corpora past what an executor broadcast holds (≳10⁶ prefixes:
    * full robots mirrors, host-level blocklists). Same semantics as
    * `urlPolicyGate`/`urlPolicyGateByLength`; the rules arrive as a
    * DataFrame (`rule` string, `allow` boolean — prefixes must be
    * distinct) because a driver-side Seq is itself the bottleneck at
    * that size.
    *
    * Join algebra: joining the corpus once per distinct prefix length
    * would shuffle the URLS |lengths| times. Instead each URL explodes
    * into its |lengths| candidate prefixes map-side (distinct prefix
    * lengths are bounded by the max rule length — a few dozen — never
    * by rule count; the one driver collect here reads that tiny set),
    * and ONE equi-join on the prefix string meets the shuffled rule
    * table, partition-pruned by the join key on both sides. The
    * longest-prefix pick is the theta gate's max_by aggregate, whose
    * partial collapses the ≤|lengths| matches map-side; a final left
    * join back to the input restores the one-row-per-INPUT-row
    * contract (duplicate (id, url) rows preserved, like the byLength
    * variant).
    *
    * Lengths LONGER than the URL are pruned map-side before the explode
    * (round-11 advisory): `substring(url, 1, l)` with l > |url| returns
    * the whole URL, and a rule of length l can never string-equal a
    * shorter prefix — those rows could never match but were still
    * exploded and shuffled. On a short-URL corpus against deep rule
    * trees the prune cuts the exploded row count to exactly
    * Σ_urls |{l : l ≤ |url|}| (spec-pinned via the Generate node's
    * numOutputRows).
    */
  def urlPolicyGateShuffle(df: DataFrame, idCol: String, urlCol: String,
      rules: DataFrame, defaultAllow: Boolean = true): DataFrame = {
    val r = rules.select(col("rule"), col("allow"),
      length(col("rule")).as("__rlen"))
    val lengths = r.select("__rlen").distinct().collect()
      .map(_.getInt(0)).sorted.toSeq
    require(lengths.nonEmpty, "urlPolicyGateShuffle: empty rule set")
    val urls = df.select(col(idCol), col(urlCol).as("url"))
    val pref = urls.select(col(idCol), col("url"),
      explode(filter(array(lengths.map(l =>
        when(length(col("url")) >= l, substring(col("url"), 1, l))): _*),
        p => p.isNotNull)).as("__prefix"))
    val matches = pref.join(r, col("__prefix") === col("rule"))
      .groupBy(col(idCol), col("url"))
      .agg(max_by(col("rule"), col("__rlen")).as("matched_rule"),
        max_by(col("allow"), col("__rlen")).as("__ma"))
    urls.join(matches, Seq(idCol, "url"), "left")
      .select(col(idCol), col("url"), col("matched_rule"),
        coalesce(col("__ma"), lit(defaultAllow)).as("allowed"))
  }

  /** Unicode hygiene — the cleaning gate crawl text passes BEFORE any
    * hashing/dedup/tokenization: NFC-normalize (the `graft_nfc` native
    * expression — "café" precomposed and decomposed must hash alike, and
    * a UDF here would sit on the hottest map side), then strip the
    * control characters that break downstream tooling — C0 (minus
    * tab/newline/CR, which are document structure), DEL, and the C1
    * block U+0080–U+009F (the classic windows-1252-misdecode residue:
    * a NEL or an 0x85 ellipsis byte surviving a bad transcode lands
    * here). Reported alongside: the
    * denormalization flag and the U+FFFD replacement-character count,
    * the standard mojibake signal (every U+FFFD is a byte sequence some
    * earlier stage failed to decode — a high count marks a document
    * whose TEXT is already lost and is a strong drop signal).
    *
    * Everything is map-side single-pass (one native expression + two
    * codegen'd regexp/translate ops); the counts are length DIFFERENCES,
    * so they stay exact even for non-BMP text where engines disagree on
    * "length" (the removed characters are all BMP).
    *
    * Output: (id, cleaned, was_denormalized, ctrl_removed,
    * replacement_chars, chars_after), one row per input row.
    */
  def unicodeClean(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), col(textCol).as("__raw"),
        graft.functions.NfcNormalize.ofCol(col(textCol)).as("__nfc"))
      .withColumn("cleaned", regexp_replace(col("__nfc"),
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F]", ""))
      .select(col(idCol),
        col("cleaned"),
        (col("__nfc") =!= col("__raw")).as("was_denormalized"),
        (length(col("__nfc")) - length(col("cleaned"))).cast("long")
          .as("ctrl_removed"),
        (length(col("cleaned")) -
          length(translate(col("cleaned"), "\uFFFD", ""))).cast("long")
          .as("replacement_chars"),
        length(col("cleaned")).cast("long").as("chars_after"))

  /** Invisible-character hygiene — `unicodeClean`'s sibling for the
    * characters that render as NOTHING yet change hashing, tokenization,
    * and (in LLM corpora) are a documented prompt-injection/watermark
    * vector: zero-width space/non-joiner/joiner + word joiner
    * (U+200B–U+200D, U+2060), the bidi controls (LRM/RLM U+200E–U+200F,
    * the embedding/override block U+202A–U+202E, and the isolate block
    * U+2066–U+2069 — the "Trojan Source" characters), and U+FEFF (a BOM
    * that leaked into text, a.k.a. zero-width no-break space). Each
    * class is stripped and counted separately — the class PROFILE is the
    * signal (bidi controls inside source code ≈ attack; a lone leading
    * U+FEFF ≈ windows tooling), so one merged count would lose it.
    *
    * `compatNormalize = true` additionally applies Unicode NFKC FIRST
    * (the `graft_nfkc` native expression): fullwidth forms, ligatures,
    * superscripts and friends collapse to their compatibility base, the
    * canonicalization that makes "ｆｒｅｅ ｍｏｎｅｙ" hash like
    * "free money". Off by default — NFKC is lossy by design.
    *
    * Everything is map-side single-pass (three codegen'd regexp passes
    * over disjoint BMP classes + the optional native NFKC); counts are
    * length DIFFERENCES so they are exact in any engine that counts
    * codepoints. Output: (id, cleaned, zero_width_removed, bidi_removed,
    * bom_removed, was_compat_changed, chars_after), one row per input
    * row; was_compat_changed is constant false when `compatNormalize`
    * is off.
    */
  def invisibleClean(df: DataFrame, idCol: String, textCol: String,
      compatNormalize: Boolean = false): DataFrame = {
    val base =
      if (compatNormalize) graft.functions.NfkcNormalize.ofCol(col(textCol))
      else col(textCol)
    df.select(col(idCol), col(textCol).as("__raw"), base.as("__t"))
      .withColumn("__zw",
        regexp_replace(col("__t"), "[\\u200B-\\u200D\\u2060]", ""))
      .withColumn("__bd",
        regexp_replace(col("__zw"),
          "[\\u200E\\u200F\\u202A-\\u202E\\u2066-\\u2069]", ""))
      .withColumn("cleaned", regexp_replace(col("__bd"), "\\uFEFF", ""))
      .select(col(idCol),
        col("cleaned"),
        (length(col("__t")) - length(col("__zw"))).cast("long")
          .as("zero_width_removed"),
        (length(col("__zw")) - length(col("__bd"))).cast("long")
          .as("bidi_removed"),
        (length(col("__bd")) - length(col("cleaned"))).cast("long")
          .as("bom_removed"),
        (col("__t") =!= col("__raw")).as("was_compat_changed"),
        length(col("cleaned")).cast("long").as("chars_after"))
  }

  /** Mixed-script confusable audit — the VISIBLE half of the Trojan-
    * Source surface `invisibleClean` covers for invisibles: a token
    * mixing Latin with Cyrillic or Greek letters renders identically to
    * a pure-Latin word ("pаypal" with a Cyrillic а) yet hashes,
    * tokenizes, and matches differently — the homograph trick behind
    * phishing domains, dedup evasion, and poisoned training text. A
    * token using ONE script is never flagged (Russian text is not
    * suspicious; a Cyrillic letter INSIDE a Latin word is). Scripts are
    * fixed BMP ranges — ASCII Latin [A-Za-z], Cyrillic U+0400–U+04FF,
    * Greek U+0370–U+03FF — so the check is engine-portable and exact.
    *
    * Map-side single-pass: whitespace split, per-token regex membership
    * per script, pairwise-mix counts. Output: (id, tokens,
    * latin_cyrillic, latin_greek, cyrillic_greek, mixed_script_tokens,
    * flagged), one row per input row; `mixed_script_tokens` counts
    * tokens in ≥ 2 of the three scripts (each such token once).
    */
  def mixedScriptAudit(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val latin = "[A-Za-z]"
    val cyr = "[\\u0400-\\u04FF]"
    val greek = "[\\u0370-\\u03FF]"
    def has(t: Column, pat: String) = t.rlike(pat)
    val toks = split(col(textCol), "\\s+")
    df.select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("tokens"),
        size(filter(col("__toks"),
          t => has(t, latin) && has(t, cyr))).cast("long")
          .as("latin_cyrillic"),
        size(filter(col("__toks"),
          t => has(t, latin) && has(t, greek))).cast("long")
          .as("latin_greek"),
        size(filter(col("__toks"),
          t => has(t, cyr) && has(t, greek))).cast("long")
          .as("cyrillic_greek"),
        size(filter(col("__toks"), t =>
          (has(t, latin) && has(t, cyr)) || (has(t, latin) && has(t, greek)) ||
            (has(t, cyr) && has(t, greek)))).cast("long")
          .as("mixed_script_tokens"))
      .withColumn("flagged", col("mixed_script_tokens") > 0)
  }

  /** HTML text extraction — the crawl pipeline's very first transform:
    * strip script/style blocks, drop tags, decode the six ubiquitous
    * entities, collapse whitespace, and report the structural signals a
    * boilerplate classifier feeds on (tag count, anchor count). This is
    * the DETERMINISTIC heuristic core of the extraction stage (the
    * trafilatura/jusText class of tools adds learned block scoring on
    * top — their block features are exactly these counts per block):
    * every step is a regex or literal replace with identical semantics
    * in any RE2/Java-regex engine, so the whole transform is
    * oracle-portable and exact.
    *
    * Order matters twice, so it is fixed and documented: script/style
    * bodies are removed BEFORE tag stripping (their content is code,
    * not text — and may itself contain markup inside string literals),
    * and `&amp;` decodes LAST so "&amp;lt;" yields the literal "&lt;"
    * rather than double-decoding to "<". Map-side single-pass per row;
    * at 100 TB this is the scan-bound transform it should be. Output:
    * (id, text, tag_count, link_count, chars), one row per input row.
    */
  def htmlExtract(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val noScript = regexp_replace(
      regexp_replace(col(htmlCol), "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")
    df.select(col(idCol),
        noScript.as("__ns"),
        regexp_count(col(htmlCol), lit("<[^>]+>")).cast("long")
          .as("tag_count"),
        regexp_count(col(htmlCol), lit("(?i)<a[\\s>]")).cast("long")
          .as("link_count"))
      .withColumn("__t", regexp_replace(col("__ns"), "<[^>]+>", " "))
      .withColumn("__d",
        // literal entity decode; ampersand LAST (see scaladoc)
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(regexp_replace(col("__t"),
            "&nbsp;", " "), "&lt;", "<"), "&gt;", ">"),
          "&quot;", "\""), "&#39;", "'"), "&amp;", "&"))
      .select(col(idCol),
        trim(regexp_replace(col("__d"), "\\s+", " ")).as("text"),
        col("tag_count"), col("link_count"))
      .withColumn("chars", length(col("text")).cast("long"))
  }

  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Int], defaultRate: Int, outOf: Int = 100): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= outOf),
      s"stratifiedSample: rates must be in [0, $outOf]")
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(hash56(col(idCol).cast("string")) % outOf < rate)
  }

  /** Mixture upsampling — replicate each row `weight(stratum)` times with
    * a `copy` index (1..w): the "epochs per source" data-mixture step
    * (high-quality sources repeat, bulk web sees one pass). Map-only
    * explode of a per-row `sequence`, bounded by the max weight; rows with
    * weight 0 drop out, matching a mixture that excludes a source.
    */
  def replicateByWeight(df: DataFrame, stratumCol: String,
      weights: Map[String, Int], defaultWeight: Int = 1): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0),
      "replicateByWeight: weights must be >= 0")
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("copy", explode(
      when(w >= 1, sequence(lit(1), w)).otherwise(array().cast("array<int>"))))
  }

  /** Fractional-epoch mixture — replicateByWeight with a FRACTIONAL knob,
    * which is what real mixture specs use ("2.5 epochs of source A"):
    * weight arrives ×100; every row gets div(w, 100) full copies, and the
    * fractional remainder keeps an extra copy for the deterministic
    * hash56 slice of size (w mod 100)% — seedless, engine-portable, and
    * NESTED (the 2.5-epoch set contains the 2.2-epoch set for the same
    * source). Map-only: a bounded explode, no shuffle.
    */
  def fractionalEpochs(df: DataFrame, idCol: String, stratumCol: String,
      weightsX100: Map[String, Int], defaultX100: Int = 100,
      salt: String = ""): DataFrame = {
    require((weightsX100.values ++ Seq(defaultX100)).forall(_ >= 0),
      "fractionalEpochs: weights must be >= 0")
    val w = weightsX100.foldLeft(lit(defaultX100)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    // `salt` varies WHICH hash slice receives the fractional extra copy
    // (curriculum schedules salt per epoch so the same docs aren't always
    // the repeated ones); "" reproduces the unsalted x99 slice exactly
    // (concat with the empty string is identity).
    df.withColumn("__w", w)
      .withColumn("__extra",
        (hash56(concat(lit(salt), col(idCol).cast("string"))) % 100
          < col("__w") % 100).cast("int"))
      .withColumn("copy", explode(expr(
        "CASE WHEN div(__w, 100) + __extra >= 1 " +
          "THEN sequence(CAST(1 AS BIGINT), CAST(div(__w, 100) + __extra AS BIGINT)) " +
          "ELSE CAST(array() AS array<bigint>) END")))
      .drop("__w", "__extra")
  }

  /** Distinctive-term extraction — the full TF-IDF two-pass made exact:
    * per document, the top-`k` tokens ranked by term frequency (desc) then
    * document frequency (asc) then token — i.e. the terms most
    * over-represented in THIS doc relative to the corpus. For a fixed doc
    * this ordering tracks tf·idf (idf is monotone-decreasing in df) while
    * staying in exact integer arithmetic — no `ln()`, whose libm rounding
    * differs across engines, so the oracle hash-matches bit for bit.
    *
    * Plan: explode tokens → count per (doc, token) = tf (one shuffle,
    * map-side combine) → count docs per token = df (reuses the (doc,token)
    * partitioning's token-side aggregation) → join tf⋈df on token →
    * row_number window PARTITIONED BY DOC. The window partition is one
    * document's distinct tokens — bounded by doc length, never corpus
    * size, so the sort stays in-memory per task at any corpus scale. The
    * df table is corpus-vocabulary-sized; at 100 TB it exceeds broadcast
    * range and the token equi-join shuffles both sides — fine, it is the
    * same key the tf aggregation just shuffled on, so AQE reuses the
    * exchange.
    */
  def distinctiveTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    require(k > 0, "distinctiveTerms: k must be positive")
    val tf = df.select(col(idCol).as("doc"),
        explode(tokens(col(textCol))).as("token"))
      .groupBy("doc", "token").agg(count(lit(1)).as("tf"))
    val dfTable = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc")
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    tf.join(dfTable, Seq("token"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc").as(idCol), col("rank"), col("token"),
        col("tf"), col("df"))
  }

  /** Training-sequence packing — concat-and-chunk: lay every document's
    * tokens end to end (in id order) and cut the stream into fixed
    * `capacity`-token training sequences. Documents may span a sequence
    * boundary (the standard LLM pretraining packing; attention masks handle
    * the seams). Output: one row per (document, sequence) it occupies —
    * `seq_id` within the shard, `offset_in_seq` where the doc's tokens
    * begin, `tokens_in_seq` how many land there; `sum(tokens_in_seq)` per
    * doc = its token count, `sum(tokens_in_seq)` per sequence = `capacity`
    * (except each shard's last).
    *
    * Scale plan: a single global running sum would serialize 100 TB through
    * one window partition, so the stream is SHARDED first —
    * `shard = hash56(id) mod numShards` — and the cumulative sum runs per
    * shard (`numShards` ≈ cluster cores ⇒ every core packs its own
    * independent stream; sequences are complete within a shard, so no
    * cross-shard stitching). The explode emits one row per sequence a doc
    * touches: ⌈tokens/capacity⌉+1 worst case — bounded, no blowup.
    * Deterministic: same ids → same shards, same order, same sequences,
    * every run and every engine.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      capacity: Long, numShards: Int): DataFrame = {
    require(capacity > 0, "packSequences: capacity must be positive")
    require(numShards > 0, "packSequences: numShards must be positive")
    val base = df.select(col(idCol),
        size(tokens(col(textCol))).cast("long").as("doc_tokens"))
      .withColumn("shard", (hash56(col(idCol).cast("string")) % numShards).cast("int"))
    val w = Window.partitionBy("shard").orderBy(idCol)
    base
      .withColumn("end_off", sum("doc_tokens").over(w))
      .withColumn("start_off", col("end_off") - col("doc_tokens"))
      // doc_tokens >= 1 always (split yields at least one token), so
      // end_off - 1 >= start_off and the sequence range is never empty.
      .withColumn("seq_id", explode(sequence(
        expr(s"start_off div ${capacity}L"),
        expr(s"(end_off - 1) div ${capacity}L"))))
      .select(col(idCol), col("shard"), col("seq_id"), col("doc_tokens"),
        (greatest(col("start_off"), col("seq_id") * capacity) - col("seq_id") * capacity)
          .as("offset_in_seq"),
        (least(col("end_off"), (col("seq_id") + 1) * capacity) -
          greatest(col("start_off"), col("seq_id") * capacity)).as("tokens_in_seq"))
  }

  /** Token-budget waterfilling — the mixture-planning step: given a total
    * training budget of `budgetTokens` and per-source token masses, find
    * the per-source cap C* (waterfilling level) such that
    * Σ min(tokensₛ, C*) fills the budget: small sources keep everything,
    * large sources are capped at the common level — the "no source
    * dominates" allocation every mixture spec wants, computed exactly.
    *
    * C* is closed-form over the sources sorted by mass ascending: at the
    * first source i (0-based, prefix = Σ masses before i, r = n − i
    * sources remaining) where prefix + r·tokensᵢ exceeds the budget, the
    * level is div(budget − prefix, r); if no source overflows, the budget
    * covers the corpus and nothing is capped. Output per source:
    * (source, tokens, allocated, rate_x10000), allocation = min(tokens,
    * C*), rate = div(10⁴·allocated, tokens).
    *
    * Scale: the corpus collapses to ONE row per source first (map-side
    * partial token counts), so the sort + prefix windows run over the
    * source table (dozens of rows at any corpus size), and the level
    * joins back as a one-row broadcast.
    */
  def tokenBudget(df: DataFrame, sourceCol: String, textCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, "tokenBudget: budgetTokens must be >= 0")
    val masses = df
      .select(col(sourceCol).as("source"),
        size(tokens(col(textCol))).cast("long").as("t"))
      .groupBy("source").agg(sum(col("t")).as("tokens"))
    val w = Window.orderBy(col("tokens"), col("source"))
    val ranked = masses
      .withColumn("prefix",
        coalesce(sum(col("tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("remaining",
        count(lit(1)).over(Window.partitionBy()) - row_number().over(w) + 1L)
    val level = ranked
      .filter(col("prefix") + col("remaining") * col("tokens") > budgetTokens)
      .agg(min_by(
        expr(s"div(${budgetTokens}L - prefix, remaining)"),
        struct(col("tokens"), col("source"))).as("level"))
    masses.crossJoin(broadcast(level))
      .select(col("source"), col("tokens"),
        least(col("tokens"), coalesce(col("level"), col("tokens"))).as("allocated"))
      .withColumn("rate_x10000",
        expr("div(10000 * allocated, greatest(tokens, 1))"))
  }

  /** Length-bucketed training batches — minimize padding waste: within
    * each shard, sort documents by token count and cut into fixed-size
    * batches, so each batch pads to a max close to its members' lengths
    * (random batching pads everything to the global tail). Output one row
    * per (shard, batch): members, max/sum tokens, and `padding_tokens` =
    * n·max − sum (the waste a per-batch-padded training step pays).
    *
    * Scale: same sharded-window discipline as packSequences — the length
    * sort runs per shard (shards ≈ cores), never as one global sort;
    * batch stats are one keyed aggregate reusing the shard partitioning.
    * Deterministic: (tokens, id) ordering, seedless hash sharding.
    */
  def batchByLength(df: DataFrame, idCol: String, textCol: String,
      batchSize: Int, numShards: Int): DataFrame = {
    require(batchSize > 0, "batchByLength: batchSize must be positive")
    require(numShards > 0, "batchByLength: numShards must be positive")
    val base = df.select(col(idCol),
        size(tokens(col(textCol))).cast("long").as("doc_tokens"))
      .withColumn("shard",
        (hash56(col(idCol).cast("string")) % numShards).cast("int"))
    val w = Window.partitionBy("shard").orderBy(col("doc_tokens"), col(idCol))
    base
      .withColumn("__rn", row_number().over(w))
      .withColumn("batch_idx", expr(s"div(__rn - 1, $batchSize)"))
      .groupBy("shard", "batch_idx")
      .agg(count(lit(1)).as("n_docs"),
        max(col("doc_tokens")).as("max_tokens"),
        sum(col("doc_tokens")).as("sum_tokens"))
      .withColumn("padding_tokens",
        col("n_docs") * col("max_tokens") - col("sum_tokens"))
  }

  /** Leakage-safe train/val/test split: assign WHOLE near-duplicate
    * clusters to one split, so a held-out document never has a near-copy
    * in train (random row-level splits leak exactly this way — the
    * benchmark-contamination failure mode decontaminate() checks for,
    * prevented at split time). `pairs` is any (doc_a, doc_b) similarity
    * edge table (minHashLsh, simHash, semantic dedup); clusters come from
    * Dedup.canonicalize, and the split is the deterministic hash slice of
    * the CLUSTER id: test gets [0, testPct), val [testPct, testPct+valPct),
    * train the rest — seedless, reproducible across runs and engines, and
    * nested the same way stratifiedSample's slices are.
    *
    * Scale: canonicalize's label propagation dominates (edge-keyed
    * shuffles, lineage O(1) via localCheckpoint); the split itself is a
    * map-only expression on the labeled table.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      valPct: Int, testPct: Int): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100,
      "leakageSafeSplit: valPct/testPct must be >= 0 and sum to <= 100")
    Dedup.canonicalize(docs, idCol, pairs)
      .withColumn("slice", hash56(col("canonical_id").cast("string")) % 100)
      .select(col("doc"), col("canonical_id"),
        when(col("slice") < testPct, "test")
          .when(col("slice") < testPct + valPct, "val")
          .otherwise("train").as("split"))
  }
}
