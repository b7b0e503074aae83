package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.spark.Caches.RegisteredFrame

/** Iterative graph analytics over edge tables — the web-graph curation
  * layer (host-level PageRank is a standard training-corpus quality
  * signal: rank hosts by link authority, filter/weight documents by their
  * host's rank). Complements TrainingOps.dupClusters (label propagation):
  * that op converges a partition, this one converges a weighted score.
  */
object GraphOps {

  /** Host-level PageRank over a weighted edge list — in INTEGER
    * arithmetic so the result is bit-reproducible across runs, engines,
    * and partitionings (double summation is order-dependent; Long
    * addition and floor division are not). Ranks live on a fixed-point
    * scale (`scale` = total mass): per-link share each iteration is
    * floor(floor(rank * 85 / 100) / outdeg), the damped base is
    * floor(floor(scale * 15 / 100) / n). Mass lost to flooring and to
    * dangling nodes is NOT redistributed (the standard simplification;
    * rank ORDER is unaffected) — documented, and mirrored exactly by the
    * DuckDB oracle's unrolled iterations.
    *
    * Scale shape: per iteration, ONE shuffle joining ranks to edges on
    * src and ONE map-side-combined aggregation on dst — both on (host,
    * 8-byte long) rows, never on documents. The edge table (grouped +
    * out-degree-annotated) is persisted once and reused every iteration;
    * at 1000 executors, bucket it by src so the per-iteration join is
    * co-located. Lineage is truncated every round (localCheckpoint, the
    * d10 pattern) so the plan does not grow with `iters`; at production
    * scale checkpoint ranks to the lakehouse instead. The node count
    * (one scalar count()) is the only driver-side action.
    */
  def hostRank(edges: DataFrame, iters: Int = 3, scale: Long = 1000000000000L,
               truncateLineage: Boolean = true): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val w = edges.groupBy("src", "dst").agg(count(lit(1)).as("wt"))
    val od = w.groupBy("src").agg(sum("wt").as("outdeg"))
    val wd = w.join(od, "src").persist().registered
    val nodes = w.select(col("src").as("host"))
      .union(w.select(col("dst"))).distinct().persist().registered
    val n = nodes.count()
    if (n == 0) { wd.unpersist(); return nodes.select(col("host"), lit(0L).as("rank")) }
    val base = scale * 15 / 100 / n
    var ranks = nodes.select(col("host"), lit(scale / n).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = wd.join(ranks, wd("src") === ranks("host"))
        .select(col("dst"),
          (col("wt") * expr("((rank * 85) div 100) div outdeg")).as("c"))
        .groupBy("dst").agg(sum("c").as("c"))
      val next = nodes.join(contribs, nodes("host") === contribs("dst"), "left")
        .select(col("host"), (lit(base) + coalesce(col("c"), lit(0L))).as("rank"))
      // truncateLineage=false keeps the lazy 3-iteration plan visible
      // (PlanCheck); production always truncates per round
      ranks = if (truncateLineage) next.localCheckpoint() else next
    }
    wd.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    ranks
  }

  /** HITS hub/authority scoring (Kleinberg 1999) over the same weighted
    * edge table as [[hostRank]] — the complementary curation signal:
    * PageRank finds globally endorsed hosts, HITS separates DIRECTORY
    * hosts (hubs: link to many good authorities — aggregators, link
    * farms, blogrolls) from CONTENT hosts (authorities: linked by many
    * good hubs). A training pipeline weights documents by their host's
    * authority and treats high-hub/low-authority hosts as navigation
    * boilerplate sources.
    *
    * INTEGER arithmetic for bit-reproducibility (the [[hostRank]] rule):
    * each iteration computes raw authority = sum over inlinks of
    * wt * hub(src), then normalizes by FLOOR-DIVIDING every value by
    * d = max(1, floor(sum_raw / scale)) — a division-only rescale, no
    * value ever multiplied above its raw sum, so the overflow bound is
    * just totalWeight * scale < 2^63 (pick `scale` accordingly; the
    * multiply-then-divide form raw*scale/sum would overflow at
    * raw ~ 2^63/scale, far earlier). Hubs update symmetrically from the
    * fresh authorities. Values land on ~[0, scale]; mass lost to
    * flooring is not redistributed (rank order unaffected — documented,
    * mirrored exactly by the oracle's unrolled iterations).
    *
    * Scale shape: per iteration, TWO shuffles (join ranks to edges +
    * map-side-combined agg), each carrying (host, long) rows only; the
    * weighted edge table persists once and both passes reuse it; the
    * normalizer is ONE scalar sum per pass (the e23 count() pattern);
    * lineage truncates per round via localCheckpoint so the plan stays
    * flat in `iters`.
    */
  def hits(edges: DataFrame, iters: Int = 3, scale: Long = 1000000000L,
           truncateLineage: Boolean = true): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val w = edges.groupBy("src", "dst").agg(count(lit(1)).as("wt")).persist().registered
    val nodes = w.select(col("src").as("host"))
      .union(w.select(col("dst"))).distinct().persist().registered
    val n = nodes.count()
    if (n == 0) {
      w.unpersist()
      return nodes.select(col("host"), lit(0L).as("hub"), lit(0L).as("auth"))
    }
    def scalarSum(df: DataFrame): Long = {
      val r = df.agg(sum("raw")).head
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    var hub = nodes.select(col("host"), lit(scale / n).as("v"))
    var auth = nodes.select(col("host"), lit(0L).as("v"))
    for (_ <- 1 to iters) {
      val rawA = w.join(hub, w("src") === hub("host"))
        .select(col("dst"), (col("wt") * col("v")).as("c"))
        .groupBy("dst").agg(sum("c").as("raw"))
      val dA = math.max(1L, scalarSum(rawA) / scale)
      auth = nodes.join(rawA, nodes("host") === rawA("dst"), "left")
        .select(col("host"), coalesce(expr(s"raw div $dA"), lit(0L)).as("v"))
      if (truncateLineage) auth = auth.localCheckpoint()
      val rawH = w.join(auth, w("dst") === auth("host"))
        .select(col("src"), (col("wt") * col("v")).as("c"))
        .groupBy("src").agg(sum("c").as("raw"))
      val dH = math.max(1L, scalarSum(rawH) / scale)
      hub = nodes.join(rawH, nodes("host") === rawH("src"), "left")
        .select(col("host"), coalesce(expr(s"raw div $dH"), lit(0L)).as("v"))
      if (truncateLineage) hub = hub.localCheckpoint()
    }
    val res = hub.withColumnRenamed("v", "hub")
      .join(auth.withColumnRenamed("v", "auth"), "host")
    w.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    res
  }

  /** Inlink anchor-text profile per destination host: total inlinks,
    * distinct linking hosts, and the most frequent anchor text (ties
    * broken lexicographically — deterministic across partitionings).
    * Anchor text is the classic off-page relevance/quality signal for
    * corpus curation: a host whose inlinks all say "shop the big sale"
    * is scored differently from one whose anchors are topical.
    *
    * Scale shape: the edge table is persisted once (on a real pipeline
    * this is the materialized link-graph table that [[hostRank]] also
    * reads), then two aggregation trees run over it — (dst, anchor)
    * counts reduced map-side before the host-keyed shuffle, and a
    * distinct-source count (two-phase partial aggregate). The top
    * anchor is a `min(struct(-cnt, anchor))` aggregate, NOT a global
    * window — no single-partition sort anywhere; every shuffle carries
    * only (host, anchor, count) rows. The final join keys two
    * host-cardinality aggregates (AQE broadcasts the smaller side).
    */
  def anchorProfile(edges: DataFrame): DataFrame = {
    val e = edges.persist().registered
    val perAnchor = e.groupBy("dst", "anchor").agg(count(lit(1)).as("cnt"))
    val top = perAnchor.groupBy("dst").agg(
      sum("cnt").as("inlinks"),
      min(struct((-col("cnt")).as("nc"), col("anchor").as("a"))).as("t"))
    val srcs = e.select("dst", "src").distinct()
      .groupBy("dst").agg(count(lit(1)).as("src_hosts"))
    top.join(srcs, "dst").select(
      col("dst").as("host"), col("inlinks"), col("src_hosts"),
      col("t.a").as("top_anchor"), (-col("t.nc")).as("top_anchor_cnt"))
  }

  /** Crawl-frontier construction from the canonical resolved link graph:
    * distinct link targets NOT already crawled, with an in-degree
    * priority signal and a rule-based allow/block verdict (RefinedWeb-
    * style URL curation — spam paths and boilerplate nav pages never
    * enter the fetch queue). First matching rule wins:
    * `spam_path` (/promo/, /pick/), `nav_path` (/privacy, /imprint),
    * else `ok`.
    *
    * Scale shape: per-target aggregation (n_refs + distinct referrers)
    * is map-side combined before its url-keyed shuffle; the crawled-set
    * subtraction is a LEFT ANTI join on the url key — at web scale the
    * crawled set is the big side and this is the shuffle that matters
    * (bucket both tables by url-hash and it degenerates to a co-located
    * join; the frontier side is the small one). Rules are pure column
    * predicates in the aggregate's output stage — zero extra passes.
    *
    * `edges` = (src_url, to_url) canonical urls; `crawled` = one `url`
    * column. On this synthetic corpus the crawled set and the target set
    * are disjoint (pages link to nav/category/blogroll pages, not to
    * /doc/ urls), so the anti-join prunes nothing here — the overlap
    * path is pinned by the unit test; at real scale it prunes almost
    * everything (most links point at already-crawled pages).
    */
  /** RFC 9309 robots-rules filter — the protocol-correct companion of
    * [[crawlFrontier]]'s heuristic URL rules: each URL takes the LONGEST
    * matching path-prefix rule of its host, ALLOW wins ties at equal
    * length (RFC 9309 §2.2.2), and a URL with no matching rule (or a
    * host with no rules at all) is allowed. `rules` is the parsed
    * per-host robots.txt table (host, prefix, allow) — a fetcher
    * populates it in production; wildcard/$ extensions are out of scope
    * (prefix rules only, noted).
    *
    * Shape: one host-keyed LEFT join (a host's rule group is small — the
    * RFC caps robots.txt parse size at 500 KiB — so each URL replicates
    * by its host's rule count only), then longest-match as a per-url
    * `min(struct(-prefix_len, disallow_bit))` aggregate — the W3
    * no-window pattern, map-side combined before the url shuffle. The
    * oracle deliberately uses the WINDOW formulation instead
    * (algorithm-independent cross-check).
    */
  def robotsFilter(urls: DataFrame, rules: DataFrame): DataFrame = {
    val host = regexp_extract(col("to_url"), "https?://([^/]+)", 1)
    // a URL with no path component ("https://a.com") matches as "/" —
    // RFC 9309 reference parsers normalize the empty path before
    // matching, so a root Disallow blocks the host's root page too
    val path = when(regexp_extract(col("to_url"), "https?://[^/]+(/.*)", 1) === "", "/")
      .otherwise(regexp_extract(col("to_url"), "https?://[^/]+(/.*)", 1))
    urls.select(col("to_url"), host.as("host"), path.as("path"))
      .join(rules, Seq("host"), "left")
      .withColumn("hit",
        col("prefix").isNotNull && col("path").startsWith(col("prefix")))
      .groupBy("to_url")
      .agg(min(when(col("hit"),
        struct((-length(col("prefix"))).as("nl"),
          when(col("allow"), 0).otherwise(1).as("d")))).as("best"))
      .select(col("to_url"),
        coalesce(col("best.d") === 0, lit(true)).as("robots_allowed"))
  }

  /** Per-host politeness fetch schedule over the allowed frontier — the
    * crawl-side step between frontier construction ([[crawlFrontier]] /
    * [[robotsFilter]]) and the fetcher fleet: each host's queue is
    * serialized (one request per `delayMs`, the Crawl-delay contract)
    * and each crawl cycle takes at most `budget` URLs per host (the
    * RefinedWeb/Common-Crawl per-host budget). URLs are prioritized by
    * in-degree (`n_refs` DESC, url ASC tiebreak), so the kept set and
    * the slot order are pure functions of the data;
    * `fetch_offset_ms = slot * delayMs` is a coordination-free schedule
    * a fetcher fleet partitioned by host can obey independently.
    *
    * Scale shape — the t13 salted two-stage top-N: a plain
    * `row_number() OVER (PARTITION BY host)` would put a mega-host's
    * entire frontier in ONE task, so stage 1 ranks within
    * (host, h60(url) mod salt) — the hot host spreads over `salt`
    * tasks — and keeps each group's top `budget`; stage 2 re-ranks the
    * survivors (<= salt x budget rows per host, bounded however hot the
    * host). Any global top-`budget` row is top-`budget` within its salt
    * group AND every row ordered above it also survives stage 1, so
    * kept rows and slots equal the plain one-window formulation (the
    * oracle's form) for any salt — pinned by spec. Both shuffles carry
    * only (url, host, count) rows.
    *
    * `frontier` needs (to_url, n_refs, allowed) — [[crawlFrontier]]'s
    * shape, or [[robotsFilter]] output joined back on the frontier.
    */
  def politenessSchedule(frontier: DataFrame, budget: Int = 4,
      delayMs: Long = 1000L, salt: Int = 8): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    require(delayMs >= 0, "delayMs must be >= 0")
    require(salt >= 1, "salt must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val host = regexp_extract(col("to_url"), "https?://([^/]+)", 1)
    val order = Seq(col("n_refs").desc, col("to_url").asc)
    val urlSalt = pmod(
      conv(substring(md5(col("to_url")), 1, 15), 16, 10).cast("long"),
      lit(salt.toLong))
    val local = Window.partitionBy(col("host"), urlSalt).orderBy(order: _*)
    val global = Window.partitionBy(col("host")).orderBy(order: _*)
    frontier.filter(col("allowed"))
      .select(col("to_url"), host.as("host"), col("n_refs"))
      .withColumn("lrk", row_number().over(local))
      .filter(col("lrk") <= budget).drop("lrk")
      .withColumn("rk", row_number().over(global))
      .filter(col("rk") <= budget)
      .select(col("to_url"), col("host"),
        (col("rk") - 1).cast("int").as("slot"),
        ((col("rk") - 1).cast("long") * delayMs).as("fetch_offset_ms"))
  }

  /** SEO-level URL canonicalization — the crawl-dedup normalization that
    * sits ABOVE [[graft.core.Urls]]'s RFC 3986 layer (scheme/host case,
    * ports, dot segments): the same page hides behind `www.` prefixes,
    * fragments, tracking parameters (utm_*, gclid, fbclid, ref,
    * sessionid) and permuted query-param order, and a crawler that keys
    * its seen-set / dedup on the raw string fetches it once per variant.
    * Fold order (fixed, documented): strip fragment → fold `www.` →
    * split query → drop tracking + empty params → SORT survivors →
    * reassemble (empty query drops its `?`).
    *
    * Scale shape: entirely MAP-ONLY codegen'd string/array built-ins —
    * zero shuffle; the collapse it enables is then an exact-dedup
    * groupBy on `canonical_url` (d1's shape) or the W11 bloom keyed on
    * the canonical form. Expects (doc_id, url) with absolute http(s)
    * urls ([[graft.core.Urls.resolve]] output or a fetch log); non-url
    * strings pass through unchanged (no regexp matches ⇒ identity).
    */
  def canonicalizeUrls(urls: DataFrame): DataFrame = {
    val noFrag = regexp_replace(col("url"), "#.*$", "")
    val folded = regexp_replace(noFrag, "^(https?://)www\\.", "$1")
    val base = regexp_extract(folded, "^[^?]*", 0)
    val query = regexp_extract(folded, "\\?(.*)$", 1)
    val rawParams = filter(split(query, "&"), p => p =!= "")
    val tracking = Seq("utm_", "gclid=", "fbclid=", "ref=", "sessionid=")
    val kept = sort_array(filter(rawParams,
      p => !tracking.map(t => p.startsWith(t)).reduce(_ || _)))
    val canon = concat(base,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
    urls.select(col("doc_id"), col("url"),
      canon.as("canonical_url"),
      size(rawParams).cast("int").as("n_params_raw"),
      size(kept).cast("int").as("n_params_kept"),
      (canon =!= col("url")).as("changed"))
  }

  /** Broadcast Bloom-filter "seen" test over crawl candidates — the
    * classic frontier-at-scale structure: a fetcher fleet must answer
    * "have we crawled this url?" for every discovered link, and at
    * 10^12 crawled urls the exact anti-join ([[crawlFrontier]]'s form)
    * is the shuffle that dominates the cycle. The Bloom filter replaces
    * it with a MAP-ONLY membership test against `mBits` broadcast bits:
    * zero false negatives (every crawled url hits), a tunable false-
    * positive fraction (a FP means one known url is skipped a cycle —
    * recall loss, never a re-fetch), no shuffle at probe time.
    *
    * Unlike [[graft.datapipe.TrainingOps.incrementalDedup]] (Spark's
    * built-in murmur bloom as an exactness-preserving pre-gate), this
    * filter is DETERMINISTIC-BY-CONTRACT: k md5 positions per url
    * (`h60("bl<i>:" || url) mod mBits`), so the DuckDB oracle rebuilds
    * the identical bit set and the false-positive behavior itself is
    * verified, not just tolerated.
    *
    * Build shape: positions partial-aggregate into mBits/64 words via
    * bitwise-OR (associative+commutative ⇒ map-side combined; the
    * exchange carries at most mBits/64 rows per task), the word table —
    * bounded by FILTER size, never data size — collects to the driver
    * and inlines into the probe plan as a literal array (the CMS
    * broadcast pattern). Probe shape: `forall` over the k positions,
    * codegen'd array/bit ops, zero exchange. The `truly_crawled` /
    * `verdict` columns are the AUDIT half (they re-join the exact set to
    * measure the FP rate and pin the no-false-negative law); production
    * uses `bloom_hit` alone and never performs that join. Sizing at
    * scale: mBits ≈ -n·ln(fpp)/ln²2 (1.2 GB per 10^9 urls at 1% — per
    * EXECUTOR, once, vs a per-cycle shuffle of the crawled set), and
    * beyond single-broadcast size the filter splits into url-hash
    * partitioned slabs co-partitioned with the candidates.
    */
  def bloomSeen(candidates: DataFrame, crawled: DataFrame,
                mBits: Int = 4096, k: Int = 3): DataFrame = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      "mBits must be a power of two >= 64")
    require(k >= 1 && k <= 16, "k must be in [1, 16]")
    def positions(u: Column): Column = array((0 until k).map { i =>
      pmod(conv(substring(md5(concat(lit(s"bl$i:"), u)), 1, 15), 16, 10)
        .cast("long"), lit(mBits.toLong))
    }: _*)
    val masks = typedlit((0 until 64).map(j => 1L << j))
    val nWords = mBits / 64
    val words = new Array[Long](nWords)
    // branch point (the p1/p2 persist convention): the crawled set feeds
    // the build action NOW and the audit join later — without the persist
    // whatever pipeline produced it (here: the kernel parse) runs twice
    val cw = crawled.select(col("url"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).registered
    cw
      .select(explode(positions(col("url"))).as("p"))
      .select((col("p") / lit(64)).cast("int").as("wi"),
        element_at(masks, pmod(col("p"), lit(64L)).cast("int") + 1).as("b"))
      .groupBy("wi").agg(expr("bit_or(b)").as("w"))
      .collect().foreach(r => words(r.getInt(0)) = r.getLong(1))
    val wlit = typedlit(words.toSeq)
    val hit = forall(positions(col("to_url")), p =>
      element_at(wlit, (p / lit(64)).cast("int") + 1)
        .bitwiseAND(element_at(masks, pmod(p, lit(64L)).cast("int") + 1)) =!= 0)
    candidates.select("to_url").distinct()
      .withColumn("bloom_hit", hit)
      .join(cw.select(col("url").as("to_url")).distinct()
        .withColumn("tc", lit(true)), Seq("to_url"), "left")
      .select(col("to_url"), col("bloom_hit"),
        coalesce(col("tc"), lit(false)).as("truly_crawled"),
        when(coalesce(col("tc"), lit(false)) && col("bloom_hit"), "seen")
          .when(col("bloom_hit"), "false_positive")
          .when(!coalesce(col("tc"), lit(false)), "unseen")
          .otherwise("false_negative").as("verdict"))
  }

  /** The host curation table — one row per host with every host-level
    * signal the library computes, the table a crawl ACTUALLY consults
    * when it prioritizes hosts, weights documents, or blocks spam:
    * link-authority rank ([[hostRank]]), inlink/anchor profile
    * ([[anchorProfile]]), and crawled-page volume, full-outer-composed
    * so a crawled-but-unlinked host appears (rank 0 — a true rank is
    * always ≥ the damping base > 0, so 0 unambiguously means "not in
    * the graph") and a linked-but-uncrawled host appears (n_pages 0 —
    * exactly the rows a frontier scheduler wants most).
    *
    * Scale shape: `edges` persists at the branch point (it feeds the
    * rank iterations AND the anchor profile); every aggregation is
    * host-keyed on counter rows; the final joins key host-cardinality
    * aggregates against each other (AQE broadcasts the small sides).
    * `edges` = (src, dst, anchor) host-level; `pageHosts` = one `host`
    * row per crawled page.
    */
  def hostTable(edges: DataFrame, pageHosts: DataFrame): DataFrame = {
    val e = edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).registered
    val rank = hostRank(e.select("src", "dst"))
    val anchors = anchorProfile(e)
    val pc = pageHosts.groupBy("host").agg(count(lit(1)).as("n_pages"))
    rank.join(pc, Seq("host"), "full_outer")
      .select(col("host"), coalesce(col("rank"), lit(0L)).as("rank"),
        coalesce(col("n_pages"), lit(0L)).as("n_pages"))
      .join(anchors, Seq("host"), "left")
      .select(col("host"), col("rank"), col("n_pages"),
        coalesce(col("inlinks"), lit(0L)).as("inlinks"),
        coalesce(col("src_hosts"), lit(0L)).as("src_hosts"),
        col("top_anchor"),
        coalesce(col("top_anchor_cnt"), lit(0L)).as("top_anchor_cnt"))
  }

  /** One rule in the publicsuffix.org list format: `suffix` is the rule's
    * label string (for a wildcard rule, the TAIL after the `*.` — the `*`
    * label is implied), `wild` marks `*.`-rules (every direct child of
    * the tail is itself a public suffix), `exc` marks `!`-exception rules
    * (the named domain IS registrable despite a covering wildcard).
    */
  final case class PslRule(suffix: String, wild: Boolean = false,
      exc: Boolean = false) {
    /** Label count of the FULL rule (a wildcard's `*` counts). */
    def k: Int = suffix.count(_ == '.') + 1 + (if (wild) 1 else 0)
  }

  /** A deterministic public-suffix rule set exercising every PSL rule
    * class — plain TLDs, multi-label suffixes (`co.uk`), a private-
    * registry suffix (`github.io`: user sites are registration-level
    * siblings, exactly why per-domain caps must use the PSL and not
    * "last two labels"), a wildcard (`*.ck`) and its exception
    * (`!www.ck`). The real list is ~9k rules — still a driver-side
    * constant at scale (the list is public, versioned, and < 250 KB).
    */
  val DefaultPsl: Seq[PslRule] = Seq(
    PslRule("com"), PslRule("org"), PslRule("net"), PslRule("io"),
    PslRule("uk"), PslRule("co.uk"), PslRule("ac.uk"), PslRule("gov.uk"),
    PslRule("github.io"),
    PslRule("jp"), PslRule("co.jp"),
    PslRule("ck", wild = true),
    PslRule("www.ck", exc = true))

  /** Registered domain (eTLD+1) of a host column under publicsuffix.org
    * matching semantics: the prevailing rule is the exception rule if one
    * matches, else the matching rule with the most labels, else the
    * implicit `*` rule (unknown TLD ⇒ public suffix = last label); the
    * registered domain is the public suffix plus ONE more label, or NULL
    * when the host IS a public suffix (or a single dotless label).
    *
    * The rule set is static, so matching compiles to a pure MAP-ONLY
    * column expression (a `greatest` of per-rule `when` tests over the
    * host's label array — the annLshBuckets driver-side-constant
    * pattern): zero shuffle, codegen'd, safe to apply per-EDGE in graph
    * pipelines. This is the key a crawl pipeline caps and rolls up on —
    * spam farms hide behind thousands of subdomains of one registrable
    * domain, so host-level caps (t13) undercount them and page-level
    * caps miss them entirely.
    */
  def registeredDomain(host: Column,
      rules: Seq[PslRule] = DefaultPsl): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    // last k labels as a string; start clamps to 1 so the slice never
    // sees an out-of-range index when n < k (And does not short-circuit
    // in Catalyst — the guard alone would not protect the slice)
    def sufStr(k: Int): Column =
      array_join(slice(labels, greatest(n - lit(k - 1), lit(1)), lit(k)), ".")
    def best(rs: Seq[PslRule]): Column = {
      val scores = rs.map { r =>
        val matchLabels = if (r.wild) r.k - 1 else r.k
        val cond = (n >= r.k) && (sufStr(matchLabels) === r.suffix)
        when(cond, lit(if (r.exc) r.k - 1 else r.k)).otherwise(lit(0))
      }
      if (scores.isEmpty) lit(0) else greatest(scores :+ lit(0): _*)
    }
    val excBest = best(rules.filter(_.exc))
    val ps = when(excBest > lit(0), excBest)
      .otherwise(greatest(best(rules.filterNot(_.exc)), lit(1)))
    when(n > ps,
      array_join(slice(labels, n - ps, ps + lit(1)), ".")).otherwise(lit(null))
  }

  /** Per-registered-domain rollup of a page/host table: (domain, distinct
    * hosts, pages), with PSL-suffix-only and dotless hosts grouped under
    * `(none)`. The domain key derives map-only; the single aggregation is
    * host-cardinality (countDistinct partial-aggregates (domain, host)
    * pairs before the exchange — never page rows).
    */
  def domainRollup(pages: DataFrame): DataFrame =
    pages.select(col("host"),
        coalesce(registeredDomain(col("host")), lit("(none)")).as("domain"))
      .groupBy("domain")
      .agg(countDistinct(col("host")).as("n_hosts"),
        count(lit(1)).as("n_pages"))

  /** Redirect-chain resolution: follow `Location` edges (one outgoing
    * redirect per source url — an HTTP response has one Location) to the
    * final target, capped at `maxHops` like every real crawler (RFC 9110
    * leaves the limit to policy; browsers use ~20, crawlers ~5): a chain
    * still unterminated after the cap — including every cycle — is
    * status `capped`, error-as-data. The canonical consumer is the
    * frontier: fetching a redirect source is wasted budget, so the
    * frontier rewrites queued urls to their resolved targets and the
    * seen-set keys on the FINAL url (redirect aliases collapse).
    *
    * Scale shape: `maxHops` rounds of ONE (url-keyed) left join each
    * between the state (origin, cur, hops) and the edge table — rows
    * whose chain already terminated miss the join and carry forward
    * unchanged; lineage truncates per round (localCheckpoint, the
    * d10/e23 pattern) so the plan never grows with the cap; the final
    * status is one more left join against the distinct source set
    * (terminal = no outgoing edge). Everything shuffled is (url, url,
    * int) rows; at the lakehouse, bucket the edge table by src and the
    * per-round join co-locates.
    */
  def resolveRedirects(edges: DataFrame, maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).registered
    var state = e.select(col("src").as("origin"), col("dst").as("cur"),
      lit(1).as("hops"))
    for (_ <- 2 to maxHops) {
      state = state
        .join(e.select(col("src").as("cur"), col("dst").as("nxt")),
          Seq("cur"), "left")
        .select(col("origin"),
          coalesce(col("nxt"), col("cur")).as("cur"),
          (col("hops") + when(col("nxt").isNotNull, 1).otherwise(0)).as("hops"))
        .localCheckpoint()
    }
    state.join(e.select(col("src").as("cur")).distinct()
        .withColumn("more", lit(true)), Seq("cur"), "left")
      .select(col("origin").as("src"), col("cur").as("final_url"),
        col("hops").cast("int").as("hops"),
        when(col("more").isNull, "ok").otherwise("capped").as("status"))
  }

  /** Crawler-trap detection — the frontier's self-defense against
    * infinite URL families (calendar pages, session-id explosions,
    * faceted-search cross products): URLs whose paths differ only in
    * digit runs are ONE template (`/cal/2026/173` → `/cal/N/N`), and a
    * (host, template) family whose URL count blows past `minUrls` is a
    * trap — no human site has ten thousand genuinely distinct pages
    * under one numeric pattern, but a calendar generates one per day
    * forever. The schedule (e29) then budget-caps or drops the family;
    * without this, a single trap host absorbs a crawler's entire
    * politeness-limited throughput for that host producing near-dup
    * boilerplate d1/d2 must then throw away. Map-only template derive,
    * ONE map-side-combined (host, template) count — the shuffle carries
    * template strings, never URLs.
    */
  def trapDetection(urls: DataFrame, minUrls: Long = 50): DataFrame = {
    require(minUrls >= 1, "minUrls must be >= 1")
    val host = regexp_extract(col("url"), "https?://([^/]+)", 1)
    val path = regexp_extract(col("url"), "https?://[^/]+(/.*)?$", 1)
    urls.select(host.as("host"),
        regexp_replace(path, "[0-9]+", "N").as("template"))
      .groupBy("host", "template")
      .agg(count(lit(1)).as("n_urls"))
      .withColumn("trap", col("n_urls") >= minUrls)
  }

  /** rel=canonical cluster rollup — dedup by DECLARATION, the signal
    * the site itself hands the pipeline before any content hashing
    * runs: every page declaring the same canonical target is the same
    * logical document (print views, tracking-parameter variants, AMP
    * mirrors), so clustering on the declared target collapses them for
    * free and CROSS-HOST declarations (page on a.com declaring its
    * canonical on b.com) are the soft-redirect / scraper-mirror
    * fingerprint worth surfacing on its own. A page with no
    * declaration is its own canonical (coalesce to self — absent is
    * "I am canonical", per the HTML spec's default); exactly ONE hop
    * is honored, no chain resolution — the documented behavior of
    * production crawlers, which distrust canonical chains. Per
    * cluster: n_pages, distinct source hosts, cross-host declaration
    * count, and the min-url representative (deterministic under any
    * partitioning).
    *
    * Scale shape: ONE map-side-combined groupBy on the target string;
    * countDistinct expands to the standard two-phase partial
    * aggregation. Page bodies never reach the shuffle — the caller
    * scans directives map-side and ships (url, canonical) pairs only.
    */
  /** Dangling-outlink (link-rot) rate per source host — the crawl-
    * coverage/spam signal on the EDGE side of the graph: a host whose
    * outlinks mostly point at pages the crawl never captured is either
    * rotting (dead links), gated (paywalls/logins the fetcher bounced
    * off), or a spam farm pointing into the void — and in every case
    * its pages' outlink-based authority signals (e23/e44) are inflated
    * by edges that lead nowhere. Per source host: total resolved
    * outlinks, links whose target is absent from the crawled set, and
    * the dangling fraction in integer ppm.
    *
    * Scale shape: ONE url-keyed left join of the edge list against the
    * distinct crawled set (both sides bucket by url-hash at scale —
    * the e26 frontier's join key, reused), then a map-side-combined
    * host rollup over boolean counter rows; no page bytes anywhere.
    */
  def linkRot(edges: DataFrame, crawled: DataFrame): DataFrame = {
    val seen = crawled.select(col("url").as("to_url")).distinct()
      .withColumn("seen", lit(true))
    edges.join(seen, Seq("to_url"), "left")
      .select(regexp_extract(col("src_url"), "https?://([^/]+)", 1).as("host"),
        coalesce(col("seen"), lit(false)).as("ok"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_links"),
        sum(when(!col("ok"), 1L).otherwise(0L)).as("n_dangling"))
      .withColumn("dangling_ppm", expr("1000000 * n_dangling div n_links"))
  }

  /** Hreflang reciprocity audit — the multilingual-cluster validity
    * check: the hreflang contract requires DECLARATION SYMMETRY (if A
    * lists B as its German alternate, B must list A back; search
    * engines ignore one-sided declarations), and asymmetry is the
    * single most common hreflang misconfig — so a multilingual corpus
    * builder keys variant-alignment only on reciprocated pairs.
    * Per declared edge (src, lang, dst): reciprocated iff ANY reverse
    * declaration dst -> src exists (language-agnostic by design — the
    * reverse edge names SRC's language, not lang). One reversed-pair
    * self-join on (url, url) keys after a map-side distinct; edge
    * multiplicity on the probe side is preserved, the reverse side
    * dedups.
    */
  def hreflangReciprocity(edges: DataFrame): DataFrame = {
    val rev = edges.select(col("src").as("r_dst"), col("dst").as("r_src"))
      .distinct()
    edges.join(rev,
        col("src") === col("r_src") && col("dst") === col("r_dst"), "left")
      .select(col("src"), col("lang"), col("dst"),
        col("r_src").isNotNull.as("reciprocated"))
  }

  def canonicalClusters(pages: DataFrame): DataFrame = {
    def host(u: Column) = regexp_extract(u, "https?://([^/]+)", 1)
    pages.select(col("url"),
        coalesce(col("canonical"), col("url")).as("target"))
      .groupBy("target").agg(
        count(lit(1)).as("n_pages"),
        countDistinct(host(col("url"))).as("n_src_hosts"),
        sum(when(host(col("url")) =!= host(col("target")), 1L).otherwise(0L))
          .as("n_cross_host"),
        min("url").as("rep_url"))
  }

  /** Pagination-chain assembly over rel=next edges — parallel list
    * ranking (Wyllie pointer doubling) on the page-level FUNCTIONAL
    * graph, where e48's components answer "which cluster" on the
    * undirected host graph, this answers "which sequence, and where in
    * it": multi-page articles declare `<link rel=next>` chains, and a
    * training corpus wants one document per ARTICLE (stitch or pick
    * page 1), not one per page — so every page needs its chain id and
    * position. Each url has at most one next edge (self-loops dropped
    * first — a page that nexts to itself is degenerate chrome, making
    * it a terminal), so chains are linked lists and the tail (the page
    * with no next) is the natural chain id. Pointer doubling carries
    * (ptr, d, done): ptr is exactly 2^r hops ahead after r rounds —
    * or the tail, at exact distance d, once done. Doneness propagates
    * FROM the tail one combine per round (f(r) = f(r-1) + 2^(r-1),
    * f(0) = 0), so `doublingRounds` rounds resolve every page within
    * 2^rounds - 1 hops of its tail;
    * beyond the horizon tail/dist are NULL, which also makes
    * pagination CYCLES (the rel=next trap — page A nexts to B nexts
    * to A forever) come out NULL instead of looping: unresolved IS the
    * trap signal, the e46 convention. chain_len = max resolved
    * distance + 1 per tail (for a proper list, the page count; for
    * merging Y-shaped chains — messy real-world rel=next — the longest
    * branch).
    *
    * Scale shape: log2(max chain length) rounds, each ONE url-keyed
    * self-join shuffling (url, ptr, int, bool) rows only — the whole
    * point of doubling vs one-hop walking, 8 rounds cover a
    * 256-page chain (max dist 255); lineage truncates per round (the hostRank
    * convention) so the plan stays flat.
    */
  def paginationChains(edges: DataFrame, doublingRounds: Int = 3,
                       truncateLineage: Boolean = true): DataFrame = {
    require(doublingRounds >= 1 && doublingRounds <= 10,
      "doublingRounds must be in [1, 10]")
    val raw = edges.select(col("url"), col("next_url"))
    val e = raw.filter(col("url") =!= col("next_url")).distinct()
    // node set from RAW edges (the e48 convention): a self-loop-only
    // page still appears — as a terminal — instead of vanishing
    val nodes = raw.select(col("url"))
      .union(raw.select(col("next_url").as("url"))).distinct()
    var st = nodes.join(e, Seq("url"), "left")
      .select(col("url"),
        coalesce(col("next_url"), col("url")).as("ptr"),
        when(col("next_url").isNull, 0).otherwise(1).as("d"),
        col("next_url").isNull.as("done"))
    for (_ <- 1 to doublingRounds) {
      val p = st.select(col("url").as("p_url"), col("ptr").as("p_ptr"),
        col("d").as("p_d"), col("done").as("p_done"))
      // every ptr is itself a node, so the join is total
      val merged = st.join(p, st("ptr") === p("p_url"))
        .select(col("url"),
          when(col("done"), col("ptr")).otherwise(col("p_ptr")).as("ptr"),
          when(col("done"), col("d")).otherwise(col("d") + col("p_d")).as("d"),
          (col("done") || col("p_done")).as("done"))
      st = if (truncateLineage) merged.localCheckpoint() else merged
    }
    val res = st.select(col("url"),
      when(col("done"), col("ptr")).as("tail"),
      when(col("done"), col("d")).as("dist_to_tail"))
    val len = res.filter(col("tail").isNotNull)
      .groupBy(col("tail").as("t"))
      .agg((max(col("dist_to_tail")) + 1).as("chain_len"))
    res.join(len, res("tail") === len("t"), "left").drop("t")
  }

  /** Error-page phrases for [[soft404]] — matched case-insensitively as
    * plain substrings (no regex metacharacters allowed here: both the
    * Spark split-count and the DuckDB replace-count treat them
    * literally).
    */
  val Soft404Phrases: Seq[String] = Seq(
    "page not found", "404 error", "does not exist",
    "no longer available", "temporarily unavailable")

  /** Soft-404 detection — the status-vs-content reconciliation every
    * web-corpus ingest needs: servers routinely answer a dead URL with
    * HTTP 200 and an error PAGE, and those pages are pure template
    * boilerplate that poisons both dedup (thousands of near-identical
    * "not found" bodies per host collapse into giant d1/d2 clusters)
    * and the LM corpus itself. The classifier is the standard
    * conjunction: an error PHRASE alone is not enough (a news article
    * ABOUT 404s must survive — pinned by the long-body family), and a
    * thin page alone is not enough (stub articles are legitimate);
    * only phrase AND thin together read as a disguised error page.
    * Verdict precedence: `hard_error` (status >= 400 — the honest
    * case, whatever the body says) > `soft_404` (status < 400, at
    * least one phrase hit, fewer than `thinWords` words) > `ok`.
    * Output keeps n_words and phrase_hits so downstream can re-cut
    * the threshold without re-scanning bodies.
    *
    * Scale shape: pure per-row map, zero exchange — phrase counts are
    * codegen'd split-counts (non-overlapping occurrences, the same
    * convention as the oracle's replace-count), the word count is the
    * repo's one whitespace-class convention. At 100 TB this rides the
    * scan; nothing moves.
    */
  def soft404(pages: DataFrame, thinWords: Int = 50): DataFrame = {
    require(thinWords >= 1, "thinWords must be >= 1")
    val low = lower(col("body"))
    val hits = Soft404Phrases.map { p =>
      (size(split(low, java.util.regex.Pattern.quote(p), -1)) - lit(1))
    }.reduce(_ + _)
    val trimmed = trim(col("body"))
    val nw = when(length(trimmed) === 0, lit(0))
      .otherwise(size(split(trimmed, TrainingOps.wsClass + "+")))
    pages.select(col("url"), col("http_status").cast("int").as("http_status"),
        nw.cast("int").as("n_words"), hits.cast("int").as("phrase_hits"))
      .withColumn("verdict",
        when(col("http_status") >= 400, lit("hard_error"))
          .when(col("phrase_hits") > 0 && col("n_words") < thinWords, lit("soft_404"))
          .otherwise(lit("ok")))
  }

  /** BFS crawl-depth labeling — min link-hops from a seed set, the
    * third classic host-graph curation signal next to [[hostRank]]
    * (global endorsement) and [[hits]] (hub/authority split): crawl
    * depth is THE feature crawl schedulers and quality classifiers key
    * on (pages far from any seed are disproportionately spam/trap
    * territory; Common-Crawl-style crawls bound their frontier by hop
    * count). Label propagation: seeds start at depth 0; each round
    * joins the current label table to the edge list and min-merges
    * `depth(src) + 1` into it, so after k rounds every host holds
    * min(true BFS depth, labels reachable in k hops) — exact for all
    * depths <= maxHops, NULL beyond the horizon (reported, not
    * dropped: "unreached from seeds" is itself the signal). A host's
    * label can only decrease, so multiple paths and cycles are handled
    * by the min — no visited-set needed; self-loops are filtered from
    * the propagation edges purely as an optimization (their d+1 label
    * never survives the min).
    *
    * Scale shape: per round ONE host-keyed join + ONE map-side-combined
    * min aggregation, both carrying (host, int) rows only — never the
    * corpus; lineage truncates per round (localCheckpoint) so the plan
    * stays flat in maxHops, the [[hostRank]] convention. maxHops is
    * small by design: real crawl policies cap at single digits, and
    * each extra hop is one more shuffle round.
    */
  def crawlDepth(edges: DataFrame, seeds: DataFrame, maxHops: Int = 3,
                 truncateLineage: Boolean = true): DataFrame = {
    require(maxHops >= 1 && maxHops <= 16, "maxHops must be in [1, 16]")
    val all = edges.select(col("src"), col("dst")).persist().registered
    val e = all.filter(col("src") =!= col("dst")).distinct().persist().registered
    val nodes = all.select(col("src").as("host"))
      .union(all.select(col("dst"))).union(seeds.select(col("host")))
      .distinct().persist().registered
    var dist = seeds.select(col("host")).distinct()
      .withColumn("depth", lit(0))
    for (_ <- 1 to maxHops) {
      val next = e.join(dist, e("src") === dist("host"))
        .select(col("dst").as("host"), (col("depth") + 1).as("depth"))
      val merged = dist.union(next).groupBy("host")
        .agg(min("depth").as("depth"))
      dist = if (truncateLineage) merged.localCheckpoint() else merged
    }
    val out = nodes.join(dist, Seq("host"), "left")
      .select(col("host"), col("depth").cast("int").as("depth"))
    val res = if (truncateLineage) out.localCheckpoint() else out
    all.unpersist(blocking = false)
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    res
  }

  /** Weakly-connected components over the host graph — the fourth
    * classic host-graph curation signal next to [[hostRank]], [[hits]]
    * and [[crawlDepth]]: component membership and size are what
    * mirror-farm and link-ring detection key on (a thousand hosts
    * forming one tight component that never touches the main web
    * component is a spam farm; the giant component is "the web").
    * Hash-min label propagation on the UNDIRECTED edge set: every host
    * starts labeled with itself; each round min-merges its neighbors'
    * labels, so after k rounds each host holds the lexicographic-min
    * host within k undirected hops — equal to its true component label
    * once k >= the component's eccentricity from the min host.
    * `maxRounds` bounds the rounds (each is one shuffle); the label
    * table after the final round is reported as-is, the [[crawlDepth]]
    * horizon convention — both the unit convergence test and the
    * DuckDB oracle pin the same k-round semantics. Self-loops are
    * dropped from the propagation edges (their label contributes
    * nothing to a min with itself); direction is erased by unioning
    * reversed edges before the distinct.
    *
    * Output: (host, comp, comp_size) — comp is the min-label, size the
    * host count under that label (the farm-detection feature).
    *
    * Scale shape: per round ONE host-keyed join + ONE map-side-combined
    * min aggregation over (host, label) string pairs — never documents;
    * lineage truncates per round (localCheckpoint). At production scale
    * swap string labels for 8-byte host hashes (strings kept here for
    * oracle bit-parity) and use large-star/small-star (Kiveris et al.)
    * to converge high-diameter graphs in O(log d) rounds; web host
    * graphs have small effective diameter, so plain hash-min with
    * single-digit rounds is the standard first tool.
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 4,
                          truncateLineage: Boolean = true): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 16, "maxRounds must be in [1, 16]")
    val raw = edges.select(col("src"), col("dst"))
    val und = raw.union(raw.select(col("dst"), col("src")))
      .filter(col("src") =!= col("dst")).distinct().persist().registered
    val nodes = raw.select(col("src").as("host"))
      .union(raw.select(col("dst"))).distinct().persist().registered
    var lab = nodes.withColumn("comp", col("host"))
    for (_ <- 1 to maxRounds) {
      val next = und.join(lab, und("src") === lab("host"))
        .select(und("dst").as("host"), col("comp"))
      val merged = lab.union(next).groupBy("host").agg(min("comp").as("comp"))
      lab = if (truncateLineage) merged.localCheckpoint() else merged
    }
    val sizes = lab.groupBy("comp").agg(count(lit(1)).as("comp_size"))
    val out = lab.join(sizes, Seq("comp"))
      .select(col("host"), col("comp"), col("comp_size"))
    val res = if (truncateLineage) out.localCheckpoint() else out
    und.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    res
  }

  /** Per-host triangle count + local clustering coefficient over the
    * undirected host graph — the fifth host-graph curation signal next
    * to [[hostRank]] / [[hits]] / [[crawlDepth]] /
    * [[connectedComponents]]: link farms are built as dense cliques
    * (every farm host links to every other), so a host whose
    * neighborhood closes into many triangles (cc near 1) inside a
    * small component is the canonical link-ring fingerprint, while
    * organic hub hosts have huge degree and near-zero closure.
    *
    * Counting uses the standard degree-ordered orientation (the
    * node-iterator++ / Schank-Wagner trick): each undirected edge
    * {a,b} is kept once, directed from the lower (degree, host) key to
    * the higher, and a triangle is an oriented wedge b<-a->c (with
    * key(b) < key(c)) whose closing edge b->c exists. Orientation by
    * degree bounds every node's oriented out-degree by O(sqrt(m)), so
    * a 10-million-degree organic hub enumerates O(m) wedge pairs
    * instead of the O(deg^2) a name-ordered orientation would allow —
    * the difference between hours and never on a web-scale graph. The
    * triangle SET is orientation-independent (any total order yields
    * each triangle exactly once), which is what lets the DuckDB oracle
    * count with plain name ordering and still hash-match, and the unit
    * test pins that invariance directly.
    *
    * Output: (host, degree, tri, cc_ppm) — degree = distinct
    * undirected neighbors, tri = triangles through the host, cc_ppm =
    * 1e6 * 2*tri div (degree*(degree-1)), NULL when degree < 2 (a
    * leaf has no closable wedge — reported as no-signal, never 0).
    *
    * Scale shape: degrees and the wedge join shuffle (host, host)
    * string pairs only — never documents; the wedge join is an
    * equi-join on the apex plus the closing-edge equi-join on both
    * endpoints (hash-partitioned, AQE-skew-splittable). At production
    * scale swap host strings for 8-byte hashes; the orientation trick
    * is already the production shape.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val raw = edges.select(col("src"), col("dst"))
    // node set from the RAW edges (the [[connectedComponents]] node
    // convention): a self-loop-only host stays in the output with
    // degree 0 rather than silently vanishing
    val nodes = raw.select(col("src").as("host"))
      .union(raw.select(col("dst"))).distinct().persist().registered
    val und = raw.union(raw.select(col("dst"), col("src")))
      .filter(col("src") =!= col("dst")).distinct().persist().registered
    val deg = und.groupBy(col("src").as("host"))
      .agg(count(lit(1)).as("degree")).persist().registered
    // orient low (degree, host) -> high; carry the dst key for the
    // wedge-pair ordering below
    val keyed = und
      .join(deg.select(col("host").as("src"), col("degree").as("sdeg")), Seq("src"))
      .join(deg.select(col("host").as("dst"), col("degree").as("ddeg")), Seq("dst"))
    val oriented = keyed.filter(
      (col("sdeg") < col("ddeg")) ||
        (col("sdeg") === col("ddeg") && col("src") < col("dst")))
      .select(col("src"), col("dst"), col("ddeg")).persist().registered
    val e1 = oriented.select(col("src").as("apex"), col("dst").as("b"), col("ddeg").as("bdeg"))
    val e2 = oriented.select(col("src").as("apex"), col("dst").as("c"), col("ddeg").as("cdeg"))
    val wedges = e1.join(e2, Seq("apex"))
      .filter((col("bdeg") < col("cdeg")) ||
        (col("bdeg") === col("cdeg") && col("b") < col("c")))
    val tris = wedges.join(
      oriented.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
      .select(col("apex"), col("b"), col("c"))
    val perHost = tris
      .select(explode(array(col("apex"), col("b"), col("c"))).as("host"))
      .groupBy("host").agg(count(lit(1)).as("tri"))
    val out = nodes.join(deg, Seq("host"), "left").join(perHost, Seq("host"), "left")
      .select(col("host"), coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .withColumn("cc_ppm",
        when(col("degree") >= 2, expr("1000000 * 2 * tri div (degree * (degree - 1))")))
    val res = out.localCheckpoint()
    nodes.unpersist(blocking = false)
    und.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    oriented.unpersist(blocking = false)
    res
  }

  /** Host-level link reciprocity — the LINK-EXCHANGE fingerprint, the
    * sixth classic host-graph curation signal beside [[hostRank]],
    * [[hits]], [[crawlDepth]], [[connectedComponents]] and
    * [[triangles]]: organic linking is strongly asymmetric (pages cite
    * authorities; authorities rarely cite back), so a host whose
    * out-neighbors overwhelmingly link BACK (`recip_ppm` near 1e6) is
    * the signature of paid link exchanges and mutual-promotion rings —
    * PageRank alone rewards them (the ring recycles rank), reciprocity
    * exposes them. Per host with at least one distinct non-self
    * out-neighbor: `n_out` (distinct out-neighbors), `n_reciprocal`
    * (those that link back), `recip_ppm = 1e6 * n_reciprocal div
    * n_out`. Self-loops and edge multiplicity are discarded first —
    * reciprocity is a property of the host PAIR, not the link volume.
    *
    * Scale shape: ONE distinct over (host, host) string pairs
    * (persisted — both sides of the reversal join and the out-degree
    * rollup read it), ONE equi-join of the edge set against its own
    * reversal on the full (src, dst) key — the e56 hreflang-reciprocity
    * shape lifted to the host graph — then map-side-combined rollups.
    * Never touches documents.
    */
  def reciprocity(edges: DataFrame): DataFrame = {
    val eg = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct().persist().registered
    val rec = eg.join(
      eg.select(col("dst").as("src"), col("src").as("dst")), Seq("src", "dst"))
      .groupBy(col("src").as("host")).agg(count(lit(1)).as("n_reciprocal"))
    val out = eg.groupBy(col("src").as("host")).agg(count(lit(1)).as("n_out"))
      .join(rec, Seq("host"), "left")
      .select(col("host"), col("n_out"),
        coalesce(col("n_reciprocal"), lit(0L)).as("n_reciprocal"))
      .withColumn("recip_ppm", expr("1000000 * n_reciprocal div n_out"))
    val res = out.localCheckpoint()
    eg.unpersist(blocking = false)
    res
  }

  /** Host curation scorecard — the composition the individual signals
    * exist FOR: one row per host joining link authority ([[hostRank]])
    * with the link-exchange fingerprint ([[reciprocity]]) and
    * out-degree into the verdict a corpus-curation pass actually
    * branches on. Precedence is the point: `ring_suspect`
    * (recip_ppm >= 5e5 over >= 2 out-neighbors) is checked BEFORE
    * `authority` (rank >= 2x the uniform share), because a link ring's
    * whole purpose is to manufacture authority — rank alone would
    * promote exactly the hosts this table exists to demote. `leaf`
    * marks hosts with only in-links (no reciprocity signal exists for
    * them — NULL, not 0); everything else is `normal`.
    *
    * Scale shape: both inputs are the persisted host-graph ops
    * (pointer-sized rows); ONE host-keyed left join + a 1-row node
    * count broadcast-cross. Documents are never touched.
    */
  def hostScorecard(edges: DataFrame): DataFrame = {
    val ranks = hostRank(edges)
    val rec = reciprocity(edges)
    val n = ranks.agg(count(lit(1)).as("n"))
    ranks.join(rec, Seq("host"), "left")
      .crossJoin(n)
      .withColumn("verdict",
        when(col("recip_ppm") >= 500000 && col("n_out") >= 2, lit("ring_suspect"))
          .when(col("rank") >= expr("2 * (1000000000000 div n)"), lit("authority"))
          .when(col("n_out").isNull, lit("leaf"))
          .otherwise(lit("normal")))
      .select("host", "rank", "n_out", "n_reciprocal", "recip_ppm", "verdict")
  }

  /** Sitemap-vs-crawl coverage reconciliation — the audit that closes
    * the crawl-discovery loop: sitemaps ([[graft.core.Sitemaps]], e37)
    * declare what a host SAYS it has; the crawl log records what was
    * actually FETCHED. Per host this reports both counts, the overlap,
    * `missing` (declared but never crawled — frontier gaps, or a stale
    * crawl), `extra` (crawled but undeclared — discovered via links,
    * or a sitemap that under-reports), and `coverage_ppm = 1e6 * both
    * div declared` (NULL when the host declared nothing — no fake
    * 100%). Inputs are bare `url` tables; both sides are de-duplicated
    * first, so re-listed or re-fetched URLs never double-count.
    *
    * Scale shape: two map-side-combined url-keyed distincts, ONE
    * url-keyed full-outer join (hash-partitioned — the natural key; no
    * skew beyond per-host volume, which the count-only host rollup
    * absorbs map-side), then the host rollup. Nothing ever carries
    * page bodies.
    */
  def sitemapCoverage(declared: DataFrame, crawled: DataFrame): DataFrame = {
    val d = declared.select(col("url")).distinct().withColumn("d", lit(1))
    val c = crawled.select(col("url")).distinct().withColumn("c", lit(1))
    d.join(c, Seq("url"), "full_outer")
      .select(regexp_extract(col("url"), "https?://([^/]+)", 1).as("host"),
        col("d"), col("c"))
      .groupBy("host").agg(
        sum(coalesce(col("d"), lit(0))).cast("long").as("n_declared"),
        sum(coalesce(col("c"), lit(0))).cast("long").as("n_crawled"),
        sum(when(col("d") === 1 && col("c") === 1, 1L).otherwise(0L)).as("n_both"))
      .withColumn("missing", col("n_declared") - col("n_both"))
      .withColumn("extra", col("n_crawled") - col("n_both"))
      .withColumn("coverage_ppm",
        when(col("n_declared") > 0, expr("1000000 * n_both div n_declared")))
  }

  /** URL query-parameter facet profile — the structural companion to
    * [[trapDetection]]'s path heuristics: faceted navigation and
    * session tokens multiply URLs without multiplying content, and the
    * dimension a crawler drowns in is visible as a PARAMETER whose
    * value cardinality keeps growing. Per (host, parameter): URL count,
    * distinct value count, and a verdict ladder — `tracking`
    * (name-based: utm_* and the session/click-id set; checked FIRST,
    * because session ids also have huge cardinality and the fix differs
    * — strip them at canonicalization, e32's job), `facet_trap`
    * (>= 16 distinct values — a crawl dimension to cap), `facet`
    * (2-15 — legitimate navigation), `constant` (1 — usually vestigial).
    * Valueless params ("?flag") profile as '' values, not NULL.
    *
    * Scale shape: map-side query-string parse + explode bounded by
    * params-per-url, then ONE (host, param) rollup with Spark's
    * two-phase distinct-value aggregation — URLs shuffle as short
    * (host, param, value) triples, never as full strings.
    */
  def paramProfile(urls: DataFrame): DataFrame = {
    // [^#]* not .*$ — the fragment is NOT part of the query string
    // (?page=2#results must profile page=2, not page=2#results), and
    // split(kv, "=", 2) keeps embedded '=' in the VALUE (base64 padding,
    // nested URLs) — only the first '=' separates name from value.
    val qs = regexp_extract(col("url"), "\\?([^#]*)", 1)
    val host = regexp_extract(col("url"), "https?://([^/]+)", 1)
    val kvs = urls.select(host.as("host"), explode(split(qs, "&")).as("kv"))
      .filter(col("kv") =!= "")
      .select(col("host"),
        element_at(split(col("kv"), "=", 2), 1).as("param"),
        coalesce(try_element_at(split(col("kv"), "=", 2), lit(2)), lit("")).as("value"))
    kvs.groupBy("host", "param")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("value")).as("n_values"))
      .withColumn("verdict",
        when(col("param").startsWith("utm_") ||
          col("param").isin("sid", "gclid", "fbclid", "sessionid"), lit("tracking"))
          .when(col("n_values") >= 16, lit("facet_trap"))
          .when(col("n_values") >= 2, lit("facet"))
          .otherwise(lit("constant")))
  }

  /** Host-quality ranking by WILSON LOWER BOUND — the statistic a
    * curation pass should rank hosts by instead of the raw ok-rate: a
    * host with 2/2 extractions ok has rate 1.0 but proves nothing, while
    * 180/200 proves a lot; the Wilson score interval's lower bound
    * (z = 2, ~95.45%) discounts small samples exactly enough that
    * sorting by it never promotes a lucky tiny host over a proven large
    * one. Formula (za = 2, phat = ok/n):
    *   (phat + 2/n - 2*sqrt(phat*(1-phat)/n + 1/n^2)) / (1 + 4/n)
    * evaluated in IEEE doubles with THIS exact operation order on both
    * engines — every step (divide, multiply, sqrt) is correctly rounded,
    * so identical order means bit-identical output and the oracle gate
    * works on floating point for once. Verdict ladder: `low_sample`
    * first (n below `minN` — the bound is mathematically fine there but
    * curation wants the explicit flag), then `trusted` at lower bound
    * >= 0.5, else `suspect`.
    *
    * Scale shape: ONE map-side-combined (host, n, ok) rollup; the Wilson
    * arithmetic is per-host scalar work on the aggregate rows.
    */
  def hostWilson(pages: DataFrame, minN: Long = 8L): DataFrame = {
    require(minN >= 1, "minN must be >= 1")
    val agg = pages.groupBy("host").agg(
      count(lit(1)).as("n"),
      sum(when(col("ok"), 1L).otherwise(0L)).as("ok"))
    val nD = col("n").cast("double")
    val p = col("ok").cast("double") / nD
    val lower = (p + lit(2.0) / nD -
      lit(2.0) * sqrt(p * (lit(1.0) - p) / nD + lit(1.0) / (nD * nD))) /
      (lit(1.0) + lit(4.0) / nD)
    agg.select(col("host"), col("n"), col("ok"), lower.as("wilson_lower"))
      .withColumn("verdict",
        when(col("n") < minN, lit("low_sample"))
          .when(col("wilson_lower") >= 0.5, lit("trusted"))
          .otherwise(lit("suspect")))
  }

  /** Per-key fetch-burst detection over fixed time windows — the
    * anomaly signal a crawl scheduler watches (a host suddenly serving
    * 10x its usual rate usually means a trap sprung, a misconfigured
    * frontier, or a politeness bug): bucket events into
    * `windowSeconds` windows, then flag windows whose event count
    * exceeds `spikePpm` of the host's UNIFORM share (total/n_windows,
    * over the host's observed windows). All-integer: ratio_ppm =
    * 1e6 * count * n_windows div total, burst = ratio_ppm > spikePpm —
    * at the default 3e6, a window runs at 3x the host's own average.
    *
    * Scale shape: one (host, window) map-combined count, one host-level
    * rollup of those counts (window-cardinality rows, not events), one
    * broadcast-sized join back on host. No event row ever shuffles
    * twice; no windows-over-time-sorted-events anywhere.
    */
  def burstWindows(log: DataFrame, windowSeconds: Long = 600L,
      spikePpm: Long = 3000000L): DataFrame = {
    require(windowSeconds >= 1, "windowSeconds must be positive")
    // cast handles TIMESTAMP_NTZ inputs (the rangeJoin convention): the
    // session runs UTC, so the cast is an identity relabel. Window start
    // is FLOOR division (es - positive-modulus), not truncating `div`:
    // pre-1970 epochs in (-w, 0) must land in the [-w, 0) window, not
    // collapse into window 0 — the same trunc-vs-floor convention as
    // TrainingOps.partitionEvolutionPlan.
    val perWin = log
      .select(col("host"),
        expr("unix_seconds(cast(ts as timestamp))").as("es"))
      .select(col("host"),
        expr(s"es - ((es % $windowSeconds + $windowSeconds) % $windowSeconds)")
          .as("win_start"))
      .groupBy("host", "win_start").agg(count(lit(1)).as("n_events"))
    val perHost = perWin.groupBy("host").agg(
      sum(col("n_events")).as("total"), count(lit(1)).as("n_windows"))
    // ratio in DECIMAL(38,0): 1e6 * n_events * n_windows can pass 2^63
    // for extreme hosts (e.g. 1e6-event windows x 1e7 observed windows)
    // and would silently wrap as a Long; decimal holds any physically
    // possible input (1e6 * 1e15 events * 5.3e6 ten-minute windows per
    // century ~ 5e27 << 1e38) and div returns the same Long floor.
    perWin.join(broadcast(perHost), "host")
      .select(col("host"), col("win_start"), col("n_events"),
        expr("cast((cast(1000000 as decimal(38,0)) * n_events * n_windows) div total as bigint)")
          .as("ratio_ppm"))
      .withColumn("burst", col("ratio_ppm") > spikePpm)
  }

  /** Global fetch-budget allocation over hosts — the scheduling step
    * between frontier scoring (e26) and the politeness schedule (e29):
    * split a crawl round's total `budget` across hosts proportionally
    * to their page counts, EXACTLY (largest-remainder / Hamilton
    * method, the apportionment standard): base_i = floor(B*w_i/W),
    * then the B - sum(base) leftover units go +1 each to the hosts
    * with the largest remainders (B*w_i) mod W (ties by host asc,
    * pinned). A per-host cap then truncates (politeness ceiling);
    * capped hosts report `capped` so the scheduler can roll surplus
    * into the next round rather than silently under-spending.
    *
    * All-integer (oracle-reproducible); products ride DECIMAL(38,0)
    * (B * w_i overflows a Long at web scale — the e68 rule).
    *
    * Scale shape: ONE map-side-combined host rollup; scalars are two
    * host-cardinality aggregates; the extras set is picked by REMAINDER
    * THRESHOLD, never a global top-k — no TakeOrdered, no join, no
    * driver structure that grows with host cardinality:
    *
    *  1. remainder-value histogram `groupBy(rem).count` collected to
    *     the driver. rem is a function of n_pages alone, so the
    *     histogram has one row per DISTINCT page-count — the t57
    *     bound: k distinct positive counts sum to >= k(k+1)/2, so
    *     distinct values <= sqrt(2T) (~1.4e6 rows at T=1e12 pages,
    *     constant-bounded in practice by the count distribution).
    *  2. a driver prefix scan over the descending histogram finds the
    *     boundary remainder class: every host with rem STRICTLY above
    *     it gets +1 via a map-only filter.
    *  3. the boundary class (hosts whose remainders TIE — distinct
    *     page counts can collide on one remainder value, so the class
    *     may span several counts; the t57 sqrt bound above is therefore
    *     an UPPER bound on histogram rows, which is all the argument
    *     needs) is resolved by host-asc prefix descent:
    *     per-next-character class counts (<= alphabet-size rows per
    *     level, collected), whole prefix-classes taken by a map-only
    *     `substring < boundary-char` predicate, recursing only into
    *     the single boundary prefix-class until it fits a 4096-host
    *     literal pick. Every driver structure is alphabet- or
    *     4096-bounded; descent depth is bounded by host length and in
    *     practice 0-2 levels.
    *
    * The selected set is EXACTLY the old `orderBy(rem desc, host)
    * .limit(deficit)` set (ties by host asc, pinned) — the oracle is
    * unchanged.
    */
  def crawlBudget(pages: DataFrame, budget: Long = 100000L,
      maxPerHost: Long = 1000L): DataFrame = {
    require(budget >= 0, "budget must be nonnegative")
    require(maxPerHost >= 1, "maxPerHost must be positive")
    val w = pages.groupBy("host").agg(count(lit(1)).as("n_pages"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).registered
    val totRow = w.agg(sum(col("n_pages"))).head()
    if (totRow.isNullAt(0))
      return w.select(col("host"), col("n_pages"), lit(0L).as("quota"),
        lit(0).as("got_extra"), lit(false).as("capped"))
    val total = totRow.getLong(0)
    val base = w.select(col("host"), col("n_pages"),
      expr(s"cast((cast($budget as decimal(38,0)) * n_pages) div $total as bigint)").as("base"),
      expr(s"cast((cast($budget as decimal(38,0)) * n_pages) % $total as bigint)").as("rem"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).registered
    val deficit = budget - base.agg(sum(col("base"))).head().getLong(0)
    require(deficit >= 0, s"deficit $deficit out of range")
    val extra = extrasPredicate(base, deficit)
    base.select(col("host"), col("n_pages"),
      least(lit(maxPerHost),
        col("base") + when(extra, 1L).otherwise(0L)).as("quota"),
      when(extra, 1).otherwise(0).as("got_extra"),
      (col("base") + when(extra, 1L).otherwise(0L) > maxPerHost).as("capped"))
  }

  /** Membership predicate for [[crawlBudget]]'s largest-remainder extras
    * (the `deficit` hosts first by (rem desc, host asc)) as a map-only
    * Column — the threshold + boundary-class descent of the scaladoc
    * above. `base` must carry (host, rem) and be persisted (each descent
    * level runs one small aggregate against it).
    */
  private def extrasPredicate(base: DataFrame, deficit: Long): Column = {
    if (deficit == 0L) return lit(false)
    val hist = base.groupBy("rem").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    var above = 0L
    var i = 0
    while (i < hist.length && above + hist(i)._2 <= deficit) {
      above += hist(i)._2; i += 1
    }
    if (above == deficit) return col("rem") >= hist(i - 1)._1
    val (bRem, bCnt) = hist(i)
    val need = deficit - above // 1 <= need < bCnt
    val inClass = col("rem") === bRem

    // Driver-side orderings must match SPARK's string comparison —
    // UTF8String binary order, i.e. UTF-8 byte order — not Java's
    // UTF-16 code-unit order (they disagree where astral characters
    // meet U+E000..U+FFFF). Everything ASCII (every real hostname) is
    // identical under both; this keeps the exotic case correct too.
    val u8 = new Ordering[String] {
      def compare(a: String, b: String): Int = {
        val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var k = 0
        while (k < x.length && k < y.length) {
          val d = (x(k) & 0xff) - (y(k) & 0xff)
          if (d != 0) return d
          k += 1
        }
        x.length - y.length
      }
    }

    // host-asc prefix descent inside the boundary remainder class: take
    // the `need` lexicographically-smallest hosts of a class of `cnt`.
    // `depth` counts CODE POINTS consumed so far (Spark's substring is
    // code-point-indexed; prefix.length would miscount past an astral
    // boundary char). `h` null-coalesces the host ONCE so that an
    // out-of-contract null host is counted and matched consistently in
    // every stage (class counts, descent predicates, literal pick) —
    // a null that counted toward `cnt` but vanished from a filter would
    // desynchronize the prefix scan's cursor from the class sizes.
    val h = coalesce(col("host"), lit(""))
    def pick(prefix: String, depth: Int, cnt: Long, need: Long): Column = {
      val classPred = inClass && h.startsWith(prefix)
      if (cnt <= 4096L) {
        val hosts = base.filter(classPred).select(h)
          .collect().map(_.getString(0)).sorted(u8).take(need.toInt)
        h.isInCollection(hosts.toSeq)
      } else {
        val pos = depth + 1
        val cc = base.filter(classPred)
          .groupBy(substring(h, pos, 1).as("c"))
          .agg(count(lit(1)).as("cnt"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1)))
          .sortBy(_._1)(u8)
        var cum = 0L
        var j = 0
        while (j < cc.length && cum + cc(j)._2 <= need) { cum += cc(j)._2; j += 1 }
        require(j < cc.length,
          s"descent cursor overran its class counts (cum=$cum need=$need)")
        val taken = substring(h, pos, 1) < cc(j)._1
        if (cum == need) taken
        else taken || (substring(h, pos, 1) === cc(j)._1 &&
          pick(prefix + cc(j)._1, depth + 1, cc(j)._2, need - cum))
      }
    }
    (col("rem") > bRem) || (inClass && pick("", 0, bCnt, need))
  }

  /** Budget-composed fetch schedule — [[crawlBudget]] ∘
    * [[politenessSchedule]]: the fetch plan a crawl cycle actually
    * executes. The politeness schedule offers each host up to `slots`
    * ranked urls (salted two-stage top-N, skew-proof); the Hamilton
    * budget grants each host an integer quota out of the cycle's global
    * `budget`; the executed plan keeps a host's ranked slots strictly
    * below its quota (a host granted 2 of 4 slots fetches its top-2,
    * a zero-quota host fetches nothing). The granted quota rides along
    * so the fetcher fleet can report under-spend per host.
    *
    * Scale shape: the schedule's own shuffles plus ONE host-keyed join
    * against the quota table — host-cardinality rows, NOT url rows
    * (the schedule already capped urls at `slots` per host). No forced
    * broadcast: at web scale the quota side is 10^8 hosts and AQE
    * picks the join side; both inputs are already host-keyed. The
    * allowed frontier feeds BOTH branches (quota weights and the
    * schedule), so it persists at the branch point — the p1/p2/e28
    * convention; without it a composed upstream (crawlFrontier's
    * aggregation + anti-join) would execute twice.
    */
  def budgetedSchedule(frontier: DataFrame, budget: Long = 100000L,
      slots: Int = 4, maxPerHost: Long = 1000L, delayMs: Long = 1000L): DataFrame = {
    val host = regexp_extract(col("to_url"), "https?://([^/]+)", 1)
    val fr = frontier.filter(col("allowed"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).registered
    val quotas = crawlBudget(fr.select(host.as("host")), budget, maxPerHost)
      .select(col("host"), col("quota"))
    politenessSchedule(fr, budget = slots, delayMs = delayMs)
      .join(quotas, Seq("host"))
      .filter(col("slot") < col("quota"))
      .select(col("to_url"), col("host"), col("slot"),
        col("fetch_offset_ms"), col("quota"))
  }

  def crawlFrontier(edges: DataFrame, crawled: DataFrame): DataFrame = {
    val agg = edges.groupBy("to_url").agg(
      count(lit(1)).as("n_refs"),
      countDistinct(col("src_url")).as("n_srcs"))
    // https? — Urls.resolve emits both schemes as crawlable; an
    // https-only pattern would hand every http:// target rule='ok'
    val path = regexp_extract(col("to_url"), "https?://[^/]+(/.*)", 1)
    val rule = when(path.startsWith("/promo/") || path.startsWith("/pick/"), "spam_path")
      .when(path === "/privacy" || path === "/imprint", "nav_path")
      .otherwise("ok")
    agg.join(crawled.select(col("url").as("to_url")), Seq("to_url"), "left_anti")
      .select(col("to_url"), col("n_refs"), col("n_srcs"),
        rule.as("rule"), (rule === "ok").as("allowed"))
  }
}
