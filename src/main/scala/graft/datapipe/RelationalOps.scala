package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators Spark lacks natively, built from compositions of
  * built-in operators (SURVEY.md par 2.10 / the custom-operator ladder:
  * compose before dropping to custom plans).
  */
object RelationalOps {

  /** As-of join (point-in-time-correct join): for every left row, attach
    * the LATEST right row of the same `key` whose `rightTs` is at or
    * before the left row's `leftTs` — the state-at-event-time lookup of
    * event/feature pipelines (quotes-at-trade-time, config-at-crawl-time).
    *
    * Algorithm: the union + carry-forward trick, not a range join — tag
    * both sides, union, ONE window per key ordered by (time, side) with
    * right rows sorting first at equal timestamps (inclusive `<=`
    * semantics), and `last(_, ignoreNulls)` carries the most recent right
    * payload forward onto every left row. One shuffle of (key, ts,
    * payload) rows, a single linear pass per partition, and — unlike the
    * naive `l JOIN r ON key AND r.ts <= l.ts` + argmax — ZERO pair
    * explosion: a key with m left and n right rows costs m+n, not m*n.
    * Hot-key skew shows up as a big window partition; the standard
    * escape is two-level bucketing (key, coarse time bucket) with
    * boundary carry-in, same shape.
    *
    * Contract: right's non-`key` column names (including `rightTs`) must
    * be disjoint from left's; right should be unique per (key, rightTs)
    * for the match to be well-defined (the same contract DuckDB's ASOF
    * JOIN — the oracle — imposes). Unmatched left rows keep nulls in the
    * right columns (LEFT OUTER semantics).
    */
  /** Recrawl / snapshot delta — classify every key across two crawl
    * snapshots by content hash: `unchanged`, `changed`, `new` (only in
    * the new snapshot), `gone` (only in the old). This is the CDX-style
    * crawl-maintenance signal that drives recrawl scheduling (changed
    * pages recrawl sooner), storage dedup (unchanged pages point at the
    * prior capture), and link-rot tracking (gone) — and, pipeline-side,
    * the incremental-processing gate: only `new`/`changed` keys re-enter
    * extraction.
    *
    * Scale shape: both snapshots project to (key, 16-byte md5) BEFORE
    * the join — payloads never move — then ONE full-outer join on the
    * key. At lakehouse scale both snapshot tables are bucketBy-written
    * on the key (the pinned zero-exchange co-located pattern), so the
    * diff of two 10^12-row crawls is an exchange-free per-bucket merge;
    * the verdict is a pure column CASE on the joined row.
    */
  def snapshotDelta(oldSnap: DataFrame, newSnap: DataFrame,
      keyCol: String = "url"): DataFrame = {
    // presence markers, not hash nullability, decide new/gone: a NULL
    // payload hashes to NULL, which would otherwise masquerade as a
    // missing key; hashes compare null-safely so two NULL-payload
    // captures of the same key read as unchanged
    val o = oldSnap.select(col(keyCol), md5(col("text")).as("old_h"),
      lit(true).as("old_p"))
    val n = newSnap.select(col(keyCol), md5(col("text")).as("new_h"),
      lit(true).as("new_p"))
    o.join(n, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("old_p").isNull, lit("new"))
          .when(col("new_p").isNull, lit("gone"))
          .when(col("old_h") <=> col("new_h"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  def asofJoin(left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String): DataFrame = {
    val rCols = right.columns.filterNot(_ == key)
    val overlap = rCols.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty,
      s"right columns must not collide with left columns: ${overlap.mkString(", ")}")
    val lStruct = struct(left.columns.map(left(_)).toIndexedSeq: _*)
    val rStruct = struct(rCols.map(right(_)).toIndexedSeq: _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType
    val lT = left.select(col(key).as("__k"), col(leftTs).as("__t"),
      lit(1).as("__side"), lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val rT = right.select(col(key).as("__k"), col(rightTs).as("__t"),
      lit(0).as("__side"), lit(null).cast(lType).as("__l"), rStruct.as("__r"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lT.unionByName(rT)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col("__m.*"))
  }

  /** Range (interval) join: every left row pairs with every right
    * interval containing its timestamp (`start <= ts < end`) — the
    * event-in-window join. Spark plans a raw `ON l.ts BETWEEN r.s AND
    * r.e` as BroadcastNestedLoopJoin (quadratic, broadcast-bound); this
    * instead BUCKETIZES time into `binSeconds` bins: each interval
    * explodes to the bins it overlaps, each left row maps to its single
    * bin, and the match becomes an EQUI-join on the bin key plus the
    * exact range filter. One hash shuffle on (bin), interval replication
    * = ceil(span/bin) rows — pick `binSeconds` near the typical interval
    * span so replication stays O(1) per interval. Works at any scale
    * where intervals are bounded; unbounded intervals want the
    * [[asofJoin]] carry-forward shape instead.
    *
    * Contract: right's column names must be disjoint from left's;
    * intervals with `end <= start` are empty and dropped (inner-join
    * semantics). Timestamps compare at microsecond precision.
    */
  /** Sessionization: group each key's events into sessions separated by
    * inactivity gaps of at least `gap` — the canonical clickstream /
    * crawl-visit operator. Spark-first: the built-in [[session_window]]
    * aggregation (one hash shuffle on key, sessions merged per partition
    * by Spark's native merging-sessions exec — the same plan Structured
    * Streaming uses, so the batch and streaming formulations coincide).
    * Emits one row per session: key, session bounds (min/max EVENT time,
    * not the window's `end = last + gap`, so results are gap-independent
    * facts about the data), event count, plus any caller aggregates.
    *
    * Boundary semantics (pinned by spec + oracle): an event exactly `gap`
    * after its predecessor still EXTENDS the session — Spark merges
    * touching windows (`next.start <= current.end`); only a strictly
    * larger gap closes a session.
    *
    * Scale: state is per-(key, session), never per-event, and the shuffle
    * carries only the projected aggregate inputs. Hot keys (one user with
    * millions of events) land in one task — the standard escape is a
    * coarse time-bucket pre-split with boundary merge, same shape as
    * [[asofJoin]]'s skew note.
    */
  def sessionize(events: DataFrame, key: String, ts: String, gap: String,
      extraAggs: Column*): DataFrame =
    events
      .groupBy(col(key), session_window(col(ts), gap))
      .agg(min(col(ts)).as("session_start"),
        (Seq(max(col(ts)).as("session_end"), count(lit(1)).as("n_events")) ++ extraAggs): _*)
      .drop("session_window")

  /** Stream-stream interval join — the fetch/parse (request/result)
    * correlation of a resident pipeline: every left event joins right
    * events of the same key whose timestamp lands in
    * `[leftTs, leftTs + within]`. Both sides carry watermarks and the
    * join condition is TIME-BOUNDED — that pair is exactly what lets
    * Structured Streaming evict join state: a buffered left row is
    * droppable once the right watermark passes `leftTs + within`, a right
    * row once the left watermark passes `rightTs`, so state is bounded by
    * watermark delay + interval span regardless of stream length. An
    * unbounded-condition stream join would hold both streams forever.
    *
    * Inner-join matches emit as soon as both sides have arrived (no
    * window-close wait). `withWatermark` is a no-op on batch frames, so
    * the same call runs as a plain interval join on batch inputs —
    * batch == streaming by construction. Contract: column names disjoint;
    * `key`/`rightKey` name the two join columns.
    */
  def streamIntervalJoin(left: DataFrame, right: DataFrame,
      key: String, rightKey: String, leftTs: String, rightTs: String,
      within: String, watermark: String): DataFrame = {
    val overlap = right.columns.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty,
      s"right columns must not collide with left columns: ${overlap.mkString(", ")}")
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        expr(s"$key = $rightKey AND $rightTs >= $leftTs AND " +
          s"$rightTs <= $leftTs + interval $within"))
  }

  def rangeJoin(left: DataFrame, right: DataFrame,
      leftTs: String, start: String, end: String,
      binSeconds: Long = 900): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val overlap = right.columns.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty,
      s"right columns must not collide with left columns: ${overlap.mkString(", ")}")
    val binUs = binSeconds * 1000000L
    // cast handles TIMESTAMP_NTZ inputs: both sides shift by the same
    // session-timezone offset, so bin assignment stays consistent and
    // the exact range filter below compares the original values
    def us(c: String) = s"unix_micros(cast($c as timestamp))"
    val lB = left.withColumn("__bin", expr(s"${us(leftTs)} div $binUs"))
    val rB = right.filter(col(end) > col(start))
      .withColumn("__bin", explode(sequence(
        expr(s"${us(start)} div $binUs"),
        expr(s"(${us(end)} - 1) div $binUs"))))
    lB.join(rB, Seq("__bin"))
      .filter(col(leftTs) >= col(start) && col(leftTs) < col(end))
      .drop("__bin")
  }

  /** HTTP cache-policy revalidation scheduling — the freshness half of
    * crawl maintenance (the e30 delta tells you WHAT changed; this tells
    * you WHEN to look): for each fetched page, derive the revisit
    * interval and the revalidation mode from its caching headers, RFC
    * 7234-flavored but crawl-scoped. TTL ladder (first hit wins):
    * `no-store`/`no-cache` → 0 (the response may not be reused — for a
    * crawler that means revisit at the politeness floor, not never);
    * `max-age=N` (case-insensitive, anywhere in the directive list);
    * `Expires - Date` when both are present (negative = already stale =
    * 0); else `defaultTtl`. The result clamps to [minTtl, maxTtl] —
    * a server advertising max-age=10^9 does not get to pin a crawl
    * schedule three decades out, and one advertising 1 s does not get
    * hammered. Mode: `no-store` forbids validator reuse →
    * `unconditional`; otherwise an ETag beats Last-Modified beats
    * nothing (`conditional_etag` / `conditional_modified` /
    * `unconditional`). Pure per-row Catalyst expressions (regexp
    * extract + CASE ladder), MAP-ONLY, zero shuffle at any scale.
    */
  /** Centi-integerization of the TPC-H money/quantity doubles: the
    * source doubles carry exactly two decimals, so floor(x*100 + 0.5)
    * recovers the exact integer cents on both engines and every
    * downstream aggregate is an ORDER-INDEPENDENT integer sum — a
    * double sum would differ between Spark's partial-aggregation tree
    * and DuckDB's single pass in the last ulps and break the oracle
    * hash (the e20 value_milli convention).
    */
  private def cents(c: String): Column =
    expr(s"cast(floor($c * 100 + 0.5) as bigint)")

  /** TPC-H Q1-shaped pricing summary — the relational-spine sanity row
    * over the standard tables (the analytics half of a corpus lakehouse
    * is ordinary star-schema SQL; this pins that the engine's planning
    * and the oracle conventions hold there too). All sums are exact
    * integer cents (x100), disc_price in 1e-4 dollars (cents x (100-d)),
    * charge in 1e-6 dollars — overflow bound ~1e11 per row, safe to
    * ~10^7 rows per group at Long range; averages are integer `div`.
    * One map-side-combined groupBy on a 2-value key — a single exchange
    * of (flag, status, 6 longs) rows at any scale.
    */
  def pricingSummary(lineitem: DataFrame, shipBefore: String = "1999-01-01"): DataFrame =
    lineitem
      .filter(expr(s"cast(l_shipdate as timestamp) <= timestamp'$shipBefore 00:00:00'"))
      .select(col("l_returnflag"), col("l_linestatus"),
        cents("l_quantity").as("qty_c"),
        cents("l_extendedprice").as("price_c"),
        cents("l_discount").as("disc_c"),
        cents("l_tax").as("tax_c"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("qty_c").as("sum_qty_c"),
        sum("price_c").as("sum_base_price_c"),
        sum(expr("price_c * (100 - disc_c)")).as("sum_disc_price_c4"),
        sum(expr("price_c * (100 - disc_c) * (100 + tax_c)")).as("sum_charge_c6"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty_c"), col("sum_base_price_c"),
        col("sum_disc_price_c4"), col("sum_charge_c6"),
        expr("sum_qty_c div count_order").as("avg_qty_c"),
        expr("sum_base_price_c div count_order").as("avg_price_c"),
        col("count_order"))

  /** TPC-H Q3-shaped shipping priority — the star join: a SMALL
    * dimension (segment-filtered customers — broadcast), the orders
    * fact filtered by date, lineitem revenue aggregated per order.
    * Revenue is exact integer 1e-4 dollars; top `k` by (revenue desc,
    * o_orderdate asc, l_orderkey asc) via orderBy+limit =
    * TakeOrderedAndProject. At 100 TB the customer side is the
    * classic broadcast dim and the orders-lineitem join shuffles on
    * the shared orderkey.
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      segment: String = "BUILDING", date: String = "1998-06-01", k: Int = 10): DataFrame = {
    val cust = customer.filter(col("c_mktsegment") === segment).select("c_custkey")
    val ord = orders
      .filter(expr(s"cast(o_orderdate as timestamp) < timestamp'$date 00:00:00'"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    val li = lineitem
      .filter(expr(s"cast(l_shipdate as timestamp) > timestamp'$date 00:00:00'"))
      .select(col("l_orderkey"),
        (cents("l_extendedprice") * (lit(100L) - cents("l_discount"))).as("rev_c4"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum("rev_c4").as("revenue_c4"))
      .orderBy(col("revenue_c4").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(k)
  }

  /** TPC-H Q5-shaped local-supplier volume — the join-depth stress of
    * the relational spine (q1 = pure aggregate, q3 = one star join,
    * q5 = six tables): revenue per nation for orders where customer
    * and supplier share the nation ("local" commerce), region-filtered
    * and date-windowed. Revenue in exact integer 1e-4 dollars (the
    * house cents convention).
    *
    * Scale shape: the region->nation chain collapses to a HANDFUL of
    * rows broadcast everywhere; customers/suppliers semi-filter
    * against it broadcast; the two REAL shuffles are orders x customer
    * on custkey and lineitem x orders on orderkey (fact-fact, key-
    * partitioned); the supplier side re-enters BROADCAST with the
    * local-nation equality folded into the join condition, so the
    * six-table query costs two exchanges + one aggregate at any scale.
    */
  def localSupplierVolume(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame, regionName: String = "ASIA",
      from: String = "1996-01-01", until: String = "1997-01-01"): DataFrame = {
    val nat = nation
      .join(broadcast(region.filter(col("r_name") === regionName)
        .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = customer.select("c_custkey", "c_nationkey")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_nationkey")
    val ord = orders
      .filter(expr(s"cast(o_orderdate as timestamp) >= timestamp'$from 00:00:00'") &&
        expr(s"cast(o_orderdate as timestamp) < timestamp'$until 00:00:00'"))
      .select("o_orderkey", "o_custkey")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_nationkey")
    val supp = supplier.select("s_suppkey", "s_nationkey")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nationkey", "n_name")
    lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        (cents("l_extendedprice") * (lit(100L) - cents("l_discount"))).as("rev_c4"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name").agg(sum("rev_c4").as("revenue_c4"))
      .orderBy(col("revenue_c4").desc, col("n_name"))
  }

  /** TPC-H Q18-shaped large-order customers: orders whose total line
    * quantity exceeds `minQtyC` cents of units, joined back to orders
    * and customers. The HAVING prunes on the aggregate BEFORE the
    * dimension joins — at scale the filter drops ~all orders, so the
    * joins see only the heavy tail (both then broadcastable).
    */
  def largeOrders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      minQtyC: Long = 15000L): DataFrame = {
    val heavy = lineitem.groupBy("l_orderkey")
      .agg(sum(cents("l_quantity")).as("total_qty_c"))
      .filter(col("total_qty_c") > minQtyC)
    heavy
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_name"), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), cents("o_totalprice").as("total_price_c"),
        col("total_qty_c"))
  }

  def revalidationPolicy(resp: DataFrame, defaultTtl: Long = 86400L,
                         minTtl: Long = 60L, maxTtl: Long = 2592000L): DataFrame = {
    require(minTtl >= 0 && minTtl <= maxTtl, "need 0 <= minTtl <= maxTtl")
    require(defaultTtl >= 0, "defaultTtl must be >= 0")
    val cc = lower(coalesce(col("cache_control"), lit("")))
    val maxAge = regexp_extract(cc, "(?:^|[,\\s])max-age=([0-9]+)", 1)
    val ttlRaw =
      when(cc.contains("no-store") || cc.contains("no-cache"), lit(0L))
        .when(maxAge =!= "", maxAge.cast("long"))
        .when(col("expires_ts").isNotNull && col("date_ts").isNotNull,
          greatest(col("expires_ts") - col("date_ts"), lit(0L)))
        .otherwise(lit(defaultTtl))
    val ttl = least(greatest(ttlRaw, lit(minTtl)), lit(maxTtl))
    val mode =
      when(cc.contains("no-store"), lit("unconditional"))
        .when(col("etag").isNotNull, lit("conditional_etag"))
        .when(col("last_modified_ts").isNotNull, lit("conditional_modified"))
        .otherwise(lit("unconditional"))
    resp.select(col("doc_id"), ttl.as("ttl_s"),
      (col("fetch_ts") + ttl).as("next_fetch_ts"), mode.as("mode"))
  }
}
