package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.datapipe.GraphOps

/** Adversarial-skew armor for the host-graph family (e23/e44/e46/e48/
  * e49/e65) — the graph twin of the dedup family's 10k-clone LSH test
  * (DataPipeSpec "LSH skew armor"). The link-farm / mega-hub input is
  * the exact shape these ops exist to survive (their docstrings cite
  * it); small hand fixtures never exercise it, so this suite drives the
  * family with:
  *
  *   - a STAR: one hub host fed by 100k distinct leaf hosts — the
  *     organic mega-hub. The hub's name sorts lexicographically FIRST,
  *     so a name-ordered wedge orientation in [[GraphOps.triangles]]
  *     would enumerate ~100k^2/2 = 5x10^9 wedge pairs at the hub; the
  *     degree-ordered (Schank-Wagner) orientation must keep it O(m).
  *   - a RING: a 60-host bidirectional clique — the canonical link
  *     farm. Dense closure (cc = 1), full reciprocity, its own
  *     component.
  *
  * Each op must stay wall-bounded AND produce the hand-derivable
  * values on this graph. Bounds are generous (shared host): the
  * assertions exist to catch quadratic blow-ups (hours), not jitter.
  */
class GraphSkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var edges: DataFrame = _

  private val leaves = 100000
  private val ringN = 60
  // hub sorts lexicographically BEFORE every leaf ("aaa..." < "leaf...")
  // — the adversarial case for name-ordered wedge orientation
  private val hub = "aaahub.example.com"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graph-skew-spec")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val star = spark.range(leaves).select(
      concat(lit("leaf"), col("id"), lit(".example.com")).as("src"),
      lit(hub).as("dst"))
    val ring = spark.range(ringN.toLong * ringN)
      .select((col("id") % ringN).as("a"), (col("id") / ringN).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(concat(lit("farm"), col("a"), lit(".example.com")).as("src"),
        concat(lit("farm"), col("b"), lit(".example.com")).as("dst"))
    edges = star.union(ring).repartition(8).persist()
    edges.count()
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def timed[T](label: String, bound: Double)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < bound, f"$label took $sec%.1f s (bound $bound%.0f s) — blow-up")
    r
  }

  test("e23 hostRank survives the 100k-leaf star and ranks hub first") {
    val out = timed("hostRank", 120.0) {
      GraphOps.hostRank(edges, iters = 2).collect()
    }
    assert(out.length == leaves + 1 + ringN)
    val rank = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    val leafRank = rank("leaf0.example.com")
    // every leaf is identical by symmetry; the hub collects 100k
    // contributions and must dominate every other host
    assert(rank(hub) > 1000L * leafRank, s"hub=${rank(hub)} leaf=$leafRank")
    assert(rank("leaf99999.example.com") == leafRank)
    assert(rank("farm0.example.com") == rank(s"farm${ringN - 1}.example.com"),
      "clique symmetry broken")
    assert(rank.values.forall(_ >= 0L))
  }

  test("e44 HITS separates the star's hubs from its authority under skew") {
    val out = timed("hits", 120.0) {
      GraphOps.hits(edges, iters = 2).collect()
    }
    val byHost = out.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (hubHub, hubAuth) = byHost(hub)
    val (leafHub, leafAuth) = byHost("leaf0.example.com")
    // leaves point AT the hub: hub is the authority, leaves are hubs
    assert(hubAuth > leafAuth, s"hub auth $hubAuth <= leaf auth $leafAuth")
    assert(leafHub > hubHub, s"leaf hub $leafHub <= hub hub $hubHub")
    // clique symmetry: every farm host scores identically
    assert(byHost("farm0.example.com") == byHost(s"farm${ringN - 1}.example.com"))
  }

  test("e46 crawlDepth BFS reaches 100k hosts in one round table") {
    val s = spark; import s.implicits._
    val seeds = Seq(hub).toDF("host")
    val out = timed("crawlDepth", 120.0) {
      GraphOps.crawlDepth(edges, seeds, maxHops = 2).collect()
    }
    val depth = out.map(r => r.getString(0) ->
      (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(depth(hub) == 0)
    // star edges point leaf -> hub, so leaves are UNREACHABLE from the
    // hub (NULL depth, reported not dropped) — the directed contract
    assert(depth("leaf0.example.com") == -1)
    assert(depth.count(_._2 == -1) == leaves + ringN)
    // seeding a leaf reaches the hub at depth 1 and nothing else
    val out2 = GraphOps.crawlDepth(edges, Seq("leaf7.example.com").toDF("host"),
      maxHops = 2).collect()
    val d2 = out2.map(r => r.getString(0) ->
      (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(d2("leaf7.example.com") == 0 && d2(hub) == 1)
    assert(d2("leaf8.example.com") == -1)
  }

  test("e48 components: the star collapses to one 100001-host component, the farm to its own") {
    val out = timed("connectedComponents", 120.0) {
      GraphOps.connectedComponents(edges, maxRounds = 4).collect()
    }
    val comp = out.map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // hub sorts first -> it is the star component's min-label; every
    // leaf is 2 undirected hops from it, well inside 4 rounds
    assert(comp(hub) == ((hub, leaves + 1L)))
    assert(comp("leaf0.example.com") == ((hub, leaves + 1L)))
    assert(comp("leaf99999.example.com") == ((hub, leaves + 1L)))
    assert(comp("farm59.example.com") == (("farm0.example.com", ringN.toLong)))
  }

  test("e49 triangles: degree-ordered orientation keeps the lexicographically-first mega-hub O(m)") {
    val out = timed("triangles", 180.0) {
      GraphOps.triangles(edges).collect()
    }
    val byHost = out.map(r => (r.getString(0),
      (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    // star closes no triangles: hub degree 100k, tri 0, cc 0
    assert(byHost(hub) == ((leaves.toLong, 0L, 0L)))
    assert(byHost("leaf0.example.com") == ((1L, 0L, -1L)), "leaf cc must be NULL (degree < 2)")
    // clique: every farm host closes C(59,2) triangles, cc_ppm = 1e6
    val triEach = (ringN - 1).toLong * (ringN - 2) / 2
    assert(byHost("farm0.example.com") == (((ringN - 1).toLong, triEach, 1000000L)))
    assert(byHost(s"farm${ringN - 1}.example.com") == (((ringN - 1).toLong, triEach, 1000000L)))
  }

  test("e70 crawlBudget: 50%-mega-host frontier apportions exactly; boundary-class descent; partitioning-independent") {
    // the scheduling-family twin of the graph armor above: one host
    // holds HALF the corpus, and the other half is a 100k-host boundary
    // class sharing ONE remainder value — the exact shape that forces
    // the r5 threshold pick through its host-prefix descent (all 100k
    // leaves tie on rem; only the host-asc prefix of the class may win)
    val s = spark; import s.implicits._
    val pages = spark.range(leaves).select(lit(hub).as("host"))
      .union(spark.range(leaves).select(
        concat(lit("leaf"), col("id"), lit(".example.com")).as("host")))
    val budget = 997L
    val out = timed("crawlBudget", 120.0) {
      GraphOps.crawlBudget(pages.repartition(8), budget = budget,
        maxPerHost = 1000000L).collect()
    }
    // Hamilton exactness: uncapped quotas spend the budget to the unit
    assert(out.map(_.getLong(2)).sum == budget)
    // mega-host: base floor(997*1e5/2e5)=498, remainder 1e5 is the
    // global max -> +1
    val byHost = out.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byHost(hub) == 499L)
    // boundary class: all 100k leaves share rem=997; exactly deficit-1
    // = 498 of them — the host-asc prefix of the class — get the +1
    val extras = out.filter(_.getInt(3) == 1).map(_.getString(0)).toSet
    assert(extras.size == 499 && extras.contains(hub))
    val expectedLeaves = (0 until leaves).map(i => s"leaf$i.example.com")
      .sorted.take(498).toSet
    assert((extras - hub) == expectedLeaves,
      "boundary-class pick must be the lexicographic prefix of the tied class")
    // partitioning independence: a host-hashed 3-partition layout lands
    // on the identical table (the old TakeOrdered pick was already
    // deterministic; the threshold pick must stay so)
    val canon = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getBoolean(4))
    val out2 = GraphOps.crawlBudget(pages.repartition(3, col("host")),
      budget, 1000000L).collect().map(canon).sortBy(_._1)
    assert(out.map(canon).sortBy(_._1).sameElements(out2))
    graft.spark.Caches.drain()
  }

  test("e29/p5 politenessSchedule: mega-host frontier stays wall-bounded; kept rows are salt-independent") {
    // W8's salted two-stage top-N claims a mega-host's frontier never
    // pins one task AND that the salt never changes WHAT is kept — this
    // drives both claims with a host owning 50% of the frontier
    val s = spark; import s.implicits._
    val mega = spark.range(leaves).select(
      concat(lit(s"https://$hub/page/"), col("id")).as("to_url"),
      (col("id") % 1000).as("n_refs"), lit(true).as("allowed"))
    val rest = spark.range(leaves).select(
      concat(lit("https://leaf"), col("id"), lit(".example.com/")).as("to_url"),
      (col("id") % 7).as("n_refs"), lit(true).as("allowed"))
    val frontier = mega.union(rest).repartition(8)
    val run = (salt: Int) => timed(s"politenessSchedule(salt=$salt)", 120.0) {
      GraphOps.politenessSchedule(frontier, budget = 4, salt = salt).collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
        .sortBy(t => (t._2, t._3))
    }
    val a = run(8)
    // per-host cap holds everywhere; the mega-host emits exactly budget
    val perHost = a.groupBy(_._2).view.mapValues(_.length).toMap
    assert(perHost.values.forall(_ <= 4))
    assert(perHost(hub) == 4)
    // the mega-host's kept rows are its true global top-4 by
    // (n_refs desc, to_url asc) — the salted local stage must not have
    // evicted a global winner
    val expectTop = (0 until leaves)
      .map(i => (s"https://$hub/page/$i", (i % 1000).toLong))
      .sortBy { case (u, n) => (-n, u) }.take(4).map(_._1)
    assert(a.filter(_._2 == hub).sortBy(_._3).map(_._1).toSeq == expectTop)
    // slots are 0..3 with delay multiples — a zero-coordination fetch fan
    assert(a.filter(_._2 == hub).map(t => (t._3, t._4)).sorted.toSeq ==
      Seq((0, 0L), (1, 1000L), (2, 2000L), (3, 3000L)))
    // salt-independence: a different fan-out width keeps the SAME rows
    assert(a.sameElements(run(5)), "salt changed the kept set")
    graft.spark.Caches.drain()
  }

  test("e71 budgetedSchedule: mega-host frontier — quota binds the mega-host, composition stays bounded") {
    // the composed plan under the same 50% frontier concentration: the
    // mega-host's quota comes out of the SHARED budget, so its slots
    // must bind at min(quota, slots) while small hosts keep theirs
    val s = spark; import s.implicits._
    val mega = spark.range(leaves).select(
      concat(lit(s"https://$hub/page/"), col("id")).as("to_url"),
      (col("id") % 1000).as("n_refs"), lit(true).as("allowed"))
    val rest = spark.range(2000).select(
      concat(lit("https://leaf"), col("id"), lit(".example.com/")).as("to_url"),
      lit(1L).as("n_refs"), lit(true).as("allowed"))
    val frontier = mega.union(rest).repartition(8)
    // weights: hub 100k, 2000 leaves x1; budget 1009 (prime):
    // hub base = floor(1009*1e5/102000) = 989, each leaf base 0;
    // deficit lands on the largest remainders
    val out = timed("budgetedSchedule", 120.0) {
      GraphOps.budgetedSchedule(frontier, budget = 1009L, slots = 4,
        maxPerHost = 3L).collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(4)))
    }
    val hubRows = out.filter(_._2 == hub)
    // quota 3 (politeness cap maxPerHost=3 < slots=4) binds the mega-host
    assert(hubRows.length == 3, s"hub kept ${hubRows.length} slots, want 3")
    assert(hubRows.forall(_._4 == 3L))
    // its kept urls are the global top-3 by (n_refs desc, url asc)
    val expectTop = (0 until leaves)
      .map(i => (s"https://$hub/page/$i", (i % 1000).toLong))
      .sortBy { case (u, n) => (-n, u) }.take(3).map(_._1).toSet
    assert(hubRows.map(_._1).toSet == expectTop)
    // every kept row respects slot < quota; nothing exceeds the slots cap
    assert(out.forall(t => t._3 < t._4 && t._3 < 4))
    graft.spark.Caches.drain()
  }

  test("e65 hostScorecard: farm flagged ring_suspect, mega-hub flagged authority") {
    val out = timed("hostScorecard", 120.0) {
      GraphOps.hostScorecard(edges).collect()
    }
    val verdict = out.map(r => r.getString(0) -> r.getString(5)).toMap
    // every clique host reciprocates 100% of its outlinks
    assert(verdict("farm0.example.com") == "ring_suspect")
    assert((1 until ringN).forall(i => verdict(s"farm$i.example.com") == "ring_suspect"),
      "whole farm must be flagged")
    // the hub's rank is ~0.85*total vs mean 1/n — far past the 2x bar
    assert(verdict(hub) == "authority")
    assert(verdict("leaf0.example.com") != "ring_suspect")
  }
}
