package graft

import graft.SparkEntry
import graft.model.Canon
import graft.operators.{Similarity, TimeSeries => TS}

/** Plan audits: assert the optimizer features the 100 TB design depends on
  * actually engage — not just that results are right (SURVEY.md §4).
  */
class PlanAuditSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("per-series top-n compiles to WindowGroupLimit (map-side rank limit)") {
    val p = plan(TS.readLast(Canon.events(spark, sf), Seq("click", "error"), 5))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("series predicate pushes through the canonical projection to the scan") {
    val p = plan(TS.readSince(Canon.events(spark, sf), Seq("click"), 0L))
    assert(p.contains("PushedFilters") && p.contains("event_type"), p)
  }

  test("tag filter stays in whole-stage codegen (no UDF, no interpreted HOF barrier)") {
    val df = TS.tagFilter(Canon.events(spark, sf),
      Seq(graft.functions.Tags.Group("k", Seq("42"), graft.functions.Tags.Eq)))
    val p = plan(df)
    // the Filter node must carry a codegen-stage marker `*(n)`; the HOF
    // formulation leaves it interpreted (bare `Filter`)
    assert("""\*\(\d+\) Filter""".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }

  test("brute-force similarity broadcasts the query side (no shuffle join)") {
    val p = plan(Similarity.bruteForceTopK(Canon.embeddings(spark, sf), Seq(0L, 1L), 5))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("top-customers join builds a shuffled hash table, never broadcasts customer") {
    // unfiltered customer is fact-scaled — the r2 fact-broadcast trap;
    // the structural no-fact-broadcast gate below also covers customer.
    // ShuffledHashJoin (not merge) is safe for THIS shape because the
    // build rows are slim (pruned key/name columns) and shuffle
    // partitions scale with SF, bounding the per-task build at
    // |customer|/parts — see the rationale at the q_join_top_customers
    // hint; wide-payload builds (dedup shingle joins) pin merge instead
    val p = plan(SparkEntry.queries("q_join_top_customers")(spark, sf))
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
  }

  test("Q3-shape query broadcasts the filtered dimension and pushes its filters") {
    val p = plan(SparkEntry.queries("q_tpch_shipping")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("PushedFilters") && p.contains("c_mktsegment"), p)
  }

  test("decontamination broadcasts the eval gram set (no shuffle of training grams)") {
    val p = plan(SparkEntry.queries("q_decontaminate")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("bloom decontamination probe is join-free (scan-local predicate)") {
    val p = plan(SparkEntry.queries("q_decontaminate_bloom")(spark, sf))
    assert(!p.contains("Join"), p) // the bit table replaced the gram join
    assert(p.contains("bloom_contains_any"), p)
  }

  test("heavy hitters reduce map-side to a fixed-size summary per task") {
    val p = plan(SparkEntry.queries("q_text_heavyhit")(spark, sf))
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_freq_sketch"), p) // the constant-size partial
  }

  test("stratified sample bounds the shuffle with a partial WindowGroupLimit") {
    val p = plan(SparkEntry.queries("q_sample_stratified")(spark, sf))
    assert(p.contains("WindowGroupLimit"), p)
    // the hash-sample gate must stay codegen'd at the scan, not interpreted
    // (codegen stage markers only exist on the FINAL plan → execute THIS
    // df's own QueryExecution; dfh.count() would finalize a separate one)
    val dfh = SparkEntry.queries("q_sample_hash")(spark, sf)
    dfh.queryExecution.toRdd.count()
    val ph = plan(dfh)
    assert("""\*\(\d+\) Filter""".r.findFirstIn(ph).isDefined, ph)
  }

  // Traverse a physical plan INCLUDING what hides behind leaf wrappers:
  // AdaptiveSparkPlanExec and QueryStageExec are LeafExecNodes (children =
  // Nil), so a naive plan.foreach never sees anything inside an
  // AQE-wrapped query — which is every query with an exchange. Cached
  // relations are similarly opaque. (The first version of these gates
  // used exec.foreach and was vacuous — caught in round-3 review.)
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec        => flatten(q.plan)
      case c: InMemoryTableScanExec => flatten(c.relation.cachedPlan)
      case r: ReusedExchangeExec    => flatten(r.child)
      case other                    => other.children.flatMap(flatten)
    })
  }

  // Like flatten, but yields each LEAF together with its ancestor path
  // (exchange wrappers included) — the unfiltered-broadcast gate needs to
  // know which filters sit on the way to a SPECIFIC scan, not merely
  // somewhere in the subtree.
  private def leafPaths(p: org.apache.spark.sql.execution.SparkPlan,
                        acc: Seq[org.apache.spark.sql.execution.SparkPlan])
      : Seq[(org.apache.spark.sql.execution.SparkPlan,
             Seq[org.apache.spark.sql.execution.SparkPlan])] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val path = acc :+ p
    p match {
      case a: AdaptiveSparkPlanExec => leafPaths(a.executedPlan, path)
      case q: QueryStageExec        => leafPaths(q.plan, path)
      case c: InMemoryTableScanExec => leafPaths(c.relation.cachedPlan, path)
      case r: ReusedExchangeExec    => leafPaths(r.child, path)
      case other if other.children.isEmpty => Seq((other, path))
      case other => other.children.flatMap(leafPaths(_, path))
    }
  }

  test("executed final plans: no fact-table broadcast, no array-keyed aggregation") {
    // Two structural gates over the EXECUTED (AQE-final) plan of every
    // query:
    //  1. r2 regression: statistics chose the filtered lineitem fact table
    //     as a broadcast build side at bench scale — an OOM at 100×. No
    //     lineitem/orders scan may appear under a BroadcastExchange.
    //  2. r2 regression: q_sim_ann distinct'ed on full vector payloads —
    //     no aggregate may be keyed on an array column (dedup on ids).
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.types.ArrayType
    def isAgg(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.isInstanceOf[HashAggregateExec] || p.isInstanceOf[ObjectHashAggregateExec] ||
        p.isInstanceOf[SortAggregateExec]
    Graft.register(spark)
    var sawBroadcast = 0
    var sawAgg = 0
    // Crash-isolated per query (r9 regression: one AIOOBE in a recipe
    // aborted the foreach ~25 queries in, leaving ~108 queries unaudited
    // while the suite reported only the crashing test). Accumulate every
    // failure and assert ONCE at the end — a bad recipe costs its own row,
    // never the rest of the roster's coverage.
    val gateFailures = scala.collection.mutable.ArrayBuffer.empty[String]
    // r16 codegen gate (VERDICT r15 item 2): with fallback disabled, a
    // whole-stage compile failure (janino "Code grows beyond 64 KB" —
    // the q_url_sitemaps silent-interpreted regression) THROWS instead of
    // quietly running the stage interpreted, so it lands in gateFailures
    // with the query's name. Restored after the loop — other suites keep
    // Spark's default behavior.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
    SparkEntry.queries.keys.toSeq.sorted.foreach { n => try {
      val qe = SparkEntry.queries(n)(spark, sf).queryExecution
      qe.toRdd.count() // execute THIS plan so AQE's choices are final
      val nodes = flatten(qe.executedPlan)
      // sanity: the traversal actually descends (a vacuous gate is worse
      // than none — it reads as coverage). A single node is legitimate
      // only for constant probes whose whole plan IS one local leaf
      // (q_health's one-row route answer).
      assert(nodes.length > 1 ||
        nodes.head.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec],
        s"$n: flatten saw only the AQE wrapper")
      sawBroadcast += nodes.count(_.isInstanceOf[BroadcastExchangeExec])
      sawAgg += nodes.count(_.isInstanceOf[HashAggregateExec])
      nodes.foreach {
        case b: BroadcastExchangeExec =>
          val leaves = flatten(b.child).filter(_.children.isEmpty).map(_.toString)
          val scanned = leaves.mkString("\n")
          assert(!scanned.contains("lineitem.parquet") && !scanned.contains("orders.parquet"),
            s"$n broadcasts a fact-table scan:\n$scanned")
          // every other SF-scaled table — the TPC-H satellites
          // (customer/part/supplier, 150k/200k/10k rows/SF) and the
          // corpus tables (documents/embeddings/events) — is
          // broadcastable ONLY when cut by a real selective predicate
          // (the Q3 mktsegment shape, a query-vector isin, the eval-set
          // gate); join-key IsNotNull inference alone doesn't count.
          // Fixed dims (nation, region) and derived small tables (IVF
          // centroid stores) are exempt. This is the r5 sweep class:
          // AQE elected full-corpus broadcasts in the simhash/
          // containment/neardup/range-join tile joins at bench scale.
          // "selective" = a non-IsNotNull pushed filter on the scan OR a
          // post-scan Filter with a non-IsNotNull conjunct anywhere in
          // the broadcast subtree (expression predicates like the
          // decontamination eval gate can't push to parquet)
          def conjuncts(e: org.apache.spark.sql.catalyst.expressions.Expression)
              : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
            case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
              conjuncts(l) ++ conjuncts(r)
            case x => Seq(x)
          }
          // PER-LEAF selectivity (r6 fix): a selective filter anywhere in
          // the broadcast subtree must not excuse an unrelated unfiltered
          // scan under the same exchange — the cut has to sit on the path
          // from the exchange to THAT scan, so it provably bounds the rows
          // that scan contributes to the broadcast
          def selectiveOnPath(path: Seq[org.apache.spark.sql.execution.SparkPlan]): Boolean =
            path.exists {
              case f: org.apache.spark.sql.execution.FilterExec =>
                conjuncts(f.condition).exists(c =>
                  !c.isInstanceOf[org.apache.spark.sql.catalyst.expressions.IsNotNull])
              // Ranking/Windowing offset tables: grouped on the partition
              // id (the repo's __graft_pid marker) → ≤ numPartitions rows
              // by construction, broadcastable at any corpus size
              case a: HashAggregateExec =>
                a.groupingExpressions.exists(_.toString.contains("__graft_pid"))
              case _ => false
            }
          Seq("customer.parquet", "part.parquet", "supplier.parquet",
              "documents.parquet", "embeddings.parquet", "events.parquet")
            .foreach { table =>
              leafPaths(b.child, Nil).filter(_._1.toString.contains(table))
                .foreach { case (leaf, path) =>
                  val s = leaf.toString
                  val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
                    .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
                  val selective = pushed.split(",").map(_.trim)
                    .exists(f => f.nonEmpty && !f.startsWith("IsNotNull")) ||
                    selectiveOnPath(path)
                  assert(selective,
                    s"$n broadcasts an UNFILTERED $table scan:\n$s")
                }
            }
        case a: HashAggregateExec =>
          a.groupingExpressions.foreach(k => assert(!k.dataType.isInstanceOf[ArrayType],
            s"$n aggregates on an array key: $k"))
        case a: ObjectHashAggregateExec =>
          a.groupingExpressions.foreach(k => assert(!k.dataType.isInstanceOf[ArrayType],
            s"$n aggregates on an array key: $k"))
        case a: SortAggregateExec =>
          a.groupingExpressions.foreach(k => assert(!k.dataType.isInstanceOf[ArrayType],
            s"$n aggregates on an array key: $k"))
        //  3. r4 regression (q_ntile_quality): a SinglePartition exchange
        //     over raw scan output funnels the corpus through ONE task
        //     (unpartitioned windows, global sorts). Allowed only over
        //     aggregated input — a global agg's partial/final exchange
        //     and the tiny per-partition offset tables in Ranking are
        //     bounded by construction; a scan-fed one never is.
        case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
          val sub = flatten(e.child)
          val scansFile = sub.filter(_.children.isEmpty).exists(_.toString.contains(".parquet"))
          assert(sub.exists(isAgg) || !scansFile,
            s"$n funnels un-aggregated scan output through a SinglePartition exchange:\n$e")
        case _ =>
      }
    } catch {
      case e: Throwable if scala.util.control.NonFatal(e) =>
        gateFailures += s"$n: ${e.getClass.getSimpleName}: ${e.getMessage}"
    }}
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
    assert(gateFailures.isEmpty,
      s"${gateFailures.size} queries failed the structural gate:\n${gateFailures.mkString("\n")}")
  }

  test("hotkey sessionize never broadcasts (every table in it is user-scale)") {
    // the Windowing offset tables under a HIGH-cardinality key are
    // user-count-scale — a broadcast there is the fact-broadcast trap in
    // derived-table form, invisible to the scan-based gate below
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    Graft.register(spark)
    val qe = SparkEntry.queries("q_sessionize_hotkey")(spark, sf).queryExecution
    qe.toRdd.count()
    val b = flatten(qe.executedPlan).filter(_.isInstanceOf[BroadcastExchangeExec])
    assert(b.isEmpty, s"q_sessionize_hotkey broadcasts:\n${b.mkString("\n")}")
  }

  test("two-pass ranking/windowing scan the corpus ONCE (AQE stage reuse)") {
    // Ranking/Windowing reference their range-partitioned input from two
    // lineage branches (offset side + data side; Windowing adds the
    // frame self-join). AQE stage reuse must collapse those to a single
    // physical scan — a regression here silently doubles or quadruples
    // the 100 TB read. Node VISITS > 1 are fine (reused stages are
    // referenced from several places); distinct scan OBJECTS are not.
    Graft.register(spark)
    for (n <- Seq("q_ntile_quality", "q_moving_avg")) {
      val qe = SparkEntry.queries(n)(spark, sf).queryExecution
      qe.toRdd.count()
      val scans = flatten(qe.executedPlan)
        .filter(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
      assert(scans.nonEmpty, s"$n: no file scan found")
      val unique = scans.map(System.identityHashCode).distinct
      assert(unique.size == 1, s"$n physically scans the corpus ${unique.size} times")
    }
  }

  test("frequency joins build a shuffled hash table, never broadcast the count side") {
    // commonness/novelty join exploded occurrences against a DERIVED
    // frequency table (token/shingle counts over the whole corpus) —
    // |vocab| is unbounded on hapax-heavy corpora, so AQE's bench-scale
    // broadcast election is the r5 trap in derived-table form; the
    // shuffle_hash pin (slim (key,count) build rows) must hold
    import graft.operators.TextOps
    for (df <- Seq(TextOps.commonness(Canon.documents(spark, sf)),
                   TextOps.ngramNovelty(Canon.documents(spark, sf), 3))) {
      val p = plan(df)
      assert(p.contains("ShuffledHashJoin"), p)
      assert(!p.contains("BroadcastHashJoin"), p)
    }
    // integrity: full-outer of pre-aggregated id multiplicities — full
    // outer cannot broadcast in Spark, and both sides must pre-aggregate
    // BEFORE the join (the shuffle moves one slim row per distinct id)
    val qe = SparkEntry.queries("q_integrity")(spark, sf).queryExecution
    qe.toRdd.count()
    val pi = qe.executedPlan.toString
    assert(pi.contains("FullOuter"), pi)
    assert(!pi.contains("BroadcastHashJoin") && !pi.contains("BroadcastNestedLoopJoin"), pi)
  }

  test("native cosine expression appears in the generated plan (codegen'd)") {
    val df = Similarity.nearDupPairs(Canon.embeddings(spark, sf), tau = 0.99)
    assert(plan(df).contains("cosine_sim"), plan(df))
  }

  test("exact near-dup pairs plan is a blocked equi-join, not a nested-loop cartesian") {
    val df = Similarity.nearDupPairs(Canon.embeddings(spark, sf), tau = 0.4)
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // the only broadcast is the tiny block-pair table; the tile join is an
    // equi hash join on the block id
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("SortMergeJoin"), p)
  }

  test("InferTimePredicates pushes derived raw-ts bounds to the parquet scan") {
    Graft.register(spark) // attaches the optimizer rule
    val p = plan(TS.readRange(Canon.events(spark, sf), Nil, 1704844800000000L, 1705708800000000L))
    // the adapter derives ts_us = unix_micros(cast(ts)) from the NTZ column;
    // the rule must add pushable bounds on the RAW ts column — rendered by the
    // parquet source as the NTZ instant (µs-bijective, so the bound is exact)
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(ts,2024-01-10T00:00"), p)
    // and results are unchanged
    val n = TS.readRange(Canon.events(spark, sf), Nil, 1704844800000000L, 1705708800000000L).count()
    assert(n > 0)
  }

  test("InferTimePredicates handles literal-on-left comparisons too") {
    Graft.register(spark)
    import org.apache.spark.sql.functions.{col, lit}
    val ev = Canon.events(spark, sf)
    // 5 <= ts_us micros-derived column, literal on the LEFT — must still
    // derive a pushed raw-ts lower bound (was a dead match arm in round 1)
    val lo = 1704844800000000L
    val df = ev.filter(lit(lo) <= col("ts_us"))
    val p = plan(df)
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(ts,2024-01-10T00:00"), p)
    // and the mirrored upper bound: ts_us <= lit on the RIGHT of the literal
    val hi = 1705708800000000L
    val p2 = plan(ev.filter(lit(hi) >= col("ts_us")))
    assert(p2.contains("LessThanOrEqual(ts,"), p2)
  }

  test("no cartesian/nested-loop joins anywhere in the query set") {
    Graft.register(spark)
    // q_sim_topk/q_sim_filtered deliberately broadcast the 10-row query
    // batch into a non-equi join (BNLJ with a tiny build side IS the
    // intended shape for the exact scoring pass); q_drift crosses two
    // aggregate-derived tables BOUNDED BY CONFIGURATION (#sources ×
    // top-V vocab) — the sanctioned model-matrix cartesian
    // q_delete_lifecycle combines two ONE-ROW router acks (global
    // aggregates) with a 1×1 crossJoin — bounded by construction
    val allowedBnlj =
      Set("q_sim_topk", "q_sim_filtered",
        "q_drift", "q_drift_psi", "q_drift_jsd", "q_stream_drift",
        "q_delete_lifecycle")
    val allowedCartesian =
      Set("q_drift", "q_drift_psi", "q_drift_jsd", "q_stream_drift",
        "q_delete_lifecycle")
    // crash-isolated per query — same rationale as the structural gate
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.keys.toSeq.sorted.foreach { n => try {
      val p = plan(SparkEntry.queries(n)(spark, sf))
      if (!allowedCartesian(n) && p.contains("CartesianProduct"))
        failures += s"$n plans a CartesianProduct"
      if (!allowedBnlj(n) && p.contains("BroadcastNestedLoopJoin"))
        failures += s"$n plans a BNLJ"
    } catch {
      case e: Throwable if scala.util.control.NonFatal(e) =>
        failures += s"$n: ${e.getClass.getSimpleName}: ${e.getMessage}"
    }}
    assert(failures.isEmpty,
      s"${failures.size} queries failed the join gate:\n${failures.mkString("\n")}")
  }

  test("aggregation uses partial (map-side) aggregation before the shuffle") {
    val df = TS.aggregateBySeries(Canon.events(spark, sf), TS.Mean)
    val p = df.queryExecution.executedPlan.toString
    // two HashAggregate phases around the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }
}
