package graft.operators

import graft.CacheLedger
import graft.CacheLedger.Tracked
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (driver north star).
  *
  * Scale design: exact dedup is one hash-shuffle; MinHash/SimHash replace
  * the O(n²) pairwise comparison with band-bucket joins whose fan-in is the
  * duplicate-cluster size, so they survive 100 TB where `ngramJaccardPairs`
  * (the exact oracle-checkable variant) is for validation at test scale —
  * its shingle self-join explodes quadratically inside hot shingles, which
  * is precisely what LSH banding avoids.
  *
  * Caching note: the pair-finding operators persist internal indexes
  * (shingle sets, prefix index, pair list) that feed several sibling
  * branches of one query. Every persist goes through
  * [[graft.CacheLedger.Tracked.trackedCache]]: wrap each query's
  * build-and-consume in `CacheLedger.scoped { ... }` and the indexes are
  * unpersisted at scope exit; a session that skips scoping can reclaim
  * everything with `CacheLedger.releaseAll()` (lifecycle covered by
  * CacheLifecycleSpec cycling distinct corpora).
  *
  * Performance note: every pipeline below MATERIALIZES intermediate arrays
  * (tokens, shingles, signatures) as projected columns before fanning out
  * over them. Higher-order functions don't CSE their argument subtree — a
  * `transform` referencing an inline `split(...)` re-evaluates the regex
  * split per lambda application, which turns k-wide minhash into k×m
  * re-tokenizations per row. Projecting first makes each fan-out reference
  * a cheap attribute (and CollapseProject keeps multi-referenced expensive
  * projections un-inlined).
  */
object Dedup {

  /** Word n-gram shingles from a MATERIALIZED tokens column (distinct,
    * order-insensitive set per doc). Guarded for docs shorter than n tokens:
    * Spark's `sequence(0, -1)` would count DOWN (auto negative step), not
    * return empty.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    val idxs = when(size(toks) >= n, sequence(lit(0), size(toks) - n))
      .otherwise(array().cast("array<int>"))
    array_distinct(
      transform(idxs, i => concat_ws(" ", (0 until n).map(k => get(toks, i + k)): _*)))
  }

  /** id + shingle-set projection (tokens materialized in between). */
  private def shingleSets(df: DataFrame, n: Int, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("toks"))
      .select(col("id"), shinglesFromTokens(col("toks"), n).as("sh"))

  /** Exact dedup by content hash: one row per distinct text with the
    * representative (min id) and multiplicity. Single hash-aggregation —
    * the 100 TB path (md5 keys shuffle, not documents).
    */
  def exact(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  /** CCNet-style PARAGRAPH-level dedup — the boilerplate killer: crawl
    * corpora repeat navigation blocks, cookie banners and license
    * headers across millions of pages, and document-level dedup never
    * sees them. Split every doc at newlines, keep each paragraph's FIRST
    * corpus-wide occurrence (total order: (doc_id, paragraph index) — a
    * shared banner survives only in the earliest doc), and reassemble;
    * docs whose every paragraph was seen elsewhere drop out.
    *
    * Scale shape: one explode (fan-out ~paragraphs/doc), one hash
    * shuffle on the 16-byte paragraph hash whose per-key fan-in is the
    * paragraph's duplication count with a map-side partial
    * WindowGroupLimit (rank 1), one re-group by doc. No doc-payload
    * shuffle: rows carry single paragraphs.
    */
  def dedupParagraphs(df: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("para"))).orderBy(col(idCol).asc, col("pidx").asc)
    val parts = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pidx", "para")))
    // EMPTY paragraphs (blank lines) are document STRUCTURE, not content:
    // deduping them would strip blank-line separation from every doc but
    // the globally first — and would also funnel every blank line in the
    // corpus into ONE window partition (a skew bomb at 100 TB). They
    // bypass the window entirely and are always kept.
    val kept = parts.filter(col("para") =!= "")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn")
      .unionByName(parts.filter(col("para") === ""))
    kept.groupBy(idCol)
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("pidx"), col("para")))),
          e => e.getField("para")), "\n").as("text"),
        count(lit(1)).as("n_paras_kept"))
  }

  /** Corpus duplication report — the first number any dedup pipeline
    * produces: how many docs, how many distinct contents, what fraction
    * is duplicated mass. One pass, two hash-aggregates (count +
    * distinct-of-md5), no payload shuffle.
    */
  def stats(df: DataFrame, textCol: String = "text"): DataFrame =
    df.agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(col(textCol))).as("n_distinct"))
      .select(col("n_docs"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_docs"), 6)
          .as("dup_rate"))

  /** Exact near-duplicate pairs by n-gram Jaccard >= tau, via PREFIX
    * FILTERING (the AllPairs/PPJoin family, Bayardo et al. WWW'07 /
    * Chaudhuri et al. ICDE'06): order every doc's shingles by ascending
    * global frequency and join only each doc's first
    * ⌊(1-tau)·|s|⌋+1 shingles — two sets with Jaccard >= tau MUST share at
    * least one prefix element under any consistent global order, so the
    * candidate set is exact. Hot shingles land at the end of the ordering
    * and never enter the join, which is what kills the quadratic blowup the
    * naive inverted-index join suffers on skewed vocabularies.
    * Candidates are then verified with a full array_intersect.
    * A size filter (tau·|a| <= |b|) prunes length-incompatible pairs on
    * the join condition itself.
    */
  def ngramJaccardPairs(df: DataFrame, n: Int, tau: Double,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // shingles hashed to 64-bit and sets kept SORTED: the whole pipeline
    // (freq, rank, join keys, verification) runs on primitive longs. A
    // 64-bit collision inside one doc-pair's union (~1e3 elements) has
    // probability ~1e-13 — the string-vs-hash equivalence is covered by
    // the naive-comparison test on real corpora. The set is produced by
    // ONE native per-row pass (HashedShingles): the equivalent HOF chain
    // is re-evaluated wholesale inside scan filters when Catalyst
    // substitutes it into inferred predicates, which multiplied the
    // per-document tokenization cost several times over.
    val sets = df.select(col(idCol).as("id"),
      graft.functions.SketchExpressions.hashed_shingles(col(textCol), n).as("sh"))
      // feeds the frequency agg, the ranked index, and both verify joins —
      // cached, the per-doc shingle pass runs once instead of five times
      .trackedCache
    // global shingle frequency → a consistent total order (freq, hash)
    val freq = sets.select(explode(col("sh")).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("f"))
    val exploded = sets.select(col("id"), size(col("sh")).as("n_sh"),
      explode(col("sh")).as("shingle"))
    // rank shingles within each doc by the global order (freq asc, hash asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("f").asc, col("shingle").asc)
    // exploded/freq/prefixes are all corpus-scale: pin every one to the
    // SPILLABLE sort-merge join. Bench-scale statistics elect full
    // broadcasts (OOM at 100×), and a shuffled-hash build is no better —
    // its per-task hash relation must FIT IN MEMORY, which a corpus-scale
    // build side does not (the ×10 probe failed with "Can't acquire
    // 134217728 bytes to build hash relation" before this switch)
    val ranked = exploded.join(freq.hint("merge"), Seq("shingle"))
      .withColumn("pos", row_number().over(w))
    // prefix length p = |s| - ceil(tau*|s|) + 1
    val prefixes = ranked.filter(
      col("pos") <= col("n_sh") - ceil(col("n_sh") * tau) + 1)
      .trackedCache // both sides of the candidate self-join read this index
    val cand = prefixes.select(col("id").as("id_a"), col("n_sh").as("n_a"),
        col("shingle"), col("pos").as("pos_a"))
      .hint("merge")
      .join(prefixes.select(col("id").as("id_b"), col("n_sh").as("n_b"),
          col("shingle").as("shingle_b"), col("pos").as("pos_b")),
        col("shingle") === col("shingle_b") && col("id_a") < col("id_b") &&
        col("n_b") >= col("n_a") * tau && col("n_a") >= col("n_b") * tau)
      .groupBy("id_a", "id_b")
      .agg(min(col("pos_a")).as("ia"), min(col("pos_b")).as("jb"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      // PPJoin positional filter: the earliest common element (under the
      // global order) sits at (ia, jb); every other common element ranks
      // after it in BOTH docs, so overlap <= 1 + min(n_a-ia, n_b-jb).
      // Required overlap t = ceil(tau*(n_a+n_b)/(1+tau)).
      .filter(lit(1) + least(col("n_a") - col("ia"), col("n_b") - col("jb")) >=
        ceil((col("n_a") + col("n_b")) * tau / (1 + tau)))
      .select("id_a", "id_b")
    // exact verification: native two-pointer merge over the sorted
    // arrays; the pair list can carry ×cluster² growth, so it is NOT a
    // safe hash build side either — sort-merge spills
    cand.hint("merge")
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .hint("merge")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.ArrayExpressions
          .sorted_intersect_count(col("sh_a"), col("sh_b")).as("c"),
        size(col("sh_a")).as("na"), size(col("sh_b")).as("nb"))
      .select(col("id_a"), col("id_b"),
        round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 6).as("jaccard"))
      .filter(col("jaccard") >= tau)
      // cache the small pair list BEFORE the global sort: the range
      // sort's sampling pass otherwise re-executes the expensive verify
      // narrow stage a second time (shuffle stages are reused across the
      // sampling and sort jobs; narrow stages are not)
      .trackedCache
      .orderBy("id_a", "id_b")
  }

  /** Exact CONTAINMENT pairs: c(A,B) = |A∩B| / |A| >= t with A the
    * smaller shingle set — catches a short document subsumed inside a
    * longer one, which symmetric Jaccard misses (a 100-line file pasted
    * into a 10,000-line one has Jaccard ≈ 0.01 but containment 1.0).
    *
    * The prefix filter here is the ASYMMETRIC variant: the required
    * overlap ceil(t·|A|) depends only on the smaller side, so only A is
    * prefix-reduced (first |A| − ⌈t·|A|⌉ + 1 elements under the global
    * rarest-first order) while B is indexed in full — the Jaccard prefix
    * theorem applies unchanged because the overlap must still hit A's
    * prefix. Hot shingles sit at the end of the order and essentially
    * never enter A-prefixes, which keeps the join off the full posting
    * lists of boilerplate shingles. Verification is the same native
    * sorted-intersect merge, with an INTEGER threshold
    * (c >= ceil(t·|A|)) so no float-boundary flakiness exists.
    *
    * `maxDocFreq` caps the B-side posting lists: a shingle present in
    * more than that many docs carries no containment signal (it is
    * corpus boilerplate) but costs df join rows PER A-prefix occurrence —
    * on a boilerplate-heavy corpus that is the residual quadratic term
    * the A-prefix alone cannot bound (a SHORT doc's prefix can be forced
    * into hot shingles). The recall trade: a pair whose every shared
    * A-prefix shingle is hotter than the cap is missed — by construction
    * those docs are pure boilerplate. The default is ~40× the hottest
    * real shingle observed at sf0.1 (df 25), so results are identical on
    * real corpora and the bound engages only on degenerate ones.
    */
  def containmentPairs(df: DataFrame, t: Double,
                       textCol: String = "text", idCol: String = "doc_id",
                       maxDocFreq: Int = 1000): DataFrame = {
    val sets = df.select(col(idCol).as("id"),
      graft.functions.SketchExpressions.hashed_shingles(col(textCol), 3).as("sh"))
      .trackedCache
    val freq = sets.select(explode(col("sh")).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("f"))
    val exploded = sets.select(col("id"), size(col("sh")).as("n_sh"),
      explode(col("sh")).as("shingle"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("f").asc, col("shingle").asc)
    // exploded and freq are BOTH corpus-scale at 100 TB (freq is
    // distinct-shingle-scale) — pin the spillable sort-merge joins; the
    // shingle key is high-cardinality so they shuffle flat
    val ranked = exploded.join(freq.hint("merge"), Seq("shingle"))
      .withColumn("pos", row_number().over(w))
    // A-side prefix: |A| - ceil(t*|A|) + 1 rarest shingles
    val prefixes = ranked.filter(
      col("pos") <= col("n_sh") - ceil(col("n_sh") * t) + 1)
    // B-side postings, df-capped (see scaladoc)
    val bPostings = exploded.join(
      freq.filter(col("f") <= maxDocFreq).select("shingle").hint("merge"),
      Seq("shingle"))
    // prefix and posting sides are both corpus-scale explodes: pin the
    // spillable sort-merge join (AQE broadcast the prefix side at bench
    // scale — OOM at 100×; a hash build of either side is memory-unsafe)
    val cand = prefixes.select(col("id").as("id_a"), col("n_sh").as("n_a"), col("shingle"))
      .hint("merge")
      .join(bPostings.select(col("id").as("id_b"), col("n_sh").as("n_b"),
          col("shingle").as("shingle_b")),
        col("shingle") === col("shingle_b") &&
        (col("n_a") < col("n_b") ||
          (col("n_a") === col("n_b") && col("id_a") < col("id_b"))))
      .select("id_a", "id_b").distinct()
    // verify joins: sort-merge — `sets` is the whole corpus with
    // shingle arrays and must never be a build/broadcast side at 100×,
    // and the pair list itself can grow ×cluster²
    cand.hint("merge")
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .hint("merge")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.ArrayExpressions
          .sorted_intersect_count(col("sh_a"), col("sh_b")).as("c"),
        size(col("sh_a")).as("na"))
      .filter(col("c") >= ceil(col("na") * t))
      .select(col("id_a"), col("id_b"), round(col("c").cast("double") / col("na"), 6).as("containment"))
      // cache the small pair list BEFORE the global sort: the range
      // sort's sampling pass otherwise re-executes the expensive verify
      // narrow stage a second time (shuffle stages are reused across the
      // sampling and sort jobs; narrow stages are not)
      .trackedCache
      .orderBy("id_a", "id_b")
  }

  /** Duplicate CLUSTERS from the verified near-dup pairs — the actual
    * deliverable of a dedup pipeline (a keep-list), not just pairs: every
    * doc appearing in a pair is labeled with the smallest doc id reachable
    * through the pair graph (its connected component's representative; a
    * doc keeps itself iff doc_id == keep_id).
    *
    * Two tiers, sized by an explicit pair count:
    *  - below `localEdges` the edge list is collected and solved with a
    *    driver-side union-find — the dimension-table pattern (the verified
    *    near-dup pair list is tiny relative to the corpus: dedup at 100 TB
    *    verifies millions of pairs, not trillions). Zero iterative Spark
    *    rounds, so none of the per-round AQE stage-materialization
    *    overhead that dominated the distributed loop on small graphs
    *    (measured: 2.1s loop vs <0.1s union-find on a 500-pair graph).
    *  - above it, iterative min-label propagation WITH POINTER JUMPING:
    *    each round takes min(label, neighborhood min, label[label]) — the
    *    label[label] hop doubles the reach per round, so rounds are
    *    O(log diameter) instead of O(diameter) on chain-shaped components.
    *    One shuffle set per round; at 100 TB add `localCheckpoint`
    *    between rounds to cut lineage.
    */
  def duplicateClusters(df: DataFrame, n: Int = 3, tau: Double = 0.6,
                        textCol: String = "text", idCol: String = "doc_id",
                        localEdges: Long = 1000000L): DataFrame =
    clustersFromPairs(ngramJaccardPairs(df, n, tau, textCol, idCol),
      outIdCol = "doc_id", localEdges = localEdges)

  /** Quality-preferring keeper election over the duplicate clusters —
    * production dedup keeps the BEST member of each cluster, not an
    * arbitrary one: rejoin the component labeling with the quality score
    * and elect argmax(quality, tie → min id) per component. Output: one
    * row per clustered doc `(id, cluster_id, keeper_id, quality)`; a doc
    * survives the dedup iff id == keeper_id.
    *
    * Scale: the cluster labeling is verified-pair-sized (see
    * [[clustersFromPairs]]); its join back to the corpus-scale score
    * frame pins `shuffle_hash` — the labeling's subtree contains the
    * unfiltered corpus scan, so an AQE broadcast election would ship a
    * corpus-derived table (the plan-gate shape). The election window
    * keys on the cluster label (component-cardinality, maximal), so the
    * rank parallelizes and no single task sees more than one cluster.
    */
  def qualityKeepers(df: DataFrame, n: Int = 3, tau: Double = 0.6,
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    keepersFromClusters(df, duplicateClusters(df, n, tau, textCol, idCol),
      textCol, idCol)

  /** Keeper election over the MinHash-LSH candidate tier — the shape a
    * 100 TB dedup actually runs: LSH pairs (banded bucket join, never
    * all-pairs) → connected components → quality argmax, instead of the
    * exact PPJoin pair tier [[qualityKeepers]] elects over. Approximate
    * exactly where the pair tier is (LSH recall < 1 on the banding
    * curve); equivalence-unit-tested against the exact tier on corpora
    * whose duplicate structure LSH recalls fully, golden-pinned in
    * CORRECTNESS.
    */
  def qualityKeepersLsh(df: DataFrame, n: Int = 3, k: Int = 64, bands: Int = 16,
                        tau: Double = 0.5,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    keepersFromClusters(df,
      clustersFromPairs(minhashLshPairs(df, n, k, bands, tau, textCol, idCol),
        outIdCol = "doc_id"),
      textCol, idCol)

  /** Shared election: rejoin a component labeling (`doc_id`, `keep_id`)
    * with the per-doc quality score and elect argmax(quality, tie → min
    * id) per component — see [[qualityKeepers]] for the scale rationale.
    */
  private def keepersFromClusters(df: DataFrame, clustersIn: DataFrame,
                                  textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = clustersIn
      .withColumnRenamed("doc_id", idCol).withColumnRenamed("keep_id", "cluster_id")
    val scores = TextOps.qualityScore(df, textCol, idCol)
    val j = clusters.hint("shuffle_hash").join(scores, Seq(idCol))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("quality").desc, col(idCol).asc)
    j.withColumn("keeper_id", first(col(idCol)).over(w))
      .select(col(idCol), col("cluster_id"), col("keeper_id"), col("quality"))
      .orderBy(idCol)
  }

  /** Embedding-cosine near-duplicate keep-list — the "semantic dedup"
    * deliverable over an embedding column: exact all-pairs cosine >= tau
    * (the validation tier; at 100 TB the sign-LSH bucket join generates
    * the candidate pairs instead — see Similarity.annTopK) → connected
    * components → smallest reachable id per component.
    */
  def semanticClusters(df: DataFrame, tau: Double,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       localEdges: Long = 1000000L): DataFrame =
    clustersFromPairs(
      Similarity.nearDupPairs(df, tau, idCol = idCol, vecCol = vecCol),
      outIdCol = "vec_id", localEdges = localEdges)

  /** The SCALE tier of semantic dedup — the SemDeDup shape: candidate
    * pairs come from trained-IVF cells (Θ(n²/cells) on clustered corpora)
    * instead of exact all-pairs, then the same connected-component
    * keep-list. Approximate: a cross-cell pair can be missed (recall
    * floor unit-tested vs [[semanticClusters]]); `nassign` trades
    * candidates for recall.
    */
  def semanticClustersIvf(df: DataFrame, tau: Double, cells: Int = 8,
                          nassign: Int = 2,
                          idCol: String = "vec_id", vecCol: String = "embedding",
                          localEdges: Long = 1000000L): DataFrame =
    clustersFromPairs(
      Similarity.ivfNearDupPairs(df, tau, cells, nassign, idCol = idCol, vecCol = vecCol),
      outIdCol = "vec_id", localEdges = localEdges)

  /** Connected-component keep-list over ANY verified pair list (columns
    * `id_a`, `id_b`) — the shared engine behind [[duplicateClusters]]
    * (n-gram pairs) and [[semanticClusters]] (cosine pairs). See
    * [[duplicateClusters]] for the two-tier design rationale.
    */
  def clustersFromPairs(pairsIn: DataFrame, outIdCol: String = "doc_id",
                        localEdges: Long = 1000000L): DataFrame = {
    val ss = pairsIn.sparkSession
    // materialize the pair list ONCE before fan-out — reusing the raw plan
    // would run the whole candidate/join/verify DAG per consumer
    val pairs = pairsIn.select("id_a", "id_b").trackedCache
    // ONE action picks the tier AND fetches the edges: collect through a
    // limit of localEdges+1 — under the threshold (the overwhelmingly
    // common case: keep-lists are verified-pair-sized) the rows are
    // already in hand and the expensive pair pipeline ran exactly once;
    // over it, the probe is discarded and the distributed tier recounts.
    // (A separate count()-then-collect() ran the pipeline's actions twice
    // per query — measured as most of q_sim_clusters' cost.)
    // limN caps what collect can fetch; the local-tier acceptance must
    // compare against limN too, or a localEdges above Int range would
    // treat a TRUNCATED probe as the complete graph (silently wrong
    // components — worse than the distributed tier's explicit require)
    val limN = math.min(localEdges, Int.MaxValue - 2L).toInt.max(1)
    val probe = pairs.limit(limN + 1).collect()
    if (probe.length < localEdges && probe.length <= limN) {
      // ---- local tier: union-find with path compression, min-label roots
      val es = probe.map(r => (r.getLong(0), r.getLong(1)))
      pairs.unpersist(blocking = false)
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent(ra) = rb
      }
      val minOfRoot = scala.collection.mutable.HashMap.empty[Long, Long]
      parent.keysIterator.foreach { id =>
        val r = find(id)
        minOfRoot(r) = math.min(minOfRoot.getOrElse(r, id), id)
      }
      val rows = parent.keysIterator.map(id => (id, minOfRoot(find(id)))).toSeq.sorted
      import ss.implicits._
      return rows.toDF(outIdCol, "keep_id").orderBy(outIdCol)
    }
    // ---- distributed tier
    val edges = pairs.union(
      pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b"))).trackedCache
    // Below the broadcast threshold the label table is broadcast into the
    // per-round joins, which removes the per-round shuffles; above it the
    // joins shuffle normally. The algorithm is identical either way.
    val smallGraph = pairs.count() < 5000000L
    def maybeB(d: DataFrame): DataFrame = if (smallGraph) broadcast(d) else d
    // Per-round frames are EAGER LOCAL CHECKPOINTS, not caches: a cached
    // round's plan embeds the previous round's InMemoryRelation, and plan
    // RENDERING (cache names, explain) re-expands every nested level —
    // with AQE printing each nested adaptive plan twice, the rendered
    // tree doubles per round and the ×100 probe burned unbounded driver
    // CPU before any task ran. The checkpoint truncates each round to a
    // LogicalRDD leaf: plan size is CONSTANT in the round count (the
    // SCALE.md two-pass discipline), blocks release deterministically via
    // the ledger/CheckpointBridge.
    import org.apache.spark.sql.graft.CheckpointBridge
    // init fuses round one: every node starts at min(self, direct
    // neighbors) — one aggregation replaces the distinct plus the first
    // propagation round, and clique-shaped components converge immediately
    var labels = edges.groupBy(col("id_a"))
      .agg(min(col("id_b")).as("mn"))
      .select(col("id_a").as("id"), least(col("id_a"), col("mn")).as("lbl"))
      .localCheckpoint(true)
    var changed = 1L
    var rounds = 0
    // any abnormal exit (non-convergence, mid-round task failure) must
    // release the LIVE round's checkpoint blocks before rethrowing —
    // they are not under the SQL CacheManager, so the ledger scope
    // cannot reclaim an unregistered one (only the FINAL round is
    // registered, below)
    try {
    // pointer jumping converges in O(log diameter) rounds; 64 bounds any
    // graph that fits in storage and the require below turns a
    // non-converged exit into an error instead of silently wrong keep_ids
    while (changed > 0 && rounds < 64) {
      val nbrMin = edges.join(maybeB(labels), edges("id_b") === labels("id"))
        .groupBy(edges("id_a").as("nid")).agg(min("lbl").as("nlbl"))
      // pointer jump: the label of my label (labels is checkpointed from
      // the previous round, so both reads hit the same blocks). lbl is
      // always itself a node id, so the left join matches except transiently.
      val jump = labels.select(col("id").as("jid"), col("lbl").as("jlbl"))
      val updated = labels.join(maybeB(nbrMin), labels("id") === nbrMin("nid"), "left")
        .join(maybeB(jump), labels("lbl") === col("jid"), "left")
        .select(labels("id"), labels("lbl"),
          least(labels("lbl"),
            coalesce(col("nlbl"), labels("lbl")),
            coalesce(col("jlbl"), labels("lbl"))).as("lbl2"))
        .localCheckpoint(true) // the round's one materializing action
      // advance the live pointer BEFORE anything else can throw, so the
      // catch below always releases the one live checkpoint (a throw in
      // the convergence aggregate would otherwise leak `updated`)
      val prev = labels
      labels = updated.select(col("id"), col("lbl2").as("lbl")) // reads updated's blocks
      CheckpointBridge.releaseCheckpoint(prev) // superseded round
      changed = updated
        .agg(coalesce(sum(when(col("lbl2") < col("lbl"), 1L).otherwise(0L)), lit(0L)))
        .first().getLong(0)
      rounds += 1
    }
    require(changed == 0, s"label propagation did not converge in $rounds rounds")
    } catch { case t: Throwable =>
      scala.util.Try(CheckpointBridge.releaseCheckpoint(labels))
      pairs.unpersist(blocking = false)
      edges.unpersist(blocking = false)
      throw t
    }
    // the final round's checkpoint backs the returned frame — release at
    // ledger-scope exit like every operator-internal cache
    CacheLedger.registerCheckpoint(labels)
    pairs.unpersist(blocking = false)
    edges.unpersist(blocking = false)
    labels.select(col("id").as(outIdCol), col("lbl").as("keep_id"))
      .orderBy(outIdCol)
  }

  /** The naive inverted-index variant (kept as the reference implementation
    * for equivalence tests; quadratic in co-shingle frequency).
    */
  def ngramJaccardPairsNaive(df: DataFrame, n: Int, tau: Double,
                             textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sh = shingleSets(df, n, textCol, idCol)
      .select(col("id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("shingle"))
    val a = sh.select(col("id").as("id_a"), col("n_sh").as("n_a"), col("shingle"))
    val b = sh.select(col("id").as("id_b"), col("n_sh").as("n_b"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("common"))
      .select(col("id_a"), col("id_b"),
        round(col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common")), 6).as("jaccard"))
      .filter(col("jaccard") >= tau)
      .orderBy("id_a", "id_b")
  }

  /** MinHash signature over a MATERIALIZED shingle column: hash each
    * shingle once (xxhash64), then one native codegen'd pass computes all
    * k seed-mixed minima (see SketchExpressions.MinHashSig). No explode,
    * no shuffle, no k-wide interpreted fan-out.
    */
  def minhashSignature(sh: Column, k: Int): Column =
    graft.functions.SketchExpressions.minhash_sig(
      transform(sh, s => xxhash64(s)), k)

  /** MinHash+LSH near-dup candidate pairs, verified by exact Jaccard.
    * Pipeline: tokens → shingles → signature → `bands` band-hashes →
    * explode → join docs sharing any (band, band-hash) bucket → dedupe
    * candidates → verify with exact shingle Jaccard. The join fans in
    * per-bucket, never all-pairs; banding trades recall for bucket size on
    * the standard (1-(1-j^r)^b) curve.
    */
  def minhashLshPairs(df: DataFrame, n: Int = 3, k: Int = 64, bands: Int = 16,
                      tau: Double = 0.5,
                      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    // native hashed shingles (already 64-bit longs, sorted): the signature
    // is minhash_sig directly over the set — no per-shingle string pass
    val sh = df.select(col(idCol).as("id"),
      graft.functions.SketchExpressions.hashed_shingles(col(textCol), n).as("sh"))
    val sig = sh.select(col("id"),
      graft.functions.SketchExpressions.minhash_sig(col("sh"), k).as("sig"))
    val banded = sig.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          bnd => xxhash64(slice(col("sig"), bnd * lit(r) + 1, lit(r))))))
      .select(col("id"), col("pos").as("band"), col("col").as("bucket"))
    // both sides corpus-scale — pin the bucket self-join to the
    // spillable sort-merge (a broadcast OR a hash build of the banded
    // table both exceed memory at 100×)
    val cand = banded.as("x").join(banded.hint("merge").as("y"),
        Seq("band", "bucket"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    // verify candidates with exact Jaccard over the sorted hash sets
    // (native two-pointer merge, same as the exact pipeline); both sides
    // can be large — sort-merge spills
    cand.hint("merge")
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .hint("merge")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.ArrayExpressions
          .sorted_intersect_count(col("sh_a"), col("sh_b")).as("c"),
        size(col("sh_a")).as("na"), size(col("sh_b")).as("nb"))
      .select(col("id_a"), col("id_b"),
        round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 6).as("jaccard"))
      .filter(col("jaccard") >= tau)
      // cache the small pair list BEFORE the global sort: the range
      // sort's sampling pass otherwise re-executes the expensive verify
      // narrow stage a second time (shuffle stages are reused across the
      // sampling and sort jobs; narrow stages are not)
      .trackedCache
      .orderBy("id_a", "id_b")
  }

  /** 64-bit SimHash from a MATERIALIZED token-hash column — native
    * codegen'd single pass (SketchExpressions.SimHash64).
    */
  def simhashFromHashes(hashes: Column): Column =
    graft.functions.SketchExpressions.simhash64(hashes)

  /** The composable formulation (64 interpreted filter scans; kept as the
    * reference implementation for equivalence tests).
    */
  def simhashFromHashesHof(hashes: Column): Column = {
    val bits = (0 until 64).map { b =>
      val ones = size(filter(hashes, h => h.bitwiseAND(lit(1L << b)) =!= 0))
      when(ones * 2 > size(hashes), lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce((a: Column, c: Column) => a.bitwiseOR(c))
  }

  /** Per-doc simhash signatures (tokens and hashes materialized). */
  def simhashes(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("toks"))
      .select(col("id"), transform(col("toks"), t => xxhash64(t)).as("hashes"))
      .select(col("id"), simhashFromHashes(col("hashes")).as("sig"))

  /** Benchmark decontamination — flag training documents that share word
    * n-grams with an evaluation/benchmark set (the overlap filter of
    * Brown et al. 2020, Appendix C, which uses 13-grams on web text; `n`
    * is a parameter because the right value is corpus-shaped).
    *
    * Scale design: when `broadcastEval` is true (the default) the eval side
    * of the join is BROADCAST — benchmark suites are typically megabytes
    * while the training corpus is the 100 TB side, so the gram join
    * degenerates to a scan-speed hash probe with no shuffle of training
    * data at all. The hint is a CALLER PROMISE that `isEval` selects a
    * broadcast-sized subset (grams of it must fit the driver/broadcast
    * limits); pass `broadcastEval = false` when the eval slice is a large
    * corpus fraction and the join falls back to a shuffle hash join on the
    * gram key. Grams are the 64-bit `hashed_shingles` digests (one
    * codegen'd pass per row, no string materialization); a cross-doc hash
    * collision needs ~2³² grams per the birthday bound and only ever adds
    * a candidate, never hides one.
    *
    * A NULL `isEval` (e.g. a predicate over a nullable column) counts as
    * training, not silently dropped.
    *
    * Returns one row per contaminated training doc: how many eval docs it
    * collides with and how many distinct grams it shares.
    */
  def decontaminationReport(df: DataFrame, isEval: Column, n: Int = 5,
                            textCol: String = "text", idCol: String = "doc_id",
                            broadcastEval: Boolean = true): DataFrame = {
    val grams = df.select(col(idCol), coalesce(isEval, lit(false)).as("is_eval"),
      explode(graft.functions.SketchExpressions.hashed_shingles(col(textCol), n)).as("g"))
    val ev0 = grams.filter(col("is_eval")).select(col("g"), col(idCol).as("eval_id"))
    val ev = if (broadcastEval) broadcast(ev0) else ev0
    val tr = grams.filter(!col("is_eval")).select(col("g"), col(idCol))
    tr.join(ev, Seq("g"))
      .groupBy(idCol)
      .agg(countDistinct(col("eval_id")).as("n_eval_docs"),
        countDistinct(col("g")).as("n_shared_grams"))
      .orderBy(idCol)
  }

  /** The keep-side of decontamination: training docs with NO gram overlap
    * with the eval set — a broadcast left-anti join, the actual corpus
    * filter a pipeline runs after reviewing the report above. Same
    * `broadcastEval` contract and NULL-`isEval` semantics as the report.
    */
  def decontaminate(df: DataFrame, isEval: Column, n: Int = 5,
                    textCol: String = "text", idCol: String = "doc_id",
                    broadcastEval: Boolean = true): DataFrame = {
    val evalFlag = coalesce(isEval, lit(false))
    val grams = df.select(col(idCol), evalFlag.as("is_eval"),
      explode(graft.functions.SketchExpressions.hashed_shingles(col(textCol), n)).as("g"))
    val ev0 = grams.filter(col("is_eval")).select("g").distinct()
    val ev = if (broadcastEval) broadcast(ev0) else ev0
    val contaminated = grams.filter(!col("is_eval"))
      .join(ev, Seq("g"))
      .select(col(idCol)).distinct()
    df.filter(!evalFlag).join(contaminated, Seq(idCol), "left_anti")
  }

  /** Bloom-filter words (the packed bit table) for the gram set of the
    * rows matching `pred` — the build half of [[decontaminateBloom]].
    *
    * The aggregation is fully mergeable: each gram fans out to k bit
    * positions, positions reduce to at most `2^logM / 64` `(word, bits)`
    * rows via map-side-combined `bit_or`, so the shuffle and the driver
    * collect are bounded by the TABLE size (16 K rows at logM=20 —
    * 128 KiB of bits), never by the corpus. This is the model-parameter
    * collect pattern (k-means centroids, BM25 stats): the output is the
    * model, and it is small by construction.
    */
  def bloomWords(df: DataFrame, pred: Column, n: Int, logM: Int, kHashes: Int,
                 textCol: String = "text"): Array[Long] = {
    val words = new Array[Long]((1 << logM) / 64)
    df.filter(coalesce(pred, lit(false)))
      .select(explode(graft.functions.SketchExpressions.hashed_shingles(col(textCol), n)).as("g"))
      .select(explode(graft.functions.BloomExpressions.bloom_positions(col("g"), logM, kHashes)).as("pos"))
      .groupBy(shiftright(col("pos"), 6).as("w"))
      // SQL-form shiftleft: the Scala helper only takes a literal amount
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), pos & 63)")).as("bits"))
      .collect() // bounded: <= 2^logM/64 rows regardless of corpus size
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Decontamination at the 100 TB tier: the eval set's gram Bloom filter
    * replaces the gram join entirely. Build reduces the eval slice to a
    * `2^logM`-bit table ([[bloomWords]]); probe is a SCAN-LOCAL predicate
    * (`bloom_contains_any` over each doc's gram hashes) — no join, no
    * broadcast hash relation, no shuffle on the training side, and the
    * filter composes with partition pruning upstream.
    *
    * Semantics vs [[decontaminate]]: no false negatives ever (every truly
    * contaminated doc has all its bits set), so the kept set is a SUBSET
    * of the exact kept set; a false positive over-drops with probability
    * ~(grams·k/m)^k per clean doc. At the default 2^20 bits the fixture
    * corpus realizes ZERO false positives, so the exact SQL oracle checks
    * this path too (`DedupSpec` pins subset semantics independently).
    */
  def decontaminateBloom(df: DataFrame, isEval: Column, n: Int = 5,
                         textCol: String = "text", idCol: String = "doc_id",
                         logM: Int = 20, kHashes: Int = 5): DataFrame = {
    val evalFlag = coalesce(isEval, lit(false))
    val words = bloomWords(df, evalFlag, n, logM, kHashes, textCol)
    df.filter(!evalFlag)
      .filter(!graft.functions.BloomExpressions.bloom_contains_any(
        graft.functions.SketchExpressions.hashed_shingles(col(textCol), n),
        words, logM, kHashes))
  }

  /** The paragraph-hash store side of [[dedupParagraphsIncremental]]:
    * distinct md5 of every non-empty paragraph in `df` — what a nightly
    * pipeline appends to the seen-store after each crawl (blank lines are
    * structure, never stored).
    */
  def paragraphHashes(df: DataFrame, textCol: String = "text",
                      hashCol: String = "para_hash"): DataFrame =
    df.select(explode(split(col(textCol), "\n")).as("para"))
      .filter(col("para") =!= "")
      .select(md5(col("para")).as(hashCol)).distinct()

  /** Incremental paragraph dedup — the nightly-crawl version of
    * [[dedupParagraphs]]: boilerplate learned from PAST crawls (the
    * seen-paragraph store) strips from tonight's batch, and the batch
    * then first-occurrence-dedups against itself. A paragraph survives
    * iff its hash is absent from `seenParaHashes` AND it is the batch's
    * first occurrence (min (id, pidx)); blank lines bypass both gates
    * (structure, not content — and the skew-bomb argument from
    * [[dedupParagraphs]] holds doubly for a store anti-join).
    *
    * Equivalence contract (unit-pinned): with every store id below every
    * batch id, this equals the one-shot [[dedupParagraphs]] over
    * store ∪ batch restricted to batch docs — the store is just the
    * already-processed prefix of the same global first-occurrence order.
    *
    * Scale shape: the store side GROWS with crawl history (corpus-scale),
    * so the anti-join is pinned to the spillable sort-merge join — a
    * broadcast elected from bench-scale stats would OOM at the real
    * store. The batch side shuffles (hash, id, pidx, para) paragraph
    * rows; the window parallelizes per-hash exactly as in
    * [[dedupParagraphs]]. A doc whose every paragraph is boilerplate
    * (and that has no blank lines) drops from the output entirely —
    * that IS the operator's verdict on an all-boilerplate page.
    */
  def dedupParagraphsIncremental(df: DataFrame, seenParaHashes: DataFrame,
                                 textCol: String = "text", idCol: String = "doc_id",
                                 hashCol: String = "para_hash"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(hashCol)).orderBy(col(idCol).asc, col("pidx").asc)
    val parts = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pidx", "para")))
    val unseen = parts.filter(col("para") =!= "")
      .withColumn(hashCol, md5(col("para")))
      .hint("merge")
      .join(seenParaHashes.select(col(hashCol)).distinct(), Seq(hashCol), "left_anti")
    val kept = unseen
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col(idCol), col("pidx"), col("para"))
      .unionByName(parts.filter(col("para") === ""))
    kept.groupBy(idCol)
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("pidx"), col("para")))),
          e => e.getField("para")), "\n").as("text"),
        count(lit(1)).as("n_paras_kept"))
  }

  /** Incremental exact dedup — the nightly-crawl shape: of the NEW batch,
    * keep only docs whose content hash is (a) absent from the seen-store
    * (every prior snapshot's hashes, corpus-scale) and (b) first within
    * the batch (min id). One anti-join plus one within-batch first, both
    * hash-shuffles on the content hash — no driver state, and the
    * seen-store side is pinned to the spillable sort-merge join because
    * it GROWS with corpus history (a broadcast elected from bench-scale
    * stats would OOM at the 100 TB store).
    *
    * Output `(doc_id, content_hash)` of the survivors — the rows a
    * pipeline appends back to the seen-store to close the loop.
    */
  def incrementalNew(df: DataFrame, seenHashes: DataFrame,
                     textCol: String = "text", idCol: String = "doc_id",
                     hashCol: String = "content_hash"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = df.select(col(idCol), md5(col(textCol)).as(hashCol))
    val unseen = hashed.hint("merge")
      .join(seenHashes.select(col(hashCol)).distinct(), Seq(hashCol), "left_anti")
    // content hash is high-cardinality: the per-hash window parallelizes
    // (each task holds one hash's few copies), no hot key possible
    val w = Window.partitionBy(hashCol).orderBy(col(idCol).asc)
    unseen.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(idCol), col(hashCol))
      .orderBy(idCol)
  }

  /** Cross-corpus MinHash-LSH near-dup pairs: candidates of the NEW batch
    * against the OLD corpus only (the incremental analog of
    * [[minhashLshPairs]]'s self-join) — band signatures on both sides,
    * equi-join new bands to old bands per (band, bucket), verify with
    * exact shingle Jaccard. Never all-pairs, never new×new (the batch
    * self-dedup is [[minhashLshPairs]]/[[incrementalNew]]'s job); both
    * sides corpus-scale → spillable sort-merge throughout.
    */
  def crossCorpusLshPairs(newDf: DataFrame, oldDf: DataFrame,
                          n: Int = 3, k: Int = 64, bands: Int = 16,
                          tau: Double = 0.5,
                          textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    def shingled(d: DataFrame) = d.select(col(idCol).as("id"),
      graft.functions.SketchExpressions.hashed_shingles(col(textCol), n).as("sh"))
    def banded(sh: DataFrame) = sh
      .select(col("id"), graft.functions.SketchExpressions.minhash_sig(col("sh"), k).as("sig"))
      .select(col("id"), posexplode(transform(sequence(lit(0), lit(bands - 1)),
        bnd => xxhash64(slice(col("sig"), bnd * lit(r) + 1, lit(r))))))
      .select(col("id"), col("pos").as("band"), col("col").as("bucket"))
    val shNew = shingled(newDf); val shOld = shingled(oldDf)
    val cand = banded(shNew).as("x")
      .join(banded(shOld).hint("merge").as("y"), Seq("band", "bucket"))
      .select(col("x.id").as("new_id"), col("y.id").as("old_id"))
      .distinct()
    cand.hint("merge")
      .join(shNew.select(col("id").as("new_id"), col("sh").as("sh_a")), Seq("new_id"))
      .hint("merge")
      .join(shOld.select(col("id").as("old_id"), col("sh").as("sh_b")), Seq("old_id"))
      .select(col("new_id"), col("old_id"),
        graft.functions.ArrayExpressions
          .sorted_intersect_count(col("sh_a"), col("sh_b")).as("c"),
        size(col("sh_a")).as("na"), size(col("sh_b")).as("nb"))
      .select(col("new_id"), col("old_id"),
        round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 6).as("jaccard"))
      .filter(col("jaccard") >= tau)
      .trackedCache // small pair list cached before the global sort (see minhashLshPairs)
      .orderBy("new_id", "old_id")
  }

  /** Near-dup pairs = hamming(simhash) <= maxHamming, found via the
    * pigeonhole band trick (64 bits into maxHamming+1 chunks; a pair within
    * the radius must agree exactly on >= 1 chunk) — bucket join, not
    * all-pairs.
    */
  def simhashPairs(df: DataFrame, maxHamming: Int = 3,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val sigs = simhashes(df, textCol, idCol)
    val banded = sigs.select(col("id"), col("sig"),
        posexplode(array((0 until chunks).map { c =>
          shiftrightunsigned(col("sig"), c * width)
            .bitwiseAND(lit((1L << width) - 1))
        }: _*)))
      .select(col("id"), col("sig"), col("pos").as("band"), col("col").as("chunk"))
    // both sides are corpus-scale: bench-scale statistics elect a full
    // broadcast of the banded table (OOM at 100×), and a hash build is no
    // better — pin the spillable sort-merge join
    banded.as("x").join(banded.hint("merge").as("y"), Seq("band", "chunk"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      // cache the small pair list BEFORE the global sort: the range
      // sort's sampling pass otherwise re-executes the expensive verify
      // narrow stage a second time (shuffle stages are reused across the
      // sampling and sort jobs; narrow stages are not)
      .trackedCache
      .orderBy("id_a", "id_b")
  }

  /** Per-document duplicated-SUBSTRING coverage, at word-n-gram
    * granularity — the span-level diagnostic of the "deduplicate training
    * data at the substring level" family (Lee et al., ACL'22, which dedups
    * 50-token substrings via a suffix array): for each document, the
    * fraction of its token positions covered by at least one word n-gram
    * that also occurs in ANOTHER document. Whole-document and even
    * near-dup pair finding miss this mass — boilerplate headers, quoted
    * paragraphs, license blocks — which is exactly the text a model
    * memorizes first.
    *
    * Positions, not n-grams: a position covered by three overlapping
    * duplicated n-grams counts once, so `dup_frac` is a true fraction of
    * the document's tokens (the suffix-array method's "fraction of chars
    * in a duplicated span", discretized to tokens).
    *
    * Scale shape: positional shingles hash to 64-bit longs (the string
    * n-gram never shuffles); the duplicated-shingle list is shingle-scale
    * and DERIVED, so the probe join pins `shuffle_hash` with the slim
    * one-column build (the frequency-join discipline — AQE elects a
    * corpus-scale broadcast at toy SF otherwise); the covered-position
    * fan-out is a bounded ×n explode collapsed by a count-distinct
    * aggregate. Docs with fewer than n tokens have no n-grams and emit no
    * row (mirroring [[graft.operators.TextOps.ngramNovelty]]).
    */
  def duplicatedSpans(df: DataFrame, n: Int = 3,
                      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(n >= 1, s"n-gram order must be positive, got $n")
    require(!Set("n_tokens", "n_dup_pos", "dup_frac").contains(idCol),
      s"idCol '$idCol' collides with a duplicatedSpans output column")
    val t = col("__span_toks")
    // base feeds the positional fan-out AND the final left join
    val base = df
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__span_toks"))
      .filter(size(t) >= n)
      .select(col(idCol), size(t).cast("long").as("n_tokens"), t)
      .trackedCache
    // (doc, pos, hash-of-ngram-at-pos): pos = 0-based start token index
    val pos = base.select(col(idCol),
        posexplode(transform(sequence(lit(0), col("n_tokens").cast("int") - n),
          i => xxhash64(concat_ws(" ", slice(t, i + 1, lit(n))))))
          .as(Seq("pos", "sh")))
      .trackedCache // feeds the df aggregate AND the probe side
    val dup = pos.groupBy("sh")
      .agg(countDistinct(col(idCol)).as("__span_df"))
      .filter(col("__span_df") >= 2)
      .select("sh")
    val covered = pos.join(dup.hint("shuffle_hash"), Seq("sh"))
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("__span_cp"))
      .groupBy(idCol).agg(countDistinct(col("__span_cp")).as("n_dup_pos"))
    base.select(col(idCol), col("n_tokens"))
      .join(covered.hint("shuffle_hash"), Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_dup_pos"), lit(0L)).as("n_dup_pos"),
        round(coalesce(col("n_dup_pos"), lit(0L)).cast("double") / col("n_tokens"), 6)
          .as("dup_frac"))
  }
}
