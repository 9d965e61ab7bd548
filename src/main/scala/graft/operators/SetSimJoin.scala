package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Prefix-filtered set-similarity self-join (PPJoin-style): all pairs
  * of documents with Jaccard(set_a, set_b) >= tau, grouped by a
  * partition column (`lang`) that bounds the candidate space.
  * Documents are represented as arrays of 64-bit element hashes
  * (TokenHashes/BigramHashes — 8-byte primitives end-to-end).
  *
  * Algorithm (the 100 TB shape — no all-pairs, no global window):
  *  1. global element order = ascending document frequency, then hash.
  *     Realized by PACKING (df, 40-bit hash) into one long per
  *     element — natural long order IS (df, hash) order — so the
  *     per-document df-sorted array is a plain sort_array over longs;
  *     no global rank window, no struct sort. df saturates at 2^23-1
  *     in the pack (enforced, not assumed): beyond that, elements tie
  *     on the df component and order degrades to hash order — still a
  *     consistent global order, so the prefix/positional filters stay
  *     CORRECT (just less selective); exactness never depends on it.
  *  2. prefix filter: for J >= tau, two sets must share an element
  *     within their first floor((1-tau)*|A|)+1 in that order, so the
  *     inverted index holds prefixes only, and the rarest elements
  *     fill the prefix — bucket sizes stay small by design.
  *  3. candidate generation is NARROW (packed pair longs only) and
  *     applies
  *     - the length filter (J >= tau implies tau*|A| <= |B| <= |A|/tau)
  *     - the PPJoin positional filter: a shared prefix element at
  *       0-based positions (pa0, pb0) bounds the intersection by
  *       min(|A|-pa0, |B|-pb0), which must reach the minimum
  *       intersection ceil(tau*(|A|+|B|)/(1+tau)) — this kills pairs
  *       sharing only common elements (they sort LAST, so their
  *       positional bound is tiny).
  *  4. exact verification via the codegen'd zero-allocation
  *     SortedIntersectCount merge over the ORIGINAL sorted 64-bit
  *     hash arrays — NOT the packed ones: the pack truncates hashes
  *     to 40 bits, so two distinct elements with equal df and equal
  *     low-40 bits would merge and inflate the intersection. Packed
  *     arrays drive filtering only; the exact count runs on full
  *     hashes.
  *
  * Skew guard: the (lang, element) bucket key is salted adaptively
  * (`partitions/16`, min 1 — a no-op at low parallelism, where
  * replication is pure overhead).
  */
object SetSimJoin {

  private[graft] def saltFactor(s: SparkSession): Int =
    math.max(1, s.sessionState.conf.numShufflePartitions / 16)

  // Caches persisted by pairs/pairsBetween live until the result has
  // been materialized, which the operator cannot observe from inside a
  // lazy plan — so they are tracked here and released on the NEXT
  // SetSimJoin entry (bounding the leak to one call's caches) plus via
  // the explicit release() hook. Unpersisting a cache a still-running
  // plan reads is safe (Spark recomputes), just slower.
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Unpersist intermediate caches from prior pairs/pairsBetween calls.
    * Idempotent; called automatically at every SetSimJoin entry point.
    * Long-lived sessions that interleave other cached work should call
    * this once the join result has been materialized. */
  def release(): Unit = {
    var d = tracked.poll()
    while (d != null) { d.unpersist(blocking = false); d = tracked.poll() }
  }

  private def track(d: DataFrame): DataFrame = { tracked.add(d); d }

  // ---------------------------------------------------------------
  // Stats-driven strategy selection (auto / autoBetween)
  // ---------------------------------------------------------------

  /** Cheap pre-stats for strategy choice: one tiny per-block agg (the
    * partition column is low-cardinality by the operator's contract)
    * plus one narrow scan for the approximate vocabulary size. Both are
    * partial-agg jobs — at 100 TB they cost one pass, versus the df
    * table both shuffle strategies build anyway. */
  private[graft] case class CorpusStats(
      nDocs: Long, sumN: Long, pairSpace: Double, vocab: Long) {
    def avgN: Double = if (nDocs == 0) 0.0 else sumN.toDouble / nDocs
    /** average element document-frequency = vocabulary density */
    def density: Double = if (vocab == 0) 0.0 else sumN.toDouble / vocab
    /** bytes of sorted hash arrays a broadcast side would carry */
    def broadcastBytes: Double = sumN.toDouble * 8 + nDocs.toDouble * 48
    /** comparisons for the broadcast nested probe: pair space bounded
      * by the block structure, times one sorted merge per pair */
    def intersectCost: Double = pairSpace * 2.0 * avgN
  }

  private[graft] def corpusStats(sets: DataFrame): CorpusStats = {
    val blocks = sets.groupBy("lang")
      .agg(count(lit(1)).as("c"), sum(size(col("hs"))).as("sn"))
      .collect() // one row per block — bounded by the partition column
    val nDocs = blocks.map(_.getAs[Long]("c")).sum
    val sumN = blocks.map(r => if (r.isNullAt(r.fieldIndex("sn"))) 0L else r.getAs[Long]("sn")).sum
    val pairSpace = blocks.map(r => { val c = r.getAs[Long]("c").toDouble; c * c / 2.0 }).sum
    val vocab = sets.select(explode(col("hs")).as("h"))
      .agg(approx_count_distinct(col("h")).as("v"))
      .head().getLong(0)
    CorpusStats(nDocs, sumN, pairSpace, vocab)
  }

  /** Strategy-selection thresholds. Broadcast cap is deliberately far
    * below executor memory; the intersect budget is ~seconds of one
    * core's primitive comparisons; the count budget bounds the
    * co-occurrence JOIN-ROW volume (Σ_h df_h²) — rows cost ~an order
    * more than merge comparisons, and past ~2e9 of them the count
    * strategy is the bottleneck no matter how it is partitioned. */
  private[graft] val BroadcastMaxBytes: Double = 32.0 * (1 << 20)
  private[graft] val IntersectCostBudget: Double = 4e9
  private[graft] val DenseDf: Double = 32.0
  private[graft] val CountRowsBudget: Double = 2e9

  /** Exact co-occurrence row volume of the count strategy: Σ_h df_h².
    * One linear explode + groupBy pass — only evaluated (by-name in
    * [[chooseStrategy]]) when the broadcast-intersect short-circuit is
    * rejected, i.e. exactly when the count/prefix decision matters.
    * Double accumulation: Σdf² overflows long on dense corpora. */
  private[graft] def dfSquareSum(sets: DataFrame): Double = {
    val r = sets.select(explode(col("hs")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))
      .agg(coalesce(sum(col("df").cast("double") * col("df")), lit(0.0)))
      .head().getDouble(0)
    r
  }

  /** Pick the exact self-join strategy from [[CorpusStats]]:
    *  - "intersect" when the whole sorted-array table fits a broadcast
    *    AND the block-bounded pair space is a tractable direct probe —
    *    the small-corpus / dense-vocab regime where candidate
    *    generation machinery costs more than it saves. The probe
    *    budget scales with the session's parallelism (the probe side
    *    is explicitly repartitioned, so merge comparisons divide
    *    evenly across cores — a single-core constant would reject
    *    probes a 32-core session finishes in seconds, r9 sf1 finding);
    *  - "count" when the vocabulary is dense (avg df >= DenseDf) or
    *    tau is low (prefix/positional filters prune little, and the
    *    co-occurrence count IS the intersection — no verify join) —
    *    but ONLY while the exact co-occurrence volume Σdf² is inside
    *    [[CountRowsBudget]]: on a dense vocabulary Σdf² grows with
    *    corpus², and past the budget the count join is the quadratic
    *    bottleneck whatever the per-row cost (r9 sf1 finding: the old
    *    density-only rule serialized 9.4e9 co-occurrence rows);
    *  - "prefix" otherwise — PPJoin filters bound candidates
    *    sub-quadratically via the rarest-element prefixes (the default
    *    100 TB shape; on dense vocabs prefixes still hold only the
    *    RAREST (1−τ)·|A|+1 elements, so Σ(prefix-df)² ≪ Σdf²).
    * All three emit identical exact results (ShingleSpec); this picks
    * cost only, so a misestimate can never change answers. */
  private[graft] def chooseStrategy(st: CorpusStats, tau: Double,
                                    parallelism: Int,
                                    sumDf2: => Double): String =
    if (st.broadcastBytes <= BroadcastMaxBytes
        && st.intersectCost <= IntersectCostBudget * math.max(1, parallelism / 4))
      "intersect"
    else if ((st.density >= DenseDf || tau < 0.5) && sumDf2 <= CountRowsBudget)
      "count"
    else "prefix"

  /** Stats-driven exact set-similarity self-join: computes cheap corpus
    * stats, then routes to [[pairsByIntersect]], [[pairsByCount]] or
    * [[pairs]] — same signature and identical results as each. */
  def auto(s: SparkSession, sets: DataFrame, tau: Double): DataFrame = {
    release()
    chooseStrategy(corpusStats(sets), tau,
      s.sessionState.conf.numShufflePartitions, dfSquareSum(sets)) match {
      case "intersect" => pairsByIntersect(s, sets, tau)
      case "count"     => pairsByCount(s, sets, tau)
      case _           => pairs(s, sets, tau)
    }
  }

  /** Stats-driven bipartite variant: broadcast-intersect when the
    * smaller side fits and the cross pair space is tractable, else the
    * prefix-filtered [[pairsBetween]]. Identical results either way. */
  def autoBetween(s: SparkSession, left: DataFrame, right: DataFrame,
                  tau: Double): DataFrame = {
    release()
    val ls = corpusStats(left)
    val rs = corpusStats(right)
    // upper bound of the per-block cross pair space (|L| x |R| total)
    val crossSpace = ls.nDocs.toDouble * rs.nDocs.toDouble
    val avgN = ((ls.avgN * ls.nDocs) + (rs.avgN * rs.nDocs)) /
      math.max(1L, ls.nDocs + rs.nDocs)
    val smallBytes = math.min(ls.broadcastBytes, rs.broadcastBytes)
    if (smallBytes <= BroadcastMaxBytes && crossSpace * 2.0 * avgN <= IntersectCostBudget)
      pairsBetweenByIntersect(s, left, right, tau)
    else
      pairsBetween(s, left, right, tau)
  }

  /** @param sets (doc_id, lang, hs: array<long>) — per-document
    *             DISTINCT element hashes (order irrelevant); doc_id
    *             must fit in 32 bits (packed-pair invariant)
    * @return (a_id, b_id, jaccard) with jaccard rounded to 4dp,
    *         ordered by (a_id, b_id)
    */
  def pairs(s: SparkSession, sets: DataFrame, tau: Double): DataFrame = {
    graft.expr.Registry.ensure(s)
    val occ = sets.select(col("doc_id"), col("lang"), size(col("hs")).as("n"),
      explode(col("hs")).as("h"))
    val df_ = occ.groupBy("h").agg(count(lit(1)).as("df"))
    // pack (df, hash-low-40) into one long: ascending long order
    // realizes the global (df, hash) element order with no struct sort
    val keyed = occ.join(broadcast(df_), "h")
      .select(col("doc_id"), col("lang"), col("n"),
        shiftleft(least(col("df"), lit((1L << 23) - 1)), 40)
          .bitwiseOR(col("h").bitwiseAND(lit(0xFFFFFFFFFFL))).as("k"))
    // feeds three branches (both candidate sides + verify) — persist
    // so the explode+join+collect pipeline runs once. h64 keeps the
    // untruncated element hashes for the exact verify merge.
    val sorted = track(keyed.groupBy("doc_id", "lang", "n")
      .agg(sort_array(collect_list(col("k"))).as("sk"))
      .join(sets.select(col("doc_id"), sort_array(col("hs")).as("h64")), "doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK))
    val withPrefix = sorted.withColumn("prefix",
      slice(col("sk"), lit(1), (floor((lit(1.0) - tau) * col("n")) + 1).cast("int")))
    val salts = saltFactor(s)
    val pa = withPrefix.select(col("lang"), col("doc_id").as("a_id"),
        col("n").as("na"), posexplode(col("prefix")).as(Seq("pa0", "pk_a")))
      .withColumn("salt", pmod(col("a_id"), lit(salts)))
    val pb = withPrefix.select(col("lang").as("lang_b"), col("doc_id").as("b_id"),
        col("n").as("nb"), posexplode(col("prefix")).as(Seq("pb0", "pk_b")))
      .withColumn("salt_b", explode(sequence(lit(0), lit(salts - 1))))
    // minimum intersection for J >= tau: i >= tau*(na+nb)/(1+tau)
    val minInter = ceil(lit(tau / (1.0 + tau)) * (col("na") + col("nb")))
    val cands = pa.join(pb,
        col("lang") === col("lang_b") && col("pk_a") === col("pk_b") &&
        col("salt") === col("salt_b") &&
        col("a_id") < col("b_id") &&
        col("nb") >= ceil(lit(tau) * col("na")) &&
        col("na") >= ceil(lit(tau) * col("nb")) &&
        least(col("na") - col("pa0"), col("nb") - col("pb0")) >= minInter)
      .select(shiftleft(col("a_id"), 32).bitwiseOR(col("b_id")).as("pk"))
      .dropDuplicates("pk")
      .select(shiftright(col("pk"), 32).as("a_id"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("b_id"))
    // exact verification: re-attach the two sorted FULL-WIDTH hash
    // arrays (tiny 1-row-per-doc sides; Spark picks BHJ from the
    // persisted stats)
    val ta = sorted.select(col("doc_id").as("a_id"), col("h64").as("ka"), col("n").as("na"))
    val tb = sorted.select(col("doc_id").as("b_id"), col("h64").as("kb"), col("n").as("nb"))
    cands.join(ta, "a_id").join(tb, "b_id")
      .withColumn("inter", expr("sorted_intersect_count(ka, kb)"))
      .withColumn("j", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("j") >= tau)
      .select(col("a_id"), col("b_id"), round(col("j"), 4).as("jaccard"))
      .orderBy("a_id", "b_id")
  }

  /** Bipartite (two-sided) variant of [[pairs]]: all (left, right)
    * pairs with Jaccard >= tau BETWEEN two document sets, never within
    * a side — the asymmetric-audit shape (contamination: test x
    * train). Same packing/prefix/length/positional machinery, but the
    * candidate join crosses sides only, so the pair space is |L| x |R|
    * instead of all-pairs over the union — when one side is a small
    * split (test ~10%), that is ~5x fewer candidates than running the
    * self-join and discarding within-side pairs.
    *
    * df is computed over the UNION of the two sides: the pack only
    * needs a consistent global element order, not any particular one.
    * The salt replicates the LEFT side (pass the smaller split there).
    *
    * @param left  (doc_id, lang, hs) — doc_ids must not collide with
    *              right's (both sides of one corpus satisfy this)
    * @param right (doc_id, lang, hs)
    * @return (l_id, r_id, jaccard) rounded 4dp, ordered
    */
  def pairsBetween(s: SparkSession, left: DataFrame, right: DataFrame,
                   tau: Double): DataFrame = {
    graft.expr.Registry.ensure(s)
    val sets = left.withColumn("side", lit(0))
      .unionByName(right.withColumn("side", lit(1)))
    val occ = sets.select(col("doc_id"), col("side"), col("lang"),
      size(col("hs")).as("n"), explode(col("hs")).as("h"))
    val df_ = occ.groupBy("h").agg(count(lit(1)).as("df"))
    val keyed = occ.join(broadcast(df_), "h")
      .select(col("doc_id"), col("side"), col("lang"), col("n"),
        shiftleft(least(col("df"), lit((1L << 23) - 1)), 40)
          .bitwiseOR(col("h").bitwiseAND(lit(0xFFFFFFFFFFL))).as("k"))
    val sorted = track(keyed.groupBy("doc_id", "side", "lang", "n")
      .agg(sort_array(collect_list(col("k"))).as("sk"))
      .join(sets.select(col("doc_id"), sort_array(col("hs")).as("h64")), "doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK))
    val withPrefix = sorted.withColumn("prefix",
      slice(col("sk"), lit(1), (floor((lit(1.0) - tau) * col("n")) + 1).cast("int")))
    val salts = saltFactor(s)
    val pa = withPrefix.filter(col("side") === 0)
      .select(col("lang"), col("doc_id").as("l_id"),
        col("n").as("na"), posexplode(col("prefix")).as(Seq("pa0", "pk_a")))
      .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    val pb = withPrefix.filter(col("side") === 1)
      .select(col("lang").as("lang_b"), col("doc_id").as("r_id"),
        col("n").as("nb"), posexplode(col("prefix")).as(Seq("pb0", "pk_b")))
      .withColumn("salt_b", pmod(col("r_id"), lit(salts)))
    val minInter = ceil(lit(tau / (1.0 + tau)) * (col("na") + col("nb")))
    val cands = pa.join(pb,
        col("lang") === col("lang_b") && col("pk_a") === col("pk_b") &&
        col("salt") === col("salt_b") &&
        col("nb") >= ceil(lit(tau) * col("na")) &&
        col("na") >= ceil(lit(tau) * col("nb")) &&
        least(col("na") - col("pa0"), col("nb") - col("pb0")) >= minInter)
      .select(shiftleft(col("l_id"), 32).bitwiseOR(col("r_id")).as("pk"))
      .dropDuplicates("pk")
      .select(shiftright(col("pk"), 32).as("l_id"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("r_id"))
    val ta = sorted.select(col("doc_id").as("l_id"), col("h64").as("ka"), col("n").as("na"))
    val tb = sorted.select(col("doc_id").as("r_id"), col("h64").as("kb"), col("n").as("nb"))
    cands.join(ta, "l_id").join(tb, "r_id")
      .withColumn("inter", expr("sorted_intersect_count(ka, kb)"))
      .withColumn("j", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("j") >= tau)
      .select(col("l_id"), col("r_id"), round(col("j"), 4).as("jaccard"))
      .orderBy("l_id", "r_id")
  }

  /** Broadcast nested-loop exact set-similarity self-join — the
    * SMALL-PARTITION dense-vocabulary strategy. When the partition
    * column (lang) bounds each block to a size whose pair space is
    * tractable AND the vocabulary is so dense that candidate filters
    * prune nothing (this corpus: 64% of same-lang pairs survive
    * prefix+length filters; every co-occurrence row of pairsByCount is
    * almost surely a candidate anyway), the cheapest exact plan is the
    * direct one: broadcast the (tiny) sorted-array table, probe it
    * per-lang with the length filter inline, and intersect each
    * surviving pair ONCE with the codegen'd zero-allocation sorted
    * merge. No explode, no co-occurrence shuffle, no pair-key
    * aggregation — the only shuffle in the whole plan is the final
    * orderBy.
    *
    * Scale boundary (100 TB posture): the broadcast bounds this to
    * blocks that fit an executor (~10 MB of packed arrays per lang
    * here). Beyond that, pairsByCount (co-occurrence counting) or
    * pairs (prefix filtering) take over — the three strategies cover
    * the (block size x vocabulary density) plane, and all three emit
    * identical exact results (ShingleSpec proves pairwise equality).
    */
  def pairsByIntersect(s: SparkSession, sets: DataFrame, tau: Double): DataFrame = {
    graft.expr.Registry.ensure(s)
    // empty sets never pair (Jaccard undefined, 0/0 under ANSI): the
    // prefix and count strategies exclude them structurally (no prefix
    // element / no occurrence row); the direct probe must filter them
    // or the length filter admits (0, 0) pairs and divides by zero
    val sorted = sets.filter(size(col("hs")) > 0)
      .select(col("doc_id"), col("lang"),
        sort_array(col("hs")).as("sk"), size(col("hs")).as("n"))
    // the probe is the whole cost of this plan (|block|^2 merges) and a
    // broadcast join adds no exchange of its own — without an explicit
    // redistribution a single-split input (one parquet row group) would
    // run the entire probe in ONE task. The probe side is small by this
    // strategy's admission rule, so the round-robin shuffle is noise.
    val a = sorted.select(col("lang"), col("doc_id").as("a_id"),
        col("sk").as("ka"), col("n").as("na"))
      .repartition(s.sessionState.conf.numShufflePartitions)
    val b = sorted.select(col("lang").as("lang_b"), col("doc_id").as("b_id"),
      col("sk").as("kb"), col("n").as("nb"))
    a.join(broadcast(b),
        col("lang") === col("lang_b") && col("a_id") < col("b_id") &&
        col("nb") >= ceil(lit(tau) * col("na")) &&
        col("na") >= ceil(lit(tau) * col("nb")))
      .withColumn("inter", expr("sorted_intersect_count(ka, kb)"))
      .withColumn("j", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("j") >= tau)
      .select(col("a_id"), col("b_id"), round(col("j"), 4).as("jaccard"))
      .orderBy("a_id", "b_id")
  }

  /** Bipartite sibling of [[pairsByIntersect]]: (left, right) pairs
    * with Jaccard >= tau across sides only, via a broadcast of the
    * SMALLER side's sorted-array table and a per-lang probe with the
    * length filter inline. No explode, no candidate shuffle — chosen by
    * [[autoBetween]] when the small side fits an executor and the
    * cross pair space is a tractable direct probe. */
  def pairsBetweenByIntersect(s: SparkSession, left: DataFrame, right: DataFrame,
                              tau: Double): DataFrame = {
    graft.expr.Registry.ensure(s)
    // empty-set exclusion: see pairsByIntersect
    val a = left.filter(size(col("hs")) > 0)
      .select(col("lang"), col("doc_id").as("l_id"),
        sort_array(col("hs")).as("ka"), size(col("hs")).as("na"))
    // probe parallelism: see pairsByIntersect — a single-split stream
    // side would otherwise probe in one task (its size is bounded by
    // autoBetween's admission rule, so the shuffle is noise)
    val b = right.filter(size(col("hs")) > 0)
      .select(col("lang").as("lang_b"), col("doc_id").as("r_id"),
        sort_array(col("hs")).as("kb"), size(col("hs")).as("nb"))
      .repartition(s.sessionState.conf.numShufflePartitions)
    // contamination-style audits pass the small held-out split as left;
    // broadcast it and stream the large train side past it
    b.join(broadcast(a),
        col("lang") === col("lang_b") &&
        col("nb") >= ceil(lit(tau) * col("na")) &&
        col("na") >= ceil(lit(tau) * col("nb")))
      .withColumn("inter", expr("sorted_intersect_count(ka, kb)"))
      .withColumn("j", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("j") >= tau)
      .select(col("l_id"), col("r_id"), round(col("j"), 4).as("jaccard"))
      .orderBy("l_id", "r_id")
  }

  /** Count-based exact set-similarity self-join — the DENSE-vocabulary
    * strategy. When the token universe is small relative to the corpus
    * (every token common), prefix/positional filters prune almost
    * nothing (measured on this corpus: 64% of same-lang pairs survive
    * them) and candidate verification dominates; here the shared-token
    * count IS the intersection, so no verify join exists at all:
    *
    *  1. explode each document's hashed element array (8-byte
    *     primitives — see BigramHashes — not strings).
    *  2. codegen'd equi-join on (lang, hash) with a < b and the
    *     Jaccard length filter (J >= tau implies tau*|A| <= |B| <=
    *     |A|/tau) inline in the join condition; the projection packs
    *     each pair into ONE long (a_id << 32 | b_id).
    *  3. count packed keys = exact intersection size; unpack and
    *     re-attach set sizes via two broadcast joins.
    *
    * Every operator here is whole-stage-codegen (no higher-order
    * functions, which are CodegenFallback and allocation-bound at high
    * parallelism — measured 3-4x slower end-to-end). Cost is
    * sum_tok(df_tok^2) co-occurrence rows — at 100 TB with a
    * heavy-tailed vocabulary, stop-token df caps or the prefix
    * strategy (`pairs`) bound that sum; the two strategies are
    * complementary along vocabulary density.
    *
    * @param sets (doc_id, lang, hs: array<long>) — per-document
    *             DISTINCT element hashes (order irrelevant); doc_id
    *             must fit in 32 bits (packed-pair invariant)
    */
  def pairsByCount(s: SparkSession, sets: DataFrame, tau: Double): DataFrame = {
    val sized = sets.select(col("doc_id"), size(col("hs")).as("n"))
    val occ = sets
      .select(col("lang"), col("doc_id"), size(col("hs")).as("n"), explode(col("hs")).as("h"))
    // the co-occurrence join is this plan's entire cost, and a
    // broadcast-hash join adds no exchange of its own — without an
    // explicit redistribution on the join key a single-split input
    // (one parquet row group) would run ALL Σdf² join rows in one
    // task (r9 sf1 finding). One linear shuffle buys split-independent
    // parallelism on the heavy stage.
    val a = occ.select(col("lang"), col("h"), col("doc_id").as("a_id"), col("n").as("na"))
      .repartition(s.sessionState.conf.numShufflePartitions,
        col("lang"), col("h"))
    val b = occ.select(col("lang").as("lang_b"), col("h").as("h_b"),
      col("doc_id").as("b_id"), col("n").as("nb"))
    val co = a.join(b,
        col("lang") === col("lang_b") && col("h") === col("h_b") &&
        col("a_id") < col("b_id") &&
        col("nb") >= ceil(lit(tau) * col("na")) &&
        col("na") >= ceil(lit(tau) * col("nb")))
      .select(shiftleft(col("a_id"), 32).bitwiseOR(col("b_id")).as("pk"))
    co.groupBy("pk").agg(count(lit(1)).as("inter"))
      // unpack via bit ops ("/" would be double division — lossy > 2^53)
      .select(shiftright(col("pk"), 32).as("a_id"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("b_id"), col("inter"))
      .join(broadcast(sized.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n", "na")), "a_id")
      .join(broadcast(sized.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n", "nb")), "b_id")
      .withColumn("j", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("j") >= tau)
      .select(col("a_id"), col("b_id"), round(col("j"), 4).as("jaccard"))
      .orderBy("a_id", "b_id")
  }
}
