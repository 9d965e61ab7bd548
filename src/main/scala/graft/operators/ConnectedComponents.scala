package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected pair graph — the dedup
  * RESOLUTION step: near-dup pair generation (SetSimJoin) says which
  * documents overlap; this says which CLUSTER each document belongs to
  * (cluster id = smallest member id), so a pipeline can keep one
  * canonical document per cluster.
  *
  * Algorithm: min-label propagation — label(v) <- min(label(v),
  * min over neighbors' labels) until fixpoint, which takes at most
  * graph-diameter rounds. Near-dup graphs are dense and low-diameter
  * (clusters are near-cliques), so 1-3 rounds converge; `maxIter`
  * bounds pathological chains.
  *
  * `jump = true` adds pointer jumping: after each propagation step,
  * label(v) <- label(label(v)) (one extra equi-join per round on the
  * label key). Label chains then halve every round, so long-diameter
  * graphs (paths, meshes) converge in O(log n) rounds instead of
  * O(diameter) — the remedy when the loud maxIter failure fires.
  * Off by default: on low-diameter near-dup graphs the extra join per
  * round costs more than the rounds it saves.
  *
  * Iterative graph algorithms are inherently multi-job: each round
  * materializes the label table and runs a convergence count — that is
  * the algorithm, not an accidental eager action (contrast the
  * plan-build-time count removed from q_tfidf_top). Every round is a
  * pair of equi-joins on the label key — shuffle-partitioned, no
  * driver-side data.
  */
object ConnectedComponents {

  /** @param nodes (doc_id) — every vertex, including isolated ones
    * @param edges (a_id, b_id) — undirected pairs
    * @return (doc_id, label) with label = min doc_id of the component
    */
  def components(s: SparkSession, nodes: DataFrame, edges: DataFrame,
                 maxIter: Int = 30, jump: Boolean = false): DataFrame = {
    // materialize the edge input FIRST: the symmetrization union reads
    // it twice and every round re-reads it, and edge generation (a
    // set-similarity join) is far more expensive than the label joins.
    // localCheckpoint, NOT persist: persist would pin the edge
    // pipeline to its non-adaptive plan (cached subtrees bypass AQE —
    // measured 1.5x slower here); the eager checkpoint runs it once
    // under AQE and truncates the lineage to the materialized rows.
    val e = edges.localCheckpoint(true)
    val sym = e.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(e.select(col("b_id").as("src"), col("a_id").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = nodes.select(col("doc_id"), col("doc_id").as("label"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // smallest label among each vertex's neighbors (vertices with no
      // neighbors drop out of nbr and keep their label via left join)
      val nbr = sym
        .join(labels.select(col("doc_id").as("dst"), col("label").as("dlabel")), "dst")
        .groupBy(col("src").as("doc_id")).agg(min("dlabel").as("nmin"))
      val prop = labels.join(nbr, Seq("doc_id"), "left")
        .select(col("doc_id"), col("label").as("old"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("lab1"))
      // materialize each round via EAGER localCheckpoint, which also
      // TRUNCATES the lineage: the round's table is referenced twice by
      // the next round (nbr join + prop join, plus the jump self-join),
      // so without truncation the logical plan DOUBLES per round and
      // analysis goes exponential in the round count — invisible on
      // 2-3-round near-dup graphs, a hang on a 15-round chain. The
      // convergence agg then reads the materialized blocks (cheap
      // second job; checkpoint + agg are the round's two actions).
      val next = (if (!jump) {
        prop.select(col("doc_id"), col("lab1").as("label"),
          (col("lab1") < col("old")).cast("long").as("chg"))
      } else {
        // pointer jumping: label(v) <- label(label(v)). Labels are
        // vertex ids with lab1(v) <= v, so the lookup side is the same
        // propagated table; chains halve every round. Checkpoint it —
        // it feeds both join sides.
        val p = prop.localCheckpoint(true)
        val look = p.select(col("doc_id").as("j_id"), col("lab1").as("j_lab"))
        p.join(look, p("lab1") === look("j_id"), "left")
          .select(p("doc_id"), p("old"),
            least(p("lab1"), coalesce(col("j_lab"), p("lab1"))).as("label"))
          .select(col("doc_id"), col("label"),
            (col("label") < col("old")).cast("long").as("chg"))
      }).localCheckpoint(true)
      changed = next.agg(coalesce(sum("chg"), lit(0L))).head().getLong(0)
      // previous rounds' checkpoint blocks become unreachable here and
      // are released by the ContextCleaner; the tables are label-sized
      labels = next.select("doc_id", "label")
      i += 1
    }
    sym.unpersist()
    // exiting via the iteration cap with changes still flowing means
    // the labels are NOT component ids — silently returning them would
    // hand wrong clusters downstream (and diverge from any exact
    // transitive-closure oracle). Convergence is already computed every
    // round, so fail loudly instead.
    if (changed > 0)
      throw new IllegalStateException(
        s"ConnectedComponents did not converge in $maxIter rounds " +
        s"($changed labels still changing); raise maxIter — the graph has a longer chain than expected")
    labels
  }
}
