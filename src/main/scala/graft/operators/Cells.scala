package graft.operators

/** Data-derived cell count for the embedding-cell family (r11 VERDICT
  * task 2): every coarse-cell structure (the IVF-graph hybrid in
  * queries/StatsR11.cellGraph, q_dedup_embed's per-label cells,
  * q_semdedup's clusters, the streaming cell assignment) used to pin
  * k = 4 to fixture vec_ids, which makes within-cell pair work
  * Σ|cell|² = n²/4 — quadratic at ANY corpus growth. k now derives
  * from the corpus row count so per-cell size stays ≈ `budget` rows
  * and pair work stays LINEAR: k = max(4, ⌈n / budget⌉).
  *
  * The count that feeds k is a one-row driver action — bounded by
  * design (it is the only corpus-wide scalar the assignment needs,
  * exactly what a production IVF trainer reads before picking nlist).
  * Both engines must use the SAME formula or the hash compare breaks,
  * so the DuckDB oracles compute it with [[kSql]] over the identical
  * corpus expression: at sf0.01 (500 vecs) k = 4 and at sf0.1 (2000)
  * k = 16 — the two SFs exercising DIFFERENT k is what proves the
  * formula is live, not decorative.
  */
object Cells {

  /** target rows per cell for the global cell structures */
  val budget = 125L

  /** k = max(4, ⌈n / budget⌉) — exact integer ceil, no FP */
  def k(n: Long): Int =
    math.max(4L, (n + budget - 1) / budget).toInt

  /** The identical formula in DuckDB SQL as a scalar subquery;
    * `from` is the corpus the Spark side counted (table name or CTE,
    * including any held-out-row predicate).
    */
  def kSql(from: String): String =
    s"(SELECT GREATEST(4, CAST(CEIL(COUNT(*) / $budget.0) AS INT)) FROM $from)"

  /** target rows per (label, cell) for the per-label cell structure
    * (q_dedup_embed): cells per label = max(4, ⌈n / (|labels| ·
    * labelBudget)⌉) — per-label populations are ≈ n/|labels|, so this
    * keeps each label's cells at ≈ labelBudget rows.
    */
  val labelBudget = 25L

  def kPerLabel(n: Long, labels: Long): Int =
    math.max(4L, (n + labels * labelBudget - 1) / (labels * labelBudget)).toInt

  def kPerLabelSql(from: String): String =
    s"(SELECT GREATEST(4, CAST(CEIL(COUNT(*) / " +
      s"(COUNT(DISTINCT label) * $labelBudget.0)) AS INT)) FROM $from)"
}

/** The retrieval-eval query sample (r11 VERDICT task 3): the 1-in-17
  * slice alone is PROPORTIONAL — queries ∝ corpus/17, so the
  * query×corpus score table grows corpus²/17, which is quadratic with
  * a smaller constant, not an eval. Production evals cap the query
  * set ABSOLUTELY; ours keeps only the first [[maxQueries]] sample
  * members by vec_id order, as the pure predicate
  * `vec_id % 17 = 0 AND vec_id < 17·maxQueries` — deterministic,
  * identical in both engines, no rank needed. At sf0.01 (500 vecs,
  * 30 sample members) the cap is slack; at sf0.1 (2000 vecs) it binds
  * 118 → 64 — the two SFs exercising both regimes is the proof the
  * cap is live. Score-table mass is now ≤ maxQueries·corpus — LINEAR.
  */
object EvalSample {
  val every = 17
  val maxQueries = 64
  val bound: Long = every.toLong * maxQueries

  /** the capped sample predicate over a vec_id column, SQL spelling
    * shared verbatim by the DuckDB oracles */
  def sqlPred(c: String): String = s"$c % $every = 0 AND $c < $bound"
}
