package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** Runtime registration of the custom Catalyst expressions as SQL
  * functions (SURVEY.md §7.4). The driver owns SparkSession creation,
  * so `SparkSessionExtensions` injection isn't available — temp
  * function registration is the equivalent per-session hook.
  */
object Registry {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _)  => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** The full custom-function surface, shared by the per-session hook
    * (`ensure`) and the `SparkSessionExtensions` path
    * (graft.GraftExtensions). */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> ((es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    "minhash_sig" -> ((es: Seq[Expression]) => MinHashSignature(es(0), intLit(es(1), "numPerms"))),
    "simhash64" -> ((es: Seq[Expression]) => SimHash64(es(0))),
    "bigram_hashes" -> ((es: Seq[Expression]) => BigramHashes(es(0))),
    "token_hashes" -> ((es: Seq[Expression]) => TokenHashes(es(0))),
    "sorted_intersect_count" -> ((es: Seq[Expression]) => SortedIntersectCount(es(0), es(1))),
    "sorted_dot" -> ((es: Seq[Expression]) => SortedDot(es(0), es(1))),
    "ngrams" -> ((es: Seq[Expression]) => NGrams(es(0), intLit(es(1), "n"))),
    "jaro_winkler" -> ((es: Seq[Expression]) => JaroWinklerSim(es(0), es(1))),
    "zorder2" -> ((es: Seq[Expression]) => ZOrderKey.withCasts(es(0), es(1))),
    "hilbert2" -> ((es: Seq[Expression]) => HilbertKey.withCasts(es(0), es(1))),
    // Spark's internal runtime-filter bloom expressions, surfaced as
    // SQL functions (4.x registers neither publicly): the explicit
    // sketch-then-verify join pre-filter (q_join_bloom_prefilter).
    // bloom_might_contain requires the filter side to be a literal or
    // scalar subquery — exactly how InjectRuntimeFilter uses it.
    // bloom_agg(col[, estimatedNumItems]) — the optional int-literal
    // capacity maps to BloomFilterAggregate's estimatedNumItems (r5,
    // ADVICE: sizing the filter to the build side's distinct count is
    // the at-scale requirement, and extra args now error instead of
    // being silently dropped).
    "bloom_agg" -> ((es: Seq[Expression]) => es match {
      case Seq(e) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(e)
      case Seq(e, n) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          e, Literal(longLit(n, "estimatedNumItems")))
      case other => throw new IllegalArgumentException(
        s"bloom_agg expects (col[, estimatedNumItems]), got ${other.size} args")
    }),
    "bloom_might_contain" -> ((es: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1))),
    "keccak256" -> ((es: Seq[Expression]) => Keccak256(es(0))),
    "lcs_len" -> ((es: Seq[Expression]) => LcsLen(es(0), es(1))),
    "dtw_dist" -> ((es: Seq[Expression]) => DtwDist(es(0), es(1))),
    "lz76" -> ((es: Seq[Expression]) => Lz76(es(0))),
    "nfc_normalize" -> ((es: Seq[Expression]) => NfcNormalize(es(0))),
    "deflate_len" -> ((es: Seq[Expression]) => DeflateLen(es(0))),
    "eth_checksum_address" -> ((es: Seq[Expression]) => ChecksumAddress(es(0))),
    "erf_as" -> ((es: Seq[Expression]) => Erf(es(0))))

  def ensure(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
    // custom optimizer rule + physical strategy surface (idempotent)
    val rules = spark.experimental.extraOptimizations
    val missing = Seq(graft.plans.FoldSelfCosine, graft.plans.RewriteWindowTopK,
      graft.plans.RewriteBandJoin)
      .filterNot(rules.contains(_))
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations = rules ++ missing
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(graft.plans.TopKStrategy))
      spark.experimental.extraStrategies = strategies :+ graft.plans.TopKStrategy
  }
}
