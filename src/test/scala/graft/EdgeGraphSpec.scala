package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EdgeGraph

/** Boundary behavior of the memoized edge layer (r5): the cache must
  * serve per (sfDir, kind, τ) — never bleed results across scale
  * factors or parameterizations — and repeated calls must return the
  * SAME materialization (no re-derivation) with identical rows. */
class EdgeGraphSpec extends AnyFunSuite with SparkFixture {

  test("repeated calls reuse one materialization with identical rows") {
    val a = EdgeGraph.pairs(spark, sf, "bigram", 0.3)
    val b = EdgeGraph.pairs(spark, sf, "bigram", 0.3)
    assert(a eq b, "second call must return the cached frame, not a new derivation")
    assert(a.collect().toSeq === b.collect().toSeq)
  }

  test("cache keys on sfDir: different scale factors serve different edge tables") {
    val small = EdgeGraph.pairs(spark, "/root/testdata/sf0.001", "token", 0.8)
    val mid = EdgeGraph.pairs(spark, "/root/testdata/sf0.01", "token", 0.8)
    assert(!(small eq mid))
    // sf0.01 has strictly more documents, so at this τ it has at least
    // as many near-dup pairs — and empirically more
    assert(mid.count() > small.count())
  }

  test("cache keys on (kind, tau): parameterizations do not collide") {
    val bigram = EdgeGraph.pairs(spark, sf, "bigram", 0.3)
    val token = EdgeGraph.pairs(spark, sf, "token", 0.3)
    assert(!(bigram eq token))
    val tight = EdgeGraph.pairs(spark, sf, "token", 0.95)
    val loose = EdgeGraph.pairs(spark, sf, "token", 0.3)
    assert(tight.count() <= loose.count(),
      "a tighter τ can never admit more pairs than a looser one")
  }

  test("cached frame equals a fresh SetSimJoin derivation under the documented cap") {
    graft.expr.Registry.ensure(spark)
    val cached = EdgeGraph.pairs(spark, sf, "bigram", 0.3).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val fresh = graft.operators.SetSimJoin.auto(spark,
      graft.tables.Tables.documents(spark, sf)
        .select(col("doc_id"), col("lang"),
          expr("bigram_hashes(split(text, ' '))").as("hs")),
      tau = 0.3).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // brute-force fold of the τ<0.5 cap contract: rank each node's
    // neighbors (jaccard DESC, id ASC); keep a pair iff either
    // endpoint ranks the other within TopNeighbors
    val K = EdgeGraph.TopNeighbors
    val byNode = (fresh.map(p => (p._1, (p._2, p._3)))
        ++ fresh.map(p => (p._2, (p._1, p._3))))
      .groupBy(_._1).map { case (src, xs) =>
        src -> xs.map(_._2).sortBy(x => (-x._2, x._1)).take(K)
          .map(_._1).toSet
      }
    val want = fresh.filter(p =>
      byNode(p._1).contains(p._2) || byNode(p._2).contains(p._1))
    assert(cached === want)
  }

  test("capLowTau is identity below the cap and caps a >K clique keeping the min-star") {
    import spark.implicits._
    val K = EdgeGraph.TopNeighbors
    // clique of K+10 nodes at jaccard 1.0: every node's top-K keeps
    // the family minimum (id-ascending tie-break), so connectivity —
    // hence component labels and cluster sizes — survives the cap
    val n = K + 10
    val clique = (for {
      a <- 0 until n; b <- (a + 1) until n
    } yield (a.toLong, b.toLong, 1.0)).toDF("a_id", "b_id", "jaccard")
    val capped = EdgeGraph.capLowTau(clique, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // pair (a, b) kept iff a in b's top-K or b in a's top-K; at equal
    // jaccard top-K = K smallest ids (excluding self)
    def topK(x: Long) = (0 until n).map(_.toLong).filter(_ != x).sorted.take(K).toSet
    val want = (for {
      a <- 0 until n; b <- (a + 1) until n
      if topK(a).contains(b.toLong) || topK(b).contains(a.toLong)
    } yield (a.toLong, b.toLong)).toSet
    assert(capped === want)
    // min-star survives: every node keeps its edge to node 0
    assert((1 until n).forall(b => capped.contains((0L, b.toLong))))
    // and the cap actually bound: the full clique has more pairs
    assert(capped.size < n * (n - 1) / 2)
    // identity at τ >= 0.5 (cap disabled by contract)
    assert(EdgeGraph.capLowTau(clique, 0.8).collect().length
      === n * (n - 1) / 2)
    // identity below the cap: a small clique passes through unchanged
    val small = (for { a <- 0 until 5; b <- (a + 1) until 5 }
      yield (a.toLong, b.toLong, 1.0)).toDF("a_id", "b_id", "jaccard")
    assert(EdgeGraph.capLowTau(small, 0.3).count() === 10)
  }

  test("unknown element kind fails loudly") {
    intercept[IllegalArgumentException] {
      EdgeGraph.pairs(spark, sf, "trigram", 0.3)
    }
  }
}
