package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r11 key-level pins (queries/StatsR11.scala): the NSW-style
  * graph-ANN — cell-local top-8 graph + deterministic 3-hop beam
  * search — recomputed as a straight Scala fold and compared row for
  * row.
  */
class R11OpsSpec extends AnyFunSuite with SparkFixture {

  private def rnd6(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  test("q_ann_nsw matches the brute build+beam fold") {
    val rows = graft.tables.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val emb = rows.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val corpus = rows.filter(_._1 != 0L).map(_._1).sorted
    // assignment: 6dp argmax over seeds 1..4, min-cid tiebreak
    val seeds = (1L to 4L).map(i => i -> emb(i))
    val cell = corpus.map { v =>
      v -> seeds.map { case (cid, c) => (-rnd6(cos(emb(v), c)), cid) }
        .min._2
    }.toMap
    // cell-local top-8 by (cos DESC, b_id ASC)
    val graph = corpus.map { a =>
      a -> corpus.filter(b => b != a && cell(b) == cell(a))
        .map(b => (b, rnd6(cos(emb(a), emb(b)))))
        .sortBy { case (b, c) => (-c, b) }.take(8).map(_._1)
    }.toMap
    val cq = corpus.map(v => v -> rnd6(cos(emb(v), emb(0L)))).toMap
    // 3-hop beam from entry 1, beam 4
    var visited = Vector(1L)
    var frontier = Vector(1L)
    for (_ <- 1 to 3) {
      val next = frontier.flatMap(v => graph(v)).distinct
        .filterNot(v => visited.contains(v))
        .sortBy(v => (-cq(v), v)).take(4)
      visited ++= next
      frontier = next
    }
    val exact = corpus.sortBy(v => (-cq(v), v)).take(5).toSet
    val want = visited.sortBy(v => (-cq(v), v)).take(5).zipWithIndex
      .map { case (v, i) =>
        (i + 1L, v, cq(v), if (exact(v)) 1L else 0L)
      }
    val got = SparkEntry.queries("q_ann_nsw")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toVector
    assert(got == want)
    assert(got.nonEmpty && got.map(_._1) == (1L to got.length).toVector)
  }

  test("q_ann_nsw_multi: invariants hold and qid=17 matches the fold") {
    val rows = graft.tables.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val emb = rows.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val all = rows.map(_._1).sorted
    val seeds = (1L to 4L).map(i => i -> emb(i))
    val cell = all.map { v =>
      v -> seeds.map { case (cid, c) => (-rnd6(cos(emb(v), c)), cid) }
        .min._2
    }.toMap
    val graph = all.map { a =>
      a -> all.filter(b => b != a && cell(b) == cell(a))
        .map(b => (b, rnd6(cos(emb(a), emb(b)))))
        .sortBy { case (b, c) => (-c, b) }.take(8).map(_._1)
    }.toMap
    val got = SparkEntry.queries("q_ann_nsw_multi")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    // global invariants: one row per sampled query; recall in [0,1];
    // a beam result can never beat the exact top-1
    val sample = all.filter(_ % 17 == 0)
    assert(got.map(_._1).toSeq == sample.toSeq)
    got.foreach { case (qid, rec, f1, e1) =>
      assert(rec >= 0.0 && rec <= 1.0, s"qid=$qid recall=$rec")
      assert(f1 <= e1 + 1e-9, s"qid=$qid found=$f1 exact=$e1")
    }
    // fold one query end to end (qid = 17, entry = 1)
    val qid = 17L
    val cq = all.filter(_ != qid)
      .map(v => v -> rnd6(cos(emb(v), emb(qid)))).toMap
    var visited = Vector(1L)
    var frontier = Vector(1L)
    for (_ <- 1 to 3) {
      val next = frontier.flatMap(v => graph(v)).distinct
        .filter(v => v != qid && !visited.contains(v))
        .sortBy(v => (-cq(v), v)).take(4)
      visited ++= next
      frontier = next
    }
    val res = visited.sortBy(v => (-cq(v), v)).take(5)
    val exact = all.filter(_ != qid).sortBy(v => (-cq(v), v)).take(5)
    val wantRow = (qid,
      math.round(res.count(exact.contains) / 5.0 * 100) / 100.0,
      cq(res.head), cq(exact.head))
    val gotRow = got.find(_._1 == qid).get
    assert(gotRow == wantRow)
  }

  test("q_ann_nndescent: refinement never degrades a node; replaced edges counted") {
    val got = SparkEntry.queries("q_ann_nndescent")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(got.nonEmpty)
    var improved = 0
    got.foreach { case (v, nNb, before, after, nNew) =>
      // re-ranking over a SUPERSET of the old neighbor set can only
      // raise (or keep) the mean neighbor cosine — the NN-descent
      // soundness invariant (µ-grid half-up means, so >= is exact up
      // to one µ of rounding)
      assert(after >= before - 1e-6, s"node $v degraded: $before -> $after")
      assert(nNb >= 1 && nNb <= 8, s"node $v n_nb=$nNb")
      assert(nNew >= 0 && nNew <= nNb, s"node $v n_replaced=$nNew")
      if (after > before) improved += 1
    }
    // the fixture's cell boundaries must cost SOMETHING, or the key
    // measures nothing: at least one node improves
    assert(improved > 0, "no node improved — candidate union is broken")
  }

  test("s_stream_neardup_gate: totals partition the corpus; flags bounded; max-cos sane") {
    val got = SparkEntry.queries("s_stream_neardup_gate")(spark, sf).collect()
    val n = graft.tables.Tables.embeddings(spark, sf).count()
    assert(got.map(_.getAs[Long]("n_arrived")).sum === n)
    got.foreach { r =>
      assert(r.getAs[Long]("n_flagged") >= 0 &&
        r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_arrived"))
      val m = r.getAs[Double]("mean_max_cos")
      assert(m >= -1.0 && m <= 1.0)
    }
    // the gate must fire somewhere on this fixture (q_semdedup's τ
    // drops ~2% of vectors at the same boundary)
    assert(got.map(_.getAs[Long]("n_flagged")).sum > 0)
  }

  test("s_stream_cell_assign: every vector assigned exactly once, to a real cell") {
    val got = SparkEntry.queries("s_stream_cell_assign")(spark, sf).collect()
    val n = graft.tables.Tables.embeddings(spark, sf).count()
    assert(got.map(_.getAs[Long]("n_vecs")).sum === n,
      "assignment must partition the corpus")
    assert(got.map(_.getAs[Long]("cell")).toSet.subsetOf((1L to 4L).toSet))
    got.foreach { r =>
      val m = r.getAs[Double]("mean_own_cos")
      assert(m >= -1.0 && m <= 1.0)
      assert(r.getAs[Long]("min_vec") <= r.getAs[Long]("max_vec"))
    }
  }
}
