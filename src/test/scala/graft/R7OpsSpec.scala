package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r7 operator semantics, beyond what the DuckDB oracles prove:
  * PQ encode (Lloyd monotonicity + code domain), embedding
  * decontamination soundness vs brute force, DSIR target separation,
  * Holt smoothing vs a pure-Scala reference fold, and curriculum
  * shard completeness. */
class R7OpsSpec extends AnyFunSuite with SparkFixture {

  test("q_pq_encode: codes come from the 8-seed codebook and the Lloyd round never increases total error") {
    val rows = SparkEntry.queries("q_pq_encode")(spark, sf).collect()
    val docs = graft.tables.Tables.embeddings(spark, sf).count()
    assert(rows.length === docs)
    for (r <- rows; c <- Seq("c0", "c1", "c2", "c3"))
      assert((1L to 8L).contains(r.getAs[Long](c)), s"code $c out of codebook")
    assert(rows.forall(_.getAs[Double]("err") >= 0.0))
    // Lloyd monotonicity: final (post-update) total error <= the
    // seed-assignment total error. Reference computed in pure Scala.
    val e = graft.tables.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def sq(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val seedErr = (for {
      (_, emb) <- e; j <- 0 until 4
      sub = emb.slice(j * 16, j * 16 + 16)
    } yield (1 to 8).map(cid =>
      sq(sub, e.find(_._1 == cid).get._2.slice(j * 16, j * 16 + 16))).min).sum
    val gotErr = rows.map(_.getAs[Double]("err")).sum
    assert(gotErr <= seedErr + 1e-6,
      s"post-Lloyd error $gotErr exceeds seed-assignment error $seedErr")
  }

  test("q_contamination_embed: a contaminated flag always has a true >= tau train neighbor (soundness)") {
    val got = SparkEntry.queries("q_contamination_embed")(spark, sf).collect()
    val e = graft.tables.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val train = e.keys.filter(_ % 2 == 0).toSeq
    assert(got.length === e.keys.count(_ % 2 == 1))
    got.filter(_.getAs[Boolean]("contaminated")).foreach { r =>
      val ev = e(r.getAs[Long]("vec_id"))
      val best = train.map(t => cos(ev, e(t))).max
      assert(best >= 0.5 - 1e-6,
        s"vec ${r.getLong(0)} flagged but global best train cos is $best")
    }
    // the blocked max can never exceed the global max
    got.foreach { r =>
      val ev = e(r.getAs[Long]("vec_id"))
      val best = train.map(t => cos(ev, e(t))).max
      assert(r.getAs[Double]("max_train_cos") <= best + 1e-6)
    }
  }

  test("q_importance_resample: target-language docs score higher on average (DSIR separation)") {
    val scores = SparkEntry.queries("q_importance_resample")(spark, sf)
      .join(graft.tables.Tables.documents(spark, sf).select("doc_id", "lang"), "doc_id")
      .select(col("lang"), col("dsir_score")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val en = scores.filter(_._1 == "en").map(_._2)
    val rest = scores.filter(_._1 != "en").map(_._2)
    assert(en.nonEmpty && rest.nonEmpty)
    assert(en.sum / en.length > rest.sum / rest.length,
      "en docs must average a higher importance score than non-en")
  }

  test("q_holt_winters equals a pure-Scala reference fold over the exact-integer daily series") {
    val got = SparkEntry.queries("q_holt_winters")(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Date]("d").toString, r.getAs[Double]("actual"),
        r.getAs[Double]("level"), r.getAs[Double]("trend"),
        Option(r.getAs[java.lang.Double]("forecast")).map(_.doubleValue())))
    val daily = graft.tables.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(floor(col("value") * 1e6).cast("long")).as("su"))
      .orderBy("d").collect()
      .map(r => (r.getAs[java.sql.Date]("d").toString, r.getLong(1) / 1e6))
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    var l = daily(0)._2
    var b = daily(1)._2 - daily(0)._2
    val want = scala.collection.mutable.ArrayBuffer(
      (daily(0)._1, r4(daily(0)._2), r4(l), r4(b), None: Option[Double]))
    for (t <- 1 until daily.length) {
      val v = daily(t)._2
      val fc = l + b
      val l2 = 0.5 * v + 0.5 * (l + b)
      b = 0.3 * (l2 - l) + 0.7 * b
      l = l2
      want += ((daily(t)._1, r4(v), r4(l), r4(b), Some(r4(fc))))
    }
    assert(got.toSeq === want.toSeq)
  }

  test("q_curriculum_shards: shards partition the corpus and tiers are balanced quartiles") {
    val got = SparkEntry.queries("q_curriculum_shards")(spark, sf).collect()
    val docs = graft.tables.Tables.documents(spark, sf).count()
    assert(got.map(_.getAs[Long]("n_docs")).sum === docs)
    val tiers = got.map(_.getAs[Int]("tier")).distinct.sorted
    assert(tiers.sameElements(Array(1, 2, 3, 4)))
    val perTier = got.groupBy(_.getAs[Int]("tier"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    // quartile tiers: each holds 25% ± the tie mass at the cutoffs
    perTier.values.foreach(n =>
      assert(math.abs(n - docs / 4.0) <= docs * 0.1,
        s"tier sizes $perTier far from quartiles"))
  }
}
