package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** r14 task 1 (r13 VERDICT): settle the q_borda_count shape with a
  * solo idle A/B of the FULL key — the r12 explode+two-shuffle word
  * stats vs the r13 map-side aggregate() lambda — alternating reps in
  * one session so JIT/codegen warmup amortizes identically. The two
  * shapes share the whole rank/score tail (3× competitionRank +
  * crossJoin + top-20), which is exactly what the conflicting r13
  * captures timed, so this measures the real decision.
  *
  * `SPARK_GRAFT_CPUS` sets the core count (driver contract), default
  * 32; `SPARK_GRAFT_SF_DIR` the data dir. 3 reps per shape + warmup.
  */
object AbBorda {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // pre-r13 m: explode + groupBy(doc_id, w) + doc rollup (2 shuffles)
    def mOld(): DataFrame = Tables.documents(spark, d)
      .withColumn("l", split(col("text"), " "))
      .select(col("doc_id"), col("n_chars"), explode(col("l")).as("w"))
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("cw"), max("n_chars").as("nc"))
      .groupBy("doc_id")
      .agg(max("nc").as("nc"), sum("cw").as("n_tok"),
        count(lit(1)).as("n_dis"), max("cw").as("mx_tok"))
      .withColumn("k2", col("n_dis").cast("double") / col("n_tok"))
      .withColumn("k3", col("mx_tok").cast("double") / col("n_tok"))

    // r13 m: map-side aggregate() over the sorted token array
    def mNew(): DataFrame = Tables.documents(spark, d)
      .withColumn("l", split(col("text"), " "))
      .select(col("doc_id"), col("n_chars").as("nc"),
        size(col("l")).cast("long").as("n_tok"),
        size(array_distinct(col("l"))).cast("long").as("n_dis"),
        expr("""aggregate(sort_array(l),
            struct(CAST('' AS STRING) AS prev, 0L AS run, 0L AS mx),
            (acc, x) -> struct(x,
              IF(x = acc.prev, acc.run + 1L, 1L),
              greatest(acc.mx, IF(x = acc.prev, acc.run + 1L, 1L))),
            acc -> acc.mx)""").as("mx_tok"))
      .withColumn("k2", col("n_dis").cast("double") / col("n_tok"))
      .withColumn("k3", col("mx_tok").cast("double") / col("n_tok"))

    // the shared tail, exactly as the key runs it
    def full(m0: DataFrame): DataFrame = {
      val m = m0.localCheckpoint(eager = true)
      import graft.operators.PrefixSum.competitionRank
      val ranked = competitionRank(competitionRank(competitionRank(
          m, "nc", desc = true, "r1"),
          "k2", desc = true, "r2"),
          "k3", desc = false, "r3")
        .crossJoin(broadcast(m.agg(count(lit(1)).as("nn"))))
      ranked.select(col("doc_id"),
          (col("nn") * 3 - col("r1") - col("r2") - col("r3")).as("borda"),
          col("r1"), col("r2"), col("r3"))
        .orderBy(col("borda").desc, col("doc_id"))
        .limit(20)
    }

    def time(tag: String)(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$tag: $dt%.3f s")
      dt
    }
    time("warm-old")(() => full(mOld()))
    time("warm-new")(() => full(mNew()))
    val olds = (1 to 3).map(i => time(s"old-$i")(() => full(mOld())))
    val news = (1 to 3).map(i => time(s"new-$i")(() => full(mNew())))
    println(f"cpus=$cpus old median=${olds.sorted.apply(1)}%.3f new median=${news.sorted.apply(1)}%.3f")
    spark.stop()
  }
}
