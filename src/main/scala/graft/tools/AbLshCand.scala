package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r14 task 2: A/B the q_dedup_lsh_resolve candidate stage shapes.
  * The profiler says candidate generation (band self-join + packed
  * distinct) is ~4.9 s of the ~8.7 s key — far too slow for ~6M tiny
  * rows on 32 cores, with one hot band (1088 docs → ~591k pairs in a
  * single join key, §2.5). Variants:
  *   A: current — bands ⋈ bands on (lang, bsig), packed distinct
  *   B: groupBy (lang, bsig) collect_list, explode i<j pairs map-side,
  *      then distinct — one 400k-row shuffle instead of a self-join
  *   C: B but pairs emitted pre-packed and distinct()
  */
object AbLshCand {
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
    graft.expr.Registry.ensure(spark)
    val bands = graft.operators.EdgeGraph.lshBands(spark, d)
    bands.count()

    def a(): DataFrame = bands
      .select(col("lang"), col("bsig"), col("doc_id").as("a_id"))
      .join(bands.select(col("lang").as("l2"), col("bsig").as("b2"),
          col("doc_id").as("b_id")),
        col("lang") === col("l2") && col("bsig") === col("b2") &&
        col("a_id") < col("b_id"))
      .select(shiftleft(col("a_id"), 32).bitwiseOR(col("b_id")).as("pk"))
      .distinct()
      .select(shiftright(col("pk"), 32).as("a_id"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("b_id"))

    def b(): DataFrame = bands
      .groupBy("lang", "bsig").agg(sort_array(collect_list("doc_id")).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(expr(
        """flatten(transform(ds, (a, i) ->
             transform(slice(ds, i + 2, size(ds) - i - 1), b ->
               shiftleft(a, 32) | b)))""")).as("pk"))
      .distinct()
      .select(shiftright(col("pk"), 32).as("a_id"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("b_id"))

    def time(tag: String)(f: () => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    println("a count: " + a().count() + " b count: " + b().count())
    time("warm-a")(a); time("warm-b")(b)
    for (i <- 1 to 3) { time(s"a-$i")(a); time(s"b-$i")(b) }
    // sanity: identical pair sets
    println("a except b: " + a().exceptAll(b()).count() +
      "  b except a: " + b().exceptAll(a()).count())
    spark.stop()
  }
}
