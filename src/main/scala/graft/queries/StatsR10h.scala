package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Round-10 wave 8 (SURVEY.md §2 B.10b/B.12): position-bias analytics
  * over session event order — the examination-model input a ranking
  * team reads before correcting CTR for position.
  */
object StatsR10h {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
      Map[String, (SparkSession, String) => DataFrame](

    // CTR by within-session position: events ranked inside their
    // 30-minute-gap session (the q_session_gaps convention, (ts, id)
    // tie-break), click rate per position 1..10 plus the bias ratio
    // vs position 1 — exact counts, two divisions at the end.
    "q_ctr_position" -> ((s, d) => {
      val wu = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
      val pos = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
        .withColumn("prev", lag("us", 1).over(wu))
        .withColumn("brk",
          when(col("prev").isNull
            || col("us") - col("prev") > 1800000000L, 1L).otherwise(0L))
        .withColumn("sid", sum("brk").over(
          wu.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("p", row_number().over(
          Window.partitionBy("user_id", "sid")
            .orderBy(col("us"), col("event_id"))).cast("long"))
        .filter(col("p") <= 10)
        .groupBy("p")
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("clicks"))
        .localCheckpoint(eager = true) // grid leg + position-1 leg
      val p1 = pos.filter(col("p") === 1)
        .select(col("n").as("n1"), col("clicks").as("c1"))
      pos.crossJoin(broadcast(p1))
        .select(col("p").as("position"), col("n"), col("clicks"),
          round(col("clicks").cast("double") / col("n"), 6).as("ctr"),
          round((col("clicks").cast("double") / col("n"))
            / (col("c1").cast("double") / col("n1")), 6)
            .as("bias_vs_p1"))
        .orderBy("position")
    })
  )

  val oracle: Map[String, String] = Map(
    // identical gap sessions + position ranks
    "q_ctr_position" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |brk AS (
        |  SELECT user_id, event_id, us, event_type,
        |    SUM(CASE WHEN prev IS NULL OR us - prev > 1800000000
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS sid
        |  FROM ev),
        |pos AS (
        |  SELECT event_type,
        |    CAST(row_number() OVER (PARTITION BY user_id, sid
        |      ORDER BY us, event_id) AS BIGINT) AS p
        |  FROM brk),
        |g AS (
        |  SELECT p, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
        |      END) AS BIGINT) AS clicks
        |  FROM pos WHERE p <= 10 GROUP BY 1),
        |p1 AS (SELECT n AS n1, clicks AS c1 FROM g WHERE p = 1)
        |SELECT g.p AS position, g.n, g.clicks,
        |  ROUND(CAST(g.clicks AS DOUBLE) / g.n, 6) AS ctr,
        |  ROUND((CAST(g.clicks AS DOUBLE) / g.n)
        |    / (CAST(p1.c1 AS DOUBLE) / p1.n1), 6) AS bias_vs_p1
        |FROM g, p1 ORDER BY position""".stripMargin
  )
}
