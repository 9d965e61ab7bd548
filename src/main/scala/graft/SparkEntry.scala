package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates one entry per implemented operator from
  * SURVEY.md §2 Part B; `oracleSql` carries the DuckDB-equivalent SQL
  * for every hash-checked key (OMIT rows are unit-tested instead).
  */
object SparkEntry {

  /** Flagship query (TPC-H-Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggs.queries("q_agg_q1")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Joins.queries ++ TpchExtra.queries ++ TpchPartSupp.queries ++ Subqueries.queries ++ Aggs.queries ++ Reshape.queries ++ Windows.queries ++
      SetOps.queries ++ Scalars.queries ++ EventsQ.queries ++ EthOps.queries ++
      LlmOps.queries ++ TextSim.queries ++ MultimodalQ.queries ++ Sampling.queries ++ Analytics.queries ++
      Training.queries ++ StatsR8.queries ++ StatsR8b.queries ++ StatsR8c.queries ++ StatsR8d.queries ++ StatsR8e.queries ++ StatsR8f.queries ++ StatsR9.queries ++ StatsR9b.queries ++ StatsR9c.queries ++ StatsR9d.queries ++ StatsR9e.queries ++ StatsR9f.queries ++ StatsR9g.queries ++ StatsR9h.queries ++ StatsR9i.queries ++ StatsR9j.queries ++ StatsR9k.queries ++ StatsR9l.queries ++ StatsR9m.queries ++ StatsR9n.queries ++ StatsR9o.queries ++ StatsR9p.queries ++ StatsR9q.queries ++ StatsR9r.queries ++ StatsR9s.queries ++ StatsR9t.queries ++ StatsR9u.queries ++ StatsR9v.queries ++ StatsR9w.queries ++ StatsR9x.queries ++ StatsR9y.queries ++ StatsR9z.queries ++ StatsR9za.queries ++ StatsR9zb.queries ++ StatsR9zc.queries ++ StatsR9zd.queries ++ StatsR9ze.queries ++ StatsR9zf.queries ++ StatsR9zg.queries ++ StatsR9zh.queries ++ StatsR9zi.queries ++ StatsR9zj.queries ++ StatsR9zk.queries ++ StatsR9zl.queries ++ StatsR9zm.queries ++ StatsR9zn.queries ++ StatsR9zo.queries ++ StatsR9zp.queries ++ StatsR9zq.queries ++ StatsR9zr.queries ++ StatsR9zs.queries ++ StatsR9zt.queries ++ StatsR9zu.queries ++ StatsR9zv.queries ++ StatsR9zw.queries ++ StatsR9zx.queries ++ StatsR9zy.queries ++ StatsR9zz.queries ++ StatsR9zza.queries ++ StatsR9zzb.queries ++ StatsR9zzc.queries ++ StatsR10.queries ++ StatsR10b.queries ++ StatsR10c.queries ++ StatsR10d.queries ++ StatsR10e.queries ++ StatsR10f.queries ++ StatsR10g.queries ++ StatsR10h.queries ++ StatsR10i.queries ++ StatsR10j.queries ++ StatsR10k.queries ++ StatsR10l.queries ++ StatsR10m.queries ++ StatsR10n.queries ++ StatsR10o.queries ++ StatsR10p.queries ++ StatsR10q.queries ++ StatsR10r.queries ++ StatsR10s.queries ++ StatsR10t.queries ++ StatsR10u.queries ++ StatsR10v.queries ++ StatsR10w.queries ++ StatsR10x.queries ++ StatsR10y.queries ++ StatsR11.queries ++ graft.streaming.StreamOps.queries ++ graft.streaming.StreamOpsR9c.queries ++ graft.streaming.StreamOpsR10.queries ++ graft.streaming.StreamOpsR11.queries

  def oracleSql: Map[String, String] =
    Relational.oracle ++ Joins.oracle ++ TpchExtra.oracle ++ TpchPartSupp.oracle ++ Subqueries.oracle ++ Aggs.oracle ++ Reshape.oracle ++ Windows.oracle ++
      SetOps.oracle ++ Scalars.oracle ++ EventsQ.oracle ++ EthOps.oracle ++
      LlmOps.oracle ++ TextSim.oracle ++ MultimodalQ.oracle ++ Sampling.oracle ++ Analytics.oracle ++
      Training.oracle ++ StatsR8.oracle ++ StatsR8b.oracle ++ StatsR8c.oracle ++ StatsR8d.oracle ++ StatsR8e.oracle ++ StatsR8f.oracle ++ StatsR9.oracle ++ StatsR9b.oracle ++ StatsR9c.oracle ++ StatsR9d.oracle ++ StatsR9e.oracle ++ StatsR9f.oracle ++ StatsR9g.oracle ++ StatsR9h.oracle ++ StatsR9i.oracle ++ StatsR9j.oracle ++ StatsR9k.oracle ++ StatsR9l.oracle ++ StatsR9m.oracle ++ StatsR9n.oracle ++ StatsR9o.oracle ++ StatsR9p.oracle ++ StatsR9q.oracle ++ StatsR9r.oracle ++ StatsR9s.oracle ++ StatsR9t.oracle ++ StatsR9u.oracle ++ StatsR9v.oracle ++ StatsR9w.oracle ++ StatsR9x.oracle ++ StatsR9y.oracle ++ StatsR9z.oracle ++ StatsR9za.oracle ++ StatsR9zb.oracle ++ StatsR9zc.oracle ++ StatsR9zd.oracle ++ StatsR9ze.oracle ++ StatsR9zf.oracle ++ StatsR9zg.oracle ++ StatsR9zh.oracle ++ StatsR9zi.oracle ++ StatsR9zj.oracle ++ StatsR9zk.oracle ++ StatsR9zl.oracle ++ StatsR9zm.oracle ++ StatsR9zn.oracle ++ StatsR9zo.oracle ++ StatsR9zp.oracle ++ StatsR9zq.oracle ++ StatsR9zr.oracle ++ StatsR9zs.oracle ++ StatsR9zt.oracle ++ StatsR9zu.oracle ++ StatsR9zv.oracle ++ StatsR9zw.oracle ++ StatsR9zx.oracle ++ StatsR9zy.oracle ++ StatsR9zz.oracle ++ StatsR9zza.oracle ++ StatsR9zzb.oracle ++ StatsR9zzc.oracle ++ StatsR10.oracle ++ StatsR10b.oracle ++ StatsR10c.oracle ++ StatsR10d.oracle ++ StatsR10e.oracle ++ StatsR10f.oracle ++ StatsR10g.oracle ++ StatsR10h.oracle ++ StatsR10i.oracle ++ StatsR10j.oracle ++ StatsR10k.oracle ++ StatsR10l.oracle ++ StatsR10m.oracle ++ StatsR10n.oracle ++ StatsR10o.oracle ++ StatsR10p.oracle ++ StatsR10q.oracle ++ StatsR10r.oracle ++ StatsR10s.oracle ++ StatsR10t.oracle ++ StatsR10u.oracle ++ StatsR10v.oracle ++ StatsR10w.oracle ++ StatsR10x.oracle ++ StatsR10y.oracle ++ StatsR11.oracle ++ graft.streaming.StreamOps.oracle ++ graft.streaming.StreamOpsR9c.oracle ++ graft.streaming.StreamOpsR10.oracle ++ graft.streaming.StreamOpsR11.oracle
}
