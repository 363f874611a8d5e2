package graft

import graft.operators.{AttribOps, AuditOps, CorpusOps, CurateOps, DedupOps, EvalOps, EventOps,Extras, FeatureOps, FuzzyOps, GeoOps, GraphOps, HypoOps, IncrOps, Ingest, KafkaLogOps, LabOps, LakehouseOps, MoreOps, NetOps, PathOps, PipelineOps, Relational, RetrievalOps, RuntimeFilterOps, SimilarityOps, StreamEdgeOps, SignalOps, StatOps, SurvOps, TextOps, TimeOps, TpchOps, TpchOps2, WaveOps}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query; SQL-expressible ones carry a DuckDB oracle for the
  * driver's differential check. Queries live with their operator modules
  * (the operators package) so the implementation, its oracle, and its
  * scale notes stay together.
  */
object SparkEntry {

  /** Full registry: reference-parity ingest + relational surface +
    * text / dedup / similarity extensions.
    */
  val registry: Seq[GQuery] =
    Ingest.all ++ Relational.all ++ MoreOps.all ++ TextOps.all ++
      DedupOps.all ++ SimilarityOps.all ++ EventOps.all ++ Extras.all ++
      CorpusOps.all ++ GraphOps.all ++ StatOps.all ++ CurateOps.all ++
      PipelineOps.all ++ FuzzyOps.all ++ WaveOps.all ++ TpchOps.all ++ SignalOps.all ++ LabOps.all ++ PathOps.all ++ TpchOps2.all ++ FeatureOps.all ++ SurvOps.all ++ AttribOps.all ++ TimeOps.all ++ KafkaLogOps.all ++ NetOps.all ++ IncrOps.all ++ RetrievalOps.all ++ GeoOps.all ++ AuditOps.all ++ LakehouseOps.all ++ RuntimeFilterOps.all ++ StreamEdgeOps.all ++ HypoOps.all ++ EvalOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's one "query": latest-state snapshot per key
    * (SURVEY.md §7 minimum slice).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("ingest_latest_global")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Duplicate-name guard: `toMap` silently keeps ONE entry per key, so
    * a name collision would make a query (and its oracle) vanish from
    * the gate with every remaining check still green — exactly how a
    * round-11 session briefly shadowed `asof_join_tolerance`. Fail loud
    * instead.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val dups = registry.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"duplicate query names in registry: ${dups.mkString(", ")}")
    registry.map(q => q.name -> q.run).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (sketch-bucket candidates) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
