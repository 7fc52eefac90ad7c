package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** All implemented operators, one QueryDef per SURVEY.md §2 row. */
  def all: Seq[QueryDef] =
    Relational.defs ++ Relational2.defs ++ ScaleOps.defs ++ TextAnalytics.defs ++ TextRank.defs ++ Bpe.defs ++ Dedup.defs ++ SuffixArray.defs ++
      Similarity.defs ++ TextProfile.defs ++ Classify.defs ++ MlTrees.defs ++ Dbscan.defs ++ Multimodal.defs ++
      Graph.defs ++ Truss.defs ++ Curation.defs ++ CurationQuality.defs ++ Repetition.defs ++ Mixing.defs ++
      EventAnalytics.defs ++ Forecast.defs ++ QuantileSketch.defs ++
      graft.sources.IoRoundtrip.defs ++
      graft.streaming.EventStreams.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5AggPricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** For each rows-only query (no value oracle BY DESIGN — SGD float
    * paths, sketch registers), DuckDB SQL recomputing the EXPECTED row
    * count independently (one row, one BIGINT `expected_rows`). */
  def rowsOracleSql: Map[String, String] =
    all.flatMap(q => q.rowsOracle.map(q.name -> _)).toMap
}
