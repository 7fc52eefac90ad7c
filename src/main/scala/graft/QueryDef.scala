package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a DataFrame plan plus (optionally) the
  * equivalent DuckDB SQL the driver uses as a correctness oracle.
  * Operator modules expose `Seq[QueryDef]`; SparkEntry concatenates them.
  *
  * `rowsOracle` covers the by-design rows-only tier (sequential-SGD
  * float paths, HLL/percentile sketches — results not SQL-expressible):
  * DuckDB SQL returning one row, one BIGINT `expected_rows`, so the
  * weaker check is still an INDEPENDENT recomputation, not a bare
  * rows>0. Exactly one of oracle/rowsOracle per query.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    rowsOracle: Option[String] = None)
