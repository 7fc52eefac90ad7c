package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a DataFrame plan plus (optionally) the
  * equivalent DuckDB SQL the driver uses as a correctness oracle.
  * Operator modules expose `Seq[QueryDef]`; SparkEntry concatenates them.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
