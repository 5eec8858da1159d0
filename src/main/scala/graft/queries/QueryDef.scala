package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when SQL-expressible)
  * an equivalent DuckDB oracle run by the driver on the same parquet tables.
  *
  * Determinism rules (driver compares parquet dump vs DuckDB result):
  *   - every output column aliased identically in Spark and SQL;
  *   - money/double sums computed in DECIMAL (exact) then cast to DOUBLE;
  *   - averages as `CAST(decimal_sum AS DOUBLE) / count` (single IEEE
  *     division, bit-identical across engines);
  *   - unordered-set outputs ordered identically on both sides anyway.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def withOracle(sql: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, Some(sql))
  def rowsOnly(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, None)
}
