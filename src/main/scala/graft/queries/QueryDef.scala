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
  *
  * `dumpSort` carries the last rule OUT of the measured plan when the
  * ordering exists only for the row-positional hash compare: Verify sorts
  * the dump by these columns (ascending) at parquet-write time — outside
  * any timed region — while Bench times `fn`'s production plan, which for
  * a large output no longer pays a global sort whose sole consumer is the
  * gate. Queries whose ordering is part of the SEMANTICS (top-n, ranked
  * output) keep their orderBy inside `fn` and leave this empty.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    dumpSort: Seq[String] = Nil) {

  /** Marks `cols` as gate-only ordering: applied by Verify's dump, absent
    * from the timed plan.
    */
  def sortedDump(cols: String*): QueryDef = copy(dumpSort = cols)
}

object QueryDef {
  def withOracle(sql: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, Some(sql))
  def rowsOnly(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, None)
}
