package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column helpers that keep Spark results bit-identical to the DuckDB
  * oracle (SURVEY.md §7 risk 1).
  *
  * Double-typed money columns are cast to DECIMAL(18,2) *before* any
  * arithmetic/aggregation so sums are exact and order-independent
  * (float summation order would otherwise differ between engines), and
  * final aggregates are cast to a fixed DECIMAL(38,x) so the parquet
  * logical type matches the oracle's output exactly.
  */
object Parity {
  // Oracle-side discipline (verified against DuckDB 1.0.0):
  //  * any DuckDB cast that REDUCES decimal scale truncates, while Spark's
  //    cast rounds HALF_UP -> the oracle must ROUND(expr, s) before the
  //    CAST (DuckDB ROUND = half away from zero = HALF_UP for all signs).
  //  * DuckDB SUM(integer) returns HUGEINT and RANK()/EXTRACT return
  //    BIGINT -> derived integer columns are cast to BIGINT on both sides.
  //  * decimal multiplication chains must stay within precision 38 on the
  //    Spark side (cast intermediates down) or Spark rounds on overflow.

  /** Exact money value: double -> DECIMAL(18,2). Oracle mirror:
    * CAST(x AS DECIMAL(18,2)). */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Final aggregate type. Oracle mirror: CAST(x AS DECIMAL(38,2)). */
  def dec2(c: Column): Column = c.cast(DecimalType(38, 2))

  /** Final ratio/average type. Oracle mirror: CAST(x AS DECIMAL(38,6)). */
  def dec6(c: Column): Column = c.cast(DecimalType(38, 6))
}
