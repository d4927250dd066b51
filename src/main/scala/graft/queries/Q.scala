package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{floor, lit, round}

/** One declared engine capability: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same parquet
  * tables. The driver hash-compares the two at sf0.01 (CORRECTNESS gate).
  *
  * Cross-engine determinism rules every Q must follow:
  *  - alias every computed column identically in Spark and SQL;
  *  - integer outputs as BIGINT on both sides;
  *  - double aggregates rounded (2-4 dp); exact money math in the INTEGER
  *    CENTS domain via [[Q.cents]]/[[Q.centsSql]] — quantize each row with
  *    floor(x·100 + 0.5) (pure IEEE double arithmetic, bit-identical in
  *    both engines), accumulate as BIGINT (exact, order-independent),
  *    convert to double only at the very end. The round-13 rule —
  *    DECIMAL(18,2) accumulation — was retired by the first 10×-replica
  *    correctness-gate run: Spark's double→DECIMAL cast rounds HALF_UP
  *    while DuckDB's rounds half-even, so rows landing exactly on a
  *    half-cent diverge by 0.01 (7 queries at 10×); and DuckDB evaluates
  *    windowed double sums over a segment TREE, so even a ROWS-frame
  *    "forced order" double prefix sum is not reorder-free there;
  *  - every top-k / limit has a total tie-breaking ORDER BY;
  *  - timestamps compared as epoch micros or DATE, never raw (ns vs us).
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Q {
  /** Tie-free money quantization to integer cents: floor(x·100 + 0.5) is
    * the same IEEE double expression in both engines, so the per-row
    * long is identical everywhere; BIGINT accumulation is then exact and
    * order-independent (no partial-agg or window-tree reordering can
    * change it). Headroom: |cents| ≤ ~2^40 per row leaves ~2^23 rows of
    * margin at worst and ~2^53 rows for normal prices — far past any
    * tested scale; a lake summing past that promotes the accumulator. */
  def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")

  /** Discount as integer basis points — same construction at 10⁴. */
  def bps(c: Column): Column = floor(c * 10000 + lit(0.5)).cast("long")

  /** Cents back to display dollars (input is an exact BIGINT sum; the
    * division and 2dp round see the identical double in both engines). */
  def dollars(c: Column): Column = round(c / 100.0, 2)

  /** SQL twins of [[cents]]/[[bps]]/[[dollars]] for the DuckDB oracles. */
  def centsSql(expr: String): String =
    s"CAST(floor(($expr) * 100 + 0.5) AS BIGINT)"
  def bpsSql(expr: String): String =
    s"CAST(floor(($expr) * 10000 + 0.5) AS BIGINT)"
  def dollarsSql(expr: String): String = s"round(($expr) / 100.0, 2)"

  /** Materialize a small, already-aggregated RESULT table on the driver and
    * rebuild it as a local single-partition DataFrame. Used by queries that
    * persist() heavyweight intermediates: cutting the lineage here lets
    * them unpersist before returning (no cached-table leak across bench /
    * verify invocations) without the consumer re-running the whole DAG.
    * Never used on data-scale tables — results only (pairs, coefficients,
    * windowed aggregates). */
  def localized(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(df.collect().toSeq.asJava, df.schema)
  }
}

object Registry {
  lazy val all: Seq[Q] =
    Relational.defs ++ WindowQueries.defs ++ Dedup.defs ++
      Similarity.defs ++ TextAnalysis.defs ++ Multimodal.defs ++
      StreamingQueries.defs ++ MlQueries.defs ++ ScaleOps.defs ++
      EtlPipeline.defs ++ CurationOps.defs ++ GraphOps.defs ++
      DriftOps.defs ++ BpeTrain.defs

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  lazy val oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
