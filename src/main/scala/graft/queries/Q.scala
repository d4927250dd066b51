package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same parquet
  * tables. The driver hash-compares the two at sf0.01 (CORRECTNESS gate).
  *
  * Cross-engine determinism rules every Q must follow:
  *  - alias every computed column identically in Spark and SQL;
  *  - integer outputs as BIGINT on both sides;
  *  - double aggregates rounded (2-4 dp); exact money math via DECIMAL(18,2)
  *    accumulation then cast to double (bit-identical across engines,
  *    independent of partial-aggregation order);
  *  - every top-k / limit has a total tie-breaking ORDER BY;
  *  - timestamps compared as epoch micros or DATE, never raw (ns vs us).
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Q {
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
