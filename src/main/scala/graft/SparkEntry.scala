package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2-B/§7 + the builder prompt.
  * Queries are registered per family in graft.operators.*; each carries its
  * own DuckDB oracle SQL (or None for ops with no SQL equivalent, which the
  * driver checks rows-only).
  */
object SparkEntry {

  /** Registry of all implemented queries, in SURVEY §2-B order. */
  val registry: Seq[GQuery] =
    SortQueries.all ++ AggQueries.all ++ JoinQueries.all ++
      WindowQueries.all ++ ScalarQueries.all ++ DedupQueries.all ++
      TextQueries.all ++ VectorQueries.all ++ MultimodalQueries.all ++
      CorpusQueries.all ++ CurationQueries.all ++ Wave8Queries.all ++
      Wave9Queries.all ++ Wave10Queries.all ++ Wave11Queries.all ++
      Wave12Queries.all ++ Wave13Queries.all ++ Wave14Queries.all ++
      Wave15Queries.all ++ Wave16Queries.all ++ Wave17Queries.all ++
      Wave18Queries.all ++ Wave19Queries.all ++ Wave20Queries.all ++
      Wave21Queries.all ++ Wave22Queries.all ++ Wave23Queries.all ++
      Wave24Queries.all ++ Wave25Queries.all ++ Wave26Queries.all ++
      Wave27Queries.all ++ Wave28Queries.all ++ Wave29Queries.all ++
      Wave30Queries.all ++ Wave31Queries.all ++ Wave32Queries.all ++
      Wave33Queries.all ++ Wave34Queries.all ++ Wave35Queries.all ++
      Wave36Queries.all ++ Wave37Queries.all ++ Wave38Queries.all ++
      Wave39Queries.all ++ Wave40Queries.all ++ Wave41Queries.all ++
      Wave42Queries.all ++ Wave43Queries.all ++ Wave44Queries.all ++
      Wave45Queries.all ++ Wave46Queries.all ++ Wave47Queries.all ++
      Wave48Queries.all ++ Wave49Queries.all ++ Wave50Queries.all ++
      Wave51Queries.all ++ Wave52Queries.all ++ Wave53Queries.all ++
      Wave54Queries.all ++ Wave55Queries.all ++ Wave56Queries.all ++
      Wave57Queries.all ++ Wave58Queries.all ++ Wave59Queries.all ++
      Wave60Queries.all ++ Wave61Queries.all ++ Wave62Queries.all ++
      Wave63Queries.all ++ Wave64Queries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped aggregation — the reference's map/reduce aggregation
    * pattern (partial + final HashAggregate) end-to-end. */
  def entry(spark: SparkSession): DataFrame =
    queries("q06_agg_groupby")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.key -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.key -> sql.linesIterator
      .map(_.trim).filter(_.nonEmpty).mkString(" "))).toMap
}
