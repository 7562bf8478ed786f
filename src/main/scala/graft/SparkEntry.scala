package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator (SURVEY.md §2, declare=yes) is a [[Q]] registered
  * by its operator group; this object just flattens the registry into the
  * driver's two maps. Oracle SQL lives next to each implementation
  * (see [[graft.operators]]) so names/ordering/rounding stay in sync.
  */
object SparkEntry {
  private lazy val registry: Seq[Q] =
    operators.Etl.qs ++
      operators.Relational.qs ++
      operators.Aggregates.qs ++
      operators.Windows.qs ++
      operators.Scalars.qs ++
      operators.Extras.qs ++
      operators.Tpch.qs ++
      operators.Llm.qs ++
      operators.SourcesOps.qs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Etl.monthlyUsage(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
