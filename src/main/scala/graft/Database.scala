package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's user-facing Database API (database_10min/database.py:
  * add_tables 113-136, query 164-224, interface.py display) over the Core
  * engine — a user of the reference drives the same verbs here.
  */
class Database(val spark: SparkSession) {

  /** §1.1 DataFrameWithInfo: lazily computed table summary
    * (database.py:54-80 — rows × cols + time span of a TIMESTAMP/ts column).
    */
  final case class TableInfo(rows: Long, cols: Int,
                             tsMin: Option[Long], tsMax: Option[Long])

  private val tables = scala.collection.mutable.Map.empty[String, DataFrame]
  private val infoCache = scala.collection.mutable.Map.empty[String, TableInfo]

  /** S2 add_tables: register name → file pattern(s); auto temp view. */
  def addTable(name: String, paths: String*): this.type = {
    val df = Core.normalizeNanosTs(Core.readAny(spark, paths: _*))
    df.createOrReplaceTempView(name)
    tables(name) = df
    infoCache.remove(name)
    this
  }

  /** Register an in-memory relation (e.g. a query result) as a table —
    * the reference's "add query as a table to the dataset"
    * (interface.py:303-305): visible to SQL, info, display and summary
    * exactly like a file-backed table.
    */
  def register(name: String, df: DataFrame): this.type = {
    df.createOrReplaceTempView(name)
    tables(name) = df
    infoCache.remove(name)
    this
  }

  def table(name: String): DataFrame = tables(name)
  def tableNames: Seq[String] = tables.keys.toSeq.sorted

  /** Lazy info with memoization (reference caches on first access). */
  def info(name: String): TableInfo = infoCache.getOrElseUpdate(name, {
    val df = tables(name)
    val tsCol = df.columns.find(c => c == "TIMESTAMP" || c == "ts")
    tsCol match {
      case Some(c) =>
        val r = df.agg(count(lit(1)), min(unix_timestamp(col(c))),
          max(unix_timestamp(col(c)))).collect().head
        TableInfo(r.getLong(0), df.columns.length,
          Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]))
      case None =>
        TableInfo(df.count(), df.columns.length, None, None)
    }
  })

  /** P1/P2 query: full SQL with the UT( macro. */
  def query(sql: String): DataFrame = Core.query(spark, sql)

  /** P1 + S3: query straight to a sink path (csv/csv.gz/parquet by suffix). */
  def queryTo(sql: String, path: String): Unit = Core.writeResult(query(sql), path)

  /** O2 display n (interface.py:177-191). */
  def display(name: String, n: Int = 20): Unit = tables(name).show(n, truncate = false)

  /** A12: the reference's `.summary()` table statistics
    * (database.py:140-162), in the deterministic exact variant
    * ([[graft.operators.Agg.summaryStats]]). Defaults to every numeric
    * column.
    */
  def summary(name: String, cols: Seq[String] = Nil): DataFrame = {
    val df = tables(name)
    val numeric =
      if (cols.nonEmpty) cols
      else df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
      }.toSeq
    graft.operators.Agg.summaryStats(df, numeric)
  }
}
