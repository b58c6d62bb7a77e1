package graft

import java.io.{BufferedReader, PrintStream}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Line-based interactive prompt over [[Database]] — the reference's
  * command-line interface (interface.py:157-305: `load` → add_tables,
  * `query` → SQL + optional save-to-file + optional register-as-table,
  * `display <table> n`, `i` info, `e` exit) without the cluster-submit
  * and plotting menus (o/s per SURVEY §7.3). Reader/writer are injected
  * so the loop is spec-testable; `main` wires stdin/stdout.
  *
  * Error contract mirrors the reference: a failing command prints its
  * message and the loop CONTINUES (interface.py styles a warning and
  * re-prompts) — only `e`/EOF ends it.
  */
object Repl {

  private val Help =
    """commands:
      |  load <name> <path[,path...]>   register a table (csv/csv.gz/parquet by suffix)
      |  i | info [name]                list tables, or rows/cols/time-span of one
      |  query <sql>                    run SQL (UT( macro supported); shows 20 rows
      |  save <path>                    write the last query result (suffix-dispatched)
      |  add <name>                     register the last query result as a table
      |  display <name> [n]             show n rows (default 20)
      |  summary <name>                 deterministic numeric column statistics
      |  e                              exit""".stripMargin

  /** Plain-text row render (Dataset.showString is private[sql]): header +
    * up to n pipe-joined rows + a more-rows marker. A REPL needs readable,
    * not pixel-aligned.
    */
  private def render(df: DataFrame, n: Int): String = {
    val rows = df.take(n + 1)
    val body = rows.take(n).map(_.toSeq.map(v =>
      if (v == null) "null" else v.toString).mkString(" | "))
    val more = if (rows.length > n) "\n... (more rows)" else ""
    (df.columns.mkString(" | ") +: body).mkString("\n") + more
  }

  /** Run the loop until `e` or EOF. Returns the number of commands run. */
  def loop(spark: SparkSession, in: BufferedReader, out: PrintStream): Int = {
    val db = new Database(spark)
    var current: Option[DataFrame] = None
    var n = 0
    var line = in.readLine()
    while (line != null && line.trim != "e") {
      val cmd = line.trim
      if (cmd.nonEmpty) {
        n += 1
        try {
          val (verb, rest) = cmd.split("\\s+", 2) match {
            case Array(v, r) => (v, r.trim)
            case Array(v) => (v, "")
          }
          verb match {
            case "load" =>
              val Array(name, paths) = rest.split("\\s+", 2)
              db.addTable(name, paths.split(","). map(_.trim): _*)
              out.println(s"table $name added")
            case "i" | "info" =>
              if (rest.isEmpty) out.println(db.tableNames.mkString(", "))
              else {
                val inf = db.info(rest)
                out.println(s"$rest: ${inf.rows} rows x ${inf.cols} cols" +
                  inf.tsMin.map(lo => s", ts ${lo}..${inf.tsMax.get}").getOrElse(""))
              }
            case "query" =>
              val res = db.query(rest)
              current = Some(res)
              out.println(render(res, 20))
            case "save" =>
              val res = current.getOrElse(
                throw new IllegalStateException("no query to save — run `query` first"))
              Core.writeResult(res, rest)
              out.println(s"saved to $rest")
            case "add" =>
              val res = current.getOrElse(
                throw new IllegalStateException("no query to add — run `query` first"))
              db.register(rest, res) // full table: info/display/summary see it
              out.println(s"query registered as $rest")
            case "display" =>
              val parts = rest.split("\\s+")
              val rows = if (parts.length > 1) parts(1).toInt else 20
              out.println(render(db.table(parts(0)), rows))
            case "summary" =>
              out.println(render(db.summary(rest), 100))
            case "h" | "help" => out.println(Help)
            case other =>
              out.println(s"unknown command: $other"); out.println(Help)
          }
        } catch {
          case e: Exception =>
            out.println(s"error: ${e.getMessage}") // loop survives, like the
                                                   // reference's warning style
        }
      }
      line = in.readLine()
    }
    n
  }

  def main(args: Array[String]): Unit = {
    val spark = Core.session()
    Console.out.println("graft interactive prompt — h for help, e to exit")
    loop(spark,
      new BufferedReader(new java.io.InputStreamReader(System.in)),
      System.out)
    spark.stop()
  }
}
