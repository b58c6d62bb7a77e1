package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}

/** The interactive prompt driven end-to-end on a scripted session: load →
  * info → query → save → add → query the added view → display, plus the
  * error contract (a failing command prints and the loop CONTINUES —
  * interface.py's warning-and-reprompt behavior).
  */
class ReplSpec extends SparkSpec {

  private def run(script: String): (Int, String) = {
    val bytes = new ByteArrayOutputStream()
    val out = new PrintStream(bytes, true, "UTF-8")
    val n = Repl.loop(spark,
      new BufferedReader(new StringReader(script)), out)
    (n, bytes.toString("UTF-8"))
  }

  test("scripted session: load, info, query, save, add, display") {
    val dir = java.nio.file.Files.createTempDirectory("graft_repl").toString
    df("id BIGINT, v DOUBLE", Seq(R(1L, 2.0), R(2L, 4.0), R(3L, 6.0)))
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val (n, outStr) = run(
      s"""load t $dir/t.parquet
         |info t
         |query SELECT id, v * 2 AS v2 FROM t WHERE id < 3 ORDER BY id
         |save $dir/out.csv
         |add doubled
         |query SELECT COUNT(*) AS n FROM doubled
         |info doubled
         |display doubled
         |display t 2
         |e
         |""".stripMargin)
    assert(n == 9)
    assert(outStr.contains("table t added"))
    assert(outStr.contains("t: 3 rows x 2 cols"))
    assert(outStr.contains("id | v2") && outStr.contains("1 | 4.0"))
    assert(outStr.contains(s"saved to $dir/out.csv"))
    assert(outStr.contains("query registered as doubled"))
    assert(outStr.contains("\n2")) // count over the registered view
    // `add` registers a FULL Database table: info and display see it too
    assert(outStr.contains("doubled: 2 rows x 2 cols"))
    assert(outStr.contains("id | v2"))
    assert(outStr.contains("... (more rows)")) // display 2 of 3
    // the saved file reads back through the same suffix dispatcher
    val saved = Core.readAny(spark, s"$dir/out.csv").collect()
    assert(saved.length == 2)
  }

  test("error contract: bad SQL and save-before-query continue the loop") {
    val (n, outStr) = run(
      """query SELECT definitely broken syntax here
        |save /tmp/never.csv
        |h
        |e
        |""".stripMargin)
    assert(n == 3)
    assert(outStr.contains("error:"))
    assert(outStr.contains("no query to save"))
    assert(outStr.contains("commands:")) // help still printed after errors
    assert(!new java.io.File("/tmp/never.csv").exists())
  }

  test("EOF without `e` ends the loop cleanly") {
    val (n, outStr) = run("i\n")
    assert(n == 1 && outStr.nonEmpty)
  }
}
