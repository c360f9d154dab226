package graft.tools

import org.apache.spark.sql.functions._

/** Probe: what plan/error does Spark 4.1 produce for SQL DML statements
  * against (a) a temp view over the manifest-indexed relation and (b) a
  * path-qualified identifier? Drives the design of the DML resolution
  * rule (which hook sees the plan before what check rejects it).
  */
object ProbeDml {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("probe-dml", cores = 8)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dmlprobe_").toString
    val rows = Seq((1L, "d0", 1.0), (2L, "d0", 2.0), (3L, "d1", 3.0))
      .toDF("id", "day", "value")
    graft.sources.GenTable.upsertBatch(rows, dir, "id", Seq("value"), "day")
    graft.sources.GenTable.createOrReplaceView(spark, dir, "probe_lake")
    for (sql <- Seq(
      "DELETE FROM probe_lake WHERE day = 'd0'",
      "UPDATE probe_lake SET value = value + 1 WHERE id = 3",
      "MERGE INTO probe_lake t USING probe_src s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")) {
      println(s"=== $sql")
      try {
        val plan = spark.sessionState.sqlParser.parsePlan(sql)
        println("parsed: " + plan.getClass.getSimpleName + "\n" + plan)
        spark.sql(sql).collect()
        println("EXECUTED OK")
      } catch {
        case e: Throwable =>
          println(s"FAILED [${e.getClass.getSimpleName}]: " +
            Option(e.getMessage).getOrElse("").take(300))
      }
    }
    spark.stop()
  }
}
