package graft.queries

import org.apache.spark.sql.DataFrame

/** Scoped temp-dir lifecycle for registered queries that drive a
  * write-path lifecycle (streaming replay, GenTable commit histories)
  * under /tmp: the body builds its result against a fresh directory, the
  * result is MATERIALIZED (eager localCheckpoint — the frame's partitions
  * move into the block manager, cutting every file dependency), and the
  * directory is deleted before returning — repeated bench/correctness
  * runs leave /tmp exactly as they found it. Results at the
  * registered-query tier are view/slice-sized (the DuckDB oracle hashes
  * them row by row), so checkpointing them is bounded by construction;
  * the blocks release at JVM exit with the forked run.
  */
object TempWork {

  def scoped(prefix: String)(body: String => DataFrame): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    try {
      val out = body(dir.toString)
      // materialize by COLLECT, not localCheckpoint: results at this tier
      // are view-sized by contract (the oracle hashes them row by row),
      // and an eager checkpoint pays block-manager registration for all
      // of the frame's partitions — measured 0.7-1.5 s per lifecycle
      // query at sf0.1 (SCALE.md §26), pure harness overhead
      val spark = out.sparkSession
      spark.createDataFrame(
        java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally deleteRecursively(dir)
  }

  private def deleteRecursively(dir: java.nio.file.Path): Unit = {
    val s = java.nio.file.Files.walk(dir)
    try s.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.delete(p))
    finally s.close()
  }
}
