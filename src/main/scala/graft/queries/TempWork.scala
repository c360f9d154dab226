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
    // localCheckpoint (not driver collect): lifecycle results are
    // slice-sized, which scales with the fixture — blocks can spill to
    // executor disk where a collect would hold every row on the driver.
    // Measured equal to the lazy pre-wrap shape on s14 (SCALE.md §26);
    // the bench/verify harnesses unpersist the blocks after consuming.
    try body(dir.toString).localCheckpoint(true)
    finally deleteRecursively(dir)
  }

  private def deleteRecursively(dir: java.nio.file.Path): Unit = {
    val s = java.nio.file.Files.walk(dir)
    try s.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.delete(p))
    finally s.close()
  }
}
