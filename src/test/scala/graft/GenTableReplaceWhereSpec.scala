package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.GenTable

/** Partition-scoped atomic replace ([[GenTable.replaceWhere]]) — the
  * canonical backfill ("atomically replace day=X with this frame") —
  * and its three doorways: the format-write `replaceWhere` option, SQL
  * `INSERT OVERWRITE ... PARTITION (day='X')` over a registered view,
  * and the same statement on a catalog name (the DSv2 SupportsOverwrite
  * write builder). Untouched partitions must stay byte-identical, and
  * every contract violation must refuse BEFORE anything stages.
  */
class GenTableReplaceWhereSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = tempDir("graft_replwhere_")

  private def seed(tuples: (Long, String, Double)*): DataFrame =
    tuples.toSeq.toDF("id", "day", "value")

  private def mk(dir: String): Unit =
    GenTable.upsertBatch(
      seed((1L, "d1", 1.0), (2L, "d1", 2.0), (3L, "d2", 3.0),
        (4L, "d3", 4.0)),
      dir, "id", Seq("value"), "day", statsCols = Seq("id"))

  private def content(dir: String): Set[(Long, String, Double)] =
    GenTable.read(spark, dir).get.select("id", "day", "value")
      .as[(Long, String, Double)].collect().toSet

  private def filesOf(dir: String, day: String): Set[String] =
    GenTable.read(spark, dir).get.inputFiles
      .filter(_.contains(s"day=$day")).toSet

  test("replaceWhere swaps exactly the matching partitions; untouched " +
      "partitions keep their committed files byte-identical") {
    val dir = tmp()
    mk(dir)
    val before1 = filesOf(dir, "d1")
    val before3 = filesOf(dir, "d3")
    // backfill d2 with restated content + CREATE a new in-region day d2b?
    // (region = day >= 'd2' and day < 'd3': covers d2 plus new d2x)
    val n = GenTable.replaceWhere(
      seed((30L, "d2", 30.0), (31L, "d2x", 31.0)),
      dir, col("day") >= "d2" && col("day") < "d3")
    assert(n === 2L) // d2 replaced, d2x created
    assert(content(dir) === Set((1L, "d1", 1.0), (2L, "d1", 2.0),
      (30L, "d2", 30.0), (31L, "d2x", 31.0), (4L, "d3", 4.0)))
    // outside the region: the SAME files, not a rewrite
    assert(filesOf(dir, "d1") === before1)
    assert(filesOf(dir, "d3") === before3)
    assert(GenTable.readCommit(dir).get.meta("commit_op") === "replace_where")
    // a matching partition ABSENT from the frame drops (replace
    // semantics): replacing the region with only d2 content removes d2x
    GenTable.replaceWhere(seed((40L, "d2", 40.0)), dir,
      col("day") >= "d2" && col("day") < "d3")
    assert(content(dir) === Set((1L, "d1", 1.0), (2L, "d1", 2.0),
      (40L, "d2", 40.0), (4L, "d3", 4.0)))
    // region delete: an empty frame empties the region, one commit
    val emptied = GenTable.replaceWhere(seed().select(
        col("id"), col("day"), col("value")), dir, col("day") === "d3")
    assert(emptied === 1L)
    assert(content(dir) === Set((1L, "d1", 1.0), (2L, "d1", 2.0),
      (40L, "d2", 40.0)))
    // nothing matched, nothing staged: no commit at all
    val head = GenTable.readCommit(dir).get.tableGen
    assert(GenTable.replaceWhere(seed().select(
      col("id"), col("day"), col("value")), dir, col("day") === "zzz") === 0L)
    assert(GenTable.readCommit(dir).get.tableGen === head)
  }

  test("replaceWhere refusals are pre-stage: rows outside the region, " +
      "non-partition predicates — table bit-untouched, no file on disk") {
    val dir = tmp()
    mk(dir)
    val head = GenTable.readCommit(dir).get.tableGen
    val leak = intercept[IllegalArgumentException] {
      GenTable.replaceWhere(seed((9L, "d9", 9.0)), dir, col("day") === "d2")
    }
    assert(leak.getMessage.contains("do not satisfy the predicate"))
    val rowLevel = intercept[IllegalArgumentException] {
      GenTable.replaceWhere(seed((9L, "d2", 9.0)), dir, col("value") > 1.0)
    }
    assert(rowLevel.getMessage.contains("partition columns only"))
    assert(GenTable.readCommit(dir).get.tableGen === head)
    assert(GenTable.fsck(dir).clean, "a refused replace must stage nothing")
    // the table's write contract survives a replaceWhere (meta carries)
    GenTable.replaceWhere(seed((9L, "d2", 9.0)), dir, col("day") === "d2")
    assert(GenTable.writeDefaultsOf(GenTable.readCommit(dir).get)
      .appendContract === Some(("id", Seq("value"))))
  }

  test("format write: mode(overwrite) + option(replaceWhere) is the " +
      "same partition-scoped swap") {
    val dir = tmp()
    mk(dir)
    val before1 = filesOf(dir, "d1")
    seed((50L, "d2", 50.0)).write.format("gentable")
      .option("replaceWhere", "day = 'd2'")
      .mode("overwrite").save(dir)
    assert(content(dir) === Set((1L, "d1", 1.0), (2L, "d1", 2.0),
      (50L, "d2", 50.0), (4L, "d3", 4.0)))
    assert(filesOf(dir, "d1") === before1)
    // replaceWhere on mode(append) is a contradiction: refuse loudly
    val e = intercept[IllegalArgumentException] {
      seed((51L, "d2", 51.0)).write.format("gentable")
        .option("replaceWhere", "day = 'd2'").mode("append").save(dir)
    }
    assert(e.getMessage.contains("replaceWhere"))
  }

  test("SQL over the registered view: INSERT OVERWRITE ... PARTITION " +
      "(day='X') routes to replaceWhere; INSERT INTO + PARTITION refuses") {
    val dir = tmp()
    mk(dir)
    val before3 = filesOf(dir, "d3")
    GenTable.createOrReplaceView(spark, dir, "rw_lake")
    // view column order: (id, value, day) — data columns then partition
    spark.sql("INSERT OVERWRITE rw_lake PARTITION (day = 'd2') " +
      "VALUES (60, 60.0), (61, 61.0)")
    assert(content(dir) === Set((1L, "d1", 1.0), (2L, "d1", 2.0),
      (60L, "d2", 60.0), (61L, "d2", 61.0), (4L, "d3", 4.0)))
    assert(filesOf(dir, "d3") === before3)
    assert(GenTable.readCommit(dir).get.meta("commit_op") === "replace_where")
    // INSERT INTO + PARTITION: the append contract carries partition
    // values in rows; a spec would be ambiguous — refuse at analysis
    val head = GenTable.readCommit(dir).get.tableGen
    val into = intercept[Exception] {
      spark.sql("INSERT INTO rw_lake PARTITION (day = 'd2') VALUES (7, 7.0)")
    }
    assert(into.getMessage.contains("INSERT OVERWRITE only"))
    // dynamic specs (no value) are not supported
    val dyn = intercept[Exception] {
      spark.sql("INSERT OVERWRITE rw_lake PARTITION (day) " +
        "VALUES (7, 7.0, 'd2')")
    }
    assert(dyn.getMessage.contains("dynamic PARTITION"))
    // a non-partition column in the spec refuses with the layout
    val wrong = intercept[Exception] {
      spark.sql("INSERT OVERWRITE rw_lake PARTITION (value = 1.0) " +
        "VALUES (7, 'd2')")
    }
    assert(wrong.getMessage.contains("not a partition column"))
    assert(GenTable.readCommit(dir).get.tableGen === head,
      "refused statements must not commit")
  }

  test("catalog names: INSERT OVERWRITE gt.ns.t PARTITION (day='X') " +
      "rides SupportsOverwrite to the same swap; whole-table OVERWRITE " +
      "stays replaceAll") {
    val base = tempDir("graft_rw_cat_")
    spark.conf.set("spark.sql.catalog.gtrw", "graft.sources.GenTableCatalog")
    spark.conf.set("spark.sql.catalog.gtrw.base", base)
    val dir = s"$base/prod/t"
    mk(dir)
    val before1 = filesOf(dir, "d1")
    spark.sql("INSERT OVERWRITE gtrw.prod.t PARTITION (day = 'd2') " +
      "VALUES (70, 70.0)")
    assert(content(dir) === Set((1L, "d1", 1.0), (2L, "d1", 2.0),
      (70L, "d2", 70.0), (4L, "d3", 4.0)))
    assert(filesOf(dir, "d1") === before1)
    assert(GenTable.readCommit(dir).get.meta("commit_op") === "replace_where")
    // whole-table INSERT OVERWRITE (no spec) stays the full replace
    // (catalog column order is the manifest schema's: id, day, value)
    spark.sql("INSERT OVERWRITE gtrw.prod.t VALUES (80, 'd9', 80.0)")
    assert(content(dir) === Set((80L, "d9", 80.0)))
    assert(GenTable.readCommit(dir).get.meta("commit_op") === "replace")
  }

  test("DataFrameWriterV2: writeTo(t).overwrite(condition) is the same " +
      "partition-scoped swap (the programmatic twin)") {
    val base = tempDir("graft_rw_cat2_")
    spark.conf.set("spark.sql.catalog.gtrw2", "graft.sources.GenTableCatalog")
    spark.conf.set("spark.sql.catalog.gtrw2.base", base)
    val dir = s"$base/prod/t"
    mk(dir)
    val before3 = filesOf(dir, "d3")
    seed((90L, "d1", 90.0)).writeTo("gtrw2.prod.t")
      .overwrite(col("day") === "d1")
    assert(content(dir) === Set((90L, "d1", 90.0), (3L, "d2", 3.0),
      (4L, "d3", 4.0)))
    assert(filesOf(dir, "d3") === before3)
    // a row-level overwrite condition refuses loudly (replaceWhere's own
    // partition-decidability contract, surfaced through the builder);
    // the refusal may arrive wrapped — search the cause chain
    val e = intercept[Exception] {
      seed((91L, "d1", 91.0)).writeTo("gtrw2.prod.t")
        .overwrite(col("value") > 0.0)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("partition columns only")))
  }
}
