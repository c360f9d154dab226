package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._
import graft.sources.GenTable

/** The name-based SQL catalog ([[graft.sources.GenTableCatalog]]):
  * `gt.<ns>.<table>` must read exactly the committed view through the
  * SAME manifest-indexed path (metadata-only aggregates included), SQL
  * DML on catalog names must route to the transactional writers, and
  * every mutation the catalog refuses must refuse loudly.
  */
class GenTableCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base: String = {
    val b = tempDir("graft_cat_base_")
    spark.conf.set("spark.sql.catalog.gt", "graft.sources.GenTableCatalog")
    spark.conf.set("spark.sql.catalog.gt.base", b)
    b
  }

  private def mkTable(ns: String, name: String): String = {
    val dir = s"$base/$ns/$name"
    val rows = Seq((1L, "d0", 1.0), (2L, "d0", 2.0), (3L, "d1", 3.0),
      (4L, "d1", 4.0)).toDF("id", "day", "value")
    GenTable.upsertBatch(rows, dir, "id", Seq("value"), "day",
      statsCols = Seq("id"))
    dir
  }

  private def content(dir: String): Set[(Long, String, Double)] =
    GenTable.read(spark, dir).get.select("id", "day", "value")
      .as[(Long, String, Double)].collect().toSet

  test("SELECT through the catalog == the committed view; count is metadata-only") {
    mkTable("prod", "t1")
    val got = spark.sql("SELECT id, value, day FROM gt.prod.t1")
      .as[(Long, Double, String)].collect().toSet
    assert(got === Set((1L, 1.0, "d0"), (2L, 2.0, "d0"), (3L, 3.0, "d1"),
      (4L, 4.0, "d1")))
    // filters reach the same skipping path and stay correct
    assert(spark.sql(
      "SELECT id FROM gt.prod.t1 WHERE day = 'd1' AND id >= 4")
      .as[Long].collect().toSeq === Seq(4L))
    // count(*) answers from the manifest through the bridged relation's
    // nested indexed read (the aggregate itself runs on the outer plan,
    // so this pins correctness; the zero-scan pin lives on the view path)
    assert(spark.sql("SELECT count(*) FROM gt.prod.t1").as[Long].head() === 4L)
  }

  test("SQL DML on catalog names routes to the transactional writers") {
    val dir = mkTable("prod", "t2")
    spark.sql("DELETE FROM gt.prod.t2 WHERE day = 'd0' AND value > 1.5")
    assert(content(dir) === Set((1L, "d0", 1.0), (3L, "d1", 3.0),
      (4L, "d1", 4.0)))
    assert(GenTable.readCommit(dir).get.meta("commit_op") === "delete")
    spark.sql("UPDATE gt.prod.t2 SET value = value * 10 + id WHERE day = 'd1'")
    assert(content(dir) === Set((1L, "d0", 1.0), (3L, "d1", 33.0),
      (4L, "d1", 44.0)))
    Seq((3L, "d1", -1.0), (9L, "d1", 9.0)).toDF("id", "day", "value")
      .createOrReplaceTempView("cat_src")
    spark.sql(
      """MERGE INTO gt.prod.t2 t USING cat_src s ON t.id = s.id
        |WHEN MATCHED AND s.value < 0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(content(dir) === Set((1L, "d0", 1.0), (4L, "d1", 44.0),
      (9L, "d1", 9.0)))
    assert(GenTable.readCommit(dir).get.meta("commit_op") === "merge")
  }

  test("table discovery: exists/missing/list; DDL refuses loudly") {
    mkTable("disc", "ta")
    mkTable("disc", "tb")
    assert(spark.sql("SHOW TABLES IN gt.disc").select("tableName")
      .as[String].collect().toSet === Set("ta", "tb"))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gt.disc.nope").collect()
    }
    assert(e.getMessage.contains("nope"))
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql("DROP TABLE gt.disc.ta")
    }
    assert(e2.getMessage.contains("lifecycle"))
    assert(content(s"$base/disc/ta").nonEmpty) // nothing was dropped
    // an unpartitioned CREATE refuses with the layout pointer (and
    // leaves nothing behind)
    val e3 = intercept[Exception] {
      spark.sql("CREATE TABLE gt.disc.tc (id BIGINT) USING gentable")
    }
    assert(e3.getMessage.contains("PARTITIONED BY"))
    assert(GenTable.readCommit(s"$base/disc/tc").isEmpty)
  }

  test("ALTER TABLE ADD COLUMNS is a meta-only schema commit: old rows " +
      "read null, inserts carry the new column, other ALTERs still refuse") {
    val dir = mkTable("ddl", "alt1")
    val before = GenTable.readCommit(dir).get
    spark.sql(
      "ALTER TABLE gt.ddl.alt1 ADD COLUMNS (note STRING, score DOUBLE)")
    val c = GenTable.readCommit(dir).get
    assert(c.tableGen === before.tableGen + 1)
    assert(c.meta("commit_op") === "add_columns")
    assert(c.gens === before.gens, "ADD COLUMNS must move no data")
    // old rows read the new columns null through the recorded schema
    assert(spark.sql("SELECT * FROM gt.ddl.alt1").columns.toSeq ===
      Seq("id", "day", "value", "note", "score"))
    assert(spark.sql(
      "SELECT count(*) FROM gt.ddl.alt1 WHERE note IS NULL AND score IS NULL")
      .as[Long].head() === 4L)
    // a zero-option INSERT with the new columns rides the same contract
    spark.sql("INSERT INTO gt.ddl.alt1 VALUES (9, 'd1', 9.0, 'n9', 0.5)")
    assert(spark.sql(
      "SELECT note, score FROM gt.ddl.alt1 WHERE id = 9")
      .as[(String, Double)].head() === (("n9", 0.5)))
    // time travel BEFORE the alter keeps the pre-alter schema
    assert(spark.sql("SELECT * FROM gt.ddl.alt1 VERSION AS OF " +
      before.tableGen).columns.toSeq === Seq("id", "day", "value"))
    // refusals: existing column, NOT NULL, and every other ALTER shape
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE gt.ddl.alt1 ADD COLUMNS (value DOUBLE)")
    }
    assert(e1.getMessage.toLowerCase.contains("value"))
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE gt.ddl.alt1 ADD COLUMNS (hard STRING NOT NULL)")
    }
    assert(e2.getMessage.contains("nullable"))
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE gt.ddl.alt1 RENAME COLUMN note TO note2")
    }
    assert(e3.getMessage.contains("ALTER") ||
      e3.getMessage.contains("evolves"))
    val e4 = intercept[Exception] {
      spark.sql("ALTER TABLE gt.ddl.alt1 DROP COLUMN note")
    }
    assert(e4.getMessage.contains("ALTER") ||
      e4.getMessage.contains("evolves"))
    // nothing after the refusals moved the table
    assert(spark.sql("SELECT count(*) FROM gt.ddl.alt1").as[Long]
      .head() === 5L)
  }

  test("gt.ns.t.history is the commit lineage by name == gentable_history" +
      "(path); TVF name args ride the catalog confinement") {
    val dir = mkTable("ops", "h1")
    spark.sql("DELETE FROM gt.ops.h1 WHERE day = 'd0'")
    // metadata-table spelling == the path TVF, row for row
    val byName = spark.sql(
      "SELECT commit_id, op, n_partitions, n_rows FROM gt.ops.h1.history")
      .as[(Long, String, Int, Long)].collect().toSet
    val byPath = spark.sql("SELECT commit_id, op, n_partitions, n_rows " +
      s"FROM gentable_history('$dir')")
      .as[(Long, String, Int, Long)].collect().toSet
    assert(byName === byPath)
    assert(byName.map(r => (r._1, r._2)) ===
      Set((1L, "upsert"), (2L, "delete")))
    // freshness: a later commit shows up on re-query
    spark.sql("DELETE FROM gt.ops.h1 WHERE id = 3")
    assert(spark.sql("SELECT max(commit_id) FROM gt.ops.h1.history")
      .as[Long].head() === 3L)
    // the TVFs accept the catalog NAME, resolved through base confinement
    assert(spark.sql("SELECT commit_id, op FROM gentable_history('gt.ops.h1')")
      .as[(Long, String)].collect().toSet ===
      Set((1L, "upsert"), (2L, "delete"), (3L, "delete")))
    assert(spark.sql("SELECT * FROM gentable_fsck('gt.ops.h1', 3)").isEmpty)
    assert(spark.sql(
      "SELECT count(*) FROM gentable_changes('gt.ops.h1', 1, 2, 'id')")
      .as[Long].head() === 2L)
    // traversal through the name route refuses like the catalog itself
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gentable_history('gt.ops..h1')").collect()
    }
    assert(e.getMessage.contains("illegal catalog identifier"))
    // a real committed table named `history` wins over the convention
    val hDir = mkTable("ops2", "history")
    assert(spark.sql("SELECT count(*) FROM gt.ops2.history")
      .as[Long].head() === 4L)
    assert(GenTable.readCommit(hDir).isDefined)
  }

  test("catalog reads see the CURRENT commit at each query") {
    val dir = mkTable("prod", "t3")
    assert(spark.sql("SELECT count(*) FROM gt.prod.t3").as[Long].head() === 4L)
    GenTable.deleteWhere(spark, dir, col("day") === "d0")
    assert(spark.sql("SELECT count(*) FROM gt.prod.t3").as[Long].head() === 2L)
  }

  test("CREATE TABLE is a meta-only commit; INSERT routes to the declared " +
      "contract; the empty table reads schema-correct") {
    base // force catalog registration
    spark.sql("CREATE TABLE gt.ddl.c1 (id BIGINT, day STRING, value DOUBLE) " +
      "PARTITIONED BY (day) " +
      "TBLPROPERTIES('keyCol'='id', 'orderCols'='value', 'statsCols'='id')")
    val dir = s"$base/ddl/c1"
    val c0 = GenTable.readCommit(dir).get
    assert(c0.gens.isEmpty && c0.meta("commit_op") === "create")
    assert(GenTable.writeDefaultsOf(c0).appendContract === Some(("id", Seq("value"))))
    // empty table: schema-correct zero rows in DECLARED column order,
    // and count is metadata-only
    assert(spark.sql("SELECT * FROM gt.ddl.c1").columns.toSeq ===
      Seq("id", "day", "value"))
    assert(spark.sql("SELECT count(*) FROM gt.ddl.c1").as[Long].head() === 0L)
    spark.sql("INSERT INTO gt.ddl.c1 VALUES (1, 'd0', 1.0), (2, 'd1', 2.0)")
    assert(GenTable.readCommit(dir).get.meta("commit_op") === "upsert")
    // INSERT of an existing key is the declared upsert, not a duplicate
    spark.sql("INSERT INTO gt.ddl.c1 VALUES (2, 'd1', 22.0)")
    assert(content(dir) === Set((1L, "d0", 1.0), (2L, "d1", 22.0)))
    // declared statsCols became real skip stats at the first write
    assert(GenTable.readCommit(dir).get.trackedStatsCols === Set("id"))
    // the declared schema gates inserts like any evolved write
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gt.ddl.c1 VALUES (3, 'd0', 'not-a-number')")
    }
    assert(e.getMessage.nonEmpty)
  }

  test("CTAS stages invisibly and publishes atomically; a failed CTAS " +
      "leaves no manifest and no files") {
    base
    Seq((10L, "d0", 5.0), (11L, "d1", 6.0), (12L, "d0", 7.0))
      .toDF("id", "day", "value").createOrReplaceTempView("cat_ctas_src")
    spark.sql("CREATE TABLE gt.ddl.c2 TBLPROPERTIES('keyCol'='id', " +
      "'orderCols'='value', 'partitionCol'='day') " +
      "AS SELECT * FROM cat_ctas_src")
    val dir = s"$base/ddl/c2"
    assert(content(dir) === Set((10L, "d0", 5.0), (11L, "d1", 6.0),
      (12L, "d0", 7.0)))
    assert(GenTable.readCommit(dir).get.meta("commit_op") === "ctas")
    // the TBLPROPERTIES contract drives later INSERTs
    spark.sql("INSERT INTO gt.ddl.c2 VALUES (10, 'd0', 50.0)")
    assert(content(dir).contains((10L, "d0", 50.0)))
    // duplicate CTAS refuses (create semantics)
    val eDup = intercept[Exception] {
      spark.sql("CREATE TABLE gt.ddl.c2 TBLPROPERTIES('partitionCol'='day') " +
        "AS SELECT * FROM cat_ctas_src")
    }
    assert(eDup.getMessage.toLowerCase.contains("exists"))
    // a CTAS whose SELECT fails at runtime aborts: no manifest, no dir
    intercept[Exception] {
      spark.sql("CREATE TABLE gt.ddl.cbad TBLPROPERTIES(" +
        "'partitionCol'='day') AS SELECT id, day, " +
        "assert_true(value < 0) AS chk FROM cat_ctas_src")
    }
    assert(GenTable.readCommit(s"$base/ddl/cbad").isEmpty)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/ddl/cbad")))
    // REPLACE TABLE AS SELECT: content becomes exactly the new SELECT
    spark.sql("CREATE OR REPLACE TABLE gt.ddl.c2 TBLPROPERTIES(" +
      "'keyCol'='id', 'orderCols'='value', 'partitionCol'='day') " +
      "AS SELECT id, day, value * 10 AS value FROM cat_ctas_src")
    assert(content(dir) === Set((10L, "d0", 50.0), (11L, "d1", 60.0),
      (12L, "d0", 70.0)))
  }

  test("SQL time travel on catalog names == readAt; writes to a pinned " +
      "version refuse") {
    val dir = mkTable("tt", "t1")
    GenTable.deleteWhere(spark, dir, col("day") === "d0") // commit 2
    assert(spark.sql("SELECT count(*) FROM gt.tt.t1").as[Long].head() === 2L)
    val v1 = spark.sql("SELECT id, day, value FROM gt.tt.t1 VERSION AS OF 1")
      .as[(Long, String, Double)].collect().toSet
    val oracle = GenTable.readAt(spark, dir, 1L).get
      .select("id", "day", "value").as[(Long, String, Double)].collect().toSet
    assert(v1 === oracle && v1.size === 4)
    // FOR syntax too
    assert(spark.sql(
      "SELECT count(*) FROM gt.tt.t1 FOR VERSION AS OF 1")
      .as[Long].head() === 4L)
    // timestamp travel: now resolves to the head
    val ts = java.time.Instant.now().toString
    assert(spark.sql(
      s"SELECT count(*) FROM gt.tt.t1 TIMESTAMP AS OF '$ts'")
      .as[Long].head() === 2L)
    // a version that was never committed fails loud
    val ev = intercept[Exception] {
      spark.sql("SELECT * FROM gt.tt.t1 VERSION AS OF 99").collect()
    }
    assert(ev.getMessage.nonEmpty)
  }

  test("DESCRIBE/SHOW TBLPROPERTIES surface the manifest's operational " +
      "metadata by name") {
    mkTable("meta", "t1")
    val props = spark.sql("SHOW TBLPROPERTIES gt.meta.t1")
      .as[(String, String)].collect().toMap
    assert(props("partitionCol") === "day")
    assert(props("write_key_col") === "id")
    assert(props("write_order_cols") === "value")
    assert(props("commit_id") === "1")
    assert(props("commit_op") === "upsert")
    // DESCRIBE shows the partitioning as identity transforms
    val desc = spark.sql("DESCRIBE TABLE gt.meta.t1")
      .select("col_name").as[String].collect().toSeq
    assert(desc.contains("day") &&
      desc.exists(_.contains("# Partition Information")))
  }

  test("DataFrameWriterV2 (writeTo) and saveAsTable ride the same staged/" +
      "bridge write paths; unsupported modes refuse loudly") {
    base
    val rows = Seq((1L, "d0", 1.0), (2L, "d1", 2.0), (3L, "d0", 3.0))
      .toDF("id", "day", "value")
    // create = staged CTAS with TBLPROPERTIES as tableProperty
    rows.writeTo("gt.v2.w1").partitionedBy(col("day"))
      .tableProperty("keyCol", "id").tableProperty("orderCols", "value")
      .create()
    val dir = s"$base/v2/w1"
    assert(content(dir).size === 3)
    assert(GenTable.readCommit(dir).get.meta("commit_op") === "ctas")
    // append = the recorded contract's upsert (existing key REPLACES)
    Seq((1L, "d0", 10.0)).toDF("id", "day", "value")
      .writeTo("gt.v2.w1").append()
    assert(content(dir).contains((1L, "d0", 10.0)) && content(dir).size === 3)
    // saveAsTable through the v1 writer resolves the same catalog name
    Seq((4L, "d1", 4.0)).toDF("id", "day", "value")
      .write.format("gentable").mode("append").saveAsTable("gt.v2.w1")
    assert(content(dir).size === 4)
    // replace = staged RTAS
    rows.limit(1).writeTo("gt.v2.w1").partitionedBy(col("day"))
      .tableProperty("keyCol", "id").tableProperty("orderCols", "value")
      .replace()
    assert(content(dir).size === 1)
    // dynamic overwrite has no gentable mapping (the non-atomic pattern
    // the lake replaces): loud
    val e1 = intercept[Exception] { rows.writeTo("gt.v2.w1").overwritePartitions() }
    assert(e1.getMessage.contains("dynamic overwrite"))
    // REPLACE WHERE (Spark's predicate-bounded INSERT) rides
    // SupportsOverwrite to the partition-scoped replaceWhere (r15)
    spark.sql("INSERT INTO gt.v2.w1 REPLACE WHERE day = 'd0' " +
      "VALUES (9, 'd0', 9.0)")
    assert(content(dir) === Set((9L, "d0", 9.0)))
    assert(GenTable.readCommit(dir).get.meta("commit_op") === "replace_where")
    // ...and a row-level REPLACE WHERE predicate refuses loudly
    // (replaceWhere's partition-decidability contract)
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO gt.v2.w1 REPLACE WHERE value > 0 " +
        "VALUES (9, 'd0', 9.0)")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e2).exists(_.contains("partition columns only")))
  }

  test("REPLACE TABLE without AS SELECT empties the table with the new " +
      "declaration; TBLPROPERTIES contracts validate at DDL time") {
    base
    spark.sql("CREATE TABLE gt.ddl.r1 (id BIGINT, day STRING, value DOUBLE) " +
      "PARTITIONED BY (day) TBLPROPERTIES('keyCol'='id', 'orderCols'='value')")
    spark.sql("INSERT INTO gt.ddl.r1 VALUES (1, 'd0', 1.0)")
    assert(content(s"$base/ddl/r1").size === 1)
    // DSv2 REPLACE semantics: the declared empty table, old content
    // time-travelable until vacuum
    spark.sql("CREATE OR REPLACE TABLE gt.ddl.r1 " +
      "(id BIGINT, day STRING, score DOUBLE) PARTITIONED BY (day) " +
      "TBLPROPERTIES('keyCol'='id', 'orderCols'='score')")
    assert(spark.sql("SELECT count(*) FROM gt.ddl.r1").as[Long].head() === 0L)
    assert(spark.table("gt.ddl.r1").columns.toSeq ===
      Seq("id", "day", "score"))
    spark.sql("INSERT INTO gt.ddl.r1 VALUES (5, 'd1', 0.5)")
    assert(spark.sql("SELECT score FROM gt.ddl.r1").as[Double]
      .collect().toSeq === Seq(0.5))
    // an incomplete or mistyped contract refuses at DDL, not first INSERT
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE gt.ddl.bad1 (id BIGINT, day STRING) " +
        "PARTITIONED BY (day) TBLPROPERTIES('keyCol'='id')")
    }
    assert(e1.getMessage.contains("orderCols"))
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE gt.ddl.bad2 (id BIGINT, day STRING) " +
        "PARTITIONED BY (day) TBLPROPERTIES('orderCols'='id')")
    }
    assert(e2.getMessage.contains("keyCol"))
    val e3 = intercept[Exception] {
      spark.sql("CREATE TABLE gt.ddl.bad3 (id BIGINT, day STRING) " +
        "PARTITIONED BY (day) " +
        "TBLPROPERTIES('keyCol'='idd', 'orderCols'='id')")
    }
    assert(e3.getMessage.contains("idd"))
    Seq("bad1", "bad2", "bad3").foreach(t =>
      assert(GenTable.readCommit(s"$base/ddl/$t").isEmpty))
  }

  test("identifier components cannot traverse outside the catalog base") {
    base
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gt.ns.`..`").collect()
    }
    assert(e.getMessage.contains("illegal catalog identifier"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM gt.`..`.t").collect()
    }
    assert(e2.getMessage.contains("illegal catalog identifier"))
  }

  test("a version-pinned table reports the AS-OF layout and properties " +
      "(DESCRIBE must agree with what the pinned scan reads)") {
    val dir = mkTable("prod", "tpin")              // commit 1: day-keyed
    GenTable.repartitionTable(spark, dir, "id")    // commit 2: id-keyed
    val cat = new graft.sources.GenTableCatalog
    cat.initialize("gtpin",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("base", base)))
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("prod"), "tpin")
    def pcolsOf(t: org.apache.spark.sql.connector.catalog.Table): Seq[String] =
      t.partitioning().toSeq.map(_.references.head.fieldNames.mkString("."))
    assert(pcolsOf(cat.loadTable(ident)) === Seq("id"))
    assert(cat.loadTable(ident).properties().get("commit_id") === "2")
    val pinned = cat.loadTable(ident, "1")
    assert(pcolsOf(pinned) === Seq("day"))
    assert(pinned.properties().get("commit_id") === "1")
    assert(pinned.properties().get("partitionCol") === "day")
  }

  test("an aborted CTAS that failed MID-STAGE still removes the " +
      "directory it created (no manifest, no files, no trace)") {
    val dir = s"$base/prod/ctas_midfail"
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("day", StringType)))
    // existedBefore is sampled at staging-table construction — construct
    // FIRST (like Spark does), then simulate stageReplace dying after
    // some partition files landed but before any staged commit exists
    val st = new graft.sources.GenTableStagedTable(dir, schema,
      GenTable.PartitionCols(Seq("day")), Map.empty)
    val leak = java.nio.file.Paths.get(dir, "day=d0", "gen=1")
    java.nio.file.Files.createDirectories(leak)
    java.nio.file.Files.write(leak.resolve("part-0.parquet"),
      Array[Byte](1, 2, 3))
    st.abortStagedChanges()
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir)),
      "a failed-mid-stage CTAS must leave no directory behind")
    // the guard never removes a PRE-EXISTING path: same abort on a
    // committed table sweeps nothing wholesale
    val existing = mkTable("prod", "ctas_existing")
    val st2 = new graft.sources.GenTableStagedTable(existing, schema,
      GenTable.PartitionCols(Seq("day")), Map.empty)
    st2.abortStagedChanges()
    assert(GenTable.readCommit(existing).isDefined)
    assert(content(existing).nonEmpty)
  }
}
