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
    val e3 = intercept[UnsupportedOperationException] {
      spark.sql("CREATE TABLE gt.disc.tc (id BIGINT) USING gentable")
    }
    assert(e3.getMessage.contains("transactional write"))
  }

  test("catalog reads see the CURRENT commit at each query") {
    val dir = mkTable("prod", "t3")
    assert(spark.sql("SELECT count(*) FROM gt.prod.t3").as[Long].head() === 4L)
    GenTable.deleteWhere(spark, dir, col("day") === "d0")
    assert(spark.sql("SELECT count(*) FROM gt.prod.t3").as[Long].head() === 2L)
  }
}
