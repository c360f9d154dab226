package graft

import org.apache.spark.sql.functions._
import graft.operators.Validate
import graft.operators.Validate._

class ValidateSpec extends SparkSpec {

  test("report counts each violation class exactly, in one pass") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("ok"), 5.0, "A"),
      (2L, None, 5.0, "A"),          // null name
      (2L, Some("dup"), 5.0, "B"),   // duplicate id
      (3L, Some("ok"), 99.0, "A"),   // out of range
      (4L, Some("ok"), 5.0, "X"),    // unaccepted category
      (5L, Some("ok"), -1.0, "Z")    // out of range AND unaccepted
    ).toDF("id", "name", "v", "cat")
    val rep = Validate.report(df, Seq(
      notNull("name"),
      unique("id"),
      inRange("v", 0.0, 10.0),
      accepted("cat", Seq("A", "B")),
      matches("cat", "^[A-C]$")
    )).collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(rep("not_null(name)") === ((1L, false)))
    assert(rep("unique(id)") === ((1L, false)))
    assert(rep("in_range(v,0.0,10.0)") === ((2L, false)))
    assert(rep("accepted(cat)") === ((2L, false)))
    assert(rep("matches(cat)") === ((2L, false)))
    // plan shape: a Union of aggregate passes (one scalar pass + one grouped
    // pass per unique key set) — no joins anywhere
    val plan = Validate.report(df, Seq(notNull("name"), unique("id")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(1500))
    // and critically no Expand in the unique pass: it must stay a grouped
    // count-per-key (one row per key shuffled), never Catalyst's
    // Expand-based multi-distinct rewrite, which re-shuffles the raw table
    // per distinct set. (Asserted on a unique-only report: the scalar
    // pass's unpivot legitimately plans an Expand over its one-row input.)
    val uniquePlan = Validate.report(df, Seq(unique("id")))
      .queryExecution.executedPlan.toString
    assert(!uniquePlan.contains("Expand"), uniquePlan.take(1500))
    assert(!uniquePlan.contains("Join"), uniquePlan.take(1500))
  }

  test("report rows come out in declaration order") {
    import spark.implicits._
    val df = Seq((1L, Some("x")), (2L, None)).toDF("id", "name")
    val names = Validate.report(df,
      Seq(notNull("name"), unique("id"), inRange("id", 0.0, 10.0)))
      .collect().map(_.getString(0)).toSeq
    assert(names === Seq("not_null(name)", "unique(id)", "in_range(id,0.0,10.0)"))
    // a key column literally named like the internal count alias still works
    val tricky = Seq((1L, 1L), (1L, 2L)).toDF("_cnt", "b")
    val rep = Validate.report(tricky, Seq(unique("_cnt")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("unique(_cnt)") === 1L)
  }

  test("composite unique, null-key rows, and clean-table reports") {
    import spark.implicits._
    val df = Seq((Some(1L), 1L), (Some(1L), 2L), (Some(1L), 2L),
      (None, 7L), (None, 7L)).toDF("a", "b")
    val rep = Validate.report(df, Seq(unique("a", "b")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("unique(a,b)") === 1L,
      "one duplicated (a,b) pair; null-key rows are pairwise distinct (SQL UNIQUE)")
    val clean = Validate.report(Seq((1L, "x")).toDF("id", "s"),
      Seq(notNull("s"), unique("id")))
    assert(clean.filter(!col("pass")).count() === 0)
  }

  test("distributionDrift: hand-derived PSI, identical dists ~0, vanished key finite") {
    import spark.implicits._
    // ref: a×3, b×1; cur: a×1, b×2, c×1 — K=3 keys, A=4, B=4.
    // p(a)=(3+1)/7, q(a)=(1+1)/7 → contribution (2/7)·ln(2) etc.
    val ref = Seq("a", "a", "a", "b").toDF("k")
    val cur = Seq("a", "b", "b", "c").toDF("k")
    val rows = Validate.distributionDrift(ref, cur, "k")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet === Set("a", "b", "c"))
    assert(rows("a")._1 === 3L && rows("a")._2 === 1L)
    def contrib(nr: Long, nc: Long): Long = {
      val p = (nr + 1).toDouble / 7.0; val q = (nc + 1).toDouble / 7.0
      math.floor((p - q) * math.log(p / q) * 1e9 + 0.5).toLong
    }
    assert(rows("a")._3 === contrib(3, 1))
    assert(rows("b")._3 === contrib(1, 2))
    assert(rows("c")._3 === contrib(0, 1), "vanished/new keys contribute finitely")
    assert(rows.values.forall(_._3 >= 0L), "PSI contributions are non-negative")
    // identical snapshots → every contribution exactly 0
    val same = Validate.distributionDrift(ref, ref, "k")
      .agg(sum(col("psi_nano"))).head().getLong(0)
    assert(same === 0L)
  }

  test("snapshotDiff classifies added/removed/changed and omits unchanged") {
    import spark.implicits._
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "text")
    val v2 = Seq((1L, "alpha"), (2L, "beta EDITED"), (4L, "delta")).toDF("id", "text")
    val d = Validate.snapshotDiff(v1, v2, "id", md5(col("text").cast("binary")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("snapshotDiff: null fingerprints are values, not membership signals") {
    import spark.implicits._
    // id 9: null -> 'x' is CHANGED (present both sides), not 'added';
    // id 10: 'x' -> null is CHANGED, not 'removed';
    // id 11: null -> null is unchanged and must be omitted
    val v1 = Seq((9L, None), (10L, Some("x")), (11L, None))
      .toDF("id", "text")
    val v2 = Seq((9L, Some("x")), (10L, None), (11L, None))
      .toDF("id", "text")
    val d = Validate.snapshotDiff(v1, v2, "id", md5(col("text").cast("binary")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(9L -> "changed", 10L -> "changed"))
  }

  test("distributionDrift: a null key in both snapshots is one key with ~zero drift") {
    import spark.implicits._
    val ref = Seq(Some("a"), Some("a"), None, None).toDF("k")
    val cur = Seq(Some("a"), Some("a"), None, None).toDF("k")
    val rows = Validate.distributionDrift(ref, cur, "k").collect()
      .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.size === 2, s"null must be ONE key, got ${rows.keySet}")
    assert(rows(None) === ((2L, 2L, 0L)), "identical null-key counts drift zero")
  }

  test("streaming drift: per-batch PSI vs a frozen reference == batch run") {
    import spark.implicits._
    // monitor-at-ingest: the reference snapshot freezes on disk; every
    // micro-batch is drift-scored against the SAME reference — exact
    // integer quantization makes each batch's report a strict equality
    // with the batch-mode computation on that slice
    val tmp = tempDir("graft_driftstream")
    val ref = Seq("a", "a", "a", "b", "c").toDF("k")
    ref.write.parquet(s"$tmp/ref")
    val frozenRef = spark.read.parquet(s"$tmp/ref")
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    val b2 = Seq((3L, "c"), (4L, "c"), (5L, "d")).toDF("id", "k")
    b1.coalesce(1).write.mode("append").parquet(s"$tmp/in")
    b2.coalesce(1).write.mode("append").parquet(s"$tmp/in")
    val q = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
      .writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        Validate.distributionDrift(frozenRef, batch, "k")
          .withColumn("batch_id", lit(bid))
          .write.mode("append").parquet(s"$tmp/out")
      }
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$tmp/out")
      .collect()
      .map(r => (r.getLong(4), r.getString(0)) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // each micro-batch's report equals the batch-mode drift on that slice
    Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
      val expect = Validate.distributionDrift(ref, b, "k")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      expect.foreach { case (k, v) =>
        assert(streamed((i.toLong, k)) === v, s"batch $i key $k")
      }
    }
  }

  test("refIntegrity counts orphans, ignores null FKs") {
    import spark.implicits._
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val rep = Validate.refIntegrity(child, "fk", parent, "pk", "fk_check").head
    assert(rep.getString(0) === "fk_check")
    assert(rep.getLong(1) === 1L, "only the orphan 99 counts; null FK is not a violation")
    assert(!rep.getBoolean(2))
  }

  test("profile: exact counts, nulls, distinct, and typed min/max rendering") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "a", 1.5), (2L, "a", null), (3L, null, 2.0), (3L, "b", 2.0))
      .toDF("id", "s", "v")
      .withColumn("ts", to_timestamp(lit("2024-03-01 10:30:00")))
    val p = Validate.profile(df, Seq("id", "s", "v", "ts"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(1) === 4L && p("id").getLong(3) === 3L)
    assert(p("s").getLong(2) === 1L, "one null in s")
    assert(p("s").getString(4) === "a" && p("s").getString(5) === "b")
    assert(p("v").getString(4) === "1.500000", "double pinned to the 6dp grid")
    assert(p("ts").getString(4) === "2024-03-01 10:30:00")
    // declaration order preserved
    assert(Validate.profile(df, Seq("v", "id")).collect()
      .map(_.getString(0)).toSeq === Seq("v", "id"))
  }

  test("profile: default approx distinct tracks exact within the HLL rsd") {
    import spark.implicits._
    val df = (1L to 5000L).map(i => (i, i % 97)).toDF("u", "m")
    val exact = Validate.profile(df, Seq("u", "m"), Validate.ExactDistinct)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(exact("u") === 5000L && exact("m") === 97L)
    val approx = Validate.profile(df, Seq("u", "m")) // ApproxDistinct default
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // 4 sigma of the default rsd=0.05
    assert(math.abs(approx("u") - 5000L) <= 5000L * 0.2)
    assert(math.abs(approx("m") - 97L) <= 97L * 0.2)
    // everything except the distinct column is identical across modes
    val ex = Validate.profile(df, Seq("u", "m"), Validate.ExactDistinct)
      .drop("n_distinct").collect().map(_.toSeq).toSeq
    val ap = Validate.profile(df, Seq("u", "m"))
      .drop("n_distinct").collect().map(_.toSeq).toSeq
    assert(ex === ap)
  }
}
