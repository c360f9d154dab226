package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** The custom whole-operator as-of join (AsOfJoinPlan/AsOfMergeJoinExec)
  * must be indistinguishable from the composed union-window operator —
  * same rows, same tie winners, same tolerance and null semantics — while
  * planning as co-partitioned per-side sorts + a two-pointer merge.
  */
class AsOfMergeSpec extends SparkSpec {

  private def purchasesAndClicks() = {
    val t = graft.sources.Tables(spark, sf)
    val purchases = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = t.events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    (purchases, clicks)
  }

  test("merge exec == composed operator on the fixture (no tolerance)") {
    val (p, c) = purchasesAndClicks()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), Option(r.get(4)).map(_.toString))).toSet
    val composed = canon(AsOfJoin.backward(p, c, Seq("user_id"), "ts",
      "click_ts", Seq(("click_ts", "last_click_ts"))))
    val merged = canon(AsOfJoin.backwardMerge(p, c, Seq("user_id"), "ts",
      "click_ts", Seq(("click_ts", "last_click_ts"))))
    assert(merged === composed)
  }

  test("merge exec == composed operator under tolerance") {
    val (p, c) = purchasesAndClicks()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), Option(r.get(4)).map(_.toString))).toSet
    val composed = canon(AsOfJoin.backward(p, c, Seq("user_id"), "ts",
      "click_ts", Seq(("click_ts", "last_click_ts")), toleranceSeconds = Some(600.0)))
    val merged = canon(AsOfJoin.backwardMerge(p, c, Seq("user_id"), "ts",
      "click_ts", Seq(("click_ts", "last_click_ts")), toleranceSeconds = Some(600.0)))
    assert(merged === composed)
  }

  test("plan is the custom exec: two per-side sorts, no union window") {
    val (p, c) = purchasesAndClicks()
    val df = AsOfJoin.backwardMerge(p, c, Seq("user_id"), "ts",
      "click_ts", Seq(("click_ts", "last_click_ts")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), s"custom exec must plan:\n${plan.take(1500)}")
    assert(!plan.contains("Window"), s"no carry-forward window:\n${plan.take(1500)}")
    assert(!plan.contains("Union"), s"no null-padded union:\n${plan.take(1500)}")
    // the merge participates in WHOLE-STAGE CODEGEN (the round-9 doProduce
    // implementation) — a silent fallback to the interpreted doExecute
    // would show the node without a codegen-span marker
    assert(plan.linesIterator.exists(l =>
      l.contains("AsOfMergeJoin") && l.trim.startsWith("+- *(") ||
        l.contains("AsOfMergeJoin") && l.contains("*(")),
      s"merge must run inside a whole-stage codegen span:\n${plan.take(1500)}")
  }

  test("edge semantics match: equal-time ties, null times, unmatched keys") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "2024-01-01 10:00:00"),
      (2L, 10L, "2024-01-01 09:00:00"), // before every right row
      (3L, 20L, "2024-01-01 10:00:00"), // key with no right rows
      (4L, 30L, "2024-01-01 10:00:00")
    ).toDF("id", "k", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq(
      (10L, "2024-01-01 10:00:00", "a"), // tie at left 1's time
      (10L, "2024-01-01 10:00:00", "b"), // tie — hash decides, both paths agree
      (10L, "2024-01-01 09:30:00", "c"),
      (30L, null, "z") // null right time: "-infinity" — matches without
                       // tolerance, never within one (composed semantics)
    ).toDF("k", "rts", "v").withColumn("rts", col("rts").cast("timestamp"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> Option(r.getAs[String]("v"))).toMap
    val composed = canon(AsOfJoin.backward(left, right, Seq("k"), "ts", "rts",
      Seq(("v", "v"))))
    val merged = canon(AsOfJoin.backwardMerge(left, right, Seq("k"), "ts", "rts",
      Seq(("v", "v"))))
    assert(merged === composed)
    assert(merged(2L).isEmpty, "left row before all right rows matches nothing")
    assert(merged(3L).isEmpty, "unmatched key yields null")
    assert(merged(4L) === Some("z"), "null right time acts as -infinity")
    assert(merged(1L).nonEmpty && Set("a", "b").contains(merged(1L).get))
    // under ANY tolerance the null-time match must null out — both paths
    val composedTol = canon(AsOfJoin.backward(left, right, Seq("k"), "ts", "rts",
      Seq(("v", "v")), toleranceSeconds = Some(1e9)))
    val mergedTol = canon(AsOfJoin.backwardMerge(left, right, Seq("k"), "ts", "rts",
      Seq(("v", "v")), toleranceSeconds = Some(1e9)))
    assert(mergedTol === composedTol)
    assert(mergedTol(4L).isEmpty, "null-time match is outside every tolerance")
  }

  test("deliberate divergences from the composed window on degenerate inputs") {
    import spark.implicits._
    // merge_asof semantics (the documented contract of backwardMerge):
    // the matched right row is carried WHOLE, and a null left time never
    // matches — both differ from the composed window's per-column
    // last(ignoreNulls) stitching / nulls-first frame on these inputs
    val left = Seq((1L, 10L, Some("2024-01-01 12:00:00")),
      (2L, 20L, None))
      .toDF("id", "k", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq(
      (10L, Some("2024-01-01 10:00:00"), Some("x")),
      (10L, Some("2024-01-01 11:00:00"), None), // later match, null value
      (20L, None, Some("z")) // null right time for the null-left-time key
    ).toDF("k", "rts", "v").withColumn("rts", col("rts").cast("timestamp"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> Option(r.getAs[String]("v"))).toMap
    val composed = canon(AsOfJoin.backward(left, right, Seq("k"), "ts", "rts",
      Seq(("v", "v"))))
    val merged = canon(AsOfJoin.backwardMerge(left, right, Seq("k"), "ts", "rts",
      Seq(("v", "v"))))
    assert(composed(1L) === Some("x"), "composed stitches past the null value")
    assert(merged(1L).isEmpty, "merge carries the whole matched row: null stays null")
    assert(composed(2L) === Some("z"), "composed nulls-first frame matches null-to-null")
    assert(merged(2L).isEmpty, "merge: a null left time never matches")
  }

  test("merge exec rejects mismatched key types loudly") {
    import spark.implicits._
    val left = Seq((1L, 1, "2024-01-01 10:00:00")).toDF("id", "k", "ts")
      .withColumn("ts", col("ts").cast("timestamp")) // k: INT
    val right = Seq((1L, "2024-01-01 09:00:00", "a")).toDF("k", "rts", "v")
      .withColumn("rts", col("rts").cast("timestamp")) // k: BIGINT
    intercept[IllegalArgumentException] {
      AsOfJoin.backwardMerge(left, right, Seq("k"), "ts", "rts", Seq(("v", "v")))
    }
  }

  test("streaming enrichment: micro-batches through the custom exec == batch") {
    import spark.implicits._
    // enrich-at-ingest: each micro-batch as-of joins a frozen reference
    // dimension — run through the CUSTOM plan inside foreachBatch, proving
    // the injected strategy serves streaming micro-batches too
    val tmp = tempDir("graft_asofstream")
    val dim = Seq((10L, "2024-01-01 08:00:00", "old"),
      (10L, "2024-01-01 11:00:00", "new"), (20L, "2024-01-01 09:00:00", "only"))
      .toDF("k", "rts", "v").withColumn("rts", col("rts").cast("timestamp"))
    dim.write.parquet(s"$tmp/dim")
    val frozenDim = spark.read.parquet(s"$tmp/dim")
    val events = Seq((1L, 10L, "2024-01-01 10:00:00"), (2L, 20L, "2024-01-01 10:00:00"),
      (3L, 10L, "2024-01-01 12:00:00"), (4L, 30L, "2024-01-01 12:00:00"))
      .toDF("id", "k", "ts").withColumn("ts", col("ts").cast("timestamp"))
    events.filter($"id" <= 2).coalesce(1).write.mode("append").parquet(s"$tmp/in")
    events.filter($"id" > 2).coalesce(1).write.mode("append").parquet(s"$tmp/in")
    val q = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
      .writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        AsOfJoin.backwardMerge(batch, frozenDim, Seq("k"), "ts", "rts",
          Seq(("v", "v")))
          .write.mode("append").parquet(s"$tmp/out")
      }
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$tmp/out")
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("v"))).toMap
    val batch = AsOfJoin.backwardMerge(events, dim, Seq("k"), "ts", "rts",
      Seq(("v", "v")))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("v"))).toMap
    assert(streamed === batch)
    assert(streamed(1L) === Some("old") && streamed(3L) === Some("new"))
    assert(streamed(4L).isEmpty)
  }

  test("streaming enrichment with a MULTI-VALUE payload == batch") {
    import spark.implicits._
    // the payload shape that motivates the custom tier (ProbeAsOf: the
    // composed union-window degrades with carried width and OOMs the
    // driver at 64 columns) — pin micro-batch == batch for a 4-column
    // mixed-type carry through the custom exec
    val tmp = tempDir("graft_asofwide")
    val dim = Seq(
      (10L, "2024-01-01 08:00:00", "old", 1L, 0.5, "2023-12-31 00:00:00"),
      (10L, "2024-01-01 11:00:00", "new", 2L, 1.5, "2024-01-01 00:00:00"),
      (20L, "2024-01-01 09:00:00", "only", 3L, 2.5, "2024-01-02 00:00:00"))
      .toDF("k", "rts", "v_str", "v_num", "v_dbl", "v_ts")
      .withColumn("rts", col("rts").cast("timestamp"))
      .withColumn("v_ts", col("v_ts").cast("timestamp"))
    dim.write.parquet(s"$tmp/dim")
    val frozenDim = spark.read.parquet(s"$tmp/dim")
    val events = Seq((1L, 10L, "2024-01-01 10:00:00"),
      (2L, 20L, "2024-01-01 10:00:00"), (3L, 10L, "2024-01-01 12:00:00"),
      (4L, 30L, "2024-01-01 12:00:00"))
      .toDF("id", "k", "ts").withColumn("ts", col("ts").cast("timestamp"))
    events.filter($"id" <= 2).coalesce(1).write.mode("append").parquet(s"$tmp/in")
    events.filter($"id" > 2).coalesce(1).write.mode("append").parquet(s"$tmp/in")
    val vals = Seq(("v_str", "v_str"), ("v_num", "v_num"),
      ("v_dbl", "v_dbl"), ("v_ts", "v_ts"))
    val q = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in")
      .writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        AsOfJoin.backwardMerge(batch, frozenDim, Seq("k"), "ts", "rts", vals)
          .write.mode("append").parquet(s"$tmp/out")
      }
      .start()
    q.awaitTermination()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v_str", "v_num", "v_dbl", "v_ts")
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val streamed = canon(spark.read.parquet(s"$tmp/out"))
    val batchRes = canon(
      AsOfJoin.backwardMerge(events, dim, Seq("k"), "ts", "rts", vals))
    assert(streamed === batchRes)
    // the whole matched row carries together — row 3 gets ALL of "new"'s
    // columns, row 4 (no match) gets all nulls
    assert(streamed(3L).head === "new" && streamed(3L)(1) === 2L)
    assert(streamed(4L).forall(_ == null))
  }

  test("forward merge == composed forward on the fixture, with and without tolerance") {
    val t = graft.sources.Tables(spark, sf)
    val clicks = t.events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = t.events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), Option(r.get(3)).map(_.toString))).toSet
    for (tol <- Seq(None, Some(3600.0))) {
      val composed = canon(AsOfJoin.forward(clicks, purchases, Seq("user_id"),
        "ts", "purchase_ts", Seq(("purchase_ts", "next_purchase_ts")), tol))
      val merged = canon(AsOfJoin.forwardMerge(clicks, purchases, Seq("user_id"),
        "ts", "purchase_ts", Seq(("purchase_ts", "next_purchase_ts")), tol))
      assert(merged === composed, s"tolerance=$tol")
    }
  }

  test("forward merge edge semantics: inclusive >=, shared next right, ties") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "2024-01-01 10:00:00"), // tie with a right row at the same time
      (2L, 10L, "2024-01-01 09:00:00"), // two lefts share the next right
      (3L, 10L, "2024-01-01 23:00:00")  // after every right: no match
    ).toDF("id", "k", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq(
      (10L, "2024-01-01 10:00:00", "a"),
      (10L, "2024-01-01 10:00:00", "b"), // tie — min-hash winner, both paths
      (10L, "2024-01-01 12:00:00", "late")
    ).toDF("k", "rts", "v").withColumn("rts", col("rts").cast("timestamp"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> Option(r.getAs[String]("v"))).toMap
    val composed = canon(AsOfJoin.forward(left, right, Seq("k"), "ts", "rts",
      Seq(("v", "v"))))
    val merged = canon(AsOfJoin.forwardMerge(left, right, Seq("k"), "ts", "rts",
      Seq(("v", "v"))))
    assert(merged === composed)
    assert(merged(1L).nonEmpty && Set("a", "b").contains(merged(1L).get),
      "simultaneous right row is visible (inclusive >=)")
    assert(merged(2L).nonEmpty, "an earlier left matches the shared next right")
    assert(merged(3L).isEmpty, "left after all rights matches nothing")
  }

  test("tie winners match the composed path even on a raw string time column") {
    import spark.implicits._
    // the tie hash must take the RAW right-time value (composed `_tb`
    // parity) — hashing the cast micros could order the same two tying
    // payloads differently. ISO strings keep lexicographic ==
    // chronological, so the only divergence risk IS the hash input.
    val left = Seq((1L, 10L, "2024-01-01 10:00:00"), (2L, 10L, "2024-01-01 11:00:00"))
      .toDF("id", "k", "ts")
    val right = Seq(
      (10L, "2024-01-01 10:00:00", "p"), (10L, "2024-01-01 10:00:00", "q"),
      (10L, "2024-01-01 10:30:00", "r"), (10L, "2024-01-01 10:30:00", "s"))
      .toDF("k", "rts", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> Option(r.getAs[String]("v"))).toMap
    val composed = canon(AsOfJoin.backward(left, right, Seq("k"), "ts", "rts",
      Seq(("v", "v"))))
    val merged = canon(AsOfJoin.backwardMerge(left, right, Seq("k"), "ts", "rts",
      Seq(("v", "v"))))
    assert(merged === composed)
    val fwdComposed = canon(AsOfJoin.forward(left, right, Seq("k"), "ts", "rts",
      Seq(("v", "v"))))
    val fwdMerged = canon(AsOfJoin.forwardMerge(left, right, Seq("k"), "ts", "rts",
      Seq(("v", "v"))))
    assert(fwdMerged === fwdComposed)
  }

  test("merge exec is deterministic across partitionings") {
    val (p, c) = purchasesAndClicks()
    def run(parts: Int) =
      AsOfJoin.backwardMerge(p.repartition(parts), c.repartition(parts + 3),
        Seq("user_id"), "ts", "click_ts", Seq(("click_ts", "last_click_ts")))
        .collect().map(r => (r.getLong(0), Option(r.get(4)).map(_.toString))).toSet
    assert(run(2) === run(11))
  }

  test("string + multi-column keys, incl NULL keys: merge == composed, codegen'd") {
    import spark.implicits._
    // exercises the codegen paths the long-key fixtures miss: UTF8String
    // key compares (genComp/genEqual) and the buffered key clone, the
    // multi-key compare chain, and NULL keys (nulls group together —
    // window-partition semantics on the composed side, nulls-first
    // ordering + null==null candidate equality on the merge side)
    val left = Seq(
      (1L, Some("alice"), 1L, "2024-01-01 10:00:00"),
      (2L, Some("alice"), 2L, "2024-01-01 10:00:00"), // same k1, other k2
      (3L, Some("bob"), 1L, "2024-01-01 12:00:00"),
      (4L, None, 1L, "2024-01-01 12:00:00"), // NULL string key
      (5L, Some("carol"), 9L, "2024-01-01 12:00:00")) // unmatched
      .toDF("id", "k1", "k2", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq(
      (Some("alice"), 1L, "2024-01-01 09:00:00", "a1"),
      (Some("alice"), 1L, "2024-01-01 09:30:00", "a2"), // later: wins for id 1
      (Some("alice"), 2L, "2024-01-01 09:00:00", "b"),
      (Some("bob"), 1L, "2024-01-01 11:00:00", "c"),
      (None, 1L, "2024-01-01 11:30:00", "n")) // NULL key matches NULL key
      .toDF("k1", "k2", "rts", "v").withColumn("rts", col("rts").cast("timestamp"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> Option(r.getAs[String]("v"))).toMap
    val merged = AsOfJoin.backwardMerge(
      left, right, Seq("k1", "k2"), "ts", "rts", Seq(("v", "v")))
    val m = canon(merged)
    val c = canon(AsOfJoin.backward(
      left, right, Seq("k1", "k2"), "ts", "rts", Seq(("v", "v"))))
    assert(m === c, s"multi/string/null-key divergence: $m vs $c")
    assert(m(1L) === Some("a2") && m(2L) === Some("b") && m(3L) === Some("c"))
    assert(m(4L) === Some("n"), "null keys must group together")
    assert(m(5L).isEmpty)
    // and this plan, too, runs inside whole-stage codegen
    merged.collect()
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("AsOfMergeJoin") && l.contains("*(")),
      s"string-key merge must stay codegen'd:\n${plan.take(1200)}")
  }

  test("salted merge == plain merge, including on a hot key") {
    import spark.implicits._
    // one hot user carries most of the left side — the shape the salt
    // exists for; every salt bucket must still see the full right set
    val left = (1 to 400).map(i =>
      (i.toLong, if (i <= 300) 7L else (i % 20).toLong,
        f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00"))
      .toDF("id", "k", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val right = (1 to 120).map(j =>
      (if (j <= 80) 7L else (j % 20).toLong,
        f"2024-01-01 ${j % 24}%02d:${(j * 7) % 60}%02d:30", s"v$j"))
      .toDF("k", "rts", "v").withColumn("rts", col("rts").cast("timestamp"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), Option(r.getAs[String]("v")))).toSet
    val plain = canon(AsOfJoin.backwardMerge(
      left, right, Seq("k"), "ts", "rts", Seq(("v", "v"))))
    val salted = canon(AsOfJoin.backwardMergeSalted(
      left, right, Seq("k"), "ts", "rts", Seq(("v", "v")), salts = 8))
    assert(salted === plain)
    val tol = canon(AsOfJoin.backwardMergeSalted(
      left, right, Seq("k"), "ts", "rts", Seq(("v", "v")), salts = 8,
      toleranceSeconds = Some(1800.0)))
    val tolPlain = canon(AsOfJoin.backwardMerge(
      left, right, Seq("k"), "ts", "rts", Seq(("v", "v")),
      toleranceSeconds = Some(1800.0)))
    assert(tol === tolPlain)
  }
}
