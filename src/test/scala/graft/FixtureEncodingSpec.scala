package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import graft.sources.Tables
import graft.queries.EventQueries

/** Pins the loader's robustness to the three parquet encodings the
  * driver-generated `events.ts` has appeared under across fixture
  * regenerations (round-7 postmortem: a re-materialized fixture switched
  * TIMESTAMP(NANOS) → naive timestamp[us]/TIMESTAMP_NTZ and crashed two
  * previously-green queries at analysis time):
  *
  *   - "utc":  UTC-adjusted timestamp[us]  → Spark TimestampType
  *   - "ntz":  naive timestamp[us]         → Spark TIMESTAMP_NTZ
  *   - "long": nanos-as-long (TIMESTAMP(NANOS) under
  *             `spark.sql.legacy.parquet.nanosAsLong=true` reads as INT64)
  *
  * Under EVERY encoding, `Tables.events` must normalize `ts` to session-zone
  * TimestampType, every EventQueries entry must analyze, and the
  * timestamp-arithmetic-heavy queries (as-of both directions, funnel) must
  * return identical results.
  */
class FixtureEncodingSpec extends SparkSpec {

  // e11/e12 replay real streams through temp checkpoints (pinned end-to-end
  // by their own oracled rows + StreamingSpec); their ts path is the same
  // Tables loader exercised here.
  private val streamingKeys = Set("e11_streaming_upsert", "e12_streaming_neardup")

  private def writeFixture(enc: String): String = {
    val base = Tables(spark, sf).events // already normalized TimestampType
    val dir = tempDir(s"graft_enc_${enc}_")
    val variant = enc match {
      case "utc"  => base
      case "ntz"  => base.withColumn("ts", col("ts").cast(TimestampNTZType))
      case "long" => base.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
    }
    variant.write.mode("overwrite").parquet(s"$dir/events.parquet")
    // e42's lake lifecycle reads documents too; it has no ts column, so
    // the encoding variants don't apply — copy it through unchanged
    Tables(spark, sf).documents.write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private lazy val dirs: Map[String, String] =
    Seq("utc", "ntz", "long").map(e => e -> writeFixture(e)).toMap

  test("Tables.events normalizes every fixture encoding to TimestampType") {
    for ((enc, dir) <- dirs) {
      val dt = Tables(spark, dir).events.schema("ts").dataType
      assert(dt == TimestampType, s"encoding '$enc' read back as $dt")
    }
  }

  test("every batch EventQueries entry analyzes under every encoding") {
    for ((enc, dir) <- dirs;
         (name, fn) <- EventQueries.queries if !streamingKeys(name)) {
      withClue(s"$name under '$enc': ") {
        // analysis (resolution + type checking) is where the round-7
        // regression crashed; schema forces it without executing
        fn(spark, dir).schema
      }
    }
  }

  test("as-of joins and funnel return identical results under every encoding") {
    val sensitive = Seq("e05_asof_purchase_click", "e07_asof_forward", "e08_funnel")
    for (name <- sensitive) {
      val results = dirs.map { case (enc, dir) =>
        enc -> EventQueries.queries(name)(spark, dir)
          .collect().map(_.toString).sorted.toSeq
      }
      val (refEnc, ref) = results.head
      for ((enc, got) <- results.tail)
        assert(got == ref, s"$name: '$enc' diverges from '$refEnc'")
    }
  }

  test("Tables.embeddings narrows a float64-drifted embedding column to array<float>") {
    // the embeddings twin of the events.ts encoding drift: a regenerated
    // fixture widening to double must not crash the similarity operators
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val base = Tables(spark, sf).embeddings
    val dir = tempDir("graft_enc_f64_")
    base.withColumn("embedding", col("embedding").cast("array<double>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val t = Tables(spark, dir)
    assert(t.embeddings.schema("embedding").dataType == ArrayType(FloatType, true) ||
      t.embeddings.schema("embedding").dataType == ArrayType(FloatType, false))
    // the native expression path must analyze and execute on the narrowed column
    graft.plans.GraftExtensions.register(spark)
    val n = t.embeddings.limit(10)
      .select(graft.plans.GraftExtensions.cosineSim(col("embedding"), col("embedding")).as("s"))
      .filter(col("s") > 0.99).count()
    assert(n == 10)
  }

  test("AsOfJoin tolerance math is NTZ-robust without loader normalization") {
    // the operator itself (not just Tables) must accept TIMESTAMP_NTZ time
    // columns: a user handing it a raw NTZ frame skips the loader entirely
    import spark.implicits._
    val left = Seq((1L, "2024-01-01 00:00:00"), (2L, "2024-01-01 02:00:00"))
      .toDF("id", "s")
      .select(col("id"), to_timestamp(col("s")).cast(TimestampNTZType).as("t"))
    val right = Seq((1L, "2024-01-01 00:30:00"), (2L, "2024-01-01 05:00:00"))
      .toDF("id", "s")
      .select(col("id"), to_timestamp(col("s")).cast(TimestampNTZType).as("rt"))
    val out = graft.operators.AsOfJoin.forward(
      left, right, keys = Seq("id"), leftTime = "t", rightTime = "rt",
      rightVals = Seq(("rt", "matched_rt")), toleranceSeconds = Some(3600.0))
      .orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Any]("matched_rt") != null, "in-tolerance match must survive")
    assert(out(1).getAs[Any]("matched_rt") == null, "3h gap must be nulled by 1h tolerance")
  }
}
