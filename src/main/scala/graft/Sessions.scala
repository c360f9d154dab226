package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * The reference declares its runtime as an AWS Glue Spark job
  * (`Hoth/FHIR/cloudformations/lambda-stack.yml:17`, `Command.Name: glueetl`)
  * and leaves all tuning to Spark; we pin the settings that matter for a
  * deterministic, scale-ready engine:
  *
  *   - UTC session time zone (oracle comparability),
  *   - AQE on (runtime re-planning: partition coalescing, skew-join splitting
  *     — the 100 TB story depends on it),
  *   - `spark.sql.shuffle.partitions` sized to the local core count rather
  *     than the 200 default (on a real cluster this is set to ~2-3x total
  *     cores; AQE coalesces down from there).
  */
object Sessions {
  def local(appName: String = "graft", cores: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
      .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
      // Parquet TIMESTAMP(NANOS) (events.ts) is unreadable by Spark 4.1
      // without this; Tables.events converts the raw nanos to micros.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // engine-native functions (cosine_sim, …) available in SQL + Column API
    graft.plans.GraftExtensions.register(spark)
    spark
  }
}
