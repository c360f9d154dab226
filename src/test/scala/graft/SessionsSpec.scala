package graft

class SessionsSpec extends SparkSpec {

  test("clusterConf pins the settings the operators assume") {
    val conf = Sessions.clusterConf(totalCores = 400)
    assert(conf("spark.sql.shuffle.partitions") === "1000")
    assert(conf("spark.sql.extensions") === "graft.plans.GraftExtensions")
    assert(conf("spark.sql.streaming.stateStore.providerClass").contains("RocksDB"))
    assert(conf("spark.hadoop.fs.s3a.committer.name") === "magic")
    assert(conf("spark.sql.legacy.parquet.nanosAsLong") === "true")
    assert(conf("spark.sql.sources.partitionOverwriteMode") === "dynamic")
  }

  test("GraftExtensions class applies cleanly to SparkSessionExtensions") {
    // the spark.sql.extensions entry point must be instantiable + applicable
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
  }
}
