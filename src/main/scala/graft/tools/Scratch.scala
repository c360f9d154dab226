package graft.tools
import org.apache.spark.sql.functions._
/** Dev scratch main for ad-hoc plan/behavior checks. Not part of the API. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("scratch", 8)
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val out = new java.io.PrintWriter("/tmp/scratch.out")
    out.println(ev.schema.treeString)
    out.println(ev.select(col("ts"), col("ts").cast("string").as("s"))
      .limit(3).collect().mkString("\n"))
    out.close()
    spark.stop()
  }
}
