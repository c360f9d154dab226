package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** As-of join probe (dev evidence tool, SCALE.md §17): composed
  * union-window (`AsOfJoin.backward`) vs custom merge exec
  * (`AsOfJoin.backwardMerge`) at 10M left events / 1M right rows, across
  * carried-payload widths 1/4/16/64 — the measurement behind the custom
  * tier's stated reason to exist (union-padding cost grows with payload
  * width; the merge exchanges native-width rows).
  *
  * Both paths are timed over the SAME forcing shape — sum of xxhash64 over
  * every output column — so neither can win by column pruning, and the two
  * checksums double as a 10M-row bit-equality check (ties included: both
  * paths break equal-(key,time) ties by the same content hash).
  *
  * Usage: runMain graft.tools.ProbeAsOf [leftRows] [rightRows] [reps] [widths]
  * Inputs are generated once to /tmp parquet (deterministic, xxhash64-
  * derived) and re-read, so generation never lands in a timed region.
  * The merge path runs FIRST per width: at width 64 the composed plan can
  * OOM the driver during constraint propagation (65 carry windows over
  * the null-padded union), and the merge numbers should survive that.
  */
object ProbeAsOf {

  def main(args: Array[String]): Unit = {
    val leftRows = if (args.nonEmpty) args(0).toLong else 10000000L
    val rightRows = if (args.length > 1) args(1).toLong else 1000000L
    val reps = if (args.length > 2) args(2).toInt else 3
    val widths = if (args.length > 3) args(3).split(",").toSeq.map(_.toInt)
      else Seq(1, 4, 16, 64)
    val users = 100000L
    val spark = graft.Sessions.local("probe-asof", 32)
    import spark.implicits._
    // the composed width-64 plan OOMs a 32 GB driver inside
    // getAllValidConstraints (65 carry windows over a null-padded union);
    // this knob isolates that explosion so the exec itself can be timed
    if (sys.env.contains("ASOF_NO_CONSTRAINT_PROP"))
      spark.conf.set("spark.sql.constraintPropagation.enabled", "false")

    val dir = s"/tmp/probe_asof_${leftRows}_$rightRows"
    val leftPath = s"$dir/left.parquet"
    val rightPath = s"$dir/right.parquet"
    if (!new java.io.File(leftPath).exists()) {
      // left: 10M events over 100k users, times spread over a year
      spark.range(leftRows)
        .select(
          pmod(xxhash64(col("id"), lit(1)), lit(users)).as("user_id"),
          timestamp_seconds(pmod(xxhash64(col("id"), lit(2)),
            lit(86400L * 365))).as("ts"),
          col("id").as("event_id"))
        .write.mode("overwrite").parquet(leftPath)
      // right: 1M reference rows, same key/time domains, 64 long payloads
      spark.range(rightRows)
        .select(
          Seq(
            pmod(xxhash64(col("id"), lit(3)), lit(users)).as("user_id"),
            timestamp_seconds(pmod(xxhash64(col("id"), lit(4)),
              lit(86400L * 365))).as("rts")) ++
            (1 to 64).map(i =>
              xxhash64(col("id"), lit(100 + i)).as(s"v$i")): _*)
        .write.mode("overwrite").parquet(rightPath)
    }
    val left = spark.read.parquet(leftPath)
    val right = spark.read.parquet(rightPath)

    // bit_xor, not sum: order-independent AND overflow-free under ANSI
    def force(df: DataFrame): Long = {
      val cols = df.columns.map(col).toSeq
      df.select(xxhash64(cols: _*).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)
    }

    println(f"${"width"}%-6s${"path"}%-10s${"times (s)"}%-28swarm-min  checksum")
    for (w <- widths) {
      val vals = (1 to w).map(i => (s"v$i", s"v$i"))
      val paths = Seq(
        "merge" -> (() => graft.operators.AsOfJoin.backwardMerge(
          left, right, Seq("user_id"), "ts", "rts", vals)),
        "composed" -> (() => graft.operators.AsOfJoin.backward(
          left, right, Seq("user_id"), "ts", "rts", vals)))
      val sums = paths.map { case (name, build) =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val s = force(build())
          ((System.nanoTime() - t0) / 1e9, s)
        }
        val warmMin = times.drop(1).map(_._1).min
        println(f"$w%-6d$name%-10s${times.map(t => f"${t._1}%.2f").mkString(" ")}%-28s$warmMin%.2f s   ${times.head._2}%d")
        times.head._2
      }
      require(sums.distinct.size == 1,
        s"checksum mismatch at width $w: merge=${sums.head} composed=${sums(1)}")
      println(s"width $w: paths bit-equal over $leftRows rows")
    }
    spark.stop()
  }
}
