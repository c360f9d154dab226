package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrder

class ZOrderSpec extends SparkSpec {

  private def refZ(a: Long, b: Long): Long =
    (0 until 31).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("zorder2 matches the bit-interleave reference and never goes negative") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rnd.nextLong().abs & 0x7FFFFFFFL, rnd.nextLong().abs & 0x7FFFFFFFL)) ++
      Seq((0L, 0L), (0x7FFFFFFFL, 0x7FFFFFFFL), (1L, 0L), (0L, 1L))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zorder2(col("a"), col("b")).as("z"))
      .collect()
    got.foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z === refZ(a, b), s"($a, $b)")
      assert(z >= 0, s"sign bit must stay clear: ($a, $b) -> $z")
    }
  }

  test("prefix property: z >> 2k is the interleave of a >> k and b >> k") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 500; k <- Seq(1, 5, 16, 29)) {
      val a = rnd.nextLong().abs & 0x7FFFFFFFL
      val b = rnd.nextLong().abs & 0x7FFFFFFFL
      val expected = (0 until (31 - k)).map { i =>
        ((((a >> k) >> i) & 1L) << (2 * i)) | ((((b >> k) >> i) & 1L) << (2 * i + 1))
      }.foldLeft(0L)(_ | _)
      assert((refZ(a, b) >> (2 * k)) === expected, s"a=$a b=$b k=$k")
    }
  }

  test("z-order layout: either-dimension range query touches few partitions, same answer") {
    import spark.implicits._
    // 64x64 grid scaled to the top of the 31-bit key space so the coarse
    // buckets differ; partition the layout by the 4-bit zbucket (16 dirs)
    val scale = 1L << 25
    val pts = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a * scale, b * scale, a, b))
      .toDF("a", "b", "ga", "gb")
      .withColumn("z", ZOrder.zorder2(col("a"), col("b")))
      .withColumn("zb", ZOrder.zbucket(col("z"), 2))
    val dir = tempDir("zorder")
    pts.write.partitionBy("zb").mode("overwrite").parquet(dir)

    // rectangle query: a in [0, 15*scale] (top bits 00), b unconstrained
    val aLo = 0L; val aHi = 15L * scale
    val cand = ZOrder.zbucketCandidates(aLo, aHi, 0L, (1L << 31) - 1, 2)
    assert(cand.size < 16, s"candidate buckets must prune: $cand")
    val pruned = spark.read.parquet(dir)
      .filter(col("zb").isin(cand: _*) && col("a").between(aLo, aHi))
    val full = spark.read.parquet(dir).filter(col("a").between(aLo, aHi))
    assert(pruned.count() === full.count())
    assert(pruned.count() === 16L * 64L)
    // and the partition filter reaches the scan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("zb#"),
      s"zb must prune at partition level:\n${plan.take(1500)}")
  }
}
