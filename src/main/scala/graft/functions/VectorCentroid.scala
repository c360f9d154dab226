package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (SURVEY.md §2.4 A9, §2.10 X2): element-wise mean
  * of float vectors — e.g. the centroid of an embedding cluster.
  *
  * `Aggregator[IN, BUF, OUT]` gives Spark a mergeable buffer, so the
  * aggregation is partial (map-side combine) exactly like a built-in: each
  * partition reduces to one (sums, count) buffer before the shuffle. At
  * 100 TB this shuffles `numGroups * dim * 8` bytes, not the input.
  */
object VectorCentroid extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  // Mixed vector lengths in one group (corrupt rows) must not kill the
  // job: the buffer grows to the longest vector seen; shorter vectors
  // contribute zeros on their missing tail.
  private def grown(arr: Array[Double], n: Int): Array[Double] =
    if (arr.length >= n) arr else java.util.Arrays.copyOf(arr, n)

  override def reduce(buf: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    if (v == null) buf
    else {
      val sums = grown(buf._1, v.length)
      var i = 0
      while (i < v.length) { sums(i) += v(i); i += 1 }
      (sums, buf._2 + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      val (big, small) = if (a._1.length >= b._1.length) (a._1, b._1) else (b._1, a._1)
      var i = 0
      while (i < small.length) { big(i) += small(i); i += 1 }
      (big, a._2 + b._2)
    }
  }

  override def finish(buf: (Array[Double], Long)): Array[Double] =
    if (buf._2 == 0) Array.empty[Double]
    else buf._1.map(_ / buf._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}
