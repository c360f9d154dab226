package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded K-minimum-values union (SURVEY.md §2.10 X2): merges sorted
  * distinct hash arrays keeping only the k smallest — the sketch-merge
  * aggregate behind `LinkGraph.kmvNeighborhood`.
  *
  * The whole point is the BOUNDED BUFFER: a collect_list-then-truncate
  * merge holds O(in-degree · k) longs per group before the final slice —
  * a power-law hub with 10M in-links would buffer gigabytes — while this
  * buffer never exceeds k longs at any update or merge, so the
  * aggregation is safely partial (map-side combined) at any degree
  * distribution. Merging two sorted arrays keeping k smallest is O(k),
  * deterministic, and order-independent (set-union semantics), which
  * preserves the KMV mergeability property and the engine's
  * bit-reproducibility bar.
  */
class KmvUnion(k: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]]
    with Serializable {
  require(k >= 1, "k >= 1")

  override def zero: Array[Long] = Array.empty[Long]

  private def truncate(x: Array[Long]): Array[Long] =
    if (x.length <= k) x else java.util.Arrays.copyOf(x, k)

  /** Sorted-distinct merge of two ascending arrays, truncated to k. */
  private def mergeK(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return truncate(b)
    if (b.isEmpty) return truncate(a)
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length) { val x = a(i); i += 1; x }
        else if (i >= a.length) { val x = b(j); j += 1; x }
        else if (a(i) < b(j)) { val x = a(i); i += 1; x }
        else if (b(j) < a(i)) { val x = b(j); j += 1; x }
        else { val x = a(i); i += 1; j += 1; x } // equal: consume both once
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def reduce(buf: Array[Long], in: Seq[Long]): Array[Long] =
    if (in == null) buf else mergeK(buf, in.toArray)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = mergeK(a, b)

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
