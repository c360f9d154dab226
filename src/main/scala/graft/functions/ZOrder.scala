package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve for multi-dimensional data layout.
  *
  * At 100 TB, files sorted/partitioned by a single column prune range
  * queries on that column only; interleaving the bits of two clustering
  * keys gives ONE sort order under which a range predicate on EITHER
  * dimension (or both) touches a small subset of files — the standard
  * lakehouse multi-dimension clustering trick (public technique: Morton
  * 1966; the idea behind Delta/Iceberg `ZORDER BY` sort orders).
  *
  * `zorder2` is a pure codegen'd Column expression (shifts, masks, ORs —
  * no UDF), so a layout job is just
  * `df.repartitionByRange(N, zCol).sortWithinPartitions(zCol).write...`:
  * per-file min/max stats then bound BOTH dimensions and scan pruning
  * applies to either predicate.
  *
  * The prefix property that makes pruning work: for a, b < 2^31,
  * `z >> 2k` is exactly the interleave of `a >> k` and `b >> k` — a
  * range on either dimension pins its high bits, which pins a small set
  * of z-prefixes ([[zbucketCandidates]] enumerates them driver-side).
  */
object ZOrder {

  private val DimBits = 31 // 31 bits per dim -> 62-bit z, sign bit never set

  /** Interleave the low 31 bits of two non-negative longs: bit i of `a`
    * lands at even position 2i, bit i of `b` at odd position 2i+1. A
    * total order over (a, b) pairs; always non-negative. Keys outside
    * [0, 2^31) are masked — bucket/rank real-valued or full-range keys
    * first (the usual layout practice: z-order coarse buckets, not raw
    * values).
    */
  def zorder2(a: Column, b: Column): Column = {
    val mask = lit((1L << DimBits) - 1)
    def spread(c: Column): Column =
      (0 until DimBits).map { i =>
        shiftleft(shiftright(c.bitwiseAND(mask), i).bitwiseAND(lit(1L)), 2 * i)
      }.reduce((x, y) => x.bitwiseOR(y))
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Coarse z-bucket for partition-level layout: the top `2*bitsPerDim`
    * bits of the 62-bit z-value (i.e. the interleave of each dimension's
    * top `bitsPerDim` bits).
    */
  def zbucket(z: Column, bitsPerDim: Int = 2): Column =
    shiftrightunsigned(z, 2 * (DimBits - bitsPerDim))

  /** Driver-side planning twin of [[zbucket]]: the buckets a rectangle
    * query can touch. A range on one dimension pins that dimension's top
    * bits; the other dimension's bits range freely — the result is the
    * (small) candidate set to put in an `isin`/partition filter. Size is
    * at most 4^bitsPerDim and usually far less; this is aggregated
    * planning state, never data.
    */
  def zbucketCandidates(aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      bitsPerDim: Int = 2): Seq[Long] = {
    require(bitsPerDim >= 1 && bitsPerDim <= 15, "1 <= bitsPerDim <= 15")
    val shift = DimBits - bitsPerDim
    def interleaveTop(ha: Long, hb: Long): Long =
      (0 until bitsPerDim).map { i =>
        (((ha >> i) & 1L) << (2 * i)) | (((hb >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    for {
      ha <- (aLo >> shift) to (aHi >> shift)
      hb <- (bLo >> shift) to (bHi >> shift)
    } yield interleaveTop(ha, hb)
  }
}
