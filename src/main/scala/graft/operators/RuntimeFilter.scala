package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual runtime-filter join prep — the classic 100 TB trick Spark's
  * own `spark.sql.optimizer.runtime.bloomFilter.enabled` automates for
  * shuffle-join shapes it recognizes: build a Bloom filter over the
  * (already-filtered) DIM side's join keys and prune the FACT side with
  * a map-only probe BEFORE its shuffle, so rows that cannot match never
  * pay exchange/sort cost. This operator is the explicit form for the
  * shapes the optimizer won't inject into (multi-stage pipelines where
  * the dim side is computed far upstream, fact sides behind
  * mapPartitions barriers, reuse of one filter across several fact
  * scans) and makes the contract checkable: Bloom passes a SUPERSET of
  * the true matches (no false negatives — pruning can never lose a
  * row), so `prune → exact join` equals `exact join` by construction,
  * while false positives only cost shuffle bytes, bounded by `fpp`.
  *
  * Sizing follows the c07 exact-sizing rule (an undersized bloom
  * degrades SILENTLY toward false positives): one distinct-count pass
  * over the dim side — small by assumption, that's why it's the build
  * side — then [[Corpus.sizedBloomFilter]] raises the numBits clamp and
  * asserts the built size. The filter ships as one broadcast literal
  * (`numBits/8` bytes regardless of key count) probed through Spark's
  * own `BloomFilterMightContain` runtime-filter expression — map-only,
  * codegen'd, no join in the pruning stage at all.
  */
object RuntimeFilter {

  /** Prune `fact` to rows whose `factKey` MIGHT appear among `dim`'s
    * `dimKey` values. Keys must be integral (long-compatible) — the
    * probe hashes longs, matching the build. Returns a superset of the
    * exact semi-join, tight to within `fpp` false positives.
    */
  def bloomSemiPrune(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String, fpp: Double = 1e-3): DataFrame = {
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val integral = Set("ByteType", "ShortType", "IntegerType", "LongType")
    require(integral(fact.schema(factKey).dataType.toString) &&
      integral(dim.schema(dimKey).dataType.toString),
      s"bloomSemiPrune needs integral keys; got " +
        s"${fact.schema(factKey).dataType}/${dim.schema(dimKey).dataType}")
    graft.plans.GraftExtensions.register(fact.sparkSession)
    val keys = dim.select(col(dimKey).cast("long").as("k")).na.drop().distinct()
    val nKeys = keys.count() // the documented sizing pass over the SMALL side
    if (nKeys == 0L) return fact.limit(0) // empty dim: nothing can match
    val bos = new java.io.ByteArrayOutputStream()
    Corpus.sizedBloomFilter(keys, "k", nKeys, fpp).writeTo(bos)
    fact.filter(col(factKey).isNotNull &&
      call_function("bloom_might_contain",
        lit(bos.toByteArray), col(factKey).cast("long")))
  }
}
