package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi join for skewed keys (SURVEY.md §4 "skew handling").
  *
  * AQE's skew-join splitting handles most skew at runtime; salting is the
  * explicit fallback for pathological keys (one key = 30% of a 100 TB fact
  * table) or for non-AQE contexts (streaming joins). The skewed side gets a
  * deterministic salt in [0, salts); the other side is replicated `salts`
  * times; joining on (key, salt) spreads one hot key over `salts` tasks.
  *
  * Cost: replicates the small side `salts`x — use only when the small side
  * is modest and the skew is real. Results are exactly those of the plain
  * join (verified in PlanSpec).
  */
object SkewJoin {

  def saltedInnerJoin(
      skewed: DataFrame,
      other: DataFrame,
      joinKey: String,
      salts: Int = 8
  ): DataFrame = {
    require(salts > 0)
    // Deterministic salt derived from the whole skewed row is not needed —
    // any spread works; hashing the key alone would defeat the purpose
    // (one key → one salt), so hash a uniformly-varying expression.
    val salted = skewed.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val replicated = other.withColumn("_salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(joinKey, "_salt")).drop("_salt")
  }
}
