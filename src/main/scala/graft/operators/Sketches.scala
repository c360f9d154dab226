package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{normalizeText, tokens}

/** Count-Min sketch over a token stream (Cormode & Muthukrishnan, J.Alg
  * 2005) as a plain aggregated frame: `d` hash rows x `w` buckets, each
  * cell the count of tokens hashing there. The sketch answers point
  * frequency queries with one-sided error: `est >= true` always, and
  * `est <= true + (e/w)*N` with probability `1 - e^-d` per query.
  *
  * Why this matters at 100 TB: an exact token histogram shuffles one row
  * per DISTINCT token — billions of groups on a web corpus — while the
  * sketch's map-side combine reduces every partition to at most `d*w`
  * cells, so the shuffle is CONSTANT-bounded regardless of vocabulary.
  * Sketches also merge by cellwise addition ([[mergeCountMin]]), the
  * same persisted-store algebra as the LM token-count store, except here
  * the state is fixed-size.
  *
  * Hashing is Spark's own `xxhash64(row_index, token)` — engine-native,
  * codegen'd, and seeded per row by the extra column, so the sketch is
  * bit-reproducible across runs and partitionings.
  */
object Sketches {

  /** Builds the sketch: one explode(d) pass over the token stream, one
    * (row, bucket) aggregate with map-side combine. Result has at most
    * `d*w` rows.
    */
  def countMinSketch(docs: DataFrame, textCol: String,
      w: Int = 8192, d: Int = 4): DataFrame =
    docs
      .select(explode(tokens(normalizeText(col(textCol)))).as("tok"))
      .select(col("tok"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col("r"), pmod(xxhash64(col("r"), col("tok")), lit(w.toLong)).as("bucket"))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))

  /** Cellwise sum of two sketches built with identical (w, d). */
  def mergeCountMin(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("r", "bucket").agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for `items` (a frame with a `tok` column): the min
    * over the `d` rows of the cells each item hashes to. An absent cell
    * is 0 (the item never occurred). Join is sketch-sized — broadcastable
    * by construction.
    */
  def cmsEstimate(sketch: DataFrame, items: DataFrame,
      w: Int = 8192, d: Int = 4): DataFrame =
    items
      .select(col("tok"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col("tok"), col("r"),
        pmod(xxhash64(col("r"), col("tok")), lit(w.toLong)).as("bucket"))
      .join(sketch, Seq("r", "bucket"), "left")
      .groupBy("tok")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
