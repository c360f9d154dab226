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

  /** Misra-Gries heavy-hitter CANDIDATES in bounded per-partition memory
    * (batched-decrement variant): each partition keeps at most `2*k`
    * counters; on overflow the (k+1)-th largest count δ is subtracted
    * from every counter and non-positive entries drop. Each prune
    * discards ≥ k·δ mass, so the total decrement Σδ ≤ N_p/k and any
    * token with partition count > N_p/k survives its partition; summing
    * over partitions, any token with GLOBAL count > N/k survives
    * somewhere. The union of survivors is therefore a guaranteed
    * superset of every token with frequency above N/k — the candidate
    * set for an exact recount whose shuffle is candidate-bounded, never
    * vocabulary-bounded. The X5 mapPartitions escape is justified: the
    * summary is imperative bounded state no relational rewrite expresses.
    */
  def mgCandidates(docs: DataFrame, textCol: String,
      k: Int = 4096): DataFrame = {
    import org.apache.spark.sql.Encoders
    val toks = docs
      .select(explode(tokens(normalizeText(col(textCol)))).as("tok"))
      .select(col("tok")).as(Encoders.STRING)
    toks.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { tok =>
        m.update(tok, m.getOrElse(tok, 0L) + 1L)
        if (m.size > 2 * k) {
          // δ = (k+1)-th largest count; deterministic regardless of map order
          val delta = m.values.toArray.sorted(Ordering.Long.reverse).apply(k)
          m.filterInPlace((_, c) => c > delta)
          m.mapValuesInPlace((_, c) => c - delta)
        }
      }
      m.keysIterator
    }(Encoders.STRING).toDF("tok").distinct()
  }

  /** Exact top-k heavy hitters WITHOUT a full-vocabulary shuffle: MG
    * candidates (map-only bounded state) gate the token stream, then the
    * exact recount aggregates only candidate occurrences. Correct
    * whenever the k-th true frequency exceeds N/mgK (the MG survival
    * bound) — size `mgK` accordingly; with the default 4096 that means
    * any token above 0.024% of the stream.
    */
  def topKTokens(docs: DataFrame, textCol: String, topK: Int = 25,
      mgK: Int = 4096): DataFrame =
    docs
      .select(explode(tokens(normalizeText(col(textCol)))).as("tok"))
      .join(broadcast(mgCandidates(docs, textCol, mgK)), Seq("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(topK)
}
