package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY.md §2.11 L3).
  *
  * Two paths:
  *  - `bruteForceTopK`: exact — broadcast the (small) query set against the
  *    corpus; cosine is a codegen'd zip_with + aggregate over the arrays;
  *    per-query top-k via window. Cost O(|Q| * |corpus|) but embarrassingly
  *    parallel: the corpus scan is map-only after the broadcast, so it
  *    scales to any corpus size as long as |Q| stays broadcastable.
  *  - `lshTopK`: approximate scale path — random-hyperplane signs bucket
  *    both sides; only same-bucket (multi-probe: plus adjacent buckets)
  *    pairs are scored. Turns the cross product into an equi join on the
  *    bucket key. Recall is tunable via `planes` (fewer planes = bigger
  *    buckets = higher recall, more compute).
  */
object SimilaritySearch {

  /** Cosine similarity between two float-array columns, computed in double
    * precision in index order (deterministic, engine-comparable).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    when(na > 0 && nb > 0, dot / (na * nb)).otherwise(lit(0.0))
  }

  /** Exact top-k neighbors per query vector.
    * @return (query_id, neighbor_id, sim) — k rows per query, ordered
    *         deterministically (sim desc, neighbor_id asc).
    */
  /** Exact top-k neighbors per query vector.
    *
    * @param rankPrecision when set, ranking happens on `round(sim, n)` with
    *        neighbor_id as tiebreak — quantizing the ordering key makes the
    *        top-k selection reproducible across engines whose float cosine
    *        differs in the last ulps (the oracle-comparability mode).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, rankPrecision: Option[Int] = None): DataFrame = {
    // |Q| x |corpus| x dim inner loop → use the native codegen'd expression
    // (graft.functions.CosineSimilarity); `cosine` below is its public-API
    // twin with identical double-precision semantics.
    graft.plans.GraftExtensions.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        graft.plans.GraftExtensions.cosineSim(col("q_vec"), col("c_vec")))
    val rankKey = rankPrecision.map(p => round(col("sim"), p)).getOrElse(col("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(rankKey.desc, col("neighbor_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rn"))
  }

  /** Random-hyperplane LSH bucket signature: sign bit per plane, packed to
    * a long. Planes are a fixed deterministic pseudo-random matrix expanded
    * from a seed — identical across executors, no fit step.
    */
  def hyperplaneBucket(vec: Column, dim: Int, planes: Int, seed: Long = 42L): Column = {
    require(planes <= 62, "bucket packs into a long")
    val rnd = new scala.util.Random(seed)
    val planeVecs = Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
    // native codegen'd dot against the plane literal — the interpreted
    // zip_with+aggregate version cost ~3x on the bucketing scans
    val bits = planeVecs.zipWithIndex.map { case (p, i) =>
      when(graft.plans.GraftExtensions.vectorDot(vec, lit(p)) >= 0, lit(1L << i))
        .otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k via multi-table LSH with single-bit multi-probe.
    *
    * `tables` independent hyperplane sets (recall 1-(1-p)^L compounding);
    * the query side additionally probes every single-bit-flipped bucket in
    * each table. Candidates meet on the (table, bucket) equi-join key — the
    * scale path: corpus work is `tables` map-only signatures + one shuffle,
    * never a cross product. Tune: more `tables`/fewer `planes` → higher
    * recall, more candidates scored.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, planes: Int = 8, tables: Int = 4,
      probes: Int = 8): DataFrame = {
    graft.plans.GraftExtensions.register(queries.sparkSession)
    val nProbes = math.min(probes, planes)
    // two-level explode: the per-table base bucket (an 8-dot-product
    // expression) becomes a Generate OUTPUT before the probe fan-out
    // references it — Generate outputs are attributes, so the probe
    // explode flips bits on a computed value instead of re-evaluating the
    // dot products once per probe (9x the query-side signature work at
    // scale; b0 XOR 0 is the no-flip probe)
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("tb0", explode(array((0 until tables).map { t =>
        struct(lit(t).as("tbl"),
          hyperplaneBucket(col("q_vec"), dim, planes, seed = 42L + t).as("b0"))
      }: _*)))
      .select(col("query_id"), col("q_vec"),
        col("tb0.tbl").as("tbl"), col("tb0.b0").as("b0"))
    val q = q0
      .withColumn("bucket", explode(array(
        (lit(0L) +: (0 until nProbes).map(i => lit(1L << i)))
          .map(m => col("b0").bitwiseXOR(m)): _*)))
      .select(col("query_id"), col("q_vec"), col("tbl"), col("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("tb", explode(array((0 until tables).map { t =>
        struct(lit(t).as("tbl"),
          hyperplaneBucket(col("c_vec"), dim, planes, seed = 42L + t).as("bucket"))
      }: _*)))
      .select(col("neighbor_id"), col("c_vec"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val scored = c.join(q, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim",
        graft.plans.GraftExtensions.cosineSim(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rn"))
  }

  // -- IVF (inverted-file) index: the second ANN scale path ------------------

  /** Spherical k-means centroids trained with DataFrame ops: assignment is
    * map-only (native cosine against broadcast centroid literals); the
    * update step is the partial-aggregating VectorCentroid. Only the
    * centroids themselves (nlist x dim doubles) ever reach the driver —
    * aggregated state, not data, so this trains on a 100 TB corpus.
    * Deterministic init: the first `nlist` vectors in id order.
    */
  def trainCentroids(vectors: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 3): Array[Array[Float]] = {
    graft.plans.GraftExtensions.register(vectors.sparkSession)
    // the loop runs iters+1 actions (init + one per assignment round) over
    // the same projected frame — persist it once so training costs ONE
    // corpus scan, not iters+1 full scans (at 100 TB the difference is the
    // whole job). Only (id, vec) is cached, never unprojected rows.
    val train = vectors.select(col(idCol).as("_id"), col(vecCol).as("_vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids: Array[Array[Float]] = train
        .orderBy(col("_id")).limit(nlist)
        .select(col("_vec")).collect()
        .map(_.getSeq[Float](0).toArray)
      val centroidUdaf = udaf(graft.functions.VectorCentroid)
      for (_ <- 0 until iters) {
        val updated = assignBucket(train, "_vec", centroids)
          .groupBy(col("_bucket"))
          .agg(centroidUdaf(col("_vec")).as("c"))
          .collect()
          .map(r => r.getInt(0) -> r.getSeq[Double](1).map(_.toFloat).toArray)
          .toMap
        centroids = centroids.indices.map(i => updated.getOrElse(i, centroids(i))).toArray
      }
      centroids
    } finally train.unpersist()
  }

  /** Adds `_bucket` = argmax-cosine centroid index (map-only). */
  def assignBucket(df: DataFrame, vecCol: String,
      centroids: Array[Array[Float]]): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val scores = array(centroids.map(c =>
      graft.plans.GraftExtensions.cosineSim(col(vecCol), lit(c))): _*)
    df.withColumn("_scores", scores)
      .withColumn("_bucket",
        (array_position(col("_scores"), array_max(col("_scores"))) - 1).cast("int"))
  }

  /** Approximate top-k via IVF: corpus vectors live in their nearest
    * centroid's list; each query probes its `nprobe` best centroids. The
    * candidate meeting is an equi join on the bucket id — same scale shape
    * as lshTopK, but with data-adaptive partitions (trained centroids beat
    * random hyperplanes when the corpus is clustered).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      centroidsOpt: Option[Array[Array[Float]]] = None): DataFrame = {
    val centroids = centroidsOpt.getOrElse(
      trainCentroids(corpus, idCol, vecCol, nlist))
    // a small corpus (or short supplied set) yields fewer than nlist
    // centroids; probe indices must stay inside the actual score array
    val nCentroids = centroids.length
    val c = assignBucket(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")),
      "c_vec", centroids)
      .select(col("neighbor_id"), col("c_vec"), col("_bucket").as("bucket"))
    // each query emits its nprobe best buckets: bucket b is probed when
    // fewer than nprobe buckets score strictly higher
    val q = assignBucket(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      "q_vec", centroids)
      .withColumn("bucket", explode(filter(
        sequence(lit(0), lit(nCentroids - 1)),
        b => size(filter(col("_scores"),
          s => s > element_at(col("_scores"), (b + 1).cast("int")))) < math.min(nprobe, nCentroids))))
      .select(col("query_id"), col("q_vec"), col("bucket").cast("int").as("bucket"))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim",
        graft.plans.GraftExtensions.cosineSim(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
  }

  // -- int8 scalar quantization: the ANN memory/bandwidth scale path --------

  /** Symmetric per-vector int8 scalar quantization.
    *
    * `scale` = max(|v|)/127 (floored at 1e-30 so the all-zero vector maps to
    * all-zero codes instead of NaN); each component maps to
    * floor(v/scale + 0.5) ∈ [-127, 127]. floor(x+0.5) rather than
    * rint/round because floor is the rounding primitive with identical
    * semantics in every engine — together with the fact that integer dot
    * products up to 127²·dim are exactly representable in doubles, the
    * whole quantized scoring pipeline is bit-reproducible cross-engine
    * (the property the s07 DuckDB oracle checks end-to-end).
    *
    * Why it matters at 100 TB: the corpus-side vector payload drops 4x
    * (1 byte/component instead of 4), which shrinks the scan, the shuffle,
    * and the executor cache working set by the same factor, and the inner
    * scoring loop becomes integer multiply-adds. The int8 column is also
    * the natural thing to persist next to the float column so rescoring
    * candidates at full precision stays possible.
    */
  def int8Quantize(df: DataFrame, vecCol: String, qCol: String = "qvec",
      scaleCol: String = "qscale"): DataFrame = {
    val scale = greatest(
      array_max(transform(col(vecCol), x => abs(x.cast("double")))),
      lit(1e-30)) / 127d
    df.withColumn(scaleCol, scale)
      .withColumn(qCol, transform(col(vecCol),
        x => floor(x.cast("double") / col(scaleCol) + 0.5).cast("int")))
  }

  /** Exact integer dot product of two int8-code arrays, as a double.
    * Every intermediate (|x·y| ≤ 127² per term, ≤ 127²·dim summed) is an
    * integer exactly representable in both long and double, so the result
    * is order-independent and engine-exact.
    */
  def int8Dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x * y).cast("long")),
      lit(0L), (acc, v) => acc + v).cast("double")

  /** Exact top-k per query in the QUANTIZED domain: both sides pass through
    * [[int8Quantize]], scoring is integer dot / integer norms. Same shape
    * as [[bruteForceTopK]] (broadcast query side, map-only corpus scan,
    * per-query window top-k) but the corpus-side arithmetic is the int8
    * scale path. Quantized cosine differs from float cosine by O(1/127)
    * per component pair — rank agreement vs the float top-k is
    * property-tested in LlmOpsSpec; the arithmetic itself is oracled
    * end-to-end (s07).
    */
  def int8TopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, rankPrecision: Option[Int] = None): DataFrame = {
    def codes(df: DataFrame, asId: String) =
      int8Quantize(df.select(col(idCol).as(asId), col(vecCol).as("_v")), "_v")
        .select(col(asId), col("qvec"),
          sqrt(int8Dot(col("qvec"), col("qvec"))).as("qn"))
    val q = codes(queries, "query_id")
      .select(col("query_id"), col("qvec").as("q_q"), col("qn").as("qn_q"))
    val c = codes(corpus, "neighbor_id")
      .select(col("neighbor_id"), col("qvec").as("q_c"), col("qn").as("qn_c"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("qsim", when(col("qn_q") > 0 && col("qn_c") > 0,
        int8Dot(col("q_q"), col("q_c")) / (col("qn_q") * col("qn_c")))
        .otherwise(lit(0.0)))
    val rankKey = rankPrecision.map(p => round(col("qsim"), p)).getOrElse(col("qsim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(rankKey.desc, col("neighbor_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("qsim"), col("rn"))
  }

  /** [[int8TopK]]'s storage-format twin: vectors pass through the NATIVE
    * `int8_pack` expression into a self-contained binary blob
    * ([8-byte scale header][dim code bytes] — dim+8 bytes vs 4·dim for the
    * float array, 3.6x smaller at dim 64), and scoring is the native
    * codegen'd `int8_cosine` (one fused integer loop over the code bytes,
    * no per-element HOF lambda dispatch). Identical arithmetic to the
    * array<int> path at every step (same floor rounding, same
    * sqrt(na2)·sqrt(nb2) evaluation order), so results are bit-equal to
    * the s07 DuckDB-oracled pipeline — spec-pinned in LlmOpsSpec. This is
    * the form a 100 TB corpus would PERSIST: pack once at ingest, scan and
    * shuffle 1 byte/component forever after, rescore survivors at full
    * float precision only on the candidate set.
    *
    * Contract: `int8_cosine` FAILS LOUD on mismatched or truncated blobs
    * (one corrupted row kills the job after task retries) — the inverse of
    * Multimodal's quarantine contract, and the right default here because
    * blobs are produced in-pipeline by `int8_pack` from one homogeneous
    * embedding column, never ingested from outside; silent prefix-scoring
    * of mixed-dimension data would corrupt rankings invisibly.
    */
  def int8TopKPacked(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, rankPrecision: Option[Int] = None): DataFrame = {
    graft.plans.GraftExtensions.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"),
      graft.plans.GraftExtensions.int8Pack(col(vecCol)).as("q_blob"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      graft.plans.GraftExtensions.int8Pack(col(vecCol)).as("c_blob"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("qsim",
        graft.plans.GraftExtensions.int8Cosine(col("q_blob"), col("c_blob")))
    val rankKey = rankPrecision.map(p => round(col("qsim"), p)).getOrElse(col("qsim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(rankKey.desc, col("neighbor_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("qsim"), col("rn"))
  }

  /** Embedding-cosine near-dup pairs (L2's vector variant): exact over a
    * blocked candidate set. The blocking key is either a caller-supplied
    * column (`blockCol` — e.g. a cluster/label/shard id; recall within a
    * block is exact and the result is engine-reproducible, the
    * oracle-comparable mode) or, by default, the deterministic LSH
    * hyperplane bucket (the self-tuning scale path; approximate recall,
    * tunable via `planes`). Either way the pair meeting is an equi join on
    * the block key — never a cross join.
    *
    * Scale note: in-block work is QUADRATIC in block size (exact
    * verification of every in-block pair — measured 18x time for 10x rows
    * at fixed blockCol cardinality). A caller-supplied blockCol must have
    * cardinality that grows with the corpus (shard/cluster ids, not a
    * 10-value label); the LSH mode self-scales because bucket count is
    * 2^planes and `planes` can grow with the corpus.
    *
    * `tables` (LSH mode only): independent hyperplane sets OR-combined —
    * a pair is a candidate when it collides in ANY table, so recall
    * compounds as 1-(1-p^planes)^tables while per-table bucket granularity
    * (2^planes) is preserved. The standard AND-OR LSH construction
    * (Indyk–Motwani; same shape as [[lshTopK]]); corpus cost is `tables`
    * map-only signature passes and the candidate meeting stays an equi
    * join on (table, bucket). Cross-table duplicate candidates are
    * deduped BEFORE cosine verification, so each surviving pair is scored
    * once.
    */
  def cosineNearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
      dim: Int, minCosine: Double, planes: Int = 8,
      blockCol: Option[String] = None, tables: Int = 1): DataFrame = {
    graft.plans.GraftExtensions.register(vectors.sparkSession)
    val (v, joinKeys) = blockCol match {
      case Some(bc) => (vectors.select(col(idCol).as("id"), col(vecCol).as("vec"),
        col(bc).as("bucket")), Seq("bucket"))
      case None =>
        val keyed = vectors.select(col(idCol).as("id"), col(vecCol).as("vec"))
          .withColumn("tb", explode(array((0 until tables).map { t =>
            struct(lit(t).as("tbl"),
              hyperplaneBucket(col("vec"), dim, planes, seed = 42L + t).as("bucket"))
          }: _*)))
          .select(col("id"), col("vec"),
            col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
        (keyed, Seq("tbl", "bucket"))
    }
    val a = v.select(joinKeys.map(col) ++ Seq(col("id").as("id_a"), col("vec").as("v_a")): _*)
    val b = v.select(joinKeys.map(col) ++ Seq(col("id").as("id_b"), col("vec").as("v_b")): _*)
    val cand = a.join(b, joinKeys)
      .filter(col("id_a") < col("id_b"))
    // a pair colliding in several tables must be verified once, not `tables`
    // times; single-table/blockCol candidates are already unique
    val uniq = if (tables > 1 && blockCol.isEmpty)
      cand.dropDuplicates("id_a", "id_b") else cand
    uniq
      // native codegen'd cosine: the hot inner loop runs over every in-block
      // pair — the interpreted HOF twin (`cosine`) costs ~10x here
      .withColumn("cosine",
        graft.plans.GraftExtensions.cosineSim(col("v_a"), col("v_b")))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }

  /** Per-label mean vectors in FIXED-POINT arithmetic: each component is
    * snapped to an integer number of 1e-7 steps (floor(x·1e7 + 0.5) — floor
    * is the cross-engine rounding primitive, see [[int8Quantize]]), summed
    * as longs (exact, ORDER-INDEPENDENT — no float partial-merge drift, the
    * problem [[graft.functions.VectorCentroid]]'s doc describes), and
    * divided back once. The resulting centroid doubles are bit-identical on
    * any engine and any partitioning — what makes [[nearestCentroid]]
    * oracle-comparable end-to-end rather than property-gated.
    *
    * Scale shape: posexplode to (label, pos, component) then a two-level
    * aggregate — the shuffle carries labels × dim rows of aggregated longs
    * (map-side combined), never vectors.
    *
    * @return one row per label: (labelCol, n_vectors, centroid array<double>,
    *         cnorm)
    */
  def fixedPointCentroids(vectors: DataFrame, labelCol: String,
      vecCol: String, scale: Double = 1e7): DataFrame = {
    val comps = vectors
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "comp")))
      .withColumn("fixed",
        floor(col("comp").cast("double") * lit(scale) + lit(0.5)).cast("long"))
    comps
      .groupBy(col(labelCol), col("pos"))
      .agg(sum(col("fixed")).as("sf"), count(lit(1)).as("n"))
      .withColumn("m",
        col("sf").cast("double") / (col("n").cast("double") * lit(scale)))
      .groupBy(col(labelCol))
      .agg(
        max(col("n")).as("n_vectors"), // n identical across pos (fixed dim)
        transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("centroid"))
      .withColumn("cnorm",
        sqrt(aggregate(transform(col("centroid"), x => x * x),
          lit(0.0), (acc, x) => acc + x)))
  }

  /** Nearest-centroid assignment — the domain/topic tagging primitive of a
    * training pipeline: every vector gets the label of its most-cosine-
    * similar class centroid (centroids from [[fixedPointCentroids]], so the
    * whole pipeline is deterministic). Ties on the round-6 similarity key
    * break toward the smallest label.
    *
    * Scale shape: the centroid table (labels × dim — KBs) collapses to ONE
    * broadcast row carrying an array of (label, centroid, cnorm) structs;
    * assignment is then a pure map over the corpus — argmax via an
    * `aggregate` HOF over the broadcast array, ZERO shuffle on the vector
    * side. The only shuffle in the whole operator is the labels × dim
    * aggregate inside centroid training.
    */
  def nearestCentroid(vectors: DataFrame, idCol: String, vecCol: String,
      labelCol: String, simPrecision: Int = 6): DataFrame =
    assignToCentroids(vectors, idCol, vecCol,
      fixedPointCentroids(vectors, labelCol, vecCol)
        .withColumnRenamed(labelCol, "label"),
      simPrecision)

  /** Assignment against a FROZEN centroid table `(label, centroid, cnorm)`
    * — the piece [[nearestCentroid]] runs after training, exposed so an
    * index can be MAINTAINED: assign only a new batch against persisted
    * centroids without retraining or touching indexed history
    * ([[incrementalIndexManifest]]). Map-only over the vectors (one
    * broadcast row carries the centroid array).
    */
  def assignToCentroids(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, simPrecision: Int = 6): DataFrame = {
    val cents = centroids
      .agg(collect_list(struct(
        col("label"), col("centroid"), col("cnorm"))).as("_cents"))
    val vd = transform(col(vecCol), x => x.cast("double"))
    val scored = vectors
      .select(col(idCol), col(vecCol))
      .crossJoin(broadcast(cents)) // one row: the centroid array
      .withColumn("_vd", vd)
      .withColumn("_vn",
        sqrt(aggregate(transform(col("_vd"), x => x * x),
          lit(0.0), (acc, x) => acc + x)))
      .withColumn("_sims", transform(col("_cents"), c => struct(
        round(
          when(col("_vn") > 0 && c.getField("cnorm") > 0,
            aggregate(zip_with(col("_vd"), c.getField("centroid"), (x, y) => x * y),
              lit(0.0), (acc, v) => acc + v) / (col("_vn") * c.getField("cnorm")))
            .otherwise(lit(0.0)),
          simPrecision).as("sim"),
        c.getField("label").as("label"))))
    // fold to the argmax: strictly-better sim wins; equal sim → smaller label.
    // The -2.0 init loses to every real cosine (≥ -1), so the first element
    // always replaces it and the init label is never emitted.
    val best = aggregate(col("_sims"),
      struct(lit(-2.0).as("sim"), lit(Int.MaxValue).as("label")),
      (acc, x) => when(
        x.getField("sim") > acc.getField("sim") ||
          (x.getField("sim") === acc.getField("sim") &&
            x.getField("label") < acc.getField("label")), x).otherwise(acc))
    scored
      .withColumn("_best", best)
      .select(col(idCol),
        col("_best.label").as("label"),
        col("_best.sim").as("sim"))
  }

  /** Per-inverted-list manifest of an assignment frame — the vector-index
    * analogue of [[Corpus.shardManifest]]: one bounded row per list
    * (nlist rows total), the sidecar a reader plans probes from.
    *
    * @param isNew marks rows counted into `n_new` (a fresh batch vs the
    *              persisted store)
    */
  def indexManifest(assigned: DataFrame, idCol: String,
      isNew: Boolean): DataFrame =
    assigned
      .groupBy(col("label").as("list_label"))
      .agg(
        count(lit(1)).as("n_vectors"),
        (if (isNew) count(lit(1)) else lit(0L)).cast("long").as("n_new"),
        min(col(idCol)).as("min_vec_id"),
        max(col(idCol)).as("max_vec_id"))

  /** Exact merge of two manifests — counts add, id ranges widen. Merge of
    * the persisted manifest with a batch manifest IS the manifest of the
    * concatenated assignments (a strict equality, spec-pinned — the c08
    * OR-merge property). Both inputs are nlist-row frames, so the merge
    * cost is O(nlist), independent of index size.
    */
  def mergeIndexManifests(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("list_label"))
      .agg(
        sum(col("n_vectors")).as("n_vectors"),
        sum(col("n_new")).as("n_new"),
        min(col("min_vec_id")).as("min_vec_id"),
        max(col("max_vec_id")).as("max_vec_id"))

  /** Incremental vector-index maintenance — the d06/d09/c08 persisted-store
    * shape applied to ANN: centroids train ONCE on the base corpus and
    * FREEZE (the FAISS `add`-after-`train` contract). The steady-state
    * per-batch path is [[assignToCentroids]] on the batch (map-only
    * against the frozen centroid broadcast) + [[indexManifest]] on the
    * batch + [[mergeIndexManifests]] with the PERSISTED manifest — cost
    * O(batch) + O(nlist), with no retrain and no re-scan of indexed
    * history.
    *
    * This gate-facing composition replays the WHOLE lifecycle (train,
    * base-store build, batch append, merge) inside one query so the
    * DuckDB oracle can recompute it end to end — the same
    * registered-query-vs-production-probe split as c08/d09 (COVERAGE.md):
    * the base assignment here stands in for the store a deployment
    * persists once.
    *
    * The deterministic [[fixedPointCentroids]] make every assignment
    * exact-reproducible, so "append(base-index, delta) == full build over
    * base∪delta with the same frozen centroids" is a strict row-level
    * equality (spec-pinned) and the whole manifest is DuckDB-recomputable.
    *
    * @return one row per inverted list:
    *         (list_label, n_vectors, n_new, min_vec_id, max_vec_id)
    */
  def incrementalIndexManifest(base: DataFrame, delta: DataFrame,
      idCol: String, vecCol: String, labelCol: String): DataFrame = {
    val cents = fixedPointCentroids(base, labelCol, vecCol)
      .withColumnRenamed(labelCol, "label")
      .localCheckpoint(true) // labels x dim; read by both assignment passes
    val store = assignToCentroids(base, idCol, vecCol, cents) // persisted in prod
    val batch = assignToCentroids(delta, idCol, vecCol, cents) // per-batch cost
    mergeIndexManifests(
      indexManifest(store, idCol, isNew = false),
      indexManifest(batch, idCol, isNew = true))
  }

  // -- Product quantization: the ANN memory scale path beyond int8 ----------

  /** Product-quantization codebooks (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011): the vector is split into
    * `m` contiguous subspaces and each subspace gets `ksub` centroids
    * minimizing L2 error, so a dim-float vector compresses to `m` small
    * ints — 32x smaller than float32 at m=8 over dim=64.
    *
    * Training runs DRIVER-SIDE Lloyd iterations over a bounded
    * deterministic sample (the first `sampleSize` vectors in id order) —
    * the same bounded-driver-state pattern as BPE's capped histogram and
    * IVF's nlist-row collect: production PQ trainers (FAISS) fit codebooks
    * on a <=1M-vector sample regardless of corpus size, so the collect is
    * capped by a parameter, never by data volume, and everything
    * corpus-sized (encode, ADC scan) stays distributed and map-only.
    * Determinism: id-ordered init, fixed iterations, first-index tie
    * breaks; empty clusters keep their previous centroid.
    *
    * Returns codebooks(m)(j) = the j-th centroid of subspace m.
    */
  def trainPqCodebooks(vectors: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int = 10,
      sampleSize: Int = 4096): Array[Array[Array[Float]]] = {
    val sample = vectors.orderBy(col(idCol)).limit(sampleSize)
      .select(col(vecCol)).collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "PQ training needs a non-empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m
    (0 until m).toArray.map { s =>
      val slices = sample.map(v => v.slice(s * subDim, (s + 1) * subDim))
      var centroids = slices.take(ksub).map(_.clone)
      for (_ <- 0 until iters) {
        val sums = Array.fill(centroids.length, subDim)(0.0)
        val counts = Array.fill(centroids.length)(0L)
        slices.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          for (j <- centroids.indices) {
            var d = 0.0
            var i = 0
            while (i < subDim) {
              val diff = v(i).toDouble - centroids(j)(i); d += diff * diff; i += 1
            }
            if (d < bestD) { bestD = d; best = j }
          }
          counts(best) += 1
          var i = 0
          while (i < subDim) { sums(best)(i) += v(i); i += 1 }
        }
        centroids = centroids.indices.toArray.map { j =>
          if (counts(j) == 0) centroids(j)
          else Array.tabulate(subDim)(i => (sums(j)(i) / counts(j)).toFloat)
        }
      }
      centroids
    }
  }

  /** Adds `_codes` (array<int>, length m): per subspace, the index of the
    * L2-nearest codebook centroid. Map-only — the argmin is
    * `-2*dot(v_m,c) + |c|^2` (the `|v_m|^2` term is constant per row) over
    * the native codegen'd dot against centroid literals; first-index wins
    * ties via array_position.
    */
  def pqEncode(df: DataFrame, vecCol: String,
      codebooks: Array[Array[Array[Float]]]): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    // r16: native kernel. The previous formulation composed m·ksub
    // vector_dot-over-literal columns (1,024 at the registered grid) into
    // one projection whose generated class Janino could not compile —
    // every encode paid a failed-compile attempt and ran interpreted.
    // pq_encode is the same arithmetic (bit-equal, pinned in
    // NativeExprSpec) in one tight codegen'd loop.
    df.withColumn("_codes",
      graft.plans.GraftExtensions.pqEncode(col(vecCol), codebooks))
  }

  /** Approximate top-k via PQ asymmetric-distance computation with exact
    * re-rank — the memory-bound 100 TB shape: the corpus-sized scan reads
    * ONLY the m-int code column (32x fewer bytes than the float vectors);
    * each query precomputes its m x ksub table of subspace dots ONCE, so
    * per-candidate scoring is m array lookups + adds (codegen'd, no
    * per-row dot). The `shortlist` best ADC candidates per query are then
    * exactly re-scored against their float vectors via a broadcast semi
    * join (|Q| x shortlist rows — driver-bounded, never corpus-sized).
    *
    * approx cosine = adc_dot / (|q| * sqrt(sum_m |c_{m,code_m}|^2)) — the
    * standard symmetric-norm PQ estimate; re-rank replaces it with the
    * exact value, so estimate error only costs recall, never precision.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 8, ksub: Int = 16,
      shortlist: Int = 0,
      codebooksOpt: Option[Array[Array[Array[Float]]]] = None): DataFrame = {
    val codebooks = codebooksOpt.getOrElse(
      trainPqCodebooks(corpus, idCol, vecCol, m, ksub))
    // the PQ index in its transient form; buildPqIndex persists the same
    // frame and pqServeTopK probes it
    val codes = pqEncode(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")),
      "c_vec", codebooks)
      .select(col("neighbor_id"), col("_codes"))
    pqServeTopK(queries, codes, corpus, idCol, vecCol, codebooks, k, shortlist)
  }

  /** Builds the PQ index ONCE and persists its serving form — one parquet
    * of (neighbor_id, _codes), m small ints per vector — returning the
    * codebooks a server needs alongside it. The production split of
    * [[pqTopK]]: encode is paid at ingest, every query afterwards runs
    * [[pqServeTopK]] against the persisted codes and touches the float
    * vectors only for its own shortlist re-rank. (Codebooks are
    * driver-sized — m·ksub·subDim floats — and travel with the index as
    * parameters, the FAISS file-layout convention.)
    */
  def buildPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
      path: String, m: Int = 8, ksub: Int = 16): Array[Array[Array[Float]]] = {
    val codebooks = trainPqCodebooks(corpus, idCol, vecCol, m, ksub)
    pqEncode(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")),
      "c_vec", codebooks)
      .select(col("neighbor_id"), col("_codes"))
      .write.mode("overwrite").parquet(path)
    codebooks
  }

  /** The probe-only serving path: ADC scan over an EXISTING codes frame
    * (usually `spark.read.parquet` of [[buildPqIndex]]'s output — the
    * corpus-sized scan then reads m ints per row off disk, never the
    * float vectors), shortlist, then exact re-rank against `corpus`,
    * which is touched only for the |Q|·shortlist re-ranked rows.
    * Bit-equal to [[pqTopK]] under the same codebooks (spec-pinned).
    */
  def pqServeTopK(queries: DataFrame, codes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Float]]], k: Int,
      shortlist: Int = 0): DataFrame = {
    graft.plans.GraftExtensions.register(queries.sparkSession)
    val sl = if (shortlist > 0) shortlist else defaultShortlist(codes)
    val q = pqQueries(queries, idCol, vecCol, codebooks)
    val cand = codes.crossJoin(broadcast(q))
    pqShortlistRerank(cand, corpus, idCol, vecCol, codebooks, k, sl)
  }

  /** SCALE.md §16's deployment rule IN CODE, not prose: the PQ/IVF-PQ
    * shortlist is a corpus FRACTION (~0.25%), floored at 100 — identical
    * in kind to IVF's nprobe and HNSW's efSearch scaling. A constant
    * shortlist measured 5/5 recall at every fixture scale and then
    * collapsed to 1–4/5 at the 100x probe (SCALE.md §16's measured
    * table); fraction scaling is what keeps the gate green with no
    * per-scale hand-tuning. The count is one metadata-cheap job per
    * index build (against parquet it reads footers, not rows) — callers
    * building many indexes over one corpus should pass `shortlist`
    * explicitly.
    */
  def defaultShortlist(corpus: DataFrame): Int =
    math.max(100, math.ceil(corpus.count() * 0.0025).toInt)

  /** The matching nprobe rule: probe a fixed FRACTION of the inverted
    * lists (3/8, the measured-recall registered ratio 6-of-16), floored
    * at 4 — as nlist grows with the corpus (FAISS sizes nlist ~ √N),
    * probing a constant number of lists would shrink the searched
    * fraction toward zero.
    */
  def defaultNprobe(nlist: Int): Int =
    math.max(4, math.ceil(nlist * 3.0 / 8.0).toInt)

  /** Per-query PQ scoring state: `_tbl` — the m x ksub ADC table of
    * subspace dots dot(q_s, c_{s,j}) — and `_qnorm`. Computed ONCE per
    * query; candidate scoring is then pure table lookups.
    */
  private def pqQueries(queries: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Float]]],
      keep: Seq[String] = Nil): DataFrame = {
    // r16: native kernel — same dots, one expression (see pqEncode's note)
    queries
      .select(col(idCol).as("query_id") +: col(vecCol).as("q_vec") +:
        keep.map(col): _*)
      .withColumn("_tbl",
        graft.plans.GraftExtensions.pqAdcTable(col("q_vec"), codebooks))
      .withColumn("_qnorm",
        sqrt(graft.plans.GraftExtensions.vectorDot(col("q_vec"), col("q_vec"))))
  }

  /** ADC-score candidate rows (must carry query_id/q_vec/_tbl/_qnorm/
    * neighbor_id/_codes), keep the `shortlist` best per query, then
    * exactly re-rank that driver-bounded set against the float vectors
    * via a broadcast join.
    *
    * approx cosine = adc_dot / (|q| * sqrt(sum_m |c_{m,code_m}|^2)) — the
    * standard symmetric-norm PQ estimate; re-rank replaces it with the
    * exact value, so estimate error only costs recall, never precision.
    */
  private def pqShortlistRerank(cand: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, codebooks: Array[Array[Array[Float]]],
      k: Int, shortlist: Int): DataFrame = {
    val m = codebooks.length
    val ksub = codebooks(0).length
    // flat |c|^2 literal, indexed [s*ksub + code]
    val normsq = lit(codebooks.flatMap(_.map(_.map(x => x.toDouble * x).sum)))
    val adcDot = (0 until m)
      .map(s => element_at(col("_tbl"),
        lit(s * ksub + 1) + element_at(col("_codes"), s + 1)))
      .reduce(_ + _)
    val adcNormsq = (0 until m)
      .map(s => element_at(normsq,
        lit(s * ksub + 1) + element_at(col("_codes"), s + 1)))
      .reduce(_ + _)
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("_approx_r").desc, col("neighbor_id").asc)
    val short = cand
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("_approx",
        adcDot / (col("_qnorm") * sqrt(greatest(adcNormsq, lit(1e-30)))))
      .withColumn("_approx_r", round(col("_approx"), 6))
      .withColumn("_srn", row_number().over(wApprox))
      .filter(col("_srn") <= shortlist)
      .select(col("query_id"), col("q_vec"), col("neighbor_id"))
    // exact re-rank of the driver-bounded shortlist
    val reranked = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .join(broadcast(short), Seq("neighbor_id"))
      .withColumn("sim",
        graft.plans.GraftExtensions.cosineSim(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("sim"), 6).desc, col("neighbor_id").asc)
    reranked
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rn"))
  }

  /** IVF-PQ: the two scale levers composed, FAISS's default billion-scale
    * index layout (Jégou TPAMI 2011 §V; Johnson et al., "Billion-scale
    * similarity search with GPUs", 2017). IVF coarse routing bounds WHICH
    * candidates are touched (each query probes `nprobe` of `nlist`
    * inverted lists instead of the whole corpus); PQ ADC bounds the COST
    * and BYTES per candidate (m small ints instead of the float vector).
    * The persisted index at scale is (bucket, codes) per vector — with
    * the bucket as a partition key, a probe reads only nprobe/nlist of
    * the index files, and each read row is m bytes, not 4·dim.
    *
    * Candidate meeting is an equi join on the bucket id (never a cross
    * product); the `shortlist` ADC-best per query re-rank exactly, so PQ
    * estimate error costs recall only. Same deterministic training as the
    * parts: id-ordered init for both quantizers.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 0,
      m: Int = 16, ksub: Int = 16, shortlist: Int = 0,
      centroidsOpt: Option[Array[Array[Float]]] = None,
      codebooksOpt: Option[Array[Array[Array[Float]]]] = None): DataFrame = {
    graft.plans.GraftExtensions.register(queries.sparkSession)
    // 0 = derive from scale (the SCALE.md §16 rule); explicit values win
    val sl = if (shortlist > 0) shortlist else defaultShortlist(corpus)
    val np = if (nprobe > 0) nprobe else defaultNprobe(nlist)
    val centroids = centroidsOpt.getOrElse(
      trainCentroids(corpus, idCol, vecCol, nlist))
    val codebooks = codebooksOpt.getOrElse(
      trainPqCodebooks(corpus, idCol, vecCol, m, ksub))
    val nCentroids = centroids.length
    // the IVF-PQ index: (neighbor_id, bucket, codes) — the persisted form
    val codes = pqEncode(
      assignBucket(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")),
        "c_vec", centroids),
      "c_vec", codebooks)
      .select(col("neighbor_id"), col("_bucket").as("bucket"), col("_codes"))
    // each query probes its nprobe best coarse buckets (ivfTopK's rule)
    val probed = assignBucket(
      queries.select(col(idCol).as("_qid"), col(vecCol).as("_qv")),
      "_qv", centroids)
      .withColumn("bucket", explode(filter(
        sequence(lit(0), lit(nCentroids - 1)),
        b => size(filter(col("_scores"),
          s => s > element_at(col("_scores"), (b + 1).cast("int")))) < math.min(np, nCentroids))))
      .select(col("_qid"), col("_qv"), col("bucket").cast("int").as("bucket"))
    val q = pqQueries(probed, "_qid", "_qv", codebooks, keep = Seq("bucket"))
    // bucket equi join: each query meets only its probed lists' codes
    val cand = codes.join(broadcast(q), Seq("bucket"))
    pqShortlistRerank(cand, corpus, idCol, vecCol, codebooks, k, sl)
  }

  // -- SemDeDup: semantic near-duplicate removal over embeddings ------------

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", arXiv:2303.09540, 2023):
    * embedding-space duplicate pruning. Vectors are clustered (here: the
    * deterministic [[nearestCentroid]] assignment, so the whole pipeline
    * is cross-engine reproducible); within each cluster, pairs with
    * cosine >= `tau` form a duplicate graph; every connected component
    * keeps ONE representative — the member LEAST similar to its cluster
    * centroid (the paper's §3 choice: keep the least prototypical example
    * to preserve diversity), ties toward the smaller id. Vectors in no
    * pair survive untouched.
    *
    * Scale shape: the pair search is cluster-blocked (a self equi join on
    * the assigned cluster — never all-pairs; the paper runs k-means with
    * nlist ~ sqrt(N) so cluster sizes stay bounded); components come from
    * [[Dedup.connectedComponents]] (driver union-find under the edge
    * threshold, large-star/small-star above); survivor election is one
    * map-side-combined min(struct) aggregate, no window.
    *
    * @return survivors: (idCol, cluster, centroid_sim)
    */
  def semDedup(vectors: DataFrame, idCol: String, vecCol: String,
      labelCol: String, tau: Double, simPrecision: Int = 6): DataFrame = {
    graft.plans.GraftExtensions.register(vectors.sparkSession)
    val assigned = nearestCentroid(vectors, idCol, vecCol, labelCol, simPrecision)
      .select(col(idCol), col("label").as("cluster"), col("sim").as("centroid_sim"))
    val withVec = assigned.join(vectors.select(col(idCol), col(vecCol)), Seq(idCol))
    val a = withVec.select(col(idCol).as("id_a"), col("cluster"), col(vecCol).as("_va"))
    val b = withVec.select(col(idCol).as("id_b"), col("cluster"), col(vecCol).as("_vb"))
    val pairs = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(graft.plans.GraftExtensions.cosineSim(col("_va"), col("_vb")) >= tau)
      .select(col("id_a"), col("id_b"))
    val comps = Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", idCol)
    // singletons are their own component; survivor = min (centroid_sim, id)
    // per component via one partial-aggregating min(struct) — no window
    val labeled = assigned.join(comps, Seq(idCol), "left")
      .withColumn("_comp", coalesce(col("component"), col(idCol)))
    labeled.groupBy(col("_comp"))
      .agg(min(struct(col("centroid_sim"), col(idCol), col("cluster"))).as("_b"))
      .select(col(s"_b.$idCol").as(idCol),
        col("_b.cluster").as("cluster"),
        col("_b.centroid_sim").as("centroid_sim"))
  }
}
