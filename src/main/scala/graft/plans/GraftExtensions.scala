package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.functions.call_function
import graft.functions.{CosineSimilarity, Int8Cosine, Int8Pack, UnicodeNormalize, VectorDot}

/** Engine extensions, injected via the public `SparkSessionExtensions` hook
  * (SURVEY.md §2.10 X4, §4): native functions beyond Spark's built-ins.
  *
  * Two ways in:
  *  - config: `spark.sql.extensions=graft.plans.GraftExtensions` at session
  *    build time (cluster deployments);
  *  - `GraftExtensions.register(spark)` on a live session (tests, notebooks).
  *
  * After either, `cosine_sim(a, b)` resolves in SQL and via
  * `GraftExtensions.cosineSim(colA, colB)` on the DataFrame API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
    ext.injectFunction(GraftExtensions.vectorDotDescriptor)
    ext.injectFunction(GraftExtensions.int8PackDescriptor)
    ext.injectFunction(GraftExtensions.int8CosineDescriptor)
    ext.injectFunction(GraftExtensions.bloomAggDescriptor)
    ext.injectFunction(GraftExtensions.bloomMightContainDescriptor)
    ext.injectFunction(GraftExtensions.unicodeNormalizeDescriptor)
    ext.injectFunction(GraftExtensions.pqEncodeDescriptor)
    ext.injectFunction(GraftExtensions.pqAdcTableDescriptor)
    // SQL table functions for the lake's operational plane (history /
    // CDC diff / disk audit as relations — see GenTableTvf)
    GraftExtensions.tableFunctions.foreach(ext.injectTableFunction)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => AsOfPushdown)
    ext.injectOptimizerRule(_ => GenTableMetadataAggregate)
    // SQL DML (DELETE/UPDATE/MERGE) over registered GenTable views —
    // a RESOLUTION rule (it must claim the plan before the v2-only
    // check), so it is only available on sessions built with
    // spark.sql.extensions; the live-session register() path has no
    // analyzer hook to add it after the fact
    ext.injectResolutionRule(_ => GenTableDml)
  }
}

object GraftExtensions {

  private val cosineSimDescriptor = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 2, "cosine_sim takes exactly 2 arguments")
      CosineSimilarity(children.head, children(1))
    })

  private val vectorDotDescriptor = (
    FunctionIdentifier("vector_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 2, "vector_dot takes exactly 2 arguments")
      VectorDot(children.head, children(1))
    })

  private val int8PackDescriptor = (
    FunctionIdentifier("int8_pack"),
    new ExpressionInfo(classOf[Int8Pack].getName, "int8_pack"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 1, "int8_pack takes exactly 1 argument")
      Int8Pack(children.head)
    })

  // Spark's own runtime-row-level-filtering machinery (SPARK-32268), not
  // exposed in the public function registry — injecting it here gives the
  // decontamination operators the constant-size-broadcast probe shape with
  // zero custom code and full codegen (see Corpus.bloomContaminationFlags).
  private val bloomAggDescriptor = (
    FunctionIdentifier("bloom_agg"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
      "bloom_agg"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 3,
        "bloom_agg(value, estimatedItems, numBits) takes exactly 3 arguments")
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        children.head, children(1), children(2))
    })

  private val bloomMightContainDescriptor = (
    FunctionIdentifier("bloom_might_contain"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      "bloom_might_contain"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 2,
        "bloom_might_contain takes exactly 2 arguments")
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        children.head, children(1))
    })

  private val unicodeNormalizeDescriptor = (
    FunctionIdentifier("unicode_normalize"),
    new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 2,
        "unicode_normalize(str, form) takes exactly 2 arguments")
      require(children(1).foldable,
        "unicode_normalize form must be a constant (NFC/NFD/NFKC/NFKD)")
      UnicodeNormalize(children.head, children(1))
    })

  private val int8CosineDescriptor = (
    FunctionIdentifier("int8_cosine"),
    new ExpressionInfo(classOf[Int8Cosine].getName, "int8_cosine"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 2, "int8_cosine takes exactly 2 arguments")
      Int8Cosine(children.head, children(1))
    })

  // PQ kernels take their codebook as a CONSTANT (it is driver-trained,
  // KB-sized, and the same for every row): the builder folds the literal
  // arguments once so the expression carries plain arrays instead of
  // m·ksub literal columns (the formulation whose generated code exceeded
  // what Janino can compile — see PqCodec's scaladoc).
  private def pqArgs(name: String,
      children: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : (org.apache.spark.sql.catalyst.expressions.Expression, Array[Float], Int, Int) = {
    require(children.size == 4,
      s"$name(vec, flat_codebook, m, ksub) takes exactly 4 arguments")
    require(children.drop(1).forall(_.foldable),
      s"$name codebook/m/ksub must be constants")
    val flat = children(1).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray()
    val m = children(2).eval(null).asInstanceOf[Int]
    val ksub = children(3).eval(null).asInstanceOf[Int]
    (children.head, flat, m, ksub)
  }

  private val pqEncodeDescriptor = (
    FunctionIdentifier("pq_encode"),
    new ExpressionInfo(classOf[graft.functions.PqEncode].getName, "pq_encode"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      val (vec, flat, m, ksub) = pqArgs("pq_encode", children)
      graft.functions.PqEncode(vec, flat, m, ksub)
    })

  private val pqAdcTableDescriptor = (
    FunctionIdentifier("pq_adc_table"),
    new ExpressionInfo(classOf[graft.functions.PqAdcTable].getName, "pq_adc_table"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      val (vec, flat, m, ksub) = pqArgs("pq_adc_table", children)
      graft.functions.PqAdcTable(vec, flat, m, ksub)
    })

  private val tableFunctions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    (FunctionIdentifier("gentable_history"),
      new ExpressionInfo(GenTableTvf.getClass.getName, "gentable_history"),
      GenTableTvf.history _),
    (FunctionIdentifier("gentable_changes"),
      new ExpressionInfo(GenTableTvf.getClass.getName, "gentable_changes"),
      GenTableTvf.changes _),
    (FunctionIdentifier("gentable_fsck"),
      new ExpressionInfo(GenTableTvf.getClass.getName, "gentable_fsck"),
      GenTableTvf.fsck _))

  /** Idempotent registration on a live session. */
  /** Runtime twin of the config-path `injectPlannerStrategy` /
    * `injectOptimizerRule`: adds [[AsOfJoinStrategy]] to the live
    * session's experimental strategies and [[AsOfPushdown]] to its extra
    * optimizations. Synchronized on the session — both are
    * session-global mutable state and a bare check-then-append would
    * race.
    */
  def registerAsOfStrategy(spark: SparkSession): Unit = spark.synchronized {
    val exp = spark.experimental
    // planner.strategies / optimizer.extendedOperatorOptimizationRules
    // already fold in BOTH registration paths — the experimental lists
    // and the extension-injected ones — so a session built with
    // GraftExtensions is seen here and not double-registered (the
    // strategy/rule would otherwise run twice per plan)
    val strategyIn = spark.sessionState.planner.strategies
      .contains(AsOfJoinStrategy) ||
      exp.extraStrategies.contains(AsOfJoinStrategy)
    if (!strategyIn)
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
    val ruleIn = spark.sessionState.optimizer.extendedOperatorOptimizationRules
      .contains(AsOfPushdown) ||
      exp.extraOptimizations.contains(AsOfPushdown)
    if (!ruleIn)
      exp.extraOptimizations = exp.extraOptimizations :+ AsOfPushdown
    val metaAggIn = spark.sessionState.optimizer
      .extendedOperatorOptimizationRules.contains(GenTableMetadataAggregate) ||
      exp.extraOptimizations.contains(GenTableMetadataAggregate)
    if (!metaAggIn)
      exp.extraOptimizations = exp.extraOptimizations :+ GenTableMetadataAggregate
  }

  def register(spark: SparkSession): Unit = {
    registerAsOfStrategy(spark)
    tableFunctions.foreach { case (id, _, builder) =>
      spark.sessionState.tableFunctionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      children => cosineSimDescriptor._3(children),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot",
      children => vectorDotDescriptor._3(children),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int8_pack",
      children => int8PackDescriptor._3(children),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int8_cosine",
      children => int8CosineDescriptor._3(children),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg",
      children => bloomAggDescriptor._3(children),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      children => bloomMightContainDescriptor._3(children),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unicode_normalize",
      children => unicodeNormalizeDescriptor._3(children),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode",
      children => pqEncodeDescriptor._3(children),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_adc_table",
      children => pqAdcTableDescriptor._3(children),
      "built-in")
  }

  /** Column-API access to the native expressions (requires `register`). */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  def vectorDot(a: Column, b: Column): Column = call_function("vector_dot", a, b)

  def int8Pack(v: Column): Column = call_function("int8_pack", v)

  def int8Cosine(a: Column, b: Column): Column = call_function("int8_cosine", a, b)

  /** Unicode canonical normalization; form one of NFC/NFD/NFKC/NFKD. */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    call_function("unicode_normalize", c, org.apache.spark.sql.functions.lit(form))

  /** PQ codes / per-query ADC table over a driver-trained codebook
    * (`codebooks(s)(j)(i)`, flattened s-major). See [[graft.functions.PqEncode]].
    */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    call_function("pq_encode", vec,
      org.apache.spark.sql.functions.lit(codebooks.flatten.flatten),
      org.apache.spark.sql.functions.lit(codebooks.length),
      org.apache.spark.sql.functions.lit(codebooks(0).length))

  def pqAdcTable(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    call_function("pq_adc_table", vec,
      org.apache.spark.sql.functions.lit(codebooks.flatten.flatten),
      org.apache.spark.sql.functions.lit(codebooks.length),
      org.apache.spark.sql.functions.lit(codebooks(0).length))
}
