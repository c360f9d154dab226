package graft.runner

/** CLI entry for the canned pipelines — the in-process stand-in for the
  * reference's `${Env}-etl-workflow` execution
  * (`Hoth/FHIR/cloudformations/lambda-stack.yml:42-55`).
  *
  * Usage: runMain graft.runner.Main <env> <inputDir> <outputDir> [orders|corpus]
  */
object Main {
  def main(args: Array[String]): Unit = {
    val (env, inputDir, outputDir, job) = args match {
      case Array(e, i, o)    => (e, i, o, "orders")
      case Array(e, i, o, j) => (e, i, o, j)
      case _ => sys.error("usage: Main <env> <inputDir> <outputDir> [orders|corpus]")
    }
    val stages = job match {
      case "orders" => PipelineRunner.ordersJobStages
      case "corpus" => PipelineRunner.corpusPrepStages()
      case other    => sys.error(s"unknown job '$other' (expected orders|corpus)")
    }
    val spark = graft.Sessions.local(s"graft-$env")
    try {
      val results = PipelineRunner.run(spark,
        PipelineRunner.EngineConfig(env, inputDir, outputDir), stages)
      results.foreach(r => println(s"[${r.status}] ${r.stage}: rows=${r.rows} ms=${r.millis}"))
      if (results.exists(_.status != "ok")) sys.exit(1)
    } finally spark.stop()
  }
}
