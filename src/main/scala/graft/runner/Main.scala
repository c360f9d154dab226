package graft.runner

/** CLI entry for the orders pipeline — the in-process stand-in for the
  * reference's `${Env}-etl-workflow` execution
  * (`Hoth/FHIR/cloudformations/lambda-stack.yml:42-55`).
  *
  * Usage: runMain graft.runner.Main <env> <inputDir> <outputDir>
  */
object Main {
  def main(args: Array[String]): Unit = {
    val Array(env, inputDir, outputDir) = args
    val spark = graft.Sessions.local(s"graft-$env")
    try {
      val results = PipelineRunner.run(spark,
        PipelineRunner.EngineConfig(env, inputDir, outputDir),
        PipelineRunner.ordersJobStages)
      results.foreach(r => println(s"[${r.status}] ${r.stage}: rows=${r.rows} ms=${r.millis}"))
      if (results.exists(_.status != "ok")) sys.exit(1)
    } finally spark.stop()
  }
}
