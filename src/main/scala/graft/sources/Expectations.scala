package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-time data-quality gates for the lake tier — the Delta-constraint /
  * DLT-expectation shape (reference intent: the pipeline's validation stage,
  * `Hoth/FHIR/cloudformations/glue-stack.yml` — the Glue job is the declared
  * quality gate between raw and curated), re-expressed on the commit
  * protocol: a batch is checked BEFORE it stages, so a violating row can
  * never become committed state.
  *
  * Semantics: a row PASSES an expectation iff its predicate evaluates TRUE;
  * NULL fails. (Deliberately stricter than SQL CHECK's null-passes rule —
  * a quality gate must affirmatively hold: `amount > 0` should reject a
  * null amount, not wave it through.)
  *
  * Violation handling, per [[GenTable.upsertBatchExpect]]:
  *  - FAIL — one counting aggregate over the batch; any violation aborts
  *    with per-expectation counts before anything stages (the manifest is
  *    untouched — retry-safe by construction).
  *  - DROP — violating rows are filtered out; only clean rows merge. With
  *    a `quarantineDir`, dropped rows land there as plain parquet with a
  *    `_violated` reason array and the target commit id. The TABLE commit
  *    stays exactly-once; the quarantine stream is AT-LEAST-ONCE by design
  *    (a crash between quarantine write and publish re-quarantines on
  *    retry) — it is a diagnostic feed, dedupable on (commit id, key), not
  *    a second table of record.
  *
  * Costs one extra aggregate pass per batch (the violation counts) — the
  * price of a per-expectation report; the batch is frozen first so the
  * pass never recomputes upstream lineage.
  */
object Expectations {

  /** Per-batch gate outcome: `violations` maps expectation name to the
    * number of rows that failed it (a row failing several counts in each).
    */
  final case class Report(input: Long, passed: Long,
      violations: Map[String, Long]) {
    def dropped: Long = input - passed
  }

  sealed trait OnViolation
  /** Abort the commit if any row violates any expectation. */
  case object Fail extends OnViolation
  /** Commit only passing rows (optionally quarantining the rest). */
  case object Drop extends OnViolation
  /** Commit EVERYTHING; the report (and optional quarantine copies)
    * surface the violations — the observe-first rollout mode a gate
    * runs in before anyone trusts it enough to drop data.
    */
  case object Warn extends OnViolation

  /** TRUE iff the row passes every expectation (NULL predicate = fail). */
  private[sources] def passAll(expectations: Seq[(String, Column)]): Column =
    expectations.map { case (_, e) => coalesce(e, lit(false)) }
      .reduceOption(_ && _).getOrElse(lit(true))

  /** One aggregate pass: total rows, passing rows, and per-expectation
    * violation counts (map-side combined; one collected row).
    */
  def report(batch: DataFrame,
      expectations: Seq[(String, Column)]): Report = {
    val aggs = count(lit(1)).as("_in") +:
      sum(when(passAll(expectations), 1L).otherwise(0L)).as("_ok") +:
      expectations.map { case (n, e) =>
        sum(when(!coalesce(e, lit(false)), 1L).otherwise(0L)).as(s"_v_$n")
      }
    val r = batch.agg(aggs.head, aggs.tail: _*).collect()(0)
    Report(r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L),
      expectations.zipWithIndex.map { case ((n, _), i) =>
        n -> Option(r.get(i + 2)).map(_.asInstanceOf[Long]).getOrElse(0L)
      }.toMap)
  }

  /** The rows that pass every expectation. */
  def passing(batch: DataFrame, expectations: Seq[(String, Column)]): DataFrame =
    batch.filter(passAll(expectations))

  /** The rows that fail at least one, with a `_violated` array naming
    * every expectation each row failed.
    */
  def violating(batch: DataFrame,
      expectations: Seq[(String, Column)]): DataFrame = {
    val reasons = expectations.map { case (n, e) =>
      when(!coalesce(e, lit(false)), lit(n))
    }
    batch.filter(!passAll(expectations))
      .withColumn("_violated", array_compact(array(reasons: _*)))
  }
}
