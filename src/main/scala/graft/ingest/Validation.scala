package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's constraint surface as reusable violation checks
  * (SURVEY §2.10): the Pandera row contract (V1, `validators.py:6-20`), the
  * dbt schema tests (V2–V6, `models/schema.yml:4-79`), and fail-fast gating
  * (V7, `pipeline.py:169-173`).
  *
  * Each check builds a violation DataFrame lazily; `require*` forms count it
  * and throw, which is how the job runner interleaves model materialization
  * with its tests exactly as `dbt build` does. All checks are single
  * aggregations — no collects of data rows, safe at any scale.
  */
object Validation {

  val ValidStages: Seq[String] = Seq("W", "N1", "N2", "N3", "REM")
  val PowerCols: Seq[String] =
    Seq("delta_power", "theta_power", "alpha_power", "sigma_power", "beta_power")

  final case class CheckResult(name: String, violations: Long) {
    def ok: Boolean = violations == 0L
  }

  /** V1 — the Pandera contract on raw epoch rows: non-null ids, stage in the
    * canonical five, power values non-null and non-NaN (negative dB is
    * allowed; NaN means a failed calculation and rejects the subject —
    * `tests/test_ingest.py:41-61`). Returns the violating rows.
    */
  def epochContractViolations(df: DataFrame): DataFrame = {
    val badPower = PowerCols
      .map(c => col(c).isNull || isnan(col(c)))
      .reduce(_ || _)
    df.filter(
      col("subject_id").isNull || col("epoch_idx").isNull ||
        col("stage").isNull || !col("stage").isin(ValidStages: _*) || badPower)
  }

  /** V1 applied per subject: the whole subject is rejected if ANY of its rows
    * violates the contract (`pipeline.py:81`, SchemaErrors path). Returns
    * (validEpochs, rejectedSubjectErrors).
    */
  def validateBySubject(df: DataFrame): (DataFrame, DataFrame) = {
    val badSubjects = epochContractViolations(df)
      .groupBy("subject_id")
      .agg(count(lit(1)).as("n_violations"))
    val valid = df.join(broadcast(badSubjects), Seq("subject_id"), "left_anti")
    val errors = badSubjects.select(
      col("subject_id").cast("int").as("subject_id"),
      lit("SchemaErrors").as("error_type"),
      concat(lit("epoch contract violations: "), col("n_violations"))
        .as("error_message"),
      lit("").as("stack_trace"))
    (valid, errors)
  }

  // ---- dbt schema tests (V2–V6) as violation counters ----

  def notNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(col(_).isNull).reduce(_ || _))

  def unique(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  def acceptedValues(df: DataFrame, c: String, values: Seq[String]): DataFrame =
    df.filter(!col(c).isin(values: _*))

  def expressionIsTrue(df: DataFrame, expr: Column): DataFrame =
    df.filter(!coalesce(expr, lit(false)))

  def acceptedRange(df: DataFrame, c: String, min: Double, max: Double): DataFrame =
    df.filter(col(c).isNotNull && !col(c).between(min, max))

  /** schema.yml's full test battery for the staging model (V2/V3/V4). */
  def stagingChecks(staged: DataFrame): Seq[(String, DataFrame)] = Seq(
    "staging_not_null" -> notNull(staged, Seq(
      "epoch_id", "subject_id", "epoch_idx", "sleep_stage",
      "delta_power_uv", "theta_power_uv", "alpha_power_uv", "sigma_power_uv",
      "beta_power_uv")),
    "staging_unique_epoch_id" -> unique(staged, Seq("epoch_id")),
    "staging_accepted_stages" ->
      acceptedValues(staged, "sleep_stage", ValidStages))

  /** schema.yml's tests for the summary mart (V3/V5/V6,
    * `models/schema.yml:47-79`): unique subject, TST ≤ sleep period, stage
    * shares sum to 1 ± 1e-4 (guarded when no sleep), efficiency ∈ [0,1].
    */
  def summaryChecks(summary: DataFrame): Seq[(String, DataFrame)] = Seq(
    "summary_unique_subject" -> unique(summary, Seq("subject_id")),
    "summary_tst_le_period" -> expressionIsTrue(summary,
      col("total_sleep_minutes") <= col("sleep_period_minutes")),
    "summary_shares_sum_to_1" -> expressionIsTrue(summary,
      col("total_sleep_minutes") === 0 ||
        abs(col("deep_sleep_percentage") + col("light_sleep_percentage") +
          col("rem_sleep_percentage") - 1) < 0.0001),
    "summary_efficiency_range" ->
      acceptedRange(summary, "sleep_efficiency", 0.0, 1.0))

  /** V7 fail-fast gate: count every violation set, throw on the first
    * non-empty one so dependents never build on bad data.
    */
  def requireAll(checks: Seq[(String, DataFrame)]): Seq[CheckResult] =
    checks.map { case (name, violations) =>
      val n = violations.count()
      if (n > 0) throw new IllegalStateException(
        s"data test failed: $name ($n violations)")
      CheckResult(name, n)
    }
}
