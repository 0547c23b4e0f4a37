package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Recency derivations — the reference's F5/F6/F7 scalar family
  * (reference `lambda_function.py:88` days-since, `:89` isRecent,
  * `:102-114` recency_score ladder).
  *
  * The reference computes against wall-clock `now()`; for
  * deterministic oracle-matching every entry point takes a pinned
  * as-of date instead (SURVEY.md §7.5). The ladder thresholds are
  * scaled from the reference's {1,3,5,7} days to {30,90,180,365} for
  * the test corpus whose order dates span 1995–2001; the original
  * ladder is exercised verbatim by the SAM fixture pipeline
  * ([[graft.ops.Ingest]]).
  *
  * All of this is plain `CaseWhen`/`datediff` — whole-stage-codegen
  * native, no UDF (the reference used two row-wise `.apply` UDFs;
  * SURVEY.md §2j shows both lower to built-ins).
  */
object Recency {

  /** Pinned "today" for the TPC-H-ish corpus (max o_orderdate is 2001-08-01). */
  val AsOf = "2001-08-05"

  /** Whole days elapsed from `d` to `asOf` (reference `:88`). */
  def daysSince(asOf: Column, d: Column): Column =
    datediff(asOf.cast("date"), d.cast("date"))

  /** Reference ladder `:102-112`, thresholds parameterized.
    * Null days fall through every `when` to the else-branch — exactly
    * pandas' NaN-comparison-is-False semantics (SURVEY.md §7.5).
    */
  def score(days: Column, t: Seq[Int] = Seq(30, 90, 180, 365)): Column =
    when(days <= t(0), 5)
      .when(days <= t(1), 4)
      .when(days <= t(2), 3)
      .when(days <= t(3), 2)
      .otherwise(1)

  /** `isRecent` (reference `:89`): null-safe — NaT compares False in
    * pandas, so wrap in coalesce(false). */
  def isRecent(days: Column, within: Int): Column =
    coalesce(days <= within, lit(false))

  /** `hasNAICS`-style non-blank test (reference `:90`):
    * true iff non-null and non-blank after trim. Native, no UDF. */
  def nonBlank(c: Column): Column =
    c.isNotNull && trim(c) =!= ""
}
