package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Scalar-function breadth beyond the reference's own F1-F12 set —
  * the string/math/ordered-aggregate surface a reference user would
  * reach for next. Every function here was chosen for bit-exact
  * cross-engine semantics (SURVEY.md §7.5): no transcendentals whose
  * libm rounding could differ (sqrt IS correctly-rounded IEEE;
  * log/exp/pow are not), integer-exact arithmetic for mod/percentile.
  */
object ScalarSuite {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** String function sampler over `part`. */
  val stringFuncs: Q = Q(
    "q_string_funcs",
    (s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          lpad(col("p_brand"), 12, "*").as("padded"),
          instr(col("p_name"), "a").cast("long").as("a_pos"),
          translate(col("p_type"), "AEO", "aeo").as("translated"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          reverse(col("p_brand")).as("rev"),
          substring(col("p_name"), 1, 3).as("prefix3"),
          concat_ws("-", col("p_brand"), col("p_type")).as("joined"),
          expr("split_part(p_name, ' ', 1)").as("first_token"))
        .orderBy("p_partkey"),
    Some("""
      SELECT p_partkey,
             lpad(p_brand, 12, '*') AS padded,
             CAST(instr(p_name, 'a') AS BIGINT) AS a_pos,
             translate(p_type, 'AEO', 'aeo') AS translated,
             regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
             reverse(p_brand) AS rev,
             substr(p_name, 1, 3) AS prefix3,
             concat_ws('-', p_brand, p_type) AS joined,
             split_part(p_name, ' ', 1) AS first_token
      FROM part ORDER BY p_partkey"""))

  /** Math sampler over `lineitem` — exact-arithmetic functions only. */
  val mathFuncs: Q = Q(
    "q_math_funcs",
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("abs_delta"),
          floor(col("l_extendedprice")).cast("long").as("price_floor"),
          ceil(col("l_tax") * 100).cast("long").as("tax_ceil"),
          sqrt(col("l_quantity")).as("qty_sqrt"),
          signum(col("l_discount") - 0.04).cast("long").as("disc_sign"),
          (round(col("l_extendedprice") * 100, 0).cast("long") % 97).as("cents_mod"),
          greatest(col("l_discount"), col("l_tax")).as("max_rate"),
          least(col("l_discount"), col("l_tax")).as("min_rate"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""
      SELECT l_orderkey, l_linenumber,
             abs(l_discount - 0.05) AS abs_delta,
             CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
             CAST(ceil(l_tax * 100) AS BIGINT) AS tax_ceil,
             sqrt(l_quantity) AS qty_sqrt,
             CAST(sign(l_discount - 0.04) AS BIGINT) AS disc_sign,
             CAST(round(l_extendedprice * 100) AS BIGINT) % 97 AS cents_mod,
             greatest(l_discount, l_tax) AS max_rate,
             least(l_discount, l_tax) AS min_rate
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** Ordered aggregates: arg-max/arg-min on a unique ordering key
    * (deterministic) + exact interpolated median over integer cents
    * (both engines compute (a+b)/2 exactly in double). */
  val orderedAggs: Q = Q(
    "q_argmax_median",
    (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_orderpriority"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .groupBy("o_orderstatus")
        .agg(
          max_by(col("o_orderpriority"), col("o_orderkey")).as("latest_priority"),
          min_by(col("o_orderpriority"), col("o_orderkey")).as("first_priority"),
          expr("percentile(cents, 0.5)").as("median_cents"))
        .orderBy("o_orderstatus"),
    Some("""
      SELECT o_orderstatus,
             max_by(o_orderpriority, o_orderkey) AS latest_priority,
             min_by(o_orderpriority, o_orderkey) AS first_priority,
             quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5) AS median_cents
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Approximate percentile (t-digest class) under a driver-checkable
    * bound, mirroring q_approx_distinct's scheme: Spark emits the
    * exact interpolated median and a boolean asserting the sketch
    * landed within 5% of it; the oracle emits exact + TRUE, so the
    * hash compare fails if the sketch drifts. accuracy=10000 ⇒ rank
    * error ≤ 1e-4 — the 5% value bound is enormous slack on this
    * distribution. The sketch, not exact percentile, is what runs at
    * 100 TB: fixed state per group, map-side combinable, no full sort
    * of the column. */
  val approxPercentile: Q = Q(
    "q_approx_percentile",
    (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderstatus"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .groupBy("o_orderstatus")
        .agg(
          expr("percentile(cents, 0.5)").as("exact_median_cents"),
          expr("approx_percentile(cents, 0.5, 10000)").as("approx"))
        .select(col("o_orderstatus"), col("exact_median_cents"),
          (abs(col("approx") - col("exact_median_cents")) /
            col("exact_median_cents") <= 0.05).as("within_5pct"))
        .orderBy("o_orderstatus"),
    Some("""
      SELECT o_orderstatus,
             quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5) AS exact_median_cents,
             TRUE AS within_5pct
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Array-function breadth (SURVEY §2h "array fns" row): distinct /
    * sort / slice / join / membership over tokenized text. String
    * ordering is UTF-8 binary on both engines (UTF-8 byte order equals
    * codepoint order, so the zh documents sort identically). */
  val arrayFuncs: Q = Q(
    "q_array_funcs",
    (s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      val dis = array_distinct(toks)
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(dis).cast("long").as("n_distinct"),
          array_join(slice(array_sort(dis), 1, 3), ",").as("first3"),
          array_contains(toks, "the").as("has_the"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
             array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3,
             list_contains(toks, 'the') AS has_the
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
            FROM documents)
      ORDER BY doc_id"""))

  /** Regex scalar family over document text: group extraction,
    * occurrence counting, and removal — the patterns every text
    * pipeline leans on (redaction uses regexp_replace already; this
    * pins the broader surface under the cross-engine hash). Patterns
    * stay in the Java∩RE2 subset (no lookaround, no backrefs) so both
    * engines compile them identically; word-boundary `\b` is in both. */
  val regexSuite: Q = Q(
    "q_regex_suite",
    (s, dir) =>
      graft.Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          regexp_extract(col("text"), "(\\w+)\\s+(\\w+)", 2).as("second_tok"),
          regexp_count(col("text"), lit("\\bdata\\b")).cast("long").as("n_data"),
          length(regexp_replace(col("text"), "[aeiou]", "")).cast("long")
            .as("len_no_vowels"),
          regexp_like(col("text"), lit("join.*join")).as("has_two_joins"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             regexp_extract(text, '(\w+)\s+(\w+)', 2) AS second_tok,
             CAST(len(regexp_extract_all(text, '\bdata\b')) AS BIGINT) AS n_data,
             CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS len_no_vowels,
             regexp_matches(text, 'join.*join') AS has_two_joins
      FROM documents ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(stringFuncs, mathFuncs, orderedAggs, approxPercentile,
    arrayFuncs, regexSuite)
}
