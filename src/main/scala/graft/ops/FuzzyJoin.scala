package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Blocked fuzzy (edit-distance) similarity join — entity resolution
  * over dirty identifiers, the string cousin of the MinHash document
  * join (llm/Dedup). The naive form is a quadratic cross join with a
  * `levenshtein` filter; the scale form BLOCKS both sides on a cheap
  * key (here: name suffix) so candidate generation is an equi-join
  * and the O(len²) distance only runs inside a block.
  *
  * Scale shape: candidates = Σ_b |dirty_b|·|clean_b| — linear when
  * blocks stay bounded. A pathological block (everyone shares the
  * suffix) degrades toward quadratic; production caps block size the
  * way the LSH bucket cap does (llm/Similarity) or widens the
  * blocking key. levenshtein is a codegen'd built-in in Spark and a
  * native function in DuckDB computing the same integer metric, so
  * the whole match table is exactly oracle-checkable.
  */
object FuzzyJoin {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Driver query: a deterministically-corrupted copy of the customer
    * names (every third key's first "#0" becomes "#O" — an OCR-style
    * confusion) fuzzy-joined back against the clean table, blocked on
    * the 3-char name suffix, matched at distance ≤ 2. Every corrupted
    * row must recover its own clean row at distance 1 (plus the
    * true distance-2 collisions that share the block — keys 1000
    * apart share a 3-digit suffix), so the hash pins both the
    * matcher's recall and its exact candidate arithmetic. The 3-char
    * block bounds candidates to ~|table|/1000 per row where a 2-char
    * block paid 10× more levenshtein calls for the same result. */
  val fuzzyNameJoin: Q = Q(
    "q_fuzzy_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val dirty = c.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("d_key"),
          regexp_replace(col("c_name"), "#0", "#O").as("d_name"))
      val clean = c.select(col("c_custkey").as("k_key"), col("c_name").as("k_name"))
      dirty.join(clean,
          substring(col("d_name"), -3, 3) === substring(col("k_name"), -3, 3) &&
            levenshtein(col("d_name"), col("k_name")) <= 2)
        .select(col("d_key"), col("d_name"), col("k_key"), col("k_name"),
          levenshtein(col("d_name"), col("k_name")).as("dist"))
        .orderBy("d_key", "k_key")
    },
    Some("""
      WITH dirty AS (
        SELECT c_custkey AS d_key, replace(c_name, '#0', '#O') AS d_name
        FROM customer WHERE c_custkey % 3 = 0),
      clean AS (
        SELECT c_custkey AS k_key, c_name AS k_name FROM customer)
      SELECT d_key, d_name, k_key, k_name,
             CAST(levenshtein(d_name, k_name) AS INT) AS dist
      FROM dirty JOIN clean
        ON right(d_name, 3) = right(k_name, 3)
       AND levenshtein(d_name, k_name) <= 2
      ORDER BY d_key, k_key"""))

  val all: Seq[Q] = Seq(fuzzyNameJoin)
}
