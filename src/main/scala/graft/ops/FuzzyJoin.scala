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

  /** Sorted-neighborhood entity resolution — the OTHER classic
    * blocking paradigm next to [[fuzzyNameJoin]]'s key blocking:
    * globally sort on a domain key, then only rows within a fixed
    * window w of each other become candidates. Where key blocking's
    * cost is Σ_b |block|² (quadratic in a hot block), sorted
    * neighborhood is HARD-BOUNDED at w·n candidates regardless of
    * skew — the guarantee that matters when a 100 TB identifier
    * column has a pathological common value.
    *
    * Sort key: the REVERSED name (suffix-first), so identifiers that
    * differ only in leading digits become neighbors. Window w=4;
    * match = levenshtein ≤ 1.
    *
    * Scale shape: the global rank comes from [[Ranks.globalOrder]]'s
    * two-level scan (no single-task window); candidate generation is
    * an EQUI-join — each right row re-keys to its own block and its
    * predecessor block, so "within w ranks" never becomes a range
    * join — then the rank-gap filter trims the corner pairs. The
    * O(len²) distance runs on ≤ w·n pairs total. */
  val sortedNeighborhood: Q = Q(
    "q_sorted_neighborhood",
    (s, dir) => {
      val w = 4
      val ranked = graft.ops.Ranks.globalOrder(
        t(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"), reverse(col("c_name")).as("skey")),
        Seq(col("skey"), col("c_custkey")), "rnk")
        .withColumn("blk", expr(s"(rnk - 1) div $w"))
      val a = ranked.select(col("blk").as("j_blk"), col("rnk").as("a_rnk"),
        col("c_custkey").as("a_key"), col("c_name").as("a_name"))
      val b = ranked.select(
        explode(array(col("blk"), col("blk") - 1)).as("j_blk"),
        col("rnk").as("b_rnk"),
        col("c_custkey").as("b_key"), col("c_name").as("b_name"))
      a.join(b, Seq("j_blk"))
        .filter(col("b_rnk") - col("a_rnk") > 0 &&
          col("b_rnk") - col("a_rnk") <= w &&
          levenshtein(col("a_name"), col("b_name")) <= 1)
        .select(col("a_key"), col("b_key"), col("a_name"), col("b_name"),
          (col("b_rnk") - col("a_rnk")).as("gap"),
          levenshtein(col("a_name"), col("b_name")).cast("int").as("dist"))
        // no dedup needed: a keys only to its own block, so each
        // (a, b) pair meets on exactly one j_blk value
        .orderBy("a_key", "b_key")
    },
    Some("""
      WITH ranked AS (
        SELECT c_custkey, c_name,
               CAST(row_number() OVER (ORDER BY reverse(c_name), c_custkey) AS BIGINT) AS rnk
        FROM customer)
      SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
             a.c_name AS a_name, b.c_name AS b_name,
             CAST(b.rnk - a.rnk AS BIGINT) AS gap,
             CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
      FROM ranked a JOIN ranked b
        ON b.rnk - a.rnk BETWEEN 1 AND 4
       AND levenshtein(a.c_name, b.c_name) <= 1
      ORDER BY a_key, b_key"""))

  val all: Seq[Q] = Seq(fuzzyNameJoin, sortedNeighborhood)
}
