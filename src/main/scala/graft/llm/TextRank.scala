package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** TextRank keyword scoring (Mihalcea & Tarau 2004) — PageRank over
  * the word co-occurrence graph, the graph-centrality alternative to
  * frequency-style keyword pickers ([[TextStats]] vocab/TF-IDF): a
  * word matters if it co-occurs with words that matter. Exactly the
  * original keyword-extraction construction: UNWEIGHTED undirected
  * edges between distinct words ADJACENT in some document (window
  * w = 2), then the integer-arithmetic PageRank
  * ([[graft.ops.Graph.pageRank]] — micro-scaled ranks, div-truncated,
  * d = 0.85, 5 iterations) whose whole trajectory is
  * engine-reproducible, so the oracle unrolls the same 5 iterations
  * as CTEs over the same co-occurrence edges and every rank value
  * rides the driver hash.
  *
  * String vertices get ids from the SORTED VOCABULARY —
  * [[graft.ops.Ranks.globalOrder]] on the Spark side (no
  * unpartitioned window), row_number on the vocab-domain frame in
  * DuckDB; ASCII-lowercase tokens make both orders identical.
  *
  * Scale shape: one tokenize pass; the adjacency self-join is keyed
  * (doc_id, pos+1) so the pair blow-up is ONE row per consecutive
  * token pair, never tokens²; everything after the distinct-edge
  * aggregate is vocabulary-domain. PageRank runs in its cloned
  * vertex-sized session. Isolated words (never adjacent to a
  * DIFFERENT word) have no edges and drop out of the graph on both
  * engines. */
object TextRank {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Core TextRank over any (doc_id, text) frame: (word, r) with r
    * the integer micro-rank after 5 iterations. */
  def textRank(docs: DataFrame): DataFrame = {
    val tk = docs
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val ids = graft.ops.Ranks.globalOrder(
      tk.select("w").distinct(), Seq(col("w").asc), "vid")
    val undw = tk.as("a").join(tk.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") === col("a.pos") + 1 && col("a.w") =!= col("b.w"))
      .select(least(col("a.w"), col("b.w")).as("wa"),
        greatest(col("a.w"), col("b.w")).as("wb"))
      .distinct()
    val withIds = undw
      .join(broadcast(ids.select(col("w").as("wa"), col("vid").as("ia"))),
        Seq("wa"))
      .join(broadcast(ids.select(col("w").as("wb"), col("vid").as("ib"))),
        Seq("wb"))
    val edges = withIds.select(col("ia").as("src"), col("ib").as("dst"))
      .unionAll(withIds.select(col("ib").as("src"), col("ia").as("dst")))
    graft.ops.Graph.pageRank(edges, 5)
      .join(broadcast(ids.select(col("vid").as("v"), col("w").as("word"))),
        Seq("v"))
      .select(col("word"), col("r"))
      .orderBy("word")
  }

  val textRankQ: Q = Q(
    "q_textrank",
    (s, dir) => textRank(t(s, dir, "documents")),
    Some("""
      WITH tk AS MATERIALIZED (
        SELECT doc_id, pos, w FROM (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS w,
                 generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) AS pos
          FROM documents) u
        WHERE w <> ''),
      ids AS MATERIALIZED (
        SELECT w, CAST(row_number() OVER (ORDER BY w) AS BIGINT) AS vid
        FROM (SELECT DISTINCT w FROM tk) d),
      undw AS (
        SELECT DISTINCT least(a.w, b.w) AS wa, greatest(a.w, b.w) AS wb
        FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
          AND a.w <> b.w),
      edges AS MATERIALIZED (
        SELECT ia.vid AS src, ib.vid AS dst
        FROM undw JOIN ids ia ON ia.w = undw.wa JOIN ids ib ON ib.w = undw.wb
        UNION ALL
        SELECT ib.vid AS src, ia.vid AS dst
        FROM undw JOIN ids ia ON ia.w = undw.wa JOIN ids ib ON ib.w = undw.wb),
      deg AS MATERIALIZED (
        SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
      verts AS (SELECT src AS v FROM deg),
      tele AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      (15 * (1000000000000 // count(*))) // 100 AS t
               FROM verts),
      pr0 AS (SELECT v, 1000000000000 // (SELECT n FROM tele) AS r FROM verts),
      pr1 AS (SELECT verts.v AS v,
                     (SELECT t FROM tele) + (85 * coalesce(c.contrib, 0)) // 100 AS r
              FROM verts LEFT JOIN (
                SELECT e.dst AS v, CAST(sum(p.r // d.d) AS BIGINT) AS contrib
                FROM edges e JOIN deg d ON e.src = d.src JOIN pr0 p ON p.v = e.src
                GROUP BY e.dst) c ON verts.v = c.v),
      pr2 AS (SELECT verts.v AS v,
                     (SELECT t FROM tele) + (85 * coalesce(c.contrib, 0)) // 100 AS r
              FROM verts LEFT JOIN (
                SELECT e.dst AS v, CAST(sum(p.r // d.d) AS BIGINT) AS contrib
                FROM edges e JOIN deg d ON e.src = d.src JOIN pr1 p ON p.v = e.src
                GROUP BY e.dst) c ON verts.v = c.v),
      pr3 AS (SELECT verts.v AS v,
                     (SELECT t FROM tele) + (85 * coalesce(c.contrib, 0)) // 100 AS r
              FROM verts LEFT JOIN (
                SELECT e.dst AS v, CAST(sum(p.r // d.d) AS BIGINT) AS contrib
                FROM edges e JOIN deg d ON e.src = d.src JOIN pr2 p ON p.v = e.src
                GROUP BY e.dst) c ON verts.v = c.v),
      pr4 AS (SELECT verts.v AS v,
                     (SELECT t FROM tele) + (85 * coalesce(c.contrib, 0)) // 100 AS r
              FROM verts LEFT JOIN (
                SELECT e.dst AS v, CAST(sum(p.r // d.d) AS BIGINT) AS contrib
                FROM edges e JOIN deg d ON e.src = d.src JOIN pr3 p ON p.v = e.src
                GROUP BY e.dst) c ON verts.v = c.v),
      pr5 AS (SELECT verts.v AS v,
                     (SELECT t FROM tele) + (85 * coalesce(c.contrib, 0)) // 100 AS r
              FROM verts LEFT JOIN (
                SELECT e.dst AS v, CAST(sum(p.r // d.d) AS BIGINT) AS contrib
                FROM edges e JOIN deg d ON e.src = d.src JOIN pr4 p ON p.v = e.src
                GROUP BY e.dst) c ON verts.v = c.v)
      SELECT ids.w AS word, pr5.r AS r
      FROM pr5 JOIN ids ON ids.vid = pr5.v
      ORDER BY word"""))

  val all: Seq[Q] = Seq(textRankQ)
}
