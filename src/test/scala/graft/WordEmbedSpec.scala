package graft

import org.apache.spark.sql.functions._
import graft.llm.WordEmbed

/** The PPMI-SVD word embeddings must LEARN co-occurrence geometry:
  * words that share contexts embed together, words that never share
  * contexts embed apart — the property no row-count check sees. */
class WordEmbedSpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Array[Long], b: Array[Long]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  test("planted cliques: within-clique cosine beats cross-clique") {
    // two vocabularies that never co-occur: docs alternate between
    // clique A (apple..egg) and clique B (stone..iron); adjacency
    // stays strictly within a clique
    val a = Seq("apple", "berry", "cherry", "date", "egg")
    val b = Seq("stone", "metal", "glass", "brick", "iron")
    val docs = (0 until 120).map { i =>
      val words = if (i % 2 == 0) a else b
      val text = (0 until 30).map(j => words((i + j * j) % 5)).mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val rows = WordEmbed.embed(docs).collect()
    val vecs = rows.map(r =>
      r.getString(0) -> (1 to 8).map(k => r.getLong(k)).toArray).toMap
    assert(vecs.keySet == (a ++ b).toSet, vecs.keySet.toString)
    val within = for (x <- a; y <- a if x < y) yield cos(vecs(x), vecs(y))
    val across = for (x <- a; y <- b) yield cos(vecs(x), vecs(y))
    assert(within.min > 0.8,
      s"within-clique similarity too low: ${within.min}")
    assert(across.max < 0.3,
      s"cross-clique similarity too high: ${across.max}")
  }

  test("driver query: full vocabulary embedded, deterministic") {
    val first = WordEmbed.wordEmbed.fn(spark, sf001).collect()
    val vocab = Tables.load(spark, sf001, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "").distinct().count()
    // every word that ever appears in a bigram gets a vector; the
    // corpus has no single-token documents, so that is the vocabulary
    assert(first.length == vocab, s"${first.length} vs vocab $vocab")
    val again = WordEmbed.wordEmbed.fn(spark, sf001).collect()
    assert(first.toSeq == again.toSeq)
    // vectors are not degenerate: some component varies across words
    val spread = first.map(_.getLong(1)).distinct
    assert(spread.length > 1, "first component constant across vocabulary")
  }
}
