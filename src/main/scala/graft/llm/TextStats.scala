package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token counting, quality scoring, language-ID
  * heuristic, document fingerprinting.
  *
  * Everything is built from codegen'd `functions._` expressions — no
  * UDFs — so at 100 TB each query is one narrow scan stage (plus the
  * declared ORDER BY, which the harness needs for determinism but a
  * production pipeline would drop).
  *
  * Division is always `nullif`-guarded: Spark 4 runs in ANSI mode
  * (divide-by-zero raises) while DuckDB yields NULL — guarding makes
  * both produce NULL.
  */
object TextStats {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Whitespace tokens of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Token counting: whitespace tokens + a BPE-ish regex piece count
    * (letter runs / digit runs / single non-space symbols). */
  val tokenCount: Q = Q(
    "q_token_count",
    (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
            .cast("long").as("n_pieces"),
          length(col("text")).cast("long").as("n_chars_calc"),
          (length(col("text")) === col("n_chars")).as("chars_match"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
             CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_pieces,
             CAST(length(text) AS BIGINT) AS n_chars_calc,
             (length(text) = n_chars) AS chars_match
      FROM documents ORDER BY doc_id"""))

  /** Quality scoring: length/punctuation/stopword ratios + average
    * word length, aggregated per document with higher-order array
    * functions (`aggregate`/`transform`) — sequential fold, so the
    * double divisions are bit-identical to the oracle's. */
  val quality: Q = Q(
    "q_quality",
    (s, dir) => {
      val tok = tokens(col("text"))
      val nTok = size(tok)
      val sumLen = aggregate(transform(tok, x => length(x)), lit(0), (acc, x) => acc + x)
      val stops = array(lit("the"), lit("a"), lit("of"), lit("and"), lit("to"), lit("in"))
      val nStop = size(filter(tok, x => array_contains(stops, x)))
      val nPunct = length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?'\"]", ""))
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          nTok.cast("long").as("n_tokens"),
          nPunct.cast("long").as("n_punct"),
          nStop.cast("long").as("n_stopwords"),
          (sumLen.cast("double") / nullif(nTok, lit(0))).as("avg_word_len"),
          (nStop.cast("double") / nullif(nTok, lit(0))).as("stopword_ratio"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(n_tok AS BIGINT) AS n_tokens,
             CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"]', '', 'g')) AS BIGINT) AS n_punct,
             CAST(n_stop AS BIGINT) AS n_stopwords,
             CAST(sum_len AS DOUBLE) / nullif(n_tok, 0) AS avg_word_len,
             CAST(n_stop AS DOUBLE) / nullif(n_tok, 0) AS stopword_ratio
      FROM (
        SELECT doc_id, text,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
               list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'), x -> len(x))) AS sum_len,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                   x -> list_contains(['the','a','of','and','to','in'], x))) AS n_stop
        FROM documents
      ) ORDER BY doc_id"""))

  /** Language-ID heuristic: stopword/marker n-gram scan (padded-text
    * contains), CASE-priority decision. Deterministic; mirrored
    * verbatim in the oracle. */
  /** The lang-ID decision expression, shared with
    * [[Classifier.evalMetrics]]'s registered evaluation. */
  private[llm] def langPred: Column = {
    val padded = concat(lit(" "), col("text"), lit(" "))
    def hasAny(ws: Seq[String]): Column =
      ws.map(w => padded.contains(s" $w ")).reduce(_ || _)
    when(col("text").rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(hasAny(Seq("der", "und", "nicht", "das")), "de")
      .when(hasAny(Seq("le", "la", "et", "les")), "fr")
      .when(hasAny(Seq("el", "los", "las", "es")), "es")
      .when(hasAny(Seq("the", "and", "of", "to")), "en")
      .otherwise("und")
  }

  /** DuckDB mirror of [[langPred]] (oracle-only fragment). */
  private[llm] val langPredSql: String = """
          CASE
            WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
            WHEN contains(' ' || text || ' ', ' der ') OR contains(' ' || text || ' ', ' und ')
              OR contains(' ' || text || ' ', ' nicht ') OR contains(' ' || text || ' ', ' das ') THEN 'de'
            WHEN contains(' ' || text || ' ', ' le ') OR contains(' ' || text || ' ', ' la ')
              OR contains(' ' || text || ' ', ' et ') OR contains(' ' || text || ' ', ' les ') THEN 'fr'
            WHEN contains(' ' || text || ' ', ' el ') OR contains(' ' || text || ' ', ' los ')
              OR contains(' ' || text || ' ', ' las ') OR contains(' ' || text || ' ', ' es ') THEN 'es'
            WHEN contains(' ' || text || ' ', ' the ') OR contains(' ' || text || ' ', ' and ')
              OR contains(' ' || text || ' ', ' of ') OR contains(' ' || text || ' ', ' to ') THEN 'en'
            ELSE 'und' END"""

  val langId: Q = Q(
    "q_lang_id",
    (s, dir) => {
      val pred = langPred
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), pred.as("lang_pred"),
          (pred === col("lang")).as("agree"))
        .orderBy("doc_id")
    },
    Some(s"""
      SELECT doc_id, lang, lang_pred, (lang_pred = lang) AS agree FROM (
        SELECT doc_id, lang,
          $langPredSql AS lang_pred
        FROM documents
      ) ORDER BY doc_id"""))

  /** Document fingerprinting: md5 content hash (exact-dedup key) plus a
    * 16-hex-digit prefix fingerprint. Stable across engines. */
  val fingerprint: Q = Q(
    "q_fingerprint",
    (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          md5(col("text").cast("binary")).as("content_hash"),
          substring(md5(col("text").cast("binary")), 1, 16).as("fp16"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id, md5(text) AS content_hash,
             substr(md5(text), 1, 16) AS fp16
      FROM documents ORDER BY doc_id"""))

  /** Repetition ratio — the boilerplate/spam signal: share of the
    * document taken by its single most frequent token. Two-level
    * aggregation, both map-side combinable: (doc, token) counts, then
    * per-doc sum/max. The ratio divides two exact longs, so the
    * double is bit-identical cross-engine. */
  val repetitionRatio: Q = Q(
    "q_repetition_ratio",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_tok"), max(col("c")).as("max_tok"))
        .select(col("doc_id"),
          col("n_tok").cast("long").as("n_tokens"),
          col("max_tok").cast("long").as("max_tok_cnt"),
          (col("max_tok").cast("double") / nullif(col("n_tok"), lit(0)))
            .as("repetition_ratio"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
             CAST(max_tok AS BIGINT) AS max_tok_cnt,
             CAST(max_tok AS DOUBLE) / nullif(n_tok, 0) AS repetition_ratio
      FROM (
        SELECT doc_id, sum(c) AS n_tok, max(c) AS max_tok FROM (
          SELECT doc_id, tok, count(*) AS c FROM (
            SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
            FROM documents
          ) GROUP BY doc_id, tok
        ) GROUP BY doc_id
      ) ORDER BY doc_id"""))

  /** Rolling-hash fingerprint via the custom wrapping-arithmetic
    * expression ([[graft.functions.RollingHash]]). HASH-ORACLED
    * (promoted r16): the wrap ANSI `*` rejects is replayed in DuckDB
    * by folding the character stream through HUGEINT arithmetic mod
    * 2⁶⁴ (`list_reduce` with `(acc·31 + b) mod 2⁶⁴`, signed-mapped at
    * the end) — bit-exact against the Java loop for ASCII corpora,
    * where codepoint = UTF-8 byte (the harness corpus is verified
    * all-ASCII at every SF; a non-ASCII corpus has no pure-SQL byte
    * iterator in DuckDB, and this oracle would honestly mismatch
    * rather than silently pass). Exact values are additionally pinned
    * in ScalaTest against a driver-side reference implementation, and
    * the structural invariant — EXACTLY one fingerprint per document —
    * stays asserted in-query, so a silent row drop reaches the
    * driver's `err` field even without the oracle. */
  val rollingFingerprint: Q = Q(
    "q_rolling_fingerprint",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val nDocs = docs.count()
      val out = docs.select(col("doc_id"),
          graft.functions.RollingHash(col("text")).as("rhash64"))
        .orderBy("doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // one action materializes the cache AND checks the exact-count
      // invariant in both directions (a drop OR a duplication throws);
      // the cached frame IS the returned result, so release belongs to
      // the harness (Bench/Verify clearCache after materializing)
      val n = out.count()
      if (n != nDocs)
        throw new IllegalStateException(
          s"rolling fingerprint produced $n rows for $nDocs documents")
      out
    },
    Some("""
      SELECT doc_id,
        CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
              THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT)
          AS rhash64
      FROM (
        SELECT doc_id,
          CASE WHEN text = '' THEN 0::HUGEINT ELSE
            list_reduce(
              list_prepend(0::HUGEINT,
                [ord(c)::HUGEINT for c in split(text, '')]),
              (acc, b) -> (acc * 31 + b) % 18446744073709551616::HUGEINT)
          END AS h
        FROM documents)
      ORDER BY doc_id"""))

  /** Winnowing fingerprint selection (Schleimer-Wilkerson-Aiken,
    * SIGMOD 2003 — the MOSS algorithm): token k-gram hashes, then per
    * sliding window of `w` consecutive gram positions keep the MIN
    * hash (ties to the RIGHTMOST position), dedup selections. The
    * guarantee local fingerprinting buys over [[rollingFingerprint]]'s
    * whole-document hash: any shared token run of length ≥ w + k − 1
    * between two documents shares at least one selected fingerprint
    * (TextStatsSpec plants one and proves it), at expected density
    * 2/(w+1) of the gram stream.
    *
    * Engine-portable: gram hashes are 40-bit md5 prefixes (the
    * repo-wide derandomized coin), and the rightmost-min tiebreak is
    * ENCODED into one orderable integer — combined = hash·2²⁰ +
    * (2²⁰−1−gpos) — so a plain windowed `min` is the whole argmin and
    * no engine's tie semantics are trusted. Returns the selected
    * (doc_id, gpos, ghash) set.
    *
    * Scale shape: one token explode, two lead windows and one
    * frame-bounded min window, all partitioned by doc_id — per-doc
    * work, corpus-keyed shuffles only; nothing all-pairs (matching
    * fingerprints across docs is the CONSUMER's join, at selected-set
    * size ≈ 2/(w+1) of the corpus grams). */
  private[graft] def winnowSelect(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id").orderBy("gpos")
    val toks = docs.filter(trim(col("text")) =!= "")
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("gpos"), col("tok"))
    val grams = toks
      .withColumn("t2", lead(col("tok"), 1).over(byDoc))
      .withColumn("t3", lead(col("tok"), 2).over(byDoc))
      .filter(col("t3").isNotNull)
      .withColumn("ghash",
        conv(substring(md5(concat_ws(" ", col("tok"), col("t2"), col("t3"))
          .cast("binary")), 1, 10), 16, 10).cast("long"))
      .withColumn("gcnt", count(lit(1)).over(Window.partitionBy("doc_id")))
    val combined = grams
      // 2^20 position budget: the tiebreak encoding needs gpos < 2^20
      // (a "document" a million tokens long belongs in chunked form
      // long before fingerprinting — fail fast, don't mis-select)
      .withColumn("gpos",
        when(col("gpos") >= 1048576L,
          raise_error(lit("winnowing: document exceeds 2^20 grams"))
            .cast("long"))
          .otherwise(col("gpos")))
      .withColumn("comb",
        col("ghash") * 1048576L + (lit(1048575L) - col("gpos")))
    val wmin = combined
      .withColumn("wmin", min(col("comb")).over(
        byDoc.rowsBetween(Window.currentRow, 3)))
      // valid window starts: 1..G-w+1; a doc with fewer than w grams
      // keeps its single (shrunken) window at start 1
      .filter(col("gpos") <= col("gcnt") - 3 ||
        (col("gpos") === 1L && col("gcnt") < 4))
    wmin.select(col("doc_id"),
        (lit(1048575L) - (col("wmin") % 1048576L)).as("gpos"),
        expr("wmin div 1048576").as("ghash"))
      .distinct()
  }

  private val winnowStoreLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** STAGED CORPUS WINNOWING-FINGERPRINT STORE — the winnowing
    * substrate computed ONCE per application and parquet-staged (the
    * [[graft.ops.Graph.coPairs]] / [[graft.llm.Similarity]] staging
    * device): the full [[winnowSelect]] frame `(doc_id, pos, ghash)`
    * over the `documents` table of `dir`. Four queries consume it —
    * [[winnowing]], [[winnowSpans]], [[contamination]],
    * [[decontaminateBatch]] — and before staging, the posexplode +
    * md5 + four-window selection pipeline over the whole corpus ran
    * up to SEVEN times per round across them (VERDICT r16: the
    * triple recompute inside q_eval_contamination alone made it the
    * bench's single most expensive query, with a GCLocker
    * allocation-stall warning in the driver log).
    *
    * Planted verbatim copies need no re-fingerprinting either:
    * winnowing is a pure PER-DOCUMENT function of the text, so a
    * copy's selected set IS its source's store rows doc_id-shifted —
    * the contamination queries derive their plants from the store
    * instead of re-running the pipeline over corpus+plant unions.
    * Longs round-trip parquet bit-exactly, so store vs inline is
    * value-identical and every consumer hash is unchanged; the
    * DuckDB oracles recompute the selection from scratch, proving
    * the staging invisible. Same staleness contract as
    * [[graft.Staging]]: one application = one corpus snapshot. */
  private def winnowStore(s: SparkSession, dir: String): DataFrame = {
    val path = graft.Staging.dir(s,
      "graft_winnowfp_" + dir.replaceAll("[^A-Za-z0-9]", "_"))
    val lock = winnowStoreLocks.computeIfAbsent(path, _ => new Object)
    lock.synchronized {
      if (!graft.Staging.ready(s, path))
        winnowSelect(t(s, dir, "documents").select(col("doc_id"), col("text")))
          .select(col("doc_id"), col("gpos").as("pos"), col("ghash"))
          .write.mode("overwrite").parquet(path)
    }
    s.read.parquet(path)
  }

  /** Driver query: per-document winnowing census — gram count, window
    * count, selected-fingerprint count, xor digest of the selected
    * hashes, and selection density. Fully hash-oracled: every step is
    * in the Spark∩DuckDB dialect (windowed min with a rows frame,
    * leads, md5-prefix hashes). */
  val winnowing: Q = Q(
    "q_winnowing",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val sel = winnowStore(s, dir)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_fingerprints"),
          expr("bit_xor(ghash)").as("fp_digest"))
      val grams = docs.filter(trim(col("text")) =!= "")
        .select(col("doc_id"),
          (size(split(trim(col("text")), "\\s+")) - 2).cast("long").as("g"))
        .filter(col("g") >= 1)
        .select(col("doc_id"), col("g").as("n_grams"),
          greatest(lit(1L), col("g") - 3).as("n_windows"))
      grams.join(sel, "doc_id")
        .select(col("doc_id"), col("n_grams"), col("n_windows"),
          col("n_fingerprints"), col("fp_digest"),
          expr("(1000 * n_fingerprints) div n_windows").as("density_permille"))
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, i AS gpos, arr[i] AS tok FROM (
          SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i FROM (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
            FROM documents WHERE trim(text) <> ''))),
      grams AS (
        SELECT doc_id, gpos, CAST('0x' || substr(md5(tok || ' ' || t2 || ' ' || t3), 1, 10)
                 AS BIGINT) AS ghash,
               CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS gcnt
        FROM (
          SELECT doc_id, gpos, tok,
                 lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY gpos) AS t2,
                 lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY gpos) AS t3
          FROM toks)
        WHERE t3 IS NOT NULL),
      comb AS (
        SELECT doc_id, gpos, gcnt,
               ghash * 1048576 + (1048575 - gpos) AS comb
        FROM grams),
      wmin AS (
        SELECT doc_id, gpos, gcnt,
               min(comb) OVER (PARTITION BY doc_id ORDER BY gpos
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
        FROM comb),
      starts AS (
        SELECT doc_id, wmin FROM wmin
        WHERE gpos <= gcnt - 3 OR (gpos = 1 AND gcnt < 4)),
      sel AS (
        SELECT DISTINCT doc_id,
               1048575 - (wmin % 1048576) AS sel_pos,
               wmin // 1048576 AS ghash
        FROM starts),
      per_doc AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints,
               CAST(bit_xor(ghash) AS BIGINT) AS fp_digest
        FROM sel GROUP BY doc_id),
      gsize AS (
        SELECT doc_id, CAST(g AS BIGINT) AS n_grams,
               CAST(greatest(1, g - 3) AS BIGINT) AS n_windows
        FROM (SELECT doc_id,
                len(regexp_split_to_array(trim(text), '\s+')) - 2 AS g
              FROM documents WHERE trim(text) <> '')
        WHERE g >= 1)
      SELECT gsize.doc_id, n_grams, n_windows, n_fingerprints, fp_digest,
             CAST((1000 * n_fingerprints) // n_windows AS BIGINT)
               AS density_permille
      FROM gsize JOIN per_doc ON per_doc.doc_id = gsize.doc_id
      ORDER BY gsize.doc_id"""))

  /** CROSS-DOCUMENT MATCH SPANS at fingerprint cost — the consumer
    * join [[winnowSelect]] exists for: selected fingerprints matched
    * across document pairs, runs of matches on one alignment DIAGONAL
    * (pos_a − pos_b) merged into maximal shared spans. The same
    * evidence [[graft.llm.Dedup.dupSpans]] extracts from FULL
    * positional grams, at ~2/(w+1) of the gram volume — the winnowing
    * guarantee makes the discount safe: a true shared run selects a
    * fingerprint at least every w positions, so splitting islands at
    * gaps > w never splits a real span, and span extent is recovered
    * to within w tokens at each end.
    *
    * Stop-fingerprints: hashes selected in more than 10 documents are
    * dropped before the pair join (standard winnowing practice, and
    * the scale guard — a boilerplate gram shared by half the corpus
    * would otherwise quadratically explode the join; document
    * frequency is ONE aggregate and the cap makes per-hash fan-out
    * ≤ 10·9/2 pairs). Fully hash-oracled; top-100 pairs by longest
    * span with a unique (doc_a, doc_b) tiebreak. */
  val winnowSpans: Q = Q(
    "q_winnow_spans",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val sel = winnowStore(s, dir)
        .select(col("doc_id"), col("pos"), col("ghash"))
      val rare = sel.groupBy("ghash")
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") <= 10)
        .select("ghash")
      val fp = sel.join(rare, Seq("ghash"), "left_semi")
      val m = fp.as("a").join(fp.as("b"),
          col("a.ghash") === col("b.ghash") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          col("a.pos").as("pa"), col("b.pos").as("pb"),
          (col("a.pos") - col("b.pos")).as("diag"))
      val byDiag = Window.partitionBy("da", "db", "diag").orderBy("pa")
      val islands = m
        .withColumn("gap",
          when(col("pa") - lag(col("pa"), 1).over(byDiag) > 4L, 1L)
            .otherwise(0L))
        .withColumn("island", sum(col("gap")).over(
          byDiag.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("da", "db", "diag", "island")
        .agg((max(col("pa")) - min(col("pa")) + 3L).as("span_tokens"),
          count(lit(1)).as("n_fps"))
      islands.groupBy("da", "db")
        .agg(max(col("span_tokens")).as("longest_span_tokens"),
          count(lit(1)).as("n_islands"),
          sum(col("n_fps")).as("n_matched_fps"))
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          col("longest_span_tokens"), col("n_islands"), col("n_matched_fps"))
        .orderBy(col("longest_span_tokens").desc, col("doc_a").asc,
          col("doc_b").asc)
        .limit(100)
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, i AS gpos, arr[i] AS tok FROM (
          SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i FROM (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
            FROM documents WHERE trim(text) <> ''))),
      grams AS (
        SELECT doc_id, gpos, CAST('0x' || substr(md5(tok || ' ' || t2 || ' ' || t3), 1, 10)
                 AS BIGINT) AS ghash,
               CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS gcnt
        FROM (
          SELECT doc_id, gpos, tok,
                 lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY gpos) AS t2,
                 lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY gpos) AS t3
          FROM toks)
        WHERE t3 IS NOT NULL),
      comb AS (
        SELECT doc_id, gpos, gcnt,
               ghash * 1048576 + (1048575 - gpos) AS comb
        FROM grams),
      wmin AS (
        SELECT doc_id, gpos, gcnt,
               min(comb) OVER (PARTITION BY doc_id ORDER BY gpos
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
        FROM comb),
      starts AS (
        SELECT doc_id, wmin FROM wmin
        WHERE gpos <= gcnt - 3 OR (gpos = 1 AND gcnt < 4)),
      sel AS (
        SELECT DISTINCT doc_id,
               1048575 - (wmin % 1048576) AS pos,
               wmin // 1048576 AS ghash
        FROM starts),
      rare AS (
        SELECT ghash FROM (
          SELECT ghash, count(DISTINCT doc_id) AS df FROM sel GROUP BY ghash)
        WHERE df <= 10),
      fp AS (SELECT sel.* FROM sel JOIN rare ON rare.ghash = sel.ghash),
      m AS (
        SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa,
               a.pos - b.pos AS diag
        FROM fp a JOIN fp b
          ON a.ghash = b.ghash AND a.doc_id < b.doc_id),
      gaps AS (
        SELECT da, db, diag, pa,
               CASE WHEN pa - lag(pa, 1) OVER
                 (PARTITION BY da, db, diag ORDER BY pa) > 4
                 THEN 1 ELSE 0 END AS gap
        FROM m),
      isl AS (
        SELECT da, db, diag, pa,
               sum(gap) OVER (PARTITION BY da, db, diag ORDER BY pa
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM gaps),
      spans AS (
        SELECT da, db, diag, island,
               max(pa) - min(pa) + 3 AS span_tokens,
               count(*) AS n_fps
        FROM isl GROUP BY da, db, diag, island)
      SELECT da AS doc_a, db AS doc_b,
             CAST(max(span_tokens) AS BIGINT) AS longest_span_tokens,
             CAST(count(*) AS BIGINT) AS n_islands,
             CAST(sum(n_fps) AS BIGINT) AS n_matched_fps
      FROM spans GROUP BY da, db
      ORDER BY longest_span_tokens DESC, doc_a ASC, doc_b ASC
      LIMIT 100"""))

  /** EVAL-SET CONTAMINATION REPORT — the LLM-pipeline consumer the
    * winnowing substrate exists for: before training, every corpus is
    * audited for documents that leak the held-out evaluation set
    * (verbatim or near-verbatim), because a contaminated eval
    * silently inflates benchmark scores. [[graft.llm.Curation]]'s
    * q_contamination is the cheap ALIGNED first pass (fixed-offset
    * window fingerprints); THIS is the unaligned span-level report a
    * decontamination sweep actually acts on. A pinned slice of
    * `documents` (doc_id ≡ 0 mod 17) plays the eval set, the rest is
    * the training corpus, and the report is per-eval-doc: how many
    * corpus documents share fingerprinted spans with it, the longest
    * such span, and what fraction of its fingerprints appear in the
    * corpus (coverage ‰). Everything rides [[winnowSelect]] — the
    * winnowing guarantee (any shared run ≥ w+k−1 tokens shares a
    * selected fingerprint) is exactly the contamination-detection
    * contract, at 2/(w+1) of full-gram cost.
    *
    * PLANTED LEAK floor: the longest corpus document (max gram count,
    * min-doc_id tiebreak — deterministic in both engines) is copied
    * verbatim into the eval side at doc_id + offset, where the
    * offset is DERIVED as max(doc_id)+1 on both engines (ADVICE r16:
    * a fixed 1e6 offset collides with genuine ids once the corpus
    * reaches a million documents, silently flipping real docs to the
    * eval side — the derived offset can never collide). An exact
    * copy shares every selected fingerprint with its source on
    * diagonal 0, so its row must report coverage ≥ 900‰ and a span
    * covering most of the document — asserted in-query before any
    * row ships, the same planted-copy discipline as the dedup
    * family. The copy's fingerprints come straight from the staged
    * store (winnowing is per-document, so the verbatim copy's
    * selected set IS its source's rows id-shifted) — nothing
    * re-fingerprints.
    *
    * Stop-fingerprints are pruned at df > max(10, |fingerprinted
    * corpus docs|/50) — SCALE-RELATIVE, unlike [[winnowSpans]]'s
    * fixed 10: a fixed cap prunes legitimate leak evidence as the
    * corpus grows (at sf0.1 it cost the planted copy a third of its
    * fingerprints — measured), while 2% of the corpus keeps the join
    * fan-out bounded per hash AND keeps recall scale-stable; the
    * denominator is read from the store (distinct fingerprinted
    * docs), not another corpus scan. Fully hash-oracled: every step
    * is in the Spark∩DuckDB dialect proven by
    * q_winnowing/q_winnow_spans, and the oracle recomputes the
    * selection from scratch — staging stays invisible.
    *
    * Scale shape: the winnowing pipeline runs ONCE per application
    * ([[winnowStore]] — VERDICT r16: the inline variant recomputed
    * it three times inside this query alone); the cross-side match
    * joins only SELECTED fingerprints (≈2/(w+1) of gram volume) with
    * df-capped fan-out; islands/spans are per (eval, corpus,
    * diagonal) windows — nothing all-pairs, and driver-side only the
    * three bounded scalars (offset, source id, df cap) plus the
    * 1-row planted audit. */
  val contamination: Q = Q(
    "q_eval_contamination",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpusDocs = docs.filter(col("doc_id") % 17 =!= 0)
      val offset = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      val srcId = corpusDocs
        .orderBy(size(split(trim(col("text")), "\\s+")).desc, col("doc_id").asc)
        .limit(1).select(col("doc_id")).head().getLong(0)
      val store = winnowStore(s, dir)
      val plantedFp = store.filter(col("doc_id") === srcId)
        .select((col("doc_id") + lit(offset)).as("doc_id"), col("pos"),
          col("ghash"))
      val efp = store.filter(col("doc_id") % 17 === 0)
        .select(col("doc_id"), col("pos"), col("ghash"))
        .unionByName(plantedFp)
      val cfp0 = store.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"), col("pos"), col("ghash"))
      // scale-relative stop-fingerprint cap (a bounded driver scalar,
      // like the kcore quartile probe) — counted over the store, not
      // via another documents scan
      val dfCap = math.max(10L,
        cfp0.agg(countDistinct(col("doc_id"))).head().getLong(0) / 50L)
      val rare = cfp0.groupBy("ghash")
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") <= dfCap)
        .select("ghash")
      val cfp = cfp0.join(rare, Seq("ghash"), "left_semi")
      val m = efp.as("e").join(cfp.as("c"), col("e.ghash") === col("c.ghash"))
        .select(col("e.doc_id").as("ed"), col("c.doc_id").as("cd"),
          col("e.pos").as("pe"), (col("e.pos") - col("c.pos")).as("diag"))
      val byDiag = Window.partitionBy("ed", "cd", "diag").orderBy("pe")
      val spans = m
        .withColumn("gap",
          when(col("pe") - lag(col("pe"), 1).over(byDiag) > 4L, 1L).otherwise(0L))
        .withColumn("island", sum(col("gap")).over(
          byDiag.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("ed", "cd", "diag", "island")
        .agg((max(col("pe")) - min(col("pe")) + 3L).as("span_tokens"))
      val perDoc = spans.groupBy("ed")
        .agg(countDistinct(col("cd")).as("n_contaminators"),
          max(col("span_tokens")).as("longest_span_tokens"))
      val mf = m.groupBy("ed")
        .agg(countDistinct(col("pe")).as("matched_fp"))
      val etot = efp.groupBy(col("doc_id").as("ed"))
        .agg(count(lit(1)).as("total_fp"))
      val out = etot
        .join(mf, Seq("ed"), "left")
        .join(perDoc, Seq("ed"), "left")
        .select(col("ed").as("eval_doc"), col("total_fp"),
          coalesce(col("matched_fp"), lit(0L)).as("matched_fp"),
          coalesce(col("n_contaminators"), lit(0L)).as("n_contaminators"),
          coalesce(col("longest_span_tokens"), lit(0L)).as("longest_span_tokens"))
        .withColumn("coverage_permille",
          expr("(1000 * matched_fp) div total_fp"))
        .orderBy("eval_doc")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // planted-leak audit: 1-row bounded collect
      val audit = out.filter(col("eval_doc") >= offset).collect()
      if (audit.length != 1)
        throw new IllegalStateException(
          s"contamination audit: expected exactly 1 planted eval doc, got ${audit.length}")
      val (cov, span) = (audit(0).getAs[Long]("coverage_permille"),
        audit(0).getAs[Long]("longest_span_tokens"))
      if (cov < 900L || span < 50L)
        throw new IllegalStateException(
          s"contamination recall degraded: planted verbatim leak reported " +
            s"coverage ${cov}‰ (floor 900) / span $span tokens (floor 50)")
      out
    },
    Some("""
      WITH mx AS (SELECT max(doc_id) AS m FROM documents),
      corpus_docs AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 0),
      planted AS (
        SELECT doc_id + (SELECT m + 1 FROM mx) AS doc_id, text FROM corpus_docs
        ORDER BY len(regexp_split_to_array(trim(text), '\s+')) DESC, doc_id
        LIMIT 1),
      base AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id, text FROM planted),
      toks AS (
        SELECT doc_id, i AS gpos, arr[i] AS tok FROM (
          SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i FROM (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
            FROM base WHERE trim(text) <> ''))),
      grams AS (
        SELECT doc_id, gpos, CAST('0x' || substr(md5(tok || ' ' || t2 || ' ' || t3), 1, 10)
                 AS BIGINT) AS ghash,
               CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS gcnt
        FROM (
          SELECT doc_id, gpos, tok,
                 lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY gpos) AS t2,
                 lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY gpos) AS t3
          FROM toks)
        WHERE t3 IS NOT NULL),
      comb AS (
        SELECT doc_id, gpos, gcnt,
               ghash * 1048576 + (1048575 - gpos) AS comb
        FROM grams),
      wmin AS (
        SELECT doc_id, gpos, gcnt,
               min(comb) OVER (PARTITION BY doc_id ORDER BY gpos
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
        FROM comb),
      starts AS (
        SELECT doc_id, wmin FROM wmin
        WHERE gpos <= gcnt - 3 OR (gpos = 1 AND gcnt < 4)),
      sel AS (
        SELECT DISTINCT doc_id,
               1048575 - (wmin % 1048576) AS pos,
               wmin // 1048576 AS ghash
        FROM starts),
      efp AS (SELECT * FROM sel
              WHERE doc_id % 17 = 0 OR doc_id > (SELECT m FROM mx)),
      cfp0 AS (SELECT * FROM sel
               WHERE doc_id % 17 <> 0 AND doc_id <= (SELECT m FROM mx)),
      rare AS (
        SELECT ghash FROM (
          SELECT ghash, count(DISTINCT doc_id) AS df FROM cfp0 GROUP BY ghash)
        WHERE df <= greatest(10,
          (SELECT count(DISTINCT doc_id) FROM cfp0) // 50)),
      cfp AS (SELECT cfp0.* FROM cfp0 JOIN rare ON rare.ghash = cfp0.ghash),
      m AS (
        SELECT e.doc_id AS ed, c.doc_id AS cd, e.pos AS pe,
               e.pos - c.pos AS diag
        FROM efp e JOIN cfp c ON e.ghash = c.ghash),
      gaps AS (
        SELECT ed, cd, diag, pe,
               CASE WHEN pe - lag(pe, 1) OVER
                 (PARTITION BY ed, cd, diag ORDER BY pe) > 4
                 THEN 1 ELSE 0 END AS gap
        FROM m),
      isl AS (
        SELECT ed, cd, diag, pe,
               sum(gap) OVER (PARTITION BY ed, cd, diag ORDER BY pe
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM gaps),
      spans AS (
        SELECT ed, cd, diag, island, max(pe) - min(pe) + 3 AS span_tokens
        FROM isl GROUP BY ed, cd, diag, island),
      perdoc AS (
        SELECT ed, CAST(count(DISTINCT cd) AS BIGINT) AS n_contaminators,
               CAST(max(span_tokens) AS BIGINT) AS longest_span_tokens
        FROM spans GROUP BY ed),
      mf AS (
        SELECT ed, CAST(count(DISTINCT pe) AS BIGINT) AS matched_fp
        FROM m GROUP BY ed),
      etot AS (
        SELECT doc_id AS ed, CAST(count(*) AS BIGINT) AS total_fp
        FROM efp GROUP BY doc_id)
      SELECT etot.ed AS eval_doc, total_fp,
             CAST(coalesce(matched_fp, 0) AS BIGINT) AS matched_fp,
             CAST(coalesce(n_contaminators, 0) AS BIGINT) AS n_contaminators,
             CAST(coalesce(longest_span_tokens, 0) AS BIGINT) AS longest_span_tokens,
             CAST((1000 * coalesce(matched_fp, 0)) // total_fp AS BIGINT)
               AS coverage_permille
      FROM etot LEFT JOIN mf ON mf.ed = etot.ed
      LEFT JOIN perdoc ON perdoc.ed = etot.ed
      ORDER BY eval_doc"""))

  private val evalFpStoreLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** BATCH DECONTAMINATION — the INCREMENTAL direction of
    * [[contamination]], and the operator a production crawl pipeline
    * actually runs per ingest batch: the held-out eval set is FIXED,
    * its winnowing fingerprints are computed once and staged (the
    * [[graft.ops.Graph.coPairs]] staging device — at 100 TB the eval
    * store is built once and every incoming batch joins against it,
    * never re-fingerprinting the benchmark), and each new crawl batch
    * is audited against the store: per batch doc, how many of its
    * selected fingerprints appear in the eval set, and a keep/drop
    * decision at the pinned 500‰ coverage threshold.
    *
    * Batch construction: a pinned slice of the corpus
    * (doc_id ≡ 9 mod 16, outside the eval residue class) plays the
    * incoming crawl, plus a PLANTED verbatim copy of the longest eval
    * document at doc_id + offset (offset = max(doc_id)+1, derived on
    * both engines — ADVICE r16, same no-collision argument as
    * [[contamination]]) — a crawl doc that leaks benchmark content,
    * exactly what the operator exists to catch. Floor: the planted
    * doc must report ≥ 900‰ coverage, a shared span ≥ 50 tokens, AND
    * decision 'drop', asserted in-query. Fully hash-oracled (the
    * oracle recomputes the store side from scratch — staging must be
    * invisible).
    *
    * Eval-side stop-fingerprints are pruned at df > max(10,
    * |fingerprinted eval docs|/10) before staging (boilerplate shared
    * across a tenth of the benchmark is navigation/template text, and
    * the prune bounds the join fan-out per hash). The staged store
    * carries the rare eval fingerprints WITH their (eval_doc,
    * position) — the span evidence (VERDICT r16 item 5) needs the
    * eval-side positions to build alignment diagonals, and the drop
    * decision a pipeline audits wants the longest-shared-span length
    * next to the coverage number, not coverage alone. The per-doc
    * match count still dedups on (batch_doc, hash), so per-eval-doc
    * multiplicity never inflates coverage.
    *
    * Both sides of the match read [[winnowStore]] — nothing in this
    * query re-runs the fingerprint pipeline; the eval store build
    * itself is one filter + one aggregate over the staged frame. */
  val decontaminateBatch: Q = Q(
    "q_decontaminate_batch",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val evalDocs = docs.filter(col("doc_id") % 17 === 0)
      val offset = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      val store = winnowStore(s, dir)
      val path = graft.Staging.dir(s,
        "graft_evalfp_" + dir.replaceAll("[^A-Za-z0-9]", "_"))
      val lock = evalFpStoreLocks.computeIfAbsent(path, _ => new Object)
      lock.synchronized {
        if (!graft.Staging.ready(s, path)) {
          val evfp0 = store.filter(col("doc_id") % 17 === 0)
          val cap = math.max(10L,
            evfp0.agg(countDistinct(col("doc_id"))).head().getLong(0) / 10L)
          val rare = evfp0.groupBy("ghash")
            .agg(countDistinct(col("doc_id")).as("df"))
            .filter(col("df") <= cap)
            .select("ghash")
          evfp0.join(rare, Seq("ghash"), "left_semi")
            .select(col("doc_id").as("eval_doc"), col("pos").as("pe"),
              col("ghash"))
            .write.mode("overwrite").parquet(path)
        }
      }
      val evalStore = s.read.parquet(path)
      val srcId = evalDocs
        .orderBy(size(split(trim(col("text")), "\\s+")).desc, col("doc_id").asc)
        .limit(1).select(col("doc_id")).head().getLong(0)
      val plantedFp = store.filter(col("doc_id") === srcId)
        .select((col("doc_id") + lit(offset)).as("doc_id"), col("pos"),
          col("ghash"))
      val dfp = store
        .filter(col("doc_id") % 17 =!= 0 && col("doc_id") % 16 === 9)
        .select(col("doc_id"), col("pos"), col("ghash"))
        .unionByName(plantedFp)
      val totals = dfp.groupBy("doc_id")
        .agg(countDistinct(col("ghash")).as("total_fp"))
      val matched = dfp.select(col("doc_id"), col("ghash")).distinct()
        .join(evalStore.select("ghash").distinct(), Seq("ghash"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("matched_fp"))
      // span evidence: positional matches on alignment diagonals,
      // gap-split islands — the q_eval_contamination machinery over
      // the (batch doc, eval doc) pair space
      val m = dfp.as("d")
        .join(evalStore.as("e"), col("d.ghash") === col("e.ghash"))
        .select(col("d.doc_id").as("bd"), col("e.eval_doc").as("ed"),
          col("d.pos").as("pb"), (col("d.pos") - col("e.pe")).as("diag"))
      val byDiag = Window.partitionBy("bd", "ed", "diag").orderBy("pb")
      val spans = m
        .withColumn("gap",
          when(col("pb") - lag(col("pb"), 1).over(byDiag) > 4L, 1L)
            .otherwise(0L))
        .withColumn("island", sum(col("gap")).over(
          byDiag.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("bd", "ed", "diag", "island")
        .agg((max(col("pb")) - min(col("pb")) + 3L).as("span_tokens"))
        .groupBy("bd")
        .agg(max(col("span_tokens")).as("longest_span_tokens"))
        .withColumnRenamed("bd", "doc_id")
      val out = totals
        .join(matched, Seq("doc_id"), "left")
        .join(spans, Seq("doc_id"), "left")
        .select(col("doc_id").as("batch_doc"), col("total_fp"),
          coalesce(col("matched_fp"), lit(0L)).as("matched_fp"),
          coalesce(col("longest_span_tokens"), lit(0L))
            .as("longest_span_tokens"))
        .withColumn("coverage_permille",
          expr("(1000 * matched_fp) div total_fp"))
        .withColumn("decision",
          when(col("coverage_permille") >= 500, "drop").otherwise("keep"))
        .orderBy("batch_doc")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val audit = out.filter(col("batch_doc") >= offset).collect()
      if (audit.length != 1)
        throw new IllegalStateException(
          s"decontamination audit: expected 1 planted batch doc, got ${audit.length}")
      val (cov, span, dec) = (audit(0).getAs[Long]("coverage_permille"),
        audit(0).getAs[Long]("longest_span_tokens"),
        audit(0).getAs[String]("decision"))
      if (cov < 900L || span < 50L || dec != "drop")
        throw new IllegalStateException(
          s"decontamination recall degraded: planted verbatim eval leak " +
            s"reported ${cov}‰ / span $span tokens / '$dec' " +
            s"(floor 900‰ / 50 / 'drop')")
      out
    },
    Some("""
      WITH mx AS (SELECT max(doc_id) AS m FROM documents),
      eval_docs AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0),
      delta_base AS (
        SELECT doc_id, text FROM documents
        WHERE doc_id % 17 <> 0 AND doc_id % 16 = 9),
      planted AS (
        SELECT doc_id + (SELECT m + 1 FROM mx) AS doc_id, text FROM eval_docs
        ORDER BY len(regexp_split_to_array(trim(text), '\s+')) DESC, doc_id
        LIMIT 1),
      base AS (
        SELECT doc_id, text FROM eval_docs
        UNION ALL SELECT doc_id, text FROM delta_base
        UNION ALL SELECT doc_id, text FROM planted),
      toks AS (
        SELECT doc_id, i AS gpos, arr[i] AS tok FROM (
          SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i FROM (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
            FROM base WHERE trim(text) <> ''))),
      grams AS (
        SELECT doc_id, gpos, CAST('0x' || substr(md5(tok || ' ' || t2 || ' ' || t3), 1, 10)
                 AS BIGINT) AS ghash,
               CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS gcnt
        FROM (
          SELECT doc_id, gpos, tok,
                 lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY gpos) AS t2,
                 lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY gpos) AS t3
          FROM toks)
        WHERE t3 IS NOT NULL),
      comb AS (
        SELECT doc_id, gpos, gcnt,
               ghash * 1048576 + (1048575 - gpos) AS comb
        FROM grams),
      wmin AS (
        SELECT doc_id, gpos, gcnt,
               min(comb) OVER (PARTITION BY doc_id ORDER BY gpos
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
        FROM comb),
      starts AS (
        SELECT doc_id, wmin FROM wmin
        WHERE gpos <= gcnt - 3 OR (gpos = 1 AND gcnt < 4)),
      sel AS (
        SELECT DISTINCT doc_id,
               1048575 - (wmin % 1048576) AS pos,
               wmin // 1048576 AS ghash
        FROM starts),
      evfp0 AS (
        SELECT * FROM sel
        WHERE doc_id % 17 = 0 AND doc_id <= (SELECT m FROM mx)),
      rare AS (
        SELECT ghash FROM (
          SELECT ghash, count(DISTINCT doc_id) AS df FROM evfp0 GROUP BY ghash)
        WHERE df <= greatest(10,
          (SELECT count(DISTINCT doc_id) FROM evfp0) // 10)),
      est AS (
        SELECT evfp0.doc_id AS ed, evfp0.pos AS pe, evfp0.ghash
        FROM evfp0 JOIN rare ON rare.ghash = evfp0.ghash),
      dfp AS (
        SELECT * FROM sel
        WHERE doc_id % 17 <> 0 OR doc_id > (SELECT m FROM mx)),
      mh AS (
        SELECT DISTINCT d.doc_id, d.ghash
        FROM dfp d JOIN (SELECT DISTINCT ghash FROM est) e
          ON d.ghash = e.ghash),
      mc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS matched_fp
             FROM mh GROUP BY doc_id),
      dt AS (SELECT doc_id, CAST(count(DISTINCT ghash) AS BIGINT) AS total_fp
             FROM dfp GROUP BY doc_id),
      pm AS (
        SELECT d.doc_id AS bd, e.ed, d.pos AS pb, d.pos - e.pe AS diag
        FROM dfp d JOIN est e ON d.ghash = e.ghash),
      gaps AS (
        SELECT bd, ed, diag, pb,
               CASE WHEN pb - lag(pb, 1) OVER
                 (PARTITION BY bd, ed, diag ORDER BY pb) > 4
                 THEN 1 ELSE 0 END AS gap
        FROM pm),
      isl AS (
        SELECT bd, ed, diag, pb,
               sum(gap) OVER (PARTITION BY bd, ed, diag ORDER BY pb
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM gaps),
      spans AS (
        SELECT bd, ed, diag, island, max(pb) - min(pb) + 3 AS span_tokens
        FROM isl GROUP BY bd, ed, diag, island),
      sp AS (
        SELECT bd AS doc_id,
               CAST(max(span_tokens) AS BIGINT) AS longest_span_tokens
        FROM spans GROUP BY bd)
      SELECT dt.doc_id AS batch_doc, total_fp,
             CAST(coalesce(matched_fp, 0) AS BIGINT) AS matched_fp,
             CAST(coalesce(longest_span_tokens, 0) AS BIGINT)
               AS longest_span_tokens,
             CAST((1000 * coalesce(matched_fp, 0)) // total_fp AS BIGINT)
               AS coverage_permille,
             CASE WHEN (1000 * coalesce(matched_fp, 0)) // total_fp >= 500
                  THEN 'drop' ELSE 'keep' END AS decision
      FROM dt LEFT JOIN mc ON mc.doc_id = dt.doc_id
      LEFT JOIN sp ON sp.doc_id = dt.doc_id
      ORDER BY batch_doc"""))

  /** Vocabulary building: corpus-wide token frequencies, top-100.
    * The tokenizer-training / vocab-pruning primitive. Shape: explode
    * → two-level hash aggregate — the map-side partial collapses each
    * task to its DISTINCT tokens (Zipf makes that tiny relative to
    * token count), so the shuffle carries vocabulary, not corpus;
    * top-100 is TakeOrderedAndProject. For the skewed-head-token
    * worst case at 100 TB the CMS variant ([[graft.ops.Sketches]]
    * heavy hitters) bounds shuffle at sketch size. */
  val vocabTopK: Q = Q(
    "q_vocab_topk",
    (s, dir) =>
      t(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
        .groupBy("tok")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc)
        .limit(100),
    Some("""
      SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM documents
      ) GROUP BY tok ORDER BY cnt DESC, tok ASC LIMIT 100"""))

  /** Out-of-vocabulary rate per document against the corpus's own
    * top-20 vocabulary — the tokenizer-coverage / quality-gate metric
    * (high OOV ⇒ noise, wrong language, or tokenizer mismatch).
    *
    * Two passes over the token stream (vocab build, then membership),
    * both map-side combinable; the vocabulary is top-K by
    * construction, so its join side is broadcast — membership never
    * shuffles the corpus. The rate divides two exact integers once,
    * so the double is bit-identical across engines. A production run
    * persists the exploded token frame to share it between the
    * passes; at harness scale recomputing the split is cheaper than
    * the cache write. */
  val oovRate: Q = Q(
    "q_oov_rate",
    (s, dir) => {
      val tokens = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      val vocab = tokens.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc).limit(20)
        .select(col("tok").as("v_tok"))
      tokens.join(broadcast(vocab), col("tok") === col("v_tok"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("v_tok").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
        .orderBy("doc_id")
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents),
      v AS (
        SELECT tok AS v_tok FROM (
          SELECT tok, count(*) AS cnt FROM tok GROUP BY tok
          ORDER BY cnt DESC, tok ASC LIMIT 20))
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN v_tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             CAST(sum(CASE WHEN v_tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE) /
               count(*) AS oov_rate
      FROM tok LEFT JOIN v ON tok = v_tok
      GROUP BY doc_id ORDER BY doc_id"""))

  /** Per-document surprisal under a corpus-derived add-one-smoothed
    * unigram language model — the classic perplexity-based quality
    * filter (low-probability documents are noise; abnormally
    * high-probability ones are boilerplate). Two passes: (1) build
    * the LM — token counts plus one (vocab_size, total_tokens) row
    * cross-joined in as a 1-row broadcast; (2) score — every token
    * joins its corpus probability and the per-token surprisal
    * -ln p(tok) sums per document.
    *
    * Scale shape: the LM build is a map-side-combinable count; the
    * scoring join keys on the token, so a skewed stopword key is the
    * risk at 100 TB — AQE skew-split handles it (at harness scale the
    * vocab side auto-broadcasts and there is no corpus shuffle at
    * all). The surprisal is rounded to integer micro-nats PER TOKEN
    * before summing, so the per-doc totals are exact BIGINTs and
    * hash-portably comparable; the readable mean divides the exact
    * sum once. */
  val lmSurprisal: Q = Q(
    "q_lm_surprisal",
    (s, dir) => {
      val tokens = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      val counts = tokens.groupBy("tok").agg(count(lit(1)).as("cnt"))
      val stats = counts.agg(count(lit(1)).as("vocab_n"), sum(col("cnt")).as("total_n"))
      val lm = counts.crossJoin(broadcast(stats))
        .select(col("tok").as("lm_tok"),
          round(-log((col("cnt") + lit(1.0)) /
            (col("total_n") + col("vocab_n")).cast("double")) * 1e6, 0)
            .cast("long").as("surprisal_micro"))
      tokens.join(lm, col("tok") === col("lm_tok"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("surprisal_micro")).as("total_surprisal_micro"))
        .select(col("doc_id"), col("n_tokens"), col("total_surprisal_micro"),
          (col("total_surprisal_micro").cast("double") / col("n_tokens") / 1e6)
            .as("mean_surprisal_nats"))
        .orderBy("doc_id")
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents),
      counts AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY tok),
      stats AS (
        SELECT CAST(count(*) AS BIGINT) AS vocab_n,
               CAST(sum(cnt) AS BIGINT) AS total_n FROM counts),
      lm AS (
        SELECT tok AS lm_tok,
               CAST(round(-ln((cnt + 1.0) / CAST(total_n + vocab_n AS DOUBLE)) * 1e6) AS BIGINT)
                 AS surprisal_micro
        FROM counts, stats)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(surprisal_micro) AS BIGINT) AS total_surprisal_micro,
             CAST(sum(surprisal_micro) AS DOUBLE) / count(*) / 1e6 AS mean_surprisal_nats
      FROM tok JOIN lm ON tok = lm_tok
      GROUP BY doc_id ORDER BY doc_id"""))

  /** N-gram novelty: the share of a doc's DISTINCT token 3-grams
    * first seen in that doc, under doc_id arrival order — the
    * contribution-scoring view of near-duplication (a doc that only
    * re-states earlier corpus content scores ~0). A gram's first
    * owner is min(doc_id); one grouped aggregate over the distinct
    * (doc, gram) frame plus one gram-keyed join back — the shuffle
    * carries the corpus VOCABULARY of grams, never the corpus text,
    * and the join key is the gram hash, so AQE's skew split handles
    * stop-gram hot keys at scale. Emitted as exact integer counts +
    * a permille so the hash is float-free. */
  def ngramNoveltyOf(docs: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val byPos = Window.partitionBy("doc_id").orderBy("pos")
      // consecutive-token 3-grams over the empty-filtered, renumbered
      // token stream; the gram STRING is the cross-engine key (a
      // 100 TB deployment would key on xxhash64(gram) to shuffle
      // 8 bytes/gram — the counts are identical, but the oracle
      // needs the same key text on both engines)
      val grams = docs
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
        .filter(col("tok") =!= "")
        .withColumn("g2", lead(col("tok"), 1).over(byPos))
        .withColumn("g3", lead(col("tok"), 2).over(byPos))
        .filter(col("g3").isNotNull)
        .select(col("doc_id"), concat_ws(" ", col("tok"), col("g2"), col("g3")).as("gram"))
        .distinct()
      val firstOwner = grams.groupBy("gram").agg(min(col("doc_id")).as("first_doc"))
      grams.join(firstOwner, Seq("gram"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("total_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("novel_grams"))
        .withColumn("novelty_permille",
          round(col("novel_grams") * lit(1000.0) / col("total_grams"), 0).cast("long"))
        .select("doc_id", "total_grams", "novel_grams", "novelty_permille")
        .orderBy("doc_id")
  }

  val ngramNovelty: Q = Q(
    "q_ngram_novelty",
    (s, dir) => ngramNoveltyOf(t(s, dir, "documents")),
    Some("""
      WITH tok AS (
        SELECT doc_id, t AS tok,
               row_number() OVER (PARTITION BY doc_id ORDER BY o) AS i
        FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t,
                     generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) AS o
              FROM documents)
        WHERE t <> ''),
      grams AS (
        SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS gram
        FROM tok a
        JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
      first_owner AS (SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram)
      SELECT g.doc_id,
             CAST(count(*) AS BIGINT) AS total_grams,
             CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS novel_grams,
             CAST(round(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) * 1000.0 / count(*)) AS BIGINT) AS novelty_permille
      FROM grams g JOIN first_owner f ON g.gram = f.gram
      GROUP BY g.doc_id ORDER BY g.doc_id"""))

  /** Top-p (nucleus) vocabulary: the smallest count-descending token
    * prefix covering ≥90% of corpus token mass — the truncation rule
    * tokenizer-vocabulary builds and nucleus sampling share. A token
    * is in the nucleus iff the cumulative mass BEFORE it is under the
    * ⌈0.9·total⌉ target (so the boundary token that crosses the
    * target is included, and nothing after it).
    *
    * Scale shape: the corpus collapses to the vocabulary table in one
    * two-level aggregate (shuffle carries distinct tokens); the rank
    * and cumulative mass then come from
    * [[graft.ops.Ranks.globalOrder]]'s two-level prefix scan
    * (range-partitioned sort + local running sum + broadcast
    * partition offsets) rather than an unpartitioned window — a real
    * tokenizer vocabulary is 10⁷ rows, and a single-task cumulative
    * window over it is the same scale defect as a corpus-sized one
    * (guarded in PlanSpec). Everything is exact BIGINT token counts,
    * so the prefix boundary is deterministic. */
  val vocabNucleus: Q = Q(
    "q_vocab_nucleus",
    (s, dir) => {
      val counts = t(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      val tot = counts.agg(sum(col("cnt")).as("n_tot"))
      graft.ops.Ranks.globalOrder(counts,
          Seq(col("cnt").desc, col("tok").asc), "rank",
          runningSum = Some((col("cnt"), "cum")))
        .crossJoin(broadcast(tot))
        .filter(col("cum") - col("cnt") < expr("(9 * n_tot + 9) div 10"))
        .select(col("rank"), col("tok"), col("cnt"), col("cum"))
        .orderBy("rank")
    },
    Some("""
      WITH counts AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM (
          SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM documents
        ) GROUP BY tok),
      tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_tot FROM counts),
      ranked AS (
        SELECT tok, cnt,
               CAST(row_number() OVER (ORDER BY cnt DESC, tok ASC) AS BIGINT) AS rank,
               CAST(sum(cnt) OVER (ORDER BY cnt DESC, tok ASC
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM counts)
      SELECT rank, tok, cnt, cum
      FROM ranked CROSS JOIN tot
      WHERE cum - cnt < (9 * n_tot + 9) // 10
      ORDER BY rank"""))

  /** Distribution-shift detection between two corpus shards: add-1
    * smoothed unigram KL divergence in BOTH directions — the "did
    * this ingest batch drift from the reference corpus" gate a
    * training pipeline runs before mixing new data in.
    *
    * Shards come from an independent md5 coin on doc_id (hex chars
    * 13–14; chars 1–12 are allocated to the split/weighted/mixture/
    * temperature coins), so shard membership is a pure function of
    * the id on any engine. Determinism follows the [[lmSurprisal]]
    * recipe: all numerators/denominators stay exact BIGINTs, each
    * token contributes ONE rounded micro-nat term
    * round(1e6 · p̂ · ln(ratio of BIGINT products)), and the KL totals
    * are exact integer sums of those terms. One token-level shuffle
    * (the per-token shard counts aggregate in a single pass via
    * conditional counts); the per-token KL terms join only against a
    * broadcast 1-row stats frame. Scale note: the BIGINT cross
    * products (ca+1)·(Nb+V) bound the token count at ~3·10⁹ per shard
    * before overflow; past that, rearrange to ln-sums
    * (ln(ca+1)+ln(Nb+V)−…) at the cost of three extra roundings. */
  val klDivergence: Q = Q(
    "q_kl_divergence",
    (s, dir) => {
      val hex = md5(col("doc_id").cast("string").cast("binary"))
      val shard = (ascii(substring(hex, 13, 1)) * 256 +
        ascii(substring(hex, 14, 1))) % 2
      val toks = t(s, dir, "documents")
        .select(shard.as("shard"), explode(tokens(col("text"))).as("tok"))
      val counts = toks.groupBy("tok").agg(
        count(when(col("shard") === 0, 1)).as("ca"),
        count(when(col("shard") === 1, 1)).as("cb"))
      val stats = counts.agg(count(lit(1)).as("vocab_n"),
        sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      val terms = counts.crossJoin(broadcast(stats))
        .select(col("vocab_n"), col("na"), col("nb"),
          round(log(((col("ca") + 1) * (col("nb") + col("vocab_n"))).cast("double") /
              ((col("cb") + 1) * (col("na") + col("vocab_n"))).cast("double")) *
            ((col("ca") + 1).cast("double") / (col("na") + col("vocab_n")).cast("double")) *
            1e6, 0).cast("long").as("t_ab"),
          round(log(((col("cb") + 1) * (col("na") + col("vocab_n"))).cast("double") /
              ((col("ca") + 1) * (col("nb") + col("vocab_n"))).cast("double")) *
            ((col("cb") + 1).cast("double") / (col("nb") + col("vocab_n")).cast("double")) *
            1e6, 0).cast("long").as("t_ba"))
      terms.groupBy("vocab_n", "na", "nb")
        .agg(sum(col("t_ab")).as("kl_ab_micro"), sum(col("t_ba")).as("kl_ba_micro"))
        .select(col("vocab_n"), col("na"), col("nb"),
          col("kl_ab_micro"), col("kl_ba_micro"),
          (col("kl_ab_micro").cast("double") / 1e6).as("kl_ab_nats"),
          (col("kl_ba_micro").cast("double") / 1e6).as("kl_ba_nats"))
    },
    Some("""
      WITH tok AS (
        SELECT (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 13, 1)) * 256 +
                ascii(substr(md5(CAST(doc_id AS VARCHAR)), 14, 1))) % 2 AS shard,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents),
      counts AS (
        SELECT tok,
               CAST(count(CASE WHEN shard = 0 THEN 1 END) AS BIGINT) AS ca,
               CAST(count(CASE WHEN shard = 1 THEN 1 END) AS BIGINT) AS cb
        FROM tok GROUP BY tok),
      stats AS (
        SELECT CAST(count(*) AS BIGINT) AS vocab_n,
               CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
        FROM counts),
      terms AS (
        SELECT vocab_n, na, nb,
               CAST(round(ln(CAST((ca + 1) * (nb + vocab_n) AS DOUBLE) /
                              CAST((cb + 1) * (na + vocab_n) AS DOUBLE)) *
                          (CAST(ca + 1 AS DOUBLE) / CAST(na + vocab_n AS DOUBLE)) *
                          1e6) AS BIGINT) AS t_ab,
               CAST(round(ln(CAST((cb + 1) * (na + vocab_n) AS DOUBLE) /
                              CAST((ca + 1) * (nb + vocab_n) AS DOUBLE)) *
                          (CAST(cb + 1 AS DOUBLE) / CAST(nb + vocab_n AS DOUBLE)) *
                          1e6) AS BIGINT) AS t_ba
        FROM counts CROSS JOIN stats)
      SELECT vocab_n, na, nb,
             CAST(sum(t_ab) AS BIGINT) AS kl_ab_micro,
             CAST(sum(t_ba) AS BIGINT) AS kl_ba_micro,
             CAST(sum(t_ab) AS DOUBLE) / 1e6 AS kl_ab_nats,
             CAST(sum(t_ba) AS DOUBLE) / 1e6 AS kl_ba_nats
      FROM terms GROUP BY vocab_n, na, nb"""))

  /** Held-out perplexity — the non-leaky counterpart of
    * [[lmSurprisal]] (which scores in-sample): the add-1 unigram LM
    * trains on the TRAIN shard of the canonical 80/10/10 split
    * ([[Sampling.hashBucket]] < 80, the same coin as
    * q_train_test_split), and scores only the TEST shard (bucket ≥
    * 90). Unseen test tokens hit the smoothing floor 1/(N+V) and are
    * counted as OOV — the per-doc report (tokens, OOV, total/mean
    * surprisal) is THE quality gate for a corpus refresh: a drifting
    * ingest shows up as rising held-out surprisal before any model
    * ever trains on it.
    *
    * Determinism: the [[lmSurprisal]] micro-nat recipe (one rounded
    * integer per token, BIGINT sums; the mean is derived from exact
    * integers). Scale: LM counts aggregate the train shard once
    * (shuffle carries vocabulary); scoring joins test tokens against
    * the vocabulary-sized LM frame. */
  val heldoutPerplexity: Q = Q(
    "q_heldout_perplexity",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("b", Sampling.hashBucket(col("doc_id")))
      val trainToks = docs.filter(col("b") < 80)
        .select(explode(tokens(col("text"))).as("tok"))
      val counts = trainToks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      val stats = counts.agg(count(lit(1)).as("vocab_n"), sum(col("cnt")).as("total_n"))
      val testToks = docs.filter(col("b") >= 90)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      testToks
        .join(counts.withColumnRenamed("tok", "lm_tok"),
          col("tok") === col("lm_tok"), "left")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          when(col("cnt").isNull, 1L).otherwise(0L).as("oov"),
          round(-log((coalesce(col("cnt"), lit(0L)) + lit(1.0)) /
            (col("total_n") + col("vocab_n")).cast("double")) * 1e6, 0)
            .cast("long").as("surprisal_micro"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("oov")).as("n_oov"),
          sum(col("surprisal_micro")).as("total_surprisal_micro"))
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          col("total_surprisal_micro"),
          (col("total_surprisal_micro").cast("double") / col("n_tokens") / 1e6)
            .as("mean_surprisal_nats"))
        .orderBy("doc_id")
    },
    Some("""
      WITH bucketed AS (
        SELECT doc_id, text,
               (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256 +
                ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100 AS b
        FROM documents),
      train_tok AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM bucketed WHERE b < 80),
      counts AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM train_tok GROUP BY tok),
      stats AS (
        SELECT CAST(count(*) AS BIGINT) AS vocab_n,
               CAST(sum(cnt) AS BIGINT) AS total_n FROM counts),
      test_tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM bucketed WHERE b >= 90),
      scored AS (
        SELECT t.doc_id,
               CASE WHEN c.cnt IS NULL THEN 1 ELSE 0 END AS oov,
               CAST(round(-ln((coalesce(c.cnt, 0) + 1.0) /
                 CAST(total_n + vocab_n AS DOUBLE)) * 1e6) AS BIGINT) AS surprisal_micro
        FROM test_tok t LEFT JOIN counts c ON t.tok = c.tok CROSS JOIN stats)
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(oov) AS BIGINT) AS n_oov,
             CAST(sum(surprisal_micro) AS BIGINT) AS total_surprisal_micro,
             CAST(sum(surprisal_micro) AS DOUBLE) / count(*) / 1e6 AS mean_surprisal_nats
      FROM scored GROUP BY doc_id ORDER BY doc_id"""))

  /** Held-out CONDITIONAL perplexity under an add-one-smoothed bigram
    * LM — the minimal n>1 form of the CCNet/KenLM fluency filter
    * ([[heldoutPerplexity]]'s unigram model scores word frequency;
    * this scores word ORDER: a shuffled document keeps its unigram
    * surprisal but blows up its bigram surprisal). LM trained on the
    * 80% hash-bucket train shard, scored on the held-out test shard:
    * P(w2|w1) = (c(w1,w2)+1) / (c(w1·)+V), where c(w1·) counts w1 as
    * a bigram PREFIX in train and V is the train token vocabulary.
    *
    * Scale shape: both count tables are train-vocabulary-sized
    * map-side-combinable aggregates; scoring joins key on the bigram
    * / prefix token (AQE skew-split for stopword prefixes; at harness
    * scale both sides auto-broadcast). Per-bigram terms are rounded
    * to integer micro-nats before summing — per-doc totals are exact
    * BIGINTs, one IEEE division at the end (the established
    * both-engines contract). */
  val bigramPerplexity: Q = Q(
    "q_lm_bigram",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("b", Sampling.hashBucket(col("doc_id")))
      def bigramFrame(df: DataFrame): DataFrame =
        df.select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
          .where(size(col("w")) >= 2)
          .select(col("doc_id"),
            explode(transform(sequence(lit(0), size(col("w")) - 2),
              i => struct(
                concat_ws(" ", slice(col("w"), i + lit(1), lit(2))).as("bg"),
                element_at(col("w"), i + lit(1)).as("w1")))).as("e"))
          .select(col("doc_id"), col("e.bg").as("bg"), col("e.w1").as("w1"))
      val trainBg = bigramFrame(docs.filter(col("b") < 80))
      val c12 = trainBg.groupBy("bg").agg(count(lit(1)).as("c12"))
      val c1 = trainBg.groupBy("w1").agg(count(lit(1)).as("c1"))
        .withColumnRenamed("w1", "p1")
      val vstats = docs.filter(col("b") < 80)
        .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
        .agg(countDistinct(col("tok")).as("vocab_n"))
      bigramFrame(docs.filter(col("b") >= 90))
        .join(c12, Seq("bg"), "left")
        .join(c1, col("w1") === col("p1"), "left")
        .crossJoin(broadcast(vstats))
        .select(col("doc_id"),
          round(-log((coalesce(col("c12"), lit(0L)) + lit(1.0)) /
            (coalesce(col("c1"), lit(0L)) + col("vocab_n")).cast("double")) * 1e6, 0)
            .cast("long").as("surprisal_micro"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("surprisal_micro")).as("total_surprisal_micro"))
        .select(col("doc_id"), col("n_bigrams"), col("total_surprisal_micro"),
          (col("total_surprisal_micro").cast("double") / col("n_bigrams") / 1e6)
            .as("mean_surprisal_nats"))
        .orderBy("doc_id")
    },
    Some("""
      WITH bucketed AS (
        SELECT doc_id, text,
               (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256 +
                ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100 AS b
        FROM documents),
      trainw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                 FROM bucketed WHERE b < 80),
      testw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                FROM bucketed WHERE b >= 90),
      trbg AS (SELECT t.doc_id, t.w[s.k+1] || ' ' || t.w[s.k+2] AS bg,
                      t.w[s.k+1] AS w1
               FROM trainw t, unnest(generate_series(0, len(t.w) - 2)) AS s(k)
               WHERE len(t.w) >= 2),
      c12 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c12 FROM trbg GROUP BY bg),
      c1 AS (SELECT w1 AS p1, CAST(count(*) AS BIGINT) AS c1 FROM trbg GROUP BY w1),
      vs AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab_n
             FROM (SELECT unnest(w) AS tok FROM trainw)),
      tsbg AS (SELECT t.doc_id, t.w[s.k+1] || ' ' || t.w[s.k+2] AS bg,
                      t.w[s.k+1] AS w1
               FROM testw t, unnest(generate_series(0, len(t.w) - 2)) AS s(k)
               WHERE len(t.w) >= 2),
      scored AS (
        SELECT t.doc_id,
               CAST(round(-ln((coalesce(c12.c12, 0) + 1.0) /
                 CAST(coalesce(c1.c1, 0) + vocab_n AS DOUBLE)) * 1e6) AS BIGINT)
                 AS surprisal_micro
        FROM tsbg t LEFT JOIN c12 USING (bg) LEFT JOIN c1 ON t.w1 = c1.p1
        CROSS JOIN vs)
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(surprisal_micro) AS BIGINT) AS total_surprisal_micro,
             CAST(sum(surprisal_micro) AS DOUBLE) / count(*) / 1e6 AS mean_surprisal_nats
      FROM scored GROUP BY doc_id ORDER BY doc_id"""))

  /** Per-document DEFLATE compression ratio — the compressibility
    * quality signal the Gopher/RefinedWeb pipelines use alongside the
    * rule-based gates: highly compressible text is boilerplate or
    * repetition (the signal catches structures n-gram ratios miss,
    * e.g. long-period repeats), near-incompressible text is noise or
    * binary junk. Ratio in permille of the raw UTF-8 size, flag below
    * 300‰.
    *
    * One Deflater per PARTITION, reset per row — the codec-init shape
    * a JNI compressor needs at 100 TB; the scan is embarrassingly
    * parallel and shuffles only (id, 3 longs).
    *
    * No DuckDB oracle (no deflate in SQL) → rows-only, so the query
    * SELF-CALIBRATES with two planted docs: id 2M is "spam "×400
    * (must compress below 150‰) and id 2M+1 is 2000 chars of md5 hex
    * stream (must stay above 400‰). Both floors throw into the
    * driver's err field if the codec path breaks; real-corpus rows
    * must land strictly between raw-size sanity bounds. */
  val compressRatio: Q = Q(
    "q_compress_ratio",
    (s, dir) => {
      import s.implicits._
      val md = java.security.MessageDigest.getInstance("MD5")
      val hexStream = (0 until 63).map(i =>
        md.digest(s"graftnoise$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString).mkString
      val planted = Seq(
        (2000000L, "spam " * 400),
        (2000001L, hexStream)).toDF("doc_id", "text")
      val out = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .unionByName(planted)
        .as[(Long, String)]
        .mapPartitions { it =>
          // per-partition codec init (reset per row), the JNI shape
          val deflater = new java.util.zip.Deflater(6)
          val buf = new Array[Byte](1 << 16)
          it.map { case (id, text) =>
            val raw = text.getBytes("UTF-8")
            deflater.reset()
            deflater.setInput(raw)
            deflater.finish()
            var comp = 0L
            while (!deflater.finished()) comp += deflater.deflate(buf)
            (id, raw.length.toLong, comp, 1000L * comp / math.max(1, raw.length))
          }
        }
        .toDF("doc_id", "raw_bytes", "comp_bytes", "ratio_permille")
        .withColumn("boilerplate_flag", col("ratio_permille") < 300)
        .orderBy("doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val row = out.agg(
        max(when(col("doc_id") === 2000000L, col("ratio_permille"))),
        max(when(col("doc_id") === 2000001L, col("ratio_permille"))),
        count(when(col("ratio_permille") <= 0 ||
          col("comp_bytes") > col("raw_bytes") + 64, 1))).head()
      if (row.getLong(0) >= 150)
        throw new IllegalStateException(
          s"deflate floor broken: repetitive plant compressed to ${row.getLong(0)}‰ (≥150)")
      if (row.getLong(1) <= 400)
        throw new IllegalStateException(
          s"deflate ceiling broken: noise plant compressed to ${row.getLong(1)}‰ (≤400)")
      if (row.getLong(2) != 0)
        throw new IllegalStateException(
          s"${row.getLong(2)} docs outside the sane envelope " +
            "(positive ratio, compressed ≤ raw + 64B stored-block overhead)")
      out
    },
    None)

  /** Spearman rank correlation between two document quality signals
    * (length in chars vs unigram-LM total surprisal) — the standard
    * check that a cheap signal can proxy an expensive one before you
    * drop the expensive one from the pipeline. ρ = 1 − 6·Σd²/(n³−n)
    * over PERMUTATION ranks (unique doc_id tiebreak, mirrored by the
    * oracle's ROW_NUMBER — no average-rank ties to float over).
    *
    * Both rankings run on [[graft.ops.Ranks.globalOrder]] — the
    * distributed two-level rank (range partition → local window →
    * P-row offset scan), so NO corpus-sized single-task window
    * appears (the registry sweep enforces this). Σd² is an exact
    * BIGINT (≤ n³ < 2⁵³), so the one double division at the end is
    * bit-identical cross-engine. */
  val spearman: Q = Q(
    "q_spearman_rank",
    (s, dir) => {
      val base = lmSurprisal.fn(s, dir)
        .join(t(s, dir, "documents").select(col("doc_id"), col("n_chars")), "doc_id")
        .select(col("doc_id"), col("n_chars"), col("total_surprisal_micro"))
      val r1 = graft.ops.Ranks.globalOrder(base,
        Seq(col("n_chars").asc, col("doc_id").asc), "r_chars")
      val r2 = graft.ops.Ranks.globalOrder(
        r1.select(col("doc_id"), col("total_surprisal_micro"), col("r_chars")),
        Seq(col("total_surprisal_micro").asc, col("doc_id").asc), "r_surprisal")
      r2.select((col("r_chars") - col("r_surprisal")).as("d")).agg(
          count(lit(1)).as("n"),
          sum(col("d") * col("d")).as("sum_d2"))
        .select(col("n"), col("sum_d2"),
          (lit(1.0) - lit(6.0) * col("sum_d2") /
            (col("n") * col("n") * col("n") - col("n")).cast("double")).as("spearman"))
    },
    Some("""
      WITH lm_base AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents),
      counts AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM lm_base GROUP BY tok),
      stats AS (
        SELECT CAST(count(*) AS BIGINT) AS vocab_n,
               CAST(sum(cnt) AS BIGINT) AS total_n FROM counts),
      lm AS (
        SELECT tok AS lm_tok,
               CAST(round(-ln((cnt + 1.0) / CAST(total_n + vocab_n AS DOUBLE)) * 1e6) AS BIGINT)
                 AS surprisal_micro
        FROM counts, stats),
      per_doc AS (
        SELECT doc_id, CAST(sum(surprisal_micro) AS BIGINT) AS total_surprisal_micro
        FROM lm_base JOIN lm ON tok = lm_tok GROUP BY doc_id),
      ranked AS (
        SELECT d.doc_id,
               CAST(row_number() OVER (ORDER BY d.n_chars, d.doc_id) AS BIGINT) AS r_chars,
               CAST(row_number() OVER (ORDER BY p.total_surprisal_micro, d.doc_id) AS BIGINT) AS r_surprisal
        FROM documents d JOIN per_doc p USING (doc_id))
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum((r_chars - r_surprisal) * (r_chars - r_surprisal)) AS BIGINT) AS sum_d2,
             1.0 - 6.0 * sum((r_chars - r_surprisal) * (r_chars - r_surprisal)) /
               CAST(count(*) * count(*) * count(*) - count(*) AS DOUBLE) AS spearman
      FROM ranked"""))

  /** Corpus unigram entropy + effective vocabulary: H = −Σ p ln p
    * over the token distribution, and exp(H) — "how many tokens the
    * corpus behaves like it has" — the diversity metric that drops
    * when dedup misses boilerplate or a crawl loops (Zipf corpora sit
    * far below |V|; a collapsing exp(H) flags repetition before eye-
    * balling ever would). Companion to [[klDivergence]]: KL compares
    * two corpora, entropy summarizes one.
    *
    * Same micro-nat recipe: one rounded integer term per VOCABULARY
    * entry (round(1e6·(cnt/N)·ln(N/cnt)) — all inputs exact BIGINTs),
    * entropy is their exact integer sum, the nats/effective-vocab
    * doubles derive from that integer. One token aggregate (shuffle
    * carries vocabulary), one 1-row stats broadcast. */
  val unigramEntropy: Q = Q(
    "q_unigram_entropy",
    (s, dir) => {
      val counts = t(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      val stats = counts.agg(count(lit(1)).as("vocab_n"), sum(col("cnt")).as("total_n"))
      counts.crossJoin(broadcast(stats))
        .select(col("vocab_n"), col("total_n"),
          round((col("cnt").cast("double") / col("total_n").cast("double")) *
            log(col("total_n").cast("double") / col("cnt").cast("double")) * 1e6, 0)
            .cast("long").as("term_micro"))
        .groupBy("vocab_n", "total_n")
        .agg(sum(col("term_micro")).as("entropy_micro"))
        .select(col("vocab_n"), col("total_n"), col("entropy_micro"),
          (col("entropy_micro").cast("double") / 1e6).as("entropy_nats"),
          exp(col("entropy_micro").cast("double") / 1e6).as("effective_vocab"))
    },
    Some("""
      WITH counts AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM (
          SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
          FROM documents) GROUP BY tok),
      stats AS (
        SELECT CAST(count(*) AS BIGINT) AS vocab_n,
               CAST(sum(cnt) AS BIGINT) AS total_n FROM counts),
      terms AS (
        SELECT vocab_n, total_n,
               CAST(round((CAST(cnt AS DOUBLE) / CAST(total_n AS DOUBLE)) *
                 ln(CAST(total_n AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1e6) AS BIGINT) AS term_micro
        FROM counts CROSS JOIN stats)
      SELECT vocab_n, total_n,
             CAST(sum(term_micro) AS BIGINT) AS entropy_micro,
             CAST(sum(term_micro) AS DOUBLE) / 1e6 AS entropy_nats,
             exp(CAST(sum(term_micro) AS DOUBLE) / 1e6) AS effective_vocab
      FROM terms GROUP BY vocab_n, total_n"""))

  /** Stopword list shared by the gate and the stump probe
    * ([[Classifier]]) — the two must agree on what "stopword"
    * means for the probe's exact-recovery claim to hold. */
  private[llm] val StopWords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Per-document token statistics — the shared front half of
    * [[qualityGate]] and [[Classifier.qualityStump]]: one explode +
    * two map-side-combinable aggregations collapsing each document to
    * 4 longs (token count, summed token chars, top-token count,
    * stopword count). */
  private[llm] def tokenStats(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        sum(col("c")).as("n_tok"),
        sum(col("c") * length(col("tok"))).as("n_word_chars"),
        max(col("c")).as("max_cnt"),
        sum(when(col("tok").isin(StopWords: _*), col("c")).otherwise(0L))
          .as("stop_cnt"))

  /** Composite quality gate — the Gopher-rules filtering shape
    * (Rae et al. 2021, public): a document survives only if it clears
    * EVERY heuristic, and the output carries a reason BITMASK so a
    * pipeline can audit exactly which rule dropped each document
    * (the thing a bare boolean can't do). Rules, all integer-exact
    * via cross-multiplication (no float thresholds to drift
    * cross-engine):
    *   bit 1 — token count outside [10, 100 000]
    *   bit 2 — mean token length outside [2, 8]  (2·n ≤ chars ≤ 8·n)
    *   bit 4 — top token exceeds 20 % of tokens  (5·max ≤ n)
    *   bit 8 — stopword share under 2 %          (50·stop ≥ n)
    * Scale shape: one explode + two map-side-combinable aggregations
    * (the [[repetitionRatio]] plan) — per-doc state is 4 longs, so
    * the gate over 100 TB is a scan plus doc-keyed combine, no join,
    * no window. */
  val qualityGate: Q = Q(
    "q_quality_gate",
    (s, dir) => {
      tokenStats(t(s, dir, "documents"))
        .select(col("doc_id"),
          col("n_tok").cast("long").as("n_tok"),
          col("n_word_chars").cast("long").as("n_word_chars"),
          col("max_cnt").cast("long").as("max_cnt"),
          col("stop_cnt").cast("long").as("stop_cnt"),
          (when(col("n_tok") < 10 || col("n_tok") > 100000L, 1L).otherwise(0L)
            + when(lit(2) * col("n_tok") > col("n_word_chars")
                || col("n_word_chars") > lit(8) * col("n_tok"), 2L).otherwise(0L)
            + when(lit(5) * col("max_cnt") > col("n_tok"), 4L).otherwise(0L)
            + when(lit(50) * col("stop_cnt") < col("n_tok"), 8L).otherwise(0L))
            .cast("long").as("drop_mask"))
        .withColumn("keep", col("drop_mask") === 0L)
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, n_tok, n_word_chars, max_cnt, stop_cnt,
             CAST((CASE WHEN n_tok < 10 OR n_tok > 100000 THEN 1 ELSE 0 END)
                + (CASE WHEN 2 * n_tok > n_word_chars
                         OR n_word_chars > 8 * n_tok THEN 2 ELSE 0 END)
                + (CASE WHEN 5 * max_cnt > n_tok THEN 4 ELSE 0 END)
                + (CASE WHEN 50 * stop_cnt < n_tok THEN 8 ELSE 0 END)
               AS BIGINT) AS drop_mask,
             ((CASE WHEN n_tok < 10 OR n_tok > 100000 THEN 1 ELSE 0 END)
                + (CASE WHEN 2 * n_tok > n_word_chars
                         OR n_word_chars > 8 * n_tok THEN 2 ELSE 0 END)
                + (CASE WHEN 5 * max_cnt > n_tok THEN 4 ELSE 0 END)
                + (CASE WHEN 50 * stop_cnt < n_tok THEN 8 ELSE 0 END)) = 0
               AS keep
      FROM (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tok,
               CAST(sum(c * length(tok)) AS BIGINT) AS n_word_chars,
               CAST(max(c) AS BIGINT) AS max_cnt,
               CAST(sum(CASE WHEN tok IN ('the','a','of','and','to','in','is')
                             THEN c ELSE 0 END) AS BIGINT) AS stop_cnt
        FROM (
          SELECT doc_id, tok, count(*) AS c FROM (
            SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
            FROM documents
          ) GROUP BY doc_id, tok
        ) GROUP BY doc_id
      ) ORDER BY doc_id"""))

  /** Class-based TF-IDF (c-TF-IDF, the BERTopic topic-labeling
    * recipe): treat each `source` as one class, score every term by
    * tf_{t,c} · ln(1 + A/f_t) where A is the average tokens per class
    * and f_t the corpus frequency, and keep each class's top-5 — the
    * "what characterizes this data source / cluster" primitive a
    * curation pipeline runs to label its domains before choosing a
    * mixture.
    *
    * Determinism: A/f_t is one double division of exact BIGINTs and
    * each (class, term) contributes ONE rounded micro term, so the
    * ranking key is an exact BIGINT on both engines; ties break on
    * the token string.
    *
    * Scale shape: the tf aggregate is the [[vocabTopK]] explode →
    * two-level hash aggregate (shuffle carries vocabulary × classes,
    * never corpus); f_t re-aggregates the already-vocabulary-sized tf
    * frame; global stats are a 1-row broadcast crossJoin. The top-5
    * window partitions by class over the vocabulary-sized scored
    * frame — the [[vocabNucleus]] vocabulary-domain envelope, not a
    * corpus-sized window. */
  private[graft] def topicTermsOf(docs: DataFrame): DataFrame = {
      val tf = docs
        .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("tf"))
      val ft = tf.groupBy("tok").agg(sum(col("tf")).as("ft"))
      val stats = tf.agg(sum(col("tf")).as("tot"),
        countDistinct(col("source")).as("nc"))
      val scored = tf.join(ft, "tok").crossJoin(broadcast(stats))
        .select(col("source"), col("tok"), col("tf"),
          round(col("tf") * log(lit(1.0) +
              col("tot").cast("double") / (col("nc") * col("ft")).cast("double")) *
            lit(1000000.0), 0).cast("long").as("score_micro"))
      val w = Window.partitionBy("source")
        .orderBy(col("score_micro").desc, col("tok").asc)
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select("source", "rank", "tok", "tf", "score_micro")
        .orderBy("source", "rank")
  }

  val topicTerms: Q = Q(
    "q_topic_terms",
    (s, dir) => topicTermsOf(t(s, dir, "documents")),
    Some("""
      WITH tf AS (
        SELECT source, tok, CAST(count(*) AS BIGINT) AS tf FROM (
          SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
          FROM documents) GROUP BY source, tok),
      ft AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS ft FROM tf GROUP BY tok),
      stats AS (SELECT CAST(sum(tf) AS BIGINT) AS tot,
                       CAST(count(DISTINCT source) AS BIGINT) AS nc FROM tf),
      scored AS (
        SELECT source, tok, tf,
               CAST(round(tf * ln(1.0 + CAST(tot AS DOUBLE) / CAST(nc * ft AS DOUBLE)) *
                 1000000.0) AS BIGINT) AS score_micro
        FROM tf JOIN ft USING (tok) CROSS JOIN stats),
      ranked AS (
        SELECT source, tok, tf, score_micro,
               CAST(row_number() OVER (PARTITION BY source
                 ORDER BY score_micro DESC, tok ASC) AS BIGINT) AS rank
        FROM scored)
      SELECT source, rank, tok, tf, score_micro
      FROM ranked WHERE rank <= 5
      ORDER BY source, rank"""))

  /** RHO-style excess-surprisal data selection: score every document
    * by `loss_general − loss_reference` under two unigram add-1 LMs —
    * the general LM trained on the WHOLE corpus, the reference LM on
    * the clean domain (here `lang = 'en'` as the clean proxy) — and
    * keep the top-N. High excess means "the general model finds this
    * hard but the clean model doesn't": learnable, in-domain data —
    * the selectable-language-modeling criterion (Lin et al., RHO-1),
    * computed batch-side instead of with neural LMs.
    *
    * Shape at 100 TB: both LMs are VOCABULARY-sized count tables, and
    * the reference counts left-join onto the general table once
    * (vocab-sized), so the corpus token stream is scanned once and
    * joined against a single LM frame carrying both surprisals. The
    * shared smoothing vocabulary is the full-corpus vocabulary, so
    * unseen-in-reference tokens get the principled count-0 add-1 mass
    * instead of a special case. Micro-nat BIGINT arithmetic end to
    * end — one final rank over exact integers, no float ordering. */
  /** Core excess-surprisal pass over any (doc_id, lang, text) frame —
    * factored so tests can feed hand-built corpora. Returns ALL docs
    * scored (callers rank/limit). */
  def rhoScoresOf(docs: DataFrame): DataFrame = {
      val toks = docs
        .select(col("doc_id"), col("lang"),
          explode(tokens(col("text"))).as("tok"))
      // ONE aggregation of the token stream yields both models'
      // counts (the reference count is a conditional sum), so the
      // corpus is scanned once for training and once for scoring —
      // never per-model
      val gen = toks.groupBy("tok")
        .agg(count(lit(1)).as("c_gen"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c_ref"))
      val stats = gen.agg(count(lit(1)).as("vocab_n"),
        sum(col("c_gen")).as("total_gen"),
        sum(col("c_ref")).as("total_ref"))
      // one vocab-sized LM frame carrying BOTH surprisals
      val lm = gen
        .crossJoin(broadcast(stats))
        .select(col("tok").as("lm_tok"),
          round(-log((col("c_gen") + lit(1.0)) /
            (col("total_gen") + col("vocab_n")).cast("double")) * 1e6, 0)
            .cast("long").as("s_gen"),
          round(-log((coalesce(col("c_ref"), lit(0L)) + lit(1.0)) /
            (col("total_ref") + col("vocab_n")).cast("double")) * 1e6, 0)
            .cast("long").as("s_ref"))
      toks.join(lm, col("tok") === col("lm_tok"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("s_gen") - col("s_ref")).as("excess_micro"))
  }

  val rhoSelect: Q = Q(
    "q_rho_select",
    (s, dir) =>
      rhoScoresOf(t(s, dir, "documents"))
        .orderBy(col("excess_micro").desc, col("doc_id").asc)
        .limit(100),
    Some("""
      WITH tok AS (
        SELECT doc_id, lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents),
      gen AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_gen FROM tok GROUP BY tok),
      ref AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_ref
              FROM tok WHERE lang = 'en' GROUP BY tok),
      stats AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM gen) AS vocab_n,
               (SELECT CAST(sum(c_gen) AS BIGINT) FROM gen) AS total_gen,
               (SELECT CAST(sum(c_ref) AS BIGINT) FROM ref) AS total_ref),
      lm AS (
        SELECT g.tok AS lm_tok,
               CAST(round(-ln((g.c_gen + 1.0) /
                 CAST(total_gen + vocab_n AS DOUBLE)) * 1e6) AS BIGINT) AS s_gen,
               CAST(round(-ln((coalesce(r.c_ref, 0) + 1.0) /
                 CAST(total_ref + vocab_n AS DOUBLE)) * 1e6) AS BIGINT) AS s_ref
        FROM gen g LEFT JOIN ref r ON g.tok = r.tok CROSS JOIN stats)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(s_gen - s_ref) AS BIGINT) AS excess_micro
      FROM tok JOIN lm ON tok = lm_tok
      GROUP BY doc_id
      ORDER BY excess_micro DESC, doc_id ASC LIMIT 100"""))

  /** Interpolated KNESER–NEY bigram LM heldout scoring — the step
    * past [[bigramPerplexity]]'s add-1: absolute discounting
    * (d = 0.75) with the CONTINUATION-count backoff ("how many
    * distinct contexts precede w2", not "how often w2 occurs") that
    * makes KN the strongest count-based smoother. Every KN statistic
    * is a grouped count over the train bigram table — c(w1w2),
    * c(w1·), N1+(w1·), N1+(·w2), N1+(··) — so the model "trains" as
    * four vocabulary-sized aggregations; the continuation
    * distribution takes an add-1 floor over (N1+(··) + V) so unseen
    * words keep finite surprisal. Scoring joins each heldout bigram
    * against the three stat frames on its own keys (bg, w1, w2) —
    * token-keyed hash joins, never corpus-pairwise.
    *
    * Determinism: counts are BIGINT; the probability is a FIXED
    * parenthesization of IEEE double ops — both engines evaluate
    * `(max(c12−d,0)/c1) + (((d·N1+(w1·))/c1)·pc)` in the identical
    * order, and one final −ln rounds to micro-nats, the repo's
    * established cross-engine-exact envelope. */
  /** Core KN scoring over explicit (doc_id, text) train/heldout
    * frames — factored so tests can inject corpora that exercise the
    * continuation-count backoff directly. */
  def kneserNeyOf(train: DataFrame, test: DataFrame): DataFrame = {
      def bigramFrame(df: DataFrame): DataFrame =
        df.select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
          .where(size(col("w")) >= 2)
          .select(col("doc_id"),
            explode(transform(sequence(lit(0), size(col("w")) - 2),
              i => struct(
                concat_ws(" ", slice(col("w"), i + lit(1), lit(2))).as("bg"),
                element_at(col("w"), i + lit(1)).as("w1"),
                element_at(col("w"), i + lit(2)).as("w2")))).as("e"))
          .select(col("doc_id"), col("e.bg").as("bg"),
            col("e.w1").as("w1"), col("e.w2").as("w2"))
      val trbg = bigramFrame(train)
      val c12 = trbg.groupBy("bg").agg(count(lit(1)).as("c12"))
      val w1stats = trbg.groupBy("w1")
        .agg(count(lit(1)).as("c1"), countDistinct(col("bg")).as("n1p_fw"))
        .withColumnRenamed("w1", "p1")
      val cont = trbg.select("w1", "w2").distinct()
      val w2stats = cont.groupBy("w2")
        .agg(count(lit(1)).as("n1p_pw"))
        .withColumnRenamed("w2", "p2")
      val globals = cont.agg(count(lit(1)).as("dd"))
        .crossJoin(train
          .select(explode(tokens(col("text"))).as("tok"))
          .agg(countDistinct(col("tok")).as("vocab_n")))
      val pc = (coalesce(col("n1p_pw"), lit(0L)) + lit(1.0)) /
        (col("dd") + col("vocab_n")).cast("double")
      val c1d = col("c1").cast("double")
      val pkn = when(coalesce(col("c1"), lit(0L)) > 0,
        (greatest(coalesce(col("c12"), lit(0L)) - lit(0.75), lit(0.0)) / c1d) +
          (((lit(0.75) * col("n1p_fw")) / c1d) * pc))
        .otherwise(pc)
      bigramFrame(test)
        .join(c12, Seq("bg"), "left")
        .join(w1stats, col("w1") === col("p1"), "left")
        .join(w2stats, col("w2") === col("p2"), "left")
        .crossJoin(broadcast(globals))
        .select(col("doc_id"),
          round(-log(pkn) * 1e6, 0).cast("long").as("surprisal_micro"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("surprisal_micro")).as("total_surprisal_micro"))
        .select(col("doc_id"), col("n_bigrams"), col("total_surprisal_micro"),
          (col("total_surprisal_micro").cast("double") / col("n_bigrams") / 1e6)
            .as("mean_surprisal_nats"))
        .orderBy("doc_id")
  }

  val kneserNey: Q = Q(
    "q_lm_kneser_ney",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("b", Sampling.hashBucket(col("doc_id")))
      kneserNeyOf(docs.filter(col("b") < 80), docs.filter(col("b") >= 90))
    },
    Some("""
      WITH bucketed AS (
        SELECT doc_id, text,
               (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256 +
                ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100 AS b
        FROM documents),
      trainw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                 FROM bucketed WHERE b < 80),
      testw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                FROM bucketed WHERE b >= 90),
      trbg AS (SELECT t.doc_id, t.w[s.k+1] || ' ' || t.w[s.k+2] AS bg,
                      t.w[s.k+1] AS w1, t.w[s.k+2] AS w2
               FROM trainw t, unnest(generate_series(0, len(t.w) - 2)) AS s(k)
               WHERE len(t.w) >= 2),
      c12 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c12 FROM trbg GROUP BY bg),
      w1s AS (SELECT w1 AS p1, CAST(count(*) AS BIGINT) AS c1,
                     CAST(count(DISTINCT bg) AS BIGINT) AS n1p_fw
              FROM trbg GROUP BY w1),
      cont AS (SELECT DISTINCT w1, w2 FROM trbg),
      w2s AS (SELECT w2 AS p2, CAST(count(*) AS BIGINT) AS n1p_pw
              FROM cont GROUP BY w2),
      gl AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM cont) AS dd,
                    (SELECT CAST(count(DISTINCT tok) AS BIGINT)
                     FROM (SELECT unnest(w) AS tok FROM trainw)) AS vocab_n),
      tsbg AS (SELECT t.doc_id, t.w[s.k+1] || ' ' || t.w[s.k+2] AS bg,
                      t.w[s.k+1] AS w1, t.w[s.k+2] AS w2
               FROM testw t, unnest(generate_series(0, len(t.w) - 2)) AS s(k)
               WHERE len(t.w) >= 2),
      scored AS (
        SELECT t.doc_id,
               CAST(round(-ln(
                 CASE WHEN coalesce(w1s.c1, 0) > 0 THEN
                   (greatest(coalesce(c12.c12, 0) - 0.75, 0.0) / CAST(w1s.c1 AS DOUBLE)) +
                     (((0.75 * w1s.n1p_fw) / CAST(w1s.c1 AS DOUBLE)) *
                      ((coalesce(w2s.n1p_pw, 0) + 1.0) / CAST(dd + vocab_n AS DOUBLE)))
                 ELSE ((coalesce(w2s.n1p_pw, 0) + 1.0) / CAST(dd + vocab_n AS DOUBLE))
                 END) * 1e6) AS BIGINT) AS surprisal_micro
        FROM tsbg t LEFT JOIN c12 USING (bg)
                    LEFT JOIN w1s ON t.w1 = w1s.p1
                    LEFT JOIN w2s ON t.w2 = w2s.p2
        CROSS JOIN gl)
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(surprisal_micro) AS BIGINT) AS total_surprisal_micro,
             CAST(sum(surprisal_micro) AS DOUBLE) / count(*) / 1e6 AS mean_surprisal_nats
      FROM scored GROUP BY doc_id ORDER BY doc_id"""))

  /** SIMPLE GOOD–TURING smoothed unigram heldout scoring — the
    * count-of-counts estimator at the unigram level (the same n_k
    * machinery [[kneserNeyModOf]] uses for discounts, used here to
    * re-estimate the counts themselves): a word seen c times is
    * priced at the ADJUSTED count c* = (c+1)·n_{c+1}/n_c for small c
    * (the Katz cutoff: c < 5 and n_{c+1} > 0 — beyond it the
    * estimator's own sample is too thin and MLE c/N takes over), and
    * the probability mass Good–Turing reserves for UNSEEN words
    * (n₁/N in total) is split evenly over the heldout shard's unseen
    * types — with a 1/(2N) half-count floor when the train shard has
    * NO hapaxes (n₁ = 0 leaves GT zero unseen mass; an unguarded
    * ln(0) silently drops the token in Spark and hard-errors in
    * DuckDB). Every statistic is a grouped count (vocabulary-sized c,
    * a ≤6-row count-of-counts, two scalars) — scoring is one
    * token-keyed left join.
    *
    * All divisions happen in DOUBLE with a fixed parenthesization —
    * the established cross-engine envelope — and n_c > 0 whenever a
    * word of count c exists, so no estimator divides by zero. */
  def goodTuringOf(train: DataFrame, test: DataFrame): DataFrame = {
      val trTok = train.select(explode(tokens(col("text"))).as("tok"))
      val counts = trTok.groupBy("tok").agg(count(lit(1)).as("c"))
        .withColumnRenamed("tok", "k")
      val coc = counts.agg(
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("nn1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("nn2"),
        sum(when(col("c") === 3, 1L).otherwise(0L)).as("nn3"),
        sum(when(col("c") === 4, 1L).otherwise(0L)).as("nn4"),
        sum(when(col("c") === 5, 1L).otherwise(0L)).as("nn5"),
        sum(col("c")).as("bigN"))
      val heldTok = test.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val unseen = heldTok.join(counts, col("tok") === col("k"), "left_anti")
        .agg(countDistinct(col("tok")).as("u"))
      val globals = coc.crossJoin(unseen)
      def nAt(c: Int) = c match {
        case 1 => col("nn1"); case 2 => col("nn2"); case 3 => col("nn3")
        case 4 => col("nn4"); case 5 => col("nn5")
      }
      val nd = col("bigN").cast("double")
      // c* / N by bucket; MLE past the cutoff or when n_{c+1} = 0
      val pSeen = (1 to 4).foldRight(col("c").cast("double") / nd) { (cv, acc) =>
        when(col("c") === cv && nAt(cv + 1) > 0,
          ((lit(cv) + lit(1.0)) * nAt(cv + 1)) / (nAt(cv) * nd)).otherwise(acc)
      }
      // hapax-free corpora (nn1 = 0) leave Good-Turing no unseen mass
      // — without the half-count floor the probability is 0, which
      // Spark's log turns into a silently-dropped NULL while DuckDB
      // hard-errors on ln(0); the floor is the same CASE both engines
      val p = when(col("c").isNull,
        when(col("nn1") > 0, col("nn1") / (nd * greatest(col("u"), lit(1L))))
          .otherwise(lit(1.0) / (lit(2.0) * nd))).otherwise(pSeen)
      heldTok
        .join(counts, col("tok") === col("k"), "left")
        .crossJoin(broadcast(globals))
        .select(col("doc_id"),
          round(-log(p) * 1e6, 0).cast("long").as("surprisal_micro"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("surprisal_micro")).as("total_surprisal_micro"))
        .select(col("doc_id"), col("n_tokens"), col("total_surprisal_micro"),
          (col("total_surprisal_micro").cast("double") / col("n_tokens") / 1e6)
            .as("mean_surprisal_nats"))
        .orderBy("doc_id")
  }

  val goodTuring: Q = Q(
    "q_lm_good_turing",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("b", Sampling.hashBucket(col("doc_id")))
      goodTuringOf(docs.filter(col("b") < 80), docs.filter(col("b") >= 90))
    },
    Some("""
      WITH bucketed AS (
        SELECT doc_id, text,
               (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256 +
                ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100 AS b
        FROM documents),
      trtok AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                FROM bucketed WHERE b < 80),
      counts AS (SELECT tok AS k, CAST(count(*) AS BIGINT) AS c
                 FROM trtok GROUP BY tok),
      coc AS (SELECT
                CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nn1,
                CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS nn2,
                CAST(sum(CASE WHEN c = 3 THEN 1 ELSE 0 END) AS BIGINT) AS nn3,
                CAST(sum(CASE WHEN c = 4 THEN 1 ELSE 0 END) AS BIGINT) AS nn4,
                CAST(sum(CASE WHEN c = 5 THEN 1 ELSE 0 END) AS BIGINT) AS nn5,
                CAST(sum(c) AS BIGINT) AS bigN
              FROM counts),
      heldtok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
                  FROM bucketed WHERE b >= 90),
      heldtok2 AS (SELECT doc_id, tok FROM heldtok),
      unseen AS (SELECT CAST(count(DISTINCT h.tok) AS BIGINT) AS u
                 FROM heldtok2 h LEFT JOIN counts ON h.tok = counts.k
                 WHERE counts.k IS NULL),
      scored AS (
        SELECT h.doc_id,
               CAST(round(-ln(
                 CASE WHEN counts.c IS NULL AND nn1 = 0
                        THEN 1.0 / (2.0 * CAST(bigN AS DOUBLE))
                      WHEN counts.c IS NULL
                        THEN nn1 / (CAST(bigN AS DOUBLE) * greatest(u, 1))
                      WHEN counts.c = 1 AND nn2 > 0
                        THEN ((1 + 1.0) * nn2) / (nn1 * CAST(bigN AS DOUBLE))
                      WHEN counts.c = 2 AND nn3 > 0
                        THEN ((2 + 1.0) * nn3) / (nn2 * CAST(bigN AS DOUBLE))
                      WHEN counts.c = 3 AND nn4 > 0
                        THEN ((3 + 1.0) * nn4) / (nn3 * CAST(bigN AS DOUBLE))
                      WHEN counts.c = 4 AND nn5 > 0
                        THEN ((4 + 1.0) * nn5) / (nn4 * CAST(bigN AS DOUBLE))
                      ELSE CAST(counts.c AS DOUBLE) / CAST(bigN AS DOUBLE)
                 END) * 1e6) AS BIGINT) AS surprisal_micro
        FROM heldtok2 h
        LEFT JOIN counts ON h.tok = counts.k
        CROSS JOIN coc CROSS JOIN unseen)
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(surprisal_micro) AS BIGINT) AS total_surprisal_micro,
             CAST(sum(surprisal_micro) AS DOUBLE) / count(*) / 1e6 AS mean_surprisal_nats
      FROM scored GROUP BY doc_id ORDER BY doc_id"""))

  /** MODIFIED Kneser–Ney (Chen & Goodman 1999) — the last rung of the
    * KN ladder: instead of one fixed discount, THREE count-dependent
    * discounts estimated from the corpus's own count-of-counts
    * n_k = |{bigram types with count k}|:
    *
    *   Y  = n₁/(n₁+2n₂)
    *   D₁ = 1 − 2Y·n₂/n₁   D₂ = 2 − 3Y·n₃/n₂   D₃₊ = 3 − 4Y·n₄/n₃
    *
    * applied by count bucket (c=1 → D₁, c=2 → D₂, c≥3 → D₃₊), with
    * the leftover mass γ(w₁) = D₁N₁(w₁·)+D₂N₂(w₁·)+D₃₊N₃₊(w₁·)
    * interpolating the continuation distribution (same add-1 floor as
    * [[kneserNey]]). Singleton-heavy corpora (web text) discount
    * hapax bigrams harder than frequent ones — the quality edge over
    * the fixed 0.75.
    *
    * Degenerate-corpus guard (stated, not assumed): each Dₖ's
    * estimator divides by n₁/n₂/n₃; when that count-of-count is zero
    * the corpus carries no evidence for the level and Dₖ falls back
    * to the plain-KN 0.75 — an identical CASE on both engines, so the
    * guard itself is hash-pinned.
    *
    * Shape at 100 TB: the count-of-counts is ONE extra 4-row
    * aggregate over the bigram-type table; per-w₁ bucket counts ride
    * the existing w₁ grouping; everything else is [[kneserNeyOf]]'s
    * token-keyed join scoring. */
  /** Core modified-KN pass over explicit train/heldout frames. */
  def kneserNeyModOf(train: DataFrame, test: DataFrame): DataFrame = {
      def bigramFrame(df: DataFrame): DataFrame =
        df.select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
          .where(size(col("w")) >= 2)
          .select(col("doc_id"),
            explode(transform(sequence(lit(0), size(col("w")) - 2),
              i => struct(
                concat_ws(" ", slice(col("w"), i + lit(1), lit(2))).as("bg"),
                element_at(col("w"), i + lit(1)).as("w1"),
                element_at(col("w"), i + lit(2)).as("w2")))).as("e"))
          .select(col("doc_id"), col("e.bg").as("bg"),
            col("e.w1").as("w1"), col("e.w2").as("w2"))
      val trbg = bigramFrame(train)
      val types = trbg.groupBy("bg", "w1", "w2").agg(count(lit(1)).as("c12"))
      val c12 = types.select(col("bg").as("kbg"), col("c12"))
      val w1stats = types.groupBy("w1")
        .agg(sum(col("c12")).as("c1"),
          sum(when(col("c12") === 1, 1L).otherwise(0L)).as("nb1"),
          sum(when(col("c12") === 2, 1L).otherwise(0L)).as("nb2"),
          sum(when(col("c12") >= 3, 1L).otherwise(0L)).as("nb3p"))
        .withColumnRenamed("w1", "p1")
      val w2stats = types.groupBy("w2").agg(count(lit(1)).as("n1p_pw"))
        .withColumnRenamed("w2", "p2")
      val globals = types.agg(
          sum(when(col("c12") === 1, 1L).otherwise(0L)).as("nn1"),
          sum(when(col("c12") === 2, 1L).otherwise(0L)).as("nn2"),
          sum(when(col("c12") === 3, 1L).otherwise(0L)).as("nn3"),
          sum(when(col("c12") === 4, 1L).otherwise(0L)).as("nn4"),
          count(lit(1)).as("dd"))
        .crossJoin(train
          .select(explode(tokens(col("text"))).as("tok"))
          .agg(countDistinct(col("tok")).as("vocab_n")))
        .withColumn("y", when(col("nn1") > 0,
          col("nn1").cast("double") / (col("nn1") + lit(2) * col("nn2"))).otherwise(0.0))
        .withColumn("d1", when(col("nn1") > 0,
          lit(1.0) - (lit(2.0) * col("y") * col("nn2")) / col("nn1")).otherwise(0.75))
        .withColumn("d2", when(col("nn2") > 0,
          lit(2.0) - (lit(3.0) * col("y") * col("nn3")) / col("nn2")).otherwise(0.75))
        .withColumn("d3", when(col("nn3") > 0,
          lit(3.0) - (lit(4.0) * col("y") * col("nn4")) / col("nn3")).otherwise(0.75))
      val disc = when(coalesce(col("c12"), lit(0L)) === 1, col("d1"))
        .when(coalesce(col("c12"), lit(0L)) === 2, col("d2"))
        .otherwise(col("d3"))
      val pc = (coalesce(col("n1p_pw"), lit(0L)) + lit(1.0)) /
        (col("dd") + col("vocab_n")).cast("double")
      val c1d = col("c1").cast("double")
      val gamma = (col("d1") * col("nb1") + col("d2") * col("nb2")) +
        col("d3") * col("nb3p")
      val pkn = when(coalesce(col("c1"), lit(0L)) > 0,
        (greatest(coalesce(col("c12"), lit(0L)) - disc, lit(0.0)) / c1d) +
          ((gamma / c1d) * pc))
        .otherwise(pc)
      bigramFrame(test)
        .join(c12, col("bg") === col("kbg"), "left")
        .join(w1stats, col("w1") === col("p1"), "left")
        .join(w2stats, col("w2") === col("p2"), "left")
        .crossJoin(broadcast(globals))
        .select(col("doc_id"),
          round(-log(pkn) * 1e6, 0).cast("long").as("surprisal_micro"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("surprisal_micro")).as("total_surprisal_micro"))
        .select(col("doc_id"), col("n_bigrams"), col("total_surprisal_micro"),
          (col("total_surprisal_micro").cast("double") / col("n_bigrams") / 1e6)
            .as("mean_surprisal_nats"))
        .orderBy("doc_id")
  }

  val kneserNeyMod: Q = Q(
    "q_lm_kn_modified",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("b", Sampling.hashBucket(col("doc_id")))
      kneserNeyModOf(docs.filter(col("b") < 80), docs.filter(col("b") >= 90))
    },
    Some("""
      WITH bucketed AS (
        SELECT doc_id, text,
               (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256 +
                ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100 AS b
        FROM documents),
      trainw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                 FROM bucketed WHERE b < 80),
      testw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                FROM bucketed WHERE b >= 90),
      trbg AS (SELECT t.doc_id, t.w[s.k+1] || ' ' || t.w[s.k+2] AS bg,
                      t.w[s.k+1] AS w1, t.w[s.k+2] AS w2
               FROM trainw t, unnest(generate_series(0, len(t.w) - 2)) AS s(k)
               WHERE len(t.w) >= 2),
      types AS (SELECT bg, w1, w2, CAST(count(*) AS BIGINT) AS c12
                FROM trbg GROUP BY bg, w1, w2),
      w1s AS (SELECT w1 AS p1, CAST(sum(c12) AS BIGINT) AS c1,
                     CAST(sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb1,
                     CAST(sum(CASE WHEN c12 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS nb2,
                     CAST(sum(CASE WHEN c12 >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS nb3p
              FROM types GROUP BY w1),
      w2s AS (SELECT w2 AS p2, CAST(count(*) AS BIGINT) AS n1p_pw
              FROM types GROUP BY w2),
      gl0 AS (SELECT CAST(sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nn1,
                     CAST(sum(CASE WHEN c12 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS nn2,
                     CAST(sum(CASE WHEN c12 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS nn3,
                     CAST(sum(CASE WHEN c12 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS nn4,
                     CAST(count(*) AS BIGINT) AS dd
              FROM types),
      gl1 AS (SELECT *,
                     (SELECT CAST(count(DISTINCT tok) AS BIGINT)
                      FROM (SELECT unnest(w) AS tok FROM trainw)) AS vocab_n,
                     CASE WHEN nn1 > 0
                          THEN CAST(nn1 AS DOUBLE) / (nn1 + 2 * nn2)
                          ELSE 0.0 END AS y
              FROM gl0),
      gl AS (SELECT *,
                    CASE WHEN nn1 > 0 THEN 1.0 - (2.0 * y * nn2) / nn1
                         ELSE 0.75 END AS d1,
                    CASE WHEN nn2 > 0 THEN 2.0 - (3.0 * y * nn3) / nn2
                         ELSE 0.75 END AS d2,
                    CASE WHEN nn3 > 0 THEN 3.0 - (4.0 * y * nn4) / nn3
                         ELSE 0.75 END AS d3
             FROM gl1),
      tsbg AS (SELECT t.doc_id, t.w[s.k+1] || ' ' || t.w[s.k+2] AS bg,
                      t.w[s.k+1] AS w1, t.w[s.k+2] AS w2
               FROM testw t, unnest(generate_series(0, len(t.w) - 2)) AS s(k)
               WHERE len(t.w) >= 2),
      scored AS (
        SELECT h.doc_id,
               CAST(round(-ln(
                 CASE WHEN coalesce(s1.c1, 0) > 0 THEN
                   (greatest(coalesce(a.c12, 0) -
                      (CASE WHEN coalesce(a.c12, 0) = 1 THEN d1
                            WHEN coalesce(a.c12, 0) = 2 THEN d2
                            ELSE d3 END), 0.0) / CAST(s1.c1 AS DOUBLE)) +
                     ((((d1 * s1.nb1 + d2 * s1.nb2) + d3 * s1.nb3p)
                        / CAST(s1.c1 AS DOUBLE)) *
                      ((coalesce(s2.n1p_pw, 0) + 1.0) / CAST(dd + vocab_n AS DOUBLE)))
                 ELSE ((coalesce(s2.n1p_pw, 0) + 1.0) / CAST(dd + vocab_n AS DOUBLE))
                 END) * 1e6) AS BIGINT) AS surprisal_micro
        FROM tsbg h
        LEFT JOIN types a ON h.bg = a.bg
        LEFT JOIN w1s s1 ON h.w1 = s1.p1
        LEFT JOIN w2s s2 ON h.w2 = s2.p2
        CROSS JOIN gl)
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(surprisal_micro) AS BIGINT) AS total_surprisal_micro,
             CAST(sum(surprisal_micro) AS DOUBLE) / count(*) / 1e6 AS mean_surprisal_nats
      FROM scored GROUP BY doc_id ORDER BY doc_id"""))

  /** TRIGRAM interpolated KNESER–NEY with RECURSIVE backoff — the
    * full three-level chain the bigram model ([[kneserNey]]) stops
    * short of: P(w₃|w₁w₂) discounts the trigram count and backs off
    * into the bigram-level CONTINUATION model, which itself discounts
    * and backs off into the unigram continuation distribution:
    *
    *   P₃ = max(c(w₁w₂w₃)−d,0)/c(w₁w₂) + (d·N1+(w₁w₂·)/c(w₁w₂))·P₂
    *   P₂ = max(N1+(·w₂w₃)−d,0)/N1+(·w₂·) + (d·N1+(w₂·)/N1+(·w₂·))·P₁
    *   P₁ = (N1+(·w₃)+1)/(N1+(··)+V)        (add-1 floor, d = 0.75)
    *
    * — the mid level counts CONTEXTS TYPES, not occurrences (the KN
    * insight applied recursively): N1+(·w₂w₃) is "how many distinct
    * w₁ complete this bigram", N1+(·w₂·) its normalizer. Unseen
    * context c(w₁w₂)=0 falls through to P₂; unseen middle w₂ falls
    * through to P₁ — every heldout trigram gets finite surprisal.
    *
    * Shape at 100 TB: every statistic is ONE grouped count over the
    * train trigram/bigram type tables — c(w₁w₂w₃), {c(w₁w₂),
    * N1+(w₁w₂·)}, N1+(·w₂w₃), N1+(·w₂·), {N1+(w₂·), N1+(·w₃)},
    * N1+(··), V — seven vocabulary-sized frames; scoring left-joins
    * each heldout trigram on its own key (tri / ctx / w₂w₃ / w₂ /
    * w₃): token-keyed hash joins, AQE-splittable, nothing pairwise.
    * Determinism: counts are BIGINT, the probability is the same
    * FIXED IEEE parenthesization as the bigram model evaluated
    * bottom-up (P₁ into P₂ into P₃), one −ln rounded to micro-nats. */
  /** Core trigram-KN pass over explicit (doc_id, text) train/heldout
    * frames — factored so specs can hand-check the recursion and
    * compare against [[kneserNeyOf]] on the same corpus. */
  def kneserNeyTrigramOf(train: DataFrame, test: DataFrame): DataFrame = {
      def triFrame(df: DataFrame): DataFrame =
        df.select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
          .where(size(col("w")) >= 3)
          .select(col("doc_id"),
            explode(transform(sequence(lit(0), size(col("w")) - 3),
              i => struct(
                concat_ws(" ", slice(col("w"), i + lit(1), lit(3))).as("tri"),
                concat_ws(" ", slice(col("w"), i + lit(1), lit(2))).as("ctx"),
                concat_ws(" ", slice(col("w"), i + lit(2), lit(2))).as("mid"),
                element_at(col("w"), i + lit(2)).as("w2"),
                element_at(col("w"), i + lit(3)).as("w3")))).as("e"))
          .select(col("doc_id"), col("e.tri").as("tri"), col("e.ctx").as("ctx"),
            col("e.mid").as("mid"), col("e.w2").as("w2"), col("e.w3").as("w3"))
      def bgTypes(df: DataFrame): DataFrame =
        df.select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
          .where(size(col("w")) >= 2)
          .select(explode(transform(sequence(lit(0), size(col("w")) - 2),
            i => struct(element_at(col("w"), i + lit(1)).as("b1"),
              element_at(col("w"), i + lit(2)).as("b2")))).as("e"))
          .select(col("e.b1").as("b1"), col("e.b2").as("b2")).distinct()
      val trtri = triFrame(train)
      val c123 = trtri.groupBy("tri").agg(count(lit(1)).as("c123"))
        .withColumnRenamed("tri", "k3")
      val ctxStats = trtri.groupBy("ctx")
        .agg(count(lit(1)).as("cctx"), countDistinct(col("tri")).as("n1p_fw3"))
        .withColumnRenamed("ctx", "kc")
      // distinct trigram TYPES: tokens contain no whitespace (split
      // on \s+), so the space-joined tri string is injective in
      // (w1,w2,w3) and one distinct pass feeds both mid-level stats
      val triTypes = trtri.select("tri", "mid", "w2").distinct()
      val mid23 = triTypes.groupBy("mid").agg(count(lit(1)).as("n1p_m23"))
        .withColumnRenamed("mid", "km")
      val mid2 = triTypes.groupBy("w2").agg(count(lit(1)).as("n1p_m2"))
        .withColumnRenamed("w2", "k2")
      val bgT = bgTypes(train)
      val fw2 = bgT.groupBy("b1").agg(count(lit(1)).as("n1p_fw2"))
      val pw3 = bgT.groupBy("b2").agg(count(lit(1)).as("n1p_pw3"))
      val globals = bgT.agg(count(lit(1)).as("dd"))
        .crossJoin(train
          .select(explode(tokens(col("text"))).as("tok"))
          .agg(countDistinct(col("tok")).as("vocab_n")))
      val p1 = (coalesce(col("n1p_pw3"), lit(0L)) + lit(1.0)) /
        (col("dd") + col("vocab_n")).cast("double")
      val m2d = col("n1p_m2").cast("double")
      val p2 = when(coalesce(col("n1p_m2"), lit(0L)) > 0,
        (greatest(coalesce(col("n1p_m23"), lit(0L)) - lit(0.75), lit(0.0)) / m2d) +
          (((lit(0.75) * coalesce(col("n1p_fw2"), lit(0L))) / m2d) * p1))
        .otherwise(p1)
      val cd = col("cctx").cast("double")
      val p3 = when(coalesce(col("cctx"), lit(0L)) > 0,
        (greatest(coalesce(col("c123"), lit(0L)) - lit(0.75), lit(0.0)) / cd) +
          (((lit(0.75) * col("n1p_fw3")) / cd) * p2))
        .otherwise(p2)
      triFrame(test)
        .join(c123, col("tri") === col("k3"), "left")
        .join(ctxStats, col("ctx") === col("kc"), "left")
        .join(mid23, col("mid") === col("km"), "left")
        .join(mid2, col("w2") === col("k2"), "left")
        .join(fw2, col("w2") === col("b1"), "left")
        .join(pw3, col("w3") === col("b2"), "left")
        .crossJoin(broadcast(globals))
        .select(col("doc_id"),
          round(-log(p3) * 1e6, 0).cast("long").as("surprisal_micro"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_trigrams"),
          sum(col("surprisal_micro")).as("total_surprisal_micro"))
        .select(col("doc_id"), col("n_trigrams"), col("total_surprisal_micro"),
          (col("total_surprisal_micro").cast("double") / col("n_trigrams") / 1e6)
            .as("mean_surprisal_nats"))
        .orderBy("doc_id")
  }

  val kneserNeyTrigram: Q = Q(
    "q_lm_kn_trigram",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("b", Sampling.hashBucket(col("doc_id")))
      kneserNeyTrigramOf(docs.filter(col("b") < 80), docs.filter(col("b") >= 90))
    },
    Some("""
      WITH bucketed AS (
        SELECT doc_id, text,
               (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256 +
                ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100 AS b
        FROM documents),
      trainw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                 FROM bucketed WHERE b < 80),
      testw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                FROM bucketed WHERE b >= 90),
      trtri AS (SELECT t.doc_id,
                       t.w[s.k+1] || ' ' || t.w[s.k+2] || ' ' || t.w[s.k+3] AS tri,
                       t.w[s.k+1] || ' ' || t.w[s.k+2] AS ctx,
                       t.w[s.k+2] || ' ' || t.w[s.k+3] AS mid,
                       t.w[s.k+2] AS w2, t.w[s.k+3] AS w3
                FROM trainw t, unnest(generate_series(0, len(t.w) - 3)) AS s(k)
                WHERE len(t.w) >= 3),
      c123 AS (SELECT tri AS k3, CAST(count(*) AS BIGINT) AS c123
               FROM trtri GROUP BY tri),
      ctxs AS (SELECT ctx AS kc, CAST(count(*) AS BIGINT) AS cctx,
                      CAST(count(DISTINCT tri) AS BIGINT) AS n1p_fw3
               FROM trtri GROUP BY ctx),
      tt AS (SELECT DISTINCT tri, mid, w2 FROM trtri),
      m23 AS (SELECT mid AS km, CAST(count(*) AS BIGINT) AS n1p_m23
              FROM tt GROUP BY mid),
      m2 AS (SELECT w2 AS k2, CAST(count(*) AS BIGINT) AS n1p_m2
             FROM tt GROUP BY w2),
      bgt AS (SELECT DISTINCT t.w[s.k+1] AS b1, t.w[s.k+2] AS b2
              FROM trainw t, unnest(generate_series(0, len(t.w) - 2)) AS s(k)
              WHERE len(t.w) >= 2),
      fw2 AS (SELECT b1, CAST(count(*) AS BIGINT) AS n1p_fw2 FROM bgt GROUP BY b1),
      pw3 AS (SELECT b2, CAST(count(*) AS BIGINT) AS n1p_pw3 FROM bgt GROUP BY b2),
      gl AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM bgt) AS dd,
                    (SELECT CAST(count(DISTINCT tok) AS BIGINT)
                     FROM (SELECT unnest(w) AS tok FROM trainw)) AS vocab_n),
      tstri AS (SELECT t.doc_id,
                       t.w[s.k+1] || ' ' || t.w[s.k+2] || ' ' || t.w[s.k+3] AS tri,
                       t.w[s.k+1] || ' ' || t.w[s.k+2] AS ctx,
                       t.w[s.k+2] || ' ' || t.w[s.k+3] AS mid,
                       t.w[s.k+2] AS w2, t.w[s.k+3] AS w3
                FROM testw t, unnest(generate_series(0, len(t.w) - 3)) AS s(k)
                WHERE len(t.w) >= 3),
      scored AS (
        SELECT h.doc_id,
               CAST(round(-ln(
                 CASE WHEN coalesce(c.cctx, 0) > 0 THEN
                   (greatest(coalesce(a.c123, 0) - 0.75, 0.0) / CAST(c.cctx AS DOUBLE)) +
                     (((0.75 * c.n1p_fw3) / CAST(c.cctx AS DOUBLE)) *
                      (CASE WHEN coalesce(m.n1p_m2, 0) > 0 THEN
                         (greatest(coalesce(x.n1p_m23, 0) - 0.75, 0.0) / CAST(m.n1p_m2 AS DOUBLE)) +
                           (((0.75 * coalesce(f.n1p_fw2, 0)) / CAST(m.n1p_m2 AS DOUBLE)) *
                            ((coalesce(p.n1p_pw3, 0) + 1.0) / CAST(dd + vocab_n AS DOUBLE)))
                       ELSE ((coalesce(p.n1p_pw3, 0) + 1.0) / CAST(dd + vocab_n AS DOUBLE))
                       END))
                 WHEN coalesce(m.n1p_m2, 0) > 0 THEN
                   (greatest(coalesce(x.n1p_m23, 0) - 0.75, 0.0) / CAST(m.n1p_m2 AS DOUBLE)) +
                     (((0.75 * coalesce(f.n1p_fw2, 0)) / CAST(m.n1p_m2 AS DOUBLE)) *
                      ((coalesce(p.n1p_pw3, 0) + 1.0) / CAST(dd + vocab_n AS DOUBLE)))
                 ELSE ((coalesce(p.n1p_pw3, 0) + 1.0) / CAST(dd + vocab_n AS DOUBLE))
                 END) * 1e6) AS BIGINT) AS surprisal_micro
        FROM tstri h
        LEFT JOIN c123 a ON h.tri = a.k3
        LEFT JOIN ctxs c ON h.ctx = c.kc
        LEFT JOIN m23 x ON h.mid = x.km
        LEFT JOIN m2 m ON h.w2 = m.k2
        LEFT JOIN fw2 f ON h.w2 = f.b1
        LEFT JOIN pw3 p ON h.w3 = p.b2
        CROSS JOIN gl)
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_trigrams,
             CAST(sum(surprisal_micro) AS BIGINT) AS total_surprisal_micro,
             CAST(sum(surprisal_micro) AS DOUBLE) / count(*) / 1e6 AS mean_surprisal_nats
      FROM scored GROUP BY doc_id ORDER BY doc_id"""))

  /** TRIGRAM scoring under STUPID BACKOFF (Brants et al. 2007) — the
    * smoothing built FOR distributed engines: score(w₃|w₁w₂) =
    * c₁₂₃/c₁₂, backing off to α·c₂₃/c₂, then α·α·c₃/N (α = 0.4).
    * No discount mass to renormalize means every stat is a plain
    * grouped count and scoring is three left joins — exactly why
    * web-scale MapReduce LMs chose it over Kneser–Ney, whose
    * continuation normalization needs coordinated count-of-count
    * passes (this engine ships BOTH: [[kneserNey]] when quality
    * wins, this when the corpus is the web). Scores are not
    * normalized probabilities, so the output is the standard
    * backoff-LM log-score in micro-units plus a per-doc histogram of
    * which backoff level fired — the coverage diagnostic that tells
    * you whether the trigram table is earning its storage.
    *
    * Shape at 100 TB: three count tables (trigram/bigram/unigram
    * vocabulary-sized), heldout trigrams join each on its own key —
    * token-keyed hash joins, AQE-splittable, nothing pairwise. */
  /** Core stupid-backoff pass over explicit train/heldout (doc_id,
    * text) frames — factored for hand-corpus specs. */
  def stupidBackoffOf(train: DataFrame, held0: DataFrame): DataFrame = {
      def gramFrame(df: DataFrame, n: Int): DataFrame =
        df.select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
          .where(size(col("w")) >= n)
          .select(col("doc_id"),
            explode(transform(sequence(lit(0), size(col("w")) - n),
              i => concat_ws(" ", slice(col("w"), i + lit(1), lit(n))))).as("g"))
      val c3 = gramFrame(train, 3).groupBy("g").agg(count(lit(1)).as("c123"))
        .withColumnRenamed("g", "g3")
      val c2 = gramFrame(train, 2).groupBy("g").agg(count(lit(1)).as("c12"))
        .withColumnRenamed("g", "g2")
      val c1 = gramFrame(train, 1).groupBy("g").agg(count(lit(1)).as("c1"))
        .withColumnRenamed("g", "g1")
      val nTot = train.select(explode(tokens(col("text"))).as("tok"))
        .agg(count(lit(1)).as("n_total"))
      val held = held0
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
        .where(size(col("w")) >= 3)
        .select(col("doc_id"),
          explode(transform(sequence(lit(0), size(col("w")) - 3),
            i => struct(
              concat_ws(" ", slice(col("w"), i + lit(1), lit(3))).as("tri"),
              concat_ws(" ", slice(col("w"), i + lit(1), lit(2))).as("ctx"),
              concat_ws(" ", slice(col("w"), i + lit(2), lit(2))).as("bi"),
              element_at(col("w"), i + lit(2)).as("mid"),
              element_at(col("w"), i + lit(3)).as("last")))).as("e"))
        .select(col("doc_id"), col("e.tri").as("tri"), col("e.ctx").as("ctx"),
          col("e.bi").as("bi"), col("e.mid").as("mid"), col("e.last").as("last"))
      held
        .join(c3, col("tri") === col("g3"), "left")
        .join(c2.withColumnRenamed("c12", "cctx"), col("ctx") === col("g2"), "left")
        .join(c2.withColumnRenamed("g2", "g2b").withColumnRenamed("c12", "c23"),
          col("bi") === col("g2b"), "left")
        .join(c1.withColumnRenamed("c1", "cmid"), col("mid") === col("g1"), "left")
        .join(c1.withColumnRenamed("g1", "g1b").withColumnRenamed("c1", "clast"),
          col("last") === col("g1b"), "left")
        .crossJoin(broadcast(nTot))
        .select(col("doc_id"),
          when(coalesce(col("c123"), lit(0L)) > 0, lit(0L))
            .when(coalesce(col("c23"), lit(0L)) > 0, lit(1L))
            .otherwise(lit(2L)).as("level"),
          round(-log(
            when(coalesce(col("c123"), lit(0L)) > 0,
              col("c123").cast("double") / col("cctx").cast("double"))
            .when(coalesce(col("c23"), lit(0L)) > 0,
              lit(0.4) * (col("c23").cast("double") / col("cmid").cast("double")))
            .otherwise(
              lit(0.4) * lit(0.4) *
                ((coalesce(col("clast"), lit(0L)) + lit(1.0)) /
                  (col("n_total") + lit(1.0))))) * 1e6, 0)
            .cast("long").as("score_micro"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_trigrams"),
          sum(col("score_micro")).as("total_score_micro"),
          sum(when(col("level") === 0L, 1L).otherwise(0L)).as("n_trigram_hits"),
          sum(when(col("level") === 1L, 1L).otherwise(0L)).as("n_bigram_backoffs"),
          sum(when(col("level") === 2L, 1L).otherwise(0L)).as("n_unigram_backoffs"))
        .orderBy("doc_id")
  }

  /** 4-GRAM stupid backoff — the trigram ladder ([[stupidBackoffOf]])
    * extended one level: score(w₄|w₁w₂w₃) = c₁₂₃₄/c₁₂₃, backing off
    * α·c₂₃₄/c₂₃ → α²·c₃₄/c₃ → α³·(c₄+1)/(N+1) (α = 0.4, add-1 floor
    * at the unigram). Four count tables instead of three, scoring is
    * seven token-keyed left joins, the per-doc histogram gains a
    * fourth backoff level — web-scale LMs run exactly this shape at
    * n = 5 (Brants et al.), and nothing in it is more than a grouped
    * count, so the n+1-th level is always one more join away. */
  def stupidBackoff4Of(train: DataFrame, held0: DataFrame): DataFrame = {
      def gramFrame(df: DataFrame, n: Int): DataFrame =
        df.select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
          .where(size(col("w")) >= n)
          .select(col("doc_id"),
            explode(transform(sequence(lit(0), size(col("w")) - n),
              i => concat_ws(" ", slice(col("w"), i + lit(1), lit(n))))).as("g"))
      def counts(n: Int, keyName: String, cName: String): DataFrame =
        gramFrame(train, n).groupBy("g").agg(count(lit(1)).as(cName))
          .withColumnRenamed("g", keyName)
      val c4g = counts(4, "k4", "c1234")
      val c3g = counts(3, "k3", "c3")
      val c2g = counts(2, "k2", "c2")
      val c1g = counts(1, "k1", "c1")
      val nTot = train.select(explode(tokens(col("text"))).as("tok"))
        .agg(count(lit(1)).as("n_total"))
      val held = held0
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
        .where(size(col("w")) >= 4)
        .select(col("doc_id"),
          explode(transform(sequence(lit(0), size(col("w")) - 4),
            i => struct(
              concat_ws(" ", slice(col("w"), i + lit(1), lit(4))).as("g4"),
              concat_ws(" ", slice(col("w"), i + lit(1), lit(3))).as("ctx3"),
              concat_ws(" ", slice(col("w"), i + lit(2), lit(3))).as("g3"),
              concat_ws(" ", slice(col("w"), i + lit(2), lit(2))).as("ctx2"),
              concat_ws(" ", slice(col("w"), i + lit(3), lit(2))).as("g2"),
              element_at(col("w"), i + lit(3)).as("ctx1"),
              element_at(col("w"), i + lit(4)).as("last")))).as("e"))
        .select(col("doc_id"), col("e.g4").as("g4"), col("e.ctx3").as("ctx3"),
          col("e.g3").as("g3"), col("e.ctx2").as("ctx2"), col("e.g2").as("g2"),
          col("e.ctx1").as("ctx1"), col("e.last").as("last"))
      held
        .join(c4g, col("g4") === col("k4"), "left")
        .join(c3g.withColumnRenamed("c3", "cctx3"), col("ctx3") === col("k3"), "left")
        .join(c3g.withColumnRenamed("k3", "k3b").withColumnRenamed("c3", "c234"),
          col("g3") === col("k3b"), "left")
        .join(c2g.withColumnRenamed("c2", "cctx2"), col("ctx2") === col("k2"), "left")
        .join(c2g.withColumnRenamed("k2", "k2b").withColumnRenamed("c2", "c34"),
          col("g2") === col("k2b"), "left")
        .join(c1g.withColumnRenamed("c1", "cctx1"), col("ctx1") === col("k1"), "left")
        .join(c1g.withColumnRenamed("k1", "k1b").withColumnRenamed("c1", "clast"),
          col("last") === col("k1b"), "left")
        .crossJoin(broadcast(nTot))
        .select(col("doc_id"),
          when(coalesce(col("c1234"), lit(0L)) > 0, lit(0L))
            .when(coalesce(col("c234"), lit(0L)) > 0, lit(1L))
            .when(coalesce(col("c34"), lit(0L)) > 0, lit(2L))
            .otherwise(lit(3L)).as("level"),
          round(-log(
            when(coalesce(col("c1234"), lit(0L)) > 0,
              col("c1234").cast("double") / col("cctx3").cast("double"))
            .when(coalesce(col("c234"), lit(0L)) > 0,
              lit(0.4) * (col("c234").cast("double") / col("cctx2").cast("double")))
            .when(coalesce(col("c34"), lit(0L)) > 0,
              lit(0.4) * lit(0.4) *
                (col("c34").cast("double") / col("cctx1").cast("double")))
            .otherwise(
              lit(0.4) * lit(0.4) * lit(0.4) *
                ((coalesce(col("clast"), lit(0L)) + lit(1.0)) /
                  (col("n_total") + lit(1.0))))) * 1e6, 0)
            .cast("long").as("score_micro"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_4grams"),
          sum(col("score_micro")).as("total_score_micro"),
          sum(when(col("level") === 0L, 1L).otherwise(0L)).as("n_4gram_hits"),
          sum(when(col("level") === 1L, 1L).otherwise(0L)).as("n_trigram_backoffs"),
          sum(when(col("level") === 2L, 1L).otherwise(0L)).as("n_bigram_backoffs"),
          sum(when(col("level") === 3L, 1L).otherwise(0L)).as("n_unigram_backoffs"))
        .orderBy("doc_id")
  }

  val stupidBackoff4: Q = Q(
    "q_lm_stupid_backoff4",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("b", Sampling.hashBucket(col("doc_id")))
      stupidBackoff4Of(docs.filter(col("b") < 80), docs.filter(col("b") >= 90))
    },
    Some("""
      WITH bucketed AS (
        SELECT doc_id, text,
               (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256 +
                ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100 AS b
        FROM documents),
      trainw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                 FROM bucketed WHERE b < 80),
      testw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                FROM bucketed WHERE b >= 90),
      c4 AS (SELECT g, CAST(count(*) AS BIGINT) AS c1234 FROM (
               SELECT t.w[s.k+1] || ' ' || t.w[s.k+2] || ' ' ||
                        t.w[s.k+3] || ' ' || t.w[s.k+4] AS g
               FROM trainw t, unnest(generate_series(0, len(t.w) - 4)) AS s(k)
               WHERE len(t.w) >= 4) GROUP BY g),
      c3 AS (SELECT g, CAST(count(*) AS BIGINT) AS c3 FROM (
               SELECT t.w[s.k+1] || ' ' || t.w[s.k+2] || ' ' || t.w[s.k+3] AS g
               FROM trainw t, unnest(generate_series(0, len(t.w) - 3)) AS s(k)
               WHERE len(t.w) >= 3) GROUP BY g),
      c2 AS (SELECT g, CAST(count(*) AS BIGINT) AS c2 FROM (
               SELECT t.w[s.k+1] || ' ' || t.w[s.k+2] AS g
               FROM trainw t, unnest(generate_series(0, len(t.w) - 2)) AS s(k)
               WHERE len(t.w) >= 2) GROUP BY g),
      c1 AS (SELECT g, CAST(count(*) AS BIGINT) AS c1 FROM (
               SELECT unnest(w) AS g FROM trainw) GROUP BY g),
      nt AS (SELECT CAST(count(*) AS BIGINT) AS n_total
             FROM (SELECT unnest(w) AS tok FROM trainw)),
      held AS (
        SELECT t.doc_id,
               t.w[s.k+1] || ' ' || t.w[s.k+2] || ' ' ||
                 t.w[s.k+3] || ' ' || t.w[s.k+4] AS g4,
               t.w[s.k+1] || ' ' || t.w[s.k+2] || ' ' || t.w[s.k+3] AS ctx3,
               t.w[s.k+2] || ' ' || t.w[s.k+3] || ' ' || t.w[s.k+4] AS g3,
               t.w[s.k+2] || ' ' || t.w[s.k+3] AS ctx2,
               t.w[s.k+3] || ' ' || t.w[s.k+4] AS g2,
               t.w[s.k+3] AS ctx1, t.w[s.k+4] AS last
        FROM testw t, unnest(generate_series(0, len(t.w) - 4)) AS s(k)
        WHERE len(t.w) >= 4),
      scored AS (
        SELECT h.doc_id,
               CASE WHEN coalesce(a.c1234, 0) > 0 THEN 0
                    WHEN coalesce(b3.c3, 0) > 0 THEN 1
                    WHEN coalesce(b2.c2, 0) > 0 THEN 2 ELSE 3 END AS level,
               CAST(round(-ln(
                 CASE WHEN coalesce(a.c1234, 0) > 0
                        THEN CAST(a.c1234 AS DOUBLE) / CAST(x3.c3 AS DOUBLE)
                      WHEN coalesce(b3.c3, 0) > 0
                        THEN 0.4 * (CAST(b3.c3 AS DOUBLE) / CAST(x2.c2 AS DOUBLE))
                      WHEN coalesce(b2.c2, 0) > 0
                        THEN 0.4 * 0.4 *
                          (CAST(b2.c2 AS DOUBLE) / CAST(x1.c1 AS DOUBLE))
                      ELSE 0.4 * 0.4 * 0.4 *
                        ((coalesce(l.c1, 0) + 1.0) / (n_total + 1.0))
                 END) * 1e6) AS BIGINT) AS score_micro
        FROM held h
        LEFT JOIN c4 a ON h.g4 = a.g
        LEFT JOIN c3 x3 ON h.ctx3 = x3.g
        LEFT JOIN c3 b3 ON h.g3 = b3.g
        LEFT JOIN c2 x2 ON h.ctx2 = x2.g
        LEFT JOIN c2 b2 ON h.g2 = b2.g
        LEFT JOIN c1 x1 ON h.ctx1 = x1.g
        LEFT JOIN c1 l ON h.last = l.g
        CROSS JOIN nt)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_4grams,
             CAST(sum(score_micro) AS BIGINT) AS total_score_micro,
             CAST(sum(CASE WHEN level = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_4gram_hits,
             CAST(sum(CASE WHEN level = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_trigram_backoffs,
             CAST(sum(CASE WHEN level = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bigram_backoffs,
             CAST(sum(CASE WHEN level = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_unigram_backoffs
      FROM scored GROUP BY doc_id ORDER BY doc_id"""))

  val stupidBackoff: Q = Q(
    "q_lm_stupid_backoff",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("b", Sampling.hashBucket(col("doc_id")))
      stupidBackoffOf(docs.filter(col("b") < 80), docs.filter(col("b") >= 90))
    },
    Some("""
      WITH bucketed AS (
        SELECT doc_id, text,
               (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256 +
                ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100 AS b
        FROM documents),
      trainw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                 FROM bucketed WHERE b < 80),
      testw AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                FROM bucketed WHERE b >= 90),
      c3 AS (SELECT g3, CAST(count(*) AS BIGINT) AS c123 FROM (
               SELECT t.w[s.k+1] || ' ' || t.w[s.k+2] || ' ' || t.w[s.k+3] AS g3
               FROM trainw t, unnest(generate_series(0, len(t.w) - 3)) AS s(k)
               WHERE len(t.w) >= 3) GROUP BY g3),
      c2 AS (SELECT g2, CAST(count(*) AS BIGINT) AS c12 FROM (
               SELECT t.w[s.k+1] || ' ' || t.w[s.k+2] AS g2
               FROM trainw t, unnest(generate_series(0, len(t.w) - 2)) AS s(k)
               WHERE len(t.w) >= 2) GROUP BY g2),
      c1 AS (SELECT g1, CAST(count(*) AS BIGINT) AS c1 FROM (
               SELECT unnest(w) AS g1 FROM trainw) GROUP BY g1),
      nt AS (SELECT CAST(count(*) AS BIGINT) AS n_total
             FROM (SELECT unnest(w) AS tok FROM trainw)),
      held AS (
        SELECT t.doc_id,
               t.w[s.k+1] || ' ' || t.w[s.k+2] || ' ' || t.w[s.k+3] AS tri,
               t.w[s.k+1] || ' ' || t.w[s.k+2] AS ctx,
               t.w[s.k+2] || ' ' || t.w[s.k+3] AS bi,
               t.w[s.k+2] AS mid, t.w[s.k+3] AS last
        FROM testw t, unnest(generate_series(0, len(t.w) - 3)) AS s(k)
        WHERE len(t.w) >= 3),
      scored AS (
        SELECT h.doc_id,
               CASE WHEN coalesce(a.c123, 0) > 0 THEN 0
                    WHEN coalesce(bb.c12, 0) > 0 THEN 1 ELSE 2 END AS level,
               CAST(round(-ln(
                 CASE WHEN coalesce(a.c123, 0) > 0
                        THEN CAST(a.c123 AS DOUBLE) / CAST(x.c12 AS DOUBLE)
                      WHEN coalesce(bb.c12, 0) > 0
                        THEN 0.4 * (CAST(bb.c12 AS DOUBLE) / CAST(m.c1 AS DOUBLE))
                      ELSE 0.4 * 0.4 *
                        ((coalesce(l.c1, 0) + 1.0) / (n_total + 1.0))
                 END) * 1e6) AS BIGINT) AS score_micro
        FROM held h
        LEFT JOIN c3 a ON h.tri = a.g3
        LEFT JOIN c2 x ON h.ctx = x.g2
        LEFT JOIN c2 bb ON h.bi = bb.g2
        LEFT JOIN c1 m ON h.mid = m.g1
        LEFT JOIN c1 l ON h.last = l.g1
        CROSS JOIN nt)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
             CAST(sum(score_micro) AS BIGINT) AS total_score_micro,
             CAST(sum(CASE WHEN level = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_trigram_hits,
             CAST(sum(CASE WHEN level = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bigram_backoffs,
             CAST(sum(CASE WHEN level = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_unigram_backoffs
      FROM scored GROUP BY doc_id ORDER BY doc_id"""))

  /** Shared Spark∩DuckDB OLS-slope/intercept text over the exact
    * integer moments (n, sx, sy, sxy, sxx) — one fixed-order double
    * chain, the [[graft.llm.Ridge]] shared-string discipline for the
    * 1-D regression. */
  private val zipfSlopeSql =
    "((cast(n as double) * cast(sxy as double) - cast(sx as double) * cast(sy as double))" +
      " / (cast(n as double) * cast(sxx as double) - cast(sx as double) * cast(sx as double)))"
  private val zipfInterceptSql =
    s"((cast(sy as double) / cast(n as double)) - $zipfSlopeSql * (cast(sx as double) / cast(n as double)))"

  /** ZIPF rank–frequency fit — the corpus-health diagnostic: natural
    * language sits near slope −1 on the log-log rank/frequency line;
    * template-generated or deduplicate-starved corpora drift flat
    * (repetitious heads) or steep (truncated tails). OLS over
    * (ln rank, ln count) with BOTH logs rounded once to integer
    * MILLI-nats so the four moments are exact BIGINT (aggregation
    * order can't perturb them; milli keeps xy ≈ 3·10⁸ per word —
    * envelope safe through ~10¹⁰ vocabulary entries), and the final
    * slope/intercept are one shared-text double chain.
    *
    * Scale shape: one tokenize+count pass to the vocab frame; the
    * rank window runs over the AGGREGATED vocabulary (never the
    * corpus), then one 5-cell moment aggregate. */
  /** Core fit over any (w, cnt) vocabulary frame. */
  def zipfFitOf(vocab: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = vocab.withColumn("rank",
      row_number().over(Window.orderBy(col("cnt").desc, col("w").asc))
        .cast("long"))
    val pts = ranked.select(
      round(log(col("rank").cast("double")) * 1e3, 0).cast("long").as("x"),
      round(log(col("cnt").cast("double")) * 1e3, 0).cast("long").as("y"))
    pts.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n").as("n_words"),
        expr(s"cast(round($zipfSlopeSql * 1e6) as bigint)").as("slope_micro"),
        expr(s"cast(round($zipfInterceptSql) as bigint)").as("intercept_milli"))
  }

  val zipfFit: Q = Q(
    "q_zipf_fit",
    (s, dir) => zipfFitOf(
      t(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("cnt"))),
    Some(s"""
      WITH vocab AS (
        SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
          SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
          FROM documents) tk
        WHERE w <> ''
        GROUP BY w),
      ranked AS (
        SELECT cnt, CAST(row_number() OVER (ORDER BY cnt DESC, w ASC)
          AS BIGINT) AS rank
        FROM vocab),
      pts AS (
        SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1e3) AS BIGINT) AS x,
               CAST(round(ln(CAST(cnt AS DOUBLE)) * 1e3) AS BIGINT) AS y
        FROM ranked),
      m AS MATERIALIZED (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM pts)
      SELECT n AS n_words,
             CAST(round($zipfSlopeSql * 1e6) AS BIGINT) AS slope_micro,
             CAST(round($zipfInterceptSql) AS BIGINT) AS intercept_milli
      FROM m"""))

  /** CHAO1 VOCABULARY-RICHNESS ESTIMATE — "how many word types exist
    * that this corpus hasn't shown yet", the species-richness
    * question a tokenizer/vocab budget decision needs answered
    * before committing to a vocab size. Chao1 reads the unseen mass
    * from the rare tail: V̂ = V + f₁(f₁−1)/(2(f₂+1)) (the
    * bias-corrected form — finite even with no doubletons), where
    * f₁/f₂ are singleton/doubleton type counts. The same tail gives
    * Good–Turing sample coverage C = 1 − f₁/N ([[goodTuring]]
    * estimates FREQUENCIES from the count-of-counts; this estimates
    * the INVENTORY — same table, different question).
    *
    * Exact: one token explode → type counts → count-of-counts; V,
    * f₁, f₂, N are BIGINTs and both surfaced estimates floor-divide
    * once (nonnegative). Scale shape: the explode is scan-shaped,
    * the type aggregate is the corpus-keyed shuffle every text query
    * pays, and the count-of-counts frame is tail-domain-sized. */
  val chao1: Q = Q(
    "q_chao1",
    (s, dir) => {
      val tok = t(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
      val types = tok.groupBy("tok").agg(count(lit(1)).as("c"))
      types.agg(
          count(lit(1)).as("v_seen"),
          sum(col("c")).as("n_tokens"),
          sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
          sum(when(col("c") === 2L, 1L).otherwise(0L)).as("f2"))
        .selectExpr("v_seen", "n_tokens", "f1", "f2",
          "v_seen + (f1 * (f1 - 1)) div (2 * (f2 + 1)) AS v_chao1",
          "1000 - (1000 * f1) div n_tokens AS coverage_permille")
    },
    Some("""
      WITH tok AS (
        SELECT t AS tok FROM (
          SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
          FROM documents)
        WHERE t <> ''),
      types AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY tok),
      agg AS (
        SELECT CAST(count(*) AS BIGINT) AS v_seen,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
               CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        FROM types)
      SELECT v_seen, n_tokens, f1, f2,
             CAST(v_seen + (f1 * (f1 - 1)) // (2 * (f2 + 1)) AS BIGINT) AS v_chao1,
             CAST(1000 - (1000 * f1) // n_tokens AS BIGINT) AS coverage_permille
      FROM agg"""))

  /** SPECTRAL TERM EMBEDDING — power iteration on the positive-PMI
    * co-occurrence matrix, the LSA core (count-based spectral
    * embeddings are PMI factorizations — Levy & Goldberg 2014): the
    * dominant eigenvector of PPMI scores each vocabulary term by its
    * loading on the corpus's strongest association axis, the
    * one-dimension version of every count-based embedding. Vocabulary
    * = top-40 tokens by document frequency; M(i,j) = ⌊1e6·max(0,
    * ln(c_ij·N/(c_i·c_j)))⌉ from document-level co-occurrence; four
    * power steps x ← ⌊1000·Mx/max(Mx)⌋ from the all-ones vector; the
    * max-normalization makes max(Mx)/1000 a direct Rayleigh-style
    * eigenvalue readout in micro units.
    *
    * Determinism: each PMI cell is ONE rounded IEEE ln of exact
    * BIGINT cross products (the [[graft.llm.Drift.psi]] recipe);
    * every power step is integer matrix-vector sums plus one floored
    * normalization, so the trajectory is engine-identical and the
    * oracle unrolls the same four steps as chained CTEs.
    *
    * Scale shape: postings prune to the vocabulary by broadcast
    * semi-join BEFORE the per-document pair build (so pairs are
    * |docs|·hits², hits ≤ 40 — never corpus×corpus); the matrix and
    * every iterate are vocab-domain frames (≤1.6k cells). */
  val pmiSpectral: Q = Q(
    "q_pmi_spectral",
    (s, dir) => {
      // ONE explode+distinct pass feeds both the df vocabulary and the
      // pair build (unpersisted it re-ran — measured 11 s → the fix)
      val post = t(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "").distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = t(s, dir, "documents").agg(count(lit(1)).as("nd")).limit(1)
      val vocab = post.groupBy("tok").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("tok").asc).limit(40)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val vp = post.join(broadcast(vocab.select("tok")), "tok")
      val pairs = vp.as("a").join(vp.as("b"),
          col("a.doc_id") === col("b.doc_id") && col("a.tok") =!= col("b.tok"))
        .groupBy(col("a.tok").as("ti"), col("b.tok").as("tj"))
        .agg(count(lit(1)).as("cij"))
      val m = pairs
        .join(broadcast(vocab.select(col("tok").as("ti"), col("df").as("ci"))), "ti")
        .join(broadcast(vocab.select(col("tok").as("tj"), col("df").as("cj"))), "tj")
        .crossJoin(broadcast(nDocs))
        .selectExpr("ti", "tj",
          """greatest(CAST(0 AS BIGINT),
             CAST(round(1000000.0 * ln((CAST(cij AS DOUBLE) * nd)
               / (CAST(ci AS DOUBLE) * cj))) AS BIGINT)) AS m""")
        .filter(col("m") > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // the PPMI matrix is vocab²-bounded (≤1600 cells) — collect it
      // and fold the four power steps in the driver (the ucbReplay /
      // MMR bounded-fold discipline; the first spelling iterated with
      // per-step broadcast jobs and paid ~5 serial job barriers for
      // 40-row arithmetic — measured 12 s at sf0.1, the corpus scan
      // itself being ~half)
      val cells = m.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2)))
      val toks = cells.flatMap(c => Seq(c._1, c._2)).distinct.sorted
      var x = toks.map(_ -> 1000L).toMap
      for (_ <- 1 to 4) {
        val y = toks.map(t => t -> cells.collect {
          case (ti, tj, v) if ti == t => v * x(tj) }.sum).toMap
        val mx = y.values.max
        x = y.view.mapValues(v => 1000L * v / mx).toMap
      }
      val lam = toks.map(t => cells.collect {
        case (ti, tj, v) if ti == t => v * x(tj) }.sum).max / 1000L
      import s.implicits._
      x.toSeq.sortBy { case (t, v) => (-v, t) }.take(10)
        .map { case (t, v) => (t, v, lam) }
        .toDF("tok", "loading_milli", "lambda_micro")
        .coalesce(1).orderBy(col("loading_milli").desc, col("tok").asc)
    },
    Some("""
      WITH post AS (
        SELECT DISTINCT doc_id, t AS tok FROM (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
          FROM documents)
        WHERE t <> ''),
      nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
      vocab AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY tok
        ORDER BY df DESC, tok ASC LIMIT 40),
      vp AS MATERIALIZED (SELECT post.doc_id, post.tok FROM post JOIN vocab USING (tok)),
      pairs AS MATERIALIZED (
        SELECT a.tok AS ti, b.tok AS tj, CAST(count(*) AS BIGINT) AS cij
        FROM vp a JOIN vp b ON a.doc_id = b.doc_id AND a.tok <> b.tok
        GROUP BY 1, 2),
      m AS MATERIALIZED (
        SELECT ti, tj,
               greatest(CAST(0 AS BIGINT),
                 CAST(round(1000000.0 * ln((CAST(cij AS DOUBLE) * nd.nd)
                   / (CAST(vi.df AS DOUBLE) * vj.df))) AS BIGINT)) AS m
        FROM pairs
        JOIN vocab vi ON pairs.ti = vi.tok
        JOIN vocab vj ON pairs.tj = vj.tok
        CROSS JOIN nd),
      mp AS MATERIALIZED (SELECT * FROM m WHERE m > 0),
      x0 AS MATERIALIZED (SELECT tok AS tj, CAST(1000 AS BIGINT) AS x FROM vocab),
      y1 AS MATERIALIZED (SELECT ti, CAST(sum(m * x) AS BIGINT) AS y
             FROM mp JOIN x0 USING (tj) GROUP BY ti),
      x1 AS MATERIALIZED (SELECT ti AS tj, (1000 * y) // (SELECT max(y) FROM y1) AS x FROM y1),
      y2 AS MATERIALIZED (SELECT ti, CAST(sum(m * x) AS BIGINT) AS y
             FROM mp JOIN x1 USING (tj) GROUP BY ti),
      x2 AS MATERIALIZED (SELECT ti AS tj, (1000 * y) // (SELECT max(y) FROM y2) AS x FROM y2),
      y3 AS MATERIALIZED (SELECT ti, CAST(sum(m * x) AS BIGINT) AS y
             FROM mp JOIN x2 USING (tj) GROUP BY ti),
      x3 AS MATERIALIZED (SELECT ti AS tj, (1000 * y) // (SELECT max(y) FROM y3) AS x FROM y3),
      y4 AS MATERIALIZED (SELECT ti, CAST(sum(m * x) AS BIGINT) AS y
             FROM mp JOIN x3 USING (tj) GROUP BY ti),
      x4 AS MATERIALIZED (SELECT ti AS tj, (1000 * y) // (SELECT max(y) FROM y4) AS x FROM y4),
      y5 AS MATERIALIZED (SELECT ti, CAST(sum(m * x) AS BIGINT) AS y
             FROM mp JOIN x4 USING (tj) GROUP BY ti),
      lam AS (SELECT CAST(max(y) // 1000 AS BIGINT) AS lambda_micro FROM y5)
      SELECT x4.tj AS tok, CAST(x4.x AS BIGINT) AS loading_milli, lam.lambda_micro
      FROM x4 CROSS JOIN lam
      ORDER BY loading_milli DESC, tok ASC LIMIT 10"""))

  /** HEAPS' LAW — vocabulary growth over crawl order, the corpus-
    * planning twin of [[zipfFit]] (Zipf says how frequencies decay;
    * Heaps says how many NEW types the next shard of crawl will add —
    * V(n) ≈ K·n^β, and the fitted β is the saturation forecast every
    * "do we need more data" decision reads). Documents are split into
    * ten crawl-order buckets (doc_id order); each type is credited to
    * its FIRST bucket (min-bucket per type — one aggregate, no
    * running dedup state); the output is the cumulative
    * (tokens, types) curve with β fitted by the [[zipfFit]] OLS
    * recipe on the micro-ln points of all ten cumulative steps.
    *
    * Determinism: bucket = (doc_id·10) div N (explicit grid); ln
    * points round once to milli; the OLS slope is one sign-split
    * division of exact BIGINT moment cross-products. Scale shape:
    * one token explode, one type-keyed min-bucket aggregate, a
    * 10-row curve. */
  val heapsLaw: Q = Q(
    "q_heaps_law",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      val nd = docs.agg(count(lit(1)).as("nd")).limit(1)
      val tok = docs.crossJoin(broadcast(nd))
        .select(expr("(doc_id * 10) div nd").as("b"),
          explode(tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
      val tokensPerB = tok.groupBy("b").agg(count(lit(1)).as("n_tok"))
      val firstSeen = tok.groupBy("tok").agg(min(col("b")).as("b"))
        .groupBy("b").agg(count(lit(1)).as("new_types"))
      val wCum = Window.orderBy("b")
      val curve = tokensPerB.join(firstSeen, Seq("b"), "left")
        .select(col("b"), col("n_tok"),
          coalesce(col("new_types"), lit(0L)).as("new_types"))
        .withColumn("tokens_cum", sum(col("n_tok")).over(wCum))
        .withColumn("types_cum", sum(col("new_types")).over(wCum))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pts = curve.select(
        expr("CAST(round(1000.0 * ln(CAST(tokens_cum AS DOUBLE))) AS BIGINT)").as("x"),
        expr("CAST(round(1000.0 * ln(CAST(types_cum AS DOUBLE))) AS BIGINT)").as("y"))
      val beta = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .selectExpr(
          """CASE WHEN n * sxy - sx * sy >= 0
               THEN (1000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)
               ELSE -((1000 * (sx * sy - n * sxy)) div (n * sxx - sx * sx))
             END AS beta_milli""").limit(1)
      curve.crossJoin(broadcast(beta))
        .select(col("b").as("bucket"), col("n_tok"), col("new_types"),
          col("tokens_cum"), col("types_cum"), col("beta_milli"))
        .orderBy("bucket")
    },
    Some("""
      WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
      tok AS MATERIALIZED (
        SELECT (doc_id * 10) // nd AS b, t AS tok FROM (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
          FROM documents) CROSS JOIN nd
        WHERE t <> ''),
      tpb AS (SELECT b, CAST(count(*) AS BIGINT) AS n_tok FROM tok GROUP BY b),
      fs AS (SELECT b, CAST(count(*) AS BIGINT) AS new_types FROM (
               SELECT tok, min(b) AS b FROM tok GROUP BY tok) GROUP BY b),
      curve AS MATERIALIZED (
        SELECT tpb.b, tpb.n_tok,
               CAST(coalesce(fs.new_types, 0) AS BIGINT) AS new_types,
               CAST(sum(tpb.n_tok) OVER (ORDER BY tpb.b
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tokens_cum,
               CAST(sum(coalesce(fs.new_types, 0)) OVER (ORDER BY tpb.b
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS types_cum
        FROM tpb LEFT JOIN fs ON tpb.b = fs.b),
      pts AS (
        SELECT CAST(round(1000.0 * ln(CAST(tokens_cum AS DOUBLE))) AS BIGINT) AS x,
               CAST(round(1000.0 * ln(CAST(types_cum AS DOUBLE))) AS BIGINT) AS y
        FROM curve),
      beta AS (
        SELECT CAST(CASE WHEN n * sxy - sx * sy >= 0
                 THEN (1000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
                 ELSE -((1000 * (sx * sy - n * sxy)) // (n * sxx - sx * sx))
               END AS BIGINT) AS beta_milli
        FROM (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(x * x) AS BIGINT) AS sxx
              FROM pts))
      SELECT b AS bucket, n_tok, new_types, tokens_cum, types_cum, beta_milli
      FROM curve CROSS JOIN beta
      ORDER BY bucket"""))

  val all: Seq[Q] = Seq(tokenCount, quality, langId, fingerprint,
    repetitionRatio, rollingFingerprint, winnowing, winnowSpans,
    contamination, decontaminateBatch, vocabTopK,
    oovRate, lmSurprisal,
    ngramNovelty, vocabNucleus, klDivergence, heldoutPerplexity,
    bigramPerplexity, unigramEntropy, qualityGate, topicTerms, compressRatio,
    spearman, rhoSelect, kneserNey, kneserNeyMod, kneserNeyTrigram, stupidBackoff,
    stupidBackoff4, goodTuring, zipfFit, chao1, pmiSpectral, heapsLaw)
}
