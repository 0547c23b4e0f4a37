package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{And, EqualTo, Filter, In, IsNotNull, IsNull, Or, StringContains, StringEndsWith, StringStartsWith}
import org.apache.spark.sql.types.{StructField, StructType, StringType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Ingest

/** DataSource V2 connector with the reference's paginated-ingest
  * semantics (S1, reference `lambda_function.py:24-54`): a page-based
  * source where each page is one `InputPartition` (pages fetch in
  * parallel across executors — the Spark-native form of the
  * reference's serial `offset += limit` loop), with `limit`-sized
  * pages and a `max_records` truncation cap.
  *
  * Three transports, selected by option:
  *
  *  - default: the embedded SAM fixture ([[Ingest.fixture]]);
  *  - `path`: a JSON-lines file, so multi-partition paging is
  *    exercised with real volume (one InputPartition per page, byte
  *    offsets precomputed at planning);
  *  - `url`: REAL HTTP with the reference's exact pager semantics
  *    (reference `lambda_function.py:29-54`): serial `offset += limit`
  *    loop, `timeout_ms` connect/read timeout (default 10 000 ms,
  *    `:40` — a timeout PROPAGATES and fails the read, like the
  *    reference's uncaught requests exception), a non-200 response
  *    stops the loop KEEPING the records fetched so far (`:41-43`),
  *    and the loop ends on a short page or at `max_records`
  *    (`:49,54`). Offset-paged HTTP APIs are inherently serial (page
  *    N+1's existence is only known after page N), so the url
  *    transport is ONE InputPartition per pager; at scale,
  *    parallelism comes from running many pagers — one per predicate
  *    shard (date range / keyword), the standard pattern for such
  *    APIs — not from splitting one offset sequence.
  *
  * Schema is the explicit SAM StructType (no inference — SURVEY.md §1
  * makes the implicit reference schema explicit).
  *
  * Usage: spark.read.format("graft.sources.PagedJsonSource")
  *   .option("page_size", 3).option("max_records", 500)
  *   .option("path", "/path/records.jsonl")   // optional
  *   .option("url", "http://host/search")     // optional (wins over path)
  *   .load()
  */
class PagedJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Ingest.samSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedJsonTable(schema, properties.asScala.toMap)
}

final class PagedJsonTable(schema0: StructType, props: Map[String, String])
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = "paged_json_fixture"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE)

  /** WRITE side of the connector — the landing-file producer the
    * streaming scaladoc prescribes ("land pages into a file and
    * stream that"), with the TRANSACTIONAL two-phase protocol DSv2
    * batch writes are specified around:
    *
    *  1. every task writes its partition to a PRIVATE staged file
    *     `_staging_<queryId>/part-<partition>-<task>.jsonl` (the task
    *     id makes retried/speculative attempts collide-free);
    *  2. task `commit()` returns the staged path as its commit
    *     message — Spark's output-commit coordinator guarantees at
    *     most one attempt per partition commits;
    *  3. job `commit(messages)` concatenates ONLY the committed
    *     files, in partition order, into the table's single
    *     JSON-lines log `records.jsonl`, marks `_SUCCESS`, and drops
    *     the staging dir — so readers see the whole write or none of
    *     it, and an uncommitted zombie attempt's file is never
    *     promoted; job `abort()` removes the staging dir entirely.
    *
    * Rows serialize through Jackson (strings + the nested
    * officeAddress struct), so escaping is exact by construction and
    * the write→read roundtrip is byte-faithful. The `path` option is
    * the table DIRECTORY; the single-log layout matches the read
    * transport (one JSON-lines file) — at cluster scale the commit
    * would rename per-partition files into the directory instead of
    * concatenating (same protocol, different promote step), noted
    * here because local-fs concatenation is the single-log analog. */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    // Fail fast at PLAN time on any non-string leaf: the row
    // serializer reads every leaf as UTF8String (the SAM record shape
    // — all-string fields plus one struct-of-strings address), so a
    // LongType column passed through the advertised BATCH_WRITE
    // capability would otherwise surface as an opaque executor
    // ClassCastException mid-job. Callers cast to string explicitly —
    // a JSON-lines landing log has no richer types to preserve.
    def assertStringLeaves(st: StructType, where: String): Unit =
      st.fields.foreach { f =>
        f.dataType match {
          case sub: StructType => assertStringLeaves(sub, s"$where${f.name}.")
          case org.apache.spark.sql.types.StringType => ()
          case other => throw new IllegalArgumentException(
            s"PagedJsonSource write supports only STRING leaves; column " +
              s"'$where${f.name}' is $other — cast it to string before writing")
        }
      }
    assertStringLeaves(info.schema(), "")
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch: org.apache.spark.sql.connector.write.BatchWrite = {
            val dir = Option(info.options.get("path")).orElse(props.get("path"))
              .getOrElse(throw new IllegalArgumentException(
                "PagedJsonSource write needs a `path` directory option"))
            new PagedJsonBatchWrite(dir, info.queryId(), info.schema())
          }
        }
    }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch with SupportsPushDownRequiredColumns
        with SupportsPushDownLimit with SupportsPushDownOffset
        with SupportsPushDownFilters with SupportsPushDownAggregates
        with SupportsRuntimeFiltering {
      private val pageSize = options.getInt("page_size", 100)
      private val maxRecords = options.getInt("max_records", 500)
      private val path = Option(options.get("path"))
      private val url = Option(options.get("url"))
      // reference timeout=10 s (lambda_function.py:40)
      private val timeoutMs = options.getInt("timeout_ms", 10000)

      /** Column pruning pushed INTO the source: the row parser fills
        * exactly the requested fields (nested officeAddress subfields
        * included — Catalyst passes a pruned struct), so a 2-column
        * projection never materializes the other 7 strings per
        * record. Over a paged API this is the difference between
        * shipping the whole payload into rows and shipping the
        * projection — the DSv2 analog of parquet's ReadSchema. */
      private var required: StructType = schema0
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      /** LIMIT pushed into the pager: `df.limit(n)` tightens the
        * record cap BEFORE partition planning, so pages past the
        * limit are never planned, fetched, or parsed — the
        * `max_records` truncation semantics (reference :49,54)
        * driven by the query instead of an option. Partial push
        * (return false) would also be correct; returning true is
        * exact here because pages preserve record order and the
        * planner caps the page count. */
      private var limit: Int = Int.MaxValue
      override def pushLimit(n: Int): Boolean =
        // with a pushed filter, LIMIT counts FILTERED rows — which
        // planning-time page math cannot; decline and let Spark keep
        // the operator (filters push first, limits after)
        if (filters.nonEmpty) false else { limit = n; true }
      override def isPartiallyPushed(): Boolean = false

      /** OFFSET pushed into the pager — completes the pushdown
        * quartet (prune / LIMIT / COUNT(*) / OFFSET). Spark only
        * pushes OFFSET after the adjacent LIMIT (if any) was fully
        * pushed, and the limit it pushes is always counted from row
        * 0 of the stream (for `df.offset(n).limit(m)` it pushes
        * `limit(n + m)` then `offset(n)`; for `df.limit(m).offset(n)`
        * it pushes `limit(m)` then `offset(n)`) — so the emitted
        * range is uniformly `[offset, min(max_records, limit))`.
        * Planning skips WHOLE pages below the offset (their bytes are
        * never read); when `offset % page_size ≠ 0` the first planned
        * page seeks to its precomputed byte offset and drops the
        * in-page prefix — the re-alignment is `drop` lines within ONE
        * page, never a scan of the skipped pages. */
      private var offset: Int = 0
      override def pushOffset(n: Int): Boolean =
        // see pushLimit: a pushed filter changes what OFFSET counts
        if (filters.nonEmpty) false else { offset = n; true }

      /** FILTER pushdown — predicates evaluated on the parsed JSON
        * node BEFORE an InternalRow is built, so filtered-out records
        * never materialize (JSON-lines records must still be parsed
        * to test, so the win is row materialization and the removed
        * downstream FilterExec, not I/O — unlike parquet there is no
        * sub-record layout to skip). Accepted: the NULL-REJECTING
        * whitelist [[SamFilterEval.supported]] (EqualTo / IsNull /
        * IsNotNull / string matchers / In, And/Or of those) — for
        * these, two-valued "matches" coincides with SQL's IS TRUE
        * keep-semantics on nulls; Not does NOT (NOT(x) IS TRUE needs
        * x IS FALSE, unrecoverable from IS TRUE), so it stays
        * residual. Pushed filters interact with the other pushdowns:
        * LIMIT/OFFSET count FILTERED rows, which planning-time page
        * byte offsets cannot, and a planning-time COUNT(*) would
        * count raw records — all three decline when a filter is
        * pushed (Spark keeps those operators; results stay exact). */
      private var filters: Array[Filter] = Array.empty
      override def pushFilters(fs: Array[Filter]): Array[Filter] = {
        val (ok, residual) = fs.partition(SamFilterEval.supported)
        filters = ok
        residual
      }
      override def pushedFilters(): Array[Filter] = filters

      /** COUNT(*) answered at PLANNING time: the fixture size / the
        * JSON-lines line count are already known from the planning
        * pass, so an ungrouped count never fetches or parses a single
        * record — one metadata partition emits the capped total. The
        * HTTP pager declines the push (its total is only discoverable
        * by paging, which is exactly the work pushdown exists to
        * avoid). */
      private var countStar = false
      override def supportCompletePushDown(
          agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
        filters.isEmpty && // a planning-time count would count RAW records
        url.isEmpty && agg.groupByExpressions().isEmpty &&
          agg.aggregateExpressions().length == 1 &&
          agg.aggregateExpressions()(0)
            .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]
      override def pushAggregation(
          agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
        val ok = supportCompletePushDown(agg)
        if (ok) countStar = true
        ok
      }

      override def build(): Scan = this
      override def readSchema(): StructType =
        if (countStar)
          StructType(Seq(StructField("count(*)", org.apache.spark.sql.types.LongType)))
        else required
      override def toBatch: Batch = this

      /** One InputPartition per page — the unit of parallel fetch.
        * Page count derives from the known record total (fixture
        * size, or a driver-side scan of the JSON-lines file — the
        * analog of reading a totalRecords field from page 0 of a
        * paged API; an HTTP variant without one would fetch until a
        * short page). The same single driver pass records the BYTE
        * OFFSET where each page starts, so executor page tasks seek
        * straight to their slice — without offsets a `skip(n)` still
        * parses every preceding line, making total work O(pages ×
        * file) instead of O(file). */
      override def planInputPartitions(): Array[InputPartition] = {
        // HTTP: one serial pager (see class scaladoc — offset paging
        // cannot be split; shard the QUERY, not the offsets)
        val cap = math.min(maxRecords.toLong, limit.toLong).toInt
        if (url.isDefined)
          return Array(HttpPagerPartition(url.get, pageSize, offset, cap, timeoutMs, runtimeFs))
        val (available, offsets): (Int, Array[Long]) = path match {
          case Some(p) =>
            val in = new java.io.BufferedInputStream(
              java.nio.file.Files.newInputStream(java.nio.file.Paths.get(p)), 1 << 16)
            try {
              val offs = scala.collection.mutable.ArrayBuffer(0L)
              var lines = 0; var pos = 0L; var lastNl = true
              var b = in.read()
              while (b >= 0) {
                pos += 1
                lastNl = b == '\n'
                if (lastNl) {
                  lines += 1
                  if (lines % pageSize == 0) offs += pos
                }
                b = in.read()
              }
              // a final line without trailing newline still counts
              // (matching Files.lines semantics)
              if (!lastNl && pos > 0) lines += 1
              (lines, offs.toArray)
            } finally in.close()
          case None => (Ingest.fixture.size, Array(0L))
        }
        val total = math.min(available, cap)
        if (countStar) return Array(CountPartition(math.max(total - offset, 0).toLong))
        // pages wholly below the pushed offset are never planned;
        // the first surviving page drops its in-page prefix
        val firstPage = offset / pageSize
        val pages = (total + pageSize - 1) / pageSize
        (firstPage until pages).map(i =>
          PagePartition(i, pageSize, total, path,
            offsets(math.min(i, offsets.length - 1)),
            if (i == firstPage) offset - firstPage * pageSize else 0,
            runtimeFs): InputPartition).toArray
      }

      /** RUNTIME filtering (the DSv2 dynamic-pruning hook): when this
        * source sits under a selective join, Spark builds the join
        * keys at runtime and hands them here as In/EqualTo filters
        * BEFORE partitions are read — the v2 analog of dynamic
        * partition pruning. Semantics are best-effort pruning (the
        * join above still filters), so applying them row-level
        * through the same [[SamFilterEval]] whitelist is always
        * sound — EXCEPT under a pushed LIMIT/OFFSET, where dropping
        * rows would change WHICH first-n raw rows the scan emits;
        * those scans advertise no filterable attributes and ignore
        * late filters, which the contract explicitly permits. */
      private var runtimeFs: Array[Filter] = Array.empty
      override def filterAttributes()
          : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
        if (limit != Int.MaxValue || offset != 0 || countStar) Array.empty
        else schema0.fields.map(f =>
          org.apache.spark.sql.connector.expressions.Expressions.column(f.name))
      override def filter(fs: Array[Filter]): Unit =
        if (limit == Int.MaxValue && offset == 0 && !countStar)
          runtimeFs = fs.filter(SamFilterEval.supported)

      override def createReaderFactory(): PartitionReaderFactory =
        new PagedReaderFactory(required, filters)

      /** STREAMING read — the reference's poll-and-ingest loop as a
        * Structured Streaming source: the offset is the BYTE POSITION
        * in a growing JSON-lines file (the usual log-tailing
        * contract: the writer appends whole lines), each micro-batch
        * admits at most `stream_batch_bytes` (default 1 MiB) past the
        * last committed position, and a batch's byte range splits
        * into page-sized partitions at line boundaries exactly like
        * the batch planner. Column pruning and pushed filters apply
        * unchanged (Spark runs the same pushdown for streaming
        * relations); LIMIT/COUNT(*) pushdown are batch-only concepts
        * and never reach this path. Only the `path` transport
        * streams — the embedded fixture has no growth to tail and an
        * offset-paged HTTP API has no replayable position, which is
        * precisely why production pagers land records into files (or
        * a log) FIRST and stream from there. */
      override def toMicroBatchStream(checkpointLocation: String)
          : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
        val p = path.getOrElse(throw new IllegalArgumentException(
          "streaming requires the JSON-lines `path` transport (the fixture " +
            "has no growth to tail; an offset-paged HTTP API has no " +
            "replayable position — land pages to a file and stream that)"))
        new PagedMicroBatchStream(p, pageSize,
          options.getLong("stream_batch_bytes", 1L << 20), required, filters)
      }
    }
}

/** Commit message of one committed task attempt: its staged file. */
final case class StagedFileMessage(path: String, partitionId: Int, rows: Long)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

/** Job-level batch write (see [[PagedJsonTable.newWriteBuilder]]). */
final class PagedJsonBatchWrite(dir: String, queryId: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._
  private def stagingDir = java.nio.file.Paths.get(dir, s"_staging_$queryId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    java.nio.file.Files.createDirectories(stagingDir)
    new PagedJsonWriterFactory(stagingDir.toString, schema)
  }

  /** AppendData commit: the new log = prior committed log bytes +
    * committed staged files in partition order, built in a tmp file
    * and promoted by ONE atomic move — readers see the old log or the
    * new one, never a torn state (true append-to-file would expose a
    * partially-appended log mid-copy). `_SUCCESS` carries the
    * CUMULATIVE row count; the prior count is re-derived by counting
    * the existing log's lines rather than trusting a prior manifest,
    * so a crash between a previous move and its manifest write can
    * never skew the running total. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val target = java.nio.file.Paths.get(dir, "records.jsonl")
    val tmp = java.nio.file.Paths.get(dir, s"_records_$queryId.tmp")
    val priorRows: Long =
      if (java.nio.file.Files.exists(target)) {
        val in = java.nio.file.Files.newBufferedReader(target)
        try Iterator.continually(in.readLine()).takeWhile(_ != null).size.toLong
        finally in.close()
      } else 0L
    val out = java.nio.file.Files.newOutputStream(tmp)
    try {
      if (priorRows > 0L)
        java.nio.file.Files.copy(target, out)
      messages.map(_.asInstanceOf[StagedFileMessage])
        .sortBy(_.partitionId)
        .foreach { m =>
          java.nio.file.Files.copy(java.nio.file.Paths.get(m.path), out)
        }
    } finally out.close()
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_SUCCESS"),
      (priorRows +
        messages.map(_.asInstanceOf[StagedFileMessage]).map(_.rows).sum)
        .toString.getBytes("UTF-8"))
    abort(messages) // staging cleanup: promoted bytes already copied
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val d = stagingDir.toFile
    if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
  }
}

final class PagedJsonWriterFactory(staging: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new PagedJsonDataWriter(staging, schema, partitionId, taskId)
}

/** Per-task writer: serializes rows to a private staged JSON-lines
  * file; only `commit()` exposes it (via the message) for promotion. */
final class PagedJsonDataWriter(staging: String, schema: StructType,
    partitionId: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val file = java.nio.file.Paths.get(staging,
    f"part-$partitionId%05d-$taskId.jsonl")
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    java.nio.file.Files.newOutputStream(file), "UTF-8"))
  private val mapper = new ObjectMapper()
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    val node = mapper.createObjectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      f.dataType match {
        case st: StructType =>
          if (row.isNullAt(i)) node.putNull(f.name)
          else {
            val sub = node.putObject(f.name)
            val sr = row.getStruct(i, st.fields.length)
            st.fields.zipWithIndex.foreach { case (sf, j) =>
              if (sr.isNullAt(j)) sub.putNull(sf.name)
              else sub.put(sf.name, sr.getUTF8String(j).toString)
            }
          }
        case _ =>
          if (row.isNullAt(i)) node.putNull(f.name)
          else node.put(f.name, row.getUTF8String(i).toString)
      }
    }
    out.write(mapper.writeValueAsString(node))
    out.write("\n")
    rows += 1L
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    StagedFileMessage(file.toString, partitionId, rows)
  }
  override def abort(): Unit = {
    out.close()
    java.nio.file.Files.deleteIfExists(file)
  }
  override def close(): Unit = ()
}

/** Byte-position offset of [[PagedMicroBatchStream]]. */
final case class BytePosOffset(pos: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pos.toString
}

/** MicroBatchStream over a growing JSON-lines file: offsets are byte
  * positions, admission control caps each batch at `batchBytes`, and
  * [[planInputPartitions]] walks the committed byte range ONCE on the
  * driver to split it into page-sized line-aligned slices (the same
  * single planning pass as the batch side, restricted to the range).
  * A line STARTING before the end offset is read whole even if it
  * extends past it — the next batch starts at the next line start, so
  * no record is split or double-read. */
final class PagedMicroBatchStream(path: String, pageSize: Int,
    batchBytes: Long, schema: StructType, filters: Array[Filter])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset, ReadLimit}

  private def fileLen: Long = new java.io.File(path).length()
  // Trigger.AvailableNow snapshots the backlog end at query start;
  // admission control then paces batches toward exactly that target
  // (a source implementing this itself is never wrapped, so the
  // per-batch byte cap stays in force under AvailableNow)
  @volatile private var availableTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(fileLen)

  override def initialOffset(): SOffset = BytePosOffset(0L)
  override def deserializeOffset(json: String): SOffset =
    BytePosOffset(json.trim.toLong)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(): SOffset = BytePosOffset(fileLen)
  override def latestOffset(start: SOffset, limit: ReadLimit): SOffset = {
    val s = start.asInstanceOf[BytePosOffset].pos
    BytePosOffset(math.min(availableTarget.getOrElse(fileLen), s + batchBytes))
  }
  override def reportLatestOffset(): SOffset = BytePosOffset(fileLen)
  override def commit(end: SOffset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: SOffset, end: SOffset): Array[InputPartition] = {
    val rawFrom = start.asInstanceOf[BytePosOffset].pos
    val until = end.asInstanceOf[BytePosOffset].pos
    if (until <= rawFrom) return Array.empty
    // one driver pass over the batch's byte range: record each page's
    // starting byte and line count (lines starting before `until`
    // belong to this batch, read whole)
    val in = new java.io.BufferedInputStream(
      java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path)), 1 << 16)
    try {
      // offsets are raw byte positions, so `rawFrom` can land mid-line
      // (the previous batch read its boundary-crossing line WHOLE):
      // if the preceding byte is not a newline, the tail of that line
      // is already consumed — skip to the next line start. Reading
      // one byte before `rawFrom` distinguishes "line start" from
      // "mid-line" without any per-offset alignment bookkeeping.
      var from = rawFrom
      if (rawFrom > 0) {
        in.skipNBytes(rawFrom - 1)
        var c = in.read()
        if (c >= 0 && c != '\n') {
          var done = false
          while (!done) {
            c = in.read(); from += 1
            if (c < 0 || c == '\n') done = true
          }
        }
        if (from >= until) return Array.empty
      }
      val parts = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
      var pageStart = from
      var pageLines = 0
      var pos = from
      var lineStart = from
      var b = in.read()
      while (b >= 0 && lineStart < until) {
        pos += 1
        if (b == '\n') {
          pageLines += 1
          lineStart = pos
          if (pageLines == pageSize) {
            parts += StreamSlicePartition(path, pageStart, pageLines)
            pageStart = pos; pageLines = 0
          }
        }
        b = in.read()
      }
      // trailing line without newline (end of file) still counts
      if (b < 0 && pos > lineStart && lineStart < until) pageLines += 1
      if (pageLines > 0) parts += StreamSlicePartition(path, pageStart, pageLines)
      parts.toArray
    } finally in.close()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new StreamSliceReaderFactory(schema, filters)
}

/** One page-sized line-aligned slice of the streamed file. */
final case class StreamSlicePartition(path: String, startByte: Long,
    nLines: Int) extends InputPartition

final class StreamSliceReaderFactory(schema: StructType, filters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[StreamSlicePartition]
    new PartitionReader[InternalRow] {
      private val mapper = new ObjectMapper()
      private val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(p.path))
      in.skipNBytes(p.startByte)
      private val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
      private var taken = 0
      private var current: InternalRow = _
      override def next(): Boolean = {
        while (taken < p.nLines) {
          val line = br.readLine()
          if (line == null) return false
          taken += 1
          val node = mapper.readTree(line)
          if (SamFilterEval.matchesAll(filters, node)) {
            current = SamRowParser.toRow(node, schema)
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = br.close()
    }
  }
}

/** Standalone factory: ships to executors, so it must be serializable
  * and must not capture the Scan/Table instances. */
final class PagedReaderFactory(schema: StructType, filters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case hp: HttpPagerPartition => new HttpPagerReader(hp, schema, filters ++ hp.rt)
      case pp: PagePartition => new PagePartitionReader(pp, schema, filters ++ pp.rt)
      case cp: CountPartition => new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean =
          if (emitted) false else { emitted = true; true }
        override def get(): InternalRow =
          new GenericInternalRow(Array[Any](cp.total))
        override def close(): Unit = ()
      }
    }
}

/** Planning-time COUNT(*) answer — one row, zero records parsed. */
final case class CountPartition(total: Long) extends InputPartition

/** `drop` = in-page records to skip (non-zero only on the first
  * planned page, when the pushed OFFSET is not page-aligned). */
final case class PagePartition(page: Int, pageSize: Int, total: Int,
    path: Option[String], startByte: Long, drop: Int,
    rt: Array[Filter] = Array.empty) extends InputPartition

/** `startOffset` = pushed OFFSET (the pager starts its API offset
  * there); `maxRecords` = absolute cap counted from stream row 0. */
final case class HttpPagerPartition(url: String, pageSize: Int,
    startOffset: Int, maxRecords: Int, timeoutMs: Int,
    rt: Array[Filter] = Array.empty) extends InputPartition

/** Evaluates pushed V1 Filters against a parsed JSON record node.
  *
  * Only NULL-REJECTING shapes are [[supported]]: for those, the
  * two-valued `matches` below coincides with SQL's "keep rows where
  * the predicate IS TRUE" — a NULL field makes EqualTo/contains/In
  * SQL-NULL and `matches` false, both dropping the row. `Not` is
  * excluded: NOT(x) IS TRUE requires x IS FALSE, which cannot be
  * recovered from an IS-TRUE evaluator when x is NULL (pushing it
  * would wrongly keep NULL rows), so it stays a Spark-side residual
  * filter. Dotted attribute names navigate the nested struct. */
private[sources] object SamFilterEval {
  private def strOf(n: JsonNode, attr: String): Option[String] = {
    var cur = n
    for (part <- attr.split("\\.")) {
      if (cur == null) return None
      cur = cur.get(part)
    }
    if (cur == null || cur.isNull) None else Some(cur.asText())
  }

  def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: IsNotNull | _: IsNull | _: StringContains |
         _: StringStartsWith | _: StringEndsWith | _: In => true
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r) => supported(l) && supported(r)
    case _ => false
  }

  def matches(f: Filter, n: JsonNode): Boolean = f match {
    // v == null mirrors SQL `x = NULL` (never true) — without the
    // guard String.valueOf(null) would match fields holding the
    // four-character string "null"
    case EqualTo(a, v) => v != null && strOf(n, a).contains(String.valueOf(v))
    case IsNotNull(a) => strOf(n, a).isDefined
    case IsNull(a) => strOf(n, a).isEmpty
    case StringContains(a, v) => strOf(n, a).exists(_.contains(v))
    case StringStartsWith(a, v) => strOf(n, a).exists(_.startsWith(v))
    case StringEndsWith(a, v) => strOf(n, a).exists(_.endsWith(v))
    case In(a, vs) => strOf(n, a).exists(s => vs.exists(v => v != null && String.valueOf(v) == s))
    case And(l, r) => matches(l, n) && matches(r, n)
    case Or(l, r) => matches(l, n) || matches(r, n)
    case other => throw new IllegalStateException(s"unpushable filter leaked: $other")
  }

  def matchesAll(fs: Array[Filter], n: JsonNode): Boolean =
    fs.forall(matches(_, n))
}

/** Converts one SAM JSON record node into an InternalRow against the
  * explicit schema (strings + one nested struct). Missing keys and
  * JSON nulls both surface as SQL NULL — the documented deviation
  * from CPython's dict.get-default (see [[Ingest]] scaladoc). */
private[sources] object SamRowParser {
  private def utf8(n: JsonNode, field: String): AnyRef = {
    val v = n.get(field)
    if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
  }

  def toRow(n: JsonNode, schema: StructType): InternalRow = {
    val values: Array[Any] = schema.fields.map[Any] {
      case StructField(name, StringType, _, _) => utf8(n, name)
      case StructField(name, st: StructType, _, _) =>
        val sub = n.get(name)
        if (sub == null || sub.isNull) null
        else new GenericInternalRow(st.fields.map[Any](f => utf8(sub, f.name)))
      case f => throw new IllegalArgumentException(s"unsupported field $f")
    }
    new GenericInternalRow(values)
  }
}

/** The reference's fetch loop over a live socket (`lambda_function
  * .py:29-54`): GET `url?limit=&offset=`, parse `opportunitiesData`,
  * stop on short page / `maxRecords`; non-200 ends the loop keeping
  * everything already fetched; a connect/read timeout propagates and
  * fails the task (the reference's `timeout=10` is uncaught). Pages
  * are fetched lazily — one page buffered at a time, `maxRecords`
  * bounds memory. */
final class HttpPagerReader(p: HttpPagerPartition, schema: StructType,
    filters: Array[Filter] = Array.empty)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private var emitted = 0
  private var offset = p.startOffset
  private var done = false
  private var buf: Iterator[JsonNode] = Iterator.empty
  private var current: InternalRow = _

  private def fetchPage(): Unit = {
    val sep = if (p.url.contains("?")) "&" else "?"
    val conn = java.net.URI.create(s"${p.url}${sep}limit=${p.pageSize}&offset=$offset")
      .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(p.timeoutMs)
    conn.setReadTimeout(p.timeoutMs)
    try {
      if (conn.getResponseCode != 200) { done = true; return } // keep partial (:41-43)
      val body = new String(conn.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val arr = mapper.readTree(body).path("opportunitiesData")
      val n = if (arr.isArray) arr.size() else 0
      if (n < p.pageSize) done = true                          // short page (:49)
      offset += p.pageSize
      buf = (0 until n).iterator.map(arr.get)
    } finally conn.disconnect()
  }

  @annotation.tailrec
  override def next(): Boolean = {
    // cap (:49,54) — absolute: records skipped by the pushed offset
    // still count against the stream's truncation budget, and pushed
    // filters drop records AFTER they are counted (the cap truncates
    // the raw stream, not the filtered one)
    if (p.startOffset + emitted >= p.maxRecords) false
    else {
      while (!buf.hasNext && !done) fetchPage()
      if (!buf.hasNext) false
      else {
        val node = buf.next(); emitted += 1
        if (SamFilterEval.matchesAll(filters, node)) {
          current = SamRowParser.toRow(node, schema); true
        } else next()
      }
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Parses one page of JSON records into InternalRows against the
  * explicit schema (strings + one nested struct). Missing keys and
  * JSON nulls both surface as SQL NULL — the documented deviation
  * from CPython's dict.get-default (see [[Ingest]] scaladoc). */
final class PagePartitionReader(p: PagePartition, schema: StructType,
    filters: Array[Filter] = Array.empty)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()

  /** The page payload — swap for an HTTP GET in a connected build.
    * The JSON-lines branch SEEKS to the page's precomputed byte
    * offset (recorded during the driver's planning pass) and reads
    * only `pageSize` lines — each task touches exactly its slice of
    * the file; preceding pages are never read, let alone parsed. */
  private def pageRecords: Seq[String] = {
    val pageStart = p.page.toLong * p.pageSize
    val from = pageStart + p.drop // first planned page: skip offset prefix
    val until = math.min(pageStart + p.pageSize, p.total.toLong)
    if (from >= until) Seq.empty
    else p.path match {
      case Some(f) =>
        val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(f))
        try {
          in.skipNBytes(p.startByte) // byte offset of the PAGE start
          val br = new java.io.BufferedReader(
            new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
          Iterator.continually(br.readLine()).takeWhile(_ != null)
            .drop(p.drop) // in-page re-alignment when offset % page_size != 0
            .take((until - from).toInt).toSeq
        } finally in.close()
      case None => Ingest.fixture.slice(from.toInt, until.toInt)
    }
  }

  private val it = pageRecords.iterator
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (it.hasNext) {
      val node = mapper.readTree(it.next())
      if (SamFilterEval.matchesAll(filters, node)) {
        current = SamRowParser.toRow(node, schema)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
