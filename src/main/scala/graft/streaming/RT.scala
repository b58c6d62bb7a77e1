package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Real-time mode as Structured Streaming (SURVEY.md §2.8).
  *
  * The reference's RT daemon is a polling loop (qpe_rt_daemon.py:466) —
  * here each of its semantics maps onto a first-class streaming construct:
  * micro-batch trigger (R1), completeness-wait with timeout and graceful
  * degradation (R2/R3), cross-batch state (R4), session windows (R6),
  * incremental day recompute via dynamic partition overwrite (R8).
  */
object RT {

  /** The applied-batchId marker every foreachBatch loop in this file
    * shares: read returns −1 when absent; write replaces atomically-enough
    * for the single-writer streaming contract. One definition so the
    * at-least-once replay guard cannot drift between loops.
    */
  private def readAppliedMarker(fs: org.apache.hadoop.fs.FileSystem,
                                marker: org.apache.hadoop.fs.Path): Long =
    if (!fs.exists(marker)) -1L
    else {
      val in = fs.open(marker)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }

  private def writeAppliedMarker(fs: org.apache.hadoop.fs.FileSystem,
                                 marker: org.apache.hadoop.fs.Path,
                                 batchId: Long): Unit = {
    val out = fs.create(marker, true)
    try out.write(batchId.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The audit-log write every serve loop shares: rows land in a
    * per-batch `applied_batch=<id>` partition via dynamic overwrite, so
    * an at-least-once CRASH-REPLAY (failure between this write and the
    * applied marker) rewrites its own partition instead of appending
    * duplicate rows — the [[aggMaintainBatch]] write-then-flip
    * discipline expressed as partition overwrite. The partition column
    * doubles as provenance: which batch produced each audit row.
    */
  private def auditWrite(df: DataFrame, outPath: String,
                         batchId: Long): Unit = df
    .withColumn("applied_batch", lit(batchId))
    .write.mode("overwrite")
    .option("partitionOverwriteMode", "dynamic")
    .partitionBy("applied_batch").parquet(outPath)

  /** R1: file source + 5-min processing trigger
    * (reference: qpe_rt_daemon.py:865-873 sleep-to-next-slot loop).
    */
  def fileStream(spark: SparkSession, path: String, schema: StructType,
                 options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.schema(schema).options(options).parquet(path)

  def fiveMinuteTrigger: Trigger = Trigger.ProcessingTime("5 minutes")

  /** R1 windowed aggregation: tumbling event-time windows + watermark
    * (reference cadence: one product per 5 min, qpe/qpe.py:374-378).
    */
  def windowAgg(events: DataFrame, key: String, tsCol: String, valueCol: String,
                window_ : String = "5 minutes",
                watermark: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(col(key), window(col(tsCol), window_))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_v"))

  /** R6: 12-h inactivity session split as a built-in session window
    * (reference: ml/utils.py:71-126 split_event).
    */
  def sessionAgg(events: DataFrame, key: String, tsCol: String,
                 gap: String = "12 hours", watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(col(key), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n"))

  // ---- R2/R3: completeness-wait with timeout + graceful degradation -------

  /** One arriving per-source file for a timestep. */
  final case class SourceArrival(slot: Long, source: String, eventTimeMs: Long)
  /** Emitted product slot: quality flags missing sources as '-'
    * (reference: "ADLPW" → "A-LPW", qpe/qpe.py:464-489, qpe_utils.py:209-228).
    */
  final case class SlotResult(slot: Long, quality: String, complete: Boolean)
  final case class SlotState(seen: Set[String], done: Boolean = false)

  val AllSources: Seq[String] = Seq("A", "D", "L", "P", "W")

  /** flatMapGroupsWithState body: emit as soon as all sources arrived;
    * otherwise wait until the event-time timeout (watermark passing the slot's
    * deadline) and emit the degraded product — the batch is never blocked
    * (reference: wait_for_files timeout=60, qpe_rt_daemon.py:198-253).
    *
    * Two robustness contracts a long-running daemon needs:
    *   - an emitted slot leaves a TOMBSTONE (done=true) behind instead of
    *     removing state, so a duplicate/retransmitted arrival cannot
    *     re-open a closed slot and emit a second, contradictory result —
    *     the tombstone is garbage-collected by its own timeout;
    *   - the timeout timestamp is floored ABOVE the current watermark: a
    *     straggler for a slot whose deadline the watermark already passed
    *     would otherwise make setTimeoutTimestamp throw and kill the
    *     whole query (instead it emits degraded at the next trigger,
    *     which is what an already-passed deadline means).
    */
  def slotUpdate(timeoutMs: Long)(slot: Long, arrivals: Iterator[SourceArrival],
                                  state: GroupState[SlotState]): Iterator[SlotResult] = {
    def deadline: Long =
      math.max(slot + timeoutMs, state.getCurrentWatermarkMs() + 1)
    if (state.hasTimedOut) {
      val st = state.getOption.getOrElse(SlotState(Set.empty))
      if (st.done) { state.remove(); Iterator.empty } // tombstone expiry
      else {
        // degraded emit leaves the same tombstone the complete path does:
        // a retransmitted arrival one trigger later must not re-open the
        // slot and emit a second, contradictory result
        state.update(SlotState(st.seen, done = true))
        state.setTimeoutTimestamp(deadline)
        Iterator.single(SlotResult(slot, quality(st.seen), complete = false))
      }
    } else if (state.getOption.exists(_.done)) {
      state.setTimeoutTimestamp(deadline) // duplicate arrival after emit:
      Iterator.empty                      // keep the tombstone, emit nothing
    } else {
      val seen = state.getOption.map(_.seen).getOrElse(Set.empty) ++
        arrivals.map(_.source)
      if (AllSources.forall(seen.contains)) {
        state.update(SlotState(seen, done = true))
        state.setTimeoutTimestamp(deadline)
        Iterator.single(SlotResult(slot, quality(seen), complete = true))
      } else {
        state.update(SlotState(seen))
        // deadline: slot end + allowed lateness
        state.setTimeoutTimestamp(deadline)
        Iterator.empty
      }
    }
  }

  def quality(seen: Set[String]): String =
    AllSources.map(s => if (seen.contains(s)) s else "-").mkString

  /** Wire the completeness state machine over a stream of arrivals. */
  def completenessStream(arrivals: Dataset[SourceArrival],
                         timeoutMs: Long): Dataset[SlotResult] = {
    import arrivals.sparkSession.implicits._
    arrivals.toDF()
      .withColumn("eventTime", timestamp_millis(col("eventTimeMs")))
      .withWatermark("eventTime", "0 seconds")
      .as[SourceArrival]
      .groupByKey(_.slot)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        slotUpdate(timeoutMs))
  }

  // ---- R4: cross-batch previous-timestep state ----------------------------

  final case class KeyedValue(key: String, slot: Long, value: Double)
  final case class Paired(key: String, slot: Long, value: Double,
                          prevValue: Option[Double])
  final case class PrevState(slot: Long, value: Double)

  /** mapGroupsWithState carrying the previous timestep's value per key —
    * the checkpointed replacement for the reference's X_prev/qpe_prev npy
    * spill files (qpe/qpe.py:380-403,745-762). Time only moves FORWARD
    * through the state: a row at or before the stored slot (late or
    * replayed cross-batch delivery) pairs with None — never with a
    * future slot's value — and does not regress the stored state; the
    * within-batch sort already guarantees this inside one batch, the
    * slot comparison extends the same contract across batches.
    */
  def pairWithPrevious(values: Dataset[KeyedValue]): Dataset[Paired] = {
    import values.sparkSession.implicits._
    values.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[KeyedValue], state: GroupState[PrevState]) =>
          val sorted = rows.toSeq.sortBy(_.slot)
          var prev = state.getOption
          val out = sorted.map { kv =>
            if (prev.exists(kv.slot <= _.slot))
              Paired(kv.key, kv.slot, kv.value, None) // out-of-order row
            else {
              val p = Paired(kv.key, kv.slot, kv.value, prev.map(_.value))
              prev = Some(PrevState(kv.slot, kv.value))
              p
            }
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  /** R9: watermarked stream-stream equi-join within a time bound — which
    * right-side events landed within ±`within` of each left event for the
    * same key (click↔purchase attribution, request↔response pairing).
    * Both sides carry `within`-sized watermarks AND the join condition
    * bounds the event-time distance, which is exactly what lets Spark's
    * symmetric hash join EVICT state: without the time constraint each
    * side's buffer grows forever. Right-side columns surface prefixed
    * `r_` (the key column is dropped after the equality).
    *
    * State per key is bounded by the rows inside one watermark horizon —
    * the 100 TB/day contract is horizon-sized memory, not stream-sized.
    */
  def streamJoinWithin(left: DataFrame, right: DataFrame, key: String,
                       ltsCol: String, rtsCol: String,
                       within: String): DataFrame = {
    val lw = left.withWatermark(ltsCol, within)
    val rw = right.toDF(right.columns.map(c =>
        if (c == key) "__rk" else s"r_$c"): _*)
      .withWatermark(s"r_$rtsCol", within)
    lw.join(rw,
        col(key) === col("__rk") &&
          col(s"r_$rtsCol") >= col(ltsCol) - expr(s"INTERVAL $within") &&
          col(s"r_$rtsCol") <= col(ltsCol) + expr(s"INTERVAL $within"))
      .drop("__rk")
  }

  /** Stream-static anomaly flagging: join the live event stream against a
    * BROADCAST robust baseline (median/MAD per (event type, hour-of-day),
    * e.g. from the batch [[graft.operators.Agg.madOutliers]] over history)
    * and emit per-window counts of modified-z-score outliers. The static
    * side is re-read per micro-batch by Structured Streaming's
    * stream-static join contract, so a refreshed baseline table is picked
    * up without restarting the query; the stream side needs no state
    * beyond the windowed count (watermark-evicted).
    *
    * Baseline schema: (typeCol, hr INT, med DOUBLE, mad DOUBLE). Events
    * whose (type, hour) has no baseline row are counted but never flagged
    * (left join, NULL mad) — an unseen regime is a coverage gap, not an
    * anomaly.
    */
  def anomalyStream(events: DataFrame, baseline: DataFrame, tsCol: String,
                    typeCol: String, valCol: String, zThresh: Double = 3.5,
                    windowDur: String = "1 hour",
                    watermark: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val flagged = events
      .withColumn("hr", hour(col(tsCol)))
      .join(broadcast(baseline), Seq(typeCol, "hr"), "left")
      .withColumn("__z",
        when(col("mad") > 0,
          lit(0.6745) * (col(valCol) - col("med")) / col("mad")))
      .withColumn("__anom",
        when(col("mad") > 0, abs(col("__z")) > zThresh)
          .when(col("mad").isNotNull, col(valCol) =!= col("med"))
          .otherwise(lit(false)))
    flagged.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("w"), col(typeCol))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__anom"), 1L).otherwise(0L)).as("n_anomalies"))
      .select(col("w.start").as("window_start"), col(typeCol),
        col("n_events"), col("n_anomalies"))
  }

  /** Streaming exact dedup for ingest pipelines: drop any document whose
    * content digest already arrived within the watermark horizon — the
    * streaming analogue of [[graft.llm.Dedup.exactByDigest]]. The dedup
    * state holds 16-byte digests (never documents) and entries older than
    * the watermark are evicted, so state is bounded by the horizon's unique
    * content count however long the stream runs.
    */
  def streamingDedup(docs: DataFrame, tsCol: String, textCol: String,
                     watermark: String = "1 hour"): DataFrame =
    docs.withColumn("__digest", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("__digest"))
      .drop("__digest")

  /** Continuous-crawl NEAR-dup ingest against the persisted
    * [[graft.llm.DedupIndex]] — the streaming serve-and-grow loop for
    * incremental dedup state: each micro-batch is probed against
    * everything accepted so far (the initial corpus plus every earlier
    * batch's survivors), the flag rows land in `outPath` as the audit
    * log, and the kept (novel) documents are APPENDED to the index so
    * later batches see them. Usage:
    * `stream.writeStream.foreachBatch(dedupIngestBatch(...)).start()`.
    *
    * Intra-batch near-dups are deliberately NOT checked against each
    * other — the unit of acceptance is the batch (run a batch-local
    * [[graft.llm.Dedup.minhashDedup]] inside the function if finer
    * granularity is needed); DedupIngestParitySpec replays the same
    * files through a driver-side fold of [[graft.llm.DedupIndex.query]]
    * semantics and proves flag-for-flag agreement. Ordering inside the
    * function is load-bearing: the flag relation is MATERIALIZED
    * (localCheckpoint) before the append, so its plan can never read
    * the bands its own batch is about to write.
    *
    * foreachBatch is at-least-once: after a failure between the batch
    * function and the checkpoint commit, the SAME batchId replays. An
    * APPLIED batchId (recorded in the index directory) replays as a full
    * no-op; a CRASH-replay (failure before the marker) is idempotent
    * stage by stage — the probe excludes the batch's own ids from the
    * index side (so flags match the first run even after a partial
    * append), the audit lands in a per-batch partition via
    * [[auditWrite]] (rewritten identically, never duplicated), and the
    * append anti-joins against the persisted doc ids (bands can never
    * accumulate twice).
    */
  def dedupIngestBatch(indexPath: String, idCol: String, textCol: String,
                       minJaccard: Double, outPath: String)
                      : (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val markerPath = new org.apache.hadoop.fs.Path(
        s"$indexPath/_ingest_batch")
      val fs = markerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val applied = readAppliedMarker(fs, markerPath)
      if (batchId > applied) {
        val b = batch.localCheckpoint() // consumed by probe + kept below;
                                        // a streaming source frame may not
                                        // be recomputable across actions
        val flagged = graft.llm.DedupIndex
          .query(spark, indexPath, b, idCol, textCol, minJaccard,
            excludeIds = Some(b.select(col(idCol))))
          .localCheckpoint()
        auditWrite(flagged, outPath, batchId)
        val kept = b.join(flagged.filter(col("keep")).select(col(idCol)),
          Seq(idCol), "left_semi")
        val keptFresh = kept.join(
          spark.read.parquet(s"$indexPath/docsets").select(col(idCol)),
          Seq(idCol), "left_anti")
        graft.llm.DedupIndex.append(spark, indexPath, keptFresh, idCol,
          textCol)
        writeAppliedMarker(fs, markerPath, batchId)
      }
    }

  /** Streaming ANN serve(-and-grow) against a persisted
    * [[graft.llm.Similarity.saveIndex]] layout — the vector-database
    * serve loop: each micro-batch of query vectors is answered from the
    * index via [[graft.llm.Similarity.probeIndex]] (top-k per query
    * appended to `outPath`), and — when `growIndex` — the batch's vectors
    * are then APPENDED into the layout with the quantizer's own metric
    * ([[graft.llm.Similarity.appendToIndex]]), so later batches retrieve
    * earlier ones. Usage:
    * `stream.writeStream.foreachBatch(annServeBatch(...)).start()`.
    *
    * Ordering is load-bearing exactly as in [[dedupIngestBatch]]: results
    * are MATERIALIZED before the append, so a batch can never retrieve
    * itself. Same at-least-once guard: the applied batchId is recorded in
    * the index directory and replays are no-ops — and a CRASH-replay
    * (failure between a write and the marker) is idempotent stage by
    * stage. When growing, the probe excludes the batch's own ids from
    * the index side (growth REQUIRES batch ids be new, so the exclusion
    * reconstructs exactly the pre-batch index view on a replay after a
    * partial append); the audit lands in a per-batch partition via
    * [[auditWrite]] (rewritten identically, never duplicated); and the
    * grow step anti-joins the batch against the ids already in the
    * layout — [[graft.llm.Similarity.appendToIndex]] has no duplicate-id
    * guard of its own, and a re-appended vector would surface at
    * multiple ranks in every later probe of its cell. A serve-ONLY loop
    * (growIndex = false) probes without the exclusion, so indexed ids
    * may be probed for their neighbors.
    */
  def annServeBatch(indexPath: String, idCol: String, vecCol: String,
                    dim: Int, k: Int, nprobe: Int, outPath: String,
                    growIndex: Boolean): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val markerPath = new org.apache.hadoop.fs.Path(s"$indexPath/_serve_batch")
      val fs = markerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val applied = readAppliedMarker(fs, markerPath)
      if (batchId > applied) {
        val b = batch.localCheckpoint() // streaming source frames may not
                                        // be recomputable across actions
        val exclude = if (growIndex) Some(b.select(col(idCol))) else None
        auditWrite(graft.llm.Similarity
          .probeIndex(spark, indexPath, b, idCol, vecCol, dim, k, nprobe,
            excludeIds = exclude), outPath, batchId)
        if (growIndex) {
          val kv = b
            .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
            .select(col(idCol), col(vecCol))
          graft.llm.Similarity.appendToIndex(spark, indexPath,
            freshAgainstIvf(spark, indexPath, kv, idCol), idCol, vecCol, dim)
        }
        writeAppliedMarker(fs, markerPath, batchId)
      }
    }

  /** The crash-replay append guard for IVF layouts: drop rows whose id is
    * already in the persisted cells — shared by [[annServeBatch]] and
    * [[llmIngestBatch]] (the graph sibling has the same guard inline in
    * [[graphAnnServeBatch]]).
    */
  private def freshAgainstIvf(spark: SparkSession, indexPath: String,
                              kv: DataFrame, idCol: String): DataFrame =
    kv.join(
      spark.read.parquet(s"$indexPath/cells").select(col(idCol)),
      Seq(idCol), "left_anti")

  /** Streaming serve(-and-grow) against a persisted
    * [[graft.llm.GraphAnnIndex]] layout — the graph-index sibling of
    * [[annServeBatch]]: each micro-batch of query vectors is answered by
    * the hierarchical descent + beam search over the persisted layer
    * graphs (top-k per query appended to `outPath`), and — when
    * `growIndex` — the batch's vectors are appended with the EXACT
    * incremental rebuild of the touched (layer, cell) slices, so later
    * batches search a graph identical to a from-scratch build over
    * everything so far. Same ordering and idempotence contract as the
    * other serve loops: results materialize (via the parquet write)
    * BEFORE the append, so a batch never retrieves itself, and the
    * applied batchId recorded in the index directory makes replays
    * no-ops.
    */
  def graphAnnServeBatch(indexPath: String, idCol: String, vecCol: String,
                         k: Int, beam: Int, rounds: Int, outPath: String,
                         growIndex: Boolean): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val markerPath = new org.apache.hadoop.fs.Path(s"$indexPath/_serve_batch")
      val fs = markerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val applied = readAppliedMarker(fs, markerPath)
      if (batchId > applied) {
        val b = batch.localCheckpoint() // streaming source frames may not
                                        // be recomputable across actions
        val meta = graft.llm.GraphAnnIndex.readMeta(spark, indexPath)
        // per-batch audit partition: a crash-replay rewrites this batch's
        // slice instead of appending duplicates. Unlike the IVF loop the
        // rewritten rows are the RETRY's view — after a partial append
        // the graph itself differs (new nodes join the traversal), so
        // batch-mates may appear in the replayed results; self-matches
        // never do. Bit-identical replay audits would need versioned
        // graph reads; the recorded contract is "the batch's last
        // attempt".
        auditWrite(graft.llm.GraphAnnIndex
          .probe(spark, indexPath, b, idCol, vecCol, k, beam, rounds),
          outPath, batchId)
        if (growIndex) {
          val kv = b
            .filter(col(vecCol).isNotNull && size(col(vecCol)) === meta.dim)
            .select(col(idCol), col(vecCol))
          // a crash between the append and the marker replays the batch —
          // the anti-join makes the re-append a no-op instead of tripping
          // the duplicate-id guard and wedging the stream (the probe
          // residue of such a retry is documented: batch-mates may appear
          // in the replayed results; self-matches never do)
          val fresh = kv.join(
            spark.read.parquet(s"$indexPath/nodes")
              .select(col("id").as(idCol)),
            Seq(idCol), "left_anti")
          graft.llm.GraphAnnIndex.append(spark, indexPath, fresh, idCol,
            vecCol)
        }
        writeAppliedMarker(fs, markerPath, batchId)
      }
    }

  /** The streaming LLM ingest pipeline composed end to end — ONE
    * foreachBatch function chaining the curation stages over shared
    * persisted state:
    *
    *   quality filter → near-dup probe against everything accepted so far
    *   → index growth → ANN serve-and-grow over the survivors' embeddings
    *
    * (exact cross-batch dedup runs UPSTREAM as the [[streamingDedup]]
    * stream stage — digest state belongs to the engine's watermark
    * machinery, not the batch function). Each stage appends its audit
    * relation (`qualityOut` / `dedupOut` / `annOut`) and only its
    * survivors flow on; the novel documents grow the dedup index and
    * their vectors grow the ANN index, so later batches are probed
    * against earlier survivors. Ordering inside the function is
    * load-bearing exactly as in [[dedupIngestBatch]]/[[annServeBatch]]:
    * every probe result is MATERIALIZED before the corresponding append,
    * so a batch can never match or retrieve itself.
    *
    * Idempotence: ONE applied-batchId marker (in the dedup index
    * directory) covers all five stages, so an at-least-once replay of an
    * APPLIED batch is a full no-op — never a half-replay that re-appends
    * bands but not vectors. A crash INSIDE the window between the first
    * write and the marker replays the whole batch, and every stage is
    * replay-idempotent, so the retry converges to exactly the first
    * run's state with NO residue:
    *   - audit relations land in per-batch `applied_batch=<id>`
    *     partitions via dynamic overwrite — a replay rewrites its own
    *     partition with the identical rows instead of appending
    *     duplicates (the [[aggMaintainBatch]] write-then-flip discipline,
    *     expressed as partition overwrite);
    *   - both probes EXCLUDE the batch's own ids from the index side, so
    *     the retry flags and retrieves exactly what the first run did
    *     even when the crash fell after an index append;
    *   - both index appends anti-join the survivors against the ids
    *     already persisted — without the ANN-side guard a re-appended
    *     vector would surface at multiple ranks in every later probe of
    *     its cell ([[graft.llm.Similarity.probeIndex]]'s TopK does not
    *     dedupe candidate ids), and the dedup-side guard keeps replayed
    *     bands from accumulating in hot buckets.
    * LlmIngestE2ESpec proves flag-for-flag parity with a sequential
    * driver-side fold of the batch operators over the same micro-batches,
    * including a replay of an applied batch AND a crash-replay (marker
    * deleted after a full run) asserting bit-identical audit and index
    * state.
    */
  def llmIngestBatch(dedupIndexPath: String, annIndexPath: String,
                     idCol: String, textCol: String, vecCol: String,
                     dim: Int, minJaccard: Double, k: Int, nprobe: Int,
                     qualityOut: String, dedupOut: String, annOut: String,
                     minTokens: Int = 10): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val markerPath = new org.apache.hadoop.fs.Path(
        s"$dedupIndexPath/_pipeline_batch")
      val fs = markerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val applied = readAppliedMarker(fs, markerPath)
      if (batchId > applied) {
        val b = batch.localCheckpoint() // streaming source frames may not
                                        // be recomputable across actions
        def audit(df: DataFrame, outPath: String): Unit =
          auditWrite(df, outPath, batchId)
        val quality = graft.llm.Curation
          .qualityFilter(b, idCol, textCol, minTokens = minTokens)
          .localCheckpoint()
        audit(quality, qualityOut)
        val batchIds = b.select(col(idCol))
        val bq = b.join(quality.filter(col("keep")).select(col(idCol)),
          Seq(idCol), "left_semi")
        val flagged = graft.llm.DedupIndex
          .query(spark, dedupIndexPath, bq, idCol, textCol, minJaccard,
            excludeIds = Some(batchIds))
          .localCheckpoint()
        audit(flagged, dedupOut)
        val kept = bq.join(flagged.filter(col("keep")).select(col(idCol)),
          Seq(idCol), "left_semi")
        val keptFresh = kept.join(
          spark.read.parquet(s"$dedupIndexPath/docsets").select(col(idCol)),
          Seq(idCol), "left_anti")
        graft.llm.DedupIndex.append(spark, dedupIndexPath, keptFresh, idCol,
          textCol)
        val kv = kept
          .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
          .select(col(idCol), col(vecCol))
        audit(graft.llm.Similarity
          .probeIndex(spark, annIndexPath, kv, idCol, vecCol, dim, k, nprobe,
            excludeIds = Some(batchIds)), annOut)
        graft.llm.Similarity.appendToIndex(spark, annIndexPath,
          freshAgainstIvf(spark, annIndexPath, kv, idCol), idCol, vecCol,
          dim)
        writeAppliedMarker(fs, markerPath, batchId)
      }
    }

  // ---- streaming CDC apply -------------------------------------------------

  final case class CdcOp(key: Long, tsUs: Long, opId: Long, op: String,
                         value: Double)
  final case class CdcState(tsUs: Long, opId: Long, op: String, value: Double)
  final case class CdcCurrent(key: Long, op: String, tsUs: Long, value: Double,
                              deleted: Boolean)

  /** Streaming CDC apply: maintain the latest op per key under the batch
    * [[graft.operators.Relational.cdcApply]] ordering ((ts, opId) max
    * wins; a winning D tombstones the key) and emit the key's CURRENT
    * state each time it changes. State per key is ONE op — O(keys)
    * forever, no op history. Late ops older than the kept one are
    * ignored, exactly like the batch window's tie-break; a replay or
    * out-of-order delivery therefore converges to the batch snapshot
    * (CdcParitySpec proves it key-for-key). Deleted keys emit with
    * `deleted = true` so a downstream sink can retract — filtering them
    * yields the live snapshot.
    */
  def cdcStream(ops: Dataset[CdcOp]): Dataset[CdcCurrent] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[CdcOp], state: GroupState[CdcState]) =>
          val newest = (state.getOption.map(s =>
              CdcOp(key, s.tsUs, s.opId, s.op, s.value)).iterator ++ rows)
            .maxBy(o => (o.tsUs, o.opId))
          state.update(CdcState(newest.tsUs, newest.opId, newest.op, newest.value))
          CdcCurrent(key, newest.op, newest.tsUs, newest.value,
            deleted = newest.op == "D")
      }
  }

  // ---- R8: incremental day recompute --------------------------------------

  /** Dynamic partition overwrite on day partitions — re-running a day
    * replaces exactly that day's files (reference: database.py:536-551
    * skip/update of already-computed days).
    */
  def writeDayPartitioned(df: DataFrame, tsCol: String, path: String): Unit = {
    // per-WRITE option, not a session conf mutation: setting the session
    // conf would silently flip every later overwrite-partitionBy write in
    // the same session from truncate-table to dynamic semantics
    df.withColumn("day", date_format(col(tsCol), "yyyyMMdd"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(path)
  }

  /** R5: hourly side-input refresh — reload a small dimension each batch and
    * keep the last good value on failure (reference: qpe/qpe.py:432-459 HZT
    * cache fallback). Usage: stream.writeStream.foreachBatch(
    * refreshingBatch(loadSideInput, process)).
    */
  def refreshingBatch[S](load: () => S, process: (DataFrame, S, Long) => Unit)
                        (initial: S): (DataFrame, Long) => Unit = {
    var lastGood: S = initial
    (batch: DataFrame, id: Long) => {
      lastGood = try load() catch { case _: Exception => lastGood }
      process(batch, lastGood, id)
    }
  }

  // ---- streaming materialized-aggregate maintenance ------------------------

  /** Streaming materialized-view maintenance: fold each change micro-batch
    * (`opCol` = +1 insert / −1 retract) into a persisted per-key aggregate
    * state via [[graft.operators.Relational.maintainAgg]] — the serve-and-
    * grow loop of the IVM family, usable as
    * `changes.writeStream.foreachBatch(RT.aggMaintainBatch(...))`.
    *
    * State lives as VERSIONED parquet snapshots under `statePath`
    * (`v<batchId>/` + an `_applied` marker naming the active version):
    * the new state is written to a fresh directory BEFORE the marker
    * flips, so a reader (or a crash) never sees a half-overwritten
    * state, and the previous snapshot is pruned only after the flip.
    * foreachBatch is at-least-once: a replayed batchId (<= the marker's)
    * is a no-op, so retractions are never applied twice — the same
    * marker discipline as [[dedupIngestBatch]]. A crash between the
    * snapshot write and the marker flip leaves an orphan version that
    * the replay overwrites; the unavoidable residue is re-doing work,
    * never wrong state.
    *
    * min/max staleness accumulates in the state (a stream has no base to
    * rescan against); repair offline with
    * [[graft.operators.Relational.rescanExtremes]] against the current
    * base table when extremes are needed — cnt/sum/mean stay exact
    * forever without it.
    */
  def aggMaintainBatch(statePath: String, keys: Seq[String], valCol: String,
                       opCol: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val fs = new org.apache.hadoop.fs.Path(statePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new org.apache.hadoop.fs.Path(s"$statePath/_applied")
      val applied = readAppliedMarker(fs, marker)
      if (batchId > applied) {
        val old =
          if (applied < 0)
            // empty state with the right schema: an aggregate of zero rows
            graft.operators.Relational.buildAggState(
              batch.filter(lit(false)), keys, valCol)
          else spark.read.parquet(s"$statePath/v$applied")
        graft.operators.Relational
          .maintainAgg(old, batch, keys, valCol, opCol)
          .write.mode("overwrite").parquet(s"$statePath/v$batchId")
        writeAppliedMarker(fs, marker, batchId)
        if (applied >= 0)
          fs.delete(new org.apache.hadoop.fs.Path(s"$statePath/v$applied"), true)
      }
    }

  /** Streaming PCA-model maintenance: the Gram matrix is an additive
    * decimal sum per (i, j), so each micro-batch of vectors folds into the
    * maintained d²-row state with ONE d²-key aggregation — the corpus is
    * never rescanned, and [[graft.ml.Pca.powerIteration]] over
    * [[readGramState]] yields an up-to-date principal component at any
    * moment (model freshness without a training pass). Same versioned
    * write-then-flip layout and batchId replay guard as
    * [[aggMaintainBatch]]; superseded versions are pruned.
    *
    * State schema: (i, j, gsum LONG) — the fixed-point integer sums of
    * [[graft.ml.Pca.gram]]'s kernel, kept unscaled on disk so the fold
    * stays associative-exact across any number of batches;
    * [[readGramState]] divides down to the (i, j, g double) relation
    * powerIteration consumes, bit-identical to a batch [[graft.ml.Pca.gram]].
    */
  def gramMaintainBatch(statePath: String, vecCol: String, dim: Int)
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val fs = new org.apache.hadoop.fs.Path(statePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new org.apache.hadoop.fs.Path(s"$statePath/_applied")
      val applied = readAppliedMarker(fs, marker)
      if (batchId > applied) {
        val deltaRows = batch
          .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
          .select(posexplode(col(vecCol)).as(Seq("pi", "xi")),
            col(vecCol).as("__v"))
          .select((col("pi") + 1).as("i"), col("xi").cast("double").as("xi"),
            posexplode(col("__v")).as(Seq("pj", "xj")))
          .select(col("i"), (col("pj") + 1).as("j"),
            (col("xi") * col("xj").cast("double")).as("p"))
          .groupBy(col("i"), col("j"))
          .agg(sum(floor(col("p") * lit(graft.ml.Pca.gramQ)).cast("long"))
            .as("gsum"))
        val merged =
          if (applied < 0) deltaRows
          else spark.read.parquet(s"$statePath/v$applied")
            .unionByName(deltaRows)
            .groupBy(col("i"), col("j"))
            .agg(sum(col("gsum")).as("gsum"))
        merged.write.mode("overwrite").parquet(s"$statePath/v$batchId")
        writeAppliedMarker(fs, marker, batchId)
        if (applied >= 0)
          fs.delete(new org.apache.hadoop.fs.Path(s"$statePath/v$applied"), true)
      }
    }

  /** The maintained Gram written by [[gramMaintainBatch]], as the
    * (i, j, g double) relation [[graft.ml.Pca.powerIteration]] consumes.
    */
  def readGramState(spark: SparkSession, statePath: String): DataFrame = {
    val marker = new org.apache.hadoop.fs.Path(s"$statePath/_applied")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(marker), s"no maintained Gram at $statePath")
    val applied = readAppliedMarker(fs, marker)
    // divide down exactly as Pca.gram's emission (int64→double is
    // correctly rounded; the state keeps the raw integers so the FOLD
    // stays exact — only the read narrows)
    spark.read.parquet(s"$statePath/v$applied")
      .select(col("i"), col("j"),
        (col("gsum").cast("double") / lit(graft.ml.Pca.gramQ)).as("g"))
  }

  /** Streaming conformal monitoring, calibration side: fold each
    * micro-batch of per-group absolute residuals into a maintained
    * (group, bucket, count) state — residuals floor-quantize to 1e-6
    * buckets, so the state is ADDITIVE (the Gram-maintenance physics) and
    * per group is bounded by the distinct-bucket domain, not the
    * calibration volume. Same versioned write-then-flip layout and
    * batchId replay guard as [[aggMaintainBatch]].
    *
    * [[maintainedQuantile]] then answers the conformal threshold
    * k = ⌈(1−α)(n+1)⌉ EXACTLY (over the quantized residuals) by
    * cumulative-count selection — no calibration row is ever rescanned
    * or sorted; [[conformalAlertBatch]] is the serve loop.
    */
  def residualFoldBatch(statePath: String, groupCol: String,
                        residCol: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val fs = new org.apache.hadoop.fs.Path(statePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new org.apache.hadoop.fs.Path(s"$statePath/_applied")
      val applied = readAppliedMarker(fs, marker)
      if (batchId > applied) {
        val delta = batch
          .filter(col(residCol).isNotNull &&
            !isnan(col(residCol).cast("double")))
          .select(col(groupCol).as("g"),
            floor(abs(col(residCol).cast("double")) * lit(residQ))
              .cast("long").as("rb"))
          .groupBy(col("g"), col("rb"))
          .agg(count(lit(1)).as("cnt"))
        val merged =
          if (applied < 0) delta
          else spark.read.parquet(s"$statePath/v$applied")
            .unionByName(delta)
            .groupBy(col("g"), col("rb"))
            .agg(sum(col("cnt")).as("cnt"))
        merged.write.mode("overwrite").parquet(s"$statePath/v$batchId")
        writeAppliedMarker(fs, marker, batchId)
        if (applied >= 0)
          fs.delete(new org.apache.hadoop.fs.Path(s"$statePath/v$applied"), true)
      }
    }

  /** Residual fixed-point quantum (1e-6) shared by the fold, the
    * quantile, and the alert comparison.
    */
  val residQ = 1.0e6

  /** The conformal threshold per group from the maintained residual
    * counts: the k = ⌈(1−α)(n+1)⌉-th smallest quantized |residual|
    * (clamped to n) by cumulative-count selection over the contracted
    * (group, bucket) relation. Returns (g, n_cal, q_hat, q_bucket) —
    * q_bucket is the raw long threshold bucket; serve-side comparisons
    * use it directly (q_hat = q_bucket/residQ round-trips BELOW the
    * bucket for many values, so floor(q_hat*residQ) would under-shoot
    * the threshold and over-alert at the boundary).
    */
  def maintainedQuantile(spark: SparkSession, statePath: String,
                         alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"maintainedQuantile: bad alpha=$alpha")
    val marker = new org.apache.hadoop.fs.Path(s"$statePath/_applied")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(marker), s"no maintained residual state at $statePath")
    val applied = readAppliedMarker(fs, marker)
    val st = spark.read.parquet(s"$statePath/v$applied")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    val wCum = wAll.orderBy(col("rb"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val k = least(
      ceil((lit(1.0) - alpha) * (col("m") + 1).cast("double")).cast("long"),
      col("m"))
    st.withColumn("m", sum(col("cnt")).over(wAll))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .groupBy(col("g"))
      .agg(max(col("m")).as("n_cal"),
        min(when(col("cum") >= k, col("rb"))).as("q_bucket"))
      .select(col("g"), col("n_cal"),
        (col("q_bucket").cast("double") / lit(residQ)).as("q_hat"),
        col("q_bucket"))
  }

  /** Streaming conformal serve loop: flag each micro-batch row whose
    * quantized |residual| exceeds the maintained per-group threshold.
    * Alert rows (the batch columns + q_hat + alert) append to `outPath`;
    * the batchId marker in `outPath` makes replays no-ops. Groups with no
    * calibration state get NULL q_hat and alert = null (unscoreable is
    * explicit, never a silent pass).
    */
  def conformalAlertBatch(statePath: String, groupCol: String,
                          residCol: String, alpha: Double,
                          outPath: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val markerPath = new org.apache.hadoop.fs.Path(s"$outPath/_serve_batch")
      val fs = markerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val applied = readAppliedMarker(fs, markerPath)
      if (batchId > applied) {
        val q = maintainedQuantile(spark, statePath, alpha)
          .select(col("g").as(groupCol), col("q_hat"), col("q_bucket"))
        batch.localCheckpoint()
          .join(broadcast(q), Seq(groupCol), "left_outer")
          .withColumn("alert",
            floor(abs(col(residCol).cast("double")) * lit(residQ)) >
              col("q_bucket"))
          .drop("q_bucket")
          .write.mode("append").parquet(outPath)
        writeAppliedMarker(fs, markerPath, batchId)
      }
    }

  /** The active maintained state written by [[aggMaintainBatch]]. */
  def readAggState(spark: SparkSession, statePath: String): DataFrame = {
    val marker = new org.apache.hadoop.fs.Path(s"$statePath/_applied")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(marker), s"no maintained state at $statePath")
    val applied = readAppliedMarker(fs, marker)
    spark.read.parquet(s"$statePath/v$applied")
  }

  // ---- streaming funnel ----------------------------------------------------

  final case class FunnelEvent(user_id: Long, tsUs: Long, event_type: String)
  /** Per-user funnel state: first-clear event-time (µs) per step, -1 = not yet. */
  final case class FunnelState(clears: Seq[Long])
  final case class FunnelProgress(user_id: Long, step_reached: Int)

  /** Streaming funnel progress: per user, the deepest step cleared so far
    * under the batch operator's strict first-occurrence semantics
    * ([[graft.operators.Behavior.funnel]] — step k clears at the earliest
    * step-k event strictly after the step-(k−1) clear). State per user is
    * the |steps|-long clear-time vector — O(steps), bounded forever.
    * Events are folded in (ts-sorted within each micro-batch); clear times
    * only ever move FORWARD, so the stream is exact under in-order
    * per-user delivery (and single-batch replays) and conservative —
    * never overcounting — when an event arrives after a later-ts event
    * already cleared its step. One Update-mode row per user per batch.
    * FunnelParitySpec proves the AvailableNow replay agrees with the
    * batch operator user-for-user.
    */
  def funnelStream(events: Dataset[FunnelEvent],
                   steps: Seq[String]): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "funnelStream needs at least one step")
    val stepIdx = steps.zipWithIndex.toMap
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          val clears = state.getOption
            .map(_.clears.toArray)
            .getOrElse(Array.fill(steps.length)(-1L))
          rows.toSeq.sortBy(_.tsUs).foreach { e =>
            stepIdx.get(e.event_type).foreach { k =>
              val prevCleared = k == 0 || clears(k - 1) >= 0
              val afterPrev = k == 0 || e.tsUs > clears(k - 1)
              if (clears(k) < 0 && prevCleared && afterPrev)
                clears(k) = e.tsUs
            }
          }
          state.update(FunnelState(clears.toSeq))
          FunnelProgress(user, clears.lastIndexWhere(_ >= 0) + 1)
      }
  }
}
