package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * The operating model stays single-writer, but the commit slot is
  * claimed with an atomic exclusive create ([[commit]]): a racing
  * second writer fails LOUDLY instead of silently clobbering a version.
  * What the log buys over the in-place layout is WRITER/READER
  * isolation — the concurrency a 100 TB analytics table actually needs
  * day-to-day. True multi-writer (content-level conflict
  * re-validation, atomic log append on plain S3) needs a lock service
  * or catalog swap — out of scope, documented at [[commit]]. */
object VersionLog {

  private def fsFor(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Highest committed version, or -1 if the log is empty. */
  def head(spark: SparkSession, versionsDir: String): Int = {
    val (fs, p) = fsFor(spark, versionsDir)
    if (!fs.exists(p)) -1
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toInt).foldLeft(-1)(math.max)
  }

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
    * (content-level conflict re-validation, Delta's next layer up,
    * stays out of scope and documented). A committer that crashes
    * between claim and snapshot leaves an ORPHANED claim that blocks
    * the slot; remediation is the manual unlock every lock-file
    * protocol has — delete `.claim-v<N>` after confirming no writer is
    * active (a `v<N>` dir present means the snapshot landed and the
    * claim is merely spent). Returns the new version. */
  def commit(spark: SparkSession, versionsDir: String, manifestDir: String): Int = {
    val (fs, p) = fsFor(spark, versionsDir)
    if (!fs.exists(p)) fs.mkdirs(p)
    val v = head(spark, versionsDir) + 1
    val claim = new org.apache.hadoop.fs.Path(s"$versionsDir/.claim-v$v")
    try fs.create(claim, /* overwrite = */ false).close()
    catch {
      case _: java.io.IOException if fs.exists(claim) =>
        throw new java.util.ConcurrentModificationException(
          s"version $v of $versionsDir already claimed by another writer — " +
            "re-run the mutation against the new head")
    }
    spark.read.parquet(manifestDir)
      .write.mode("overwrite").parquet(s"$versionsDir/v$v")
    v
  }

  /** The manifest as of version `v` — feed to
    * [[FileSkipping.prunedRead]]-style logic or [[readVersion]]. */
  def manifestAt(spark: SparkSession, versionsDir: String, v: Int): DataFrame =
    spark.read.parquet(s"$versionsDir/v$v")

  /** Read the table AS OF version `v`: exactly the files that version's
    * manifest references — unaffected by every later MERGE / delete /
    * compaction, because versioned mutations never delete data files. */
  def readVersion(spark: SparkSession, versionsDir: String, v: Int): DataFrame = {
    val files = manifestAt(spark, versionsDir, v)
      .select("file").collect().map(_.getString(0)).sorted
    spark.read.parquet(files.toIndexedSeq: _*)
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
    * after previous vacuums removed older versions. Returns
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
