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
  * Still single-writer (versions are claimed by directory name, not a
  * CAS); what this buys over the in-place layout is WRITER/READER
  * isolation, which is the concurrency a 100 TB analytics table actually
  * needs day-to-day. Multi-WRITER commits need an atomic log append
  * (DynamoDB lock / Iceberg catalog swap) — out of scope, documented. */
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

  /** Snapshot the live manifest as version head+1. Returns the new
    * version. Called by every versioned mutation AFTER its manifest
    * swap, so the head version always mirrors the live manifest. */
  def commit(spark: SparkSession, versionsDir: String, manifestDir: String): Int = {
    val v = head(spark, versionsDir) + 1
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
    * listing — a file the log never saw is never touched. Returns
    * (data files deleted, versions dropped). */
  def vacuum(spark: SparkSession, dataDir: String, versionsDir: String,
             retainLast: Int): (Int, Int) = {
    require(retainLast >= 1, "must retain at least the head version")
    val h = head(spark, versionsDir)
    val cutoff = h - retainLast + 1 // lowest retained version
    if (cutoff <= 0) return (0, 0)
    def filesOf(vs: Range): Set[String] =
      if (vs.isEmpty) Set.empty
      else vs.map(v => manifestAt(spark, versionsDir, v).select("file"))
        .reduce(_ unionByName _).distinct()
        .collect().map(_.getString(0)).toSet
    val retained = filesOf(cutoff to h)
    val dropped = filesOf(0 until cutoff)
    val (fs, _) = fsFor(spark, versionsDir)
    val dead = (dropped -- retained).toSeq.sorted
    dead.foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f), false))
    (0 until cutoff).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$versionsDir/v$v"), true)
    }
    (dead.length, cutoff)
  }
}
