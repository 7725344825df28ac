package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-maintenance asymptotics sweep (round 9).
  *
  * The write-lifecycle claims (q179/q181/q182/q183) are all of the form
  * "costed by the manifest, not the table" — O(touched files + |delta|)
  * MERGE, O(boundary files) delete, point reads that open a handful of
  * files. A claim about asymptotics needs a measured curve: this probe
  * holds the DELTA fixed and grows the TABLE, so the flat per-op wall
  * IS the evidence (and the one arm that must grow linearly — the
  * formatless full-rewrite a table without a manifest performs — is
  * measured beside it as the contrast).
  *
  * Per table size n (files × rowsPerFile rows, key-range-sorted so the
  * manifest's range math has real pruning power):
  *
  *   - merge:   256 updates confined to ONE file's key band + 32
  *              inserts beyond every range → expect wall ~constant in n
  *   - delete:  a key range covering ~2 interior files + 2 boundary
  *              slivers → expect wall ~constant in n
  *   - bloom:   3-key point read via the per-file bloom manifest on an
  *              UNSORTED column → report files opened vs total
  *   - rewrite: the formatless contrast — full table ∪ delta rewritten
  *              → expect wall ~linear in n
  *
  * One `MANIFEST_SCALE:` JSON line per (n, op). Not part of the
  * per-round driver protocol; numbers → BASELINE.md.
  *
  * Env: SPARK_GRAFT_MSB_FILES (default "8,32,128"),
  * SPARK_GRAFT_MSB_ROWS_PER_FILE (default 250000), SPARK_GRAFT_CPUS.
  */
object ManifestScaleBench {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val fileCounts = sys.env.getOrElse("SPARK_GRAFT_MSB_FILES", "8,32,128")
      .split(",").map(_.trim.toInt).toSeq
    val rowsPerFile = sys.env.getOrElse("SPARK_GRAFT_MSB_ROWS_PER_FILE", "250000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().appName("graft-manifest-scale")
        .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.io.FileSkipping

    val scratch = "/root/repo/target/scratch/manifest_scale"
    // arm gating: SPARK_GRAFT_MSB_ARMS="slowfs,lag" re-measures one claim
    // without re-paying the full sweep (default: all)
    val arms = sys.env.getOrElse("SPARK_GRAFT_MSB_ARMS", "all")
    def armOn(name: String): Boolean =
      arms == "all" || arms.split(",").map(_.trim).contains(name)
    if (armOn("size")) fileCounts.foreach { nFiles =>
      val rows = nFiles * rowsPerFile
      val base = s"$scratch/n$nFiles"
      graft.util.Staging.deleteRecursive(base)
      // key-sorted table: key = row id; an unsorted probe column for the
      // bloom arm; two payload cols so files have realistic width
      // needle-shaped probe column: ~4 rows per probe value, scattered
      // uniformly — the "one order's line items" lookup shape, so the
      // true-positive file set stays ~constant while the table grows
      val probeDomain = math.max(1L, rows / 4)
      val (_, stageSec) = time {
        spark.range(rows).select(
            col("id").as("key"),
            pmod(hash(col("id")), lit(probeDomain)).cast("long").as("probe"),
            (col("id") % 997 / 7.0).as("v"),
            md5(col("id").cast("string")).as("payload"))
          .repartitionByRange(nFiles, col("key"))
          .sortWithinPartitions("key")
          .write.mode("overwrite").parquet(s"$base/data")
        FileSkipping.buildManifest(spark, s"$base/data", "key")
          .write.mode("overwrite").parquet(s"$base/manifest")
      }
      println(s"""MANIFEST_SCALE: {"op":"stage","files":$nFiles,"rows":$rows,"wall_sec":$stageSec}""")

      // ── merge: fixed delta, one-file band + beyond-range inserts ──
      val bandLo = rowsPerFile / 2
      // no caller-side cache: mergeKeyed caches its delta internally
      val delta = spark.range(bandLo, bandLo + 256).select(
          col("id").as("key"), lit(-1L).as("probe"), lit(9.9).as("v"),
          lit("MERGED").as("payload"))
        .unionByName(spark.range(32).select((col("id") + rows + 1000000L).as("key"),
          lit(-2L).as("probe"), lit(8.8).as("v"), lit("INSERTED").as("payload")))
      val ((hit, appended), mergeSec) = time {
        FileSkipping.mergeKeyed(spark, s"$base/data", s"$base/manifest", "key", delta)
      }
      println(s"""MANIFEST_SCALE: {"op":"merge","files":$nFiles,"rows":$rows,"wall_sec":$mergeSec,"files_rewritten":$hit,"files_appended":$appended}""")

      // ── delete: ~2 interior files + 2 boundary slivers ────────────
      val lo = 2 * rowsPerFile - rowsPerFile / 4
      val hi = 4 * rowsPerFile + rowsPerFile / 4
      val ((retired, rewritten), delSec) = time {
        FileSkipping.deleteRange(spark, s"$base/data", s"$base/manifest", "key",
          lit(lo), lit(hi))
      }
      println(s"""MANIFEST_SCALE: {"op":"delete","files":$nFiles,"rows":$rows,"wall_sec":$delSec,"files_retired_unread":$retired,"files_rewritten":$rewritten}""")

      // ── bloom point read on the UNSORTED probe column ─────────────
      // sized at the engine's own rule (~16 bits per expected distinct
      // key per file, pow-2 words): an undersized bloom saturates and
      // admits everything — the first run of this bench proved it at
      // 8192 words vs ~220k distinct probes/file
      val nWords = Integer.highestOneBit(math.max(64, rowsPerFile * 16 / 64).toInt * 2 - 1)
      val (_, bloomBuildSec) = time {
        FileSkipping.buildBloomManifest(spark, s"$base/data", "probe", nWords)
          .write.mode("overwrite").parquet(s"$base/bloom")
      }
      val probeKeys = Array(17L, probeDomain / 2, probeDomain - 1)
      val ((opened, total, found), bloomSec) = time {
        val admitted = FileSkipping.bloomPointRead(spark, s"$base/data", s"$base/bloom", probeKeys)
        val n = admitted.filter(col("probe").isin(probeKeys.map(Long.box).toIndexedSeq: _*)).count()
        (admitted.inputFiles.length, spark.read.parquet(s"$base/manifest").count(), n)
      }
      println(s"""MANIFEST_SCALE: {"op":"bloom_point","files":$nFiles,"rows":$rows,"wall_sec":$bloomSec,"bloom_build_sec":$bloomBuildSec,"files_opened":$opened,"files_total":$total,"rows_found":$found}""")

      // ── the formatless contrast: full-table rewrite for the same merge ─
      val delta2 = spark.range(128).select((col("id") + rows + 5000000L).as("key"),
        lit(-3L).as("probe"), lit(7.7).as("v"), lit("MERGED2").as("payload"))
      val (_, rewriteSec) = time {
        spark.read.parquet(s"$base/data")
          .join(broadcast(delta2.select("key")), Seq("key"), "left_anti")
          .unionByName(delta2)
          .repartitionByRange(nFiles, col("key"))
          .sortWithinPartitions("key")
          .write.mode("overwrite").parquet(s"$base/rewrite")
      }
      println(s"""MANIFEST_SCALE: {"op":"full_rewrite","files":$nFiles,"rows":$rows,"wall_sec":$rewriteSec}""")
      graft.util.Staging.deleteRecursive(s"$base/rewrite")
    }

    // ── versioned-mode A/B at one mid size: what snapshot isolation
    // costs. Same merge/delete deltas as above on a fresh copy, with a
    // version log; then vacuum to head. The interesting numbers are the
    // wall DELTA vs in-place (expected ~0 — the physical delete moves,
    // nothing else changes) and the retained-bytes the log holds until
    // vacuum (the storage price of time travel).
    if (armOn("versioned")) {
      import graft.io.{FileSkipping, VersionLog}
      val nFiles = 32
      val rows = nFiles * rowsPerFile
      val base = s"$scratch/versioned"
      graft.util.Staging.deleteRecursive(base)
      spark.range(rows).select(
          col("id").as("key"),
          (col("id") % 997 / 7.0).as("v"),
          md5(col("id").cast("string")).as("payload"))
        .repartitionByRange(nFiles, col("key"))
        .sortWithinPartitions("key")
        .write.mode("overwrite").parquet(s"$base/data")
      FileSkipping.buildManifest(spark, s"$base/data", "key")
        .write.mode("overwrite").parquet(s"$base/manifest")
      val vdir = s"$base/versions"
      VersionLog.commit(spark, vdir, s"$base/manifest")
      def dataBytes(): Long = {
        val p = new org.apache.hadoop.fs.Path(s"$base/data")
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        fs.getContentSummary(p).getLength
      }
      val bytes0 = dataBytes()
      val bandLo = rowsPerFile / 2
      val delta = spark.range(bandLo, bandLo + 256).select(
        col("id").as("key"), lit(9.9).as("v"), lit("MERGED").as("payload"))
      val (_, vMergeSec) = time {
        FileSkipping.mergeKeyed(spark, s"$base/data", s"$base/manifest", "key",
          delta, versionLog = Some(vdir))
      }
      val (_, vDelSec) = time {
        FileSkipping.deleteRange(spark, s"$base/data", s"$base/manifest", "key",
          lit(2 * rowsPerFile - rowsPerFile / 4), lit(4 * rowsPerFile + rowsPerFile / 4),
          versionLog = Some(vdir))
      }
      val bytesRetained = dataBytes()
      val ((deadFiles, droppedVersions), vacSec) = time {
        VersionLog.vacuum(spark, s"$base/data", vdir, retainLast = 1)
      }
      val bytesAfter = dataBytes()
      println(s"""MANIFEST_SCALE: {"op":"versioned_merge","files":$nFiles,"rows":$rows,"wall_sec":$vMergeSec}""")
      println(s"""MANIFEST_SCALE: {"op":"versioned_delete","files":$nFiles,"rows":$rows,"wall_sec":$vDelSec}""")
      println(s"""MANIFEST_SCALE: {"op":"vacuum","files":$nFiles,"rows":$rows,"wall_sec":$vacSec,"files_deleted":$deadFiles,"versions_dropped":$droppedVersions,"data_bytes_base":$bytes0,"data_bytes_retained":$bytesRetained,"data_bytes_after_vacuum":$bytesAfter}""")
    }

    // ── log-LENGTH sweep (round-10): commit/begin cost vs table history.
    // head() used to list every version dir (O(V) RPCs) and every commit
    // calls head(), so per-commit wall grew linearly with history — the
    // `_head` pointer makes it flat. The sweep commits N versions of a
    // tiny manifest and reports per-commit wall in windows (early / mid
    // / late — flat slope IS the claim), begin() at full depth, and the
    // measured cost of the pre-pointer LISTING head as the contrast.
    if (armOn("loglen")) {
      import graft.io.{FileSkipping, VersionLog}
      val nCommits = sys.env.getOrElse("SPARK_GRAFT_MSB_COMMITS", "120").toInt
      val base = s"$scratch/loglen"
      graft.util.Staging.deleteRecursive(base)
      spark.range(1000).select(col("id").as("key"), lit(1.0).as("v"))
        .repartitionByRange(4, col("key"))
        .write.mode("overwrite").parquet(s"$base/data")
      FileSkipping.buildManifest(spark, s"$base/data", "key")
        .write.mode("overwrite").parquet(s"$base/manifest")
      val vdir = s"$base/versions"
      val walls = (0 until nCommits).map { _ =>
        time(VersionLog.commit(spark, vdir, s"$base/manifest"))._2
      }
      def avg(xs: Seq[Double]) = xs.sum / xs.length
      val (first, mid, last) =
        (avg(walls.take(10)), avg(walls.slice(nCommits / 2 - 5, nCommits / 2 + 5)),
          avg(walls.takeRight(10)))
      val (_, beginSec) = time(VersionLog.begin(spark, vdir))
      // the pre-pointer head(): list every version dir + one exists() each
      val (_, listHeadSec) = time {
        val p = new org.apache.hadoop.fs.Path(vdir)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        fs.listStatus(p).map(_.getPath.getName)
          .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
          .filter(n => fs.exists(new org.apache.hadoop.fs.Path(s"$vdir/$n/_SUCCESS")))
          .map(_.drop(1).toInt).foldLeft(-1)(math.max)
      }
      val (_, ptrHeadSec) = time(VersionLog.head(spark, vdir))
      println(s"""MANIFEST_SCALE: {"op":"log_length","commits":$nCommits,"commit_sec_first10":$first,"commit_sec_mid10":$mid,"commit_sec_last10":$last,"begin_sec_at_depth":$beginSec,"head_listing_sec":$listHeadSec,"head_pointer_sec":$ptrHeadSec}""")
    }

    // ── deep-LAG validation sweep (round-11): commitRebase's conflict
    // validation used to run ~3 Spark jobs PER intermediate version, so
    // a deeply-lagged commit paid wall linear ×3 in writer lag. The
    // one-unioned-read rewrite folds the whole window into one job +
    // a driver-side scan — this arm pins a transaction, lands `lag`
    // band-disjoint intermediate commits, then measures the pinned
    // commit's wall at lag 1 / 25 / 50 (near-flat IS the claim; each
    // intermediate append is validated against and rebased over).
    if (armOn("lag")) {
      import graft.io.{FileSkipping, VersionLog}
      val base = s"$scratch/lagdepth"
      graft.util.Staging.deleteRecursive(base)
      spark.range(100000).select(col("id").as("key"), (col("id") % 997 / 7.0).as("v"))
        .repartitionByRange(8, col("key")).sortWithinPartitions("key")
        .write.mode("overwrite").parquet(s"$base/data")
      FileSkipping.buildManifest(spark, s"$base/data", "key")
        .write.mode("overwrite").parquet(s"$base/manifest")
      val vdir = s"$base/versions"
      VersionLog.commit(spark, vdir, s"$base/manifest")
      var nextKey = 10000000L
      Seq(1, 25, 50).foreach { lag =>
        val pin = VersionLog.begin(spark, vdir)
        (0 until lag).foreach { i =>
          FileSkipping.appendOcc(
            spark.range(nextKey, nextKey + 10).select(col("id").as("key"), lit(1.0).as("v")),
            s"$base/data", vdir, "key", s"lag$lag-i$i")
          nextKey += 1000000L
        }
        val delta = spark.range(nextKey, nextKey + 10)
          .select(col("id").as("key"), lit(2.0).as("v"))
        nextKey += 1000000L
        val (_, commitSec) = time {
          FileSkipping.mergeKeyedOcc(spark, s"$base/data", vdir, "key", delta,
            s"lagtxn$lag", pinned = Some(pin))
        }
        println(s"""MANIFEST_SCALE: {"op":"validate_lag","lag":$lag,"commit_sec":$commitSec}""")
      }
    }

    // ── OCC write-CONTENTION sweep (round-11): N writers race the same
    // log with retry-until-commit loops (file-disjoint updates, so the
    // cost under test is claim contention + rebase-chain validation, not
    // conflict work). commits_per_sec is the table's multi-writer
    // throughput ceiling; aborts counts real conflict retries (expected
    // ~0 here — disjoint writers spin on claims, they don't conflict).
    if (armOn("contention")) {
      import graft.io.{FileSkipping, VersionLog}
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      Seq(1, 2, 4, 8).foreach { writers =>
        val base = s"$scratch/contention_w$writers"
        graft.util.Staging.deleteRecursive(base)
        spark.range(1000000).select(col("id").as("key"), (col("id") % 997 / 7.0).as("v"))
          .repartitionByRange(16, col("key")).sortWithinPartitions("key")
          .write.mode("overwrite").parquet(s"$base/data")
        FileSkipping.buildManifest(spark, s"$base/data", "key")
          .write.mode("overwrite").parquet(s"$base/manifest")
        val vdir = s"$base/versions"
        VersionLog.commit(spark, vdir, s"$base/manifest")
        val aborts = new java.util.concurrent.atomic.AtomicInteger()
        val (_, wall) = time {
          val futs = (0 until writers).map { w =>
            Future {
              val lo = w * 62500L + 100 // each writer inside its own file's band
              val delta = spark.range(lo, lo + 64)
                .select(col("id").as("key"), lit(9.9).as("v"))
              var committed = -1
              var attempt = 0
              while (committed < 0) {
                attempt += 1
                try committed = FileSkipping.mergeKeyedOcc(spark, s"$base/data", vdir,
                  "key", delta, s"c$w-a$attempt",
                  pinned = Some(VersionLog.begin(spark, vdir)))
                catch {
                  case _: java.util.ConcurrentModificationException =>
                    aborts.incrementAndGet()
                }
              }
              committed
            }
          }
          futs.foreach(Await.result(_, 10.minutes))
        }
        println(f"""MANIFEST_SCALE: {"op":"occ_contention","writers":$writers,"wall_sec":$wall%.3f,"aborts":${aborts.get()},"commits_per_sec":${writers / wall}%.3f}""")
      }
    }

    // ── object-store-SHAPED version log (round-11): the head-pointer and
    // one-job-validation claims re-measured where every FS metadata call
    // costs a 25 ms round-trip (graft.util.SlowFs — the S3/GCS shape).
    // Data files stay on the local scheme; only the LOG pays latency,
    // which is exactly the 100 TB deployment split. head() via the
    // pointer is O(1+lag) RPCs vs the listing's O(V); the lag-25 commit
    // validates the whole window through ONE multi-path read.
    // ── schema-EVOLUTION read path (round-12): the evolution design
    // claim is "the log carries the schema, reads never pay mergeSchema
    // footer scans". Contrast, over a table whose files straddle an
    // added column (the post-evolution steady state): (a) the engine's
    // read — explicit log-recorded schema, pre-evolution files
    // null-fill; (b) Spark's mergeSchema=true — a footer read of EVERY
    // file before the scan can even plan; (c) the naive schema-inferred
    // read, which is WRONG (footer-sampling order decides whether the
    // evolved column exists) — its wall is reported only as the floor.
    // Walls are the full aggregate over the evolved column.
    if (armOn("evolution")) {
      val nFiles = 128
      val rowsPer = 50000L
      val base = s"$scratch/evolution"
      graft.util.Staging.deleteRecursive(base)
      // 64 pre-evolution files (k, v) + 64 post-evolution files (k, v, w)
      spark.range(64 * rowsPer).select(col("id").as("k"), (col("id") % 97 / 7.0).as("v"))
        .repartitionByRange(64, col("k")).sortWithinPartitions("k")
        .write.mode("overwrite").parquet(s"$base/data/old")
      spark.range(64 * rowsPer, 128 * rowsPer).select(col("id").as("k"),
          (col("id") % 97 / 7.0).as("v"), (col("id") % 13 * 1.0).as("w"))
        .repartitionByRange(64, col("k")).sortWithinPartitions("k")
        .write.mode("overwrite").parquet(s"$base/data/new")
      val evolved = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("w", org.apache.spark.sql.types.DoubleType)))
      def agg(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(count(col("w"))).head().getLong(0)
      def rec(path: String) = spark.read.schema(evolved)
        .option("recursiveFileLookup", "true").parquet(path)
      def merge(path: String) = spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true").parquet(path)
      // local: min-of-2 (first read pays session warm-up) — footers are
      // ~free on local disk, so this is the floor, not the claim
      def min2(f: => Long): (Long, Double) = {
        val (n1, s1) = time(f); val (_, s2) = time(f); (n1, math.min(s1, s2))
      }
      val (nRec, recSec) = min2(agg(rec(s"$base/data")))
      val (nMerge, mergeSec) = min2(agg(merge(s"$base/data")))
      require(nRec == 64 * rowsPer && nMerge == nRec,
        s"evolution reads disagree: recorded=$nRec merged=$nMerge")
      // object-store-shaped (every FS call +25 ms, same files through the
      // slowfs scheme): mergeSchema must read EVERY footer before the
      // scan can plan — the per-file RTT term the schema record removes
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.slowfs.impl", "graft.util.SlowFs")
      hc.setBoolean("fs.slowfs.impl.disable.cache", true)
      hc.setLong("graft.slowfs.latency.ms", 25L)
      val (_, recSlowSec) = time(agg(rec(s"slowfs:$base/data")))
      val (_, mergeSlowSec) = time(agg(merge(s"slowfs:$base/data")))
      hc.setLong("graft.slowfs.latency.ms", 0L)
      println(f"""MANIFEST_SCALE: {"op":"evolution_read","files":$nFiles,"recorded_schema_sec":$recSec%.3f,"merge_schema_sec":$mergeSec%.3f,"recorded_schema_slowfs_sec":$recSlowSec%.3f,"merge_schema_slowfs_sec":$mergeSlowSec%.3f}""")
    }

    if (armOn("slowfs")) {
      import graft.io.{FileSkipping, VersionLog}
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.slowfs.impl", "graft.util.SlowFs")
      hc.setBoolean("fs.slowfs.impl.disable.cache", true)
      hc.setLong("graft.slowfs.latency.ms", 25L)
      val localBase = s"$scratch/slowlog"
      graft.util.Staging.deleteRecursive(localBase)
      spark.range(100000).select(col("id").as("key"), (col("id") % 997 / 7.0).as("v"))
        .repartitionByRange(8, col("key")).sortWithinPartitions("key")
        .write.mode("overwrite").parquet(s"$localBase/data")
      FileSkipping.buildManifest(spark, s"$localBase/data", "key")
        .write.mode("overwrite").parquet(s"$localBase/manifest")
      val vdir = s"slowfs:$localBase/versions"
      VersionLog.commit(spark, vdir, s"$localBase/manifest")
      val pin = VersionLog.begin(spark, vdir)
      var nextKey = 10000000L
      val (_, appendsSec) = time {
        (0 until 25).foreach { i =>
          FileSkipping.appendOcc(
            spark.range(nextKey, nextKey + 10).select(col("id").as("key"), lit(1.0).as("v")),
            s"$localBase/data", vdir, "key", s"slow-i$i")
          nextKey += 1000000L
        }
      }
      val delta = spark.range(nextKey, nextKey + 10)
        .select(col("id").as("key"), lit(2.0).as("v"))
      val (_, lagSec) = time {
        FileSkipping.mergeKeyedOcc(spark, s"$localBase/data", vdir, "key", delta,
          "slowlag", pinned = Some(pin))
      }
      val (_, ptrSec) = time(VersionLog.head(spark, vdir))
      val (_, listSec) = time { // the pre-pointer contrast
        val p = new org.apache.hadoop.fs.Path(vdir)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        fs.listStatus(p).map(_.getPath.getName)
          .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
          .filter(n => fs.exists(new org.apache.hadoop.fs.Path(s"$vdir/$n/_SUCCESS")))
          .map(_.drop(1).toInt).foldLeft(-1)(math.max)
      }
      hc.setLong("graft.slowfs.latency.ms", 0L) // don't tax later sessions
      println(f"""MANIFEST_SCALE: {"op":"slowfs_log","latency_ms":25,"depth":27,"per_commit_sec":${appendsSec / 25}%.3f,"lag25_commit_sec":$lagSec%.3f,"head_pointer_sec":$ptrSec%.3f,"head_listing_sec":$listSec%.3f}""")
    }

    // the CDC-commit cost on an object-store-shaped log+feed (round 13:
    // the commit-ordered visibility protocol adds exactly 2 feed-side
    // RPCs per CDC commit — intent create before `_SUCCESS`, best-effort
    // delete after the stamp; this arm measures the merge-with-feed
    // wall and the incremental poll so the arithmetic stays empirical)
    if (armOn("cdc")) {
      import graft.io.{FileSkipping, VersionLog}
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.slowfs.impl", "graft.util.SlowFs")
      hc.setBoolean("fs.slowfs.impl.disable.cache", true)
      hc.setLong("graft.slowfs.latency.ms", 25L)
      val localBase = s"$scratch/cdclog"
      graft.util.Staging.deleteRecursive(localBase)
      spark.range(100000).select(col("id").as("key"), (col("id") % 997 / 7.0).as("v"))
        .repartitionByRange(8, col("key")).sortWithinPartitions("key")
        .write.mode("overwrite").parquet(s"$localBase/data")
      FileSkipping.buildManifest(spark, s"$localBase/data", "key")
        .write.mode("overwrite").parquet(s"$localBase/manifest")
      val vdir = s"slowfs:$localBase/versions"
      val cdc = s"slowfs:$localBase/cdc"
      VersionLog.commit(spark, vdir, s"$localBase/manifest")
      val nMerges = 8
      val (_, mergesSec) = time {
        (0 until nMerges).foreach { i =>
          FileSkipping.mergeKeyedOcc(spark, s"$localBase/data", vdir, "key",
            spark.range(i * 1000L, i * 1000L + 10)
              .select(col("id").as("key"), lit(i.toDouble).as("v")),
            s"cdc-i$i", pinned = Some(VersionLog.begin(spark, vdir)),
            cdcDir = Some(cdc))
        }
      }
      val (pollRows, pollSec) = time {
        val (df, _) = FileSkipping.readCommittedFeedsSince(spark, cdc, 0)
        df.map(_.count()).getOrElse(0L)
      }
      hc.setLong("graft.slowfs.latency.ms", 0L)
      println(f"""MANIFEST_SCALE: {"op":"cdc_commit","latency_ms":25,"merges":$nMerges,"per_cdc_commit_sec":${mergesSec / nMerges}%.3f,"poll_all_sec":$pollSec%.3f,"poll_rows":$pollRows}""")
    }

    // the two remaining O(history)-shaped DIAGNOSTIC paths, measured at
    // deep logs on the 25 ms store (round-13 verdict #8): DESCRIBE
    // HISTORY (now one recursive listing + one multi-path read — flat in
    // DRIVER round-trips; SlowFs has no LIST pagination, so its wall
    // shows the per-directory listing tax a paginated object store
    // amortizes ~1000:1) and the steady-state feed POLL, whose per-slot
    // marker listings are O(slots on disk) — bounded in production by
    // vacuumFeeds retention, measured here before and after the vacuum.
    // Log depth is FABRICATED (v1..vN are byte-copies of v0's snapshot
    // dir; slots are empty marker-stamped dirs): the commit path's cost
    // is the slowfs/cdc arms' claim, this arm measures the READ paths.
    if (armOn("history")) {
      import graft.io.{FileSkipping, VersionLog}
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.slowfs.impl", "graft.util.SlowFs")
      hc.setBoolean("fs.slowfs.impl.disable.cache", true)
      val depths = sys.env.getOrElse("SPARK_GRAFT_MSB_HISTORY_DEPTHS", "200,1000")
        .split(",").map(_.trim.toInt).toSeq
      depths.foreach { depth =>
        val localBase = s"$scratch/hist$depth"
        graft.util.Staging.deleteRecursive(localBase)
        spark.range(100000).select(col("id").as("key"), (col("id") % 997 / 7.0).as("v"))
          .repartitionByRange(4, col("key")).sortWithinPartitions("key")
          .write.mode("overwrite").parquet(s"$localBase/data")
        FileSkipping.buildManifest(spark, s"$localBase/data", "key")
          .write.mode("overwrite").parquet(s"$localBase/manifest")
        VersionLog.commit(spark, s"$localBase/versions", s"$localBase/manifest") // v0
        val v0 = new java.io.File(s"$localBase/versions/v0")
        (1 until depth).foreach { v =>
          val dst = new java.io.File(s"$localBase/versions/v$v")
          dst.mkdirs()
          v0.listFiles().foreach { f =>
            java.nio.file.Files.copy(f.toPath,
              new java.io.File(dst, f.getName).toPath)
          }
        }
        hc.setLong("graft.slowfs.latency.ms", 25L)
        val (histRows, histSec) = time {
          VersionLog.describeHistory(spark, s"slowfs:$localBase/versions").count()
        }
        hc.setLong("graft.slowfs.latency.ms", 0L)
        val cdcLocal = new java.io.File(s"$localBase/cdc")
        cdcLocal.mkdirs()
        (1 to depth).foreach { v =>
          val slot = new java.io.File(cdcLocal, s"txn-h$v")
          slot.mkdirs()
          new java.io.File(slot, s"_COMMITTED_v$v").createNewFile()
        }
        hc.setLong("graft.slowfs.latency.ms", 25L)
        val (_, pollSec) = time {
          FileSkipping.readCommittedFeedsSince(spark, s"slowfs:$localBase/cdc", depth)
        }
        hc.setLong("graft.slowfs.latency.ms", 0L)
        FileSkipping.vacuumFeeds(spark, s"$localBase/cdc", depth - 8,
          versionsDir = Some(s"$localBase/versions"))
        hc.setLong("graft.slowfs.latency.ms", 25L)
        val (_, pollVacSec) = time {
          FileSkipping.readCommittedFeedsSince(spark, s"slowfs:$localBase/cdc", depth)
        }
        hc.setLong("graft.slowfs.latency.ms", 0L)
        println(f"""MANIFEST_SCALE: {"op":"history","latency_ms":25,"depth":$depth,"describe_history_sec":$histSec%.3f,"history_rows":$histRows,"poll_caughtup_sec":$pollSec%.3f,"poll_after_vacuum_sec":$pollVacSec%.3f,"slots_retained":8}""")
      }
    }
    spark.stop()
  }
}
