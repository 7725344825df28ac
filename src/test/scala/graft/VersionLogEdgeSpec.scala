package graft

import org.apache.spark.sql.functions._

/** Version-log and manifest EDGE contracts added in round 11:
  *
  *   - a corrupt `_head` pointer (digits past Int range — the case plain
  *     digit-filtering misses) degrades head() to the listing, never
  *     throws;
  *   - vacuum racing an open pin fails LOUDLY at commit, with the
  *     "vacuumed while in flight" message, never a wrong rebase;
  *   - the versioned streaming ingest reclaims a claim orphaned by a
  *     crash between the claim create and the snapshot's `_SUCCESS`
  *     (round-10 review: every replay used to abort — a stuck stream);
  *   - PRE-n_keys 4-column manifests survive every mutation: the stats
  *     union is schema-tolerant and covered files demote to the rewrite
  *     path (slower, never wrong — round-10 review: the union used to
  *     throw mid-mutation, after replacement files had landed);
  *   - a version log whose snapshots straddle the stats upgrade still
  *     rebases;
  *   - multi-column stats carried IN the snapshot schema give 2D
  *     file-pruned reads at both a pinned version and the post-merge
  *     head (the q202 shape), with strictly fewer files opened.
  */
class VersionLogEdgeSpec extends SparkSpec {
  import graft.io.{FileSkipping, VersionLog}

  private def rows(lo: Long, hi: Long) =
    spark.range(lo, hi).select(col("id").as("k"),
      concat(lit("p"), (col("id") % 5).cast("string")).as("tag"),
      (col("id") % 997 / 7.0).as("v"))

  /** 4-file range-sorted table, keys 0..3999 (~1000/file). */
  private def freshTable(name: String): String = {
    val base = s"/root/repo/target/scratch/vledge_$name"
    graft.util.Staging.deleteRecursive(base)
    rows(0, 4000).repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(s"$base/data")
    FileSkipping.buildManifest(spark, s"$base/data", "k")
      .write.mode("overwrite").parquet(s"$base/manifest")
    base
  }

  /** The same table with a PRE-round-10 manifest (no n_keys column). */
  private def freshLegacyTable(name: String): String = {
    val base = s"/root/repo/target/scratch/vledge_$name"
    graft.util.Staging.deleteRecursive(base)
    rows(0, 4000).repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(s"$base/data")
    FileSkipping.buildManifest(spark, s"$base/data", "k").drop("n_keys")
      .write.mode("overwrite").parquet(s"$base/manifest")
    base
  }

  test("corrupt _head pointer (Int overflow digits) degrades to the listing, never throws") {
    val base = freshTable("headhint")
    val vdir = s"$base/versions"
    VersionLog.commit(spark, vdir, s"$base/manifest") // v0
    VersionLog.commit(spark, vdir, s"$base/manifest") // v1
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$vdir/_head"),
      "99999999999999999999".getBytes("UTF-8")) // all digits, > Int.MaxValue
    assert(VersionLog.head(spark, vdir) == 1,
      "overflowing _head hint must fall back to the listing")
    // and a later commit repairs the pointer
    assert(VersionLog.commit(spark, vdir, s"$base/manifest") == 2)
    assert(VersionLog.head(spark, vdir) == 2)
  }

  test("vacuum under an open pin: the pinned transaction aborts loudly, never rebases wrong") {
    val base = freshTable("vacpin")
    val vdir = s"$base/versions"
    VersionLog.commit(spark, vdir, s"$base/manifest") // v0
    val pin = VersionLog.begin(spark, vdir)           // pinned at v0
    // another writer advances the head, then maintenance vacuums v0 away
    FileSkipping.appendOcc(rows(100000, 100010), s"$base/data", vdir, "k", "ADV") // v1
    val (_, dropped) = VersionLog.vacuum(spark, s"$base/data", vdir, retainLast = 1)
    assert(dropped == 1)
    val e = intercept[IllegalStateException] {
      FileSkipping.appendOcc(rows(200000, 200010), s"$base/data", vdir, "k",
        "PIN", pinned = Some(pin))
    }
    assert(e.getMessage.contains("vacuumed while"), e.getMessage)
    // head intact, re-running against the new head works
    assert(VersionLog.head(spark, vdir) == 1)
    assert(FileSkipping.appendOcc(rows(200000, 200010), s"$base/data", vdir, "k",
      "PIN2", pinned = Some(VersionLog.begin(spark, vdir))) == 2)
  }

  test("versioned ingest reclaims a claim orphaned between claim create and snapshot _SUCCESS") {
    val base = freshTable("orphaningest")
    val vdir = s"$base/versions"
    val b0 = rows(0, 100).withColumnRenamed("k", "ts")
    assert(FileSkipping.ingestBatchVersioned(b0, 0L, s"$base/ingest", "ts", vdir) == 0)
    // simulate a crash AFTER claiming v1, BEFORE its snapshot landed
    new java.io.File(s"$vdir/.claim-v1").createNewFile()
    val b1 = rows(100, 250).withColumnRenamed("k", "ts")
    // the replay must reclaim the orphan and commit, not abort forever
    assert(FileSkipping.ingestBatchVersioned(b1, 1L, s"$base/ingest", "ts", vdir) == 1)
    assert(VersionLog.readVersion(spark, vdir, 1).count() == 250)
    // a re-replay of batch 1 short-circuits on its marker (unchanged)
    assert(FileSkipping.ingestBatchVersioned(b1, 1L, s"$base/ingest", "ts", vdir) == 1)
    assert(VersionLog.head(spark, vdir) == 1)
  }

  test("versioned ingest replay after a landed-snapshot-no-marker crash commits nothing twice") {
    val base = freshTable("markerwindow")
    val vdir = s"$base/versions"
    val b0 = rows(0, 100).withColumnRenamed("k", "ts")
    val b1 = rows(100, 250).withColumnRenamed("k", "ts")
    assert(FileSkipping.ingestBatchVersioned(b0, 0L, s"$base/ingest", "ts", vdir) == 0)
    assert(FileSkipping.ingestBatchVersioned(b1, 1L, s"$base/ingest", "ts", vdir) == 1)
    // simulate the crash sliver: v1 landed (_SUCCESS present) but its
    // _BATCH_1 marker never got stamped
    assert(new java.io.File(s"$vdir/v1/_BATCH_1").delete())
    // the replay must recognize the slot already committed at the head —
    // NOT land a duplicate v2 with batch 1's rows folded twice
    assert(FileSkipping.ingestBatchVersioned(b1, 1L, s"$base/ingest", "ts", vdir) == 1)
    assert(VersionLog.head(spark, vdir) == 1, "marker-window replay committed a duplicate version")
    assert(VersionLog.readVersion(spark, vdir, 1).count() == 250)
    // and the backstop re-stamped the marker, restoring the fast path
    assert(VersionLog.hasMarker(spark, vdir, 1, "_BATCH_1"))
  }

  test("legacy 4-column manifest: deleteRange demotes covered files to the rewrite path, content exact") {
    val base = freshLegacyTable("legacydel")
    // [1000, 1999] covers file 1 ENTIRELY — with n_keys the file would
    // retire unread; without it nothing can prove null-freeness, so the
    // covered file must DEMOTE to the rewrite path instead of crashing
    // the stats union (round-10 review)
    val (unread, rewritten) = FileSkipping.deleteRange(spark, s"$base/data",
      s"$base/manifest", "k", lit(1000L), lit(1999L))
    assert(unread == 0, "a legacy manifest cannot prove null-freeness — no unread retire")
    assert(rewritten >= 1)
    val got = spark.read.parquet(s"$base/manifest")
    assert(got.columns.contains("n_keys"), "the rewrite upgrades the manifest schema")
    val expected = rows(0, 4000).filter(!col("k").between(1000, 1999))
    val data = FileSkipping.prunedRead(spark, s"$base/data", s"$base/manifest",
      lit(Long.MinValue), lit(Long.MaxValue))
    assert(data.count() == expected.count())
    assert(data.exceptAll(expected).count() == 0 && expected.exceptAll(data).count() == 0)
  }

  test("legacy 4-column manifest: mergeKeyed and compactSmall complete, content exact") {
    val base = freshLegacyTable("legacymerge")
    val delta = rows(500, 520).withColumn("tag", lit("LM"))
      .unionByName(rows(900000, 900010).withColumn("tag", lit("LI")))
    FileSkipping.mergeKeyed(spark, s"$base/data", s"$base/manifest", "k", delta)
    val afterMerge = spark.read.parquet(s"$base/data")
    assert(afterMerge.filter(col("tag") === "LM").count() == 20)
    assert(afterMerge.filter(col("tag") === "LI").count() == 10)
    assert(afterMerge.count() == 4010)
    // the merge's manifest (now mixed legacy/new rows) feeds compaction
    val (compacted, written) = FileSkipping.compactSmall(spark, s"$base/data",
      s"$base/manifest", "k", smallBytes = Long.MaxValue, targetBytes = Long.MaxValue)
    assert(compacted >= 2 && written >= 1)
    // compare against a reconstructed expectation — compaction physically
    // deleted the files the lazy afterMerge frame referenced
    val expectedAfter = rows(0, 4000).filter(!col("k").between(500, 519))
      .unionByName(rows(500, 520).withColumn("tag", lit("LM")))
      .unionByName(rows(900000, 900010).withColumn("tag", lit("LI")))
    val afterCompact = spark.read.parquet(s"$base/data")
    assert(afterCompact.count() == 4010)
    assert(afterCompact.exceptAll(expectedAfter).count() == 0 &&
      expectedAfter.exceptAll(afterCompact).count() == 0)
  }

  test("mixed-schema version log: rebase and versioned ingest union across the stats upgrade") {
    val base = freshLegacyTable("legacylog")
    val vdir = s"$base/versions"
    VersionLog.commit(spark, vdir, s"$base/manifest") // v0: LEGACY schema
    // an OCC merge commits post-upgrade stats onto the legacy v0
    val v1 = FileSkipping.mergeKeyedOcc(spark, s"$base/data", vdir, "k",
      rows(100, 120).withColumn("tag", lit("MX")), "MX")
    assert(v1 == 1)
    val head = VersionLog.readVersion(spark, vdir, v1)
    assert(head.filter(col("tag") === "MX").count() == 20)
    assert(head.count() == 4000)
    // and the versioned ingest unions its stats onto the mixed head
    val b = rows(700000, 700050)
    assert(FileSkipping.ingestBatchVersioned(b, 7L, s"$base/data", "k", vdir) == 2)
    assert(VersionLog.readVersion(spark, vdir, 2).count() == 4050)
  }

  test("2D snapshot stats (q202 shape): box-pruned reads open strictly fewer files at BOTH versions") {
    val base = s"/root/repo/target/scratch/vledge_occ2d"
    graft.util.Staging.deleteRecursive(base)
    import graft.relational.ZOrder
    // 4096 points on a 64x64 grid, z-clustered, zk injective (integer
    // y: `/` is DOUBLE division in Spark — shiftright keeps the grid)
    val src = spark.range(4096).select(
      col("id"), (col("id") % 64).as("x"), shiftright(col("id"), 6).as("y"),
      (col("id") % 997 / 7.0).as("price"))
    def withZk(df: org.apache.spark.sql.DataFrame) = df.select(
      (ZOrder.zValue(col("x"), col("y"), 6) * lit(1L << 20) + col("id")).as("zk"),
      col("x"), col("y"), col("price"))
    withZk(src).repartitionByRange(16, col("zk")).sortWithinPartitions("zk")
      .write.mode("overwrite").parquet(s"$base/data")
    val vdir = s"$base/versions"
    VersionLog.commitSnapshot(spark, vdir,
      FileSkipping.buildManifestStats(spark, s"$base/data", "zk", Seq("x", "y")))
    val delta = withZk(src.filter(col("id") % 17 === 0)
      .withColumn("price", col("price") * 2))
    val v1 = FileSkipping.mergeKeyedOcc(spark, s"$base/data", vdir, "zk", delta,
      "E2D", statCols = Seq("x", "y"))
    assert(v1 == 1)
    Seq(0, v1).foreach { v =>
      val pruned = FileSkipping.prunedReadVersionMulti(spark, vdir, v,
        Seq(("x", lit(8L), lit(15L)), ("y", lit(48L), lit(55L))))
      val total = VersionLog.manifestAt(spark, vdir, v).count()
      assert(pruned.inputFiles.length < total,
        s"v$v: 2D probe opened ${pruned.inputFiles.length} of $total files — no pruning")
      val got = pruned.filter(col("x").between(8, 15) && col("y").between(48, 55))
      val factor = if (v == 0) lit(1.0) else when(col("id") % 17 === 0, 2.0).otherwise(1.0)
      val expected = src.filter(col("x").between(8, 15) && col("y").between(48, 55))
        .select(col("x"), col("y"), (col("price") * factor).as("price"))
      assert(got.count() == 64, s"v$v: box must hold 8x8 grid points, got ${got.count()}")
      assert(got.select("x", "y", "price").exceptAll(expected).count() == 0,
        s"v$v: 2D-pruned content diverged")
    }
  }

  test("OCC ingest batch-0 attach to a long-lived table is RPC-bounded: no token walk without a slot") {
    // round-12 verdict #5: with no previous-batch token to stop at, the
    // replay probe walked head→v0 probing _BATCH markers — O(head) RPCs
    // when a stream attaches to a long-lived table. The probe is now
    // gated on the batch's slot dir existing (a previous attempt writes
    // its slot BEFORE committing, so no slot proves no prior commit);
    // CountFs counts the marker probes to pin the bound.
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.countfs.impl", classOf[graft.util.CountFs].getName)
    hc.setBoolean("fs.countfs.impl.disable.cache", true)
    val base = freshTable("attach")
    val vdir = s"countfs:$base/versions"
    VersionLog.commit(spark, vdir, s"$base/manifest") // v0
    // a long-lived table: 20 empty rebase commits before the stream attaches
    val emptyStats = FileSkipping.buildManifest(spark, s"$base/data", "k").limit(0)
    for (_ <- 1 to 20)
      VersionLog.commitRebase(spark, vdir, VersionLog.head(spark, vdir),
        Seq.empty, emptyStats)
    assert(VersionLog.head(spark, vdir) == 20)
    try {
      graft.util.CountFs.needle = Some("_BATCH_")
      graft.util.CountFs.hits.set(0)
      val v = FileSkipping.ingestBatchOcc(rows(0, 50), 0L, s"$base/ingest", "k", vdir)
      assert(v == 21)
      val fresh = graft.util.CountFs.hits.get()
      assert(fresh == 0,
        s"a fresh batch 0 probed $fresh _BATCH tokens — the O(head) walk is back")
      // replay (slot exists now): the token sits at head — found in one probe
      graft.util.CountFs.hits.set(0)
      assert(FileSkipping.ingestBatchOcc(rows(0, 50), 0L, s"$base/ingest", "k", vdir) == v)
      val replay = graft.util.CountFs.hits.get()
      assert(replay <= 2, s"a replayed batch probed $replay tokens — expected O(1)")
    } finally graft.util.CountFs.needle = None
  }

  test("describeHistory drives ZERO per-version exists() probes (flat driver RPCs in history length)") {
    // round-13 verdict #4: the marker/schema-record checks were two
    // serial exists() round-trips PER VERSION — O(history) driver RPCs
    // on an object store. Both sets now come from ONE recursive listing;
    // CountFs pins the serial-probe count at zero for any history
    // length (the listing itself is paginated by entry count, the flat
    // shape — see CountFs.exists's scaladoc for why the two counters
    // differ).
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.countfs.impl", classOf[graft.util.CountFs].getName)
    hc.setBoolean("fs.countfs.impl.disable.cache", true)
    val base = freshTable("deschist")
    val vdir = s"countfs:$base/versions"
    VersionLog.commit(spark, vdir, s"$base/manifest") // v0
    val emptyStats = FileSkipping.buildManifest(spark, s"$base/data", "k").limit(0)
    for (_ <- 1 to 12)
      VersionLog.commitRebase(spark, vdir, VersionLog.head(spark, vdir),
        Seq.empty, emptyStats)
    // one schema record mid-history so the has_schema_record column is live
    FileSkipping.alterAddColumn(spark, vdir, "extra",
      org.apache.spark.sql.types.DoubleType)
    // the flagged O(history) shape was one exists(v$v/_SUCCESS) + one
    // exists(v$v/_schema.json) per version; Spark's own multi-path read
    // validation stats the v-DIRS (part of the single allowed read), so
    // the pin targets exactly the marker probes
    try {
      graft.util.CountFs.existsNeedle = Some("vledge_deschist/versions/v0/_SUCCESS")
      graft.util.CountFs.existsHits.set(0)
      val hist = VersionLog.describeHistory(spark, vdir).collect()
      assert(graft.util.CountFs.existsHits.get() == 0,
        "describeHistory exists()-probed v0/_SUCCESS — the per-version serial " +
          "round-trips are back")
      // and the answer is still exact
      assert(hist.map(_.getInt(0)).toSeq == (0 to 13).toSeq,
        s"history versions wrong: ${hist.map(_.getInt(0)).mkString(",")}")
      assert(hist.count(_.getBoolean(4)) >= 1, "schema-record commit not flagged")
      graft.util.CountFs.existsNeedle = Some("_schema.json")
      graft.util.CountFs.existsHits.set(0)
      VersionLog.describeHistory(spark, vdir).collect()
      assert(graft.util.CountFs.existsHits.get() == 0,
        "describeHistory exists()-probed _schema.json per version — the O(history) " +
          "serial round-trips are back")
    } finally graft.util.CountFs.existsNeedle = None
  }
}
