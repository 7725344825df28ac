package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** State-larger-than-memory streaming sweep (round-8 verdict ask #7).
  *
  * The round-7 state-store sizing sweep measured per-instance COMMIT
  * overhead with tiny state; the changelog A/B (CheckpointVolume)
  * presumes the opposite regime — per-key state that outgrows executor
  * memory, which at 100 TB is the norm. Nothing had measured where the
  * engine's RocksDB stores actually cross from memory-resident to
  * disk-bound. This probe drives exactly that crossing:
  *
  *  - a synthetic KEY-EXPLOSION drain: `keys` keys per batch, each
  *    receiving `rowsPerKey` payload appends of `payloadKb` KiB of
  *    INCOMPRESSIBLE bytes (xorshift-filled — compressible payloads
  *    would let RocksDB's block compression dodge the memory pressure
  *    this probe exists to create) into a `ListState` — state volume
  *    grows by keys·rowsPerKey·payloadKb KiB every micro-batch, while
  *    the store count stays FIXED at [[graft.streaming.Streams
  *    .statePartitions]] (default 8);
  *  - RocksDB runs under a BOUNDED memory budget
  *    (`boundedMemoryUsage=true`, `maxMemoryUsageMB` — block cache +
  *    memtables shared across all store instances), so batches keep
  *    landing after cumulative state exceeds the budget;
  *  - one JSON line PER MICRO-BATCH: batch wall, state-commit ms, rows
  *    in state, RocksDB's own memory/SST byte gauges — the knee is
  *    where commit/wall departs from the flat per-batch cost while the
  *    per-batch delta stays constant.
  *
  * Env: SPARK_GRAFT_SV_KEYS (default 32768), SPARK_GRAFT_SV_ROWS (rows
  * per key per batch, default 4), SPARK_GRAFT_SV_KB (KiB per row,
  * default 8), SPARK_GRAFT_SV_BATCHES (default 16),
  * SPARK_GRAFT_SV_MEM_MB (RocksDB budget, default 512),
  * SPARK_GRAFT_CPUS. Defaults grow 32768·4·8 KiB = 1 GiB of raw state
  * per batch, 16 GiB by the last batch — 32× the budget. Not part of
  * the per-round driver protocol; numbers → BASELINE.md.
  */
object StateVolumeBench {

  /** Append `payloadKb` KiB of pseudo-random bytes per input row to the
    * key's ListState; emits one (key, appended-so-far) row per batch. */
  class BallastProcessor(payloadKb: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Long, (Long, Long)] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders
    @transient private var ballast: org.apache.spark.sql.streaming.ListState[Array[Byte]] = _
    @transient private var appended: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      ballast = getHandle.getListState[Array[Byte]]("ballast", Encoders.BINARY, TTLConfig.NONE)
      appended = getHandle.getValueState[Long]("appended", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def chunk(seed: Long): Array[Byte] = {
      val out = new Array[Byte](payloadKb * 1024)
      var x = seed * 6364136223846793005L + 1442695040888963407L
      var i = 0
      while (i < out.length) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        out(i) = x.toByte
        i += 1
      }
      out
    }

    override def handleInputRows(key: Long, rows: Iterator[Long],
                                 tv: TimerValues): Iterator[(Long, Long)] = {
      var n = if (appended.exists()) appended.get() else 0L
      rows.foreach { _ => n += 1; ballast.appendValue(chunk(key * 1000003L + n)) }
      appended.update(n)
      Iterator.single((key, n))
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val keys = sys.env.getOrElse("SPARK_GRAFT_SV_KEYS", "32768").toInt
    val rowsPerKey = sys.env.getOrElse("SPARK_GRAFT_SV_ROWS", "4").toInt
    val payloadKb = sys.env.getOrElse("SPARK_GRAFT_SV_KB", "8").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_SV_BATCHES", "16").toInt
    val memMb = sys.env.getOrElse("SPARK_GRAFT_SV_MEM_MB", "512")
    val spark = graft.core.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the shared-across-instances RocksDB budget this sweep overruns
    spark.conf.set("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true")
    spark.conf.set("spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB", memMb)

    // stage `batches` tiny key files — payload is generated IN the
    // processor, so input IO never competes with the state writes being
    // measured
    val dir = s"/root/repo/target/scratch/svb_input"
    graft.util.Staging.deleteRecursive(dir)
    (1 to batches).foreach { b =>
      // one file per batch (maxFilesPerTrigger=1 ⇒ file == micro-batch)
      spark.range(0L, keys.toLong * rowsPerKey)
        .select(pmod(col("id"), lit(keys.toLong)).as("key"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/_tmp")
      val one = new java.io.File(s"$dir/_tmp").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val merged = new java.io.File(f"$dir/$b%02d.parquet")
      java.nio.file.Files.move(one.toPath, merged.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      graft.util.Staging.deleteRecursive(s"$dir/_tmp")
      merged.setLastModified(System.currentTimeMillis() + b * 2000L)
    }

    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .select(col("key").cast("long")).as[Long]
      .groupByKey(identity)
      .transformWithState(new BallastProcessor(payloadKb),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
      .toDF("key", "n")

    val ckpt = graft.streaming.Streams.checkpointFor("svb")
    graft.util.Staging.deleteRecursive(ckpt)
    val t0 = System.nanoTime()
    val perBatchMb = keys.toLong * rowsPerKey * payloadKb / 1024.0
    graft.streaming.Streams.withStatePartitions(spark) {
      val q = stream.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.count(); ()
        }
        .start()
      try {
        q.processAllAvailable()
        val wall = (System.nanoTime() - t0) / 1e9
        q.recentProgress.filter(_.numInputRows > 0).foreach { p =>
          val so = p.stateOperators.head
          val cm = so.customMetrics
          def g(k: String): Long = Option(cm.get(k)).map(_.longValue).getOrElse(-1L)
          println(s"""STATEVOL: {"batch":${p.batchId},"raw_state_mb_after":${(p.batchId + 1) * perBatchMb},"budget_mb":$memMb,"stores":${graft.streaming.Streams.statePartitions(spark)},"batch_ms":${p.batchDuration},"commit_ms":${so.commitTimeMs},"state_rows":${so.numRowsTotal},"state_mem_bytes":${so.memoryUsedBytes},"sst_bytes":${g("rocksdbSstFileSize")},"pinned_bytes":${g("rocksdbPinnedBlocksMemoryUsage")},"cache_hits":${g("rocksdbReadBlockCacheHitCount")},"cache_misses":${g("rocksdbReadBlockCacheMissCount")},"writer_stall_ms":${g("rocksdbWriterStallLatencyMs")},"compaction_ms":${g("rocksdbTotalCompactionLatencyMs")},"compaction_write_bytes":${g("rocksdbTotalBytesWrittenByCompaction")},"flush_ms":${g("rocksdbCommitFlushLatency")},"file_sync_ms":${g("rocksdbCommitFileSyncLatencyMs")}}""")
        }
        println(f"""STATEVOL_TOTAL: {"wall_sec":$wall%.2f,"batches":$batches,"keys":$keys,"rows_per_key":$rowsPerKey,"payload_kb":$payloadKb,"final_raw_state_mb":${batches * perBatchMb},"budget_mb":$memMb}""")
      } finally q.stop()
    }
    spark.stop()
  }
}
