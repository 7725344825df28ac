package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory.
  *
  * The reference switches between threaded, local-process and SLURM-cluster
  * execution by changing only client construction
  * (`/root/reference/singlemachine_dataset_samplewise_benchmark.py:41,71`,
  * `/root/reference/cluster_default_benchmark.py:273-286`). We preserve that
  * property: everything except `master` comes from one shared config block,
  * so the same program runs `local[N]` or a 1000-executor cluster.
  *
  * Scale defaults:
  *  - AQE on (runtime coalescing, skew-join splitting) — replaces the
  *    reference's hand-tuned 64 MB partitioning
  *    (`functions/dask_pipeline.py:41`).
  *  - 64 MB scan partitions (`data/brca_undersample.py:20-21` rationale).
  *  - shuffle.partitions matched to local cores; on a real cluster this is
  *    overridden by AQE's coalescing from an initially large number.
  */
object GraftSession {

  /** Apply engine-wide settings to any builder (local or cluster). */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.sql.files.maxPartitionBytes", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
      // rejects (PARQUET_TYPE_ILLEGAL); read as raw nanos LongType instead
      // and convert in graft.io.Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.compression.codec", "snappy")
      // Streaming state off-heap: the default HDFS-backed provider keeps
      // every key's state in executor heap maps — the 100×-scale risk for
      // the stateful queries (dedup, sessions, mapGroupsWithState). RocksDB
      // spills state to local disk with incremental checkpointing.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // NOT set: rocksdb.changelogCheckpointing — measured on the 5
      // streaming replay harnesses at sf0.1 (round 6): no win (q92
      // 9.72→10.41 s, q78 5.22→5.44, q155 7.85→8.13, q43/q61 flat).
      // Local checkpoints make snapshot upload free, so the changelog
      // write is pure overhead here; on a real cluster with remote
      // checkpoint storage it's the right setting — revisit there.
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")

  /** Local session for tests / verify / bench.
    *
    * `local[n, 2]`: two task attempts, so the retry path EXISTS locally —
    * plain `local[n]` pins maxFailures=1 and can never exercise the
    * recompute-on-retry semantics every real cluster has (where lost
    * executors make retries routine). RetrySpec injects a first-attempt
    * failure through this session to prove sampling/split decisions are
    * retry-idempotent (keyHash, not rand()). */
  def local(cores: Int, appName: String = "graft"): SparkSession = {
    val s = configure(
      SparkSession.builder().master(s"local[$cores,2]").appName(appName),
      shufflePartitions = math.max(cores, 1)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.GraftFunctions.register(s)
    s
  }
}
