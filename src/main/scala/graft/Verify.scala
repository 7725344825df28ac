package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER overrides the single-JVM default — e.g.
    // `local-cluster[2,4,4096]` runs a real multi-executor cluster in
    // child JVMs, surfacing serialization/classpath bugs in the custom
    // expressions, estimators, and stateful processors that local[n]
    // can never catch (everything stays in-process there).
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder0 = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
    // local-cluster executors are CHILD JVMs: hand them this JVM's full
    // classpath, or they can't load graft classes (and fail with
    // ClassNotFound on the first custom expression)
    val builder =
      if (master.startsWith("local-cluster"))
        builder0.config("spark.executor.extraClassPath", sys.props("java.class.path"))
      else builder0
    val spark = graft.core.GraftSession.configure(builder, shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // ML differential oracles: queries side-dump prediction parquets here;
    // oracle SQL reads them back via the __DUMPDIR__ token (see OracleDump).
    val dumpDir = s"$outDir/_oracle_dumps"
    System.setProperty("graft.oracle.dir", dumpDir)
    // Dev iteration aid (unset for driver runs): restrict to matching names.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    SparkEntry.stage(spark, sfDir) // idempotent pre-staging of derived inputs
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Queries that persist intermediates (q126/q151/…) document release
      // as "the session's cache discipline" — this is it for Verify (Bench
      // has its own per-run clear). CacheSpec locks the invariant in.
      finally spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .map { case (k, v) => s"${q(k)}: ${q(v.replace(graft.util.OracleDump.Token, dumpDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
