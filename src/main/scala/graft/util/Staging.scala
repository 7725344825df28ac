package graft.util

import java.nio.file.{Files, Path, Paths}

/** Idempotent staging of derived test inputs (TSV/JSON/small-files copies
  * of the canonical parquet, late-arrival micro-batch files).
  *
  * Several source-format queries exercise a *read* path (S3 TSV, S4 JSON,
  * S5 many-small-files) whose input doesn't exist in the test corpus — it
  * must be derived from the parquet tables first. Staging that input inside
  * the query body made the benchmarked numbers sink-dominated (the write
  * cost drowned the scan being measured). Instead, artifacts are staged
  * once per (artifact, sfDir) under a marker file: [[graft.Bench]] and
  * [[graft.Verify]] pre-stage before timing, and the in-query call becomes
  * a marker check. Queries remain self-contained — first call stages.
  *
  * The marker lives inside the artifact directory; Spark's file readers
  * ignore `_`-prefixed files, so it never pollutes the staged data.
  */
object Staging {

  /** Bump when the content of any staged artifact changes shape — stale
    * artifacts from an older code version are then re-staged. */
  private val Version = "v1"

  /** Run `write(dir)` unless `dir` already carries this version's marker;
    * returns `dir`. `write` must (re)create the directory (Spark's
    * `mode("overwrite")` does). Pass `sourcePath` (the file/dir the
    * artifact is derived from) so the marker is keyed by the source's
    * fingerprint too — a regenerated corpus at the same path then
    * re-stages instead of silently serving stale derived data while the
    * oracle reads the new tables. */
  def ensure(dir: String, sourcePath: String = "")(write: String => Unit): String = {
    val fp = if (sourcePath.isEmpty) "" else s"_${fingerprint(sourcePath)}"
    val marker = Paths.get(dir, s"_STAGED_$Version$fp")
    if (!Files.exists(marker)) {
      deleteRecursive(dir) // drop partial/stale leftovers (incl. old markers)
      write(dir)
      Files.createFile(marker)
    }
    dir
  }

  /** Cheap content fingerprint of a file or directory: sizes + mtimes of
    * the (first-level) entries, hashed. Not cryptographic — just enough to
    * notice a rewritten source. */
  def fingerprint(path: String): String = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return "absent"
    val parts: Seq[String] =
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.toSeq.sortBy(_.toString).map(e =>
            s"${e.getFileName}:${Files.size(e)}:${Files.getLastModifiedTime(e).toMillis}")
        } finally s.close()
      } else Seq(s"${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}")
    java.lang.Long.toHexString(
      parts.foldLeft(1125899906842597L)((acc, x) => acc * 31 + x.hashCode))
  }

  /** Canonical scratch location for an artifact derived from `sfDir`. */
  def dirFor(name: String, sfDir: String): String =
    s"/root/repo/target/scratch/${name}_${math.abs(sfDir.hashCode)}"

  def deleteRecursive(path: String): Unit = {
    val base = Paths.get(path)
    if (Files.exists(base))
      Files.walk(base).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.delete(p))
  }
}
