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
    * `mode("overwrite")` does). */
  def ensure(dir: String)(write: String => Unit): String = {
    val marker = Paths.get(dir, s"_STAGED_$Version")
    if (!Files.exists(marker)) {
      deleteRecursive(dir) // drop partial/stale leftovers
      write(dir)
      Files.createFile(marker)
    }
    dir
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
