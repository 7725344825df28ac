package graft.util

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** A race-injecting local FileSystem (`racefs:` scheme): delegates to the
  * local FS, but the FIRST `listStatus` of a path containing
  * [[RaceFs.needle]] fires [[RaceFs.onFirstListing]] AFTER the listing
  * was captured and before it is returned — the deterministic
  * reconstruction of "the world changed right after your LIST came
  * back", the TOCTOU seam object-store races live in. One-shot: the
  * hook disarms itself, so the victim's OWN later listings (and any
  * retry) see the mutated world. Registration:
  * `fs.racefs.impl = graft.util.RaceFs` +
  * `fs.racefs.impl.disable.cache = true`. */
class RaceFs extends LocalShimFs {

  override def getUri: URI = URI.create("racefs:///")
  override def getScheme: String = "racefs"

  override def listStatus(f: Path): Array[FileStatus] = {
    val r = super.listStatus(f)
    RaceFs.needle.foreach { n =>
      if (f.toString.contains(n)) {
        val hook = RaceFs.onFirstListing
        RaceFs.onFirstListing = None
        hook.foreach(_.apply())
      }
    }
    r
  }
}

object RaceFs {
  /** Arm: first listStatus of a path containing `needle` runs the hook
    * after capturing (but before returning) the listing. */
  @volatile var needle: Option[String] = None
  @volatile var onFirstListing: Option[() => Unit] = None
}
