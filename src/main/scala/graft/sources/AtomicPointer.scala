package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path}

/** The one audited spelling of the durable pointer flip used by every
  * piece of engine state (CDC snapshot pointer, source offsets): write
  * the new content to a tmp file, then atomically overwrite-rename onto
  * the destination. A plain delete-then-rename would leave a window
  * where NO pointer exists — a crash there silently resets state on
  * restart; the OVERWRITE rename makes the flip all-or-nothing, so a
  * crash at any instant leaves either the old or the new pointer intact.
  * (Connect gets the same guarantee from its compacted offsets topic.)
  *
  * Kept in one helper on purpose: a durability upgrade (e.g. an hflush/
  * hsync before the rename for real HDFS or object stores) must land at
  * every pointer site at once, not whichever copy someone remembers. */
object AtomicPointer {

  /** Atomically replace `dest` with `content`, staging through `tmp`
    * (same directory, so the rename never crosses filesystems). */
  def write(hconf: Configuration, tmp: Path, dest: Path, content: String): Unit = {
    val fs = dest.getFileSystem(hconf)
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(dest.toUri, hconf)
    fc.rename(tmp, dest, Options.Rename.OVERWRITE)
  }

  /** The matching read: trimmed UTF-8 content, None when the pointer
    * does not exist yet. Centralized for the same reason as [[write]] —
    * a read-side fix (charset pinning, retry-on-transient, corrupt
    * handling) must land at every pointer site at once. */
  def read(hconf: Configuration, p: Path): Option[String] = {
    val fs = p.getFileSystem(hconf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }
}
