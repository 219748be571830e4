package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** The DYNAMIC half of the reference's multi-worker reconcile story
  * (`main.sh:155-159` `?forward=true`: any Connect worker accepts a PUT
  * and forwards it to the elected group leader). [[Reconcile]]'s static
  * contract — each driver owns a disjoint name partition — covers task
  * assignment; THIS module covers leadership: when several drivers
  * share ONE desired set (blue/green, warm standby), exactly one may
  * reconcile it at a time, and a dead leader's claim must expire so a
  * standby can take over without operator action.
  *
  * Election is a filesystem lease with epoch fencing, built from the
  * primitives the engine already trusts:
  *
  *  - A lease is an immutable `lease-<epoch>` file under the lease
  *    directory, content `owner expiresAtMs`. The CURRENT lease is the
  *    highest epoch present.
  *  - Claims go through create-EXCLUSIVE (`FileSystem.create(path,
  *    overwrite=false)`) of the NEXT epoch file: two contenders racing
  *    for epoch e+1 cannot both win — the loser's create throws and it
  *    re-reads. Renewals bump the epoch through the same gate, so
  *    every ownership interval has a unique, monotone epoch (the
  *    fencing token; an ex-leader that was paused past its expiry can
  *    never silently resume — its next renewal loses the race or sees
  *    a foreign lease).
  *  - Nothing is ever overwritten in place; the winner deletes
  *    superseded epochs AFTER its claim commits (losers looking at max
  *    epoch are unaffected by late deletion).
  *
  * Create-exclusive is atomic on HDFS-semantics filesystems (the same
  * class the delta/fold protocols assume); for eventual-consistency
  * object stores, front it with a conditional-put wrapper.
  *
  * Clock discipline: callers pass `nowMs` (tests drive a fake clock;
  * production passes `System.currentTimeMillis()`). The protocol only
  * compares THIS caller's clock against expiry stamps written by
  * others, so the usual lease caveat applies — ttl must dominate
  * worst-case clock skew between drivers. */
object ReconcileLease {

  final case class Lease(owner: String, epoch: Long, expiresAtMs: Long) {
    def liveAt(nowMs: Long): Boolean = nowMs < expiresAtMs
  }

  private val Prefix = "lease-"

  /** The current (highest-epoch) lease, if any. Unparseable files are
    * skipped, not fatal — a torn write loses its claim, never wedges
    * the election. */
  def current(hconf: Configuration, dir: Path): Option[Lease] = {
    val fs = dir.getFileSystem(hconf)
    if (!fs.exists(dir)) return None
    val leases = fs.listStatus(dir).iterator.flatMap { st =>
      val name = st.getPath.getName
      if (!name.startsWith(Prefix)) Iterator.empty
      else scala.util.Try {
        val epoch = name.stripPrefix(Prefix).toLong
        val in = fs.open(st.getPath)
        val content =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        val Array(owner, exp) = content.split(' ')
        Lease(owner, epoch, exp.toLong)
      }.toOption.iterator
    }.toSeq
    if (leases.isEmpty) None else Some(leases.maxBy(_.epoch))
  }

  /** Acquire, renew, or steal-if-expired the lease for `owner`.
    * Returns the held lease when `owner` is the leader after this
    * call, None when a live foreign lease exists or the claim race was
    * lost. Always safe to call on a timer — it is the whole election
    * loop in one idempotent step. */
  def tryAcquire(hconf: Configuration, dir: Path, owner: String,
      ttlMs: Long, nowMs: Long): Option[Lease] = {
    require(ttlMs > 0, "lease ttl must be positive")
    requireCleanOwner(owner)
    current(hconf, dir) match {
      case Some(l) if l.owner != owner && l.liveAt(nowMs) => None
      case cur =>
        // no lease, our own lease (renew), or an expired foreign one
        // (steal) — all claim the next epoch through the same gate
        claim(hconf, dir, owner, cur.map(_.epoch).getOrElse(0L) + 1,
          nowMs + ttlMs)
    }
  }

  /** Release leadership: claim the next epoch with an ALREADY-EXPIRED
    * stamp, so a standby can steal immediately instead of waiting out
    * the ttl. Deliberately NOT a file delete — deletion would empty
    * the directory and restart epochs at 1, letting a paused zombie's
    * stale (higher) fencing token outrank the next real leader;
    * through the claim gate the epoch stays monotone for the lease
    * directory's lifetime. No-op when we are not the current owner (a
    * foreign lease is never touched). */
  def release(hconf: Configuration, dir: Path, owner: String): Unit = {
    requireCleanOwner(owner)
    current(hconf, dir).filter(_.owner == owner).foreach { l =>
      claim(hconf, dir, owner, l.epoch + 1, expiresAtMs = 0L): Unit
    }
  }

  /** Lease files serialize as `owner expiresAtMs` — whitespace in a
    * caller-chosen owner id would write a lease every reader (including
    * the owner itself) skips as unparseable: the live lease turns
    * invisible and a contender claims a fresh epoch while the original
    * holder still believes it leads (split-brain, ADVICE r11). Reject
    * at every entry point instead of silently corrupting the election. */
  private def requireCleanOwner(owner: String): Unit =
    require(owner.nonEmpty && !owner.exists(_.isWhitespace),
      s"lease owner id must be non-empty with no whitespace, got '$owner'")

  /** The guarded reconcile: run [[Reconcile]] over `desired` iff this
    * session's `owner` holds (or can take) the lease. Returns
    * Some((heldLease, started, stopped)) when leading, None when
    * following — a follower mutates NOTHING, so pointing two drivers at
    * the same desired set is safe, which is exactly the property the
    * static multi-worker contract could not offer. Call on the
    * reconcile cadence with ttl a few multiples of it, so a crashed
    * leader's queries are re-homed one expiry later.
    *
    * FENCING CAVEAT (ADVICE r11): leadership is checked at ENTRY only —
    * a driver paused (GC, VM suspend) between the successful acquire
    * and the Reconcile mutations can keep mutating after its lease
    * expired and a standby took over. The returned lease's `epoch` is
    * the fencing token for closing that window: a caller whose side
    * effects must be single-writer re-verifies
    * `current(...).exists(_.epoch == held.epoch)` AFTER the effects and
    * compensates (stop its queries, re-enter the election loop) on
    * mismatch. Reconcile's own mutations are start/stop of idempotent
    * checkpointed queries — a doubled START is caught by the next
    * leader's reconcile pass and the checkpoint lock, so for the
    * default loop the post-check is advisory; it becomes mandatory the
    * moment `desired` writers gain non-idempotent side effects. As with
    * every lease, ttl must also dominate worst-case clock skew. */
  def reconcileIfLeader(spark: SparkSession, dir: Path, owner: String,
      desired: Map[String, DataStreamWriter[Row]], ttlMs: Long,
      nowMs: Long): Option[(Lease, Seq[String], Seq[String])] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    tryAcquire(hconf, dir, owner, ttlMs, nowMs).map { held =>
      val (started, stopped) = Reconcile(spark, desired)
      (held, started, stopped)
    }
  }

  private def claim(hconf: Configuration, dir: Path, owner: String,
      epoch: Long, expiresAtMs: Long): Option[Lease] = {
    val fs = dir.getFileSystem(hconf)
    fs.mkdirs(dir)
    val p = new Path(dir, s"$Prefix$epoch")
    val won =
      try {
        val out = fs.create(p, false) // EXCLUSIVE: the election's arbiter
        try out.write(s"$owner $expiresAtMs".getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false } // lost the race
    if (!won) None
    else {
      // superseded epochs go AFTER the claim commits; late deletion is
      // invisible to losers (they key on max epoch)
      fs.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(Prefix) &&
            scala.util.Try(n.stripPrefix(Prefix).toLong).toOption.exists(_ < epoch))
          fs.delete(st.getPath, false)
      }
      Some(Lease(owner, epoch, expiresAtMs))
    }
  }
}
