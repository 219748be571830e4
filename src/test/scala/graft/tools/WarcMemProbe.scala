package graft.tools

import java.nio.charset.StandardCharsets.UTF_8

/** Measure the member-wise WARC parse's working-memory bound and its
  * wall-time parity against the retired whole-buffer walk — the
  * numbers BASELINE records for the L50 memory story. No Spark: the
  * parse is pure per-task byte work; what scales it is the per-record
  * carry, not the container size.
  * Usage: Test/runMain graft.tools.WarcMemProbe [nRecords recordKB ...] */
object WarcMemProbe {
  def main(args: Array[String]): Unit = {
    val cases: Seq[(Int, Int)] =
      if (args.nonEmpty) args.grouped(2).map(a => (a(0).toInt, a(1).toInt)).toSeq
      else Seq((128, 64), (1024, 64), (256, 1024))
    for ((nRec, kb) <- cases) {
      val unit = "the quick brown fox jumps over the lazy dog "
      val body = unit * (kb * 1024 / unit.length)
      val pages = (0 until nRec).map(i => (f"http://big.example.com/$i%05d", s"$body $i"))
      val gz = graft.sources.Warc.buildWet(pages, gzip = true)
      val inflated = pages.map(_._2.length + 160L).sum
      // member-wise path, records discarded: pure working-memory probe
      var t0 = System.nanoTime()
      val members = new graft.sources.Warc.GzipMembers(gz)
      val sc = new graft.sources.Warc.RecordScanner
      var n = 0
      var maxMember = 0
      while (members.hasNext) {
        val m = members.next()
        maxMember = math.max(maxMember, m.length)
        n += sc.feed(m).size
      }
      n += sc.finish().size
      val streamSec = (System.nanoTime() - t0) / 1e9
      require(n == nRec && sc.malformed == 0 && !members.truncated)
      // the retired whole-buffer walk for wall parity
      t0 = System.nanoTime()
      val (bRecs, bMal) = graft.sources.Warc.parseAllBuffered(gz)
      val bufSec = (System.nanoTime() - t0) / 1e9
      require(bRecs.size == nRec && bMal == 0)
      println(f"[warcmem] records=$nRec%-5d rec≈${kb}KB compressed=${gz.length / 1024}%dKB " +
        f"inflated=${inflated / 1024}%dKB max_carry=${sc.maxCarry / 1024}%dKB " +
        f"(=${inflated.toDouble / sc.maxCarry}%.0fx below the old inflation buffer) " +
        f"member-wise=$streamSec%.2f s buffered=$bufSec%.2f s")
    }
  }
}
