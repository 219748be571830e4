package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

/** Packing invariants beyond the l14 oracle: partitioning-invariance
  * (the layout is a pure function of the data, not of how Spark dealt
  * the rows), and a single-shard reference model spelled directly from
  * the ring arithmetic (contiguity, straddle assignment, offsets). */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val P = 2147483647L
  private def ringKey(id: Long): Long = (((id % P) * 2654435761L) + 104729L) % P

  test("packing is invariant under input repartitioning") {
    val docs = (1L to 300L).map(i => (i, (i % 37 + 1).toInt)).toDF("id", "n_tok")
    def packed(df: org.apache.spark.sql.DataFrame) =
      Packing.packSequences(df, "id", "n_tok", seqLen = 64, shards = 4)
        .select($"id", $"shard", $"seq_in_shard", $"start_in_seq")
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(packed(docs) === packed(docs.repartition(7)))
    assert(packed(docs) === packed(docs.repartition(1).sortWithinPartitions($"n_tok")))
  }

  test("single-shard layout matches the reference model incl. straddling docs") {
    val docs = Seq((10L, 100), (20L, 100), (30L, 100), (40L, 100)).toDF("id", "n_tok")
    val got = Packing.packSequences(docs, "id", "n_tok", seqLen = 256, shards = 1)
      .select($"id", $"seq_in_shard", $"start_in_seq")
      .as[(Long, Long, Long)].collect()
      .map { case (id, s, o) => id -> ((s, o)) }.toMap
    // reference: lay out in ring order, assign to the sequence of the
    // START offset; the doc at start 200 straddles 256 but stays in seq 0
    val order = Seq(10L, 20L, 30L, 40L).sortBy(id => (ringKey(id), id))
    val expected = order.zipWithIndex.map { case (id, i) =>
      val start = i * 100L
      id -> ((start / 256L, start % 256L))
    }.toMap
    assert(got === expected)
    assert(expected.values.map(_._1).toSet === Set(0L, 1L)) // a straddle happened
  }

  test("duplicate ids pack into disjoint contiguous spans (ROWS frame)") {
    // the default RANGE frame would make ORDER-BY-peer rows absorb each
    // other's tokens (__end identical for all peers), overlapping spans
    // and leaving a hole; the explicit ROWS frame gives each row its own
    // slot — which peer gets which slot is arbitrary, but the multiset
    // of (seq, start) coordinates is fixed
    val docs = Seq((5L, 10), (5L, 10), (5L, 10)).toDF("id", "n_tok")
    val got = Packing.packSequences(docs, "id", "n_tok", seqLen = 25, shards = 1)
      .select($"seq_in_shard", $"start_in_seq")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((0L, 0L), (0L, 10L), (0L, 20L)))
  }

  test("chunkDocuments: full coverage, stride overlap, truncated tail, empty docs, guards") {
    val docs = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")), // 20 tokens
      (2L, "a b c"),                                   // shorter than one chunk
      (3L, ""), (4L, null.asInstanceOf[String]))       // emit nothing
      .toDF("doc_id", "text")
    val out = Packing.chunkDocuments(docs, "text", "doc_id",
        chunkTokens = 8, stride = 4)
      .orderBy($"doc_id", $"chunk_id")
      .as[(Long, Int, Int, Int, String)].collect()
    // doc 1: starts at 0,4,8,12,16 — every token covered, consecutive
    // chunks overlap by chunk-stride, tail truncates
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._3).toSeq === Seq(0, 4, 8, 12, 16))
    assert(d1.map(_._4).toSeq === Seq(8, 8, 8, 8, 4))
    assert(d1.head._5 === (1 to 8).map(i => s"t$i").mkString(" "))
    d1.sliding(2).foreach { case Array(a, b) =>
      val aToks = a._5.split(" ").toSeq; val bToks = b._5.split(" ").toSeq
      assert(aToks.takeRight(4) === bToks.take(4), "stride overlap broken")
    }
    // union of chunks at stride boundaries reconstructs the doc: each
    // chunk contributes its first `stride` tokens, the last contributes all
    assert((d1.init.map(_._5.split(" ").take(4).mkString(" ")) :+ d1.last._5)
      .mkString(" ") === (1 to 20).map(i => s"t$i").mkString(" "))
    // short doc: one truncated chunk; empty/null: no rows
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0, 0, 3, "a b c")))
    assert(!out.exists(r => r._1 == 3L || r._1 == 4L))
    // stride == chunk: disjoint cover, no overlap
    val flat = Packing.chunkDocuments(docs.where($"doc_id" === 1), "text",
        "doc_id", chunkTokens = 8, stride = 8)
      .orderBy($"chunk_id").as[(Long, Int, Int, Int, String)].collect()
    assert(flat.map(_._4).toSeq === Seq(8, 8, 4))
    intercept[IllegalArgumentException] { // stride > chunk skips tokens
      Packing.chunkDocuments(docs, "text", "doc_id", 8, 9)
    }
  }

  test("every doc appears exactly once and token totals are preserved") {
    val docs = (1L to 500L).map(i => (i, (i % 23).toInt)).toDF("id", "n_tok")
    val packed = Packing.packSequences(docs, "id", "n_tok", seqLen = 128, shards = 8)
    assert(packed.count() === 500)
    assert(packed.select(countDistinct($"id")).as[Long].head() === 500)
    val stats = Packing.sequenceStats(packed, "n_tok")
    val totTok = stats.agg(sum($"n_tokens")).as[Long].head()
    assert(totTok === (1L to 500L).map(_ % 23).sum)
    // start offsets are within the sequence window
    assert(packed.where($"start_in_seq" < 0 || $"start_in_seq" >= 128).isEmpty)
  }

  test("packBins (Krell 2021): no doc splits, capacity respected, truncation cap, contiguous bins, partition-invariant") {
    val docs = (1L to 500L).map(i => (i, (i % 37).toInt * 7)).toDF("id", "n_tok")
    val packed = Packing.packBins(docs, "id", "n_tok", seqLen = 128, shards = 8)
      .cache()
    // conservation: every doc exactly once, tokens capped at seqLen
    assert(packed.count() === 500)
    assert(packed.select(countDistinct($"id")).as[Long].head() === 500)
    val expTok = (1L to 500L).map(i => math.min((i % 37) * 7, 128)).sum
    assert(packed.agg(sum($"n_tok_packed")).as[Long].head() === expTok)
    // capacity: NO bin exceeds seqLen (the no-splitting contract —
    // a doc never straddles, so the sum bound is exact, not ±1 doc)
    val stats = Packing.binStats(packed, 128).cache()
    assert(stats.where($"n_tokens" > 128).isEmpty, "bin over capacity")
    assert(stats.where($"n_padding" < 0).isEmpty)
    // bins are contiguous 0..max within each shard
    val gaps = stats.groupBy($"shard")
      .agg(count(lit(1)).as("n"), max($"bin_in_shard").as("mx"))
      .where($"mx" =!= $"n" - 1)
    assert(gaps.isEmpty, "bin ids must be contiguous per shard")
    // slots are contiguous 0..n_docs-1 within each bin
    val slotGaps = packed.groupBy($"shard", $"bin_in_shard")
      .agg(count(lit(1)).as("n"), max($"slot").as("mx"), min($"slot").as("mn"))
      .where($"mx" =!= $"n" - 1 || $"mn" =!= 0L)
    assert(slotGaps.isEmpty, "slots must be contiguous per bin")
    // next-fit-decreasing: within a shard, bin OPENERS (slot 0) carry
    // non-increasing lengths — the descending walk's signature
    val openers = packed.where($"slot" === 0)
      .select($"shard", $"bin_in_shard", $"n_tok_packed").collect()
      .groupBy(_.getLong(0))
    openers.values.foreach { rs =>
      val byBin = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(byBin.zip(byBin.tail).forall { case (a, b) => a >= b },
        s"openers must be non-increasing: ${byBin.toSeq}")
    }
    // determinism: identical layout under any input partitioning
    val packed2 = Packing.packBins(docs.repartition(13), "id", "n_tok",
      seqLen = 128, shards = 8)
    assert(packed.exceptAll(packed2).isEmpty &&
      packed2.exceptAll(packed).isEmpty,
      "layout must not depend on input partitioning")
    packed.unpersist(); stats.unpersist()
  }
}
