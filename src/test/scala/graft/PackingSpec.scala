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
}
