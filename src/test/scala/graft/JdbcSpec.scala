package graft

import graft.sources.{ConnectorConfig, JdbcBridge}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Live JDBC round-trip (SURVEY §2.1 S1/S9/S10/S11/S17) against embedded
  * Derby: real `spark.read.format("jdbc")` partitioned scans, real
  * INSERT/UPDATE/DELETE through the sink helpers — the reference's core
  * dataflow (JDBC source → topics → JDBC sink, reference `Dockerfile:28-40`)
  * finally touching an actual database. */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private def freshUrl(name: String) = s"jdbc:derby:memory:$name;create=true"

  private def cfg(url: String, table: String, partitioned: Boolean) =
    ConnectorConfig.Config("t", Map(
      "connection.url" -> url,
      "connection.driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
      "table" -> table) ++ (if (partitioned) Map(
      "partition.column" -> "id",
      "partition.lower.bound" -> "1",
      "partition.upper.bound" -> "1000",
      "tasks.max" -> "4") else Map.empty))

  private def seed(url: String, table: String): Unit = {
    val df = (1L to 100L).map(i => (i, s"name_$i", i * 1.5)).toDF("id", "name", "val")
    JdbcBridge.overwrite(df, url, table, keyCols = Seq("id"))
  }

  test("S1/S17: partitioned jdbc read returns the table across N range scans") {
    val url = freshUrl("jdbc_read")
    seed(url, "t1")
    val back = JdbcBridge.read(spark, cfg(url, "t1", partitioned = true))
    // tasks.max=4 → 4 bounded-range queries, the Connect parallelism analogue
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
    val rows = back.orderBy("id").collect()
    assert(rows.head.getLong(0) == 1L && rows.head.getString(1) == "name_1")
    assert(rows.last.getLong(0) == 100L && rows.last.getDouble(2) == 150.0)
    // unpartitioned config reads the same data through one scan
    val single = JdbcBridge.read(spark, cfg(url, "t1", partitioned = false))
    assert(single.count() == 100)
  }

  test("S9: insert.mode=insert appends") {
    val url = freshUrl("jdbc_insert")
    seed(url, "t2")
    JdbcBridge.insertInto(
      Seq((101L, "name_101", 1.0)).toDF("id", "name", "val"), url, "t2")
    assert(JdbcBridge.read(spark, cfg(url, "t2", partitioned = false)).count() == 101)
  }

  test("S10: upsert updates existing keys and inserts new ones") {
    val url = freshUrl("jdbc_upsert")
    seed(url, "t3")
    val changes = Seq(
      (5L, "updated_5", -5.0),   // existing key → UPDATE path
      (500L, "new_500", 500.0)). // unseen key → INSERT path
      toDF("id", "name", "val")
    JdbcBridge.upsert(changes, url, "t3", Seq("id"))
    val back = JdbcBridge.read(spark, cfg(url, "t3", partitioned = false))
    assert(back.count() == 101)
    val r5 = back.where($"id" === 5L).collect().head
    assert(r5.getString(1) == "updated_5" && r5.getDouble(2) == -5.0)
    assert(back.where($"id" === 500L).count() == 1)
    // untouched row intact
    assert(back.where($"id" === 6L).collect().head.getString(1) == "name_6")
  }

  test("S11: tombstone delete removes exactly the tombstoned keys") {
    val url = freshUrl("jdbc_delete")
    seed(url, "t4")
    JdbcBridge.deleteKeys(Seq(1L, 2L, 3L).toDF("id"), url, "t4", Seq("id"))
    val back = JdbcBridge.read(spark, cfg(url, "t4", partitioned = false))
    assert(back.count() == 97)
    assert(back.where($"id" <= 3L).count() == 0)
  }

  test("S10+S11: applyCdcBatch folds a mixed batch by latest-per-key order") {
    val url = freshUrl("jdbc_cdc")
    seed(url, "t5")
    // per key, ord decides the winner:
    //  id=7: update(ord 1) then tombstone(ord 2) → deleted
    //  id=8: tombstone(ord 1) then re-insert(ord 2) → survives, updated
    //  id=9: plain update → updated
    val batch = Seq(
      (7L, "upd_7", 7.0, 1L, false), (7L, null.asInstanceOf[String], 0.0, 2L, true),
      (8L, null.asInstanceOf[String], 0.0, 1L, true), (8L, "re_8", 8.0, 2L, false),
      (9L, "upd_9", 9.0, 1L, false)
    ).toDF("id", "name", "val", "ord", "tomb")
    JdbcBridge.applyCdcBatch(batch, url, "t5", Seq("id"), Seq(col("ord")),
      col("tomb"), tableCols = Some(Seq("id", "name", "val")))
    val back = JdbcBridge.read(spark, cfg(url, "t5", partitioned = false))
    assert(back.where($"id" === 7L).count() == 0)
    val r8 = back.where($"id" === 8L).collect().head
    assert(r8.getString(1) == "re_8" && r8.getDouble(2) == 8.0)
    assert(back.where($"id" === 9L).collect().head.getString(1) == "upd_9")
    assert(back.count() == 99) // 100 - id7 deleted (id8 survived)
  }

  test("sink creds: connection.user/password flow from the Connect config to sink connections") {
    val url = freshUrl("jdbc_creds")
    seed(url, "t7")
    val config = ConnectorConfig.Config("c", Map(
      "connection.url" -> url, "table" -> "t7",
      "connection.user" -> "app", "connection.password" -> "secret"))
    assert(JdbcBridge.sinkCreds(config) === Map("user" -> "app", "password" -> "secret"))
    // Derby without auth accepts any credentials — this drives the
    // credentialed connection path end-to-end, not the auth handshake
    JdbcBridge.upsert(Seq((5L, "cred_upd", 0.0)).toDF("id", "name", "val"),
      url, "t7", Seq("id"), creds = JdbcBridge.sinkCreds(config))
    JdbcBridge.deleteKeys(Seq(1L).toDF("id"), url, "t7", Seq("id"),
      creds = JdbcBridge.sinkCreds(config))
    val back = JdbcBridge.read(spark, cfg(url, "t7", partitioned = false))
    assert(back.where($"id" === 5L).collect().head.getString(1) == "cred_upd")
    assert(back.count() == 99)
  }

  test("T8 live: streaming foreachBatch CDC sink into Derby") {
    val url = freshUrl("jdbc_stream")
    seed(url, "t6")
    val mem = MemoryStream[(Long, String, Double, Long, Boolean)]
    val q = mem.toDF().toDF("id", "name", "val", "ord", "tomb")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val last = graft.operators.CdcApply.latestPerKey(
          batch, Seq("id"), Seq(col("ord"))).localCheckpoint(true)
        JdbcBridge.upsert(last.where(!col("tomb")).select($"id", $"name", $"val"),
          url, "t6", Seq("id"))
        JdbcBridge.deleteKeys(last.where(col("tomb")), url, "t6", Seq("id"))
        ()
      }
      .start()
    try {
      mem.addData((10L, "s_upd_10", 10.5, 1L, false), (11L, "", 0.0, 1L, true),
        (200L, "s_new_200", 2.0, 1L, false))
      q.processAllAvailable()
      val back = JdbcBridge.read(spark, cfg(url, "t6", partitioned = false))
      assert(back.where($"id" === 10L).collect().head.getString(1) == "s_upd_10")
      assert(back.where($"id" === 11L).count() == 0)
      assert(back.where($"id" === 200L).count() == 1)
      assert(back.count() == 100) // 100 seeded - 1 deleted + 1 inserted
    } finally q.stop()
  }
}
