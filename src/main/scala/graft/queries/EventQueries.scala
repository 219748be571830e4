package graft.queries

import graft.operators.CdcApply
import graft.sources.Tables
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** Batch-equivalent oracle queries for the streaming operators (SURVEY
  * §2.8): the same `StreamOps` helpers run unchanged on streaming frames
  * (MemoryStream runs in the test suite); here they run on the batch
  * `events` table so the DuckDB oracle can check the windowing / CDC
  * semantics exactly.
  *
  * Timestamps leave as epoch micros; Spark's `window()` aligns tumbling
  * windows to the epoch origin, which the oracle reproduces with integer
  * µs arithmetic.
  */
object EventQueries {
  import QU._

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // ---- T2: tumbling 1-hour window aggregate per event type ----
    ("t02_tumbling", (s, d) => {
      StreamOps.windowedAgg(Tables.events(s, d), "ts", "1 hour", "1 hour",
        Seq(col("event_type")),
        Seq(count(lit(1)).as("n"), dsum(col("value")).as("sum_val")))
        .select(micros(col("window.start")).as("win_start_us"),
          col("event_type"), col("n"), col("sum_val"))
        .orderBy(col("win_start_us"), col("event_type"))
    }, Some("""SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_start_us, event_type, COUNT(*) n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) sum_val FROM events GROUP BY 1, 2 ORDER BY win_start_us, event_type""")),

    // ---- T3: sliding 1-hour window, 30-minute slide (each event lands
    // in two windows; the oracle unions the two shifted bucketings) ----
    ("t03_sliding", (s, d) => {
      StreamOps.windowedAgg(Tables.events(s, d), "ts", "1 hour", "30 minutes",
        Seq.empty, Seq(count(lit(1)).as("n")))
        .select(micros(col("window.start")).as("win_start_us"), col("n"))
        .orderBy(col("win_start_us"))
    }, Some("""WITH w AS (SELECT (epoch_us(ts) // 1800000000) * 1800000000 AS win_start_us, * FROM events UNION ALL SELECT (epoch_us(ts) // 1800000000) * 1800000000 - 1800000000 AS win_start_us, * FROM events) SELECT win_start_us, COUNT(*) n FROM w GROUP BY 1 ORDER BY win_start_us""")),

    // ---- T4: session windows (30-minute inactivity gap) per user; the
    // oracle is the classic gaps-and-islands rewrite ----
    ("t04_session", (s, d) => {
      StreamOps.sessionAgg(Tables.events(s, d), "ts", "30 minutes",
        Seq(col("user_id")), Seq(count(lit(1)).as("n")))
        .select(col("user_id"),
          micros(col("session_window.start")).as("sess_start_us"),
          micros(col("session_window.end")).as("sess_end_us"), col("n"))
        .orderBy(col("user_id"), col("sess_start_us"))
    }, Some("""WITH o AS (SELECT user_id, ts, CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END brk FROM events), sess AS (SELECT user_id, ts, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sid FROM o) SELECT user_id, epoch_us(MIN(ts)) sess_start_us, epoch_us(MAX(ts) + INTERVAL 30 MINUTE) sess_end_us, COUNT(*) n FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start_us""")),

    // ---- T5: streaming-dedup batch equivalent — a doubled stream
    // deduped on the record key collapses to the original cardinality ----
    ("t05_dedup", (s, d) => {
      val ev = Tables.events(s, d)
      StreamOps.dedup(ev.unionByName(ev), Seq("event_id"))
        .agg(count(lit(1)).as("n"), countDistinct(col("event_id")).as("n_keys"))
    }, Some("""SELECT COUNT(DISTINCT event_id) AS n, COUNT(DISTINCT event_id) AS n_keys FROM events""")),

    // ---- T8: CDC apply — fold a change batch into prior state: upsert
    // latest-per-key, tombstones (event_type='signup' stands in for a
    // null-value record) delete the key (SURVEY S10/S11 semantics) ----
    ("t08_cdc_apply", (s, d) => {
      val ev = Tables.events(s, d)
      val split = to_timestamp(lit("2024-01-20"))
      val state = CdcApply.latestPerKey(ev.where(col("ts") < split),
        Seq("user_id"), Seq(col("ts"), col("event_id")))
      val changes = ev.where(col("ts") >= split)
      CdcApply(state, changes, Seq("user_id"), Seq(col("ts"), col("event_id")),
        col("event_type") === "signup")
        .select(col("user_id"), col("event_id"), micros(col("ts")).as("ts_us"), col("value"))
        .orderBy(col("user_id"))
    }, Some("""WITH st AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events WHERE ts < TIMESTAMP '2024-01-20') WHERE rn = 1), lc AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events WHERE ts >= TIMESTAMP '2024-01-20') WHERE rn = 1) SELECT user_id, event_id, epoch_us(ts) ts_us, value FROM st WHERE NOT EXISTS (SELECT 1 FROM lc WHERE lc.user_id IS NOT DISTINCT FROM st.user_id) UNION ALL SELECT user_id, event_id, epoch_us(ts) ts_us, value FROM lc WHERE event_type <> 'signup' ORDER BY user_id"""))
  )
}
