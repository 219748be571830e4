package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar-function pack (SURVEY §2.7): one oracle-checked query per
  * family — string, date/time, math, conditional, array, map, JSON —
  * all built-in codegen'd functions, no UDFs.
  *
  * Cross-engine determinism notes: float rounding goes through DECIMAL
  * (binary-double `round(x, d)` is implementation-defined at the .5
  * boundary); `sqrt` is IEEE-754 correctly rounded so safe; map/array
  * results are flattened to scalars/joined strings for the driver's
  * hash compare.
  */
object ScalarQueries {
  import QU._

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // ---- string family ----
    ("f01_strings", (s, d) => {
      Tables.part(s, d).select(col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_type")).as("lo"),
        length(col("p_name")).as("len"),
        substring(col("p_name"), 2, 3).as("sub"),
        lpad(col("p_brand"), 12, "*").as("pad"),
        trim(concat(lit("  "), col("p_brand"), lit(" "))).as("trimmed"),
        regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 2).as("word2"),
        col("p_name").like("%red%").as("is_red"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cat"))
        .orderBy(col("p_partkey"))
    }, Some("""SELECT p_partkey, upper(p_name) AS up, lower(p_type) AS lo, len(p_name) AS len, substr(p_name, 2, 3) AS sub, lpad(p_brand, 12, '*') AS pad, trim('  ' || p_brand || ' ') AS trimmed, regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS word2, p_name LIKE '%red%' AS is_red, concat_ws('|', p_brand, p_type) AS cat FROM part ORDER BY p_partkey""")),

    // ---- date/time family ----
    ("f02_dates", (s, d) => {
      Tables.orders(s, d).select(col("o_orderkey"),
        micros(date_trunc("month", col("o_orderdate"))).as("month_start_us"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_add(col("o_orderdate").cast("date"), 30).cast("string").as("d30"),
        datediff(lit("1998-12-01").cast("date"), col("o_orderdate").cast("date")).as("dd"),
        unix_timestamp(col("o_orderdate")).as("unix_s"))
        .orderBy(col("o_orderkey"))
    }, Some("""SELECT o_orderkey, epoch_us(date_trunc('month', o_orderdate)) AS month_start_us, year(o_orderdate) AS y, month(o_orderdate) AS m, dayofmonth(o_orderdate) AS dom, (o_orderdate::DATE + 30)::VARCHAR AS d30, datediff('day', o_orderdate::DATE, DATE '1998-12-01') AS dd, epoch_us(o_orderdate) // 1000000 AS unix_s FROM orders ORDER BY o_orderkey""")),

    // ---- math family (decimal-exact rounding; IEEE-exact sqrt) ----
    ("f03_math", (s, d) => {
      Tables.orders(s, d).select(col("o_orderkey"),
        round(col("o_totalprice").cast(DecimalType(18, 2)), 1).cast("double").as("r1"),
        abs(col("o_totalprice") - 150000.0d).as("ab"),
        ceil(col("o_totalprice")).as("ce"),
        floor(col("o_totalprice")).as("fl"),
        sqrt(col("o_totalprice")).as("sq"),
        (col("o_orderkey") % 7).as("md"))
        .orderBy(col("o_orderkey"))
    }, Some("""SELECT o_orderkey, CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS r1, abs(o_totalprice - 150000.0) AS ab, CAST(ceil(o_totalprice) AS BIGINT) AS ce, CAST(floor(o_totalprice) AS BIGINT) AS fl, sqrt(o_totalprice) AS sq, o_orderkey % 7 AS md FROM orders ORDER BY o_orderkey""")),

    // ---- conditional family ----
    ("f04_conditional", (s, d) => {
      Tables.orders(s, d).select(col("o_orderkey"),
        when(col("o_totalprice") > 200000.0d, lit("big"))
          .when(col("o_totalprice") > 100000.0d, lit("mid"))
          .otherwise(lit("small")).as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("F")), lit("closed")).as("status_or"),
        (col("o_orderpriority").isNotNull && col("o_totalprice").between(0, 1e9)).as("sane"))
        .orderBy(col("o_orderkey"))
    }, Some("""SELECT o_orderkey, CASE WHEN o_totalprice > 200000.0 THEN 'big' WHEN o_totalprice > 100000.0 THEN 'mid' ELSE 'small' END AS bucket, coalesce(nullif(o_orderstatus, 'F'), 'closed') AS status_or, (o_orderpriority IS NOT NULL AND o_totalprice BETWEEN 0 AND 1000000000.0) AS sane FROM orders ORDER BY o_orderkey""")),

    // ---- array family (incl. higher-order transform/zip_with/aggregate) ----
    ("f05_arrays", (s, d) => {
      val ws = split(col("p_name"), " ")
      Tables.part(s, d).select(col("p_partkey"),
        size(ws).as("n_words"),
        array_join(array_sort(ws), "-").as("joined"),
        size(array_distinct(ws)).as("n_distinct"),
        array_join(slice(ws, 1, 1), "").as("first1"),
        aggregate(ws, lit(0), (acc, w) => acc + length(w)).as("total_len"),
        array_contains(ws, "red").as("has_red"),
        array_join(zip_with(ws, transform(ws, w => length(w)),
          (w, l) => concat(w, lit(":"), l)), ",").as("zipped"))
        .orderBy(col("p_partkey"))
    }, Some("""WITH t AS (SELECT p_partkey, string_split(p_name, ' ') ws FROM part) SELECT p_partkey, len(ws) AS n_words, array_to_string(list_sort(ws), '-') AS joined, len(list_distinct(ws)) AS n_distinct, array_to_string(ws[1:1], '') AS first1, CAST(list_sum(list_transform(ws, w -> len(w))) AS INTEGER) AS total_len, list_contains(ws, 'red') AS has_red, array_to_string(list_transform(list_zip(ws, list_transform(ws, w -> len(w))), p -> p[1] || ':' || p[2]), ',') AS zipped FROM t ORDER BY p_partkey""")),

    // ---- map family. The map is built over DISTINCT words: a repeated
    // word in p_name would otherwise throw DUPLICATED_MAP_KEY in Spark
    // (default mapKeyDedupPolicy=EXCEPTION) and error in DuckDB too — a
    // harness crash, not a compared value. Only the entry list is
    // deduped (every map consumer here is entry-order-insensitive, so
    // DuckDB's unspecified list_distinct order cannot leak); `ws` stays
    // the raw split because first1/v_first read positional words ----
    ("f06_maps", (s, d) => {
      val ws = split(col("p_name"), " ")
      val m = map_from_entries(transform(array_distinct(ws),
        w => struct(w.as("key"), length(w).as("value"))))
      Tables.part(s, d).select(col("p_partkey"),
        size(map_keys(m)).as("n_keys"),
        array_join(array_sort(map_keys(m)), ",").as("keys_sorted"),
        element_at(m, element_at(ws, 1)).as("v_first"),
        aggregate(map_values(m), lit(0), (acc, v) => acc + v).as("vals_sum"))
        .orderBy(col("p_partkey"))
    }, Some("""WITH t AS (SELECT p_partkey, map_from_entries(list_transform(list_distinct(string_split(p_name, ' ')), w -> {'k': w, 'v': len(w)})) m, string_split(p_name, ' ') ws FROM part) SELECT p_partkey, len(map_keys(m)) AS n_keys, array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted, map_extract(m, ws[1])[1] AS v_first, CAST(list_sum(map_values(m)) AS INTEGER) AS vals_sum FROM t ORDER BY p_partkey""")),

    // ---- generator family: posexplode as the UDTF surface (§2.10) ----
    ("f08_explode", (s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"), posexplode(split(col("p_name"), " ")))
        .withColumnRenamed("col", "word")
        .orderBy(col("p_partkey"), col("pos"))
    }, Some("""WITH t AS (SELECT p_partkey, string_split(p_name, ' ') ws FROM part), e AS (SELECT p_partkey, unnest(list_transform(ws, (w, i) -> {'pos': i - 1, 'word': w})) u FROM t) SELECT p_partkey, u.pos AS pos, u.word AS word FROM e ORDER BY p_partkey, pos""")),

    // ---- JSON family (the events.props column, SURVEY §2.7) ----
    ("f07_json", (s, d) => {
      Tables.events(s, d).select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").as("k_int"),
        json_tuple(col("props"), "k").as("k_tuple"))
        .orderBy(col("event_id"))
    }, Some("""SELECT event_id, json_extract_string(props, '$.k') AS k_str, CAST(json_extract(props, '$.k') AS INTEGER) AS k_int, json_extract_string(props, '$.k') AS k_tuple FROM events ORDER BY event_id"""))
  )
}
