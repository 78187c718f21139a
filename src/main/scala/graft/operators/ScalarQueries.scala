package graft.operators

import graft.GQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Set operations (q19) and scalar-function surface (q20-q23): string,
  * date/math, JSON, array/higher-order. All expressions are Catalyst
  * built-ins (whole-stage codegen'd, no UDFs); the oracle side picks
  * DuckDB functions with bit-identical semantics (SURVEY §7 step 4
  * dialect notes).
  */
object ScalarQueries {

  /** q19 — UNION ALL / INTERSECT / EXCEPT over two customer-key sets.
    * INTERSECT/EXCEPT are set-distinct in both engines. */
  private val q19 = GQuery(
    "q19_setops",
    (s, d) => {
      val c = Tables.customer(s, d)
      val rich = c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
      val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val both = rich.intersect(building).select(col("c_custkey"), lit("both").as("tag"))
      val richOnly = rich.except(building).select(col("c_custkey"), lit("rich_only").as("tag"))
      val any = rich.unionAll(building).distinct()
        .select(col("c_custkey"), lit("any").as("tag"))
      // bag semantics over a multiset key (nationkey repeats): INTERSECT
      // ALL keeps min(m1,m2) copies, EXCEPT ALL keeps m1-m2 copies
      val richN = c.filter(col("c_acctbal") > 5000).select(col("c_nationkey").cast("bigint").as("c_custkey"))
      val buildN = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_nationkey").cast("bigint").as("c_custkey"))
      val intAll = richN.intersectAll(buildN).select(col("c_custkey"), lit("int_all").as("tag"))
      val excAll = richN.exceptAll(buildN).select(col("c_custkey"), lit("exc_all").as("tag"))
      both.unionAll(richOnly).unionAll(any).unionAll(intAll).unionAll(excAll)
        .orderBy(col("tag"), col("c_custkey"))
    },
    Some("""SELECT c_custkey, tag FROM (
              SELECT c_custkey, 'both' AS tag FROM
                (SELECT c_custkey FROM customer WHERE c_acctbal > 5000
                 INTERSECT
                 SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
              UNION ALL
              SELECT c_custkey, 'rich_only' AS tag FROM
                (SELECT c_custkey FROM customer WHERE c_acctbal > 5000
                 EXCEPT
                 SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
              UNION ALL
              SELECT DISTINCT c_custkey, 'any' AS tag FROM
                (SELECT c_custkey FROM customer WHERE c_acctbal > 5000
                 UNION ALL
                 SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
              UNION ALL
              SELECT c_custkey, 'int_all' AS tag FROM
                (SELECT CAST(c_nationkey AS BIGINT) AS c_custkey FROM customer WHERE c_acctbal > 5000
                 INTERSECT ALL
                 SELECT CAST(c_nationkey AS BIGINT) AS c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
              UNION ALL
              SELECT c_custkey, 'exc_all' AS tag FROM
                (SELECT CAST(c_nationkey AS BIGINT) AS c_custkey FROM customer WHERE c_acctbal > 5000
                 EXCEPT ALL
                 SELECT CAST(c_nationkey AS BIGINT) AS c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'))
            ORDER BY tag, c_custkey""")
  )

  /** q20 — string functions over part. `split` on a literal space and
    * element_at keep Spark/DuckDB semantics aligned. */
  private val q20 = GQuery(
    "q20_scalar_string",
    (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 5).as("prefix"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).cast("bigint").as("name_len"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        col("p_name").like("%widget%").as("is_widget"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        regexp_replace(col("p_type"), "O", "0").as("leeted"))
        .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey, upper(p_name) AS uname,
                   substring(p_name, 1, 5) AS prefix,
                   concat_ws('-', p_brand, p_type) AS brand_type,
                   CAST(length(p_name) AS BIGINT) AS name_len,
                   trim('  ' || p_name || '  ') AS trimmed,
                   p_name LIKE '%widget%' AS is_widget,
                   string_split(p_name, ' ')[1] AS first_word,
                   regexp_replace(p_type, 'O', '0', 'g') AS leeted
            FROM part ORDER BY p_partkey""")
  )

  /** q21 — date & math scalar functions over orders. */
  private val q21 = GQuery(
    "q21_scalar_datemath",
    (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("bigint").as("yr"),
        month(col("o_orderdate")).cast("bigint").as("mo"),
        dayofmonth(col("o_orderdate")).cast("bigint").as("dom"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("bigint").as("days_to_2002"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        round(col("o_totalprice"), 1).as("rounded_price"),
        abs(col("o_totalprice") - 150000.0).as("abs_delta"),
        ceil(col("o_totalprice") / 1000.0).cast("bigint").as("price_k_ceil"),
        floor(col("o_totalprice") / 1000.0).cast("bigint").as("price_k_floor"),
        pmod(col("o_orderkey"), lit(7)).cast("bigint").as("key_mod7"))
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
                   CAST(year(o_orderdate) AS BIGINT) AS yr,
                   CAST(month(o_orderdate) AS BIGINT) AS mo,
                   CAST(day(o_orderdate) AS BIGINT) AS dom,
                   CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002,
                   CAST(o_orderdate AS DATE) + 30 AS due_date,
                   round(o_totalprice, 1) AS rounded_price,
                   abs(o_totalprice - 150000.0) AS abs_delta,
                   CAST(ceil(o_totalprice / 1000.0) AS BIGINT) AS price_k_ceil,
                   CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS price_k_floor,
                   o_orderkey % 7 AS key_mod7
            FROM orders ORDER BY o_orderkey""")
  )

  /** q22 — JSON extraction from events.props (JSON-in-string column),
    * aggregated by event type. Extracted scalars are cast to int so both
    * engines agree on type and value. */
  private val q22 = GQuery(
    "q22_scalar_json",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(
          sum(col("k")).cast("bigint").as("sum_k"),
          count(when(col("k") > 50, 1)).as("n_high"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   count(CASE WHEN k > 50 THEN 1 END) AS n_high,
                   count(*) AS n
            FROM (SELECT event_type,
                         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
                  FROM events)
            GROUP BY event_type ORDER BY event_type""")
  )

  /** q23 — array / higher-order functions over the embedding column.
    * Lambda predicates (filter) + element access; float→double casts are
    * exact so no rounding is needed. */
  private val q23 = GQuery(
    "q23_array_ops",
    (s, d) =>
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).cast("bigint").as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_val"),
        size(filter(col("embedding"), x => x > 0)).cast("bigint").as("n_pos"),
        array_max(col("embedding")).cast("double").as("max_val"),
        array_min(col("embedding")).cast("double").as("min_val"))
        .orderBy(col("vec_id")),
    Some("""SELECT vec_id,
                   CAST(len(embedding) AS BIGINT) AS dim,
                   CAST(embedding[1] AS DOUBLE) AS first_val,
                   CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
                   CAST(list_max(embedding) AS DOUBLE) AS max_val,
                   CAST(list_min(embedding) AS DOUBLE) AS min_val
            FROM embeddings ORDER BY vec_id""")
  )

  /** q46 — ordered string aggregation: canonical (sorted, distinct)
    * concatenation per group — cross-engine stable where raw
    * listagg/string_agg input order would not be. */
  private val q46 = GQuery(
    "q46_string_agg",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          concat_ws(",", array_sort(collect_set(col("o_orderstatus")))).as("statuses"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority,
                   string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
                   count(*) AS n
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  )

  /** q47 — MapType surface (SURVEY §1: props JSON → map via from_json):
    * key listing, map access, and size over the parsed map. */
  private val q47 = GQuery(
    "q47_map_ops",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")).as("m"))
        .select(
          col("event_id"),
          size(col("m")).cast("bigint").as("n_keys"),
          concat_ws(",", array_sort(map_keys(col("m")))).as("keys"),
          col("m")("k").as("k_val"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id,
                   CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
                   array_to_string(list_sort(json_keys(props)), ',') AS keys,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
            FROM events ORDER BY event_id""")
  )

  /** q112 — UNPIVOT / melt (wave 5): the wide→long reshape that closes
    * the q45 pivot round-trip — per-order charge components unpivoted to
    * (metric, value) rows and aggregated per metric. Spark expresses
    * UNPIVOT as `stack` (a Generate — map-only 1:4 fan-out, exactly like
    * explode); the aggregate is |metrics|-bounded with partial combine.
    * Values ride DECIMAL(18,2) so the per-metric sums are exact and
    * order-independent. */
  private val q112 = GQuery(
    "q112_unpivot",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          expr("""stack(4,
                  'quantity', CAST(l_quantity AS DECIMAL(18,2)),
                  'extendedprice', CAST(l_extendedprice AS DECIMAL(18,2)),
                  'discount', CAST(l_discount AS DECIMAL(18,2)),
                  'tax', CAST(l_tax AS DECIMAL(18,2))) AS (metric, value)"""))
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("n"),
          sum(col("value")).cast("double").as("total"),
          max(col("value")).cast("double").as("max_value"))
        .orderBy(col("metric")),
    Some("""SELECT metric, count(*) AS n,
                   CAST(sum(value) AS DOUBLE) AS total,
                   CAST(max(value) AS DOUBLE) AS max_value
            FROM (SELECT l_orderkey, metric,
                         CAST(value AS DECIMAL(18,2)) AS value
                  FROM (SELECT l_orderkey,
                               CAST(l_quantity AS DECIMAL(18,2)) AS quantity,
                               CAST(l_extendedprice AS DECIMAL(18,2)) AS extendedprice,
                               CAST(l_discount AS DECIMAL(18,2)) AS discount,
                               CAST(l_tax AS DECIMAL(18,2)) AS tax
                        FROM lineitem)
                  UNPIVOT (value FOR metric IN (quantity, extendedprice, discount, tax)))
            GROUP BY metric ORDER BY metric""")
  )

  val all: Seq[GQuery] = Seq(q19, q20, q21, q22, q23, q46, q47, q112)
}
