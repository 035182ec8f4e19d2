package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scalar-function surface (SURVEY.md §2f). The reference exposes whatever
  * the Catalyst ~3.1 builtin registry resolves (Microbase.scala:197-206)
  * but only over five types with no nulls; our engine exposes the full
  * modern `functions._` registry including JSON, regex and array/higher-
  * order functions (needed for events.props and documents).
  *
  * Cross-engine caution: libm-backed transcendentals (exp/ln/pow) can
  * differ by 1 ulp between engines, so oracle-compared math sticks to
  * IEEE-exact ops (abs/floor/ceil/sqrt/mod/round) and polynomial forms.
  */
object FunctionQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    // E1 string functions: case, substring, trim/pad, concat, replace.
    "fn_string" -> ((s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("up"),
          lower(col("c_mktsegment")).as("lo"),
          substring(col("c_name"), 1, 8).as("sub"),
          length(col("c_name")).as("len"),
          concat_ws("-", col("c_mktsegment"), col("c_custkey")).as("cat"),
          ltrim(rtrim(col("c_name"))).as("trimmed"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
          regexp_replace(col("c_name"), "[0-9]+", "#").as("masked"))
        .orderBy("c_custkey")),

    // LIKE / rlike-class predicates.
    "fn_like" -> ((s, d) =>
      Tables.part(s, d)
        .filter(col("p_name").like("%widget%") ||
                col("p_name").rlike("^blue.*rod"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey", "p_name")),

    // E1 date functions: extract fields, truncate, arithmetic.
    "fn_date" -> ((s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("q"),
          to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
          date_add(to_date(col("o_orderdate")), 30).as("due_date"),
          datediff(lit("2002-01-01").cast("date"), to_date(col("o_orderdate")))
            .as("age_days"))
        .orderBy("o_orderkey", "y", "m", "dom")),

    // E2 math: IEEE-exact subset + polynomial arithmetic.
    "fn_math" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("absval"),
          floor(col("l_extendedprice")).as("fl"),
          ceil(col("l_extendedprice")).as("ce"),
          // round() on dyadic values only: x/4 has exact .25 steps, so the
          // .5-at-scale ties are exactly representable and both engines
          // round them away-from-zero identically. Rounding raw 2-decimal
          // doubles would diverge (Spark rounds the shortest decimal repr,
          // DuckDB the binary value).
          round(col("l_quantity") / 4.0, 1).as("rd"),
          sqrt(col("l_quantity")).as("sq"),
          (col("l_quantity") * col("l_quantity") + lit(2.0) * col("l_quantity"))
            .as("poly"),
          pmod(col("l_orderkey"), lit(7L)).as("pm"),
          signum(col("l_discount") - 0.05).as("sg"),
          greatest(col("l_tax"), col("l_discount")).as("gr"),
          least(col("l_tax"), col("l_discount")).as("le"))
        .orderBy("l_orderkey", "l_linenumber", "fl", "sq")),

    // CASE WHEN buckets + casts (E2's Cast surface).
    "fn_case_cast" -> ((s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .otherwise("large").as("bucket"),
          // explicit floor: Spark's double→int cast truncates while
          // DuckDB's rounds, so the truncation must be spelled out.
          floor(col("o_totalprice")).cast("int").as("price_int"),
          col("o_orderkey").cast("string").as("key_str"),
          // decimal cast rendered through a string: both engines print a
          // DECIMAL(18,2) scale-padded ("856.20"), which keeps the decimal
          // cast under test while the compared column stays comparator-safe
          // (a raw decimal column renders differently from a float in the
          // driver's hash when the value has a trailing zero at scale).
          col("o_totalprice").cast("decimal(18,2)").cast("string")
            .as("price_dec"))
        .orderBy("o_orderkey")),

    // JSON extraction over events.props (get_json_object ~ ->> ).
    "fn_json" -> ((s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"))
        .orderBy("event_id")),

    // Array + higher-order functions over tokenized text: size, contains,
    // transform/filter/aggregate (the array surface the reference lacks
    // entirely; also the base layer for the dedup/text operators).
    "fn_array" -> ((s, d) => {
      val toks = split(col("text"), "\\s+")
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(toks).as("n_tokens"),
          array_contains(toks, "spark").as("has_spark"),
          size(array_distinct(toks)).as("n_distinct"),
          element_at(array_sort(array_distinct(toks)), 1).as("first_token"),
          aggregate(transform(toks, t => length(t)), lit(0),
            (acc, x) => acc + x).as("total_chars"))
        .orderBy("doc_id")
    }),

    // Map functions: construction from arrays, cardinality, key/value
    // extraction, lookup, concat-with-override. Compared output is all
    // scalars (map columns, like arrays, don't hash-compare) — keys stay
    // in construction order in both engines.
    "fn_map" -> ((s, d) => {
      val m = map_from_arrays(
        array(lit("status"), lit("priority")),
        array(col("o_orderstatus"), col("o_orderpriority")))
      Tables.orders(s, d).filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          size(m).cast("int").as("m_size"),
          array_join(map_keys(m), ",").as("m_keys"),
          array_join(map_values(m), ",").as("m_vals"),
          element_at(m, "priority").as("m_priority"),
          element_at(map_concat(m, map(lit("extra"), lit("x"))), "extra")
            .as("m_extra"))
        .orderBy("o_orderkey")
    }),

    // Regex extraction.
    "fn_regex" -> ((s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"))
        .orderBy("c_custkey")),

    // Scala UDF surface (SURVEY §2g: the reference has no UDFs at all).
    // Registered + called through SQL; oracle mirrors the logic natively.
    // UDFs are kept OUT of hot paths (no codegen) — this demonstrates the
    // registration contract, not a recommended scan operator.
    "fn_udf" -> ((s, d) => {
      s.udf.register("slugify",
        (x: String) => if (x == null) null else x.toLowerCase.replace("#", "_"))
      Tables.registerAll(s, d)
      s.sql("""SELECT c_custkey, slugify(c_name) AS slug
               FROM customer ORDER BY c_custkey""")
    }),

    // try_-family error-safe functions (ANSI mode without the blast
    // radius): invalid casts and div-by-zero yield NULL, coalesced here to
    // keep the compared output null-free.
    "fn_try" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          coalesce(try_divide(col("l_quantity"),
            col("l_linenumber") - lit(1)), lit(-1.0)).as("qty_per_extra_line"),
          coalesce(expr("try_cast(l_returnflag AS INT)"), lit(-1))
            .as("flag_as_int"))
        .orderBy("l_orderkey", "l_linenumber", "qty_per_extra_line")),

    // NULL semantics — the reference can't even represent nulls (its
    // loader never produces them, SURVEY §1); here: three-valued logic,
    // null-safe equality, coalesce/nullif/nvl2-style forms.
    "fn_null" -> ((s, d) => {
      val lagged = Tables.orders(s, d)
        .withColumn("prev_key", lag(col("o_orderkey"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("o_custkey").orderBy("o_orderkey")))
      lagged.select(
          col("o_orderkey"),
          col("prev_key").isNull.as("is_first"),
          coalesce(col("prev_key"), lit(-1L)).as("prev_or_default"),
          (col("prev_key") <=> col("o_orderkey")).as("nullsafe_self"),
          nullif(col("o_orderstatus"), lit("O")).isNull.as("is_open"))
        .orderBy("o_orderkey")
    }),

    // Hashing: md5 (cross-engine identical), plus Spark-native xxhash64 /
    // murmur3 kept out of the oracle (engine-specific seeds).
    "fn_hash" -> ((s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          md5(col("text")).as("text_md5"),
          substring(md5(col("text")), 1, 8).as("md5_prefix"))
        .orderBy("doc_id")),

    // Bitwise surface: and/or/xor, shifts, popcount — all codegen'd
    // built-ins. Keys are non-negative, so DuckDB's arithmetic >> equals
    // Spark's shiftrightunsigned here.
    "fn_bitwise" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_orderkey").bitwiseAND(col("l_partkey")).as("band"),
          col("l_orderkey").bitwiseOR(col("l_partkey")).as("bor"),
          col("l_orderkey").bitwiseXOR(col("l_partkey")).as("bxor"),
          shiftleft(col("l_linenumber"), 3).cast("bigint").as("shl"),
          shiftrightunsigned(col("l_orderkey"), 2).as("shr"),
          bit_count(col("l_partkey")).as("popcnt"))
        .orderBy("l_orderkey", "l_linenumber", "band", "bor", "bxor",
          "shl", "shr", "popcnt")),

    // Nested struct surface: build, field-access (dotted + getField),
    // nested computation, flattened output — the typed-record shape
    // every log/event schema carries.
    "fn_struct" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("rec", struct(
          col("o_orderstatus").as("status"),
          struct(col("o_totalprice").as("amount"),
            (col("o_totalprice") * 0.1).as("tax")).as("money")))
        .select(
          col("o_orderkey"),
          col("rec.status").as("status"),
          col("rec.money.amount").as("amount"),
          (col("rec").getField("money").getField("tax") +
            col("rec.money.amount")).as("gross"))
        .orderBy("o_orderkey")),

    // URL parsing (parse_url host/path/query-param) over deterministic
    // synthesized URLs; the oracle states the ground-truth components
    // directly, so this checks Spark's parser against construction.
    "fn_url" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("url",
          concat(lit("https://"), col("source"), lit(".example.com/docs/"),
            col("doc_id").cast("string"), lit("?lang="), col("lang")))
        .select(
          col("doc_id"), col("url"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("lang")).as("lang_param"))
        .orderBy("doc_id"))
  )

  val oracle: Map[String, String] = Map(
    "fn_string" ->
      """SELECT c_custkey,
           upper(c_name) AS up, lower(c_mktsegment) AS lo,
           substring(c_name, 1, 8) AS sub,
           CAST(length(c_name) AS INT) AS len,
           concat_ws('-', c_mktsegment, c_custkey) AS cat,
           ltrim(rtrim(c_name)) AS trimmed,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked
         FROM customer ORDER BY c_custkey""",
    "fn_like" ->
      """SELECT p_partkey, p_name FROM part
         WHERE p_name LIKE '%widget%' OR regexp_matches(p_name, '^blue.*rod')
         ORDER BY p_partkey, p_name""",
    "fn_date" ->
      """SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS age_days
         FROM orders ORDER BY o_orderkey, y, m, dom""",
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS absval,
           CAST(floor(l_extendedprice) AS BIGINT) AS fl,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
           round(l_quantity / 4.0, 1) AS rd,
           sqrt(l_quantity) AS sq,
           l_quantity * l_quantity + 2.0 * l_quantity AS poly,
           l_orderkey % 7 AS pm,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
           greatest(l_tax, l_discount) AS gr,
           least(l_tax, l_discount) AS le
         FROM lineitem ORDER BY l_orderkey, l_linenumber, fl, sq""",
    "fn_case_cast" ->
      """SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS bucket,
           CAST(floor(o_totalprice) AS INT) AS price_int,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec
         FROM orders ORDER BY o_orderkey""",
    "fn_json" ->
      """SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val
         FROM events ORDER BY event_id""",
    "fn_array" ->
      """SELECT doc_id,
           CAST(len(regexp_split_to_array(text, '\s+')) AS INT) AS n_tokens,
           list_contains(regexp_split_to_array(text, '\s+'), 'spark') AS has_spark,
           CAST(len(list_distinct(regexp_split_to_array(text, '\s+'))) AS INT) AS n_distinct,
           list_sort(list_distinct(regexp_split_to_array(text, '\s+')))[1] AS first_token,
           CAST(list_sum(list_transform(regexp_split_to_array(text, '\s+'),
             t -> length(t))) AS INT) AS total_chars
         FROM documents ORDER BY doc_id""",
    "fn_map" ->
      """SELECT o_orderkey,
           CAST(cardinality(m) AS INT) AS m_size,
           array_to_string(map_keys(m), ',') AS m_keys,
           array_to_string(map_values(m), ',') AS m_vals,
           m['priority'][1] AS m_priority,
           map_concat(m, map(['extra'], ['x']))['extra'][1] AS m_extra
         FROM (SELECT o_orderkey,
                 map(['status', 'priority'],
                     [o_orderstatus, o_orderpriority]) AS m
               FROM orders)
         WHERE o_orderkey < 1000
         ORDER BY o_orderkey""",
    "fn_regex" ->
      """SELECT c_custkey, regexp_extract(c_name, '([0-9]+)', 1) AS digits
         FROM customer ORDER BY c_custkey""",
    "fn_udf" ->
      """SELECT c_custkey, lower(replace(c_name, '#', '_')) AS slug
         FROM customer ORDER BY c_custkey""",
    "fn_try" ->
      """SELECT l_orderkey, l_linenumber,
           coalesce(l_quantity / nullif(l_linenumber - 1, 0), -1.0)
             AS qty_per_extra_line,
           coalesce(TRY_CAST(l_returnflag AS INT), -1) AS flag_as_int
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber, qty_per_extra_line""",
    "fn_null" ->
      """SELECT o_orderkey,
           prev_key IS NULL AS is_first,
           coalesce(prev_key, -1) AS prev_or_default,
           prev_key IS NOT DISTINCT FROM o_orderkey AS nullsafe_self,
           nullif(o_orderstatus, 'O') IS NULL AS is_open
         FROM (SELECT o_orderkey, o_orderstatus,
                 lag(o_orderkey) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderkey) AS prev_key
               FROM orders)
         ORDER BY o_orderkey""",
    "fn_hash" ->
      """SELECT doc_id, md5(text) AS text_md5,
           substring(md5(text), 1, 8) AS md5_prefix
         FROM documents ORDER BY doc_id""",
    "fn_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
           l_orderkey & l_partkey AS band,
           l_orderkey | l_partkey AS bor,
           xor(l_orderkey, l_partkey) AS bxor,
           CAST(l_linenumber AS BIGINT) << 3 AS shl,
           l_orderkey >> 2 AS shr,
           CAST(bit_count(l_partkey) AS INT) AS popcnt
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber, band, bor, bxor, shl, shr,
           popcnt""",
    // identical arithmetic through DuckDB's own struct surface
    "fn_struct" ->
      """WITH t AS (
           SELECT o_orderkey,
             {'status': o_orderstatus,
              'money': {'amount': o_totalprice,
                        'tax': o_totalprice * 0.1}} AS rec
           FROM orders)
         SELECT o_orderkey,
           rec.status AS status,
           rec.money.amount AS amount,
           rec.money.tax + rec.money.amount AS gross
         FROM t ORDER BY o_orderkey""",
    "fn_url" ->
      """SELECT doc_id,
           'https://' || source || '.example.com/docs/'
             || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url,
           source || '.example.com' AS host,
           '/docs/' || CAST(doc_id AS VARCHAR) AS path,
           lang AS lang_param
         FROM documents ORDER BY doc_id"""
  )
}
