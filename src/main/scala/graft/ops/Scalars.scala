package graft.ops

import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}

/** Scalar function families (SURVEY.md §2.4 "scalar fns"): string, date,
  * math, conditional, JSON, array/higher-order. All per-row, codegen'd
  * `functions._` — embarrassingly parallel at any scale; the only shuffle in
  * these queries is the deterministic presentation sort.
  *
  * Cross-engine determinism rules: only IEEE-exact math (abs/floor/ceil/
  * sqrt/x*x/pmod — no libm-dependent exp/ln), regex patterns restricted to
  * the Java∩RE2 common subset, DATE-typed outputs emitted as 'yyyy-MM-dd'
  * strings.
  */
object Scalars {

  def queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q139_nested_roundtrip",
      "Nested data model round trip: lineitems assembled into a per-order array<struct<line,qty,cents>> (sort_array(collect_list(struct…)) — deterministic element order), order-level stats computed ON the nested shape with higher-order functions (size, aggregate-fold over struct fields), then the array exploded back to lines and cross-checked flat. Proves the engine's nested column surface end-to-end; the oracle sees only the flat arithmetic.",
      """WITH l AS (SELECT l_orderkey,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem),
        |o AS (SELECT l_orderkey, count(*) AS n_lines,
        |        CAST(sum(qty) AS BIGINT) AS sum_qty,
        |        CAST(max(cents) AS BIGINT) AS max_line_cents
        |      FROM l GROUP BY l_orderkey)
        |SELECT CAST(n_lines AS INTEGER) AS n_lines,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(sum_qty) AS BIGINT) AS sum_qty,
        |  CAST(max(max_line_cents) AS BIGINT) AS max_line_cents
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val nested = Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          struct(col("l_linenumber").as("line"),
            col("l_quantity").cast("long").as("qty"),
            floor(col("l_extendedprice") * 100).cast("long").as("cents")).as("li"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("li"))).as("lines"))
      // order-level stats computed on the NESTED shape: size() and
      // higher-order folds over the struct array, no re-explode
      val stats = nested.select(col("l_orderkey"),
        size(col("lines")).as("n_lines"),
        aggregate(col("lines"), lit(0L), (acc, x) => acc + x("qty")).as("sum_qty"),
        aggregate(col("lines"), lit(Long.MinValue),
          (acc, x) => greatest(acc, x("cents"))).as("max_line_cents"))
      stats.groupBy(col("n_lines"))
        .agg(count(lit(1)).as("n_orders"), sum(col("sum_qty")).as("sum_qty"),
          max(col("max_line_cents")).as("max_line_cents"))
        .orderBy(col("n_lines"))
    },

    GraftQuery(
      "q23_string_funcs",
      "String family: case, length, substring, concat, pad, regexp_extract, replace, trim.",
      """SELECT c_custkey,
        |  upper(c_mktsegment) AS seg_upper,
        |  lower(c_name) AS name_lower,
        |  CAST(length(c_name) AS INTEGER) AS name_len,
        |  substring(c_name, 10, 9) AS id_part,
        |  c_name || ':' || c_mktsegment AS name_seg,
        |  lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_padded,
        |  regexp_extract(c_name, '[0-9]+') AS digits,
        |  replace(c_name, 'Customer#', 'C-') AS short_name,
        |  trim('  ' || c_mktsegment || ' ') AS trimmed
        |FROM customer
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(col("c_name")).as("name_lower"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 10, 9).as("id_part"),
        concat(col("c_name"), lit(":"), col("c_mktsegment")).as("name_seg"),
        lpad(col("c_nationkey").cast("string"), 4, "0").as("nation_padded"),
        regexp_extract(col("c_name"), "[0-9]+", 0).as("digits"),
        regexp_replace(col("c_name"), "Customer#", "C-").as("short_name"),
        trim(concat(lit("  "), col("c_mktsegment"), lit(" "))).as("trimmed"))
        .orderBy(col("c_custkey"))
    },

    GraftQuery(
      "q24_date_funcs",
      "Date/time family: extract parts, truncate, diff, interval arithmetic, last_day (dates emitted as strings for cross-engine stability).",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER)    AS yr,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |  CAST(month(o_orderdate) AS INTEGER)   AS mon,
        |  CAST(day(o_orderdate) AS INTEGER)     AS dom,
        |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_95,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  o_orderdate + INTERVAL 30 DAY AS due_ts,
        |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
        |FROM orders
        |WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 2000)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"),
          month(col("o_orderdate")).as("mon"),
          dayofmonth(col("o_orderdate")).as("dom"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since_95"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("due_ts"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"))
        .orderBy(col("o_orderkey"))
    },

    GraftQuery(
      "q25_math_funcs",
      "Math family restricted to IEEE-exact ops: abs, floor, ceil, sqrt, square, modulo, sign, greatest/least.",
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_extendedprice - 50000.0) AS abs_dev,
        |  CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
        |  CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_batches,
        |  sqrt(l_extendedprice) AS price_sqrt,
        |  l_tax * l_tax AS tax_sq,
        |  l_orderkey % 7 AS key_mod7,
        |  CAST(sign(l_extendedprice - 50000.0) AS DOUBLE) AS dev_sign,
        |  greatest(l_quantity, 25.0) AS qty_floor25,
        |  least(l_quantity, 25.0) AS qty_cap25
        |FROM lineitem
        |WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 500)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_extendedprice") - 50000.0).as("abs_dev"),
          floor(col("l_discount") * 100).cast("long").as("disc_pct"),
          ceil(col("l_quantity") / 7.0).cast("long").as("qty_batches"),
          sqrt(col("l_extendedprice")).as("price_sqrt"),
          (col("l_tax") * col("l_tax")).as("tax_sq"),
          (col("l_orderkey") % 7).as("key_mod7"),
          signum(col("l_extendedprice") - 50000.0).as("dev_sign"),
          greatest(col("l_quantity"), lit(25.0)).as("qty_floor25"),
          least(col("l_quantity"), lit(25.0)).as("qty_cap25"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    GraftQuery(
      "q26_conditional_agg",
      "CASE WHEN inside aggregates (pivot-style conditional counting) per order year.",
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |       THEN CAST(floor(o_totalprice*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS urgent_cents
        |FROM orders
        |GROUP BY yr
        |ORDER BY yr""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"),
          sum(when(col("o_orderpriority") === "1-URGENT",
            floor(col("o_totalprice") * 100).cast("long")).otherwise(0L)).as("urgent_cents"))
        .orderBy(col("yr"))
    },

    GraftQuery(
      "q27_json_funcs",
      "JSON extraction from the events.props string column (generalizes the reference's JSON ingestion, SURVEY §1.1) + aggregate over the extracted value.",
      """SELECT event_type,
        |  count(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_with_k,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  CAST(min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      val k = get_json_object(col("props"), "$.k").cast("int")
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          count(k).as("n_with_k"),
          sum(k).as("sum_k"),
          min(k).as("min_k"),
          max(k).as("max_k"))
        .orderBy(col("event_type"))
    },

    GraftQuery(
      "q28_array_funcs",
      "Array/higher-order family over tokenized documents: size, distinct, element access, containment — no UDFs, pure codegen lambdas.",
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS INTEGER) AS n_unique,
        |  toks[1] AS first_token,
        |  toks[-1] AS last_token,
        |  list_contains(toks, 'spark') AS has_spark
        |FROM t
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.functions.ColumnOps.tokens
      Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(
          col("doc_id"),
          size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_unique"),
          element_at(col("toks"), 1).as("first_token"),
          element_at(col("toks"), -1).as("last_token"),
          array_contains(col("toks"), "spark").as("has_spark"))
        .orderBy(col("doc_id"))
    },

    GraftQuery(
      "q223_variant_shredding",
      "Spark 4 VARIANT ingestion: heterogeneous JSON payloads (built in-query from orders x customer x nation so both engines shred the SAME bytes) parsed with parse_json into the binary VARIANT encoding, then shredded with typed variant_get path extraction — nested object path, typed long, and try_variant_get on an absent path proving null-not-error semantics. VARIANT beats from_json-to-wide-struct at scale because the binary encoding is parsed once at ingest and each variant_get is O(path) over the encoded tree, with no up-front schema contract for evolving payloads. Aggregated per extracted nation.",
      """WITH j AS (SELECT json_object('id', o_orderkey,
        |    'cust', json_object('nation', n_name,
        |                        'bal_cents', CAST(floor(c_acctbal * 100) AS BIGINT)),
        |    'price_cents', CAST(floor(o_totalprice * 100) AS BIGINT)) AS payload
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey)
        |SELECT json_extract_string(payload, '$.cust.nation') AS nation,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(json_extract(payload, '$.price_cents') AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  CAST(min(CAST(json_extract(payload, '$.cust.bal_cents') AS BIGINT)) AS BIGINT)
        |    AS min_bal_cents,
        |  count(json_extract_string(payload, '$.cust.segment')) AS n_with_segment
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val joined = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      val payload = to_json(struct(
        col("o_orderkey").as("id"),
        struct(col("n_name").as("nation"),
          expr("CAST(floor(c_acctbal * 100) AS BIGINT)").as("bal_cents")).as("cust"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("price_cents")))
      joined.select(parse_json(payload).as("v"))
        .select(
          variant_get(col("v"), "$.cust.nation", "string").as("nation"),
          variant_get(col("v"), "$.price_cents", "long").as("price_cents"),
          variant_get(col("v"), "$.cust.bal_cents", "long").as("bal_cents"),
          try_variant_get(col("v"), "$.cust.segment", "string").as("segment"))
        .groupBy(col("nation"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price_cents")).as("sum_price_cents"),
          min(col("bal_cents")).as("min_bal_cents"),
          count(col("segment")).as("n_with_segment"))
        .orderBy(col("nation"))
    },

    GraftQuery(
      "q228_xpath_extract",
      "XPath extraction kernels over per-row XML built in-query with to_xml (both engines therefore shred identical bytes, like q223's VARIANT twin): typed scalar paths (xpath_long/xpath_string), a repeated-element path collected as an array (xpath), and a positional predicate path (tag[1]) — the Hive-compatible XML scalar surface. Extraction is per-row and codegen-adjacent (no DOM per file, one pull parser per value), so it rides inside whole-stage pipelines; verified through per-priority aggregates of the extracted values.",
      """SELECT o_orderpriority AS prio, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
        |  CAST(2 * count(*) AS BIGINT) AS n_tags,
        |  count(DISTINCT o_orderstatus) AS n_first_tags
        |FROM orders WHERE o_orderkey % 8 = 0 GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val x = to_xml(struct(
        col("o_orderkey").as("k"),
        col("o_orderpriority").as("prio"),
        array(col("o_orderstatus"), col("o_orderpriority")).as("tag")))
      // deterministic 1/8 key slice: each XPath value costs a per-row XML
      // parse (javax.xml pull parse — no codegen), so the demo bounds its
      // input instead of DOM-parsing the whole fact table
      graft.util.Sizing.spreadKernel(
        Tables.orders(s, d)
          .filter(col("o_orderkey") % 8 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_orderpriority")),
        graft.util.Sizing.parquetRowCount(d, "orders") / 8, perTask = 10000L)
        .select(x.as("xml"))
        .select(
          expr("xpath_long(xml, '/ROW/k')").as("k"),
          expr("xpath_string(xml, '/ROW/prio')").as("prio"),
          expr("size(xpath(xml, '/ROW/tag/text()'))").cast("long").as("n_tag"),
          expr("xpath_string(xml, '/ROW/tag[1]')").as("first_tag"))
        .groupBy(col("prio"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_keys"),
          sum(col("n_tag")).as("n_tags"),
          countDistinct(col("first_tag")).as("n_first_tags"))
        .orderBy(col("prio"))
    },

    GraftQuery(
      "q230_aes_tokenization",
      "Deterministic PII tokenization with Spark's native aes_encrypt/aes_decrypt (AES-128-ECB + PKCS padding — ECB chosen precisely BECAUSE it is deterministic: equal plaintexts get equal tokens, so the token column still joins and count-distincts like the original; GCM's random IV would break that). Proves token cardinality preserves name cardinality and the decrypt round trip is lossless, per nation. The oracle sees only plaintext arithmetic — the crypto is Spark-side, verified by its observable invariants (q81's HMAC doctrine, made oracle-checkable).",
      """SELECT c_nationkey, count(*) AS n,
        |  count(DISTINCT c_name) AS n_tokens,
        |  count(*) AS n_roundtrip_ok
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, d) =>
      // 16-byte key -> AES-128; base64 of the ciphertext is the join/count
      // friendly token representation
      val tok = expr("base64(aes_encrypt(c_name, 'graft-aes-key-16', 'ECB', 'PKCS'))")
      Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_name"), tok.as("token"))
        .withColumn("token_bin", expr("unbase64(token)"))
        .withColumn("plain",
          expr("CAST(aes_decrypt(token_bin, 'graft-aes-key-16', 'ECB', 'PKCS') AS STRING)"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("token")).as("n_tokens"),
          sum(when(col("plain") === col("c_name"), 1L).otherwise(0L))
            .as("n_roundtrip_ok"))
        .orderBy(col("c_nationkey"))
    },

    GraftQuery(
      "q233_collated_grouping",
      "Spark 4 collations: a mixed-case column (case flipped by key parity in-query) grouped under the UTF8_LCASE collation — the ENGINE's hash aggregate treats case variants as one key, no lower() rewrite in the grouping expression. That matters at scale: collation-aware grouping/joins keep the original bytes (no materialized normalized copy of a 100 TB string column) and the collation travels in the type, so every downstream comparison inherits it. Output key is normalized explicitly (the engine may surface either variant as the representative); binary distinct count per group proves both variants were really merged.",
      """WITH m AS (SELECT CASE WHEN o_orderkey % 2 = 0
        |      THEN upper(o_orderpriority) ELSE lower(o_orderpriority) END AS mixed
        |  FROM orders)
        |SELECT lower(mixed) AS prio, count(*) AS n,
        |  count(DISTINCT mixed) AS n_case_variants
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val mixed = when(col("o_orderkey") % 2 === 0, upper(col("o_orderpriority")))
        .otherwise(lower(col("o_orderpriority")))
      // two-level distinct decomposition: grouping FIRST on (ci-key,
      // binary variant) collapses the corpus to |prios|×|variants| rows in
      // the map-side partial aggregate, and the variant census is a count
      // over that tiny frame. countDistinct would instead Expand the scan
      // and ship every row to the (5-key) final aggregate — the collated
      // hash is also ~3x a binary hash per row, so paying it on partials
      // only matters (measured 13.5x per decade before).
      Tables.orders(s, d)
        .select(mixed.as("mixed"))
        .groupBy(collate(col("mixed"), "UTF8_LCASE").as("prio_ci"),
          collate(col("mixed"), "UTF8_BINARY").as("mv"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("prio_ci"))
        .agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_case_variants"))
        .select(lower(col("prio_ci")).cast("string").as("prio"),
          col("n"), col("n_case_variants"))
        .orderBy(col("prio"))
    },

    GraftQuery(
      "q245_try_semantics",
      "ANSI error-safe try_* surface — the difference between 'one malformed row NULLs out' and 'hour ten of a 100 TB job throws': try_cast over a mostly-clean corpus with garbage/empty strings on witness slices, try_add at Long.MaxValue on a k%1024 witness slice (overflow -> NULL, never a wrapped wrong number — and the k=0 row proves valid sums pass through), try_element_at on out-of-range indices (NULL without exception by construction). The malformed witnesses are SLICES, not thirds of the corpus: under ANSI each malformed row is a thrown-and-caught exception inside TryEval (~38us of stack fill-in), so a garbage-heavy fixture would measure JVM exception cost, not try-semantics throughput — exactly the production mix, where bad rows are rare. The oracle mirrors each rule with TRY_CAST / the same sliced CASE / native OOB-NULL list access.",
      """WITH r AS (SELECT o_orderpriority AS prio, o_orderkey AS k,
        |    CASE WHEN o_orderkey % 512 = 1 THEN 'x' || CAST(o_orderkey AS VARCHAR)
        |         WHEN o_orderkey % 512 = 2 THEN ''
        |         ELSE CAST(o_orderkey AS VARCHAR) END AS s
        |  FROM orders),
        |t AS (SELECT prio, k,
        |    TRY_CAST(s AS BIGINT) AS parsed,
        |    CASE WHEN k % 1024 = 0 AND k = 0 THEN 9223372036854775807 END AS add_over,
        |    ([k % 2, k % 3])[CAST(k % 4 + 1 AS INTEGER)] AS elem
        |  FROM r)
        |SELECT prio, count(*) AS n,
        |  count(parsed) AS n_parsed,
        |  CAST(sum(coalesce(parsed, 0)) AS BIGINT) AS sum_parsed,
        |  count(add_over) AS n_overflow_ok,
        |  count(elem) AS n_elem,
        |  CAST(sum(coalesce(elem, -1)) AS BIGINT) AS sum_elem
        |FROM t GROUP BY prio ORDER BY prio""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderpriority").as("prio"), col("o_orderkey").as("k"),
          when(col("o_orderkey") % 512 === 1,
            concat(lit("x"), col("o_orderkey").cast("string")))
            .when(col("o_orderkey") % 512 === 2, lit(""))
            .otherwise(col("o_orderkey").cast("string")).as("s"))
        .select(col("prio"), col("k"),
          expr("try_cast(s AS BIGINT)").as("parsed"),
          // overflow witness sliced to k%1024==0 (~150 rows at sf0.1): the
          // try_add NULL-on-overflow path is still exercised, but the query's
          // runtime measures try-semantics throughput instead of ~150k
          // fill-in-stack-trace exceptions (measured ~38us each)
          when(col("k") % 1024 === 0, expr(s"try_add(${Long.MaxValue}L, k)"))
            .as("add_over"),
          expr("try_element_at(array(k % 2, k % 3), CAST(k % 4 + 1 AS INT))").as("elem"))
        .groupBy(col("prio"))
        .agg(count(lit(1)).as("n"),
          count(col("parsed")).as("n_parsed"),
          sum(coalesce(col("parsed"), lit(0L))).as("sum_parsed"),
          count(col("add_over")).as("n_overflow_ok"),
          count(col("elem")).as("n_elem"),
          sum(coalesce(col("elem"), lit(-1L))).as("sum_elem"))
        .orderBy(col("prio"))
    }
  )
}
