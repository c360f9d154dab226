package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scalar function families (SURVEY.md §2.8 F1–F8): strings, dates, math,
  * arrays (incl. higher-order functions over embeddings), hashing, structs.
  * All are Catalyst built-ins — codegen'd, no UDFs — so every query here
  * stays inside whole-stage codegen.
  */
object FunctionQueries extends QueryPack {

  override def queries: Map[String, Query] = Map(
    // -- F1 strings.
    "f01_strings" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer.select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        lower(col("c_mktsegment")).as("seg_lower"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        length(col("c_name")).cast("long").as("name_len"),
        concat_ws("/", col("c_mktsegment"), col("c_name")).as("seg_name"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("key_digits"),
        reverse(col("c_mktsegment")).as("seg_rev"),
        replace(col("c_name"), lit("Customer"), lit("Cust")).as("name_short"),
        trim(lit("  pad  ")).as("trimmed")
      )
    },

    // -- F2 dates.
    "f02_dates" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders.select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        (dayofweek(col("o_orderdate")) - 1).as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"),
        datediff(lit(java.sql.Date.valueOf("2002-01-01")), col("o_orderdate")).cast("long").as("days_to_2002")
      )
    },

    // -- F3 math.
    "f03_math" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem.select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 1).as("price_r1"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        // sqrt is IEEE-exact (correctly rounded in both engines); ln/pow are
        // libm calls whose last ulps differ per engine → rounded both sides
        sqrt(col("l_quantity")).as("qty_sqrt"),
        round(log(col("l_extendedprice")), 6).as("price_ln"),
        round(pow(col("l_tax"), 2), 6).as("tax_sq"),
        signum(col("l_discount") - 0.05).as("disc_sign"),
        greatest(col("l_quantity"), col("l_tax") * 100).as("g"),
        least(col("l_quantity"), col("l_tax") * 100).as("l"),
        (col("l_orderkey") % 7).as("key_mod")
      )
    },

    // -- F4 arrays + higher-order functions over embeddings: length, slice,
    //    element access, L2 norm via transform+aggregate (all codegen'd).
    "f04_arrays" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.embeddings.select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_component"),
        round(aggregate(
          transform(slice(col("embedding"), 1, 8), x => x.cast("double")),
          lit(0.0), (acc, x) => acc + x
        ), 6).as("head8_sum"),
        round(sqrt(aggregate(
          transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x
        )), 6).as("l2_norm")
      )
    },

    // -- F7 hashing (md5/sha2 are cross-engine comparable; xxhash64 is
    //    Spark-native and covered in the dedup pack's rows-only queries).
    "f05_hash" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.documents.select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("text_md5"),
        sha2(col("text").cast("binary"), 256).as("text_sha256"),
        length(col("text")).cast("long").as("text_len")
      )
    },

    // -- F1 extended strings: edit distance, positional ops, formatting.
    "f08_strings_extended" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.nation.crossJoin(t.region).select(
        col("n_name"), col("r_name"),
        levenshtein(col("n_name"), col("r_name")).as("edit_dist"),
        ascii(col("n_name")).as("first_char_code"),
        instr(col("n_name"), "A").cast("long").as("a_pos"),
        repeat(lit("-"), 3).as("dashes"),
        format_string("%s/%s", col("r_name"), col("n_name")).as("qualified"),
        translate(col("n_name"), "AEIOU", "aeiou").as("vowels_lower")
      )
    },

    // -- F3 extended math: trig, log bases, exponents.
    "f09_math_extended" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      // all libm functions — rounded identically on both sides (last-ulp
      // results differ between JVM and C library implementations)
      t.supplier.select(
        col("s_suppkey"),
        round(sin(col("s_acctbal") / 1000.0), 6).as("sin_bal"),
        round(cos(col("s_acctbal") / 1000.0), 6).as("cos_bal"),
        round(atan2(col("s_acctbal"), lit(100.0)), 6).as("angle"),
        round(log(2.0, col("s_acctbal") + 10000.0), 6).as("log2_bal"),
        round(log10(col("s_acctbal") + 10000.0), 6).as("log10_bal"),
        round(exp(col("s_acctbal") / 10000.0), 6).as("exp_bal"),
        round(cbrt(col("s_acctbal") + 10000.0), 6).as("cbrt_bal")
      )
    },

    // -- F1/F2 gap-closers: case-insensitive LIKE and fractional month
    //    arithmetic (both operands truncated to month starts, so the result
    //    is an exact integer count of months on both engines).
    "f10_ilike_months" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders.select(
        col("o_orderkey"),
        col("o_orderpriority").ilike("%URGent%").as("is_urgent"),
        months_between(
          lit(java.sql.Timestamp.valueOf("2002-01-01 00:00:00")),
          date_trunc("month", col("o_orderdate"))).as("months_to_2002")
      )
    },

    // -- F6 generator form: json_tuple over the props column.
    "f11_json_tuple" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.events
        .select(col("event_id"), json_tuple(col("props"), "k").as(Seq("k_str")))
        .groupBy(col("k_str")).agg(count(lit(1)).as("n"))
    },

    // -- F8 structs: build, nest, extract (FHIR-style nesting in miniature).
    "f06_structs" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer
        .withColumn("account", struct(col("c_acctbal").as("balance"), col("c_mktsegment").as("segment")))
        .withColumn("profile", struct(col("c_name").as("name"), col("account")))
        .select(
          col("c_custkey"),
          col("profile.account.balance").as("balance"),
          col("profile.account.segment").as("segment"),
          col("profile.name").as("name")
        )
    },

    // -- X3 generator: explode the embedding array to (vec_id, pos, component)
    //    rows, then re-aggregate. Exercises posexplode + the F4 family.
    "f07_explode" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.embeddings
        .filter(col("vec_id") < 10)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "component")))
        .filter(col("pos") < 4)
        .select(col("vec_id"), col("pos"), col("component").cast("double").as("component"))
    }
  )

  override def oracles: Map[String, String] = Map(
    "f01_strings" ->
      """SELECT c_custkey,
        |  upper(c_name) AS name_upper,
        |  lower(c_mktsegment) AS seg_lower,
        |  substring(c_name, 1, 8) AS name_prefix,
        |  length(c_name) AS name_len,
        |  concat_ws('/', c_mktsegment, c_name) AS seg_name,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS key_digits,
        |  reverse(c_mktsegment) AS seg_rev,
        |  replace(c_name, 'Customer', 'Cust') AS name_short,
        |  trim('  pad  ') AS trimmed
        |FROM customer""".stripMargin,
    "f02_dates" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(dayofmonth(o_orderdate) AS INT) AS dom,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  CAST(dayofweek(o_orderdate) AS INT) AS dow,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  o_orderdate + INTERVAL 30 DAY AS due_date,
        |  date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_2002
        |FROM orders""".stripMargin,
    "f03_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice, 1) AS price_r1,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  abs(l_discount - 0.05) AS disc_dev,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  round(ln(l_extendedprice), 6) AS price_ln,
        |  round(power(l_tax, 2), 6) AS tax_sq,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
        |  greatest(l_quantity, l_tax * 100) AS g,
        |  least(l_quantity, l_tax * 100) AS l,
        |  l_orderkey % 7 AS key_mod
        |FROM lineitem""".stripMargin,
    "f04_arrays" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_component,
        |  round(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), 6) AS head8_sum,
        |  round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
        |FROM embeddings""".stripMargin,
    "f05_hash" ->
      """SELECT doc_id,
        |  md5(text) AS text_md5,
        |  sha256(text) AS text_sha256,
        |  length(text) AS text_len
        |FROM documents""".stripMargin,
    "f06_structs" ->
      """SELECT c_custkey, c_acctbal AS balance, c_mktsegment AS segment, c_name AS name
        |FROM customer""".stripMargin,
    "f08_strings_extended" ->
      """SELECT n_name, r_name,
        |  CAST(levenshtein(n_name, r_name) AS INT) AS edit_dist,
        |  CAST(ascii(n_name) AS INT) AS first_char_code,
        |  strpos(n_name, 'A') AS a_pos,
        |  repeat('-', 3) AS dashes,
        |  printf('%s/%s', r_name, n_name) AS qualified,
        |  translate(n_name, 'AEIOU', 'aeiou') AS vowels_lower
        |FROM nation CROSS JOIN region""".stripMargin,
    "f09_math_extended" ->
      """SELECT s_suppkey,
        |  round(sin(s_acctbal / 1000.0), 6) AS sin_bal,
        |  round(cos(s_acctbal / 1000.0), 6) AS cos_bal,
        |  round(atan2(s_acctbal, 100.0), 6) AS angle,
        |  round(ln(s_acctbal + 10000.0) / ln(2.0), 6) AS log2_bal,
        |  round(log10(s_acctbal + 10000.0), 6) AS log10_bal,
        |  round(exp(s_acctbal / 10000.0), 6) AS exp_bal,
        |  round(cbrt(s_acctbal + 10000.0), 6) AS cbrt_bal
        |FROM supplier""".stripMargin,
    "f10_ilike_months" ->
      """SELECT o_orderkey,
        |  o_orderpriority ILIKE '%URGent%' AS is_urgent,
        |  CAST((2002 - year(o_orderdate)) * 12 + (1 - month(o_orderdate)) AS DOUBLE)
        |    AS months_to_2002
        |FROM orders""".stripMargin,
    "f11_json_tuple" ->
      """SELECT json_extract_string(props, '$.k') AS k_str, count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "f07_explode" ->
      """SELECT vec_id, CAST(u.pos - 1 AS INT) AS pos, CAST(u.component AS DOUBLE) AS component
        |FROM (
        |  SELECT vec_id, unnest(embedding) AS component,
        |    generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings WHERE vec_id < 10) u
        |WHERE u.pos - 1 < 4""".stripMargin
  )
}
