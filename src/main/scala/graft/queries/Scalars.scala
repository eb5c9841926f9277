package graft.queries

import org.apache.spark.sql.functions._
import QueryDSL._

/** Scalar function families — SURVEY.md §2b "Scalar function families". One query per
  * family, each exercising the declared functions with outputs normalized to
  * engine-portable scalars. Everything here is whole-stage-codegen'd by Catalyst (no
  * UDFs in these paths). Transcendental results are rounded to 9 digits (libm last-ulp
  * differences across engines); integer/exact paths are compared raw. */
object Scalars {

  val queries: Seq[Q] = Seq(
    Q("fn_string_basic",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part").filter($"p_partkey" <= 500)
          .select($"p_partkey",
            concat($"p_brand", lit("#"), $"p_type").as("tagged"),
            concat_ws("/", $"p_brand", $"p_name").as("pathy"),
            upper($"p_name").as("up"),
            lower($"p_type").as("lo"),
            substring($"p_name", 1, 5).as("pre5"),
            length($"p_name").as("len"),
            regexp_replace($"p_name", "a", "@").as("subst"),
            lpad($"p_brand", 12, "*").as("lp"),
            rpad($"p_brand", 12, "*").as("rp"),
            reverse($"p_brand").as("rev"),
            trim(concat(lit("  "), $"p_brand", lit("  "))).as("trimmed"),
            ltrim(concat(lit("xx"), $"p_brand"), "x").as("ltrimmed"),
            instr($"p_name", "a").as("pos_a"),
            $"p_name".startsWith("a").as("starts_a"),
            $"p_name".endsWith("e").as("ends_e"),
            $"p_name".contains("ro").as("has_ro"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
             |  p_brand || '#' || p_type AS tagged,
             |  concat_ws('/', p_brand, p_name) AS pathy,
             |  upper(p_name) AS up, lower(p_type) AS lo,
             |  substring(p_name, 1, 5) AS pre5, length(p_name) AS len,
             |  replace(p_name, 'a', '@') AS subst,
             |  lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '*') AS rp,
             |  reverse(p_brand) AS rev,
             |  trim('  ' || p_brand || '  ') AS trimmed,
             |  ltrim('xx' || p_brand, 'x') AS ltrimmed,
             |  instr(p_name, 'a') AS pos_a,
             |  starts_with(p_name, 'a') AS starts_a,
             |  ends_with(p_name, 'e') AS ends_e,
             |  contains(p_name, 'ro') AS has_ro
             |FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""".stripMargin)),

    Q("fn_string_regex",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer").filter($"c_custkey" <= 500)
          .select($"c_custkey",
            split_part($"c_name", lit("#"), lit(1)).as("name_head"),
            element_at(split($"c_name", "#"), -1).as("name_tail"),
            regexp_extract($"c_name", "(\\d+)", 1).as("digits"),
            regexp_replace($"c_name", "[0-9]", "#").as("masked"),
            $"c_name".rlike("[0-9]{3}").as("has3digits"),
            translate($"c_mktsegment", "AEIOU", "aeiou").as("translated"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey,
             |  split_part(c_name, '#', 1) AS name_head,
             |  list_extract(string_split(c_name, '#'), len(string_split(c_name, '#'))) AS name_tail,
             |  coalesce(regexp_extract(c_name, '([0-9]+)', 1), '') AS digits,
             |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
             |  regexp_matches(c_name, '[0-9]{3}') AS has3digits,
             |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated
             |FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey""".stripMargin)),

    Q("fn_datetime",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").filter($"o_orderkey" <= 1000)
          .select($"o_orderkey",
            year($"o_orderdate").as("yr"),
            month($"o_orderdate").as("mo"),
            dayofmonth($"o_orderdate").as("dom"),
            weekday($"o_orderdate").as("wd_mon0"),
            date_trunc("month", $"o_orderdate").as("month_start"),
            date_add($"o_orderdate".cast("date"), 30).as("due_date"),
            date_sub($"o_orderdate".cast("date"), 7).as("week_before"),
            datediff(lit("1999-01-01").cast("date"), $"o_orderdate".cast("date"))
              .as("days_to_1999"),
            unix_timestamp($"o_orderdate").as("epoch_s"),
            date_format($"o_orderdate", "yyyy-MM").as("ym"),
            (year($"o_orderdate") * 12 + month($"o_orderdate") -
              (lit(1995) * 12 + 6)).as("months_since_jun95"),
            to_date(lit("1997-07-01"), "yyyy-MM-dd").as("fixed_date"),
            quarter($"o_orderdate").as("qtr"),
            dayofyear($"o_orderdate").as("doy"),
            last_day($"o_orderdate".cast("date")).as("eom"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  year(o_orderdate) AS yr, month(o_orderdate) AS mo,
             |  day(o_orderdate) AS dom,
             |  isodow(o_orderdate) - 1 AS wd_mon0,
             |  date_trunc('month', o_orderdate) AS month_start,
             |  CAST(o_orderdate AS DATE) + 30 AS due_date,
             |  CAST(o_orderdate AS DATE) - 7 AS week_before,
             |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS days_to_1999,
             |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
             |  strftime(o_orderdate, '%Y-%m') AS ym,
             |  year(o_orderdate) * 12 + month(o_orderdate) - (1995 * 12 + 6) AS months_since_jun95,
             |  DATE '1997-07-01' AS fixed_date,
             |  quarter(o_orderdate) AS qtr,
             |  dayofyear(o_orderdate) AS doy,
             |  last_day(CAST(o_orderdate AS DATE)) AS eom
             |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin)),

    Q("fn_math",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").filter($"l_orderkey" <= 200)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount",
            abs($"l_quantity" - 25).as("abs_dev"),
            ceil($"l_quantity" / 7).as("ceil7"),
            floor($"l_quantity" / 7).as("floor7"),
            round($"l_quantity" * $"l_discount", 3).as("rounded"),
            sqrt($"l_quantity").as("sq"),
            round(exp($"l_discount"), 9).as("e_disc"),
            round(ln($"l_quantity" + 1), 9).as("ln_qty"),
            round(log10($"l_extendedprice"), 9).as("log_price"),
            round(pow($"l_quantity", 1.5), 6).as("qty15"),
            signum($"l_quantity" - 25).as("sgn"),
            pmod($"l_orderkey" - 3, lit(7)).as("pm7"),
            greatest($"l_quantity", $"l_discount" * 100, lit(5.0)).as("big"),
            least($"l_quantity", $"l_tax" * 100).as("small"))
          .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount",
            $"abs_dev", $"rounded")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
             |  abs(l_quantity - 25) AS abs_dev,
             |  CAST(ceil(l_quantity / 7) AS BIGINT) AS ceil7,
             |  CAST(floor(l_quantity / 7) AS BIGINT) AS floor7,
             |  round(l_quantity * l_discount, 3) AS rounded,
             |  sqrt(l_quantity) AS sq,
             |  round(exp(l_discount), 9) AS e_disc,
             |  round(ln(l_quantity + 1), 9) AS ln_qty,
             |  round(log10(l_extendedprice), 9) AS log_price,
             |  round(pow(l_quantity, 1.5), 6) AS qty15,
             |  CAST(sign(l_quantity - 25) AS DOUBLE) AS sgn,
             |  ((l_orderkey - 3) % 7 + 7) % 7 AS pm7,
             |  greatest(l_quantity, l_discount * 100, 5.0) AS big,
             |  least(l_quantity, l_tax * 100) AS small
             |FROM lineitem WHERE l_orderkey <= 200
             |ORDER BY 1, 2, 3, 4, 5, 8""".stripMargin)),

    Q("fn_trig",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").filter($"l_orderkey" <= 200)
          .select($"l_orderkey", $"l_linenumber", $"l_discount", $"l_tax",
            round(sin($"l_discount"), 9).as("sin_d"),
            round(cos($"l_discount"), 9).as("cos_d"),
            round(tan($"l_discount"), 9).as("tan_d"),
            round(atan($"l_tax"), 9).as("atan_t"),
            round(atan2($"l_discount", $"l_tax" + 0.01), 9).as("atan2_dt"),
            round(degrees($"l_discount"), 9).as("deg_d"),
            round(radians($"l_tax"), 9).as("rad_t"),
            round(sinh($"l_discount"), 9).as("sinh_d"),
            round(cosh($"l_discount"), 9).as("cosh_d"),
            round(tanh($"l_discount"), 9).as("tanh_d"))
          .orderBy($"l_orderkey", $"l_linenumber", $"l_discount", $"l_tax")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_discount, l_tax,
             |  round(sin(l_discount), 9) AS sin_d,
             |  round(cos(l_discount), 9) AS cos_d,
             |  round(tan(l_discount), 9) AS tan_d,
             |  round(atan(l_tax), 9) AS atan_t,
             |  round(atan2(l_discount, l_tax + 0.01), 9) AS atan2_dt,
             |  round(degrees(l_discount), 9) AS deg_d,
             |  round(radians(l_tax), 9) AS rad_t,
             |  round((exp(l_discount) - exp(-l_discount)) / 2, 9) AS sinh_d,
             |  round((exp(l_discount) + exp(-l_discount)) / 2, 9) AS cosh_d,
             |  round((exp(2*l_discount) - 1) / (exp(2*l_discount) + 1), 9) AS tanh_d
             |FROM lineitem WHERE l_orderkey <= 200
             |ORDER BY 1, 2, 3, 4""".stripMargin)),

    Q("fn_bitwise",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").filter($"l_orderkey" <= 300)
          .select($"l_orderkey", $"l_linenumber",
            $"l_orderkey".bitwiseAND(lit(255)).as("and255"),
            $"l_orderkey".bitwiseOR(lit(16)).as("or16"),
            $"l_orderkey".bitwiseXOR($"l_linenumber").as("xor_ln"),
            shiftleft($"l_linenumber", 3).as("shl3"),
            shiftright($"l_orderkey", 2).as("shr2"),
            bit_count($"l_orderkey").as("popcnt"),
            bitwise_not($"l_orderkey").as("flipped"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_orderkey & 255 AS and255,
             |  l_orderkey | 16 AS or16,
             |  xor(l_orderkey, l_linenumber) AS xor_ln,
             |  l_linenumber << 3 AS shl3,
             |  l_orderkey >> 2 AS shr2,
             |  bit_count(l_orderkey) AS popcnt,
             |  ~l_orderkey AS flipped
             |FROM lineitem WHERE l_orderkey <= 300
             |ORDER BY 1, 2""".stripMargin)),

    Q("fn_conditional",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer").filter($"c_custkey" <= 500)
          .select($"c_custkey",
            coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("DEFAULT"))
              .as("seg_or_default"),
            nvl(nullif($"c_name", $"c_name"), lit("anon")).as("nvl_name"),
            when($"c_acctbal" < 0, "overdrawn")
              .when($"c_acctbal" < 5000, "normal")
              .otherwise("premium").as("tier"),
            isnan($"c_acctbal" / nullif($"c_acctbal", $"c_acctbal")).as("nan_check"),
            ($"c_acctbal" > 0 && $"c_nationkey" < 10).as("pred_and"),
            ifnull(nullif($"c_nationkey", lit(5)), lit(-1)).as("nk_not5"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey,
             |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_or_default,
             |  coalesce(nullif(c_name, c_name), 'anon') AS nvl_name,
             |  CASE WHEN c_acctbal < 0 THEN 'overdrawn'
             |       WHEN c_acctbal < 5000 THEN 'normal'
             |       ELSE 'premium' END AS tier,
             |  coalesce(isnan(c_acctbal / nullif(c_acctbal, c_acctbal)), FALSE) AS nan_check,
             |  c_acctbal > 0 AND c_nationkey < 10 AS pred_and,
             |  coalesce(nullif(c_nationkey, 5), -1) AS nk_not5
             |FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey""".stripMargin)),

    Q("fn_array",
      (s, dir) => {
        import s.implicits._
        val toks = split($"p_name", " ")
        t(s, dir, "part").filter($"p_partkey" <= 500)
          .select($"p_partkey",
            size(toks).cast("long").as("n_tokens"),
            concat_ws(",", array_sort(array_distinct(toks))).as("sorted_tokens"),
            concat_ws(",", slice(toks, 1, 2)).as("first2"),
            element_at(toks, 1).as("tok1"),
            array_contains(toks, "green").as("has_green"),
            concat_ws(",", array(lit("x"), $"p_brand", $"p_type")).as("built"),
            aggregate(
              filter(transform(toks, x => length(x)), l => l > 3),
              lit(0L), (acc, x) => acc + x).as("len_sum_gt3"),
            concat_ws(",", flatten(array(slice(toks, 1, 1), slice(toks, 1, 1))))
              .as("flat_dup"))
          .orderBy($"p_partkey")
      },
      Some("""WITH toks AS (
             |  SELECT p_partkey, p_brand, p_type, string_split(p_name, ' ') AS tk
             |  FROM part WHERE p_partkey <= 500)
             |SELECT p_partkey,
             |  len(tk) AS n_tokens,
             |  array_to_string(list_sort(list_distinct(tk)), ',') AS sorted_tokens,
             |  array_to_string(tk[1:2], ',') AS first2,
             |  tk[1] AS tok1,
             |  list_contains(tk, 'green') AS has_green,
             |  array_to_string(['x', p_brand, p_type], ',') AS built,
             |  CAST(coalesce(list_sum(list_filter(list_transform(tk, x -> length(x)),
             |    l -> l > 3)), 0) AS BIGINT) AS len_sum_gt3,
             |  array_to_string(flatten([tk[1:1], tk[1:1]]), ',') AS flat_dup
             |FROM toks ORDER BY p_partkey""".stripMargin)),

    Q("fn_explode",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part").filter($"p_partkey" <= 300)
          .select($"p_partkey", posexplode(split($"p_type", " ")).as(Seq("pos", "word")))
          .orderBy($"p_partkey", $"pos", $"word")
      },
      Some("""SELECT p_partkey, CAST(u.pos - 1 AS INT) AS pos, u.word
             |FROM (SELECT p_partkey,
             |        unnest(string_split(p_type, ' ')) AS word,
             |        generate_subscripts(string_split(p_type, ' '), 1) AS pos
             |      FROM part WHERE p_partkey <= 300) u
             |ORDER BY 1, 2, 3""".stripMargin)),

    // explode_outer/posexplode_outer: rows with an EMPTY filtered array must survive
    // with NULL pos/word (plain explode would drop them). DuckDB has no outer unnest,
    // so the oracle pads empty lists with [NULL] before unnesting and nulls the pos.
    Q("fn_explode_outer",
      (s, dir) => {
        import s.implicits._
        val sToks = filter(split($"p_name", " "), w => w.startsWith("s"))
        t(s, dir, "part").filter($"p_partkey" <= 300)
          .select($"p_partkey", posexplode_outer(sToks).as(Seq("pos", "word")))
          .orderBy($"p_partkey", $"pos".asc_nulls_first, $"word".asc_nulls_first)
      },
      Some("""WITH arrs AS (
             |  SELECT p_partkey,
             |    list_filter(string_split(p_name, ' '), w -> w LIKE 's%') AS arr
             |  FROM part WHERE p_partkey <= 300),
             |padded AS (
             |  SELECT p_partkey,
             |    CASE WHEN len(arr) = 0 THEN [CAST(NULL AS VARCHAR)] ELSE arr END AS arr
             |  FROM arrs)
             |SELECT p_partkey,
             |  CASE WHEN u.word IS NULL THEN NULL
             |       ELSE CAST(u.pos - 1 AS INT) END AS pos,
             |  u.word
             |FROM (SELECT p_partkey, unnest(arr) AS word,
             |        generate_subscripts(arr, 1) AS pos
             |      FROM padded) u
             |ORDER BY 1, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin)),

    Q("fn_map",
      (s, dir) => {
        import s.implicits._
        val m = map(lit("brand"), $"p_brand", lit("type"), $"p_type")
        t(s, dir, "part").filter($"p_partkey" <= 300)
          .select($"p_partkey",
            concat_ws(",", map_keys(m)).as("mkeys"),
            concat_ws(",", map_values(m)).as("mvals"),
            element_at(m, "brand").as("brand_val"),
            size(m).as("msize"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
             |  'brand,type' AS mkeys,
             |  p_brand || ',' || p_type AS mvals,
             |  p_brand AS brand_val,
             |  2 AS msize
             |FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""".stripMargin)),

    Q("fn_cast_matrix",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").filter($"l_orderkey" <= 100)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity",
            $"l_quantity".cast("int").as("qty_int"),
            $"l_quantity".cast("string").as("qty_str"),
            $"l_orderkey".cast("double").as("key_dbl"),
            $"l_orderkey".cast("string").as("key_str"),
            ($"l_quantity" > 25).cast("int").as("big_flag"),
            $"l_extendedprice".cast("decimal(18,2)").cast("string").as("price_dec_str"),
            lit("123").cast("long").as("parsed_int"),
            lit("4.5").cast("double").as("parsed_dbl"),
            expr("try_cast('notanum' AS int)").isNull.as("bad_cast_null"),
            lit("1996-03-05").cast("date").as("parsed_date"),
            lit("1996-03-05 12:30:00").cast("timestamp").as("parsed_ts"),
            $"l_shipdate".cast("date").as("ship_day"),
            unix_timestamp($"l_shipdate").as("ship_epoch"))
          .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity", $"ship_epoch")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
             |  CAST(trunc(l_quantity) AS INT) AS qty_int,
             |  CAST(l_quantity AS VARCHAR) AS qty_str,
             |  CAST(l_orderkey AS DOUBLE) AS key_dbl,
             |  CAST(l_orderkey AS VARCHAR) AS key_str,
             |  CAST(l_quantity > 25 AS INT) AS big_flag,
             |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec_str,
             |  CAST('123' AS BIGINT) AS parsed_int,
             |  CAST('4.5' AS DOUBLE) AS parsed_dbl,
             |  TRY_CAST('notanum' AS INT) IS NULL AS bad_cast_null,
             |  DATE '1996-03-05' AS parsed_date,
             |  TIMESTAMP '1996-03-05 12:30:00' AS parsed_ts,
             |  CAST(l_shipdate AS DATE) AS ship_day,
             |  CAST(epoch(l_shipdate) AS BIGINT) AS ship_epoch
             |FROM lineitem WHERE l_orderkey <= 100
             |ORDER BY 1, 2, 3, ship_epoch""".stripMargin)),

    // inline: the array-of-structs generator (one input row → one output row per
    // struct, struct fields become columns). Here each lineitem fans out to tagged
    // (measure, value) rows — the unpivot-via-generator idiom.
    Q("fn_inline_structs",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").filter($"l_orderkey" <= 50)
          .select($"l_orderkey", $"l_linenumber",
            inline(array(
              struct(lit("price").as("tag"), $"l_extendedprice".as("val")),
              struct(lit("qty").as("tag"), $"l_quantity".as("val")))))
          // (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem —
          // val is the final tiebreaker to make the order total
          .orderBy($"l_orderkey", $"l_linenumber", $"tag", $"val")
      },
      Some("""SELECT l_orderkey, l_linenumber, u.tag AS tag, u.val AS val
             |FROM (
             |  SELECT l_orderkey, l_linenumber,
             |    unnest([{'tag': 'price', 'val': l_extendedprice},
             |            {'tag': 'qty',   'val': l_quantity}]) AS u
             |  FROM lineitem WHERE l_orderkey <= 50)
             |ORDER BY 1, 2, 3, 4""".stripMargin)),

    // array_sort with a COMPARATOR LAMBDA (not natural order): tokens ordered by
    // (length, lexicographic). The DuckDB oracle emulates the same order with a
    // padded sort key, proving the comparator semantics; Spark runs the real
    // three-way comparator inside codegen.
    Q("fn_array_sort_lambda",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents").filter($"doc_id" < 200)
          .select($"doc_id",
            graft.llm.TextFunctions.tokens($"text").as("tk"))
          .select($"doc_id",
            array_join(slice(expr(
              """array_sort(tk, (l, r) -> CASE
                |  WHEN length(l) < length(r) THEN -1
                |  WHEN length(l) > length(r) THEN 1
                |  WHEN l < r THEN -1 WHEN l > r THEN 1 ELSE 0 END)""".stripMargin),
              1, 5), " ").as("first5"))
          .orderBy($"doc_id")
      },
      Some(s"""SELECT doc_id,
              |  array_to_string(
              |    list_transform(
              |      list_sort(list_transform(${duckToksInline},
              |        t -> lpad(CAST(length(t) AS VARCHAR), 4, '0') || t))[1:5],
              |      x -> x[5:]), ' ') AS first5
              |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin)),

    // ANSI-safe try_* family: Spark 4 runs under ANSI mode, where bad casts,
    // division by zero, and out-of-bounds element access are ERRORS; the try_
    // variants give per-row NULL-on-failure semantics — the right behavior for a
    // 100 TB ingest where one malformed record must not kill a stage. Mixed
    // good/bad inputs are constructed so every column exercises both paths.
    Q("fn_try_errors",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part").filter($"p_partkey" <= 300)
          .select($"p_partkey",
            expr("""CASE WHEN p_size % 3 = 0 THEN CAST(p_size AS STRING)
                   |     ELSE p_type END""".stripMargin).as("istr"),
            expr("""CASE WHEN p_size % 2 = 0
                   |     THEN concat('2024-0', CAST(p_size % 9 + 1 AS STRING), '-15')
                   |     ELSE 'not-a-date' END""".stripMargin).as("dstr"),
            $"p_retailprice", ($"p_size" % 4).as("den"),
            split($"p_name", " ").as("words"))
          .select($"p_partkey",
            expr("try_cast(istr AS INT)").as("parsed_int"),
            try_divide($"p_retailprice", $"den").as("safe_div"),
            expr("try_to_timestamp(dstr)").as("parsed_ts"),
            try_element_at($"words", lit(99)).as("oob_word"))
          .orderBy($"p_partkey")
      },
      Some("""WITH v AS (
             |  SELECT p_partkey,
             |    CASE WHEN p_size % 3 = 0 THEN CAST(p_size AS VARCHAR)
             |         ELSE p_type END AS istr,
             |    CASE WHEN p_size % 2 = 0
             |         THEN '2024-0' || CAST(p_size % 9 + 1 AS VARCHAR) || '-15'
             |         ELSE 'not-a-date' END AS dstr,
             |    p_retailprice, p_size % 4 AS den,
             |    string_split(p_name, ' ') AS words
             |  FROM part WHERE p_partkey <= 300)
             |SELECT p_partkey,
             |  TRY_CAST(istr AS INTEGER) AS parsed_int,
             |  p_retailprice / NULLIF(den, 0) AS safe_div,
             |  TRY_CAST(dstr AS TIMESTAMP) AS parsed_ts,
             |  words[99] AS oob_word
             |FROM v ORDER BY p_partkey""".stripMargin)),

    // Remaining higher-order-function surface beyond fn_array's transform/filter/
    // aggregate: zip_with (element-wise combine), exists / forall (short-circuit
    // predicates), reduce with a finish lambda. All arithmetic stays in BIGINT on
    // both engines (DuckDB range() yields BIGINT lists) so the hash is exact.
    // Map-only, whole-stage codegen'd — lambda functions compile to loops over the
    // array, no UDF boundary.
    Q("fn_hof_extra",
      (s, dir) => {
        import s.implicits._
        val m = (($"p_size" % 7) + 1).cast("long")
        val sh = ($"p_size" % 5).cast("long")
        t(s, dir, "part").filter($"p_partkey" <= 300)
          .select($"p_partkey", m.as("m"), sh.as("sh"),
            transform(sequence(lit(1L), lit(4L)), i => i * m).as("a"),
            transform(sequence(lit(1L), lit(4L)), i => i + sh).as("b"))
          .select($"p_partkey",
            array_join(zip_with($"a", $"b", (x, y) => x + y), ",").as("zw_str"),
            exists($"a", x => x > 20).as("has_big"),
            forall($"b", x => x > 2).as("all_gt2"),
            reduce($"a", lit(0L), (acc, x) => acc + x, acc => acc * 10).as("red"))
          .orderBy($"p_partkey")
      },
      Some("""WITH v AS (
             |  SELECT p_partkey,
             |    CAST(p_size % 7 + 1 AS BIGINT) AS m,
             |    CAST(p_size % 5 AS BIGINT) AS sh
             |  FROM part WHERE p_partkey <= 300),
             |arr AS (
             |  SELECT p_partkey,
             |    list_transform(range(1, 5), i -> i * m) AS a,
             |    list_transform(range(1, 5), i -> i + sh) AS b
             |  FROM v)
             |SELECT p_partkey,
             |  array_to_string(list_transform(range(1, 5), i -> a[i] + b[i]), ',')
             |    AS zw_str,
             |  len(list_filter(a, x -> x > 20)) > 0 AS has_big,
             |  len(list_filter(b, x -> x <= 2)) = 0 AS all_gt2,
             |  10 * CAST(list_sum(a) AS BIGINT) AS red
             |FROM arr ORDER BY p_partkey""".stripMargin)),

    // Map-transform surface: str_to_map parses key:value config strings (the
    // schema-on-read shape of job/task parameter blobs), transform_keys /
    // transform_values rewrite entries in place, map_zip_with aligns two maps by
    // key. Output scalars come from element_at + a sorted entries render, so the
    // result never depends on map iteration order (maps are unordered; hashing raw
    // map columns would be engine-dependent). All map lambdas are codegen'd.
    Q("fn_map_transform",
      (s, dir) => {
        import s.implicits._
        val cfg = concat(lit("status:"), $"o_orderstatus",
          lit(",pri:"), $"o_orderpriority")
        t(s, dir, "orders").filter($"o_orderkey" <= 500)
          .select($"o_orderkey", str_to_map(cfg, lit(","), lit(":")).as("mp"))
          .select($"o_orderkey", $"mp",
            transform_values($"mp", (_, v) => lower(v)).as("mlo"))
          .select($"o_orderkey",
            array_join(array_sort(transform(map_entries(
                transform_keys($"mp", (k, _) => concat(k, lit("_k")))),
              e => concat(e.getItem("key"), lit("="), e.getItem("value")))), ";")
              .as("entries_str"),
            element_at($"mlo", "status").as("status_lo"),
            element_at(map_zip_with($"mp", $"mlo",
              (_, a, b) => concat(a, lit("|"), b)), "pri").as("pri_zip"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  'pri_k=' || o_orderpriority || ';status_k=' || o_orderstatus
             |    AS entries_str,
             |  lower(o_orderstatus) AS status_lo,
             |  o_orderpriority || '|' || lower(o_orderpriority) AS pri_zip
             |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin)),

    // Nested-struct column engineering: pack columns into a struct, update one
    // field and add another IN PLACE (withField — no unpack/repack of siblings),
    // drop a field (dropFields), then star-expand back to scalars. The nested-row
    // manipulation surface a document/event data model needs; all of it is
    // projection-only and codegen'd, and Catalyst prunes unaccessed struct fields
    // from the scan.
    Q("fn_struct_field_ops",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").filter($"o_orderkey" <= 500)
          .select($"o_orderkey",
            struct($"o_orderstatus".as("status"), $"o_totalprice".as("price"),
              $"o_orderpriority".as("pri")).as("rec"))
          .withColumn("rec", $"rec"
            .withField("price", $"rec.price" * 2.0)
            .withField("tier", when($"rec.price" > 100000.0, "high").otherwise("low")))
          .withColumn("rec", $"rec".dropFields("pri"))
          .select($"o_orderkey", $"rec.*")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus AS status,
             |  o_totalprice * 2.0 AS price,
             |  CASE WHEN o_totalprice > 100000.0 THEN 'high' ELSE 'low' END AS tier
             |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin)),

    // LIKE with a custom ESCAPE character and case-insensitive ILIKE — pattern
    // matching against data that itself contains wildcards (the '%'-in-data case
    // every log/URL corpus hits). Patterns are sargable prefixes where possible;
    // both predicates stay codegen'd.
    Q("fn_like_escape",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""WITH v AS (
                |  SELECT p_partkey,
                |    p_brand || CASE WHEN p_partkey % 3 = 0 THEN '%off'
                |                    ELSE '-reg' END AS tag,
                |    p_type
                |  FROM part WHERE p_partkey <= 400)
                |SELECT p_partkey, tag,
                |  tag LIKE '%!%off' ESCAPE '!' AS is_discounted,
                |  p_type ILIKE '%BRASS%' AS is_brass
                |FROM v ORDER BY p_partkey""".stripMargin)
      },
      Some("""WITH v AS (
             |  SELECT p_partkey,
             |    p_brand || CASE WHEN p_partkey % 3 = 0 THEN '%off'
             |                    ELSE '-reg' END AS tag,
             |    p_type
             |  FROM part WHERE p_partkey <= 400)
             |SELECT p_partkey, tag,
             |  tag LIKE '%!%off' ESCAPE '!' AS is_discounted,
             |  p_type ILIKE '%BRASS%' AS is_brass
             |FROM v ORDER BY p_partkey""".stripMargin)),

    // Cryptographic digest family: md5 / sha2-256 over strings — content
    // fingerprinting, cache keys, PII-safe join keys. Both are codegen'd Catalyst
    // expressions (no UDF); hex output is engine-portable, unlike seeded
    // xxhash64/murmur which are Spark-internal (those appear in the salted-join and
    // LSH operators where only self-consistency matters, never in hashed output).
    Q("fn_hash_digest",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer").filter($"c_custkey" <= 500)
          .select($"c_custkey",
            md5($"c_name".cast("binary")).as("md5_hex"),
            sha2($"c_name".cast("binary"), 256).as("sha256_hex"),
            substring(md5(concat_ws("|", $"c_custkey", $"c_mktsegment")
              .cast("binary")), 1, 8).as("composite_key8"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey,
             |  md5(c_name) AS md5_hex,
             |  sha256(c_name) AS sha256_hex,
             |  substring(md5(CAST(c_custkey AS VARCHAR) || '|' || c_mktsegment), 1, 8)
             |    AS composite_key8
             |FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey""".stripMargin)),

    // Binary codec family (base64 / hex / unhex / byte length): the interchange
    // primitives for shipping binary payloads through text formats (JSON/CSV
    // sinks, HTTP APIs). Pure map-only projections; both directions are
    // roundtripped so the oracle pins encode AND decode.
    Q("fn_binary_codecs",
      (s, dir) => {
        import s.implicits._
        // Payload includes the market segment so byte length VARIES across
        // rows (c_name alone is fixed-width — n_bytes was the constant 18,
        // i.e. the length path was untested beyond one value).
        val b = concat($"c_name", lit("|"), $"c_mktsegment").cast("binary")
        t(s, dir, "customer").filter($"c_custkey" <= 500)
          .select($"c_custkey",
            base64(b).as("b64"),
            unbase64(base64(b)).cast("string").as("b64_roundtrip"),
            upper(hex(b)).as("hexed"),
            unhex(upper(hex(b))).cast("string").as("hex_roundtrip"),
            length(b).cast("bigint").as("n_bytes"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey,
             |  to_base64(encode(c_name || '|' || c_mktsegment)) AS b64,
             |  decode(from_base64(to_base64(encode(c_name || '|' || c_mktsegment))))
             |    AS b64_roundtrip,
             |  upper(hex(encode(c_name || '|' || c_mktsegment))) AS hexed,
             |  decode(unhex(upper(hex(encode(c_name || '|' || c_mktsegment)))))
             |    AS hex_roundtrip,
             |  CAST(octet_length(encode(c_name || '|' || c_mktsegment)) AS BIGINT)
             |    AS n_bytes
             |FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey""".stripMargin)),

    // stack() generator — wide-to-long as a table function (the SQL spelling of
    // unpivot; unpivot_melt covers the DataFrame API form). A generator expands
    // rows inside the scan stage with no shuffle; the ORDER is the only exchange.
    Q("fn_stack_wide_to_long",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""SELECT p_partkey, attr, val
                |FROM (SELECT p_partkey, p_brand, p_type FROM part
                |      WHERE p_partkey <= 300)
                |LATERAL VIEW stack(2, 'brand', p_brand, 'type', p_type)
                |  AS attr, val
                |ORDER BY p_partkey, attr""".stripMargin)
      },
      Some("""SELECT p_partkey, attr, val FROM (
             |  SELECT p_partkey, 'brand' AS attr, p_brand AS val FROM part
             |  WHERE p_partkey <= 300
             |  UNION ALL
             |  SELECT p_partkey, 'type', p_type FROM part WHERE p_partkey <= 300)
             |ORDER BY p_partkey, attr""".stripMargin)),

    // printf-style formatting (format_string / DuckDB printf) for stable record
    // ids, padded codes, percent renders. INTEGER and STRING conversions only:
    // %f of a double is locale/rounding-mode territory where Java's Formatter
    // (HALF_UP) and C printf (round-half-even) can disagree at ties — floats are
    // formatted via explicit round + cast instead.
    Q("fn_printf_format",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").filter($"o_orderkey" <= 1000)
          .select($"o_orderkey",
            format_string("ORD-%09d", $"o_orderkey").as("order_code"),
            format_string("%s/%d", $"o_orderstatus", $"o_custkey").as("status_key"),
            format_string("%3d%%",
              floor($"o_totalprice" / 10000.0).cast("int")).as("price_band"),
            lpad($"o_custkey".cast("string"), 8, "0").as("cust_padded"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  printf('ORD-%09d', o_orderkey) AS order_code,
             |  printf('%s/%d', o_orderstatus, o_custkey) AS status_key,
             |  printf('%3d%%', CAST(floor(o_totalprice / 10000.0) AS INT))
             |    AS price_band,
             |  lpad(CAST(o_custkey AS VARCHAR), 8, '0') AS cust_padded
             |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin)),

    // Struct → JSON → struct roundtrip (to_json / get_json_object): the record
    // serialization leg for event buses and JSON sinks. Integer/string fields only:
    // both engines render those byte-identically (compact, insertion order); double
    // rendering is engine-specific and stays out of hashed output.
    Q("fn_json_struct_roundtrip",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").filter($"o_orderkey" <= 800)
          .select($"o_orderkey",
            to_json(struct($"o_orderkey".as("k"), $"o_orderstatus".as("st")))
              .as("js"))
          .select($"o_orderkey", $"js",
            get_json_object($"js", "$.k").cast("long").as("k_back"),
            get_json_object($"js", "$.st").as("st_back"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  CAST(to_json(struct_pack(k := o_orderkey, st := o_orderstatus))
             |    AS VARCHAR) AS js,
             |  o_orderkey AS k_back, o_orderstatus AS st_back
             |FROM orders WHERE o_orderkey <= 800 ORDER BY o_orderkey""".stripMargin)),

    // Struct → CSV line → struct roundtrip (to_csv / from_csv): the flat-record
    // serialization pair for interchange with line-oriented tools (the pipe
    // operator's native format).
    Q("fn_csv_struct_roundtrip",
      (s, dir) => {
        import s.implicits._
        val schema = "k BIGINT, st STRING, pri STRING"
        t(s, dir, "orders").filter($"o_orderkey" <= 800)
          .select($"o_orderkey",
            to_csv(struct($"o_orderkey".as("k"), $"o_orderstatus".as("st"),
              $"o_orderpriority".as("pri"))).as("line"))
          .select($"o_orderkey", $"line",
            from_csv($"line", lit(schema),
              new java.util.HashMap[String, String]()).as("rec"))
          .select($"o_orderkey", $"line",
            $"rec.k".as("k_back"), $"rec.pri".as("pri_back"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  CAST(o_orderkey AS VARCHAR) || ',' || o_orderstatus || ',' ||
             |    o_orderpriority AS line,
             |  o_orderkey AS k_back, o_orderpriority AS pri_back
             |FROM orders WHERE o_orderkey <= 800 ORDER BY o_orderkey""".stripMargin)),

    // Calendar-interval arithmetic: month addition with end-of-month CLAMPING
    // (Jan 31 + 1 month = Feb 29 in a leap year — both engines clamp, and the gate
    // pins it), month addition from a forced end-of-month, and fixed-width hour
    // intervals on timestamps.
    Q("fn_interval_month_arith",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").filter($"o_orderkey" <= 1000)
          .select($"o_orderkey",
            add_months($"o_orderdate".cast("date"), 1).as("plus_1m"),
            add_months(last_day($"o_orderdate".cast("date")), 1).as("eom_plus_1m"),
            ($"o_orderdate" + expr("interval 36 hours")).as("plus_36h"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE)
             |    AS plus_1m,
             |  CAST(last_day(CAST(o_orderdate AS DATE)) + INTERVAL 1 MONTH AS DATE)
             |    AS eom_plus_1m,
             |  o_orderdate + INTERVAL 36 HOUR AS plus_36h
             |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin)),

    // Array SET algebra (union / intersect / except / overlap): tag-list and
    // feature-set manipulation without exploding. Spark's operators dedup but keep
    // first-occurrence order, DuckDB's keep their own — both sides sort before
    // rendering so the SET (the defined semantics) is what gets hashed.
    Q("fn_array_set_ops",
      (s, dir) => {
        import s.implicits._
        val a = array($"p_size" % 5, $"p_size" % 7, $"p_size" % 9)
        val b = array($"p_size" % 5, $"p_size" % 11)
        t(s, dir, "part").filter($"p_partkey" <= 400)
          .select($"p_partkey",
            concat_ws(",", array_sort(array_union(a, b))).as("union_set"),
            concat_ws(",", array_sort(array_intersect(a, b))).as("intersect_set"),
            concat_ws(",", array_sort(array_except(a, b))).as("except_set"),
            arrays_overlap(a, b).as("overlaps"))
          .orderBy($"p_partkey")
      },
      Some("""WITH v AS (
             |  SELECT p_partkey,
             |    [p_size % 5, p_size % 7, p_size % 9] AS a,
             |    [p_size % 5, p_size % 11] AS b
             |  FROM part WHERE p_partkey <= 400)
             |SELECT p_partkey,
             |  COALESCE(array_to_string(
             |    list_sort(list_distinct(list_concat(a, b))), ','), '')
             |    AS union_set,
             |  COALESCE(array_to_string(list_sort(list_distinct(
             |    list_filter(a, x -> list_contains(b, x)))), ','), '')
             |    AS intersect_set,
             |  -- DuckDB renders an EMPTY list as NULL; Spark concat_ws gives ''
             |  COALESCE(array_to_string(list_sort(list_distinct(
             |    list_filter(a, x -> NOT list_contains(b, x)))), ','), '')
             |    AS except_set,
             |  len(list_filter(a, x -> list_contains(b, x))) > 0 AS overlaps
             |FROM v ORDER BY p_partkey""".stripMargin)),

    // Remaining string-manipulation surface: translate / initcap / reverse /
    // repeat / lpad / rpad / word extraction, plus deterministic UUID-shaped id
    // minting from an md5 digest (the content-derived stable identifier pattern —
    // uuid() itself is nondeterministic and banned from hashed output). DuckDB
    // has no initcap, so the oracle mirrors it with a per-word transform.
    Q("fn_string_extra",
      (s, dir) => {
        import s.implicits._
        val h = md5($"p_name")
        t(s, dir, "part").filter($"p_partkey" < 500)
          .select($"p_partkey", $"p_name",
            translate($"p_name", "aeiou", "AEIOU").as("t_translate"),
            initcap($"p_name").as("t_initcap"),
            reverse($"p_name").as("t_reverse"),
            repeat(substring($"p_name", 1, 2), 3).as("t_repeat"),
            lpad($"p_partkey".cast("string"), 8, "0").as("t_lpad"),
            rpad($"p_brand", 12, ".").as("t_rpad"),
            element_at(split($"p_name", " "), 2).as("t_second_word"),
            concat(substring(h, 1, 8), lit("-"), substring(h, 9, 4), lit("-"),
              substring(h, 13, 4), lit("-"), substring(h, 17, 4), lit("-"),
              substring(h, 21, 12)).as("t_uuid_like"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, p_name,
             |  translate(p_name, 'aeiou', 'AEIOU') AS t_translate,
             |  array_to_string(list_transform(string_split(p_name, ' '),
             |    w -> upper(w[1]) || lower(w[2:])), ' ') AS t_initcap,
             |  reverse(p_name) AS t_reverse,
             |  repeat(substring(p_name, 1, 2), 3) AS t_repeat,
             |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS t_lpad,
             |  rpad(p_brand, 12, '.') AS t_rpad,
             |  string_split(p_name, ' ')[2] AS t_second_word,
             |  substring(md5(p_name), 1, 8) || '-' || substring(md5(p_name), 9, 4)
             |    || '-' || substring(md5(p_name), 13, 4) || '-'
             |    || substring(md5(p_name), 17, 4) || '-'
             |    || substring(md5(p_name), 21, 12) AS t_uuid_like
             |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin)),

    // Advanced array surface: position lookup, element removal, repetition,
    // null compaction, extrema, append — each rendered to a string (top-level
    // output columns stay scalar per the determinism rules). DuckDB spells most
    // of these as list_* or a lambda; the mirrors are exact because the arrays
    // are built from the same deterministic fixture.
    Q("fn_array_advanced",
      (s, dir) => {
        import s.implicits._
        val arr = array($"p_brand", lit(null).cast("string"), $"p_type", $"p_brand")
        t(s, dir, "part").filter($"p_partkey" < 400)
          .select($"p_partkey", arr.as("a"))
          .select($"p_partkey",
            array_position($"a", $"a".getItem(2)).as("pos_type"),
            array_join(array_remove($"a", element_at($"a", 1)), ",")
              .as("removed_brand"),
            array_join(array_repeat(substring(element_at($"a", 3), 1, 2), 3), ",")
              .as("repeated"),
            array_join(array_compact($"a"), ",").as("compacted"),
            array_max($"a").as("amax"),
            array_min($"a").as("amin"),
            array_join(concat($"a", array(lit("zzz"))), ",").as("appended"))
          .orderBy($"p_partkey")
      },
      Some("""WITH v AS (
             |  SELECT p_partkey,
             |    [p_brand, NULL, p_type, p_brand] AS a
             |  FROM part WHERE p_partkey < 400)
             |SELECT p_partkey,
             |  CAST(coalesce(list_position(a, a[3]), 0) AS BIGINT) AS pos_type,
             |  array_to_string(list_filter(a, x -> x IS DISTINCT FROM a[1]), ',')
             |    AS removed_brand,
             |  array_to_string(list_transform(generate_series(1, 3),
             |    i -> substring(a[3], 1, 2)), ',') AS repeated,
             |  array_to_string(list_filter(a, x -> x IS NOT NULL), ',') AS compacted,
             |  list_aggregate(a, 'max') AS amax,
             |  list_aggregate(a, 'min') AS amin,
             |  array_to_string(list_append(a, 'zzz'), ',') AS appended
             |FROM v ORDER BY p_partkey""".stripMargin)),

    // Remaining calendar surface: quarter, month-end, locale day/month names,
    // epoch-anchored day offsets, week truncation, backward month arithmetic
    // (end-of-month clamped, like fn_interval_month_arith forward). All pure
    // per-row functions — codegen'd, map-only.
    Q("fn_datetime_extra",
      (s, dir) => {
        import s.implicits._
        val d = $"o_orderdate".cast("date")
        t(s, dir, "orders").filter($"o_orderkey" < 1000)
          .select($"o_orderkey",
            quarter(d).as("qtr"),
            last_day(d).as("month_end"),
            date_format(d, "EEEE").as("day_name"),
            date_format(d, "MMMM").as("month_name"),
            datediff(d, lit("1995-01-01").cast("date")).as("days_since"),
            date_trunc("week", d).cast("date").as("week_start"),
            add_months(d, -3).as("minus_3m"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  CAST(quarter(CAST(o_orderdate AS DATE)) AS INTEGER) AS qtr,
             |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
             |  dayname(CAST(o_orderdate AS DATE)) AS day_name,
             |  monthname(CAST(o_orderdate AS DATE)) AS month_name,
             |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
             |    AS INTEGER) AS days_since,
             |  CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE)
             |    AS week_start,
             |  CAST(CAST(o_orderdate AS DATE) - INTERVAL 3 MONTH AS DATE) AS minus_3m
             |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin)),

    // Timezone conversion matrix: UTC instants rendered as wall-clock time in
    // IANA zones (and round-tripped back) — the pipeline-edge operation every
    // cross-region rollup needs. Spark `from_utc_timestamp(ts, z)` ==
    // DuckDB `(ts AT TIME ZONE 'UTC') AT TIME ZONE z` (instant → local naive);
    // both engines resolve DST from the same IANA tzdata, and the 1995-1997
    // test instants sit in long-stable rule periods. Codegen'd scalar work,
    // map-only.
    Q("fn_timezone_convert",
      (s, dir) => {
        import s.implicits._
        val ts = $"o_orderdate"
        t(s, dir, "orders").filter($"o_orderkey" < 1000)
          .select($"o_orderkey", ts.as("utc_ts"),
            from_utc_timestamp(ts, "America/New_York").as("ny_local"),
            from_utc_timestamp(ts, "Asia/Tokyo").as("tokyo_local"),
            from_utc_timestamp(ts, "Australia/Sydney").as("sydney_local"),
            to_utc_timestamp(from_utc_timestamp(ts, "Europe/Paris"),
              "Europe/Paris").as("roundtrip_utc"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderdate AS utc_ts,
             |  (o_orderdate AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York'
             |    AS ny_local,
             |  (o_orderdate AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Tokyo'
             |    AS tokyo_local,
             |  (o_orderdate AT TIME ZONE 'UTC') AT TIME ZONE 'Australia/Sydney'
             |    AS sydney_local,
             |  o_orderdate AS roundtrip_utc
             |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin))
  )

  /** DuckDB token list (mirror of TextFunctions.tokens) for the lambda-sort oracle.
    * A def, not a val: it is referenced from the `queries` val above, which would
    * otherwise read it before initialization. */
  private def duckToksInline =
    """list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '')"""
}
