package graft.analytics

import org.apache.spark.sql.functions._
import graft.util.{GQuery, Tables}

/** Scalar function battery — string / date / math / JSON (SURVEY.md §2B).
  * The only scalar functions the reference itself uses are JSON serde
  * (transaction_producer.py:47, transaction_consumer.py:82) and
  * current_user/current_timestamp in its audit trigger (README.md:190-191);
  * the rest is the engine's general surface. Each function is chosen so
  * Spark and DuckDB agree bit-for-bit (e.g. no libm-dependent log/exp on
  * the oracle path, explicit casts where return types differ).
  */
object FunctionQueries {

  val queries: Seq[GQuery] = Seq(

    GQuery("q24_string_funcs",
      (s, d) => Tables(s, d, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          substring(col("p_name"), 1, 4).as("pre"),
          length(col("p_name")).as("len"),
          regexp_replace(col("p_type"), "A", "@").as("rep"),
          concat_ws("|", col("p_brand"), col("p_type")).as("cat"),
          element_at(split(col("p_name"), " "), 1).as("first_word"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("rex"),
          lpad(col("p_brand"), 10, "*").as("pad"),
          instr(col("p_name"), "a").as("pos_a"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
        substring(p_name, 1, 4) AS pre, CAST(length(p_name) AS INT) AS len,
        replace(p_type, 'A', '@') AS rep,
        concat_ws('|', p_brand, p_type) AS cat,
        split_part(p_name, ' ', 1) AS first_word,
        regexp_extract(p_name, '([a-z]+)', 1) AS rex,
        lpad(p_brand, 10, '*') AS pad,
        CAST(position('a' IN p_name) AS INT) AS pos_a
        FROM part ORDER BY p_partkey""")),

    // Second string battery: edit distance, char translation, reverse /
    // repeat / left / right / ascii — every function chosen to agree
    // bit-for-bit with the DuckDB twin (initcap deliberately absent:
    // DuckDB has none).
    GQuery("q46_string_funcs2",
      (s, d) => Tables(s, d, "part")
        .select(
          col("p_partkey"),
          levenshtein(col("p_brand"), col("p_type")).as("lev"),
          translate(col("p_type"), "AEIOU", "aeiou").as("tr"),
          reverse(col("p_name")).as("rev"),
          repeat(col("p_brand"), 2).as("rep2"),
          ascii(col("p_name")).as("asc"),
          substring(col("p_name"), 1, 3).as("l3"),
          col("p_name").substr(length(col("p_name")) - 2, lit(3)).as("r3"),
          col("p_name").startsWith("a").as("sw"),
          col("p_name").contains("ing").as("has_ing"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
        CAST(levenshtein(p_brand, p_type) AS INT) AS lev,
        translate(p_type, 'AEIOU', 'aeiou') AS tr,
        reverse(p_name) AS rev,
        repeat(p_brand, 2) AS rep2,
        CAST(ascii(p_name) AS INT) AS asc,
        left(p_name, 3) AS l3,
        right(p_name, 3) AS r3,
        starts_with(p_name, 'a') AS sw,
        contains(p_name, 'ing') AS has_ing
        FROM part ORDER BY p_partkey""")),

    GQuery("q25_date_funcs",
      (s, d) => Tables(s, d, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dy"),
          quarter(col("o_orderdate")).as("qt"),
          date_trunc("month", col("o_orderdate")).as("mstart"),
          date_add(col("o_orderdate").cast("date"), 30).as("d30"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("dd"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
        CAST(year(o_orderdate) AS INT) AS yr,
        CAST(month(o_orderdate) AS INT) AS mo,
        CAST(day(o_orderdate) AS INT) AS dy,
        CAST(quarter(o_orderdate) AS INT) AS qt,
        date_trunc('month', o_orderdate) AS mstart,
        CAST(o_orderdate AS DATE) + 30 AS d30,
        CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS dd
        FROM orders ORDER BY o_orderkey""")),

    // Second date battery: calendar-edge functions. dayofweek maps
    // explicitly (Spark 1=Sunday..7 vs DuckDB 0=Sunday..6); weekofyear
    // is ISO in both; add_months clamps to month end in both.
    GQuery("q47_date_funcs2",
      (s, d) => Tables(s, d, "orders")
        .select(
          col("o_orderkey"),
          last_day(col("o_orderdate").cast("date")).as("eom"),
          dayofweek(col("o_orderdate")).as("dow"),
          dayofyear(col("o_orderdate")).as("doy"),
          weekofyear(col("o_orderdate")).as("woy"),
          add_months(col("o_orderdate").cast("date"), 2).as("plus2m"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
        last_day(CAST(o_orderdate AS DATE)) AS eom,
        CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        CAST(dayofyear(o_orderdate) AS INT) AS doy,
        CAST(weekofyear(o_orderdate) AS INT) AS woy,
        CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m
        FROM orders ORDER BY o_orderkey""")),

    GQuery("q26_math_funcs",
      (s, d) => Tables(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          sqrt(col("l_quantity")).as("sq"),
          ceil(col("l_extendedprice")).as("ce"),
          floor(col("l_extendedprice")).as("fl"),
          abs(col("l_discount") - 0.05).as("ab"),
          (col("l_orderkey") % 7).as("md"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
          least(col("l_quantity"), col("l_discount") * 100).as("le"))
        // (l_orderkey, l_linenumber) is not unique in the synthetic
        // data — extend the sort until it is total
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("sq"),
          col("ce"), col("ab")),
      Some("""SELECT l_orderkey, l_linenumber,
        sqrt(l_quantity) AS sq,
        CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        abs(l_discount - 0.05) AS ab,
        l_orderkey % 7 AS md,
        greatest(l_quantity, l_discount * 100) AS gr,
        least(l_quantity, l_discount * 100) AS le
        FROM lineitem ORDER BY l_orderkey, l_linenumber, sq, ce, ab""")),

    // Map scalar functions (§2B "array/map scalar fns"): construct,
    // probe, and enumerate a MAP column. Output columns are plain
    // strings/ints so the oracle mirrors the SEMANTICS relationally
    // (DuckDB's MAP type does not round-trip through the compare).
    GQuery("q48_map_funcs",
      (s, d) => {
        val m = map(
          lit("et"), col("event_type"),
          lit("uid"), col("user_id").cast("string"))
        Tables(s, d, "events").select(
          col("event_id"),
          element_at(m, "et").as("v_et"),
          element_at(m, "uid").as("v_uid"),
          size(m).as("n_entries"),
          concat_ws(",", map_keys(m)).as("keys"),
          concat_ws(",", map_values(m)).as("vals"),
          map_contains_key(m, "et").as("has_et"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
        event_type AS v_et,
        CAST(user_id AS VARCHAR) AS v_uid,
        2 AS n_entries,
        'et,uid' AS keys,
        event_type || ',' || CAST(user_id AS VARCHAR) AS vals,
        true AS has_et
        FROM events ORDER BY event_id""")),

    GQuery("q27_json_funcs",
      (s, d) => Tables(s, d, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events ORDER BY event_id""")),

    // Array-function battery (§2B "array/map scalar fns"): tokenization
    // into arrays, then size/distinct/sort/contains/slice/join — 1-based
    // indexing in both engines.
    GQuery("q40_array_funcs",
      (s, d) => {
        val toks = filter(split(col("text"), " "), t => t =!= "")
        Tables(s, d, "documents").select(
          col("doc_id"),
          size(toks).as("n_toks"),
          size(array_distinct(toks)).as("n_uniq"),
          array_contains(toks, "the").as("has_the"),
          // try_element_at: ANSI mode (Spark 4 default) makes element_at
          // throw on an empty array (whitespace-only doc); DuckDB's list[1]
          // yields NULL there, so the null-returning variant matches.
          try_element_at(array_sort(array_distinct(toks)), lit(1)).as("first_sorted"),
          concat_ws("-", slice(toks, 1, 3)).as("first3"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
        CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT) AS n_toks,
        CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS INT) AS n_uniq,
        list_contains(list_filter(string_split(text, ' '), x -> x <> ''), 'the') AS has_the,
        list_sort(list_distinct(list_filter(string_split(text, ' '), x -> x <> '')))[1] AS first_sorted,
        array_to_string(list_filter(string_split(text, ' '), x -> x <> '')[1:3], '-') AS first3
        FROM documents ORDER BY doc_id""")),

    // UDTF shape (§2B "UDF/UDAF/UDTF"): explode = the engine's generator
    // surface; classic word count with a total (cnt desc, token) order.
    GQuery("q41_wordcount",
      (s, d) => Tables(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(100),
      Some("""SELECT token, COUNT(*) AS cnt FROM (
          SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
          FROM documents)
        GROUP BY token ORDER BY cnt DESC NULLS LAST, token LIMIT 100""")),

    // Unpivot/melt — the inverse of q38_pivot. Sorted on the full output
    // row: (l_orderkey, l_linenumber) is not unique in the synthetic
    // lineitem, so metric+val complete the total order.
    GQuery("q43_unpivot",
      (s, d) => Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("quantity"),
          col("l_discount").cast("double").as("discount"),
          col("l_tax").cast("double").as("tax"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("quantity"), col("discount"), col("tax")),
          "metric", "val")
        // Spark's unpivot keeps NULL-valued rows, DuckDB's UNPIVOT drops
        // them — filter explicitly so both engines agree by construction
        // (not just on the non-null synthetic data).
        .filter(col("val").isNotNull)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"),
          col("val")),
      Some("""SELECT l_orderkey, l_linenumber, metric, val FROM (
          UNPIVOT (SELECT l_orderkey, l_linenumber,
                   CAST(l_quantity AS DOUBLE) AS quantity,
                   CAST(l_discount AS DOUBLE) AS discount,
                   CAST(l_tax AS DOUBLE) AS tax FROM lineitem)
          ON quantity, discount, tax INTO NAME metric VALUE val)
        ORDER BY l_orderkey, l_linenumber, metric, val""")),

    // Exact percentiles (sort-based, linear interpolation — both engines
    // define quantile_cont/percentile identically, and the interpolation
    // arithmetic is per-group IEEE, not an order-dependent float sum).
    GQuery("q42_percentiles",
      (s, d) => Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_quantity"), lit(0.5)).as("med_qty"),
          percentile(col("l_extendedprice"), lit(0.9)).as("p90_price"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
        quantile_cont(l_quantity, 0.5) AS med_qty,
        quantile_cont(l_extendedprice, 0.9) AS p90_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Approximate percentiles (Greenwald-Khanna sketch) — the mergeable,
    // bounded-memory path beside q42's exact sort-based percentiles; the
    // sketch is Spark-specific so the driver does the rows-only check,
    // and OperatorsSpec pins the rank-error bound against the exact
    // values.
    GQuery("q51_approx_percentile",
      (s, d) => Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_percentile(col("l_extendedprice"), lit(0.5), lit(1000))
            .as("p50_approx"),
          approx_percentile(col("l_extendedprice"), lit(0.9), lit(1000))
            .as("p90_approx"))
        .orderBy(col("l_returnflag")),
      None),

    // Typed Aggregator registered via functions.udaf (SURVEY.md §2B
    // "UDF/UDAF/UDTF"): quantity-weighted mean price per return flag,
    // with exact decimal accumulation inside the UDAF buffer.
    GQuery("q39_udaf_weighted_avg",
      (s, d) => {
        val wavg = udaf(graft.functions.WeightedAvg)
        Tables(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Row generation: sequence + explode (generate_series twin) — every
    // order key divisible by 100 expanded to a 3-day date range. The
    // generator is per-row (map-side); no shuffle beyond the final sort.
    GQuery("q57_sequence_explode",
      (s, d) => Tables(s, d, "orders")
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"),
          explode(sequence(col("o_orderdate").cast("date"),
            date_add(col("o_orderdate").cast("date"), 2))).as("day"))
        .orderBy(col("o_orderkey"), col("day")),
      Some("""SELECT o_orderkey,
        CAST(unnest(generate_series(CAST(o_orderdate AS DATE),
          CAST(o_orderdate AS DATE) + 2, INTERVAL 1 DAY)) AS DATE) AS day
        FROM orders WHERE o_orderkey % 100 = 0
        ORDER BY o_orderkey, day""")),

    // Bitwise + boolean aggregates (bit_and/or/xor, bool_and/or,
    // count_if) — all order-insensitive, so partition-order safe.
    GQuery("q58_bitbool_agg",
      (s, d) => Tables(s, d, "events")
        .groupBy(col("event_type"))
        .agg(bit_and(col("user_id").cast("long")).as("ba"),
          bit_or(col("user_id").cast("long")).as("bo"),
          bit_xor(col("user_id").cast("long")).as("bx"),
          bool_and(col("value") > 0).as("all_pos"),
          bool_or(col("value") > 100).as("any_big"),
          count_if(col("value") > 50).as("n_big"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
        bit_and(CAST(user_id AS BIGINT)) AS ba,
        bit_or(CAST(user_id AS BIGINT)) AS bo,
        bit_xor(CAST(user_id AS BIGINT)) AS bx,
        bool_and(value > 0) AS all_pos,
        bool_or(value > 100) AS any_big,
        CAST(count_if(value > 50) AS BIGINT) AS n_big
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // regexp_extract_all + array slicing over the documents corpus
    // (map-side scalar work; the text scan is the only cost).
    GQuery("q59_regexp_extract",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"),
          array_join(slice(
            regexp_extract_all(col("text"), lit("[a-z]{6,}"), lit(0)),
            1, 5), ",").as("long_words"),
          size(regexp_extract_all(col("text"), lit("[a-z]{6,}"), lit(0)))
            .as("n_long"))
        .orderBy(col("doc_id")),
      // COALESCE: DuckDB's slice of a no-match (empty) list is NULL and
      // array_to_string propagates it; Spark's array_join of an empty
      // array is '' — canonicalize to ''.
      Some("""SELECT doc_id,
        COALESCE(array_to_string(regexp_extract_all(text, '[a-z]{6,}')[1:5], ','), '') AS long_words,
        CAST(len(regexp_extract_all(text, '[a-z]{6,}')) AS INT) AS n_long
        FROM documents ORDER BY doc_id""")),

    // Null-semantics battery: coalesce / nullif / null-safe equality.
    // Spark's <=> is DuckDB's IS NOT DISTINCT FROM; grouping/distinct
    // treat NULL as one key in both engines (asserted by the group
    // count in n_by_key).
    GQuery("q63_null_semantics",
      (s, d) => {
        val e = Tables(s, d, "events")
        val v = when(col("event_type") === "error", lit(null))
          .otherwise(col("value"))
        e.select(col("event_id"), v.as("v"))
          .withColumn("v_coal", coalesce(col("v"), lit(-1.0)))
          .withColumn("self_nullsafe", col("v") <=> col("v"))
          .withColumn("zero_if_neg", nullif(col("v_coal"), lit(-1.0)))
          .groupBy(col("v").isNull.as("is_missing"))
          .agg(count(lit(1)).as("n_by_key"),
            count(col("v")).as("n_nonnull"),
            count_if(col("self_nullsafe")).as("n_selfsafe"),
            count_if(col("zero_if_neg").isNull).as("n_nulled"))
          .orderBy(col("is_missing"))
      },
      Some("""WITH b AS (
          SELECT event_id,
            CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
          FROM events),
        w AS (SELECT event_id, v, coalesce(v, -1.0) AS v_coal,
            (v IS NOT DISTINCT FROM v) AS self_nullsafe,
            nullif(coalesce(v, -1.0), -1.0) AS zero_if_neg
          FROM b)
        SELECT (v IS NULL) AS is_missing, COUNT(*) AS n_by_key,
          COUNT(v) AS n_nonnull,
          CAST(count_if(self_nullsafe) AS BIGINT) AS n_selfsafe,
          CAST(count_if(zero_if_neg IS NULL) AS BIGINT) AS n_nulled
        FROM w GROUP BY is_missing ORDER BY is_missing""")),

    // Array higher-order functions over the embedding vectors:
    // transform / zip_with / aggregate / exists / forall — the pure-SQL
    // expression of the vector math the native CosineSimilarity kernel
    // does in codegen (HOFs are CodegenFallback, hence the kernel; this
    // query pins the SEMANTICS against DuckDB's list functions).
    GQuery("q62_hof_vectors",
      (s, d) => {
        val emb = Tables(s, d, "embeddings").filter(col("vec_id") % 50 === 0)
        val v = col("embedding")
        val dot = aggregate(
          zip_with(v, reverse(v), (a, b) => a.cast("double") * b.cast("double")),
          lit(0.0), (acc, x) => acc + x)
        val norm2 = aggregate(
          transform(v, x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x)
        // rendered via floor micro-units, not round(_, 6) — Spark
        // rounds the decimal rendering, DuckDB the binary double (the
        // cross-engine hash-flip class Similarity/Dedup migrated off)
        emb.select(col("vec_id"),
            (floor(dot * 1e6).cast("double") / 1e6).as("dot_rev"),
            (floor(norm2 * 1e6).cast("double") / 1e6).as("norm2"),
            exists(v, x => x.cast("double") > 0.2).as("has_big"),
            forall(v, x => abs(x.cast("double")) <= 1.0).as("unit_bounded"))
          .orderBy(col("vec_id"))
      },
      // list_reduce needs the init prepended; sequential fold order
      // matches Spark's aggregate (left fold), so doubles agree
      Some("""SELECT vec_id,
        CAST(CAST(floor(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip(embedding, list_reverse(embedding)),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
          (acc, x) -> acc + x) * 1e6) AS BIGINT) AS DOUBLE) / 1e6 AS dot_rev,
        CAST(CAST(floor(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
          (acc, x) -> acc + x) * 1e6) AS BIGINT) AS DOUBLE) / 1e6 AS norm2,
        len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.2)) > 0 AS has_big,
        len(list_filter(embedding, x -> abs(CAST(x AS DOUBLE)) > 1.0)) = 0 AS unit_bounded
        FROM embeddings WHERE vec_id % 50 = 0 ORDER BY vec_id""")),

    // Semi-structured VARIANT path (Spark 4): parse once into the binary
    // variant encoding, then typed extraction — the modern alternative
    // to per-field get_json_object string re-parsing (one parse, many
    // typed reads; the open-format answer to a JSON column at scale).
    GQuery("q60_variant_json",
      (s, d) => Tables(s, d, "events")
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(col("event_id"),
          try_variant_get(col("v"), "$.k", "int").as("k"),
          try_variant_get(col("v"), "$.missing", "int").as("absent"),
          is_variant_null(col("v")).as("is_null"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS INT) AS k,
        CAST(json_extract_string(props, '$.missing') AS INT) AS absent,
        false AS is_null
        FROM events ORDER BY event_id"""))
  )
}
