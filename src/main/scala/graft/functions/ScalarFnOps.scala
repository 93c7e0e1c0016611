package graft.functions

import graft.{OpModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY.md §2B q30–q35): string, date, math,
  * array, JSON/map functions — all Catalyst built-ins, fully inside
  * whole-stage codegen.
  *
  * Cross-engine notes (SURVEY.md §7.4): Spark `dayofweek` is 1=Sunday vs
  * DuckDB 0=Sunday (+1 in oracle); Spark floor/ceil on double return
  * LONG vs DuckDB DECIMAL (cast in oracle); narrow int results are cast
  * to BIGINT on the Spark side to match DuckDB's wider defaults.
  */
object ScalarFnOps extends OpModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_fn_string" -> { (s, d) =>
      Tables(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_type")).as("lo"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("tr"),
        substring(col("p_name"), 1, 5).as("sub"),
        concat(col("p_brand"), lit("_"), col("p_type")).as("cat"),
        length(col("p_name")).cast("long").as("len"),
        lpad(col("p_brand"), 12, "*").as("pad"),
        expr("replace(p_name, ' ', '_')").as("rep"),
        array_join(split(col("p_name"), " "), "|").as("toks"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("ext"))
        .orderBy("p_partkey")
    },

    // The reference's flagship word count (README Moby-Dick example),
    // Spark-native: tokenize -> explode -> two-phase count.
    "q31_wordcount" -> { (s, d) =>
      Tables(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token").asc)
        .limit(20)
    },

    "q32_fn_date" -> { (s, d) =>
      Tables(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since"),
        add_months(col("o_orderdate"), 3).as("plus3m"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30d"))
        .orderBy("o_orderkey")
    },

    "q33_fn_math" -> { (s, d) =>
      Tables(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("r2"),
        floor(col("l_extendedprice")).as("fl"),
        ceil(col("l_extendedprice")).as("ce"),
        abs(col("l_discount") - 0.05).as("ab"),
        pow(col("l_quantity"), 2).as("pw"),
        round(sqrt(col("l_extendedprice")), 6).as("sq"),
        round(log(col("l_extendedprice")), 6).as("lg"),
        round(exp(col("l_discount")), 6).as("ex"),
        pmod(col("l_orderkey"), lit(7)).as("pm"),
        signum(col("l_discount") - 0.05).cast("int").as("sg"),
        greatest(col("l_quantity"), col("l_discount") * 1000).as("gt"),
        least(col("l_quantity"), col("l_discount") * 1000).as("lt"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    "q34_fn_array" -> { (s, d) =>
      // the transformed slice is unpacked to scalar columns: array cells
      // break downstream pandas comparators, and double→string would
      // reintroduce repr divergence
      val s4 = transform(slice(col("embedding"), 1, 4),
                         x => round(x.cast("double"), 6))
      Tables(s, d, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("e1"),
        element_at(s4, 1).as("s4_1"), element_at(s4, 2).as("s4_2"),
        element_at(s4, 3).as("s4_3"), element_at(s4, 4).as("s4_4"),
        array_contains(array(lit(1), lit(2), lit(3)), col("label")).as("in123"))
        .orderBy("vec_id")
    },

    // Positional generator: posexplode over tokenized part names.
    // Oracle relies on DuckDB zipping parallel unnests positionally.
    "q69_fn_posexplode" -> { (s, d) =>
      Tables(s, d, "part")
        .select(col("p_partkey"),
                posexplode(split(col("p_name"), " ")).as(Seq("pos", "tok")))
        .select(col("p_partkey"), col("pos").cast("long").as("pos"), col("tok"))
        .orderBy("p_partkey", "pos")
    },

    "q35_fn_json_map" -> { (s, d) =>
      // Parse each props JSON exactly ONCE (from_json → map) and derive
      // both k and k2 from the parsed map; a get_json_object sibling would
      // re-parse every row. Corpus assumption: props is always well-formed
      // JSON — on malformed input from_json yields a null map (k and k2
      // both null), which is the desired null-propagating behavior.
      val m = from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,int>"))
      Tables(s, d, "events")
        .select(m.as("pm"))
        .select(element_at(col("pm"), "k").as("k"),
                element_at(map_filter(col("pm"), (key, _) => key === "k"),
                           "k").as("k2"))
        .groupBy("k", "k2")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("k")
    },

    // VARIANT ingestion + shredding (added r12) — the Spark 4 semi-
    // structured path next to q35's schema-ful from_json: parse_json
    // keeps the payload as an open-schema binary VARIANT (the lakehouse
    // answer to "the telemetry schema will drift"), variant_get
    // extracts a typed field lazily, and the shredded integer then
    // flows through ordinary codegen'd aggregation — the parse cost is
    // one pass, the VARIANT never shuffles (only the extracted field
    // and the grouping key do). try_variant_get's null-on-miss probes a
    // key the payload doesn't have, pinning the drift contract (absent
    // ⇒ null ⇒ excluded from its count, never an exception). Decile
    // rollup with cents discipline.
    "q235_variant_shred" -> { (s, d) =>
      Tables(s, d, "events")
        .select(col("event_type"),
                round(col("value") * 100).cast("long").as("cents"),
                parse_json(col("props")).as("v"))
        .select(col("event_type"), col("cents"),
                variant_get(col("v"), "$.k", "int").as("k"),
                try_variant_get(col("v"), "$.missing", "int").as("mk"))
        .withColumn("bucket", expr("k div 10").cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"),
             countDistinct(col("event_type")).as("types"),
             count(col("mk")).as("drift_hits"),
             round(sum(col("cents").cast("decimal(28,0)")).cast("double") /
                   count(lit(1)) / 100.0, 6).as("avg_value"))
        .orderBy("bucket")
    }
  )

  def oracles: Map[String, String] = Map(
    "q30_fn_string" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up,
        |  lower(p_type) AS lo,
        |  trim('  ' || p_name || '  ') AS tr,
        |  substr(p_name, 1, 5) AS sub,
        |  p_brand || '_' || p_type AS cat,
        |  len(p_name) AS len,
        |  lpad(p_brand, 12, '*') AS pad,
        |  replace(p_name, ' ', '_') AS rep,
        |  array_to_string(string_split(p_name, ' '), '|') AS toks,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS ext
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q31_wordcount" ->
      """SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 20""".stripMargin,

    "q32_fn_date" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr,
        |  month(o_orderdate) AS mo,
        |  dayofmonth(o_orderdate) AS dom,
        |  dayofweek(o_orderdate) + 1 AS dow,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30d
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q33_fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice, 2) AS r2,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        |  abs(l_discount - 0.05) AS ab,
        |  pow(l_quantity, 2) AS pw,
        |  round(sqrt(l_extendedprice), 6) AS sq,
        |  round(ln(l_extendedprice), 6) AS lg,
        |  round(exp(l_discount), 6) AS ex,
        |  l_orderkey % 7 AS pm,
        |  CAST(sign(l_discount - 0.05) AS INT) AS sg,
        |  greatest(l_quantity, l_discount * 1000) AS gt,
        |  least(l_quantity, l_discount * 1000) AS lt
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q34_fn_array" ->
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS e1,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS s4_1,
        |  round(CAST(embedding[2] AS DOUBLE), 6) AS s4_2,
        |  round(CAST(embedding[3] AS DOUBLE), 6) AS s4_3,
        |  round(CAST(embedding[4] AS DOUBLE), 6) AS s4_4,
        |  list_contains([1, 2, 3], label) AS in123
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q69_fn_posexplode" ->
      """SELECT p_partkey,
        |  unnest(range(0, len(string_split(p_name, ' ')))) AS pos,
        |  unnest(string_split(p_name, ' ')) AS tok
        |FROM part ORDER BY p_partkey, pos""".stripMargin,

    "q35_fn_json_map" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k2,
        |  count(*) AS cnt
        |FROM events GROUP BY k, k2 ORDER BY k""".stripMargin,

    // DuckDB's JSON type is its open-schema equivalent; the missing-key
    // probe returns NULL in both engines
    "q235_variant_shred" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10
        |    AS bucket,
        |  count(*) AS cnt,
        |  count(DISTINCT event_type) AS types,
        |  count(CAST(json_extract_string(props, '$.missing') AS BIGINT))
        |    AS drift_hits,
        |  round(CAST(sum(CAST(CAST(round(value * 100) AS BIGINT)
        |                      AS DECIMAL(28,0))) AS DOUBLE) /
        |        count(*) / 100.0, 6) AS avg_value
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin
  )
}
