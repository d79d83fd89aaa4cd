"""Scalar function families (SURVEY.md §2.7 — Tier B).

All JVM built-ins (`pyspark.sql.functions`) — no Python in the data path, so
every expression stays inside whole-stage codegen. The oracle strings encode
the Spark↔DuckDB renames (§2.12 #5): get_json_object↔json_extract, size↔len,
explode↔unnest, split↔string_split, 0- vs 1-based array indexing, and int
width normalization (Spark length()→int vs DuckDB length()→bigint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql4pandas_spark.queries.catalog import query
from sql4pandas_spark.sources.parquet import register_tables


@query(
    "string_funcs_part",
    oracle="""
    SELECT p_partkey, upper(p_name) AS up, CAST(length(p_name) AS INTEGER) AS len,
           substr(p_name, 1, 4) AS pre, replace(p_name, ' ', '_') AS slug,
           trim(concat('  ', p_name, '  ')) AS trimmed
    FROM part WHERE p_name LIKE '%widget%' ORDER BY p_partkey LIMIT 25
    """,
    tags=("tier-b", "string_fns", "filter_in"),
)
def string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir, ("part",))
    return (
        t["part"]
        .filter(F.col("p_name").like("%widget%"))
        .select(
            "p_partkey",
            F.upper("p_name").alias("up"),
            F.length("p_name").alias("len"),
            F.substring("p_name", 1, 4).alias("pre"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("slug"),
            F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        )
        .orderBy("p_partkey")
        .limit(25)
    )


@query(
    "regexp_funcs_part",
    oracle="""
    SELECT regexp_extract(p_name, '^([a-z]+) ', 1) AS color, count(*) AS n
    FROM part
    WHERE regexp_matches(p_name, '^[a-z]+ ')
    GROUP BY color ORDER BY n DESC, color LIMIT 15
    """,
    tags=("tier-b", "string_fns"),
)
def regexp_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract + regexp predicate (Spark rlike ↔ DuckDB regexp_matches)."""
    t = register_tables(spark, sf_dir, ("part",))
    return (
        t["part"]
        .filter(F.col("p_name").rlike("^[a-z]+ "))
        .select(F.regexp_extract("p_name", "^([a-z]+) ", 1).alias("color"))
        .groupBy("color")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "color")
        .limit(15)
    )


@query(
    "date_funcs_orders",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           count(*) AS n
    FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("tier-b", "date_fns"),
)
def date_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .groupBy(F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("y", "m")
    )


@query(
    "date_arith_orders",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_epoch_start
    FROM orders ORDER BY o_orderkey LIMIT 50
    """,
    tags=("tier-b", "date_fns"),
)
def date_arith_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic, truncation, day differences — all timestamp-typed
    so both engines hash identically (date_add would return DATE in Spark)."""
    t = register_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .select(
            "o_orderkey",
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
                "days_since_epoch_start"
            ),
        )
        .orderBy("o_orderkey")
        .limit(50)
    )


@query(
    "math_null_funcs",
    oracle="""
    SELECT l_orderkey, round(abs(l_extendedprice - 50000), 2) AS dist,
           coalesce(nullif(l_returnflag, 'N'), 'none') AS flag,
           round(greatest(l_quantity, 25.0), 2) AS qcap,
           round(least(l_discount, l_tax), 4) AS small_rate
    FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 50
    """,
    tags=("tier-a", "null_fns", "math_fns"),
)
def math_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .select(
            "l_orderkey",
            F.round(F.abs(F.col("l_extendedprice") - 50000), 2).alias("dist"),
            F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias("flag"),
            F.round(F.greatest(F.col("l_quantity"), F.lit(25.0)), 2).alias("qcap"),
            F.round(F.least(F.col("l_discount"), F.col("l_tax")), 4).alias("small_rate"),
            "l_linenumber",
        )
        .orderBy("l_orderkey", "l_linenumber")
        .drop("l_linenumber")
        .limit(50)
    )


@query(
    "math_funcs_extended",
    oracle="""
    SELECT l_orderkey,
           round(ln(l_extendedprice), 6)         AS ln_price,
           round(sqrt(l_quantity), 6)            AS sqrt_qty,
           round(power(l_discount + 1, 2), 6)    AS pow_disc,
           CAST(ceil(l_quantity)  AS BIGINT)     AS ceil_qty,
           CAST(floor(l_quantity) AS BIGINT)     AS floor_qty,
           CAST(mod(l_orderkey, 7) AS BIGINT)    AS mod7,
           CAST(sign(l_extendedprice - 50000) AS DOUBLE) AS sgn
    FROM lineitem
    WHERE l_linenumber = 1
    ORDER BY l_orderkey LIMIT 50
    """,
    tags=("tier-b", "math_fns"),
)
def math_funcs_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .filter(F.col("l_linenumber") == 1)
        .select(
            "l_orderkey",
            F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
            F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
            F.round(F.pow(F.col("l_discount") + 1, 2), 6).alias("pow_disc"),
            F.ceil("l_quantity").alias("ceil_qty"),
            F.floor("l_quantity").alias("floor_qty"),
            (F.col("l_orderkey") % 7).alias("mod7"),
            F.signum(F.col("l_extendedprice") - 50000).alias("sgn"),
        )
        .orderBy("l_orderkey")
        .limit(50)
    )


@query(
    "json_props_avg",
    oracle="""
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("tier-b", "json_fns", "bench"),
)
def json_props_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction (Spark get_json_object ↔ DuckDB json_extract_string)."""
    t = register_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.round(F.avg(F.get_json_object("props", "$.k").cast("int")), 4).alias("avg_k")
        )
        .orderBy("event_type")
    )


@query(
    "json_filter_events",
    oracle="""
    SELECT event_type, count(*) AS n_high
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("tier-b", "json_fns"),
)
def json_filter_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .filter(F.get_json_object("props", "$.k").cast("int") > 50)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_high"))
        .orderBy("event_type")
    )


@query(
    "array_funcs_embeddings",
    oracle="""
    SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS e0,
           CAST(list_contains(list_transform(embedding, x -> x > 0.5), true) AS BOOLEAN) AS has_big
    FROM embeddings ORDER BY vec_id LIMIT 20
    """,
    tags=("tier-b", "array_fns"),
)
def array_funcs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / index / exists. Spark arrays are 0-indexed, DuckDB lists
    1-indexed — the oracle shifts (§2.12 #4); float32 elements are cast to
    double before rounding (§2.12 #9)."""
    t = register_tables(spark, sf_dir, ("embeddings",))
    return (
        t["embeddings"]
        .select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.round(F.col("embedding").getItem(0).cast("double"), 6).alias("e0"),
            F.exists("embedding", lambda x: x > 0.5).alias("has_big"),
        )
        .orderBy("vec_id")
        .limit(20)
    )


@query(
    "array_explode_avg",
    oracle="""
    SELECT vec_id, round(avg(CAST(u.x AS DOUBLE)), 6) AS avg_component
    FROM embeddings, unnest(embedding) AS u(x)
    GROUP BY vec_id ORDER BY vec_id LIMIT 20
    """,
    tags=("tier-b", "array_fns", "explode"),
)
def array_explode_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode ↔ unnest. Scale note: explode multiplies rows (here ×64) before
    the aggregation — when only a reduction is needed, prefer the higher-order
    form (array_hof_norm below) which never materializes the exploded rows."""
    t = register_tables(spark, sf_dir, ("embeddings",))
    return (
        t["embeddings"]
        .select("vec_id", F.explode("embedding").alias("x"))
        .groupBy("vec_id")
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("avg_component"))
        .orderBy("vec_id")
        .limit(20)
    )


@query(
    "array_hof_norm",
    oracle="""
    SELECT vec_id,
           round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 4) AS norm2,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS INTEGER) AS n_pos
    FROM embeddings ORDER BY vec_id LIMIT 20
    """,
    tags=("tier-b", "array_fns", "higher_order"),
)
def array_hof_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions: transform + aggregate + filter, fully JVM-side.
    Verifies the fixture embeddings are unit-norm (norm2 ≈ 1.0)."""
    t = register_tables(spark, sf_dir, ("embeddings",))
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm2 = F.aggregate(
        F.transform(dbl, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    )
    return (
        t["embeddings"]
        .select(
            "vec_id",
            F.round(norm2, 4).alias("norm2"),
            F.size(F.filter(dbl, lambda x: x > 0)).alias("n_pos"),
        )
        .orderBy("vec_id")
        .limit(20)
    )


@query(
    "struct_funcs_customer",
    oracle="""
    SELECT c_custkey,
           (struct_pack(seg := c_mktsegment, bal := round(c_acctbal, 2))).bal AS bal,
           (struct_pack(seg := c_mktsegment, bal := round(c_acctbal, 2))).seg AS seg
    FROM customer ORDER BY c_custkey LIMIT 30
    """,
    tags=("tier-b", "struct_fns"),
)
def struct_funcs_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """named_struct construction + field access (struct columns survive the
    round trip — the multimodal metadata pattern relies on this)."""
    t = register_tables(spark, sf_dir, ("customer",))
    st = F.named_struct(
        F.lit("seg"), F.col("c_mktsegment"), F.lit("bal"), F.round(F.col("c_acctbal"), 2)
    )
    return (
        t["customer"]
        .select(
            "c_custkey",
            st.getField("bal").alias("bal"),
            st.getField("seg").alias("seg"),
        )
        .orderBy("c_custkey")
        .limit(30)
    )


@query(
    "map_funcs_events",
    oracle="""
    SELECT array_to_string(list_sort(json_keys(props)), ',') AS keysig,
           count(*) AS n,
           round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("tier-b", "map_fns", "json_fns"),
)
def map_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: from_json → map<string,string>, map_keys, element
    access. Map rendering isn't portable, so the oracle compares a SORTED
    key signature string plus an element-access aggregate — both engines'
    canonical forms of the same map."""
    t = register_tables(spark, sf_dir, ("events",))
    m = F.from_json("props", "map<string,string>")
    return (
        t["events"]
        .select(
            F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keysig"),
            m.getItem("k").cast("double").alias("k_val"),
        )
        .groupBy("keysig")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("k_val"), 4).alias("avg_k"))
        .orderBy("keysig")
    )


@query(
    "agg_collect_ordered",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations,
           CAST(len(list(c_custkey)) AS BIGINT) AS n
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("tier-b", "agg_collect", "array_fns"),
)
def agg_collect_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect aggregates with deterministic rendering: collect_set order is
    engine-dependent, so the contract sorts it (sort_array ↔ list_sort) and
    then serializes it to a comma string (array_join ↔ array_to_string) —
    array-typed output columns crash the driver's canonicalizer, and the
    string form hash-compares identically. The list itself shuffles as an
    array value; at scale prefer collect only after a reducing groupBy
    (here: 25 ints per segment, bounded)."""
    t = register_tables(spark, sf_dir, ("customer",))
    return (
        t["customer"]
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("c_nationkey")).cast("array<string>"), ","
            ).alias("nations"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "try_funcs_part",
    oracle="""
    SELECT p_partkey,
           TRY_CAST(p_brand AS INTEGER) AS brand_num,
           TRY_CAST(substr(p_brand, 7) AS INTEGER) AS brand_suffix,
           CASE WHEN p_size = 0 THEN NULL ELSE round(p_retailprice / p_size, 4) END AS price_per_size
    FROM part ORDER BY p_partkey LIMIT 50
    """,
    tags=("tier-b", "null_fns", "try_fns"),
)
def try_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expressions: try_cast returns NULL instead of failing the
    task — at 100 TB one malformed value must never kill a 10-hour job.
    try_divide mirrors the guarded division the oracle spells with CASE."""
    t = register_tables(spark, sf_dir, ("part",))
    return (
        t["part"]
        .select(
            "p_partkey",
            F.expr("try_cast(p_brand AS INT)").alias("brand_num"),
            F.expr("try_cast(substr(p_brand, 7) AS INT)").alias("brand_suffix"),
            F.round(F.try_divide("p_retailprice", F.col("p_size")), 4).alias("price_per_size"),
        )
        .orderBy("p_partkey")
        .limit(50)
    )


@query(
    "histogram_order_totals",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) * 50000 AS BIGINT) AS bucket,
           count(*) AS n,
           round(avg(o_totalprice), 2) AS avg_total
    FROM orders GROUP BY 1 ORDER BY 1
    """,
    tags=("tier-b", "histogram", "agg_group"),
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram by floor-division binning — one scan, one
    aggregation shuffle; the binning expression is identical SQL in both
    engines (unlike width_bucket, which DuckDB 1.0 lacks)."""
    t = register_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .groupBy(
            (F.floor(F.col("o_totalprice") / 50000) * 50000)
            .cast("long")
            .alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("o_totalprice"), 2).alias("avg_total"))
        .orderBy("bucket")
    )


@query(
    "variant_props_stats",
    oracle="""
    SELECT event_type,
           min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
           count(CAST(json_extract_string(props, '$.missing') AS INTEGER)) AS n_missing_field
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("tier-b", "json_fns", "variant"),
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type for semi-structured data: parse_json once into
    the binary variant encoding, then typed try_variant_get extractions —
    the modern replacement for repeated string re-parsing (one parse, many
    cheap typed reads; shreds into columnar storage on supported formats).
    try_variant_get on an absent path yields NULL, which count() skips —
    the n_missing_field column pins that missing-path semantics matches
    DuckDB's json_extract_string returning NULL."""
    t = register_tables(spark, sf_dir, ("events",))
    v = F.parse_json("props")
    return (
        t["events"]
        .select(
            "event_type",
            F.try_variant_get(v, "$.k", "int").alias("k"),
            F.try_variant_get(v, "$.missing", "int").alias("missing"),
        )
        .groupBy("event_type")
        .agg(
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.count("missing").alias("n_missing_field"),
        )
        .orderBy("event_type")
    )
