"""JSON extraction operators (extension surface X-json).

The reference flattens JSON driver-side with pandas (``bronze.py:15``);
the engine-native form is ``get_json_object`` / ``from_json`` evaluated
JVM-side inside codegen. At 100 TB, prefer ``from_json`` with a declared
schema once per pipeline (parse-once, then columnar) over repeated
path extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..functions.exact import hround, spark_hround
from ..registry import register

# --- path extraction + aggregate ---------------------------------------------


@register(
    "json_extract_agg",
    headline=True,
    oracle="""
WITH kx AS (
  -- "k" counts only when it is an INTEGRAL JSON NUMBER — the exact
  -- semantics of Spark's from_json('k long') (Jackson refuses string
  -- and float coercion). A bare CAST(json_extract_string(...)) would
  -- silently diverge on adversarial data: DuckDB rounds '2.9' to 3
  -- and coerces "5" to 5 where Spark yields NULL for both. Pinned
  -- cross-engine in tests/test_json_extract_semantics.py.
  SELECT event_type,
         -- TRY_CAST, not CAST: DuckDB types every NON-NEGATIVE integer
         -- as UBIGINT, so values past int64 reach the cast arm — where
         -- from_json('k long') yields NULL, a plain CAST would error
         -- out of the whole harness; TRY_CAST nulls them identically
         CASE WHEN json_type(TRY_CAST(props AS JSON), '$.k')
                   IN ('BIGINT', 'UBIGINT')
              THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS k
  FROM events
)
SELECT event_type,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       FLOOR((CAST(SUM(k) AS DOUBLE) / COUNT(k)) * 1000000.0 + 0.5)
         / 1000000.0 AS avg_k,
       COUNT(*) AS n_events
FROM kx
GROUP BY event_type
""",
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Parse ONCE per row, projected below the aggregate: aggregate
    # expressions are evaluated independently (no cross-aggregate
    # subexpression elimination), so an inline get_json_object ran the
    # JSON parser 3× per row — and its JSON-path parser is ~6× slower
    # than from_json's Jackson struct parse to begin with. Measured at
    # sf0.1@x100 (10M rows): 17.0s → 2.9s warm. Null semantics match
    # the oracle's json_extract_string → CAST: missing key, malformed
    # JSON, and non-numeric k all yield NULL.
    ev = load_table(spark, sf_dir, "events")
    # string-twin construction (round 15, same discipline as round 14):
    # identical parsed trees, one parser trip per expression instead of
    # a py4j round trip per F.* call
    rows = ev.selectExpr(
        "event_type", "from_json(props, 'k long').k AS k"
    )
    return rows.groupBy("event_type").agg(
        F.expr("SUM(k)").alias("sum_k"),
        F.expr(spark_hround("CAST(SUM(k) AS DOUBLE) / COUNT(k)")).alias(
            "avg_k"
        ),
        F.expr("COUNT(1)").alias("n_events"),
    )


# --- declared-schema parse (from_json) + filter ------------------------------

_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])


@register(
    "json_schema_filter",
    oracle="""
-- integral-number guard = from_json('k long') semantics (see
-- json_extract_agg; pinned in tests/test_json_extract_semantics.py)
SELECT event_id, event_type, k FROM (
  SELECT event_id, event_type,
         -- TRY_CAST, not CAST: DuckDB types every NON-NEGATIVE integer
         -- as UBIGINT, so values past int64 reach the cast arm — where
         -- from_json('k long') yields NULL, a plain CAST would error
         -- out of the whole harness; TRY_CAST nulls them identically
         CASE WHEN json_type(TRY_CAST(props AS JSON), '$.k')
                   IN ('BIGINT', 'UBIGINT')
              THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS k
  FROM events
) t WHERE k > 80
""",
)
def json_schema_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("_props", F.from_json("props", _PROPS_SCHEMA))
    return (
        parsed.filter(F.col("_props.k") > 80)
        .select("event_id", "event_type", F.col("_props.k").alias("k"))
    )


# --- JSON → MAP explode (schema-on-read for open key sets) -------------------
# When the props key set is NOT known ahead of time, parse to
# map<string,long> and explode to (key, value) rows — the EAV shape for
# downstream pivots. Parse-once map semantics beat repeated
# get_json_object paths at 100 TB (one JSON parse per row, columnar
# after). The explode multiplies rows by keys-per-row (bounded by the
# payload), then the rollup is an ordinary map-side-combinable agg.


@register(
    "json_map_explode_rollup",
    oracle="""
WITH kv AS (
  SELECT event_type,
         unnest(map_entries(TRY_CAST(TRY_CAST(props AS JSON)
                                     AS MAP(VARCHAR, VARCHAR)))) AS e
  FROM events
  WHERE props IS NOT NULL
)
SELECT event_type, e.key AS prop_key,
       COUNT(*) AS n,
       CAST(SUM(TRY_CAST(e.value AS BIGINT)) AS BIGINT) AS sum_val,
       CAST(MIN(TRY_CAST(e.value AS BIGINT)) AS BIGINT) AS min_val,
       CAST(MAX(TRY_CAST(e.value AS BIGINT)) AS BIGINT) AS max_val
FROM kv
WHERE regexp_matches(e.value, '^-?[0-9]+$')
GROUP BY event_type, e.key
""",
)
def json_map_explode_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Integral-value guard (the json_extract_agg semantics class, map
    # form): a float or string-typed map value would otherwise diverge —
    # Spark's map<.,long> parse nulls the entry where DuckDB's MAP cast
    # rounds/coerces ("2.9" → null vs 3). Both engines therefore parse
    # the map as STRING values and keep only integral literals
    # (^-?[0-9]+$), so every aggregated value is integer-exact
    # cross-engine on ANY payload, adversarial ones included (matrix in
    # tests/test_json_extract_semantics.py). Malformed props: DuckDB's
    # TRY_CAST(.. AS JSON) nulls the row like from_json's null map.
    ev = load_table(spark, sf_dir, "events")
    kv = (
        ev.filter(F.col("props").isNotNull())
        .select(
            "event_type",
            F.explode(
                F.from_json("props", T.MapType(T.StringType(), T.StringType()))
            ).alias("prop_key", "prop_val"),
        )
        # try_cast: an integral literal can still overflow int64
        # ("9223372036854775808" passes the regex) — both engines null
        # it rather than erroring (TRY_CAST mirrored in the oracle);
        # an overflowed entry still counts in n but not the aggregates
        .filter(F.col("prop_val").rlike("^-?[0-9]+$"))
        .withColumn("prop_val", F.col("prop_val").try_cast("long"))
    )
    return kv.groupBy("event_type", "prop_key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("prop_val").alias("sum_val"),
        F.min("prop_val").alias("min_val"),
        F.max("prop_val").alias("max_val"),
    )


# --- VariantType extraction (Spark 4 semi-structured fast path) --------------
# VARIANT is Spark 4's answer to schema-on-read JSON: parse once into a
# binary semi-structured value, then path-extract without re-parsing —
# at 100 TB the parse cost dominates repeated get_json_object, and
# columnar variant storage (shredding) keeps extraction vectorized.
# The oracle replays the same extraction with DuckDB's JSON path API —
# the VALUES are engine-independent even though the encodings differ.


@register(
    "variant_extract_agg",
    oracle="""
WITH kx AS (
  -- integral-string guard on BOTH engines: try_variant_get(..,'long')
  -- coerces "5"->5 and TRUNCATES 2.9->2 while DuckDB's CAST rounds
  -- 2.9->3 — extracting as string and accepting only ^-?[0-9]+$ pins
  -- one semantic cross-engine (tests/test_json_extract_semantics.py)
  SELECT event_type,
         CASE WHEN regexp_matches(
                json_extract_string(TRY_CAST(props AS JSON), '$.k'),
                '^-?[0-9]+$')
              THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS k
  FROM events
)
SELECT event_type,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(COUNT(k) AS BIGINT) AS n_k
FROM kx
GROUP BY event_type
""",
)
def variant_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # VARIANT path (vs json_extract_agg's declared-schema from_json):
    # try_parse_json — NOT parse_json, whose ANSI error on one malformed
    # row would kill the whole query — then extract k as a STRING and
    # accept only integral literals. Projected once below the aggregate
    # (design rule 3 / the json_extract_agg lesson).
    ev = load_table(spark, sf_dir, "events")
    k_str = F.try_variant_get(F.try_parse_json("props"), "$.k", "string")
    k = F.when(k_str.rlike("^-?[0-9]+$"), k_str.try_cast("long"))
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("k").cast("long").alias("n_k"),
        )
    )


# --- redaction / scrubbing (PII-pipeline shape) ------------------------------
# Training-data pipelines scrub sensitive spans (numbers, emails, ids)
# before corpus assembly. The engine shape is a map-only projection:
# regexp_replace + regexp_count inside whole-stage codegen — at 100 TB
# this runs at scan speed, no shuffle, and the pattern set is a config
# constant broadcast with the plan. Digit runs stand in for the pattern
# family here because the synthetic corpus carries them in ``props``;
# real deployments swap in the compiled PII alternation.


@register(
    "props_redact_pii",
    oracle="""
SELECT event_id,
       regexp_replace(props, '[0-9]+', '#', 'g') AS props_redacted,
       CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT) AS n_redacted
FROM events
""",
)
def props_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_replace("props", "[0-9]+", "#").alias("props_redacted"),
        F.regexp_count("props", F.lit("[0-9]+")).cast("int").alias("n_redacted"),
    )
