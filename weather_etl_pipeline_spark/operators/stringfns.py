"""String scalar-function family (extension of the F-* function surface).

The reference needs no string functions beyond casts; any analytics
engine does. One projection covers the toolbox — case mapping, padding,
substring/split access, search position, character translation,
concatenation, reversal — all JVM-side built-ins evaluated inside
whole-stage codegen (pure map stage, no shuffle, scan-speed at scale).

Cross-dialect notes (verified): Spark ``instr`` ≡ DuckDB ``strpos``
(1-based, 0 when absent); ``split_part`` / ``translate`` / ``lpad`` /
``reverse`` agree by name; Spark ``format_string('%s|%s', …)`` is
spelled ``concat_ws('|', …)`` portably on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "string_function_profile",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
       split_part(p_name, ' ', 1) AS first_word,
       split_part(p_name, ' ', 2) AS second_word,
       CAST(strpos(p_name, 'e') AS INT) AS first_e_pos,
       translate(p_type, 'AEIOU', 'aeiou') AS type_lower_vowels,
       concat_ws('|', p_brand, p_type) AS brand_type,
       reverse(p_brand) AS brand_rev,
       CAST(length(p_name) - length(replace(p_name, ' ', '')) + 1 AS INT)
         AS n_words
FROM part
""",
)
def string_function_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.instr(F.col("p_name"), "e").cast("int").alias("first_e_pos"),
        F.translate(F.col("p_type"), "AEIOU", "aeiou").alias("type_lower_vowels"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        (
            F.length("p_name")
            - F.length(F.replace(F.col("p_name"), F.lit(" "), F.lit("")))
            + F.lit(1)
        )
        .cast("int")
        .alias("n_words"),
    )
