"""JSON Schema -> Spark StructType (E3) and permissive JSON parsing
with corrupt-record quarantine (R1, parse path).

The reference generates POJOs from JSON Schema at build time
(``model-json/pom.xml:35-50``; schemas ``Purchase.json``,
``CountAndTotal.json``). Here the same schema document becomes a
``StructType`` at runtime — one converter instead of codegen.

Type mapping follows jsonschema2pojo's defaults for the reference's
schemas: integer -> long, number -> double, string, boolean, array,
object (nested struct). Fields listed in ``required`` become
non-nullable markers (informational; Spark parsing is permissive).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCALARS = {
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
}


def json_schema_to_struct(schema: dict[str, Any]) -> T.StructType:
    if schema.get("type") != "object":
        raise ValueError(f"top-level schema must be an object, got {schema.get('type')!r}")
    required = set(schema.get("required", ()))
    fields = [
        T.StructField(name, _convert(sub), nullable=name not in required)
        for name, sub in schema.get("properties", {}).items()
    ]
    return T.StructType(fields)


def _convert(schema: dict[str, Any]) -> T.DataType:
    t = schema.get("type")
    if t in _SCALARS:
        return _SCALARS[t]
    if t == "array":
        return T.ArrayType(_convert(schema.get("items", {"type": "string"})))
    if t == "object":
        return json_schema_to_struct(schema)
    raise ValueError(f"unsupported JSON-Schema type: {t!r}")


CORRUPT_COL = "_corrupt_record"


def parse_json_permissive(
    df: DataFrame, json_col: str, struct: T.StructType
) -> DataFrame:
    """``from_json`` in PERMISSIVE mode with a corrupt-record column —
    the declarative form of the reference's skip-bad-records policy:
    unparseable payloads land in ``_corrupt_record`` instead of
    killing a stream thread."""
    with_corrupt = T.StructType(
        [*struct.fields, T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    parsed = F.from_json(
        F.col(json_col),
        with_corrupt,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    return df.withColumn("_parsed", parsed).select(
        "*", "_parsed.*"
    ).drop("_parsed")


def good_records(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def quarantined_records(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col(CORRUPT_COL).isNotNull())
