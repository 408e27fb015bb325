"""Generic failed-record skip policy — R1 in its general form.

The reference's uncaught-exception handler skips ANY record whose
processing throws: it logs the captured topic/partition/offset,
commits the failed offset, and replaces the stream thread so
processing continues (``resilience/ReplaceThreadExceptionHandler.java:
8-17``, exercised by piping ``moo / quack / moo moo moo`` and
asserting the stream survives, ``ReplaceThreadTests.java:124-166``).

Spark already covers the *parse/cast* failure classes declaratively
(``from_json`` PERMISSIVE + quarantine, ``try_*`` expressions —
``functions/json_schema.py``), and those stay the hot path: they run
inside whole-stage codegen. This module is the escape hatch for the
remaining class — an arbitrary user function that may throw on some
records. The convention:

- ``@failsafe(return_type)`` wraps a scalar Python function into an
  Arrow-batched pandas UDF returning ``struct(result, _udf_error)``.
  A throwing record yields ``result = null`` and the exception text;
  it never kills the task (Spark task retries would re-throw
  deterministically and fail the stream — retry is NOT skip).
- ``apply_failsafe(df, out_col, wrapped, *in_cols)`` splits the frame
  into (good, quarantined): good rows carry ``out_col``; quarantined
  rows keep EVERY original column — including Kafka metadata columns
  (topic/partition/offset), which is the reference handler's log line
  as data — plus ``_udf_error``. In streaming, write the quarantine
  side to a dead-letter sink inside ``foreachBatch``.

The per-element try/except loop is the honest cost of catching
arbitrary Python exceptions; batches still move driver<->executor via
Arrow. Anything expressible as built-in expressions should not be
here — this is the wrapper SURVEY §7 ("hard part 2") promises for the
cases that can't.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

ERROR_COL = "_udf_error"
_TMP = "_failsafe"


def failsafe(return_type: T.DataType) -> Callable:
    """Decorator: ``fn(*scalars) -> value`` becomes a pandas UDF whose
    output is ``struct(result: return_type, _udf_error: string)``."""

    def deco(fn: Callable):
        out_t = T.StructType(
            [
                T.StructField("result", return_type, True),
                T.StructField(ERROR_COL, T.StringType(), True),
            ]
        )

        @pandas_udf(out_t)
        def wrapped(*cols: pd.Series) -> pd.DataFrame:
            results, errors = [], []
            for vals in zip(*cols):
                try:
                    results.append(fn(*vals))
                    errors.append(None)
                except Exception as ex:  # noqa: BLE001 — the policy IS catch-all
                    results.append(None)
                    errors.append(f"{type(ex).__name__}: {ex}")
            return pd.DataFrame({"result": results, ERROR_COL: errors})

        return wrapped

    return deco


def apply_failsafe(
    df: DataFrame,
    out_col: str,
    wrapped,
    *input_cols: str | Column,
) -> tuple[DataFrame, DataFrame]:
    """Apply a ``@failsafe`` UDF and split into (good, quarantined).

    good: original columns + ``out_col`` (only rows where the function
    succeeded). quarantined: original columns + ``_udf_error`` — the
    dropped records with full provenance, the analog of the
    reference's handler log + committed-skip."""
    cols = [F.col(c) if isinstance(c, str) else c for c in input_cols]
    applied = df.withColumn(_TMP, wrapped(*cols))
    good = (
        applied.filter(F.col(f"{_TMP}.{ERROR_COL}").isNull())
        .withColumn(out_col, F.col(f"{_TMP}.result"))
        .drop(_TMP)
    )
    quarantined = (
        applied.filter(F.col(f"{_TMP}.{ERROR_COL}").isNotNull())
        .withColumn(ERROR_COL, F.col(f"{_TMP}.{ERROR_COL}"))
        .drop(_TMP)
    )
    return good, quarantined
