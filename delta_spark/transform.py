"""Column transforms: vectorized text normalization + rename/cast
directives.

Reference analog: per-column transformation directives mutating row
values and schema (/root/reference/delta-api/src/main/java/io/cdap/
delta/api/transformation/Transformation.java:27-58, applied per event
in DeltaWorker.transformDMLEvent:507-543). Here transforms are
DataFrame→DataFrame functions over the whole micro-batch:

  * built-in ``pyspark.sql.functions`` where expressible (JVM-side,
    whole-stage codegen) — the hot path
  * Arrow-batched pandas UDFs where genuinely not (unicode NFC
    normalization) — never row-at-a-time Python
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def make_nfc_normalize():
    """Unicode NFC normalization — not expressible in built-in Spark
    SQL functions, so it runs as an Arrow-batched pandas UDF (the
    reference's row-at-a-time Transformation.transformValue becomes a
    columnar batch op). Built inside a factory so cloudpickle ships the
    closure by value (executors don't need delta_spark importable)."""

    @F.pandas_udf(T.StringType())
    def nfc_normalize(s: pd.Series) -> pd.Series:
        import unicodedata as _ud

        return s.map(lambda x: _ud.normalize("NFC", x) if x is not None else None)

    return nfc_normalize


def normalize_text_expr(col: str):
    """JVM-side text cleanup: trim, collapse whitespace runs, strip
    control chars. Stays inside whole-stage codegen — preferred over
    any UDF when NFC isn't required."""
    c = F.regexp_replace(F.col(col), r"[\p{Cntrl}]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


class Directive:
    """One column directive; an ordered list forms the transform chain
    (reference: DefaultDirective / TransformationUtil.transformValue)."""

    def apply(self, df: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError


class NormalizeText(Directive):
    def __init__(self, col: str = "text", nfc: bool = False):
        self.col, self.nfc = col, nfc

    def apply(self, df: DataFrame) -> DataFrame:
        out = df.withColumn(
            self.col,
            F.when(F.col(self.col).isNotNull(), normalize_text_expr(self.col)),
        )
        if self.nfc:
            out = out.withColumn(self.col, make_nfc_normalize()(F.col(self.col)))
        return out


class RenameColumn(Directive):
    def __init__(self, old: str, new: str):
        self.old, self.new = old, new

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumnRenamed(self.old, self.new)


class CastColumn(Directive):
    def __init__(self, col: str, to: str):
        self.col, self.to = col, to

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.col, F.col(self.col).cast(self.to))


class ScrubPII(Directive):
    """Redact emails/phones/IPs/SSNs at ingest — the curation library's
    scrub (functions/text.py PII_PATTERNS) as a CDC transform directive,
    so sensitive spans never land in the lake table at all. Pure JVM
    regexp_replace chain inside whole-stage codegen; NULLs (tombstones)
    pass through untouched."""

    def __init__(self, col: str = "text"):
        self.col = col

    def apply(self, df: DataFrame) -> DataFrame:
        from .functions.text import pii_scrub

        return df.withColumn(self.col, pii_scrub(self.col))


class SetValue(Directive):
    def __init__(self, col: str, value):
        self.col, self.value = col, value

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.col, F.lit(self.value))


def chain(directives: list[Directive]):
    """Compose directives into one batch transform, applied in order
    (reference applies the directive list per event in order —
    DeltaWorker.transform:527-543)."""

    def _apply(df: DataFrame) -> DataFrame:
        for d in directives:
            df = d.apply(df)
        return df

    return _apply
