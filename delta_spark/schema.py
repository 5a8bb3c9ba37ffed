"""Event + applied-table schemas and op enums.

Mirrors the reference's event model (not its classes):
  * DML ops  — reference ``DMLOperation.Type`` (INSERT/UPDATE/DELETE),
    /root/reference/delta-api/src/main/java/io/cdap/delta/api/DMLOperation.java:31-35
  * DDL ops  — reference ``DDLOperation.Type``,
    DDLOperation.java:30-38 (we keep the schema-evolution subset the
    north rule needs: add / rename / widen)
  * Sequenced events — Sequenced.java:26-53 (``seq`` column here)
  * snapshot flag / ingest ts — ChangeEvent.java:27,43-45,
    DMLEvent.java:37-40
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- ops

DML_INSERT = "INSERT"
DML_UPDATE = "UPDATE"
DML_DELETE = "DELETE"
DML_OPS = (DML_INSERT, DML_UPDATE, DML_DELETE)

DDL_ADD_COLUMN = "ADD_COLUMN"
DDL_RENAME_COLUMN = "RENAME_COLUMN"
DDL_WIDEN_COLUMN = "WIDEN_COLUMN"
DDL_DROP_COLUMN = "DROP_COLUMN"
DDL_OPS = (DDL_ADD_COLUMN, DDL_RENAME_COLUMN, DDL_WIDEN_COLUMN, DDL_DROP_COLUMN)

# table-level DDL (reference DDLOperation.Type also carries
# CREATE/DROP/TRUNCATE/RENAME TABLE — DDLOperation.java:30-38; handled
# by the multi-table pipeline against the Catalog)
DDL_CREATE_TABLE = "CREATE_TABLE"
DDL_DROP_TABLE = "DROP_TABLE"
DDL_TRUNCATE_TABLE = "TRUNCATE_TABLE"
DDL_RENAME_TABLE = "RENAME_TABLE"
TABLE_DDL_OPS = (
    DDL_CREATE_TABLE,
    DDL_DROP_TABLE,
    DDL_TRUNCATE_TABLE,
    DDL_RENAME_TABLE,
)
# database-level DDL (reference: DDLOperation.Type CREATE_DATABASE /
# DROP_DATABASE — DDLOperation.java:30-38). A table's database is its
# dotted prefix ("db.table"), "default" otherwise.
DDL_CREATE_DATABASE = "CREATE_DATABASE"
DDL_DROP_DATABASE = "DROP_DATABASE"
DATABASE_DDL_OPS = (DDL_CREATE_DATABASE, DDL_DROP_DATABASE)
# control rows the multi-table pipeline sequences between DML segments
CONTROL_DDL_OPS = (*TABLE_DDL_OPS, *DATABASE_DDL_OPS)
ALL_DDL_OPS = (*DDL_OPS, *CONTROL_DDL_OPS)

# ------------------------------------------------- applied-table shape
# BASELINE.json input_hint: conv_id:string, turn_idx:int32, role:string,
# text:string, tool:string, ts:timestamp. PK = (conv_id, turn_idx).

KEY_COLS = ["conv_id", "turn_idx"]

TRANSCRIPT_FIELDS = [
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
]
TRANSCRIPT_SCHEMA = T.StructType(TRANSCRIPT_FIELDS)

# ------------------------------------------------------ changelog shape
# FIXTURES.md §2; one row per change event, replayed in seq order.

CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        *TRANSCRIPT_FIELDS,
        T.StructField("prev_text", T.StringType(), True),
        T.StructField("is_snapshot", T.BooleanType(), False),
        T.StructField("ingest_ts", T.TimestampType(), True),
        T.StructField("ddl", T.StringType(), True),  # JSON for DDL rows
    ]
)

PAYLOAD_COLS = [f.name for f in TRANSCRIPT_FIELDS]

# widening lattice for DDL_WIDEN_COLUMN (reference standardizes types
# at assessment time, delta-api/.../assessment/TableRegistry.java:64-70).
# int->bigint / int->double / float->double are loss-free. bigint->double
# is the ONE standard-SQL widening kept despite precision loss above
# 2^53 — assess_table labels it PARTIAL, not YES. int->float (lossy
# above 2^24) is deliberately NOT legal.
WIDENINGS = {
    ("int", "bigint"),
    ("int", "double"),
    ("float", "double"),
    ("bigint", "double"),  # lossy >2^53; flagged PARTIAL at assessment
}


def can_widen(src: str, dst: str) -> bool:
    return (src, dst) in WIDENINGS
