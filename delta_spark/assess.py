"""Design-time assessment: schema-compat checks before deploying a
pipeline (reference: Assessor.assessTable/assessPipeline,
/root/reference/delta-app/src/main/java/io/cdap/delta/app/service/
Assessor.java:141-268, column merge :356-410; support levels
ColumnSupport.java:22; problems Problem.java:24-31).

The REST/draft plumbing around the reference's assessor is CDAP
platform machinery (SURVEY.md §7.4 non-goal); the semantics — can this
source schema replicate into this target, column by column — live
here as plain functions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from .lake import LakeTable
from .schema import WIDENINGS

# types the engine carries end-to-end (reference de-facto list:
# DMLEvent.java:166-196 size-accounting switch)
SUPPORTED = {"string", "int", "bigint", "float", "double", "boolean", "timestamp", "binary", "date"}

YES, PARTIAL, NO = "YES", "PARTIAL", "NO"


@dataclass
class ColumnAssessment:
    name: str
    source_type: str
    target_type: str | None
    support: str
    suggestion: str | None = None


@dataclass
class TableAssessment:
    columns: list[ColumnAssessment] = field(default_factory=list)
    problems: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.problems and all(c.support != NO for c in self.columns)


def _compat(src: str, dst: str) -> str:
    if src == dst:
        return YES
    if (src, dst) in WIDENINGS:
        return PARTIAL  # widening cast applied on write (bigint->double lossy >2^53)
    return NO


def assess_table(
    source_schema: T.StructType,
    key_cols: list[str],
    target: LakeTable | None = None,
    selected_columns: list[str] | None = None,
) -> TableAssessment:
    """Column-by-column support merge (reference: Assessor.merge).
    With no target table, assesses source-side supportability only;
    with one, checks name/type compatibility against its current
    schema (renames are invisible here by design — they're DDL)."""
    out = TableAssessment()
    names = {f.name for f in source_schema.fields}
    for k in key_cols:
        if k not in names:
            out.problems.append(f"primary key column '{k}' missing from source")
    if selected_columns is not None:
        missing_keys = [k for k in key_cols if k not in selected_columns]
        # reference: unselected PK columns are flagged
        # (Assessor.java:291-312)
        for k in missing_keys:
            out.problems.append(f"primary key column '{k}' not in selected columns")
    tgt_fields = (
        {f["name"]: f["type"] for f in target.fields} if target is not None else None
    )
    for f in source_schema.fields:
        if selected_columns is not None and f.name not in selected_columns:
            continue
        st = f.dataType.simpleString()
        if st not in SUPPORTED:
            out.columns.append(
                ColumnAssessment(f.name, st, None, NO, "unsupported type")
            )
            continue
        if tgt_fields is None:
            out.columns.append(ColumnAssessment(f.name, st, None, YES))
        elif f.name not in tgt_fields:
            out.columns.append(
                ColumnAssessment(f.name, st, None, PARTIAL, "ADD_COLUMN DDL required")
            )
        else:
            sup = _compat(st, tgt_fields[f.name])
            out.columns.append(
                ColumnAssessment(
                    f.name,
                    st,
                    tgt_fields[f.name],
                    sup,
                    None if sup == YES else (
                        "widened on write" if sup == PARTIAL else "incompatible types"
                    ),
                )
            )
    return out


def assess_pipeline(
    tables: dict[str, tuple[T.StructType, list[str]]],
    targets: dict[str, LakeTable] | None = None,
) -> dict[str, TableAssessment]:
    """All-tables sweep (reference: Assessor.assessPipeline:201-268)."""
    targets = targets or {}
    return {
        name: assess_table(schema, keys, targets.get(name))
        for name, (schema, keys) in tables.items()
    }
