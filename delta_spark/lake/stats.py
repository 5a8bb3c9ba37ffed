"""Manifest column-bounds stats: the shared, Spark-free half.

Per-file min/max values (Iceberg column bounds analog) live in
manifest entries as ``{"stats": {"<field_id>": [min, max]}}``, keyed
by FIELD ID so renames never invalidate them. Values are stored in a
JSON-safe, totally-ordered domain (ints/floats/strings as-is,
timestamps as epoch micros); both the Spark reader
(lake/table.py ``read(ranges=...)``) and the DuckDB interop reader
(lake/interop.py) plan file skips from the same two functions here.
"""

from __future__ import annotations

import datetime


def stat_encode(type_str: str, v):
    """Encode a column value (parquet-footer statistic or user-supplied
    range bound) into the manifest stats domain. Strings over 256 chars
    are dropped (an over-long bound can't be stored compactly and a
    missing stat only disables skipping, never correctness). Returns
    None for values that can't be bounded (the file is then never
    skipped on this column)."""
    if v is None:
        return None
    if isinstance(v, bytes):
        try:
            v = v.decode("utf-8")
        except Exception:
            return None
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return (v - datetime.datetime(1970, 1, 1)) // datetime.timedelta(
            microseconds=1
        )
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, str):
        return v if len(v) <= 256 else None
    return None


def stats_exclude(st, lo, hi) -> bool:
    """True iff a file whose [min, max] is ``st`` can hold NO value in
    [lo, hi] (either bound may be None = open). Any doubt → False."""
    if not st or st[0] is None or st[1] is None:
        return False
    try:
        if hi is not None and st[0] > hi:
            return True
        if lo is not None and st[1] < lo:
            return True
    except TypeError:  # mixed-type comparison: never skip
        return False
    return False


def normalize_ranges(ranges: dict) -> dict[str, list[tuple]]:
    """Normalize a ranges spec to column → list of inclusive (lo, hi)
    intervals (UNION semantics). Accepted per-column values: one
    ``(lo, hi)`` tuple, or a list of such tuples. A point-lookup over k
    values passes ``[(v, v) for v in values]`` so stats pruning skips
    every file whose bounds straddle none of the k points — a single
    (min, max) envelope spanning the key domain would skip nothing."""
    out: dict[str, list[tuple]] = {}
    for colname, spec in ranges.items():
        if isinstance(spec, tuple) and len(spec) == 2:
            ivals = [spec]
        elif isinstance(spec, list) and spec and all(
            isinstance(iv, (tuple, list)) and len(iv) == 2 for iv in spec
        ):
            ivals = [tuple(iv) for iv in spec]
        elif (
            # back-compat: a bare 2-element list of scalars is ONE
            # interval (the pre-list-of-intervals calling convention)
            isinstance(spec, list)
            and len(spec) == 2
            and not any(isinstance(x, (tuple, list)) for x in spec)
        ):
            ivals = [tuple(spec)]
        else:
            raise ValueError(
                f"range for {colname!r} must be a (lo, hi) tuple or a "
                f"non-empty list of them, got {spec!r}"
            )
        out[colname] = ivals
    return out


def prune_files(files: list[dict], cur_fields: list[dict], key_ids, ranges: dict) -> list[dict]:
    """Apply range file-skipping to a manifest entry list under the
    MoR safety rules: key columns always (every version of a key shares
    its value), non-key columns only when the snapshot holds no delta
    files (a base row may be superseded by a delta row whose new value
    re-enters the range). A column's spec may be a single (lo, hi) or a
    list of intervals (union): a file survives if ANY interval
    intersects its bounds. Row-level filtering stays the caller's job."""
    by_name = {f["name"]: f for f in cur_fields}
    key_ids = set(key_ids)
    has_delta = any(f.get("kind") == "delta" for f in files)
    for colname, ivals in normalize_ranges(ranges).items():
        fld = by_name.get(colname)
        if fld is None:
            raise ValueError(f"range column {colname!r} not in schema")
        if not (fld["id"] in key_ids or not has_delta):
            continue
        enc = [
            (stat_encode(fld["type"], lo), stat_encode(fld["type"], hi))
            for lo, hi in ivals
        ]
        fid = str(fld["id"])
        files = [
            f
            for f in files
            if not all(
                stats_exclude(f.get("stats", {}).get(fid), lo_e, hi_e)
                for lo_e, hi_e in enc
            )
        ]
    return files
