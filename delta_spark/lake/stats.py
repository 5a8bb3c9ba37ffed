"""Manifest column-bounds stats: the shared, Spark-free half.

Per-file min/max values (Iceberg column bounds analog) live in
manifest entries as ``{"stats": {"<field_id>": [min, max]}}``, keyed
by FIELD ID so renames never invalidate them. Values are stored in a
JSON-safe, totally-ordered domain (ints/floats/strings as-is,
timestamps as epoch micros); both the Spark reader
(lake/table.py ``read(ranges=...)``) and the DuckDB interop reader
(lake/interop.py) plan file skips from the same functions here.

Per-file membership sketches (Iceberg puffin blob / parquet bloom
filter analog) may additionally live in entries as
``{"sketch": {"<field_id>": {"m": bits, "k": hashes, "t": hashed-type,
"b": base64}}}``
— built by a DISTRIBUTED Spark job (``LakeTable.compute_sketches``),
consulted here for point intervals only. Bit positions derive from
ONE Spark ``xxhash64`` per value (Kirsch–Mitzenmacher double hashing
on its two 32-bit halves), reproduced driver-side by the pinned
pure-Python XXH64, so membership tests need no Spark session.
"""

from __future__ import annotations

import base64
import datetime

try:
    from .xxh import spark_xxhash64
except ImportError:
    # loaded standalone by path (a consumer may vendor just the
    # Spark-free files; interop.py's import-poisoned subprocess test
    # exercises this): pull the stdlib-only sibling in by path too
    import importlib.util as _ilu
    import os as _os

    _spec = _ilu.spec_from_file_location(
        "_delta_spark_lake_xxh",
        _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "xxh.py"),
    )
    _mod = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_mod)
    spark_xxhash64 = _mod.spark_xxhash64

# column types whose values a driver-side probe can hash EXACTLY the
# way Spark's xxhash64 expression hashes the column (lake/xxh.py is
# pinned bit-for-bit against Spark by test); membership sketches are
# only offered on these. timestamp/date probes are converted to
# Spark's internal long/int encodings (epoch micros / epoch days)
# before hashing.
SKETCH_TYPES = frozenset(
    {"string", "varchar", "bigint", "long", "timestamp", "int",
     "integer", "smallint", "tinyint", "date"}
)


def sketch_hash(type_str: str, value):
    """(lo32, step) double-hashing seeds for a point probe, or None if
    this (type, value) pair can't be hashed exactly like Spark's
    ``xxhash64(cast(col as type))`` — None only disables sketch
    pruning, never correctness. Bit positions are
    ``(lo32 + i * step) % m`` for i in 0..k-1 (Kirsch–Mitzenmacher on
    the two halves of ONE xxhash64, so the Spark-side builder needs a
    single hash expression per row)."""
    t = (type_str or "").lower()
    if t not in SKETCH_TYPES or value is None or isinstance(value, bool):
        return None
    if t == "timestamp":
        if isinstance(value, datetime.datetime):
            if value.tzinfo is not None:
                value = value.astimezone(datetime.timezone.utc).replace(
                    tzinfo=None
                )
            value = (value - datetime.datetime(1970, 1, 1)) // (
                datetime.timedelta(microseconds=1)
            )
        elif not isinstance(value, int):
            return None
    elif t == "date":
        if isinstance(value, datetime.datetime):
            return None  # ambiguous: a datetime is not a date probe
        if isinstance(value, datetime.date):
            value = (value - datetime.date(1970, 1, 1)).days
        elif not isinstance(value, int):
            return None
    try:
        h = spark_xxhash64(value, coltype=t)
    except (TypeError, OverflowError, UnicodeError):
        return None
    u = h & 0xFFFFFFFFFFFFFFFF
    return (u & 0xFFFFFFFF, (u >> 32) | 1)


def sketch_positions(lo: int, step: int, m: int, k: int) -> list[int]:
    """The k bloom bit positions for a (lo, step) probe — the same
    arithmetic the Spark-side builder evaluates as column expressions
    (all operands < 2^36, so bigint math never overflows there)."""
    return [(lo + i * step) % m for i in range(k)]


def sketch_contains(sk: dict, lo: int, step: int) -> bool:
    """Membership test against one manifest sketch
    ``{"m": bits, "k": hashes, "b": base64 bitmap}``. True = maybe
    present (or the sketch is unreadable — any doubt keeps the file);
    False = DEFINITELY absent, the file can be skipped."""
    try:
        m, k = int(sk["m"]), int(sk["k"])
        bits = base64.b64decode(sk["b"])
        if m <= 0 or k <= 0 or len(bits) * 8 < m:
            return True
        for pos in sketch_positions(lo, step, m, k):
            if not (bits[pos >> 3] >> (pos & 7)) & 1:
                return False
        return True
    except Exception:
        return True


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
    intersects its bounds. Point intervals (lo == hi) additionally
    consult the file's membership sketch when one was computed
    (``LakeTable.compute_sketches``, Iceberg puffin-blob analog):
    in-bounds but sketch-negative files are skipped too — the payoff
    for point lookups on columns whose per-file [min, max] spans the
    probe. Row-level filtering stays the caller's job."""
    by_name = {f["name"]: f for f in cur_fields}
    key_ids = set(key_ids)
    has_delta = any(f.get("kind") == "delta" for f in files)
    for colname, ivals in normalize_ranges(ranges).items():
        fld = by_name.get(colname)
        if fld is None:
            raise ValueError(f"range column {colname!r} not in schema")
        if not (fld["id"] in key_ids or not has_delta):
            continue
        enc = []
        for lo, hi in ivals:
            probe = None
            if lo is not None and hi is not None and lo == hi:
                probe = sketch_hash(fld["type"], lo)
            enc.append(
                (stat_encode(fld["type"], lo), stat_encode(fld["type"], hi), probe)
            )
        fid = str(fld["id"])

        ftype = (fld["type"] or "").lower()

        def _excludes(f, lo_e, hi_e, probe):
            if stats_exclude(f.get("stats", {}).get(fid), lo_e, hi_e):
                return True
            if probe is not None:
                sk = f.get("sketch", {}).get(fid)
                # a sketch hashed under a DIFFERENT column type (built
                # before a widen) tests against the wrong bit positions
                # — consulting it would produce false "definitely
                # absent" verdicts; treat as unsketched instead
                if (
                    sk is not None
                    and sk.get("t") == ftype
                    and not sketch_contains(sk, *probe)
                ):
                    return True
            return False

        files = [
            f
            for f in files
            if not all(_excludes(f, lo_e, hi_e, pr) for lo_e, hi_e, pr in enc)
        ]
    return files
