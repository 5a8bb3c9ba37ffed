"""DuckDB oracle SQL for every SQL-expressible query in queries.py.

Each statement is written to reproduce the Spark result BIT-FOR-BIT:
identical tokenization regexes, md5-based hashes, exact DECIMAL
summation before any float cast, identical rounding, identical
tie-breaks. The only keys absent are the two honestly-approximate ANN
indexes (recall-floor-pinned in tests instead); even the multimodal
decode is oracle-checked, because the synthesized binaries are
closed-form in (doc_id, text length) while Spark genuinely parses the
bytes back.
"""

from __future__ import annotations

from .functions.text import PII_PATTERNS, STOPWORDS, TOKEN_PATTERN

CUTOFF = "2024-01-16 00:00:00"

# ---------------------------------------------------- shared fragments

_TOKS = r"regexp_split_to_array(trim(lower(text)), '\s+')"


def _md5long(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


_SHINGLES = rf"""
toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
sh AS (
  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
  FROM toks, unnest(generate_series(1, len(w)-2)) AS t(i)
  WHERE len(w) >= 3
  UNION ALL
  SELECT doc_id, array_to_string(w, ' ') AS s FROM toks WHERE len(w) < 3
)
"""

# mirrors neardup._mh_ab: one md5 per shingle, per-seed values from the
# affine universal-hash family (a_s*hm + b_s) mod 2^61-1 over hm =
# md5_long(s) mod 1073741789 — bigint-exact in both engines
def _mh_min(s: int) -> str:
    a, b = 2654435761 + 40503 * s, 97 + 1000003 * s
    return f"min(({a} * hm + {b}) % 2147483647) AS mh{s}"


_MINHASH_SIGS = f"""
WITH {_SHINGLES},
hms AS (SELECT doc_id, {_md5long("s")} % 1073741789 AS hm FROM sh),
sigs AS (
  SELECT doc_id, {_mh_min(0)}, {_mh_min(1)}, {_mh_min(2)}, {_mh_min(3)}
  FROM hms GROUP BY doc_id
)
"""


def _stop_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


def _lang_score(lang: str) -> str:
    return (
        f"len(list_filter(w, x -> list_contains({_stop_list(lang)}, x)))"
        f" / greatest(len(w), 1)"
    )


_COSINE_PAIR = """
    round(CAST(sum(CAST(CAST(va[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
      / (sqrt(CAST(sum(CAST(CAST(va[i] AS DOUBLE) * CAST(va[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE))
       * sqrt(CAST(sum(CAST(CAST(vb[i] AS DOUBLE) * CAST(vb[i] AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE))), 4)
"""

_REV = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,6))"
    " * (1 - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(30,12))"
)


# pii_scrub oracle assembled from the SAME pattern list the Spark side
# uses — no literal duplication, no string-escape divergence (a plain
# triple-quoted copy would eat the raw \\b)
_PII_SALT = (
    "coalesce(text,'') || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com or +1-202-555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
)
def _scrub_of(col: str) -> str:
    """The PII-scrub regexp_replace chain over an arbitrary column —
    generated from the SAME pattern list the Spark side applies, in
    the same order (each later pattern sees earlier replacements)."""
    expr = col
    for _n2, _p2, _r2 in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{_p2}', '{_r2}', 'g')"
    return expr


_scrub_expr = _scrub_of("t")


def _tlog(text_expr: str = "props") -> str:
    """The transcript changelog mapping as a ``log`` CTE — the ONE
    definition of conv_id/turn_idx/role/seq/tombstone derivation shared
    by the replay-family oracles below, parameterized only by the text
    expression (the scrub-at-ingest oracle salts it). Extra columns are
    harmless to consumers that project a subset."""
    return f"""log AS (
            SELECT 'c' || user_id AS conv_id,
                   CAST(event_id % 20 AS INT) AS turn_idx,
                   event_type AS role, {text_expr} AS text,
                   CAST(NULL AS VARCHAR) AS tool, ts,
                   event_id AS seq,
                   (event_type = 'error') AS del
            FROM events)"""


_CONV_LWW = """lww AS (
            SELECT conv_id, turn_idx, role, text
            FROM log
            QUALIFY row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1
                AND NOT del)"""


def _curation_chain(
    id_name: str, n_shards: int = 8, top_cap: float = 0.25
) -> str:
    """The curate_corpus CTE chain over a preceding ``src(id, text)``
    CTE: PII scrub → Gopher quality gate (rounded-value thresholds,
    matching repetition_stats) → min-id dedup per normalized
    fingerprint → md5-nibble train split → shard-window packing.
    ``id_name`` aliases the id in the final projection to match the
    Spark side's id column."""
    return f"""
        clean AS (SELECT id, {_scrub_of("text")} AS text FROM src),
        ctok AS (SELECT id, unnest({_TOKS}) AS tok FROM clean),
        cper AS (SELECT id, tok, count(*) AS c
                 FROM ctok GROUP BY id, tok),
        cst AS (SELECT id, CAST(sum(c) AS BIGINT) AS n_tokens,
                       max(c) AS topc, count(*) AS n_distinct,
                       sum(c * length(tok)) AS chars
                FROM cper GROUP BY id),
        keepd AS (SELECT id FROM cst
                  WHERE n_tokens >= 10 AND n_tokens <= 100000
                    AND round(chars / n_tokens, 4) >= 2.0
                    AND round(chars / n_tokens, 4) <= 10.0
                    AND round(1.0 - n_distinct / n_tokens, 4) < 0.93
                    AND round(topc / n_tokens, 4) < {top_cap}),
        kept AS (SELECT clean.id, clean.text
                 FROM clean JOIN keepd USING (id)),
        uniq AS (SELECT id, text FROM (
                   SELECT id, text,
                          min(id) OVER (PARTITION BY
                            md5(trim(regexp_replace(lower(text), '\\s+',
                                                    ' ', 'g')))) AS kid
                   FROM kept) WHERE id = kid),
        train AS (SELECT id, text FROM uniq
                  WHERE substr(md5(CAST(id AS VARCHAR)), 1, 1)
                        NOT IN ('c', 'd', 'e', 'f')),
        laid AS (SELECT id,
                     CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}'))
                          AS BIGINT) AS n_tokens,
                     {_md5long("CAST(id AS VARCHAR)")} % {n_shards} AS shard
                 FROM train)
        SELECT id AS {id_name}, n_tokens, shard,
               CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS bin_start,
               CAST(floor((sum(n_tokens) OVER w - n_tokens) / 512.0)
                    AS BIGINT) AS bin
        FROM laid
        WINDOW w AS (PARTITION BY shard ORDER BY id)
    """


_CURATION_CHAIN = _curation_chain("doc_id")
_PII_HITS = ",\n               ".join(
    f"CAST(len(regexp_extract_all(t, '{_p}')) AS INT) AS n_{_n}"
    for _n, _p, _r in PII_PATTERNS
)
_PII_SCRUB_SQL = f"""
        WITH d AS (
          SELECT doc_id, {_PII_SALT} AS t
          FROM documents)
        SELECT doc_id,
               {_scrub_expr} AS clean_text,
               {_PII_HITS}
        FROM d
"""

ALL_ORACLES: dict[str, str] = {
    # ------------------------------------------------- CDC surface
    "changelog_scan_filter": """
        SELECT event_id, user_id, event_type, value, ts
        FROM events WHERE event_type <> 'error' AND value > 100
    """,
    "lww_latest_state": """
        SELECT user_id, event_id, event_type, value, ts FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
    """,
    "merge_upsert": f"""
        WITH t AS (
          SELECT user_id, event_id, event_type, value, ts FROM events
          WHERE ts < TIMESTAMP '{CUTOFF}'
          QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1),
        b AS (
          SELECT user_id, event_id, event_type, value, ts FROM events
          WHERE ts >= TIMESTAMP '{CUTOFF}'
          QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        SELECT * FROM t WHERE user_id NOT IN (SELECT user_id FROM b)
        UNION ALL
        SELECT * FROM b WHERE event_type <> 'error'
    """,
    "delete_apply": """
        WITH s AS (
          SELECT user_id, event_id, event_type, value, ts FROM events
          QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
        SELECT * FROM s WHERE NOT EXISTS (
          SELECT 1 FROM events e WHERE e.user_id = s.user_id AND e.event_type = 'error')
    """,
    "lww_sortkey_tiebreak": """
        SELECT user_id, event_id // 8 AS coarse_seq, event_id, event_type, value, ts
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id
            ORDER BY (event_id // 8) DESC, ts DESC, event_id DESC) = 1
    """,
    "metrics_by_op": """
        SELECT event_type,
               count(*) AS n,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value,
               min(event_id) AS min_seq,
               max(event_id) AS max_seq
        FROM events GROUP BY event_type
    """,
    "seq_dedup_union": """
        SELECT event_type, count(*) AS n FROM (
          SELECT DISTINCT event_id, event_type FROM (
            SELECT event_id, event_type FROM events
            UNION ALL
            SELECT event_id, event_type FROM events))
        GROUP BY event_type
    """,
    "sessionization": """
        WITH g AS (
          SELECT user_id,
                 floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
          FROM events)
        SELECT user_id, count(*) AS n_events,
               sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)::BIGINT AS n_sessions
        FROM g GROUP BY user_id
    """,
    "hourly_rollup": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*) AS n,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "skew_salted_agg": """
        SELECT user_id, count(*) AS n,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
        FROM events GROUP BY user_id
    """,
    "watermark_dedup_stream": """
        SELECT event_id, user_id, event_type FROM events
    """,
    "multi_table_replay": """
        SELECT 't' || (user_id % 3) AS tbl, user_id, event_type, value, ts
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
            AND event_type <> 'error'
    """,
    "transcript_replay_lww": f"""
        WITH {_tlog()}
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM log
        QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1
            AND NOT del
    """,
    # scrub-at-ingest: the same LWW replay with the PII regexp chain
    # applied to the salted text — transform placement (per micro-batch,
    # before the merge) must commute with replay
    "scrubbed_replay_lww": f"""
        WITH {_tlog(
            "props || ' reach me at u' || CAST(user_id AS VARCHAR)"
            " || '@mail.example or 10.0.'"
            " || CAST(event_id % 256 AS VARCHAR) || '.9'")}
        SELECT conv_id, turn_idx, role, {_scrub_of("text")} AS text,
               tool, ts
        FROM log
        QUALIFY row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1
            AND NOT del
    """,
    # the Iceberg export round-trip lands on the same LWW final state —
    # the split into CoW + MoR batches is seq-guarded, so the exported
    # winners + equality deletes must reproduce exactly this
    "iceberg_export_read": """
        WITH log AS (
            SELECT 'c' || user_id AS conv_id,
                   CAST(event_id % 20 AS INT) AS turn_idx,
                   event_type AS role, props AS text,
                   CAST(NULL AS VARCHAR) AS tool, ts,
                   event_id AS seq,
                   (event_type = 'error') AS del
            FROM events)
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM log
        QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1
            AND NOT del
    """,
    # continuous publish: same feed, same final LWW state — the
    # incremental snapshots must converge to exactly the one-shot
    # export's answer
    "iceberg_publish_feed": """
        WITH log AS (
            SELECT 'c' || user_id AS conv_id,
                   CAST(event_id % 20 AS INT) AS turn_idx,
                   event_type AS role, props AS text,
                   CAST(NULL AS VARCHAR) AS tool, ts,
                   event_id AS seq,
                   (event_type = 'error') AS del
            FROM events)
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM log
        QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1
            AND NOT del
    """,
    # published-Iceberg change feed v1→v3: per-publish change-key union
    # (engine read_changes semantics per window) resolved by the FINAL
    # state — upserts carry the latest winner, deletes NULL payload;
    # keys never live in any boundary state never enter a delete file
    "iceberg_changes_feed": """
        WITH log AS (
            SELECT 'c' || user_id AS conv_id,
                   CAST(event_id % 20 AS INT) AS turn_idx,
                   event_type AS role, props AS text,
                   event_id AS seq,
                   (event_type = 'error') AS del
            FROM events),
        s0 AS (SELECT * FROM log WHERE seq % 3 = 1
               QUALIFY row_number() OVER (
                   PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1),
        s1 AS (SELECT * FROM log WHERE seq % 3 IN (1, 2)
               QUALIFY row_number() OVER (
                   PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1),
        s2 AS (SELECT * FROM log
               QUALIFY row_number() OVER (
                   PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1),
        k2 AS (
            SELECT s1.conv_id, s1.turn_idx
            FROM s1 LEFT JOIN s0
              ON s1.conv_id = s0.conv_id AND s1.turn_idx = s0.turn_idx
            WHERE (NOT s1.del AND (s0.conv_id IS NULL OR s0.del))
               OR (s1.del AND s0.conv_id IS NOT NULL AND NOT s0.del)
               OR (NOT s1.del AND NOT s0.del AND s1.seq <> s0.seq)),
        k3 AS (
            SELECT s2.conv_id, s2.turn_idx
            FROM s2 LEFT JOIN s1
              ON s2.conv_id = s1.conv_id AND s2.turn_idx = s1.turn_idx
            WHERE (NOT s2.del AND (s1.conv_id IS NULL OR s1.del))
               OR (s2.del AND s1.conv_id IS NOT NULL AND NOT s1.del)
               OR (NOT s2.del AND NOT s1.del AND s2.seq <> s1.seq)),
        ks AS (SELECT * FROM k2 UNION SELECT * FROM k3)
        SELECT k.conv_id, k.turn_idx,
               CASE WHEN NOT s2.del THEN s2.role END AS role,
               CASE WHEN NOT s2.del THEN s2.text END AS text,
               CAST(NULL AS VARCHAR) AS tool,
               CASE WHEN s2.del THEN 'delete' ELSE 'upsert' END AS _change_type
        FROM ks k JOIN s2
          ON k.conv_id = s2.conv_id AND k.turn_idx = s2.turn_idx
    """,
    # stats-pruned scan: same LWW state, then the two range predicates
    # applied to the LATEST row (tombstones already excluded) — exactly
    # what read(ranges=) computes via file skip + pre/post-fold filters
    "stats_pruned_scan": """
        WITH log AS (
            SELECT 'c' || user_id AS conv_id,
                   CAST(event_id % 20 AS INT) AS turn_idx,
                   event_type AS role, props AS text,
                   CAST(NULL AS VARCHAR) AS tool, ts,
                   event_id AS seq,
                   (event_type = 'error') AS del
            FROM events)
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM (
            SELECT * FROM log
            QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1
                AND NOT del
        )
        WHERE conv_id >= 'c2' AND conv_id <= 'c5'
          AND ts >= TIMESTAMP '2024-01-10 00:00:00'
    """,
    # membership-sketch pruning must be invisible to the rows: same
    # LWW window, point predicates instead of ranges
    "sketch_pruned_scan": """
        WITH log AS (
            SELECT 'c' || user_id AS conv_id,
                   CAST(event_id % 20 AS INT) AS turn_idx,
                   event_type AS role, props AS text,
                   CAST(NULL AS VARCHAR) AS tool, ts,
                   event_id AS seq,
                   (event_type = 'error') AS del
            FROM events)
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM (
            SELECT * FROM log
            QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1
                AND NOT del
        )
        WHERE conv_id IN ('c3', 'c7') AND turn_idx = 5
    """,
    # the sort-order rewrite (cluster_by) must be invisible to the
    # data: same LWW window + ts range, whatever the file layout
    "clustered_scan": """
        WITH log AS (
            SELECT 'c' || user_id AS conv_id,
                   CAST(event_id % 20 AS INT) AS turn_idx,
                   event_type AS role, props AS text,
                   CAST(NULL AS VARCHAR) AS tool, ts,
                   event_id AS seq,
                   (event_type = 'error') AS del
            FROM events)
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM (
            SELECT * FROM log
            QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1
                AND NOT del
        )
        WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
          AND ts <= TIMESTAMP '2024-01-16 00:00:00'
    """,
    # the stateful streaming sessionizer must equal batch SQL
    # gap-sessionization: lag() marks breaks (> 30 min), a running sum
    # numbers sessions, one aggregate row per (conv, session). chars is
    # cast back to BIGINT (DuckDB sums BIGINT into HUGEINT).
    "stateful_sessions_stream": """
        WITH e AS (
            SELECT 'c' || user_id AS conv_id, ts, props AS text FROM events),
        b AS (
            SELECT conv_id, ts, text,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS brk
            FROM e WINDOW w AS (PARTITION BY conv_id ORDER BY ts)),
        s AS (
            SELECT *, sum(brk) OVER (PARTITION BY conv_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
            FROM b)
        SELECT conv_id,
               count(*) AS n_turns,
               min(ts) AS first_ts,
               max(ts) AS last_ts,
               CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS chars,
               date_diff('microsecond', min(ts), max(ts)) / 1000000.0 AS duration_s
        FROM s GROUP BY conv_id, sid
    """,
    # the stale-event audit over a 4-chunk stream + chunk-1 redelivery:
    # flagged rows are exactly the redelivered (conv, seq) pairs, each
    # 'late' against the conversation's overall max(seq) — chunk
    # membership is recomputed with the same ntile(4) ORDER BY seq
    "stale_audit_stream": """
        WITH e AS (
            SELECT 'c' || user_id AS conv_id, event_id AS seq FROM events),
        m AS (SELECT conv_id, max(seq) AS mx FROM e GROUP BY conv_id),
        c1 AS (
            SELECT conv_id, seq FROM (
                SELECT conv_id, seq, ntile(4) OVER (ORDER BY seq) AS ck FROM e)
            WHERE ck = 1)
        SELECT c1.conv_id, c1.seq, 'late' AS kind, m.mx AS max_seq_seen
        FROM c1 JOIN m USING (conv_id)
    """,
    # rollback + exactly-once re-apply must be invisible to the final
    # state: poison half 2, rewind to the tag, re-run the corrected
    # half under the SAME (writer, batch) — answers to the single-shot
    # LWW oracle
    "rollback_replay_lww": """
        WITH log AS (
            SELECT 'c' || user_id AS conv_id,
                   CAST(event_id % 20 AS INT) AS turn_idx,
                   event_type AS role, props AS text,
                   CAST(NULL AS VARCHAR) AS tool, ts,
                   event_id AS seq,
                   (event_type = 'error') AS del
            FROM events)
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM log
        QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1
            AND NOT del
    """,
    # rebucket must be invisible to readers: the two-phase replay with
    # a mid-run bucket-spec change answers to the SAME LWW oracle as
    # the single-shot replay
    "rebucket_replay_lww": """
        WITH log AS (
            SELECT 'c' || user_id AS conv_id,
                   CAST(event_id % 20 AS INT) AS turn_idx,
                   event_type AS role, props AS text,
                   CAST(NULL AS VARCHAR) AS tool, ts,
                   event_id AS seq,
                   (event_type = 'error') AS del
            FROM events)
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM log
        QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1
            AND NOT del
    """,
    # CDC replay + corpus assembly in one: LWW winners per (conv,
    # turn), then turns concatenated in turn order per conversation
    "conversation_corpus": f"""
        WITH {_tlog()},
        {_CONV_LWW}
        SELECT conv_id, count(*) AS n_turns,
               CAST(sum(len(regexp_extract_all(coalesce(text, ''),
                   '{TOKEN_PATTERN}'))) AS BIGINT) AS n_tokens,
               string_agg(role || ': ' || coalesce(text, ''), chr(10)
                   ORDER BY turn_idx) AS dialogue
        FROM lww GROUP BY conv_id
    """,
    # CDC replay → dialogue assembly → the full curation chain, all
    # under one hash: the LWW/tombstone replay and every curation
    # verdict must agree with the engine simultaneously
    "conversation_curated": f"""
        WITH {_tlog()},
        {_CONV_LWW},
        src AS (
            SELECT conv_id AS id,
                   string_agg(role || ': ' || coalesce(text, ''), chr(10)
                       ORDER BY turn_idx) AS text
            FROM lww GROUP BY conv_id),
        {_curation_chain("conv_id", top_cap=0.5)}
    """,
    # write-audit-publish: staging half the log on a branch and
    # fast-forwarding main must be invisible — same LWW oracle
    "wap_publish": """
        WITH log AS (
            SELECT 'c' || user_id AS conv_id,
                   CAST(event_id % 20 AS INT) AS turn_idx,
                   event_type AS role, props AS text,
                   CAST(NULL AS VARCHAR) AS tool, ts,
                   event_id AS seq,
                   (event_type = 'error') AS del
            FROM events)
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM log
        QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1
            AND NOT del
    """,
    "cdc_replay_stream_lww": """
        WITH log AS (
            SELECT 'c' || user_id AS conv_id,
                   CAST(event_id % 20 AS INT) AS turn_idx,
                   event_type AS role,
                   props || s.suf AS text,
                   CAST(NULL AS VARCHAR) AS tool,
                   ts + s.dts AS ts,
                   ts + s.di AS ingest_ts,
                   event_id AS seq,
                   (event_type = 'error') AS del
            FROM events
            CROSS JOIN (VALUES ('', INTERVAL 0 HOUR, INTERVAL 0 HOUR),
                               ('+a', INTERVAL 1 HOUR, INTERVAL 0 HOUR),
                               ('+b', INTERVAL 1 HOUR, INTERVAL 2 HOUR))
                 AS s(suf, dts, di))
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM log
        QUALIFY row_number() OVER (
            PARTITION BY conv_id, turn_idx
            ORDER BY seq DESC, ts DESC, ingest_ts DESC) = 1
            AND NOT del
    """,
    "table_changes_feed": """
        WITH log AS (
            SELECT 'c' || user_id AS conv_id,
                   CAST(event_id % 20 AS INT) AS turn_idx,
                   event_type AS role, props AS text,
                   CAST(NULL AS VARCHAR) AS tool, ts,
                   event_id AS seq,
                   (event_type = 'error') AS del
            FROM events),
        cut AS (SELECT MAX(event_id) // 2 AS c FROM events),
        s1 AS (SELECT * FROM log, cut WHERE seq <= c
               QUALIFY row_number() OVER (
                   PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1),
        s2 AS (SELECT * FROM log
               QUALIFY row_number() OVER (
                   PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1),
        j AS (
            SELECT s2.conv_id, s2.turn_idx,
                   s2.role AS role2, s2.text AS text2, s2.tool AS tool2,
                   s2.ts AS ts2, s2.seq AS seq2,
                   s1.role AS role1, s1.text AS text1, s1.tool AS tool1,
                   s1.ts AS ts1, s1.seq AS seq1,
                   (s1.conv_id IS NOT NULL AND NOT s1.del) AS alive1,
                   NOT s2.del AS alive2
            FROM s2 LEFT JOIN s1
              ON s2.conv_id = s1.conv_id AND s2.turn_idx = s1.turn_idx)
        SELECT conv_id, turn_idx,
               CASE WHEN alive2 THEN role2 ELSE role1 END AS role,
               CASE WHEN alive2 THEN text2 ELSE text1 END AS text,
               CASE WHEN alive2 THEN tool2 ELSE tool1 END AS tool,
               CASE WHEN alive2 THEN ts2 ELSE ts1 END AS ts,
               CASE WHEN alive2 AND NOT alive1 THEN 'insert'
                    WHEN alive2 AND alive1 AND seq2 <> seq1 THEN 'update'
                    WHEN NOT alive2 AND alive1 THEN 'delete' END AS _change_type,
               CASE WHEN alive2 THEN seq2 ELSE seq1 END AS _seq
        FROM j
        WHERE (alive2 AND NOT alive1)
           OR (alive2 AND alive1 AND seq2 <> seq1)
           OR (NOT alive2 AND alive1)
    """,
    # the format reader (deltaspark DataSource) must land on the same
    # LWW state as the engine read it wraps — filtered identically to
    # the pushed predicate
    "datasource_scan": f"""
        WITH {_tlog()}
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM log
        QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1
            AND NOT del AND turn_idx >= 10
    """,
    # the exactly-once format writer: double-applied batch or a lost
    # task file would break this LWW hash
    "datasource_write_roundtrip": f"""
        WITH {_tlog()}
        SELECT conv_id, turn_idx, role, text, ts
        FROM log
        QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1
            AND NOT del
    """,
    # the incrementally-folded view must equal the batch GROUP BY over
    # the final LWW state (count + sum are self-maintainable exactly;
    # sums fold NULL contributions as 0 by design — mirrored here)
    "matview_rollup": """
        WITH log AS (
            SELECT 'c' || user_id AS conv_id,
                   CAST(event_id % 20 AS INT) AS turn_idx,
                   event_type AS role, props AS text,
                   event_id AS seq,
                   (event_type = 'error') AS del
            FROM events),
        state AS (
            SELECT conv_id, turn_idx, role, text
            FROM log
            QUALIFY row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1
                AND NOT del)
        SELECT role, count(*) AS n_rows,
               CAST(sum(coalesce(length(text), 0)) AS BIGINT) AS sum_chars
        FROM state GROUP BY role
    """,
    # extrema fold + targeted recompute must equal the batch GROUP BY
    # (min/max ignore NULL text; n_rows/sum_chars as in matview_rollup)
    "matview_minmax": """
        WITH log AS (
            SELECT 'c' || user_id AS conv_id,
                   CAST(event_id % 20 AS INT) AS turn_idx,
                   event_type AS role, props AS text,
                   event_id AS seq,
                   (event_type = 'error') AS del
            FROM events),
        state AS (
            SELECT conv_id, turn_idx, role, text
            FROM log
            QUALIFY row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY seq DESC) = 1
                AND NOT del)
        SELECT role, count(*) AS n_rows,
               CAST(sum(coalesce(length(text), 0)) AS BIGINT) AS sum_chars,
               CAST(min(length(text)) AS INT) AS min_chars,
               CAST(max(length(text)) AS INT) AS max_chars
        FROM state GROUP BY role
    """,
    "table_ddl_replay": """
        WITH c AS (SELECT 3 * MAX(event_id) // 4 AS cut FROM events)
        SELECT user_id, event_type, value, ts
        FROM events, c
        WHERE event_id > cut
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
            AND event_type <> 'error'
    """,
    # ------------------------------------------------- relational
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_base_price,
               round(CAST(sum({_REV}) AS DOUBLE), 2) AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem WHERE l_quantity < 45
        GROUP BY l_returnflag, l_linestatus
    """,
    "top_orders_per_customer": """
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        FROM orders
        QUALIFY rk <= 3
    """,
    "region_customer_rollup": """
        SELECT r_name, count(*) AS n_customers,
               round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "order_priority_revenue": f"""
        SELECT o_orderpriority,
               count(DISTINCT o_orderkey) AS n_orders,
               round(CAST(sum({_REV}) AS DOUBLE), 2) AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
    """,
    # ------------------------------------------------- documents
    "dedup_exact": r"""
        SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash,
               min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY 1
    """,
    "minhash_signatures": _MINHASH_SIGS + "SELECT * FROM sigs",
    "minhash_lsh_pairs": _MINHASH_SIGS + """
        , e AS (
          SELECT doc_id, 0 AS band, mh0::VARCHAR || ':' || mh1::VARCHAR AS bh FROM sigs
          UNION ALL
          SELECT doc_id, 1 AS band, mh2::VARCHAR || ':' || mh3::VARCHAR AS bh FROM sigs)
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM e l JOIN e r ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
    """,
    "ngram_jaccard_dups": _MINHASH_SIGS + """
        , e AS (
          SELECT doc_id, 0 AS band, mh0::VARCHAR || ':' || mh1::VARCHAR AS bh FROM sigs
          UNION ALL
          SELECT doc_id, 1 AS band, mh2::VARCHAR || ':' || mh3::VARCHAR AS bh FROM sigs),
        cand AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
          FROM e l JOIN e r ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id),
        shd AS (SELECT DISTINCT doc_id, s FROM sh),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
          FROM shd a
          JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
          JOIN cand c ON c.id_a = a.doc_id AND c.id_b = b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
               round(i / (sa.n_sh + sb.n_sh - i), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE round(i / (sa.n_sh + sb.n_sh - i), 4) >= 0.4
    """,
    # transitive closure over the verified-duplicate edge set: DuckDB's
    # recursive CTE floods every member id through the component; the
    # min per vertex is exactly the engine's min-label fixpoint
    "neardup_clusters": _MINHASH_SIGS.replace("WITH ", "WITH RECURSIVE ", 1) + """
        , e AS (
          SELECT doc_id, 0 AS band, mh0::VARCHAR || ':' || mh1::VARCHAR AS bh FROM sigs
          UNION ALL
          SELECT doc_id, 1 AS band, mh2::VARCHAR || ':' || mh3::VARCHAR AS bh FROM sigs),
        cand AS (
          SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
          FROM e l JOIN e r ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id),
        shd AS (SELECT DISTINCT doc_id, s FROM sh),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
          FROM shd a
          JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
          JOIN cand c ON c.id_a = a.doc_id AND c.id_b = b.doc_id
          GROUP BY 1, 2),
        verified AS (
          SELECT id_a, id_b FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE round(i / (sa.n_sh + sb.n_sh - i), 4) >= 0.4),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM verified
          UNION ALL
          SELECT id_b AS src, id_a AS dst FROM verified),
        reach(v, l) AS (
          SELECT src, src FROM edges
          UNION
          SELECT g.dst, r.l FROM reach r JOIN edges g ON g.src = r.v)
        SELECT v AS doc_id, min(l) AS cluster_id FROM reach GROUP BY v
    """,
    "simhash16": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
        tok AS (SELECT DISTINCT doc_id, t FROM toks, unnest(w) AS u(t)),
        h AS (SELECT doc_id, {_md5long("t")} AS h FROM tok),
        votes AS (SELECT doc_id,
          {", ".join(f"sum(CASE WHEN (h & {1 << b}) <> 0 THEN 1 ELSE -1 END) AS b{b}" for b in range(16))}
          FROM h GROUP BY doc_id)
        SELECT doc_id,
          ({" + ".join(f"CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(16))})::BIGINT AS simhash
        FROM votes
    """,
    "lang_id": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
        s AS (SELECT doc_id,
              {", ".join(f"{_lang_score(lang)} AS {lang}" for lang in sorted(STOPWORDS))}
              FROM toks),
        u AS ({" UNION ALL ".join(f"SELECT doc_id, '{lang}' AS lang, {lang} AS score FROM s" for lang in sorted(STOPWORDS))}),
        best AS (
          SELECT doc_id, lang FROM u WHERE score > 0
          QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) = 1)
        SELECT s.doc_id, coalesce(best.lang, 'und') AS lang_pred
        FROM s LEFT JOIN best USING (doc_id)
    """,
    "text_quality": rf"""
        WITH f AS (
          SELECT doc_id,
                 len({_TOKS}) AS n_tokens,
                 len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
                   / greatest(length(text), 1) AS praw,
                 len(list_filter({_TOKS}, x -> list_contains({_stop_list("en")}, x)))
                   / greatest(len({_TOKS}), 1) AS sraw
          FROM documents)
        SELECT doc_id, n_tokens,
               round(praw, 4) AS punct_ratio,
               round(sraw, 4) AS stopword_ratio,
               round(least(n_tokens / 100.0, 1.0) * 0.3
                     + least(sraw * 4.0, 1.0) * 0.4
                     + (1.0 - least(praw * 5.0, 1.0)) * 0.3, 4) AS quality
        FROM f
    """,
    "token_count": f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_tokens
        FROM documents
    """,
    # PII scrub: BUILT FROM functions/text.py PII_PATTERNS at import
    # time (single source of truth; Java ∩ RE2 subset), same
    # replacement order, global flag
    "pii_scrub": _PII_SCRUB_SQL,
    # fixed 256-char chunks, 32 overlap (step 224); one chunk minimum
    "doc_chunks": """
        WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
        c AS (SELECT doc_id, t,
                greatest(CAST(ceil((length(t) - 256) / 224.0) AS INT), 0) AS last
              FROM d)
        SELECT doc_id, CAST(i AS INT) AS chunk_idx,
               substr(t, CAST(1 + i * 224 AS INT), 256) AS chunk_text
        FROM c, unnest(generate_series(0, CAST(last AS BIGINT))) AS u(i)
    """,
    "doc_fingerprint": r"""
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
               length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS n_chars_norm
        FROM documents
    """,
    # ------------------------------------------------- corpus curation
    # split nibbles mirror functions/curation.py: 0-9ab train, cd
    # valid, ef test — md5 of the stringified id in both engines
    "corpus_split": """
        SELECT doc_id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                         IN ('c', 'd') THEN 'valid'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                         IN ('e', 'f') THEN 'test'
                    ELSE 'train' END AS split
        FROM documents
    """,
    # Gopher-style repetition gates; thresholds applied to the ROUNDED
    # values exactly as curation.repetition_stats does
    "repetition_stats": rf"""
        WITH toks AS (
          SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
        pt AS (
          SELECT doc_id, tok, count(*) AS c
          FROM toks GROUP BY doc_id, tok),
        st AS (
          SELECT doc_id,
                 CAST(sum(c) AS BIGINT) AS n_tokens,
                 max(c) AS topc,
                 count(*) AS n_distinct,
                 CAST(sum(c * length(tok)) AS BIGINT) AS chars
          FROM pt GROUP BY doc_id)
        SELECT doc_id, n_tokens,
               round(1.0 - n_distinct / n_tokens, 4) AS dup_token_frac,
               round(topc / n_tokens, 4) AS top_token_frac,
               round(chars / n_tokens, 4) AS mean_token_len,
               (n_tokens >= 10 AND n_tokens <= 100000
                AND round(chars / n_tokens, 4) >= 2.0
                AND round(chars / n_tokens, 4) <= 10.0
                AND round(1.0 - n_distinct / n_tokens, 4) < 0.93
                AND round(topc / n_tokens, 4) < 0.25) AS keep
        FROM st
    """,
    # word 3-grams (DuckDB list slice is INCLUSIVE: w[i:i+2] is 3
    # tokens, matching Spark slice(w, i, 3)); benchmark slice is
    # doc_id % 17 == 0, corpus is the rest
    "decontaminate": rf"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
        cg AS (
          SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
          FROM toks, unnest(generate_series(1, len(w) - 2)) AS t(i)
          WHERE doc_id % 17 <> 0 AND len(w) >= 3),
        bg AS (
          SELECT DISTINCT array_to_string(w[i:i+2], ' ') AS g
          FROM toks, unnest(generate_series(1, len(w) - 2)) AS t(i)
          WHERE doc_id % 17 = 0 AND len(w) >= 3)
        SELECT doc_id, count(*) AS n_overlap
        FROM cg JOIN bg USING (g)
        GROUP BY doc_id
    """,
    "domain_mix": f"""
        WITH d AS (
          SELECT CASE WHEN doc_id % 4 = 0 THEN source
                      ELSE 'common_crawl' END AS domain,
                 len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS w
          FROM documents),
        per AS (
          SELECT domain, count(*) AS n_docs,
                 CAST(sum(w) AS BIGINT) AS n_tokens
          FROM d GROUP BY domain),
        tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM per)
        SELECT domain, n_docs, n_tokens,
               round(n_tokens / t, 6) AS token_share,
               round(least(n_tokens / t, 0.15), 6) AS capped_share
        FROM per, tot
    """,
    # greedy boundary packing mirrors curation.pack_bins: md5 shard,
    # exclusive running token sum in doc-id order, bin = offset//budget
    "pack_sequences": f"""
        WITH d AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS BIGINT)
                     AS n_tokens,
                 {_md5long("CAST(doc_id AS VARCHAR)")} % 8 AS shard
          FROM documents)
        SELECT doc_id, n_tokens, shard,
               CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS bin_start,
               CAST(floor((sum(n_tokens) OVER w - n_tokens) / 512.0) AS BIGINT)
                   AS bin
        FROM d
        WINDOW w AS (PARTITION BY shard ORDER BY doc_id)
    """,
    # the materialized packed set: same layout as pack_sequences,
    # documents concatenated in id order inside each bin
    "packed_corpus": f"""
        WITH d AS (
          SELECT doc_id, text,
                 CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS BIGINT)
                     AS n_tokens,
                 {_md5long("CAST(doc_id AS VARCHAR)")} % 8 AS shard
          FROM documents),
        p AS (
          SELECT *,
                 CAST(floor((sum(n_tokens) OVER w - n_tokens) / 512.0) AS BIGINT)
                     AS bin
          FROM d
          WINDOW w AS (PARTITION BY shard ORDER BY doc_id))
        SELECT shard, bin, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               string_agg(text, chr(10) || chr(10) ORDER BY doc_id) AS text
        FROM p GROUP BY shard, bin
    """,
    # τ=0.5 temperature resampling: rate = sqrt(min_domain_tokens /
    # domain_tokens); divide + sqrt are exactly rounded IEEE ops, so
    # the doubles (and every keep verdict) match Spark bit-for-bit
    "temperature_sample": f"""
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 4 = 0 THEN source
                      ELSE 'common_crawl' END AS domain,
                 CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS BIGINT)
                     AS n_tokens
          FROM documents),
        per AS (SELECT domain, CAST(sum(n_tokens) AS BIGINT) AS dt
                FROM d GROUP BY domain),
        mn AS (SELECT min(dt) AS mint FROM per),
        r AS (SELECT domain, sqrt(mint / dt) AS keep_rate FROM per, mn)
        SELECT d.doc_id, d.domain, d.n_tokens, r.keep_rate,
               ({_md5long("CAST(d.doc_id AS VARCHAR)")}
                   / 1152921504606846976.0) < r.keep_rate AS keep
        FROM d JOIN r USING (domain)
    """,
    # the composed pipeline: scrub → quality gate (same rounded-value
    # thresholds as repetition_stats) → min-id dedup per normalized
    # fingerprint → md5-nibble train split → shard-window packing
    "corpus_curation_e2e": f"""
        WITH src AS (SELECT doc_id AS id, text FROM documents),
        {_CURATION_CHAIN}
    """,
    # top-100 vocabulary by (count desc, token asc) — a total order, so
    # the LIMIT is deterministic; oov_frac is one bigint/bigint divide
    # (exactly rounded → bit-identical to Spark's long/long)
    "oov_rate": f"""
        WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
        cnt AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
        vocab AS (SELECT tok FROM cnt ORDER BY c DESC, tok ASC LIMIT 100),
        per AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok)
        SELECT per.doc_id,
               CAST(sum(per.c) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN v.tok IS NULL THEN per.c ELSE 0 END)
                    AS BIGINT) AS n_oov,
               CAST(sum(CASE WHEN v.tok IS NULL THEN per.c ELSE 0 END)
                    AS BIGINT)
                 / CAST(sum(per.c) AS BIGINT) AS oov_frac
        FROM per LEFT JOIN vocab v USING (tok)
        GROUP BY per.doc_id
    """,
    # raw-ratio IDF: tf * N exact in bigint, ONE exactly-rounded divide
    # by df — no logarithm, so score and ranking match Spark bit-for-bit
    "tfidf_keywords": f"""
        WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
        per AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
                FROM tok GROUP BY doc_id, token),
        dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df_docs
                FROM per GROUP BY token),
        n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
        scored AS (
          SELECT per.doc_id, per.token, per.tf, dfq.df_docs,
                 (per.tf * n.nd) / dfq.df_docs AS score
          FROM per JOIN dfq USING (token) CROSS JOIN n),
        ranked AS (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, token ASC)
                 AS INTEGER) AS rank
          FROM scored)
        SELECT doc_id, rank, token, tf, df_docs, score
        FROM ranked WHERE rank <= 3
    """,
    # ------------------------------------------------- embeddings
    "ann_cosine_topk": f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        s AS (
          SELECT e.vec_id, {_COSINE_PAIR.replace("va[i]", "e.embedding[i]").replace("vb[i]", "q.qv[i]")} AS sim
          FROM embeddings e, q, unnest(generate_series(1, len(e.embedding))) AS t(i)
          WHERE e.vec_id <> 0
          GROUP BY e.vec_id)
        SELECT vec_id, sim FROM s ORDER BY sim DESC, vec_id ASC LIMIT 10
    """,
    "embedding_neardup_pairs": f"""
        WITH p AS (
          SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
                 a.embedding AS va, b.embedding AS vb
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id < b.vec_id),
        s AS (
          SELECT label, id_a, id_b, {_COSINE_PAIR} AS sim
          FROM p, unnest(generate_series(1, len(va))) AS t(i)
          GROUP BY label, id_a, id_b)
        SELECT label, id_a, id_b, sim FROM s WHERE sim >= 0.25
    """,
    # media: synth_media_from_text emits REAL binaries whose every byte
    # count is a closed-form function of (doc_id, utf8 byte length of
    # text) — see functions/media.py synthesis parameters. The Spark
    # side PARSES the bytes (PPM header, RIFF chunk walk, RVID frame
    # walk); this SQL predicts what the parse must yield, checking the
    # encode→decode round trip.
    #   image (doc_id%3=0): PPM P6, w=16+b%97, h=16+doc_id%53,
    #     bytes = 9 + digits(w) + digits(h) + 3wh
    #   audio (doc_id%3=1): WAV PCM16 mono 16 kHz, n=b+1 samples,
    #     bytes = 44 + 2n, duration = n/16000.0
    #   video (doc_id%3=2): RVID, nf=1+doc_id%61 fps=24 frames of PPM
    #     w=6+b%13 h=6+doc_id%11; bytes = 12 + nf*frame_bytes
    "media_features": """
        WITH d AS (
          SELECT CAST(doc_id AS BIGINT) AS did,
                 octet_length(encode(coalesce(text, ''))) AS b
          FROM documents),
        p AS (
          SELECT did, b,
                 16 + b % 97  AS iw, 16 + did % 53 AS ih,
                 1 + did % 61 AS nf, 6 + b % 13 AS vw, 6 + did % 11 AS vh
          FROM d)
        SELECT did AS media_id,
               CASE did % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               CAST(CASE did % 3
                 WHEN 0 THEN 9 + length(CAST(iw AS VARCHAR))
                             + length(CAST(ih AS VARCHAR)) + 3 * iw * ih
                 WHEN 1 THEN 44 + 2 * (b + 1)
                 ELSE 12 + nf * (9 + length(CAST(vw AS VARCHAR))
                                 + length(CAST(vh AS VARCHAR)) + 3 * vw * vh)
               END AS INTEGER) AS n_bytes,
               CAST(CASE did % 3 WHEN 0 THEN iw WHEN 1 THEN NULL
                    ELSE vw END AS INTEGER) AS width,
               CAST(CASE did % 3 WHEN 0 THEN ih WHEN 1 THEN NULL
                    ELSE vh END AS INTEGER) AS height,
               CASE did % 3 WHEN 0 THEN NULL
                 WHEN 1 THEN CAST(b + 1 AS DOUBLE) / 16000.0
                 ELSE CAST(nf AS DOUBLE) / 24.0 END AS duration_s,
               CAST(CASE did % 3 WHEN 0 THEN 1 WHEN 1 THEN NULL
                    ELSE nf END AS INTEGER) AS n_frames
        FROM p
    """,
    # plan = every 30th frame of the RVID-parsed count (1 + doc_id%61)
    "media_frame_plan": """
        SELECT CAST(doc_id AS BIGINT) AS media_id,
               UNNEST(generate_series(
                 0, (1 + doc_id % 61) - 1, 30)) AS frame_idx
        FROM documents
        WHERE doc_id % 3 = 2
    """,
}

# Incremental near-dup maintenance must FOLD to the batch result on the
# final corpus — so its oracle IS the batch oracle, evaluated over the
# closed-form final state of the query's three engine commits (full
# insert, %7 ' revision two' suffixes, %13 deletions disjoint from the
# revisions). Built from the ngram_jaccard_dups SQL by swapping its
# corpus source — no duplicated hash arithmetic to drift.
# Incremental curation must fold to the batch curation chain on the
# same closed-form final corpus — the identical packed layout.
# one definition, two surfaces: the batch format read of the change
# feed shares table_changes_feed's oracle verbatim
ALL_ORACLES["datasource_changes"] = ALL_ORACLES["table_changes_feed"]

# one definition, two physical delta shapes: the fanout-MoR streaming
# replay shares the spanning replay's oracle verbatim
ALL_ORACLES["cdc_replay_fanout_lww"] = ALL_ORACLES["cdc_replay_stream_lww"]

ALL_ORACLES["incremental_curation"] = f"""
    WITH src AS (
      SELECT doc_id AS id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' revision two'
                  ELSE text END AS text
      FROM documents
      WHERE NOT (doc_id % 13 = 0 AND doc_id % 7 <> 0)),
    {_curation_chain("doc_id")}
"""

# The maintained vocabulary must fold to the batch GROUP BY token of
# the same closed-form final corpus (NULL-text tombstones drop out).
ALL_ORACLES["incremental_vocab"] = """
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' revision two'
                  ELSE text END AS text
      FROM documents
      WHERE NOT (doc_id % 13 = 0 AND doc_id % 7 <> 0)),
    tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)),
                                  '\\s+')) AS token
            FROM corpus WHERE text IS NOT NULL)
    SELECT token, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS df_docs
    FROM tok GROUP BY token
"""

# Conversation-level incremental curation folds to the batch
# conversation_curated chain over the identical final corpus — the
# oracle IS that chain (one definition, no drift).
ALL_ORACLES["incremental_conversation_curation"] = ALL_ORACLES[
    "conversation_curated"
]

ALL_ORACLES["neardup_incremental"] = (
    "WITH corpus AS (\n"
    "  SELECT doc_id,\n"
    "         CASE WHEN doc_id % 7 = 0 THEN text || ' revision two'\n"
    "              ELSE text END AS text\n"
    "  FROM documents\n"
    "  WHERE NOT (doc_id % 13 = 0 AND doc_id % 7 <> 0)),\n"
    + ALL_ORACLES["ngram_jaccard_dups"].replace("WITH ", "", 1).replace(
        "FROM documents", "FROM corpus"
    )
)
