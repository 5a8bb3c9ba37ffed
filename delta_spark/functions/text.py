"""Text analysis operators: language-ID, quality scoring, token
counting, fingerprinting. All pure ``pyspark.sql.functions`` column
expressions (JVM-side, codegen) — no UDFs in the hot path. Patterns
stay in the regex subset Java and DuckDB agree on so every operator is
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small per-language stopword sets for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "por"],
}

TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: str | Column) -> Column:
    """Whitespace tokens of lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), r"\s+")


def token_count(col: str | Column) -> Column:
    """BPE-ish token count: alpha runs, digit runs, and single
    punctuation marks each count as one token."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(TOKEN_PATTERN))


def stopword_hits(col: str | Column, lang: str) -> Column:
    """How many tokens are stopwords of ``lang`` (array lambda —
    still JVM-side)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(sw, t)))


def lang_scores(col: str | Column) -> dict[str, Column]:
    n = F.greatest(F.size(tokens(col)), F.lit(1))
    return {lang: stopword_hits(col, lang) / n for lang in STOPWORDS}


def lang_id(col: str | Column) -> Column:
    """Pick the language whose stopword ratio wins (ties broken by
    language-code order); 'und' when nothing matched."""
    scores = lang_scores(col)
    pairs = F.array(
        *[
            F.struct(s.alias("score"), F.lit(lang).alias("lang"))
            for lang, s in sorted(scores.items())
        ]
    )
    best = F.array_max(F.filter(pairs, lambda p: p["score"] > 0))
    # array_max on struct orders by (score, lang); lang desc tie-break
    return F.coalesce(best["lang"], F.lit("und"))


def quality_features(col: str | Column) -> dict[str, Column]:
    """Length / punctuation / stopword / word-length features for
    quality filtering (C4/Gopher-style heuristics)."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    toks = tokens(col)
    n_tokens = F.size(toks)
    n_punct = F.regexp_count(c, F.lit(r"[^A-Za-z0-9\s]"))
    n_stop = stopword_hits(col, "en")
    mean_word_len = F.when(
        n_tokens > 0,
        F.aggregate(
            toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t)
        )
        / n_tokens,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": n_punct / F.greatest(n_chars, F.lit(1)),
        "stopword_ratio": n_stop / F.greatest(n_tokens, F.lit(1)),
        "mean_word_len": mean_word_len,
    }


def quality_score(col: str | Column) -> Column:
    """One scalar in [0,1]: rewards stopword presence and sane word
    lengths, penalizes punctuation soup and tiny docs."""
    f = quality_features(col)
    score = (
        F.least(f["n_tokens"] / F.lit(100.0), F.lit(1.0)) * 0.3
        + F.least(f["stopword_ratio"] * F.lit(4.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(f["punct_ratio"] * F.lit(5.0), F.lit(1.0))) * 0.3
    )
    return F.round(score, 4)


def normalized(col: str | Column) -> Column:
    """Canonical form for exact dedup / fingerprints: lowercase,
    whitespace collapsed, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: str | Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (md5 so a DuckDB oracle reproduces it exactly)."""
    return F.md5(normalized(col))


def md5_long(c: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint — the portable
    hash used across dedup/minhash so oracles can recompute it."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


# ------------------------------------------------------ PII scrubbing
# patterns kept in the Java ∩ RE2 regex subset so Spark (Java regex)
# and DuckDB (RE2) replace identically — oracle-checkable
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}", "<PHONE>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
]


def pii_scrub(col: str | Column) -> Column:
    """Redact emails/phones/IPs/SSNs in order (each later pattern sees
    the earlier replacements — matching the oracle's nesting). Pure
    JVM regexp_replace chain, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    for _name, pat, rep in PII_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    return c


def pii_hits(col: str | Column) -> dict[str, Column]:
    """Per-category match counts over the ORIGINAL text (audit metric
    to accompany the scrub)."""
    c = F.col(col) if isinstance(col, str) else col
    return {name: F.regexp_count(c, F.lit(pat)) for name, pat, _rep in PII_PATTERNS}


# ------------------------------------------------------ chunking


def chunk_spans(col: str | Column, size: int = 512, overlap: int = 64) -> Column:
    """Training-window chunking: 1-based start offsets of fixed-size
    character chunks with ``overlap`` carry-over — chunk i covers
    [1 + i*(size-overlap), …+size). Returns the array of starts; the
    caller explodes + substrings (all JVM-side, scales as one narrow
    map over documents, no shuffle)."""
    if overlap >= size:
        raise ValueError(f"overlap {overlap} must be < size {size}")
    c = F.col(col) if isinstance(col, str) else col
    step = size - overlap
    n = F.length(c)
    # number of chunks: ceil(max(n - overlap, 1) / step) for n>0 → last
    # start is the largest 1 + i*step with i*step < n - overlap (+1 chunk)
    last = F.greatest(F.ceil((n - F.lit(size)) / F.lit(step)), F.lit(0)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), last), lambda i: i * F.lit(step) + 1
    )
