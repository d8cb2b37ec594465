"""PII scrubbing + Unicode-script profiling — the webtext hygiene
operators a crawl runs before anything ships to training.

Both are pure column expressions (regexp_replace / regexp-deletion
counting) with patterns deliberately restricted to the regex grammar
Java (Spark) and RE2 (DuckDB) evaluate identically: character classes,
bounded repetition, \\b, \\d — no lookaround, no backreferences.
Unicode script classes are embedded as LITERAL character-range classes
(the chars themselves, not \\u escapes), which both engines read the
same way.  Cross-engine pinned in tests/test_scrub.py, including
multi-occurrence replacement (DuckDB needs the explicit 'g' flag —
without it regexp_replace rewrites only the FIRST match, a silent
cross-engine divergence this module exists to prevent).

Scale: stateless projections — push down, no shuffle, codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# conservative patterns: precision over recall — a scrubber that eats
# prose is worse than one that misses an exotic obfuscated address
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{7,15}\b"  # international +CC form only

_SCRUBS = (("email", EMAIL_RE, "<EMAIL>"), ("ip", IPV4_RE, "<IP>"),
           ("phone", PHONE_RE, "<PHONE>"))

# literal Unicode ranges (identical char-class semantics both engines)
_SCRIPTS = (
    ("latin", "A-Za-z"),
    ("cjk", "一-鿿"),
    ("cyrillic", "Ѐ-ӿ"),
    ("arabic", "؀-ۿ"),
)


def pii_scrub(docs: DataFrame) -> DataFrame:
    """(doc_id, scrubbed, n_email, n_ip, n_phone): redact in a fixed
    order (emails first — an email never survives to be half-eaten by
    the ip pattern) and count what was redacted; NULL text propagates.

    Each pattern is counted on the text AS IT STANDS after the
    preceding replacements (the count expressions mirror the
    sequential regexp_replace chain), so overlapping PII — an
    IPv4-shaped run inside an email the email pass already swallowed —
    is counted exactly once: sum(n_*) == number of replacement tokens
    in `scrubbed` (ADVICE r4; pinned cross-engine in test_scrub.py)."""
    cur = F.col("text")
    counts = []
    for name, pat, tok in _SCRUBS:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, tok)
    return docs.select(
        "doc_id", cur.alias("scrubbed"), *counts
    )


def pii_scrub_sql(table: str = "documents") -> str:
    cur = "text"
    counts = []
    for name, pat, tok in _SCRUBS:
        counts.append(
            f"cast(len(regexp_extract_all({cur}, '{pat}')) as int) AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{pat}', '{tok}', 'g')"
    return f"SELECT doc_id, {cur} AS scrubbed, {', '.join(counts)} FROM {table}"


def script_profile(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, latin_ratio, cjk_ratio, cyrillic_ratio,
    arabic_ratio, main_script): per-script character shares via the
    regexp-deletion count (exact integer counts, one guarded double
    division each), plus the argmax script — the routing key a
    multilingual pipeline partitions on.  Ties break by the fixed
    script order; empty/NULL text -> 'unknown'."""
    n = F.length("text")
    cols = [F.col("doc_id"), n.alias("n_chars")]
    ratio_cols = []
    for name, rng in _SCRIPTS:
        cnt = n - F.length(F.regexp_replace("text", f"[{rng}]", ""))
        ratio_cols.append((name, cnt))
        cols.append(
            F.round(cnt.cast("double") / F.nullif(n, F.lit(0)).cast("double"), 4).alias(
                f"{name}_ratio"
            )
        )
    # argmax by greatest(): main = first script whose count equals the max
    counts = [c for _n, c in ratio_cols]
    mx = F.greatest(*counts)
    main = F.when((n.isNull()) | (n == 0) | (mx == 0), F.lit("unknown"))
    for name, cnt in ratio_cols:
        main = main.when(cnt == mx, F.lit(name))
    cols.append(main.otherwise(F.lit("unknown")).alias("main_script"))
    return docs.select(*cols)


def script_profile_sql(table: str = "documents") -> str:
    cnt_exprs = {
        name: f"(length(text) - length(regexp_replace(text, '[{rng}]', '', 'g')))"
        for name, rng in _SCRIPTS
    }
    ratios = ", ".join(
        f"round(cast({c} as double) / nullif(length(text), 0), 4) AS {name}_ratio"
        for name, c in cnt_exprs.items()
    )
    mx = f"greatest({', '.join(cnt_exprs.values())})"
    main = "CASE WHEN length(text) IS NULL OR length(text) = 0 OR " + mx + " = 0 THEN 'unknown' "
    for name, c in cnt_exprs.items():
        main += f"WHEN {c} = {mx} THEN '{name}' "
    main += "ELSE 'unknown' END"
    return (
        f"SELECT doc_id, cast(length(text) as int) AS n_chars, {ratios}, "
        f"{main} AS main_script FROM {table}"
    )
