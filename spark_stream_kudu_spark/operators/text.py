"""Text-analysis operators over ``documents`` — all native expressions.

Language-ID (stopword-ratio heuristic), quality scoring
(length/stopword/punctuation features), token counting (whitespace +
BPE-ish regex + chars/4 estimate), and document fingerprinting
(canonical token-set hash lives in operators.dedup).

Everything is row-local string/array expressions: at 100 TB these run
inside the parquet scan stage with zero shuffles and full column
pruning (only ``doc_id``/``text`` are read).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.hashing import sql_md5_int32
from spark_stream_kudu_spark.functions.lineage import pin as _pin
from spark_stream_kudu_spark.functions.rounding import fround, idiv, sql_fround
from spark_stream_kudu_spark.functions.textutil import sql_tokens, tokens
from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table

# Tiny deterministic stopword inventories. Not a production lexicon —
# the operator contract is the *mechanism* (per-language token-ratio
# argmax); swap in real lists per deployment.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"],
    "es": ["el", "la", "de", "y", "en", "es", "un", "una", "por", "con"],
    "de": ["der", "die", "das", "und", "ist", "ein", "mit", "von", "zu", "auf"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "dans", "pour", "sur"],
}
LANG_PRIORITY = ["en", "es", "de", "fr"]  # tie-break order

PUNCT_CLASS = "[.,;:!?]"
BPE_ISH_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, "documents")


def _stop_count(tok: Column, words: list[str]) -> Column:
    """How many tokens are in the stopword list (multiset count)."""
    wl = [F.lit(w) for w in words]
    return F.size(F.filter(tok, lambda t: t.isin(*words)))


def _sql_stop_count(tokens_expr: str, words: list[str]) -> str:
    lst = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({tokens_expr}, t -> list_contains({lst}, t)))"


# --------------------------------------------------------------------------
# Language ID
# --------------------------------------------------------------------------


def _langid_sql() -> str:
    toks = sql_tokens("text")
    scores = ",\n         ".join(
        f"{_sql_stop_count('t', STOPWORDS[lang])} * 1.0 / len(t) AS s_{lang}"
        for lang in LANG_PRIORITY
    )
    # argmax with fixed priority order on ties
    cond = []
    for lang in LANG_PRIORITY:
        others = [o for o in LANG_PRIORITY if o != lang]
        conj = " AND ".join(f"s_{lang} >= s_{o}" for o in others)
        cond.append(f"WHEN {conj} THEN '{lang}'")
    best = " ".join(cond)
    greatest = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_PRIORITY) + ")"
    return f"""
WITH tok AS (SELECT doc_id, lang, {toks} AS t FROM documents),
sc AS (
  SELECT doc_id, lang,
         {scores}
  FROM tok
)
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN {greatest} = 0 THEN 'und' {best} ELSE 'und' END AS pred_lang,
       floor(({greatest}) * 1000000 + 0.5) / 1000000 AS best_ratio
FROM sc
"""


@register(
    "text_langid",
    "text",
    "Language identification: per-language stopword token ratio, argmax with a "
    "fixed priority tie-break, 'und' when no list matches. Mechanism oracle-checked "
    "end to end (the synthetic corpus is vocabulary-neutral).",
    oracle=_langid_sql(),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    tok = tokens(F.col("text"))
    d = d.select("doc_id", F.col("lang").alias("labeled_lang"), tok.alias("t"))
    for lang in LANG_PRIORITY:
        d = d.withColumn(
            f"s_{lang}",
            _stop_count(F.col("t"), STOPWORDS[lang]) * F.lit(1.0) / F.size("t"),
        )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_PRIORITY])
    pred = F.when(best == 0, "und")
    for lang in LANG_PRIORITY:
        others = [o for o in LANG_PRIORITY if o != lang]
        conj = F.lit(True)
        for o in others:
            conj = conj & (F.col(f"s_{lang}") >= F.col(f"s_{o}"))
        pred = pred.when(conj, lang)
    pred = pred.otherwise("und")
    return d.select(
        "doc_id",
        "labeled_lang",
        pred.alias("pred_lang"),
        fround(best, 6).alias("best_ratio"),
    )


# --------------------------------------------------------------------------
# Quality scoring
# --------------------------------------------------------------------------

_QUALITY_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         length(text) AS n_chars_obs,
         {sql_tokens('text')} AS t,
         length(translate(text, ' ', '')) AS n_nospace,
         length(text) - length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')) AS n_punct
  FROM documents
),
feat AS (
  SELECT doc_id, n_chars_obs,
         len(t) AS n_tokens,
         n_nospace * 1.0 / len(t) AS avg_token_len,
         {_sql_stop_count('t', STOPWORDS['en'])} * 1.0 / len(t) AS stop_ratio,
         n_punct * 1.0 / n_chars_obs AS punct_ratio
  FROM base
)
SELECT doc_id, n_chars_obs, n_tokens,
       floor(avg_token_len * 10000 + 0.5) / 10000 AS avg_token_len,
       floor(stop_ratio * 10000 + 0.5) / 10000    AS stop_ratio,
       floor(punct_ratio * 10000 + 0.5) / 10000   AS punct_ratio,
       floor((0.4 * least(1.0, n_tokens / 64.0)
              + 0.4 * stop_ratio
              + 0.2 * (CASE WHEN avg_token_len BETWEEN 3 AND 8 THEN 1.0 ELSE 0.0 END))
             * 10000 + 0.5) / 10000               AS quality_score
FROM feat
"""


@register(
    "text_quality",
    "text",
    "Quality scoring: length / avg-token-length / stopword-ratio / punctuation-ratio "
    "features combined into a bounded score — the standard pre-training corpus "
    "filter shape, all as scan-local expressions.",
    oracle=_QUALITY_ORACLE,
    bench=True,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.session import spread_small_scan

    d = _docs(spark, sf_dir)
    t = tokens(F.col("text"))
    # Spread the thin projection before the per-doc tokenize/regex map
    # (one-file fixture scan would serialize it; no-op at real scale).
    d = spread_small_scan(d.select("doc_id", "text"))
    base = d.select(
        "doc_id",
        F.length("text").alias("n_chars_obs"),
        t.alias("t"),
        F.length(F.translate(F.col("text"), " ", "")).alias("n_nospace"),
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), PUNCT_CLASS, ""))
        ).alias("n_punct"),
    )
    feat = base.select(
        "doc_id",
        "n_chars_obs",
        F.size("t").alias("n_tokens"),
        (F.col("n_nospace") * F.lit(1.0) / F.size("t")).alias("avg_token_len"),
        (_stop_count(F.col("t"), STOPWORDS["en"]) * F.lit(1.0) / F.size("t")).alias(
            "stop_ratio"
        ),
        (F.col("n_punct") * F.lit(1.0) / F.col("n_chars_obs")).alias("punct_ratio"),
    )
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), F.col("n_tokens") / F.lit(64.0))
        + F.lit(0.4) * F.col("stop_ratio")
        + F.lit(0.2)
        * F.when(F.col("avg_token_len").between(3, 8), F.lit(1.0)).otherwise(F.lit(0.0))
    )
    return feat.select(
        "doc_id",
        "n_chars_obs",
        "n_tokens",
        fround(F.col("avg_token_len"), 4).alias("avg_token_len"),
        fround(F.col("stop_ratio"), 4).alias("stop_ratio"),
        fround(F.col("punct_ratio"), 4).alias("punct_ratio"),
        fround(score, 4).alias("quality_score"),
    )


# --------------------------------------------------------------------------
# Token counting
# --------------------------------------------------------------------------

_TOKENS_ORACLE = f"""
SELECT doc_id,
       len({sql_tokens('text')})                                      AS ws_tokens,
       len(regexp_extract_all(lower(text), '{BPE_ISH_RE}'))           AS re_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT)                       AS est_tokens_chars,
       length(text)                                                   AS n_chars_obs
FROM documents
"""


@register(
    "text_tokens",
    "text",
    "Token counting three ways: whitespace split, BPE-ish regex segmentation "
    "(letters/digits/symbol runs), and the chars/4 estimate.",
    oracle=_TOKENS_ORACLE,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_ISH_RE), F.lit(0))).alias(
            "re_tokens"
        ),
        # float-by-design: oracle computes ceil(length(text) / 4.0) in double
        F.ceil(F.length("text") / F.lit(4.0)).cast("long").alias("est_tokens_chars"),
        F.length("text").cast("long").alias("n_chars_obs"),
    )


# --------------------------------------------------------------------------
# Rolling-hash fingerprint (order-sensitive, streamable)
# --------------------------------------------------------------------------

_RH_BASE = 31
_RH_MOD = (1 << 31) - 1  # keeps acc*31 + token_hash < 2^63 in both engines


_ROLLING_ORACLE = f"""
WITH tok AS (SELECT doc_id, {sql_tokens('text')} AS t FROM documents),
h AS (
  SELECT doc_id,
         list_transform(t, x -> CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)) AS hs
  FROM tok
)
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT), hs),
         (acc, x) -> (acc * {_RH_BASE} + x) % {_RH_MOD}
       ) AS fingerprint
FROM h
"""


@register(
    "text_rolling_hash",
    "text",
    f"Order-sensitive document fingerprint: polynomial rolling hash "
    f"(base {_RH_BASE}, mod 2^31-1) folded over per-token md5 hashes — unlike "
    "the sorted-set fingerprint (dedup_fingerprint), token order changes the "
    "value, so it detects reordered near-copies; the fold is a row-local "
    "aggregate expression (zero shuffles) and streams left-to-right, the shape "
    "an incremental/chunked hasher uses at scale.",
    oracle=_ROLLING_ORACLE,
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.hashing import md5_int32

    d = _docs(spark, sf_dir)
    hashes = F.transform(tokens(F.col("text")), md5_int32)
    fp = F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * _RH_BASE + x) % _RH_MOD,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


# --------------------------------------------------------------------------
# TF-IDF top term per document
# --------------------------------------------------------------------------

_TFIDF_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({sql_tokens("text")}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id, term AS top_term, tf, df
FROM (
  SELECT t.doc_id, t.term, t.tf, d.df,
         row_number() OVER (
           PARTITION BY t.doc_id
           ORDER BY t.tf * ln((n.n_docs + 1.0) / (d.df + 1.0)) DESC, t.term ASC
         ) AS rk
  FROM tf t JOIN df d USING (term) CROSS JOIN n
)
WHERE rk = 1
"""


@register(
    "text_tfidf",
    "text",
    "TF-IDF top term per document: explode tokens once, count (doc, term) "
    "pairs, derive document frequency from the SAME aggregate (a term appears "
    "once per doc there — no second scan of the corpus) as a count window "
    "partitioned by term (df attaches inside the term exchange itself — no "
    "df-side aggregate exchange, no join back), broadcast the doc-count "
    "scalar, rank per doc. Scores stay smooth-idf doubles internally but the "
    "*output* is (term, tf, df) integers, with a lexicographic tie-break, so "
    "engines agree exactly. At 100 TB: the only corpus-sized shuffles are "
    "the (doc, term) count and the term-keyed df window.",
    oracle=_TFIDF_ORACLE,
    bench=True,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    # No spread_small_scan here: tokenization is cheap relative to the
    # (doc, term) groupBy shuffle that immediately follows, so an extra
    # exchange to parallelize the map stage costs more than it buys
    # (measured +0.35s at sf0.1) — unlike the md5-heavy minhash scan.
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # Document frequency as a WINDOW over tf partitioned by term
    # (round-11, guide §2.4): a term appears once per doc in tf, so
    # count(*) over (partition by term) IS df, attached to every tf row
    # inside ONE hash(term) exchange — the old df-groupBy + join-back
    # needed the aggregate's own exchange AND a second full-|tf|
    # exchange (or a |vocab| broadcast) to re-attach it.
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).join(F.broadcast(n_docs))  # bounded: 1-row count
    idf = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
    w = Window.partitionBy("doc_id").orderBy(
        (F.col("tf") * idf).desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("term").alias("top_term"), "tf", "df")
    )


# --------------------------------------------------------------------------
# Regex pattern scan (PII-style detection mechanism)
# --------------------------------------------------------------------------

# RE2/Java-regex common subset only (no lookaround, no \d shorthand —
# explicit classes port exactly between DuckDB and the JVM).
REGEX_PATTERNS: dict[str, str] = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+",
    "digits": r"[0-9]+",
    "spark_word": r"\bspark\b",
}

_REGEX_ORACLE = """
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(lower(text), '[0-9]+')) AS BIGINT) AS n_digits,
       CAST(len(regexp_extract_all(lower(text), '\\bspark\\b')) AS BIGINT) AS n_spark_word,
       len(regexp_extract_all(lower(text), '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+')) > 0 AS has_pii
FROM documents
"""


@register(
    "text_regex_scan",
    "text",
    "Per-document regex match counts (email/PII, digit runs, word hits) via "
    "regexp_extract_all — the PII-detection mechanism for training-data "
    "filtering. Patterns are restricted to the RE2/Java common subset so "
    "both engines compile identical automata. Row-local: runs inside the "
    "scan stage, zero shuffles, prunes to (doc_id, text).",
    oracle=_REGEX_ORACLE,
)
def text_regex_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    low = F.lower(F.col("text"))
    counts = {
        name: F.size(F.regexp_extract_all(low, F.lit(pat), F.lit(0))).cast("long")
        for name, pat in REGEX_PATTERNS.items()
    }
    return docs.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["digits"].alias("n_digits"),
        counts["spark_word"].alias("n_spark_word"),
        (counts["email"] > 0).alias("has_pii"),
    )


# --------------------------------------------------------------------------
# PII redaction (the scrub transform beside the detection scan)
# --------------------------------------------------------------------------

# Redaction patterns: case-insensitive via inline (?i), identical automata
# in Java regex and RE2. Emails first, then long digit runs (phone/account
# shapes) — ordered so digits inside an already-redacted email never
# double-count.
_PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+"
_PII_LONG_DIGITS = r"[0-9][0-9][0-9][0-9][0-9][0-9][0-9]+"  # 7+ digits

# The fixture corpus carries no real PII, so a deterministic footer is
# synthesized from doc_id identically in both engines (every 3rd doc
# gains an email, every 4th a long account number) — the mechanism
# (ordered redaction passes + audit digest) is the contract, exactly as
# text_url_normalize synthesizes URLs.
_PII_FEED_SQL = (
    "text || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id"
    " || '@example.com now' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN ' acct 900001' || (doc_id + 1000)"
    " ELSE '' END"
)

_PII_REDACT_ORACLE = f"""
WITH feed AS (
  SELECT doc_id, {_PII_FEED_SQL} AS text FROM documents
), red AS (
  SELECT doc_id, text,
         regexp_replace(
           regexp_replace(text, '{_PII_EMAIL}', '[EMAIL]', 'g'),
           '{_PII_LONG_DIGITS}', '[NUMBER]', 'g') AS redacted
  FROM feed
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(
           regexp_replace(text, '{_PII_EMAIL}', '[EMAIL]', 'g'),
           '{_PII_LONG_DIGITS}')) AS BIGINT) AS n_numbers,
       CAST(length(text) AS BIGINT) AS n_chars_before,
       CAST(length(redacted) AS BIGINT) AS n_chars_after,
       md5(redacted) AS redacted_digest
FROM red
"""


@register(
    "text_pii_redact",
    "text",
    "PII redaction: emails then 7+-digit runs replaced with typed "
    "placeholders, emitting per-document redaction counts, before/after "
    "lengths, and an md5 digest of the REDACTED text — so the transform "
    "itself (not just detection) is hash-verified cross-engine without "
    "hauling the corpus into the result. The fixture corpus is PII-free, "
    "so a deterministic email/account footer is synthesized from doc_id "
    "identically in both engines (the url-normalize convention). Ordered "
    "passes mean digits "
    "inside an already-redacted email never double-count. Row-local "
    "regexp_replace in the scan stage: zero shuffles, prunes to "
    "(doc_id, text); at 100 TB this is a pure map over the corpus with "
    "the audit rollup the only small output.",
    oracle=_PII_REDACT_ORACLE,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", F.expr(_PII_FEED_SQL).alias("text"))
    email_redacted = F.regexp_replace(F.col("text"), _PII_EMAIL, "[EMAIL]")
    redacted = F.regexp_replace(email_redacted, _PII_LONG_DIGITS, "[NUMBER]")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_EMAIL), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(
            F.regexp_extract_all(email_redacted, F.lit(_PII_LONG_DIGITS), F.lit(0))
        )
        .cast("long")
        .alias("n_numbers"),
        F.length("text").cast("long").alias("n_chars_before"),
        F.length(redacted).cast("long").alias("n_chars_after"),
        F.md5(redacted).alias("redacted_digest"),
    )


# --------------------------------------------------------------------------
# Fuzzy matching: bounded-block edit distance
# --------------------------------------------------------------------------

_ED_BLOCK = 50  # pairwise only within doc_id < _ED_BLOCK (bounded candidate set)
_ED_PREFIX = 40  # compare the first N chars (canonical prefix signature)
_ED_MAX = 20  # emit pairs with distance <= threshold

_EDIT_ORACLE = f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(substr(lower(trim(a.text)), 1, {_ED_PREFIX}),
                        substr(lower(trim(b.text)), 1, {_ED_PREFIX})) AS BIGINT)
         AS edit_distance
FROM documents a
JOIN documents b ON a.doc_id < b.doc_id AND a.lang = b.lang
WHERE a.doc_id < {_ED_BLOCK} AND b.doc_id < {_ED_BLOCK}
  AND levenshtein(substr(lower(trim(a.text)), 1, {_ED_PREFIX}),
                  substr(lower(trim(b.text)), 1, {_ED_PREFIX})) <= {_ED_MAX}
"""


@register(
    "text_edit_distance",
    "text",
    f"Fuzzy near-match by Levenshtein distance over canonical {_ED_PREFIX}-char "
    "prefixes, within same-language blocks of a bounded candidate set — the "
    "verify step of a blocked fuzzy-dedup pipeline. Pairwise edit distance is "
    "O(n^2) by nature, so at scale the block key does the heavy lifting "
    "(language here; LSH buckets in dedup_verified_pairs): candidates stay "
    "per-block quadratic, never corpus-quadratic, and the small side "
    "broadcasts. Both engines implement classic unweighted Levenshtein.",
    oracle=_EDIT_ORACLE,
)
def text_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    block = docs.filter(F.col("doc_id") < _ED_BLOCK).select(
        "doc_id", "lang", F.substring(F.lower(F.trim("text")), 1, _ED_PREFIX).alias("sig")
    )
    a = block.select(
        F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a"), F.col("sig").alias("sig_a")
    )
    b = block.select(
        F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b"), F.col("sig").alias("sig_b")
    )
    dist = F.levenshtein("sig_a", "sig_b")
    return (
        a.join(
            F.broadcast(b),  # bounded: fixed _ED_BLOCK prefix block (non-equi probe)
            (F.col("doc_a") < F.col("doc_b")) & (F.col("lang_a") == F.col("lang_b")),
        )
        .filter(dist <= _ED_MAX)
        .select("doc_a", "doc_b", dist.cast("long").alias("edit_distance"))
    )


# --------------------------------------------------------------------------
# Domain divergence: per-source KL vs the corpus token distribution
# --------------------------------------------------------------------------

_KL_ORACLE = f"""
WITH toks AS (
  SELECT source, unnest({sql_tokens('text')}) AS tok FROM documents
),
src_counts AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2
),
src_totals AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM src_counts GROUP BY 1
),
gdist AS (
  SELECT tok, CAST(sum(c) AS BIGINT) AS g FROM src_counts GROUP BY 1
),
gtot AS (SELECT CAST(sum(g) AS BIGINT) AS gn FROM gdist)
SELECT s.source,
       t.n AS n_tokens,
       {sql_fround(
           "sum((s.c * 1.0 / t.n) * ln((s.c * 1.0 / t.n) / (g.g * 1.0 / gt.gn)))",
           6)} AS kl_vs_corpus
FROM src_counts s
JOIN src_totals t USING (source)
JOIN gdist g USING (tok)
CROSS JOIN gtot gt
GROUP BY 1, 2
"""


@register(
    "text_domain_kl",
    "text",
    "Per-source KL divergence of the token distribution against the whole "
    "corpus — the distribution-shift score data-mixing decisions key off "
    "(which domains are redundant with the mix, which add novelty). "
    "KL(P_source || P_corpus) over observed source tokens (every source "
    "token exists globally, so no zero-q smoothing is needed). One "
    "corpus-sized token-count shuffle; the global distribution and totals "
    "are |vocab|-sized and broadcast back; floats only in the final "
    "p*ln(p/q) on identical operands (the text_lm_score convention).",
    oracle=_KL_ORACLE,
)
def text_domain_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.lineage import pin as _pin

    d = _docs(spark, sf_dir)
    toks = d.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    # Lazy pin (round-11): src_counts feeds the per-source totals, the
    # global vocab rollup AND the main join — the plan tokenized the
    # corpus four times without it (4 parquet scans -> 1).
    src_counts = _pin(
        toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c")),
        eager=False,
    )
    src_totals = src_counts.groupBy("source").agg(F.sum("c").alias("n"))
    glob = src_counts.groupBy("tok").agg(F.sum("c").alias("g"))
    glob_total = glob.agg(F.sum("g").alias("gn"))
    p = F.col("c") * 1.0 / F.col("n")
    q = F.col("g") * 1.0 / F.col("gn")
    return (
        src_counts.join(F.broadcast(src_totals), "source")  # bounded: |sources|
        .join(glob, "tok")
        .crossJoin(F.broadcast(glob_total))  # bounded: 1-row total
        .groupBy("source", F.col("n").alias("n_tokens"))
        .agg(fround(F.sum(p * F.log(p / q)), 6).alias("kl_vs_corpus"))
    )


# --------------------------------------------------------------------------
# Text normalization (the pre-tokenization canonicalization pass)
# --------------------------------------------------------------------------

_NORM_ORACLE = """
WITH norm AS (
  SELECT doc_id, text,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm_text
  FROM documents
)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_before,
       CAST(length(norm_text) AS BIGINT) AS n_chars_after,
       CAST(norm_text <> text AS INT) AS changed,
       md5(norm_text) AS norm_checksum
FROM norm
"""


@register(
    "text_normalize",
    "text",
    "Text canonicalization before tokenization/fingerprinting: lowercase, "
    "collapse whitespace runs to single spaces, trim — emitted as "
    "before/after lengths, a changed flag, and the md5 of the normalized "
    "form (the canonical checksum dedup SHOULD key on, so case/spacing "
    "variants of the same content collide). Pure scan-local string "
    "expressions, zero shuffles; the checksum column feeds the exact-"
    "dedup and incremental-ingest fingerprint stores unchanged.",
    oracle=_NORM_ORACLE,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_before"),
        F.length(norm).cast("long").alias("n_chars_after"),
        (norm != F.col("text")).cast("int").alias("changed"),
        F.md5(norm).alias("norm_checksum"),
    )


# --------------------------------------------------------------------------
# BPE merge step (tokenizer training: count pairs -> pick -> apply merge)
# --------------------------------------------------------------------------

_BPE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, {sql_tokens('text')} AS t FROM documents
),
pairs AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                i -> t[i] || ' ' || t[i + 1])) AS pair
  FROM tok WHERE len(t) >= 2
),
top1 AS (
  SELECT pair, CAST(count(*) AS BIGINT) AS pair_count
  FROM pairs GROUP BY 1
  ORDER BY pair_count DESC, pair ASC LIMIT 1
),
w AS (
  SELECT source, len(t) AS n_tok,
         '|' || array_to_string(t, '||') || '|' AS s
  FROM tok
),
m AS (
  SELECT w.source, w.n_tok, top1.pair, top1.pair_count,
         length(w.s) - length(replace(
            w.s,
            '|' || split_part(top1.pair, ' ', 1) || '||' || split_part(top1.pair, ' ', 2) || '|',
            '|' || split_part(top1.pair, ' ', 1) || '_'  || split_part(top1.pair, ' ', 2) || '|'
         )) AS n_merges
  FROM w CROSS JOIN top1
)
SELECT source, any_value(pair) AS merged_pair,
       any_value(pair_count) AS pair_count,
       CAST(sum(n_tok) AS BIGINT) AS tokens_before,
       CAST(sum(n_merges) AS BIGINT) AS n_merges,
       CAST(sum(n_tok) - sum(n_merges) AS BIGINT) AS tokens_after
FROM m
GROUP BY source
"""


@register(
    "text_bpe_merge",
    "text",
    "One BPE tokenizer-training merge step over the corpus: count every "
    "adjacent token pair (row-local pair arrays, one partially-aggregated "
    "shuffle), pick the most frequent pair (ties -> lexicographically "
    "first), and APPLY the merge corpus-wide with greedy left-to-right "
    "non-overlapping semantics — reported per source as tokens "
    "before/after and merge counts. Full BPE training iterates this exact "
    "step; one bit-reproducible round is the unit the loop is built from "
    "(the pagerank/k-means pattern: per round, one broadcast of the "
    "decision + one scan).",
    oracle=_BPE_ORACLE,
)
def text_bpe_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge application is string-level on a delimiter-wrapped join
    ('|a||b|' -> '|a_b|'): both engines' replace() scan left-to-right
    without overlap, and each merge shrinks the string by exactly one
    char ('||' -> '_'), so n_merges = len_delta with no re-tokenization
    pass (pinned by the overlap-semantics unit test — oracle parity
    alone can't catch a length-delta mistake both sides share). 100 TB:
    pair counting is the only shuffle; the chosen pair broadcasts; the
    apply pass is scan-local. (Production separators would be control
    chars; the fixture corpus is whitespace word soup, and parity holds
    for ANY corpus since both engines run the identical expression.)"""
    return bpe_merge_step(_docs(spark, sf_dir))


def bpe_merge_step(d: DataFrame) -> DataFrame:
    """One merge round over ``(source, text)`` rows."""
    tok = d.select("source", tokens(F.col("text")).alias("t"))
    pair_arr = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("t"), i + 1),
                F.element_at(F.col("t"), i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top1 = (
        tok.select(F.explode(pair_arr).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(1)
    )
    a = F.element_at(F.split(F.col("pair"), " "), 1)
    b = F.element_at(F.split(F.col("pair"), " "), 2)
    wrapped = F.concat(F.lit("|"), F.concat_ws("||", F.col("t")), F.lit("|"))
    search = F.concat(F.lit("|"), a, F.lit("||"), b, F.lit("|"))
    repl = F.concat(F.lit("|"), a, F.lit("_"), b, F.lit("|"))
    merged = tok.crossJoin(F.broadcast(top1)).select(  # bounded: limit(1) row
        "source",
        "pair",
        "pair_count",
        F.size("t").alias("n_tok"),
        (F.length(wrapped) - F.length(F.replace(wrapped, search, repl)))
        .cast("long")
        .alias("n_merges"),
    )
    return merged.groupBy("source").agg(
        F.any_value(F.col("pair")).alias("merged_pair"),
        F.any_value(F.col("pair_count")).alias("pair_count"),
        F.sum("n_tok").alias("tokens_before"),
        F.sum("n_merges").alias("n_merges"),
        (F.sum("n_tok") - F.sum("n_merges")).alias("tokens_after"),
    )


# --------------------------------------------------------------------------
# Language-ID evaluation (confusion matrix against the labeled corpus)
# --------------------------------------------------------------------------

_LANGID_EVAL_ORACLE = f"""
WITH p AS ({_langid_sql()})
SELECT labeled_lang, pred_lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       floor((count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY labeled_lang))
             * 1000000 + 0.5) / 1000000 AS label_share
FROM p
GROUP BY labeled_lang, pred_lang
"""


@register(
    "text_langid_eval",
    "text",
    "Classifier evaluation as a first-class query: the langid "
    "heuristic's confusion matrix against the corpus's TRUE lang labels "
    "— per (labeled, predicted) doc counts plus each cell's share of "
    "its label row (the per-class recall diagonal). The eval composes "
    "the already-oracle-checked predictor, so a prediction regression "
    "shows up as matrix drift, not just a silent quality change. One "
    "groupBy shuffle over the predictor's output.",
    oracle=_LANGID_EVAL_ORACLE,
)
def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pred = text_langid(spark, sf_dir)
    w = Window.partitionBy("labeled_lang")
    counts = pred.groupBy("labeled_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return counts.select(
        "labeled_lang",
        "pred_lang",
        "n_docs",
        fround(
            F.col("n_docs") * F.lit(1.0) / F.sum("n_docs").over(w), 6
        ).alias("label_share"),
    )


# --------------------------------------------------------------------------
# Multi-round BPE encoding (the trainer loop composed end-to-end)
# --------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _bpe_oracle_sql(rounds: int) -> str:
    """Unrolled-CTE oracle for ``rounds`` BPE merge rounds (the pagerank
    convention: fixed iteration count, one CTE chain per round). Each
    round re-tokenizes the delimited string, picks the top pair
    (count DESC, pair ASC), and applies the non-overlapping replace;
    every merge shrinks the string by exactly one char, so
    tokens_after = tokens_before - total length delta."""
    parts = [
        f"""WITH s0 AS (
  SELECT doc_id, source,
         CAST(len(t) AS BIGINT) AS n0,
         '|' || array_to_string(t, '||') || '|' AS s
  FROM (SELECT doc_id, source, {sql_tokens('text')} AS t FROM documents)
)"""
    ]
    for r in range(1, rounds + 1):
        prev = f"s{r - 1}"
        parts.append(
            f""", p{r} AS (
  SELECT unnest(list_transform(generate_series(1, len(tk) - 1),
                i -> tk[i] || ' ' || tk[i + 1])) AS pair
  FROM (SELECT str_split(substr(s, 2, length(s) - 2), '||') AS tk
        FROM {prev} WHERE length(s) > 2)
  WHERE len(tk) >= 2
), t{r} AS (
  SELECT pair FROM p{r} GROUP BY pair
  ORDER BY count(*) DESC, pair ASC LIMIT 1
), s{r} AS (
  SELECT doc_id, source, n0,
         replace(s,
           '|' || split_part((SELECT pair FROM t{r}), ' ', 1) || '||'
               || split_part((SELECT pair FROM t{r}), ' ', 2) || '|',
           '|' || split_part((SELECT pair FROM t{r}), ' ', 1) || '_'
               || split_part((SELECT pair FROM t{r}), ' ', 2) || '|') AS s
  FROM {prev}
)"""
        )
    merge_cols = ",\n       ".join(
        f"(SELECT pair FROM t{r}) AS merge_{r}" for r in range(1, rounds + 1)
    )
    parts.append(
        f"""
SELECT f.source,
       {merge_cols},
       CAST(sum(f.n0) AS BIGINT) AS tokens_before,
       CAST(sum(length(z.s) - length(f.s)) AS BIGINT) AS n_merges,
       CAST(sum(f.n0) - sum(length(z.s) - length(f.s)) AS BIGINT) AS tokens_after
FROM s{rounds} f JOIN s0 z USING (doc_id)
GROUP BY f.source"""
    )
    return "".join(parts)


@register(
    "text_bpe_encode",
    "text",
    f"BPE encoding with {_BPE_ROUNDS} training rounds composed end-to-end "
    "(the loop text_bpe_merge is the unit of): each round counts adjacent "
    "pairs over the CURRENT merged token stream (re-split from the "
    "delimited string), broadcasts the top pair (ties -> lexicographically "
    "first), and applies the greedy non-overlapping corpus-wide replace. "
    "Per-round cost is one partially-aggregated pair-count shuffle + a "
    "1-row driver collect (the k-means/pagerank decision-collect pattern) "
    "+ a scan-local rewrite; tokens_after falls out of the exact "
    "one-char-per-merge length delta, no final re-tokenization. Output "
    "per source: the merge table (vocabulary additions) and token "
    "compression achieved.",
    oracle=_bpe_oracle_sql(_BPE_ROUNDS),
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    tok = d.select("doc_id", "source", tokens(F.col("text")).alias("t"))
    state = tok.select(
        "doc_id",
        "source",
        F.size("t").cast("long").alias("n0"),
        F.concat(F.lit("|"), F.concat_ws("||", F.col("t")), F.lit("|")).alias("s"),
    )
    len0 = F.length("s").alias("len0")
    state = state.select("doc_id", "source", "n0", "s", len0)

    merges: list[str] = []
    for _ in range(_BPE_ROUNDS):
        tk = F.split(F.expr("substr(s, 2, length(s) - 2)"), r"\|\|")
        # zip_with over two slices, NOT transform+element_at: `tk` is
        # a lambda-free argument here, so it evaluates a constant
        # number of times per row. A lambda-bound element_at(tk, i)
        # defeats Catalyst's subexpression elimination (the minhash
        # convention) and re-runs the split+replace chain PER ELEMENT
        # — measured 6x slower on this exact expansion at sf0.1.
        pair_arr = F.when(
            F.size(tk) >= 2,
            F.zip_with(
                F.slice(tk, 1, F.size(tk) - 1),
                F.slice(tk, 2, F.size(tk) - 1),
                lambda x, y: F.concat_ws(" ", x, y),
            ),
        ).otherwise(F.array().cast("array<string>"))
        top = (
            state.filter(F.length("s") > 2)
            .select(F.explode(pair_arr).alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        a, b = top[0]["pair"].split(" ")
        merges.append(top[0]["pair"])
        state = state.withColumn(
            "s", F.replace(F.col("s"), F.lit(f"|{a}||{b}|"), F.lit(f"|{a}_{b}|"))
        )

    n_merges = (F.col("len0") - F.length("s")).cast("long")
    out = state.groupBy("source").agg(
        F.sum("n0").alias("tokens_before"),
        F.sum(n_merges).alias("n_merges"),
        (F.sum("n0") - F.sum(n_merges)).alias("tokens_after"),
    )
    sel = [F.col("source")]
    sel += [F.lit(m).alias(f"merge_{i + 1}") for i, m in enumerate(merges)]
    sel += [F.col("tokens_before"), F.col("n_merges"), F.col("tokens_after")]
    return out.select(*sel)


# --------------------------------------------------------------------------
# Batched BPE training (top-m disjoint merges per driver round-trip)
# --------------------------------------------------------------------------
#
# text_bpe_encode is one driver round-trip PER MERGE — honest about it,
# but real BPE training runs 10k-50k merges, i.e. 10k+ job launches and
# a plan that grows per round (round-9 verdict item 4). The batched
# trainer amortizes: per round-trip it collects the TOP-K candidate
# pairs (bounded, ordered count DESC / pair ASC), greedily keeps up to
# M whose tokens are mutually DISJOINT (no token participates in two
# kept merges — kept replaces then cannot interact, so one chained
# scan-local rewrite applies them all), and rewrites once. M merges
# per shuffle+collect instead of 1: 50k merges become ~6k round-trips
# at M=8, and each round-trip's collect is <= K rows regardless of
# corpus size. The bounded-K candidate window is part of the DECLARED
# semantics (both the Spark side and the oracle consider exactly the
# top K), so the query stays hash-checkable end-to-end.

_BPE_BATCH_SUPER = 2  # super-rounds (fixture-scale; production: n/M)
_BPE_BATCH_M = 8  # max merges applied per round-trip
_BPE_BATCH_K = 256  # candidate window collected per round-trip
# Lineage-cut cadence for the super-round loop: every PIN_INTERVAL
# super-rounds the rewrite state is pinned, so the live plan never
# carries more than PIN_INTERVAL x M chained replace() expressions and
# each candidate collect recomputes at most PIN_INTERVAL rounds of
# rewrites instead of every round since source (round-11; closes the
# advertised-production-scale plan-growth gap — at ~6k round-trips for
# 50k merges the unpinned chain was unbounded). 4 keeps the fixture
# run pin-free (SUPER=2), so the bounded-plan fix costs the bench
# nothing locally.
_BPE_PIN_INTERVAL = 4


def _bpe_batched_oracle_sql(
    super_rounds: int, m: int, k: int
) -> str:
    """Unrolled recursive-CTE oracle for the batched trainer: per
    super-round, rank pairs (count DESC, pair ASC) LIMIT k, run the
    SAME greedy disjoint selection as the Spark driver loop via a
    recursive CTE threading (chosen, used-token) lists, and apply the
    up-to-m kept merges as one nested replace chain (chr(1) sentinel
    pads unused slots — it cannot occur in whitespace-split tokens)."""
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, so the
    # recursive greedy selection would otherwise re-evaluate the full
    # corpus pair count once per recursion step (256x) and each of the
    # replace slots would re-run the recursion — hours instead of
    # seconds at sf0.01.
    parts = [
        f"""WITH RECURSIVE s0 AS MATERIALIZED (
  SELECT doc_id, source,
         CAST(len(t) AS BIGINT) AS n0,
         '|' || array_to_string(t, '||') || '|' AS s
  FROM (SELECT doc_id, source, {sql_tokens('text')} AS t FROM documents)
)"""
    ]
    for r in range(1, super_rounds + 1):
        prev = f"s{r - 1}"
        sel = f"(SELECT chosen FROM m{r})"

        def _tok(i: int, part: int) -> str:
            return (
                f"coalesce(split_part(list_extract({sel}, {i}), ' ', "
                f"{part}), chr(1))"
            )

        expr = "s"
        for i in range(1, m + 1):
            pat = f"'|' || {_tok(i, 1)} || '||' || {_tok(i, 2)} || '|'"
            rep = f"'|' || {_tok(i, 1)} || '_' || {_tok(i, 2)} || '|'"
            expr = f"replace({expr}, {pat}, {rep})"
        parts.append(
            f""", p{r} AS (
  SELECT unnest(list_transform(generate_series(1, len(tk) - 1),
                i -> tk[i] || ' ' || tk[i + 1])) AS pair
  FROM (SELECT str_split(substr(s, 2, length(s) - 2), '||') AS tk
        FROM {prev} WHERE length(s) > 2)
  WHERE len(tk) >= 2
), k{r} AS MATERIALIZED (
  SELECT pair, split_part(pair, ' ', 1) AS t1,
         split_part(pair, ' ', 2) AS t2,
         row_number() OVER (ORDER BY c DESC, pair ASC) AS rn
  FROM (SELECT pair, count(*) AS c FROM p{r} GROUP BY pair)
  ORDER BY c DESC, pair ASC LIMIT {k}
), g{r} AS (
  SELECT CAST(0 AS BIGINT) AS rn, CAST([] AS VARCHAR[]) AS chosen,
         CAST([] AS VARCHAR[]) AS used
  UNION ALL
  SELECT c.rn,
         CASE WHEN len(g.chosen) >= {m} OR list_contains(g.used, c.t1)
                   OR list_contains(g.used, c.t2)
              THEN g.chosen ELSE list_append(g.chosen, c.pair) END,
         CASE WHEN len(g.chosen) >= {m} OR list_contains(g.used, c.t1)
                   OR list_contains(g.used, c.t2)
              THEN g.used ELSE list_concat(g.used, [c.t1, c.t2]) END
  FROM g{r} g JOIN k{r} c ON c.rn = g.rn + 1
), m{r} AS MATERIALIZED (
  SELECT chosen FROM g{r} ORDER BY rn DESC LIMIT 1
), s{r} AS MATERIALIZED (
  SELECT doc_id, source, n0, {expr} AS s
  FROM {prev}
)"""
        )
    merge_cols = ",\n       ".join(
        f"array_to_string((SELECT chosen FROM m{r}), ',') AS merges_r{r}"
        for r in range(1, super_rounds + 1)
    )
    parts.append(
        f"""
SELECT f.source,
       {merge_cols},
       CAST(sum(f.n0) AS BIGINT) AS tokens_before,
       CAST(sum(length(z.s) - length(f.s)) AS BIGINT) AS n_merges,
       CAST(sum(f.n0) - sum(length(z.s) - length(f.s)) AS BIGINT)
         AS tokens_after
FROM s{super_rounds} f JOIN s0 z USING (doc_id)
GROUP BY f.source"""
    )
    return "".join(parts)


def bpe_greedy_disjoint(
    pairs: list[str], m: int
) -> list[str]:
    """Greedy disjoint merge selection shared by the trainer and its
    tests: walk candidates in (count DESC, pair ASC) order, keep a
    pair iff neither token was used by an earlier kept pair, stop at
    ``m``. Disjoint tokens => the kept replaces cannot create or
    destroy each other's match sites, so one chained rewrite equals
    applying them one-per-round in any order."""
    chosen: list[str] = []
    used: set[str] = set()
    for pr in pairs:
        if len(chosen) >= m:
            break
        a, b = pr.split(" ")
        if a in used or b in used:
            continue
        chosen.append(pr)
        used.update((a, b))
    return chosen


@register(
    "text_bpe_batched",
    "text",
    f"Batched BPE training: {_BPE_BATCH_SUPER} super-rounds, each ONE "
    f"driver round-trip — count adjacent pairs, collect the top-"
    f"{_BPE_BATCH_K} candidates (bounded, count DESC / pair ASC), "
    f"greedily keep up to {_BPE_BATCH_M} merges with mutually disjoint "
    "tokens, and apply them in one chained scan-local rewrite. The "
    "scale-safe form of text_bpe_encode's merge-per-round-trip loop: "
    "50k production merges need ~50k/m collects instead of 50k, each "
    "bounded by the candidate window regardless of corpus size. "
    "Disjointness makes the batch order-independent; the bounded "
    "window is part of the declared semantics, so the recursive-CTE "
    "oracle replays the identical greedy selection and the result "
    "stays hash-checked end-to-end.",
    oracle=_bpe_batched_oracle_sql(
        _BPE_BATCH_SUPER, _BPE_BATCH_M, _BPE_BATCH_K
    ),
)
def text_bpe_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    tok = d.select("doc_id", "source", tokens(F.col("text")).alias("t"))
    state = tok.select(
        "doc_id",
        "source",
        F.size("t").cast("long").alias("n0"),
        F.concat(
            F.lit("|"), F.concat_ws("||", F.col("t")), F.lit("|")
        ).alias("s"),
        F.length(
            F.concat(F.lit("|"), F.concat_ws("||", F.col("t")), F.lit("|"))
        ).alias("len0"),
    )

    round_merges: list[list[str]] = []
    for sr in range(_BPE_BATCH_SUPER):
        # Bounded plan: pin every _BPE_PIN_INTERVAL super-rounds (the
        # cut_lineage interval pattern) so neither the expression chain
        # nor the per-collect recompute window grows with the round
        # count. No-op at the fixture's 2 super-rounds.
        if sr > 0 and sr % _BPE_PIN_INTERVAL == 0:
            state = _pin(state)
        tk = F.split(F.expr("substr(s, 2, length(s) - 2)"), r"\|\|")
        # zip_with over two slices, NOT transform+element_at: `tk` is
        # a lambda-free argument here, so it evaluates a constant
        # number of times per row. A lambda-bound element_at(tk, i)
        # defeats Catalyst's subexpression elimination (the minhash
        # convention) and re-runs the split+replace chain PER ELEMENT
        # — measured 6x slower on this exact expansion at sf0.1.
        pair_arr = F.when(
            F.size(tk) >= 2,
            F.zip_with(
                F.slice(tk, 1, F.size(tk) - 1),
                F.slice(tk, 2, F.size(tk) - 1),
                lambda x, y: F.concat_ws(" ", x, y),
            ),
        ).otherwise(F.array().cast("array<string>"))
        # ONE bounded collect per super-round: top-K candidate pairs
        # (TakeOrderedAndProject — K rows cross the driver, never the
        # corpus), then the greedy disjoint pick runs driver-side in
        # plain Python over those K rows.
        cand = (
            state.filter(F.length("s") > 2)
            .select(F.explode(pair_arr).alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc("pair"))
            .limit(_BPE_BATCH_K)
            .collect()
        )
        chosen = bpe_greedy_disjoint(
            [r["pair"] for r in cand], _BPE_BATCH_M
        )
        round_merges.append(chosen)
        col = F.col("s")
        for pr in chosen:
            a, b = pr.split(" ")
            col = F.replace(
                col, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}_{b}|")
            )
        state = state.withColumn("s", col)

    n_merges = (F.col("len0") - F.length("s")).cast("long")
    out = state.groupBy("source").agg(
        F.sum("n0").alias("tokens_before"),
        F.sum(n_merges).alias("n_merges"),
        (F.sum("n0") - F.sum(n_merges)).alias("tokens_after"),
    )
    sel = [F.col("source")]
    sel += [
        F.lit(",".join(ms)).alias(f"merges_r{i + 1}")
        for i, ms in enumerate(round_merges)
    ]
    sel += [F.col("tokens_before"), F.col("n_merges"), F.col("tokens_after")]
    return out.select(*sel)


# --------------------------------------------------------------------------
# BM25 ranked retrieval (the corpus-curation search primitive)
# --------------------------------------------------------------------------

BM25_TERMS = ("data", "stream", "join")  # fixed demo query
_BM25_TOPN = 10

# Identical expression TEXT evaluates in both engines (same literal
# constants, same nesting => same IEEE operation sequence). k1=1.2,
# b=0.75; contribution is 0 when tf=0 (numerator zeroes out).
def _bm25_term_expr(term: str) -> str:
    return (
        f"ln(1 + (n - df_{term} + 0.5) / (df_{term} + 0.5))"
        f" * (tf_{term} * 2.2)"
        f" / (tf_{term} + 1.2 * (0.25 + 0.75 * dl / avgdl))"
    )


_BM25_SCORE = " + ".join(_bm25_term_expr(t) for t in BM25_TERMS)

_BM25_ORACLE = f"""
WITH per_doc AS (
  SELECT doc_id, len({sql_tokens('text')}) AS dl,
         {", ".join(
            f"CAST(len(list_filter({sql_tokens('text')}, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
            for t in BM25_TERMS
         )}
  FROM documents
), st AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(dl) * 1.0 / count(*) AS avgdl,
         {", ".join(
            f"CAST(count(*) FILTER (tf_{t} > 0) AS BIGINT) AS df_{t}"
            for t in BM25_TERMS
         )}
  FROM per_doc
), scored AS (
  SELECT p.doc_id, p.dl,
         {", ".join(f"p.tf_{t}" for t in BM25_TERMS)},
         {_BM25_SCORE} AS s
  FROM per_doc p CROSS JOIN st
  WHERE {" + ".join(f"p.tf_{t}" for t in BM25_TERMS)} > 0
)
SELECT CAST(row_number() OVER (ORDER BY s DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, dl, {", ".join(f"tf_{t}" for t in BM25_TERMS)}
FROM scored
ORDER BY s DESC, doc_id ASC
LIMIT {_BM25_TOPN}
"""


@register(
    "text_bm25_search",
    "text",
    f"BM25 ranked retrieval for a fixed {len(BM25_TERMS)}-term query "
    "(k1=1.2, b=0.75) — the keyword-search primitive behind corpus "
    "curation and RAG candidate generation. Per-doc term frequencies "
    "pivot into FIXED columns (scan-local list_filter counts, no "
    "explode/shuffle for tf), corpus stats (N, avgdl, per-term df) "
    "reduce to ONE broadcast row, and the score sums term "
    "contributions in a fixed expression order — float addition order "
    "is deterministic, so both engines run the identical IEEE "
    "operation sequence and the ranking needs no rounding fudge. "
    "Output is integer-only (rank, dl, tfs); the float score exists "
    "only in ORDER BY, like text_tfidf. At 100 TB: one corpus scan + "
    "one 1-row aggregate + one top-n sort of hit docs; a real "
    "deployment swaps the fixed pivot for an inverted-index join but "
    "keeps this exact scoring kernel.",
    oracle=_BM25_ORACLE,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))
    # Pin the tokenize+pivot pass (round-11): both the corpus-stats
    # aggregate and the hit filter consume per_doc, so without the pin
    # the tokenization of every document ran TWICE (once per branch).
    # The pinned rows are the ~56-byte (doc_id, dl, tf_*) metadata
    # proxy, not the text — one corpus scan, as the scale note claims.
    per_doc = _pin(d.select(
        "doc_id",
        F.size(toks).alias("dl"),
        # NB: the closure factory keeps the lambda single-arg — a
        # two-arg lambda would make F.filter pass the array INDEX as
        # the second argument.
        *[
            F.size(F.filter(toks, (lambda term: lambda x: x == term)(t)))
            .cast("long")
            .alias(f"tf_{t}")
            for t in BM25_TERMS
        ],
    ))
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl") * F.lit(1.0) / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    hits = per_doc.filter(
        sum(F.col(f"tf_{t}") for t in BM25_TERMS) > 0
    ).crossJoin(F.broadcast(stats))  # bounded: 1-row corpus stats
    scored = hits.withColumn("s", F.expr(_BM25_SCORE))
    w = Window.orderBy(F.desc("s"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _BM25_TOPN)
        .select("rank", "doc_id", "dl", *[f"tf_{t}" for t in BM25_TERMS])
    )


# --------------------------------------------------------------------------
# Feature hashing (the hashing trick): text -> fixed-dim sparse vector
# --------------------------------------------------------------------------

_FH_DIMS = 64  # hashed feature space size

_FH_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
), hashed AS (
  SELECT doc_id,
         {sql_md5_int32('term')} % {_FH_DIMS} AS dim,
         CASE WHEN ({sql_md5_int32('term')} // {_FH_DIMS}) % 2 = 0
              THEN 1 ELSE -1 END AS sgn
  FROM tok
)
SELECT doc_id, CAST(dim AS BIGINT) AS dim,
       CAST(sum(sgn) AS BIGINT) AS weight
FROM hashed GROUP BY 1, 2
HAVING sum(sgn) <> 0
"""


@register(
    "text_feature_hash",
    "text",
    f"Feature hashing (the hashing trick): every token maps to one of "
    f"{_FH_DIMS} dimensions by portable hash, with the hash's next bit "
    "supplying the +/-1 sign that makes collision noise zero-mean "
    "(the signed hashing-trick construction) — the fixed-width, "
    "vocabulary-FREE text vectorizer for linear models at corpus "
    "scale. Output is the sparse (doc, dim, weight) triple form "
    "(zero-sum dims dropped), what a sparse-matrix loader ingests. "
    "One (doc, dim) groupBy with map-side combine; no vocabulary "
    "pass, no broadcast side, task state O(1) — the property that "
    "distinguishes it from TF-IDF at 100 TB.",
    oracle=_FH_ORACLE,
)
def text_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.hashing import md5_int32

    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    h = md5_int32(F.col("term"))
    # Sign bit via integral div (round-11, verdict residual): h is an
    # int32 and may be NEGATIVE — SQL div truncates toward zero exactly
    # like the previous (h / N).cast("long"), and like the oracle's
    # DuckDB `//`, so results are bit-identical while retiring the
    # floor(int/int)-in-double class (exact only below 2^53).
    sgn = F.when((idiv(h, _FH_DIMS) % 2) == 0, F.lit(1)).otherwise(F.lit(-1))
    hashed = toks.select("doc_id", (h % _FH_DIMS).alias("dim"), sgn.alias("sgn"))
    return (
        hashed.groupBy("doc_id", "dim")
        .agg(F.sum("sgn").alias("weight"))
        .filter(F.col("weight") != 0)
    )


# --------------------------------------------------------------------------
# Skipgram co-occurrence pairs (embedding-training data construction)
# --------------------------------------------------------------------------

_SG_WINDOW = 2  # context window each side
_SG_MIN_COUNT = 3

_SG_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {sql_tokens('text')} AS tk FROM documents
),
ok AS (
  SELECT doc_id, tk FROM toks WHERE len(tk) >= 2
),
pairs AS (
  SELECT unnest(flatten(list_transform(generate_series(1, len(tk) - 1),
           i -> list_transform(generate_series(1, least({_SG_WINDOW}, len(tk) - i)),
             d -> {{'w1': least(tk[i], tk[i + d]),
                    'w2': greatest(tk[i], tk[i + d])}})))) AS p
  FROM ok
)
SELECT p.w1 AS w1, p.w2 AS w2, CAST(count(*) AS BIGINT) AS cnt
FROM pairs
GROUP BY p.w1, p.w2
HAVING count(*) >= {_SG_MIN_COUNT}
"""


@register(
    "text_skipgram_pairs",
    "text",
    f"Skipgram co-occurrence mining (the word2vec/GloVe training-data "
    f"constructor): token pairs within a ±{_SG_WINDOW} window, "
    "canonically ordered (least, greatest) so both directions "
    "accumulate together, counted corpus-wide and thresholded at "
    f"min_count={_SG_MIN_COUNT}. Pair expansion is ROW-LOCAL — nested "
    "sequence/transform over the token array, no positional self-join, "
    "no corpus-quadratic anything — so the only shuffle is the final "
    "pair count (map-side combined; |pairs| ~ window x corpus tokens). "
    "Docs shorter than 2 tokens are filtered BEFORE the position "
    "sequence (the descending-sequence edge the motif query's guard "
    "pinned). Feeds PMI (text_collocations) and any embedding trainer.",
    oracle=_SG_ORACLE,
)
def text_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    tk = tokens(F.col("text"))
    ok = d.select(tk.alias("tk")).filter(F.size("tk") >= 2)
    pair = F.explode(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - 1),
                lambda i: F.transform(
                    F.sequence(
                        F.lit(1),
                        F.least(F.lit(_SG_WINDOW), F.size("tk") - i),
                    ),
                    lambda dd: F.struct(
                        F.least(
                            F.element_at("tk", i), F.element_at("tk", i + dd)
                        ).alias("w1"),
                        F.greatest(
                            F.element_at("tk", i), F.element_at("tk", i + dd)
                        ).alias("w2"),
                    ),
                ),
            )
        )
    )
    return (
        ok.select(pair.alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= _SG_MIN_COUNT)
    )


# --------------------------------------------------------------------------
# Dataset card (the per-language release summary of the corpus)
# --------------------------------------------------------------------------

_CARD_ORACLE = f"""
WITH q AS ({_QUALITY_ORACLE}),
fp AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct({sql_tokens('text')})), ' '))
           AS fingerprint
  FROM documents
),
dup AS (
  SELECT doc_id,
         (doc_id <> min(doc_id) OVER (PARTITION BY fingerprint)) AS is_dup
  FROM fp
)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
       CAST(sum(q.n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN dup.is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       CAST(sum(CAST(floor(q.quality_score * 10000 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_quality_e4
FROM documents d
JOIN q ON q.doc_id = d.doc_id
JOIN dup ON dup.doc_id = d.doc_id
GROUP BY d.lang
"""


@register(
    "text_dataset_card",
    "text",
    "Dataset card: the per-language release summary a corpus ships "
    "with — document and source counts, exact character and token "
    "totals, fingerprint-duplicate counts, and the exact integer sum "
    "of quality scores (sum + count instead of a float mean, so the "
    "card itself is merge-order-invariant and re-aggregatable across "
    "corpus shards). Composes three already-verified primitives "
    "(token counting, quality scoring, fingerprint dedup) into the "
    "one table a consumer reads before training; every number is "
    "hash-checked, so the card can't silently drift from the corpus "
    "it describes. One scan feeds all features; the rollup is "
    "|languages|-sized.",
    oracle=_CARD_ORACLE,
)
def text_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    q = text_quality(spark, sf_dir).select("doc_id", "n_tokens", "quality_score")
    fp = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(F.col("text")))))
    )
    wfp = Window.partitionBy("fingerprint")
    dup = (
        d.select("doc_id", fp.alias("fingerprint"))
        .withColumn("is_dup", F.col("doc_id") != F.min("doc_id").over(wfp))
        .select("doc_id", "is_dup")
    )
    joined = (
        d.select("doc_id", "lang", "source", "n_chars")
        .join(q, "doc_id")
        .join(dup, "doc_id")
    )
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("source").alias("n_sources"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.col("is_dup").cast("long")).alias("n_dup_docs"),
        F.sum(
            F.floor(F.col("quality_score") * 10000 + F.lit(0.5)).cast("long")
        ).alias("sum_quality_e4"),
    )


# --------------------------------------------------------------------------
# Python UDTF tier (SURVEY §2.2 custom-function surface closure)
# --------------------------------------------------------------------------

_UDTF_RUNS_ORACLE = f"""
WITH t AS (
  SELECT doc_id, unnest(tk) AS tok,
         generate_subscripts(tk, 1) AS pos
  FROM (SELECT doc_id, {sql_tokens('text')} AS tk FROM documents)
), m AS (
  SELECT doc_id, tok, pos,
         CASE WHEN lag(tok) OVER (PARTITION BY doc_id ORDER BY pos)
                   IS DISTINCT FROM tok
              THEN 1 ELSE 0 END AS brk
  FROM t
), g AS (
  SELECT doc_id, tok, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM m
)
SELECT doc_id,
       CAST(grp AS BIGINT) AS span_idx,
       tok AS token,
       CAST(count(*) AS BIGINT) AS run_len,
       CAST(min(pos) AS BIGINT) AS start_pos
FROM g GROUP BY doc_id, grp, tok
"""


@register(
    "text_udtf_token_runs",
    "text",
    "Per-document token RUN-LENGTH expansion via a registered Python "
    "UDTF called through SQL LATERAL — one input document row expands "
    "to one output row per maximal run of consecutive equal tokens "
    "(span_idx, token, run_len, start_pos). Closes the declared "
    "custom-function surface's table-function tier (SURVEY §2.2: "
    "UDF/UDAF/UDTF — scalar, grouped-agg, map, grouped-map and "
    "stateful tiers already exist). Per-row Python is the declared "
    "slow path, appropriate here because the expansion is inherently "
    "imperative per row and row-local (no shuffle, parallel across "
    "partitions); the DuckDB oracle is the equivalent DECLARATIVE "
    "gaps-and-islands form (lag + running break sum + group), which is "
    "what the hot path would use if this op ever left the extension "
    "tier — the hash check proves the two formulations equal.",
    oracle=_UDTF_RUNS_ORACLE,
)
def text_udtf_token_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="doc_id: bigint, span_idx: bigint, token: string, "
        "run_len: bigint, start_pos: bigint"
    )
    class TokenRuns:
        def eval(self, doc_id, text):
            import re

            # EXACTLY the oracle's sql_tokens semantics, including the
            # edges (round-10 advice): SQL trim() strips SPACES only,
            # so strip(' ') — a bare .strip() would also eat
            # tabs/newlines and merge runs the oracle keeps separate —
            # and DuckDB's \s is ASCII (RE2), so flags=re.ASCII keeps
            # NBSP and other Unicode whitespace inside tokens exactly
            # as the SQL side does. Yields [''] for empty — same
            # one-token run both engines.
            toks = re.split(
                r"\s+", (text or "").lower().strip(" "), flags=re.ASCII
            )
            idx = 0
            i = 0
            while i < len(toks):
                j = i
                while j < len(toks) and toks[j] == toks[i]:
                    j += 1
                idx += 1
                yield (doc_id, idx, toks[i], j - i, i + 1)
                i = j

    spark.udtf.register("ssk_token_runs", TokenRuns)
    _docs(spark, sf_dir).createOrReplaceTempView("ssk_udtf_docs")
    return spark.sql(
        "SELECT s.doc_id, s.span_idx, s.token, s.run_len, s.start_pos "
        "FROM ssk_udtf_docs AS d, "
        "LATERAL ssk_token_runs(d.doc_id, d.text) AS s"
    )
