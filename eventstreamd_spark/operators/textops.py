"""Document-level text analysis over the ``documents`` table:
language ID, quality scoring, token stats, fingerprinting.

All pure narrow projections (scan -> map), no shuffle: at 100 TB these
run at scan speed and fuse into whole-stage codegen.  Every metric has
a DuckDB twin generated from the same constants (functions/text.py), so
the whole battery is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from eventstreamd_spark.session import fan_out
from eventstreamd_spark.functions.text import (
    lang_id,
    poly_hash,
    punct_count,
    sql_lang_id,
    sql_poly_hash,
    sql_punct_count,
    sql_stopword_count,
    sql_tokens,
    stopword_count,
    tokens,
)


def quality_ok_col(text: F.Column) -> F.Column:
    """The composite keep/drop quality gate as a standalone boolean
    Column (token floor + stopword + punctuation ratio caps) — reused
    by text_metrics and the curation pipeline."""
    toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    stop_ratio = F.when(
        n_tok > 0, stopword_count(toks).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0, punct_count(text).cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    return (n_tok >= 5) & (stop_ratio <= F.lit(0.5)) & (punct_ratio <= F.lit(0.3))


def sql_quality_ok(text_expr: str = "text") -> str:
    toks = sql_tokens(text_expr)
    n_tok = f"len({toks})"
    n_stop = sql_stopword_count(toks)
    n_punct = sql_punct_count(text_expr)
    stop_ratio = (
        f"CASE WHEN {n_tok} > 0 THEN CAST({n_stop} AS DOUBLE) / {n_tok} ELSE 0.0 END"
    )
    punct_ratio = (
        f"CASE WHEN length({text_expr}) > 0 "
        f"THEN CAST({n_punct} AS DOUBLE) / length({text_expr}) ELSE 0.0 END"
    )
    return f"({n_tok} >= 5 AND {stop_ratio} <= 0.5 AND {punct_ratio} <= 0.3)"


def text_metrics(docs: DataFrame) -> DataFrame:
    """Quality-scoring features: lengths, token stats, punctuation and
    stopword ratios, plus a composite keep/drop quality flag of the kind
    a pretraining filter applies."""
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    n_chars = F.length("text")
    n_stop = stopword_count(toks)
    n_punct = punct_count(F.col("text"))
    avg_tok_len = F.when(
        n_tok > 0,
        (n_chars - (n_tok - 1)).cast("double") / n_tok,  # chars net of single spaces
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0, n_punct.cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    quality_ok = (n_tok >= 5) & (stop_ratio <= F.lit(0.5)) & (punct_ratio <= F.lit(0.3))
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        n_tok.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        n_punct.alias("n_punct"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        quality_ok.cast("int").alias("quality_ok"),
    )


def sql_text_metrics(table: str = "documents") -> str:
    toks = sql_tokens("text")
    n_tok = f"len({toks})"
    n_stop = sql_stopword_count(toks)
    n_punct = sql_punct_count("text")
    stop_ratio = f"CASE WHEN {n_tok} > 0 THEN CAST({n_stop} AS DOUBLE) / {n_tok} ELSE 0.0 END"
    punct_ratio = (
        f"CASE WHEN length(text) > 0 THEN CAST({n_punct} AS DOUBLE) / length(text) ELSE 0.0 END"
    )
    quality = (
        f"CAST(({n_tok} >= 5 AND {stop_ratio} <= 0.5 AND {punct_ratio} <= 0.3) AS INT)"
    )
    return f"""
SELECT doc_id, length(text) AS n_chars_m, {n_tok} AS n_tokens,
       {n_stop} AS n_stopwords, {n_punct} AS n_punct,
       {stop_ratio} AS stopword_ratio, {punct_ratio} AS punct_ratio,
       {quality} AS quality_ok
FROM {table}
"""


def language_id(docs: DataFrame) -> DataFrame:
    """n-gram/marker-word language heuristic + agreement with the
    table's labeled lang.

    Three bound projections (tokens -> per-language scores -> argmax):
    HOF expressions are interpreted, so every re-reference re-executes
    them — the single-expression form re-tokenized each document ~12x
    through the argmax when-chain.  CollapseProject keeps non-cheap
    multiply-referenced aliases bound, so tokenization and each score
    run exactly once per row (~35% faster, and the gap widens with
    marker-list size)."""
    from eventstreamd_spark.functions.text import LANG_MARKERS, _isin_filter

    d1 = docs.select("doc_id", "lang", tokens(F.col("text")).alias("__toks"))
    d2 = d1.select(
        "doc_id",
        "lang",
        *[
            F.size(F.filter(F.col("__toks"), _isin_filter(m))).alias(f"__s_{l}")
            for l, m in LANG_MARKERS.items()
        ],
    )
    best_lang, best_score = F.lit("und"), F.lit(0)
    for l in LANG_MARKERS:
        take = F.col(f"__s_{l}") > best_score
        best_lang = F.when(take, F.lit(l)).otherwise(best_lang)
        best_score = F.when(take, F.col(f"__s_{l}")).otherwise(best_score)
    d3 = d2.select("doc_id", "lang", best_lang.alias("detected_lang"))
    return d3.select(
        "doc_id",
        "lang",
        "detected_lang",
        (F.col("detected_lang") == F.col("lang")).cast("int").alias("agrees"),
    )


def sql_language_id(table: str = "documents") -> str:
    toks = sql_tokens("text")
    detected = sql_lang_id(toks)
    return f"""
SELECT doc_id, lang, {detected} AS detected_lang,
       CAST(({detected} = lang) AS INT) AS agrees
FROM {table}
"""


def fingerprints(docs: DataFrame) -> DataFrame:
    """Whole-document content hash + token count — the exact-dup key
    primitive (near-dup fingerprinting is ``winnowed_fingerprints``)."""
    return docs.select(
        "doc_id",
        poly_hash(F.col("text")).alias("fingerprint"),
        F.size(tokens(F.col("text"))).alias("n_tokens"),
    )


def sql_fingerprints(table: str = "documents") -> str:
    return (
        f"SELECT doc_id, {sql_poly_hash('text')} AS fingerprint, "
        f"len({sql_tokens('text')}) AS n_tokens FROM {table}"
    )


def winnowed_fingerprints(
    docs: DataFrame, k: int = 4, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): rolling k-gram hashes over token
    hashes, then the MINIMUM of every w-consecutive-window pane,
    deduplicated.  Output: one row per (doc_id, selected fingerprint).

    Guarantee: any shared token run of length >= k + w - 1 yields at
    least one shared fingerprint, while only ~2/(w+1) of positions are
    kept — position-robust near-dup keys at a fraction of full shingle
    volume.  All rolling arithmetic runs over PRE-HASHED tokens (one
    md5 each), the pane minima over a bound window-hash column; narrow
    until the final explode.
    """
    from eventstreamd_spark.functions.text import rolling_window_hashes

    th = docs.select(
        "doc_id", F.transform(tokens(F.col("text")), poly_hash).alias("__th")
    )
    g = th.select(
        "doc_id", rolling_window_hashes(F.col("__th"), k).alias("__g")
    )
    m = F.size("__g") - (w - 1)
    panes = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(0), m - 1),
            lambda i: F.array_min(F.slice(F.col("__g"), i + 1, w)),
        ),
    ).otherwise(F.array(F.array_min(F.col("__g"))))
    return g.select(
        "doc_id", F.explode(F.array_distinct(panes)).alias("fingerprint")
    )


def sql_winnowed_fingerprints(
    table: str = "documents", k: int = 4, w: int = 4
) -> str:
    from eventstreamd_spark.functions.text import (
        sql_rolling_window_hashes_body,
    )

    th = f"list_transform({sql_tokens('text')}, t -> {sql_poly_hash('t')})"
    panes = (
        f"CASE WHEN len(__g) - {w - 1} >= 1 THEN "
        f"list_transform(range(0, len(__g) - {w - 1}), "
        f"i -> list_min(list_slice(__g, i + 1, i + {w}))) "
        f"ELSE [list_min(__g)] END"
    )
    return f"""
SELECT doc_id, unnest(list_distinct({panes})) AS fingerprint
FROM (SELECT doc_id, {sql_rolling_window_hashes_body(k)} AS __g
      FROM (SELECT doc_id, {th} AS __th FROM {table}))
"""


# BPE-ish pre-tokenizer: word pieces, digit runs, and single punctuation
# marks — the regex family GPT-2-style byte-pair encoders use as their
# pre-split.  Counting these estimates LLM token cost far better than
# whitespace splitting (which undercounts punctuation-dense text).
# Explicit character classes only, so Java regex and RE2/DuckDB agree.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace vs BPE-ish token counts + the chars-per-token rate
    used for corpus cost estimates.  Narrow projection, fuses into the
    scan; the regex runs once per document JVM-side."""
    ws = F.size(tokens(F.col("text")))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), 0))
    return docs.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        F.when(bpe > 0, F.length("text").cast("double") / bpe)
        .otherwise(F.lit(0.0))
        .alias("chars_per_token"),
    )


def sql_token_counts(table: str = "documents") -> str:
    return (
        "SELECT doc_id, "
        f"len({sql_tokens('text')}) AS n_ws_tokens, "
        f"len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS n_bpe_tokens, "
        f"CASE WHEN len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) > 0 "
        f"THEN CAST(length(text) AS DOUBLE) / len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) "
        f"ELSE 0.0 END AS chars_per_token "
        f"FROM {table}"
    )


# PII redaction patterns: each (label, regex, replacement).  Order
# matters — more specific patterns run first so e.g. an email is masked
# whole before the bare-number pass sees its digits.
REDACT_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
    ("number", r"\d+", "<NUM>"),
)


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrubbing for training-data curation: masks emails, phone
    numbers, and residual digit runs, reporting per-document match
    counts so downstream filters can drop PII-dense documents.

    Pure regexp_replace/regexp_count chains — JVM regex inside codegen,
    no UDFs, so a 100 TB corpus scrub is a single narrow map stage with
    nothing to shuffle.  Counts are taken per pattern BEFORE its
    rewrite, on the text as left by the previous (more specific)
    pattern, so an email's digits are never double-counted as numbers.
    """
    out = docs
    cur = F.col(text_col)
    for label, pat, repl in REDACT_PATTERNS:
        out = out.withColumn(f"n_{label}", F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, repl)
    return out.withColumn("redacted", cur).select(
        id_col, *[f"n_{label}" for label, _, _ in REDACT_PATTERNS], "redacted"
    )


def sql_redact_pii(
    table: str, text_expr: str = "text", id_col: str = "doc_id"
) -> str:
    counts, cur = [], text_expr
    for label, pat, repl in REDACT_PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS INT) AS n_{label}"
        )
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    return (
        f"SELECT {id_col}, " + ", ".join(counts) + f", {cur} AS redacted "
        f"FROM {table}"
    )


def string_function_suite(docs: DataFrame) -> DataFrame:
    """Scalar string-function coverage in one narrow pass: regexp
    extraction, case mapping, substring, reverse, padding, split-count,
    position search.  All JVM-side built-ins — a single codegen'd
    project over the scan, no UDFs, no shuffle; at 100 TB this runs at
    parquet-read speed.

    The reference's entire scalar function surface is JSON access + ISO
    dates (SURVEY.md §2 functions table); this is part of the layer-B
    library a query engine is expected to ship.
    """
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.regexp_extract(t, r"^(\S+)", 1).alias("first_word"),
        F.size(F.split(F.trim(t), r"\s+")).alias("n_words"),
        F.upper(F.col("lang")).alias("lang_uc"),
        F.substring(t, 1, 20).alias("head20"),
        F.reverse(F.substring(t, 1, 10)).alias("rev_head"),
        F.lpad(F.col("source"), 12, "_").alias("padded_source"),
        F.instr(t, "the").alias("pos_the"),
        F.translate(F.col("lang"), "aeiou", "AEIOU").alias("lang_vowels_uc"),
    )


def sql_string_function_suite(table: str = "documents") -> str:
    return (
        "SELECT doc_id, "
        "regexp_extract(text, '^(\\S+)', 1) AS first_word, "
        "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_words, "
        "upper(lang) AS lang_uc, "
        "substring(text, 1, 20) AS head20, "
        "reverse(substring(text, 1, 10)) AS rev_head, "
        "lpad(source, 12, '_') AS padded_source, "
        "CAST(instr(text, 'the') AS INT) AS pos_the, "
        "translate(lang, 'aeiou', 'AEIOU') AS lang_vowels_uc "
        f"FROM {table}"
    )


# ---------------------------------------------------------------------------
# Document chunking — the context-window splitter of a training pipeline
# ---------------------------------------------------------------------------

CHUNK_SIZE = 512
CHUNK_OVERLAP = 64


def chunk_documents(
    docs: DataFrame, size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP
) -> DataFrame:
    """Split each document into fixed-width character chunks with
    overlap (stride = size - overlap), the standard pre-tokenization
    window splitter of a training-data pipeline.

    Declarative row expansion: ``sequence`` builds the chunk-start
    offsets JVM-side, ``posexplode`` turns them into rows, and
    ``substr`` slices — a narrow scan->generate->project plan with NO
    shuffle.  At 100 TB this runs at parquet-scan speed and parallelism
    follows input splits; the ~size/stride row-expansion factor (~1.14
    at 512/64) is absorbed map-side.  The reference has no document
    model at all (SURVEY.md §2 absence list).
    """
    stride = size - overlap
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(stride)
    )
    exploded = docs.select(
        "doc_id", "text", F.posexplode(starts).alias("chunk_id", "chunk_start")
    )
    chunk = F.col("text").substr(F.col("chunk_start"), F.lit(size))
    return exploded.select(
        "doc_id",
        "chunk_id",
        "chunk_start",
        chunk.alias("chunk"),
        F.length(chunk).alias("chunk_len"),
    )


def sql_chunk_documents(
    table: str = "documents", size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP
) -> str:
    stride = size - overlap
    return (
        "WITH offs AS ("
        "  SELECT doc_id, text, "
        f"    unnest(generate_series(1, greatest(length(text), 1), {stride})) AS o"
        f"  FROM {table}) "
        "SELECT doc_id, "
        f"CAST((o - 1) / {stride} AS INT) AS chunk_id, "
        "CAST(o AS INT) AS chunk_start, "
        f"substring(text, CAST(o AS INT), {size}) AS chunk, "
        f"CAST(length(substring(text, CAST(o AS INT), {size})) AS INT) AS chunk_len "
        "FROM offs"
    )


# ---------------------------------------------------------------------------
# Repetition metrics — Gopher-style repetitive-document detection
# ---------------------------------------------------------------------------


def repetition_metrics(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-line
    fraction, duplicate-word fraction, and the frequency share of the
    single most common word, plus the composite ``repetitive`` flag
    (Rae et al. 2021, arXiv:2112.11446 §A1.1 — thresholds adapted).

    Scale shape: the line metric is a narrow array computation fused
    into the scan; the word metrics go explode -> two cascaded
    aggregations BOTH keyed by doc_id (map-side partials collapse the
    per-(doc, word) counts before either shuffle), and no join is
    needed because the narrow metric rides along as a grouping key.
    An O(tokens^2) per-row array variant would avoid the shuffle but
    dies on long documents; this plan is linear in corpus size.
    Documents with zero tokens drop out (no text to judge).
    """
    lines = F.filter(
        F.split(F.col("text"), "\n"), lambda l: F.length(F.trim(l)) > 0
    )
    dup_line_frac = F.when(
        F.size(lines) > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(lines)).cast("double") / F.size(lines),
    ).otherwise(F.lit(0.0))
    # Bind the per-document expressions BEFORE the explode: a non-cheap
    # sibling of a generator is re-evaluated per EXPLODED row (per
    # token, not per doc — measured ~8x on this op; the same trap as
    # inferred-filter inlining, SCALE.md §5).  After binding they are
    # plain attributes the Generate repeats by reference.
    bound = docs.select(
        "doc_id",
        dup_line_frac.alias("dup_line_frac"),
        tokens(F.col("text")).alias("__toks"),
    )
    base = bound.select(
        "doc_id",
        "dup_line_frac",
        F.explode_outer("__toks").alias("w"),
    ).filter(F.col("w").isNotNull())
    wc = base.groupBy("doc_id", "dup_line_frac", "w").agg(
        F.count("*").alias("c")
    )
    stats = wc.groupBy("doc_id", "dup_line_frac").agg(
        F.max("c").alias("max_wc"),
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
    )
    top_word_frac = F.col("max_wc").cast("double") / F.col("n_tokens")
    dup_word_frac = (
        F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_tokens")
    )
    return stats.select(
        "doc_id",
        "dup_line_frac",
        top_word_frac.alias("top_word_frac"),
        dup_word_frac.alias("dup_word_frac"),
        F.col("n_tokens").alias("n_tokens"),
        (
            (top_word_frac > 0.3)
            | (F.col("dup_line_frac") > 0.3)
            | (dup_word_frac > 0.6)
        ).alias("repetitive"),
    )


def sql_repetition_metrics(table: str = "documents") -> str:
    toks = sql_tokens("text")
    return (
        "WITH base AS ("
        "  SELECT doc_id, "
        "    CASE WHEN len(lines) > 0 THEN 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines) ELSE 0.0 END AS dup_line_frac, "
        "    unnest(toks) AS w "
        "  FROM (SELECT doc_id, "
        "          list_filter(string_split(text, chr(10)), l -> length(trim(l)) > 0) AS lines, "
        f"         {toks} AS toks "
        f"        FROM {table})), "
        "wc AS (SELECT doc_id, dup_line_frac, w, count(*) AS c "
        "       FROM base GROUP BY doc_id, dup_line_frac, w), "
        "stats AS (SELECT doc_id, dup_line_frac, max(c) AS max_wc, "
        "            sum(c) AS n_tokens, count(*) AS n_distinct "
        "          FROM wc GROUP BY doc_id, dup_line_frac) "
        "SELECT doc_id, dup_line_frac, "
        "CAST(max_wc AS DOUBLE) / n_tokens AS top_word_frac, "
        "1.0 - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_word_frac, "
        "CAST(n_tokens AS BIGINT) AS n_tokens, "
        "(CAST(max_wc AS DOUBLE) / n_tokens > 0.3 "
        " OR dup_line_frac > 0.3 "
        " OR 1.0 - CAST(n_distinct AS DOUBLE) / n_tokens > 0.6) AS repetitive "
        "FROM stats"
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms — corpus-level term weighting
# ---------------------------------------------------------------------------

TFIDF_TOP_K = 3


def tfidf_top_terms(docs: DataFrame, k: int = TFIDF_TOP_K) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (score = tf * (ln((N+1)/(df+1)) + 1), sklearn's smooth_idf).

    Plan at scale: explode -> (doc_id, term) count [shuffle 1, map-side
    partials], term -> df aggregate [shuffle 2 over the vocabulary,
    tiny], a shuffle join tf⋈df on term (vocabulary follows Heaps' law
    so at 100 TB the df side may still broadcast; Catalyst/AQE decides
    from stats), the corpus size N as a broadcast 1-row cross join, and
    one ranking window per doc_id.  The float score is used ONLY for
    ordering and deliberately not emitted: Java's Math.log and DuckDB's
    libm may differ in the last ulp, and ties among mathematically
    equal scores share (tf, df) so both engines order identically via
    the (score DESC, term ASC) tiebreak.
    """
    from pyspark.sql import Window

    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf")
            * (
                F.log((F.col("n_docs") + 1).cast("double") / (F.col("df") + 1))
                + F.lit(1.0)
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "rank")
    )


def token_freq_quality(docs: DataFrame) -> DataFrame:
    """Corpus-frequency document quality — the perplexity-filter
    stand-in (a real LM scorer drops into the same plan): docs whose
    tokens are rare corpus-wide (low median term frequency, many
    hapaxes) are gibberish/OCR-noise candidates; docs of only
    ultra-common tokens are boilerplate candidates.

    Deliberately integer-exact: instead of sum-of-ln(p) (whose last-ulp
    differs between JVM and libm, breaking the value-hash oracle), the
    score surface is (n_tokens, hapax_tokens, median corpus term
    frequency) — same signal, exact arithmetic (percentile interpolates
    halves of integers, exact in binary).

    Plan at scale: explode -> vocab count [one shuffle over the
    vocabulary, map-side partials], tokens ⋈ vocab on term (Heaps' law
    keeps vocab small relative to the corpus; AQE broadcasts when it
    fits), then one doc_id-keyed aggregation.  Same two-pass shape as a
    real unigram LM scorer: train pass = vocab, score pass = join+agg.
    """
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    vocab = tok.groupBy("term").agg(F.count("*").alias("ctf"))
    return (
        tok.join(vocab, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum((F.col("ctf") == 1).cast("bigint")).alias("hapax_tokens"),
            F.expr("percentile(ctf, 0.5)").alias("median_term_freq"),
        )
    )


def sql_token_freq_quality(table: str = "documents") -> str:
    toks = sql_tokens("text")
    return (
        "WITH tok AS ("
        f"  SELECT doc_id, unnest({toks}) AS term FROM {table}"
        "), vocab AS ("
        "  SELECT term, count(*) AS ctf FROM tok GROUP BY term) "
        "SELECT doc_id, count(*) AS n_tokens, "
        "  CAST(sum(CASE WHEN ctf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_tokens, "
        "  quantile_cont(ctf, 0.5) AS median_term_freq "
        "FROM tok JOIN vocab USING (term) GROUP BY doc_id"
    )


def sql_tfidf_top_terms(table: str = "documents", k: int = TFIDF_TOP_K) -> str:
    toks = sql_tokens("text")
    return (
        "WITH tf AS ("
        f"  SELECT doc_id, unnest({toks}) AS term FROM {table}"
        "), tfc AS ("
        "  SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY doc_id, term"
        "), dfc AS ("
        "  SELECT term, count(*) AS df FROM tfc GROUP BY term"
        "), scored AS ("
        "  SELECT tfc.doc_id, tfc.term, tfc.tf, dfc.df, "
        f"    tfc.tf * (ln(CAST((SELECT count(*) FROM {table}) + 1 AS DOUBLE) / (dfc.df + 1)) + 1.0) AS score "
        "  FROM tfc JOIN dfc USING (term)"
        "), ranked AS ("
        "  SELECT doc_id, term, tf, df, "
        "    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank "
        "  FROM scored) "
        f"SELECT doc_id, term, tf, df, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# Bigram language model — the real-LM upgrade of token_freq_quality
# ---------------------------------------------------------------------------


def doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) — one row per token bigram.

    Declarative construction: the token array is bound to a real column
    first (CollapseProject will not re-inline the tokenization HOF, so
    the split/filter runs once), then a transform over an index
    sequence builds the bigram structs and explode_outer flattens them.
    explode_outer, not explode — an inner explode of a bound alias lets
    InferFiltersFromGenerate push `size(...) > 0` into the parquet scan
    where the whole tokenization re-runs per row (the 12x shingle-tier
    trap, SCALE.md §5).  Documents with fewer than two tokens have no
    bigrams and drop out.
    """
    t = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    bigrams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.struct(
                F.element_at("toks", i).alias("w1"),
                F.element_at("toks", i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (
        t.select("doc_id", F.explode_outer(bigrams).alias("bg"))
        .filter(F.col("bg").isNotNull())
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )


def sql_doc_bigrams(table: str = "documents") -> str:
    """DuckDB twin of doc_bigrams (lateral range over 1-based lists)."""
    toks = sql_tokens("text")
    return (
        f"(SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM "
        f" (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i "
        f"  FROM (SELECT doc_id, {toks} AS toks FROM {table}) t) u)"
    )


def bigram_lm_scores(docs: DataFrame) -> DataFrame:
    """Bigram-LM document scoring — the perplexity filter with a real
    conditional model (CCNet's KenLM gate reduced to exact arithmetic).

    Train pass: corpus bigram counts c(w1,w2) in one (w1,w2)-keyed
    aggregation; context counts c(w1,*) derive from the bigram table
    (vocab^2-sized, tiny next to the corpus) rather than a second
    corpus scan.  Score pass: bigram stream joins the count tables —
    both are Heaps'-law small, so AQE broadcasts them and the score
    pass is a single narrow scan — then one doc_id-keyed aggregation.

    The score surface is deliberately integer-exact (the sum-of-ln(p)
    a float LM emits differs in the last ulp between JVM and libm,
    breaking the value-hash oracle): n_bigrams, hapax_bigrams (count
    of corpus-unique bigrams — the novelty/gibberish signal),
    sum_bigram_freq and sum_ctx_freq (the numerator/denominator mass
    of prod P(w2|w1) before division), and min_bigram_freq (the
    rarest transition).  A float LM score drops into the same plan by
    replacing the final aggregates.
    """
    bg = doc_bigrams(docs)
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("bg_count"))
    c1 = c2.groupBy("w1").agg(F.sum("bg_count").alias("ctx_count"))
    return (
        bg.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum((F.col("bg_count") == 1).cast("bigint")).alias(
                "hapax_bigrams"
            ),
            F.sum("bg_count").alias("sum_bigram_freq"),
            F.sum("ctx_count").alias("sum_ctx_freq"),
            F.min("bg_count").alias("min_bigram_freq"),
        )
    )


def sql_bigram_lm_scores(table: str = "documents") -> str:
    bg = sql_doc_bigrams(table)
    return (
        f"WITH bg AS (SELECT * FROM {bg} b), "
        "c2 AS (SELECT w1, w2, count(*) AS bg_count FROM bg GROUP BY w1, w2), "
        "c1 AS (SELECT w1, sum(bg_count) AS ctx_count FROM c2 GROUP BY w1) "
        "SELECT doc_id, count(*) AS n_bigrams, "
        "  CAST(sum(CASE WHEN bg_count = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_bigrams, "
        "  CAST(sum(bg_count) AS BIGINT) AS sum_bigram_freq, "
        "  CAST(sum(ctx_count) AS BIGINT) AS sum_ctx_freq, "
        "  CAST(min(bg_count) AS BIGINT) AS min_bigram_freq "
        "FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) "
        "GROUP BY doc_id"
    )


CORPUS_NGRAM_TOP_K = 20


def corpus_bigram_topk(docs: DataFrame, k: int = CORPUS_NGRAM_TOP_K) -> DataFrame:
    """Corpus-level top-k bigrams — the corpus-statistics primitive
    behind boilerplate mining and contamination screens.

    One explode + one (w1,w2)-keyed aggregation (map-side partials
    collapse per-partition repeats before the shuffle), then a global
    sort of the vocab^2-sized count table — the sort input is tiny
    relative to the corpus, so the final orderBy is not a scale
    hazard.  Ties break lexicographically so the result is total-order
    deterministic for the value-hash oracle.
    """
    return (
        doc_bigrams(docs)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("bg_count"))
        .orderBy(F.desc("bg_count"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )


def sql_corpus_bigram_topk(
    table: str = "documents", k: int = CORPUS_NGRAM_TOP_K
) -> str:
    bg = sql_doc_bigrams(table)
    return (
        f"SELECT w1, w2, count(*) AS bg_count FROM {bg} b "
        "GROUP BY w1, w2 "
        f"ORDER BY bg_count DESC, w1 ASC, w2 ASC LIMIT {k}"
    )


# ---------------------------------------------------------------------------
# Quality-filter ensemble — the composed keep/drop gate
# ---------------------------------------------------------------------------

ENSEMBLE_HAPAX_MAX = 0.8
ENSEMBLE_MEDIAN_TF_MIN = 2.0


def quality_ensemble(docs: DataFrame) -> DataFrame:
    """The composed document-quality gate a production pipeline runs:
    heuristic quality (token floor, stopword/punctuation ratios),
    Gopher repetition signals, and corpus-frequency statistics, voted
    into one keep verdict with per-rule reason flags (so dropped docs
    are auditable by cause, not just gone).

    Plan: the heuristic gate and the repetition metrics share ONE
    explode — quality_ok rides the doc-keyed aggregations as a grouping
    key (zero extra shuffle, the dup_line_frac trick).  The
    corpus-frequency branch needs its vocabulary join (Heaps-small,
    AQE broadcasts); one final doc_id join assembles the verdict.
    Three reasons, three booleans — the output is narrow and the whole
    ensemble is two corpus scans.
    """
    lines = F.filter(
        F.split(F.col("text"), "\n"), lambda l: F.length(F.trim(l)) > 0
    )
    dup_line_frac = F.when(
        F.size(lines) > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(lines)).cast("double") / F.size(lines),
    ).otherwise(F.lit(0.0))
    # Per-doc expressions bound BEFORE the explode — a non-cheap
    # generator sibling is re-evaluated per exploded row (measured 8x
    # on this op at sf0.1; see repetition_metrics / SCALE.md §5).
    bound = docs.select(
        "doc_id",
        quality_ok_col(F.col("text")).alias("quality_ok"),
        dup_line_frac.alias("dup_line_frac"),
        tokens(F.col("text")).alias("__toks"),
    )
    base = bound.select(
        "doc_id",
        "quality_ok",
        "dup_line_frac",
        F.explode_outer("__toks").alias("w"),
    ).filter(F.col("w").isNotNull())
    wc = base.groupBy("doc_id", "quality_ok", "dup_line_frac", "w").agg(
        F.count("*").alias("c")
    )
    rep = wc.groupBy("doc_id", "quality_ok", "dup_line_frac").agg(
        F.max("c").alias("max_wc"),
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
    )
    top_word_frac = F.col("max_wc").cast("double") / F.col("n_tokens")
    dup_word_frac = (
        F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_tokens")
    )
    repetitive = (
        (top_word_frac > 0.3)
        | (F.col("dup_line_frac") > 0.3)
        | (dup_word_frac > 0.6)
    )
    rep_flags = rep.select(
        "doc_id", "quality_ok", repetitive.alias("repetitive")
    )
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    vocab = tok.groupBy("term").agg(F.count("*").alias("ctf"))
    freq = (
        tok.join(vocab, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum((F.col("ctf") == 1).cast("bigint")).alias("hapax_tokens"),
            F.expr("percentile(ctf, 0.5)").alias("median_term_freq"),
        )
    )
    oov_like = (
        F.col("hapax_tokens").cast("double") / F.col("n_tokens")
        > ENSEMBLE_HAPAX_MAX
    ) | (F.col("median_term_freq") < ENSEMBLE_MEDIAN_TF_MIN)
    return (
        rep_flags.join(freq, "doc_id")
        .select(
            "doc_id",
            "quality_ok",
            "repetitive",
            oov_like.alias("oov_like"),
            (
                F.col("quality_ok")
                & ~F.col("repetitive")
                & ~oov_like
            ).alias("keep"),
        )
    )


def sql_quality_ensemble(table: str = "documents") -> str:
    rep = sql_repetition_metrics(table)
    freq = sql_token_freq_quality(table)
    q_ok = sql_quality_ok("text")
    return f"""
WITH rep AS ({rep}),
freq AS ({freq}),
qual AS (SELECT doc_id, {q_ok} AS quality_ok FROM {table})
SELECT rep.doc_id, qual.quality_ok, rep.repetitive,
       ((CAST(freq.hapax_tokens AS DOUBLE) / freq.n_tokens
           > {ENSEMBLE_HAPAX_MAX})
        OR (freq.median_term_freq < {ENSEMBLE_MEDIAN_TF_MIN})) AS oov_like,
       (qual.quality_ok AND NOT rep.repetitive
        AND NOT ((CAST(freq.hapax_tokens AS DOUBLE) / freq.n_tokens
                    > {ENSEMBLE_HAPAX_MAX})
                 OR (freq.median_term_freq < {ENSEMBLE_MEDIAN_TF_MIN})))
         AS keep
FROM rep JOIN freq ON rep.doc_id = freq.doc_id
JOIN qual ON rep.doc_id = qual.doc_id
"""


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al. 2023, arXiv:2302.03169)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 1024


def dsir_importance(
    docs: DataFrame, target_lang: str = "en", n_buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """Data Selection via Importance Resampling, hashed-feature form:
    score every raw document by how much its (hashed-unigram) feature
    profile looks like a TARGET corpus relative to the raw corpus, and
    keep docs whose target affinity dominates.

    DSIR proper computes log p_target(x) - log p_raw(x) under hashed
    bag-of-ngram models and keeps the best-scoring docs.  Log
    arithmetic is last-ulp engine-dependent, so the score surface here
    is integer-exact: per doc, the smoothed bucket-count affinities
    aff_t = sum(c_t[b]+1) and aff_r = sum(c_r[b]+1), with the keep
    decision self-calibrated against the corpus — keep iff the doc's
    target-affinity share beats the corpus-average share:

        aff_t * TOT_r  >  aff_r * TOT_t      (TOT = corpus sums)

    — one BIGINT cross-multiplication instead of a float log-sum (the
    repo-wide integer-score discipline; see token_freq_quality).  The
    self-calibration matters when target and raw vocabularies overlap
    heavily (an absolute likelihood threshold then keeps nothing or
    everything); relative-to-corpus is also how DSIR is used in
    practice (resample the top of the score distribution, not above an
    absolute likelihood).  The emitted affinities are the exact integer
    sums, so the oracle check is bit-exact.  At extreme scale the
    products approach 2^63; the cross-multiply then moves to
    DECIMAL(38,0) unchanged.

    Plan at 100 TB: the bucket table is n_buckets rows — one explode
    pass builds it (map-side partials), then it BROADCASTS back onto
    the token stream (vs token_freq_quality's vocab join, which can
    only broadcast under Heaps' law: hashing fixes the feature
    cardinality by construction, the reason DSIR hashes at all).  The
    scalar totals ride the same broadcast.  One shuffle total (the
    per-doc aggregation).
    """
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("term")
    ).select(
        "doc_id",
        "lang",
        F.pmod(poly_hash(F.col("term")), n_buckets).alias("bucket"),
    )
    # Pre-aggregate to (doc, lang, bucket, n) FIRST: both downstream
    # consumers (the bucket count model and the per-doc scoring join)
    # derive from this one relation, so the corpus is tokenized and
    # hashed exactly once and the second consumer reads the same
    # exchange (vs. the naive form, which re-ran the explode+md5 pass
    # for each — measured ~2x on this operator at sf0.1).
    base = tok.groupBy("doc_id", "lang", "bucket").agg(
        F.count("*").alias("n")
    )
    bucket_stats = base.groupBy("bucket").agg(
        F.sum(
            F.when(F.col("lang") == target_lang, F.col("n")).otherwise(0)
        ).alias("c_t"),
        F.sum("n").alias("c_r"),
    )
    docaff = (
        base.join(F.broadcast(bucket_stats), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("n") * (F.col("c_t") + 1)).alias("aff_target"),
            F.sum(F.col("n") * (F.col("c_r") + 1)).alias("aff_raw"),
        )
    )
    corpus = docaff.agg(
        F.sum("aff_target").alias("tot_t"), F.sum("aff_raw").alias("tot_r")
    )
    return docaff.crossJoin(F.broadcast(corpus)).select(
        "doc_id",
        "aff_target",
        "aff_raw",
        (F.col("aff_target") * F.col("tot_r")
         > F.col("aff_raw") * F.col("tot_t")).alias("keep"),
    )


def sql_dsir_importance(
    table: str = "documents",
    target_lang: str = "en",
    n_buckets: int = DSIR_BUCKETS,
) -> str:
    """DuckDB twin of dsir_importance (same smoothing, same integer
    cross-multiplication)."""
    h = sql_poly_hash("term")
    return f"""
WITH tok AS (
  SELECT doc_id, lang, ({h}) % {n_buckets} AS bucket
  FROM (SELECT doc_id, lang, unnest({sql_tokens('text')}) AS term FROM {table})
), base AS (
  SELECT doc_id, lang, bucket, count(*) AS n
  FROM tok GROUP BY 1, 2, 3
), bucket_stats AS (
  SELECT bucket,
         CAST(sum(CASE WHEN lang = '{target_lang}' THEN n ELSE 0 END) AS BIGINT) AS c_t,
         CAST(sum(n) AS BIGINT) AS c_r
  FROM base GROUP BY bucket
), docaff AS (
  SELECT doc_id,
         CAST(sum(n * (c_t + 1)) AS BIGINT) AS aff_target,
         CAST(sum(n * (c_r + 1)) AS BIGINT) AS aff_raw
  FROM base JOIN bucket_stats USING (bucket)
  GROUP BY doc_id
), corpus AS (
  SELECT CAST(sum(aff_target) AS BIGINT) AS tot_t,
         CAST(sum(aff_raw) AS BIGINT) AS tot_r
  FROM docaff
)
SELECT doc_id, aff_target, aff_raw,
       aff_target * tot_r > aff_raw * tot_t AS keep
FROM docaff, corpus
"""


def language_confusion(docs: DataFrame) -> DataFrame:
    """Language-ID confusion matrix: labeled lang x detected lang with
    counts — the eval-report twin of ``language_id`` (a curation
    pipeline tracks this per ingest to catch classifier drift).  One
    extra tiny aggregation over the language_id plan."""
    return (
        language_id(docs)
        .groupBy("lang", "detected_lang")
        .agg(F.count("*").alias("n_docs"))
    )


def sql_language_confusion(table: str = "documents") -> str:
    return (
        f"SELECT lang, detected_lang, count(*) AS n_docs "
        f"FROM ({sql_language_id(table)}) GROUP BY lang, detected_lang"
    )


# Hashing-trick embedding constants: per-dimension affine mixes of the
# single per-token hash (the minhash permutation trick) — one md5 per
# token total, not one per (token, dim).
EMB_DIM = 8
EMB_RANGE = 2001  # component values in [-1000, 1000]
_EMB_A = [3 + 8 * j for j in range(EMB_DIM)]
_EMB_B = [7 + 13 * j for j in range(EMB_DIM)]


def hashed_doc_embeddings(docs: DataFrame) -> DataFrame:
    """Hashing-trick document embeddings: dimension j is the sum over
    tokens of a per-dimension integer mix of the token hash — the
    feature-hashing featurizer (Weinberger et al. 2009) that turns text
    into fixed-width vectors without any trained model, feeding the
    same ANN / near-dup / purity operators as learned embeddings.

    All-integer output (exact oracle).  Plan: completely NARROW — the
    per-doc sums fold over the bound token-hash array in one projection,
    no explode, no shuffle; at 100 TB this runs at scan speed and the
    only cost is one md5 per token plus cheap integer mixes.
    """
    from eventstreamd_spark.functions.text import HASH_MOD

    th = fan_out(docs).select(
        "doc_id", F.transform(tokens(F.col("text")), poly_hash).alias("__th")
    )
    half = (EMB_RANGE - 1) // 2

    def dim_fold(j: int):
        # two-arg lambda required: pyspark counts lambda parameters, so
        # j must be captured by closure, not a defaulted third parameter
        a, b = _EMB_A[j], _EMB_B[j]
        return F.aggregate(
            F.col("__th"),
            F.lit(0).cast("bigint"),
            lambda acc, h: acc + ((h * a + b) % HASH_MOD) % EMB_RANGE - half,
        ).alias(f"e{j}")

    dims = [dim_fold(j) for j in range(EMB_DIM)]
    return th.select("doc_id", *dims)


def sql_hashed_doc_embeddings(table: str = "documents") -> str:
    """DuckDB twin (unnest + integer sums; order-free exact)."""
    from eventstreamd_spark.functions.text import HASH_MOD

    h = sql_poly_hash("term")
    half = (EMB_RANGE - 1) // 2
    sums = ",\n       ".join(
        f"CAST(coalesce(sum((({h}) * {_EMB_A[j]} + {_EMB_B[j]}) % {HASH_MOD}"
        f" % {EMB_RANGE} - {half}), 0) AS BIGINT) AS e{j}"
        for j in range(EMB_DIM)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM {table}
)
SELECT d.doc_id, {sums}
FROM {table} d LEFT JOIN tok USING (doc_id)
GROUP BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Frozen linear quality classifier (fastText-style scorer stand-in)
# ---------------------------------------------------------------------------

CLF_W_RANGE = 2001  # weights quantized to [-1000, 1000] / 1000


def classifier_quality_scores(docs: DataFrame) -> DataFrame:
    """Linear text-quality classifier over hashed bigram features —
    the scoring half of a fastText / FineWeb-Edu-style quality filter
    (Joulin et al. 2016 model shape: mean of per-feature weights ->
    linear decision).

    The weight table is a deterministic hash-derived stand-in
    (w(h) = ((h mod 2001) - 1000) / 1000): in production the weights
    come from offline training and reach executors the same way — as a
    pure per-feature function (broadcast array or hash-mix), so the
    plan is identical.  The sigmoid is omitted on purpose: it is
    monotone, so thresholding the mean logit at 0 is the same verdict
    and keeps the operator transcendental-free (bit-exact across
    engines — libm exp() is not).

    Plan: completely NARROW — bigram construction, hashing, and the
    weight fold all run inside one projection over the token array
    (no explode, no shuffle); at 100 TB this scores at scan speed,
    one md5 per bigram.  The bigram bag is ordered and NON-distinct
    (a bag-of-features model counts repeats), unlike word_shingles.
    """
    from eventstreamd_spark.functions.text import HASH_MOD

    toks = tokens(F.col("text"))
    half = (CLF_W_RANGE - 1) // 2
    feats = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bound = fan_out(docs).select("doc_id", feats.alias("__f"))
    raw = F.aggregate(
        F.col("__f"),
        F.lit(0.0),
        lambda acc, s: acc
        + (poly_hash(s) % CLF_W_RANGE - half).cast("double") / 1000.0,
    )
    n_feats = F.size(F.col("__f"))
    logit = F.when(
        n_feats > 0, F.round(raw / n_feats.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    return bound.select(
        "doc_id",
        n_feats.cast("bigint").alias("n_feats"),
        logit.alias("logit"),
        (logit >= 0).alias("keep"),
    )


def sql_classifier_quality_scores(table: str = "documents") -> str:
    """DuckDB twin: identical bigram bag, hash-derived weights, and
    sequential fold order (list_reduce with a prepended 0 accumulator,
    matching F.aggregate's left-to-right association)."""
    half = (CLF_W_RANGE - 1) // 2
    t = sql_tokens("text")
    h = sql_poly_hash("s")
    return f"""
WITH f AS (
  SELECT doc_id,
         CASE WHEN len({t}) >= 2 THEN
           list_transform(range(0, len({t}) - 1),
             i -> array_to_string(list_slice({t}, i + 1, i + 2), ' '))
         ELSE CAST([] AS VARCHAR[]) END AS feats
  FROM {table}
), s AS (
  SELECT doc_id, len(feats) AS n_feats,
         CASE WHEN len(feats) > 0 THEN
           round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(feats,
               s -> CAST(({h}) % {CLF_W_RANGE} - {half} AS DOUBLE) / 1000.0)),
             (acc, x) -> acc + x) / CAST(len(feats) AS DOUBLE), 6)
         ELSE 0.0 END AS logit
  FROM f
)
SELECT doc_id, CAST(n_feats AS BIGINT) AS n_feats, logit,
       logit >= 0 AS keep
FROM s
"""


# ---------------------------------------------------------------------------
# Unicode/whitespace text normalization (pre-hash canonicalization)
# ---------------------------------------------------------------------------

# curly quotes / long dashes -> ASCII; the char-for-char translate map
# is identical in both engines
_XLAT_FROM = "“”‘’–—"
_XLAT_TO = "\"\"''--"


def with_planted_mess(docs: DataFrame) -> DataFrame:
    """Deterministically dirty every 7th document (curly quotes, tabs,
    doubled/leading whitespace) so the normalizer has real work on the
    clean synthetic corpus — the planted-input pattern from
    operators/dedup.py (with_planted_exact_dups)."""
    messy = F.concat(
        F.lit("“  "),
        F.regexp_replace(F.col("text"), " ", "  "),
        F.lit("\t”"),
    )
    return docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0, messy).otherwise(F.col("text")),
    )


def sql_planted_mess(table: str = "documents") -> str:
    return (
        f"(SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN "
        f"chr(8220) || '  ' || replace(text, ' ', '  ') || chr(9) || chr(8221) "
        f"ELSE text END AS text, lang, source, n_chars FROM {table})"
    )


def normalize_text(docs: DataFrame) -> DataFrame:
    """Canonicalize text before any hashing/dedup stage: fold curly
    punctuation to ASCII, strip C0/DEL control characters, collapse
    whitespace runs, trim.  Every dedup tier in this repo keys on
    hashes of the text — without this pass, visually identical
    documents with different quote styles or spacing never collide.

    Plan: completely NARROW (four string functions in one projection,
    no UDF, no shuffle); at 100 TB it runs at scan speed and is the
    cheapest stage in the curation cascade, which is why real
    pipelines (CCNet, Dolma, FineWeb) run it first.
    """
    s = F.translate(F.col("text"), _XLAT_FROM, _XLAT_TO)
    s = F.regexp_replace(s, r"[\x00-\x1F\x7F]", " ")
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return docs.select(
        "doc_id",
        s.alias("text_norm"),
        (~s.eqNullSafe(F.col("text"))).alias("changed"),
        F.length(s).cast("bigint").alias("n_chars_norm"),
    )


def sql_normalize_text(table: str = "documents") -> str:
    """DuckDB twin — same transform order; the 'g' flag mirrors Spark's
    global-by-default regexp_replace."""
    xf = _XLAT_FROM.replace("'", "''")
    xt = _XLAT_TO.replace("'", "''")
    s = f"translate(text, '{xf}', '{xt}')"
    s = f"regexp_replace({s}, '[\\x00-\\x1F\\x7F]', ' ', 'g')"
    s = f"trim(regexp_replace({s}, '\\s+', ' ', 'g'))"
    return f"""
SELECT doc_id, {s} AS text_norm,
       {s} IS DISTINCT FROM text AS changed,
       CAST(length({s}) AS BIGINT) AS n_chars_norm
FROM {table}
"""


# ---------------------------------------------------------------------------
# Quality-ranked token-budget fill (training-set assembly)
# ---------------------------------------------------------------------------

FILL_BUDGET = 1_000  # tokens; deliberately < corpus total at every sf


def _clf_logit_frame(
    docs: DataFrame, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, *extra_cols, n_tokens, logit) in ONE narrow pass — the
    classifier logit (same formula as classifier_quality_scores) plus
    the token weight the budget accounting needs."""
    toks = tokens(F.col("text"))
    half = (CLF_W_RANGE - 1) // 2
    feats = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bound = fan_out(docs).select(
        "doc_id",
        *extra_cols,
        F.size(toks).cast("bigint").alias("n_tokens"),
        feats.alias("__f"),
    )
    raw = F.aggregate(
        F.col("__f"),
        F.lit(0.0),
        lambda acc, s: acc
        + (poly_hash(s) % CLF_W_RANGE - half).cast("double") / 1000.0,
    )
    n_feats = F.size(F.col("__f"))
    logit = F.when(
        n_feats > 0, F.round(raw / n_feats.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    return bound.select(
        "doc_id", *extra_cols, "n_tokens", logit.alias("logit")
    )


def token_budget_fill(
    docs: DataFrame, budget: int = FILL_BUDGET
) -> DataFrame:
    """Assemble a training set: take documents in descending quality
    order until the token budget is filled (the crossing document is
    included — standard take-until semantics).  This is the selection
    step every "best N tokens" curation recipe ends with (FineWeb-Edu
    style: classifier-ranked corpus, fixed token budget).

    The naive statement is a GLOBAL window (sum(n_tokens) OVER (ORDER
    BY logit DESC, doc_id)) — a single-task sort at 100 TB.  The
    scalable form is the same two-phase prefix sum the shard packers
    use, with quality-score BANDS as the outer unit:
    1. band = round(logit * 1e6) (exact for 6-dp logits; band order is
       consistent with logit order — equal logits always share a
       band); per-band token totals; the cumulative/threshold window
       runs over the BAND table (bounded by score resolution, KB);
    2. bands wholly under budget are taken outright; only surviving
       bands' rows are re-read (broadcast band spec), and the in-band
       prefix runs in a window PARTITIONED by band, ordered by
       (logit DESC, doc_id) so the concatenated order equals the
       global order even if floating-point banding ever merges two
       adjacent logits.
    All accounting is BIGINT; the only doubles are the (bit-exact)
    logits being ordered.
    """
    from pyspark.sql import Window as W

    scored = _clf_logit_frame(docs)
    # coalesce makes the band provably non-nullable: the equi-join
    # otherwise infers isnotnull(band) and pushdown inlines the FULL
    # logit fold into the scan filter (the trap audit_plan flags;
    # same fix as simhash_signatures).  The logit when/otherwise never
    # yields NULL, so band 0 for it is sound.
    band = F.coalesce(
        F.round(F.col("logit") * 1_000_000.0).cast("bigint"), F.lit(0)
    )
    # localCheckpoint the slim (doc_id, n_tokens, logit, band)
    # projection: it feeds BOTH the band-totals aggregate and the
    # row-level join leg below, and Catalyst does not share the
    # subtree — without the checkpoint the corpus-wide classifier
    # fold (the expensive hashed-bigram pass) runs twice.  Four
    # scalars per doc, so the materialized block is tiny relative
    # to the text it replaces (same move as dedup.py's edge list).
    banded = scored.withColumn("band", band).localCheckpoint()
    btot = banded.groupBy("band").agg(F.sum("n_tokens").alias("bt"))
    wb = W.orderBy(F.desc("band")).rowsBetween(W.unboundedPreceding, 0)
    bands = (
        btot.withColumn("cum", F.sum("bt").over(wb))
        .withColumn("excl", F.col("cum") - F.col("bt"))
        .filter(F.col("excl") < budget)
        .select("band", "excl")
    )
    win = W.partitionBy("band").orderBy(F.desc("logit"), "doc_id")
    return (
        banded.join(F.broadcast(bands), "band")
        .withColumn("in_cum", F.sum("n_tokens").over(win))
        .withColumn(
            "start_tokens", F.col("excl") + F.col("in_cum") - F.col("n_tokens")
        )
        .filter(F.col("start_tokens") < budget)
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("start_tokens").cast("bigint").alias("start_tokens"),
        )
    )


def sql_token_budget_fill(
    table: str = "documents", budget: int = FILL_BUDGET
) -> str:
    """DuckDB twin — the spec-level global-window statement (the oracle
    may sort globally; the engine may not)."""
    half = (CLF_W_RANGE - 1) // 2
    t = sql_tokens("text")
    h = sql_poly_hash("s")
    return f"""
WITH f AS (
  SELECT doc_id, len({t}) AS n_tokens,
         CASE WHEN len({t}) >= 2 THEN
           list_transform(range(0, len({t}) - 1),
             i -> array_to_string(list_slice({t}, i + 1, i + 2), ' '))
         ELSE CAST([] AS VARCHAR[]) END AS feats
  FROM {table}
), s AS (
  SELECT doc_id, n_tokens,
         CASE WHEN len(feats) > 0 THEN
           round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(feats,
               s -> CAST(({h}) % {CLF_W_RANGE} - {half} AS DOUBLE) / 1000.0)),
             (acc, x) -> acc + x) / CAST(len(feats) AS DOUBLE), 6)
         ELSE 0.0 END AS logit
  FROM f
), c AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY logit DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM s
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_tokens
FROM c WHERE cum - n_tokens < {budget}
"""


def source_quality_report(docs: DataFrame) -> DataFrame:
    """Per-source quality dashboard: document count, exact mean and
    LOWER MEDIAN of the classifier logit — the per-domain report a
    curation run publishes so a bad crawl source is visible before it
    trains.

    Exactness discipline: the mean sums the (bit-exact, 6-dp) logits
    as DECIMAL(18,6) — order-free — and divides once; the median is
    the rank-threshold rule (min logit with 2*rank >= count), never an
    interpolation, so both engines pick the identical stored value.
    One narrow feature pass + one window + one aggregate, all keyed by
    source.
    """
    from pyspark.sql import Window as W

    scored = _clf_logit_frame(docs, extra_cols=("source",))
    win = W.partitionBy("source").orderBy("logit", "doc_id")
    cnt = W.partitionBy("source")
    ranked = scored.withColumn("rn", F.row_number().over(win)).withColumn(
        "nn", F.count("*").over(cnt)
    )
    return ranked.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (
            F.sum(F.col("logit").cast("decimal(18,6)")).cast("double")
            / F.count("*").cast("double")
        ).alias("mean_logit"),
        F.min(
            F.when(2 * F.col("rn") >= F.col("nn"), F.col("logit"))
        ).alias("median_logit"),
    )


def sql_source_quality_report(table: str = "documents") -> str:
    """DuckDB twin — same decimal mean and rank-threshold median."""
    half = (CLF_W_RANGE - 1) // 2
    t = sql_tokens("text")
    h = sql_poly_hash("s")
    return f"""
WITH f AS (
  SELECT doc_id, source,
         CASE WHEN len({t}) >= 2 THEN
           list_transform(range(0, len({t}) - 1),
             i -> array_to_string(list_slice({t}, i + 1, i + 2), ' '))
         ELSE CAST([] AS VARCHAR[]) END AS feats
  FROM {table}
), s AS (
  SELECT doc_id, source,
         CASE WHEN len(feats) > 0 THEN
           round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(feats,
               s -> CAST(({h}) % {CLF_W_RANGE} - {half} AS DOUBLE) / 1000.0)),
             (acc, x) -> acc + x) / CAST(len(feats) AS DOUBLE), 6)
         ELSE 0.0 END AS logit
  FROM f
), r AS (
  SELECT source, logit,
         row_number() OVER (PARTITION BY source ORDER BY logit, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS nn
  FROM s
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(CAST(sum(CAST(logit AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS mean_logit,
       min(CASE WHEN 2 * rn >= nn THEN logit END) AS median_logit
FROM r
GROUP BY source
"""


# ---------------------------------------------------------------------------
# Token co-occurrence / market-basket mining
# ---------------------------------------------------------------------------

COOC_DF_DENOM = 10  # frequent = df >= max(1, n_docs // 10)
COOC_TOP_K = 25


def token_cooccurrence(
    docs: DataFrame,
    df_denom: int = COOC_DF_DENOM,
    k: int = COOC_TOP_K,
) -> DataFrame:
    """Frequent token-PAIR mining (market-basket over documents):
    support (docs containing both terms) and lift
    (support * N / (df_a * df_b)) for the top-k unordered pairs of
    frequent terms — the co-occurrence signal behind topic drift
    checks and template/boilerplate discovery, and the 2-itemset core
    of Apriori (Agrawal & Srikant 1994).

    Scale shape: the frequent-term set (df >= min_df) is Heaps'-law
    bounded and BROADCAST; each doc contributes pairs only over its
    own frequent distinct terms (k_doc^2 with k_doc bounded by the
    broadcast set, never raw doc length); one (a, b)-keyed aggregation
    with map-side partials.  Lift is integer cross-multiplication
    divided once in double — engine-exact.
    """
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("t")
    )
    n_docs = docs.count()  # driver scalar: one tiny action, reused as a literal
    min_df = max(1, n_docs // df_denom)  # scale-invariant frequency gate
    df_counts = toks.groupBy("t").agg(F.count("*").alias("df"))
    frequent = df_counts.filter(F.col("df") >= min_df)
    ft = toks.join(F.broadcast(frequent), "t")
    right = ft.select(
        F.col("doc_id").alias("doc_b"),
        F.col("t").alias("tb"),
        F.col("df").alias("df_b"),
    )
    pairs = (
        ft.select("doc_id", F.col("t").alias("ta"), F.col("df").alias("df_a"))
        .join(
            right,
            (F.col("doc_id") == F.col("doc_b")) & (F.col("ta") < F.col("tb")),
        )
        .groupBy("ta", "tb", "df_a", "df_b")
        .agg(F.count("*").alias("support"))
    )
    lift = (
        F.col("support").cast("double")
        * F.lit(float(n_docs))
        / (F.col("df_a") * F.col("df_b")).cast("double")
    )
    return (
        pairs.select(
            "ta",
            "tb",
            F.col("support").cast("bigint").alias("support"),
            F.col("df_a").cast("bigint").alias("df_a"),
            F.col("df_b").cast("bigint").alias("df_b"),
            lift.alias("lift"),
        )
        .orderBy(F.desc("support"), "ta", "tb")
        .limit(k)
    )


def sql_token_cooccurrence(
    table: str = "documents",
    df_denom: int = COOC_DF_DENOM,
    k: int = COOC_TOP_K,
) -> str:
    """DuckDB twin — same distinct-term baskets, df gate, tie order,
    and lift arithmetic."""
    t = sql_tokens("text")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({t})) AS t FROM {table}
), dfs AS (
  SELECT t, count(*) AS df FROM toks GROUP BY t
), freq AS (SELECT t, df FROM dfs WHERE df >= greatest(1, (SELECT count(*) FROM {table}) // {df_denom})),
ft AS (SELECT toks.doc_id, toks.t, freq.df FROM toks JOIN freq USING (t)),
pairs AS (
  SELECT a.t AS ta, b.t AS tb, a.df AS df_a, b.df AS df_b,
         count(*) AS support
  FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.t < b.t
  GROUP BY 1, 2, 3, 4
)
SELECT ta, tb, CAST(support AS BIGINT) AS support,
       CAST(df_a AS BIGINT) AS df_a, CAST(df_b AS BIGINT) AS df_b,
       CAST(support AS DOUBLE) * (SELECT CAST(count(*) AS DOUBLE) FROM {table})
         / CAST(df_a * df_b AS DOUBLE) AS lift
FROM pairs
ORDER BY support DESC, ta, tb
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Vocabulary growth curve (Heaps-law report)
# ---------------------------------------------------------------------------

VOCAB_BUCKET_DOCS = 50


def vocab_growth_curve(
    docs: DataFrame, bucket_docs: int = VOCAB_BUCKET_DOCS
) -> DataFrame:
    """Heaps-law vocabulary growth: cumulative distinct-term count
    after each ``bucket_docs``-document prefix of the corpus (doc_id
    order) — the curve that predicts vocabulary (and hash-table /
    broadcast) sizes at 100x the corpus, and the empirical basis for
    every "the vocab table broadcasts" claim in this repo.

    Cumulative-distinct is inherently order-dependent, but it
    decomposes exactly: a term enters the vocabulary at its FIRST
    occurrence, so per-term min(doc_id) -> per-bucket new-term counts
    -> a cumulative window over the BUCKET table (corpus/bucket_docs
    rows — the tiny-window exemption again).  The corpus-sized work is
    one explode + one (term)-keyed min aggregation; nothing big ever
    meets the ordered window.
    """
    from pyspark.sql import Window as W

    first_seen = (
        docs.select(
            "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("t")
        )
        .groupBy("t")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    per_bucket = first_seen.groupBy(
        (F.col("first_doc") - F.col("first_doc") % bucket_docs).alias("bucket_start")
    ).agg(F.count("*").alias("new_terms"))
    w = W.orderBy("bucket_start").rowsBetween(W.unboundedPreceding, 0)
    return per_bucket.select(
        F.col("bucket_start").cast("bigint").alias("bucket_start"),
        F.col("new_terms").cast("bigint").alias("new_terms"),
        F.sum("new_terms").over(w).cast("bigint").alias("vocab_size"),
    )


def sql_vocab_growth_curve(
    table: str = "documents", bucket_docs: int = VOCAB_BUCKET_DOCS
) -> str:
    t = sql_tokens("text")
    return f"""
WITH first_seen AS (
  SELECT t, min(doc_id) AS first_doc FROM (
    SELECT doc_id, unnest(list_distinct({t})) AS t FROM {table}
  ) GROUP BY t
), per_bucket AS (
  SELECT first_doc - first_doc % {bucket_docs} AS bucket_start,
         count(*) AS new_terms
  FROM first_seen GROUP BY 1
)
SELECT CAST(bucket_start AS BIGINT) AS bucket_start,
       CAST(new_terms AS BIGINT) AS new_terms,
       CAST(sum(new_terms) OVER (ORDER BY bucket_start
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS vocab_size
FROM per_bucket
"""


# ---------------------------------------------------------------------------
# Inverted-index materialization (search-index build)
# ---------------------------------------------------------------------------


def build_postings(docs: DataFrame) -> DataFrame:
    """Materialize the inverted index the retrieval tier queries:
    per term, document frequency, total term frequency, and the
    postings list (doc:tf pairs in doc order, flattened to a string so
    the driver's oracle compare stays exact — the real table keeps the
    array<struct> column and writes bucketed BY term, making every
    keyword lookup a single-bucket read).

    One explode + one (term, doc) count + one term-keyed aggregation;
    postings order inside each term is made total (doc_id asc), so the
    output is deterministic under any partitioning.
    """
    tf = (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("t")
        )
        .groupBy("t", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    postings = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("doc_id"), F.col("tf")))
        ),
        lambda s: F.concat_ws(":", s["doc_id"], s["tf"]),
    )
    return tf.groupBy("t").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("total_tf"),
        F.concat_ws(",", postings).alias("postings"),
    )


def sql_build_postings(table: str = "documents") -> str:
    """DuckDB twin — same per-term doc order and flattening."""
    t = sql_tokens("text")
    return f"""
WITH tf AS (
  SELECT t, doc_id, count(*) AS tf FROM (
    SELECT doc_id, unnest({t}) AS t FROM {table}
  ) GROUP BY t, doc_id
)
SELECT t, CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS total_tf,
       string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
FROM tf
GROUP BY t
"""


# ---------------------------------------------------------------------------
# Compression-ratio quality signal — the cheap redundancy detector
# ---------------------------------------------------------------------------


def compression_ratio_signal(docs: DataFrame, level: int = 6) -> DataFrame:
    """Per-document zlib compression ratio — the Gopher/RefinedWeb-style
    redundancy signal: highly compressible text is repetitive
    boilerplate; incompressible "text" is often binary junk or
    high-entropy spam.  Both tails get flagged.

    The kernel is an Arrow-batched ``mapInPandas`` (CPython ``zlib`` at
    a fixed level is deterministic across runs and platforms for a
    given input — it ships with pinned tables), touching only
    (doc_id, text); no shuffle at all — a pure narrow pass whose cost
    is the compressor itself.  No SQL twin exists for zlib, so this
    operator is pytest-verified (planted-repetition ordering + bounds)
    rather than oracle-checked, like the training-export writer.
    """
    import pandas as pd

    def kernel(batches):
        import zlib

        for pdf in batches:
            # NULL text must stay NULL (astype(str) would score the
            # literal "None" as a 4-byte doc); empty text has no ratio
            # — nullable pandas dtypes carry the NULLs through Arrow
            valid = pdf["text"].notna()
            raw = pdf["text"][valid].str.encode("utf-8")
            n_raw = raw.str.len().reindex(pdf.index).astype("Int64")
            n_comp = (
                raw.map(lambda b: len(zlib.compress(b, level)))
                .reindex(pdf.index)
                .astype("Int64")
            )
            ratio = (n_comp.astype("Float64") / n_raw.astype("Float64")).where(
                n_raw > 0
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_raw_bytes": n_raw,
                    "n_compressed_bytes": n_comp,
                    "compression_ratio": ratio,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        kernel,
        "doc_id long, n_raw_bytes long, n_compressed_bytes long, "
        "compression_ratio double",
    )


# --- tokenizer fertility / corpus text-economics report ---------------------


def tokenizer_fertility(docs: DataFrame) -> DataFrame:
    """Per (lang, source) tokenizer-economics report: document count,
    token volume, chars-per-token (the "fertility" a tokenizer team
    watches per language — a language whose chars/token drifts high is
    being over-fragmented and eats budget), tokens-per-doc, distinct
    token types, and the type-token ratio (lexical diversity).

    One corpus scan computes the additive sums (docs, tokens, chars)
    narrowly; the distinct-type count is the one genuinely wide piece —
    an explode + per-group distinct whose shuffle keys are (lang,
    source, token), map-side combinable.  Final ratios are exact
    integer divides.  At 100 TB the type count is the only term that
    grows super-linearly in state (Heaps-law vocab) — the documented
    swap is the grouped HLL register (sketches.grouped_hll), with this
    exact tier as the oracle.
    """
    from eventstreamd_spark.functions.text import tokens

    sums = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(tokens(F.col("text"))).cast("bigint"))
        .cast("bigint")
        .alias("n_tokens"),
        F.sum(F.length(F.col("text")).cast("bigint"))
        .cast("bigint")
        .alias("n_chars"),
    )
    types = (
        docs.select(
            "lang", "source", F.explode(tokens(F.col("text"))).alias("tok")
        )
        .groupBy("lang", "source")
        .agg(F.count_distinct(F.col("tok")).cast("bigint").alias("n_types"))
    )
    return (
        sums.join(types, ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            "n_docs",
            "n_tokens",
            F.coalesce(F.col("n_types"), F.lit(0).cast("bigint")).alias(
                "n_types"
            ),
            (
                F.col("n_chars").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("chars_per_token"),
            (
                F.col("n_tokens").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("tokens_per_doc"),
            (
                F.col("n_types").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("type_token_ratio"),
        )
    )


def sql_tokenizer_fertility(table: str = "documents") -> str:
    from eventstreamd_spark.functions.text import sql_tokens

    toks = sql_tokens("text")
    return f"""
WITH sums AS (
  SELECT lang, source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({toks})) AS BIGINT) AS n_tokens,
         CAST(sum(length(text)) AS BIGINT) AS n_chars
  FROM {table} GROUP BY 1, 2
),
types AS (
  SELECT lang, source, CAST(count(DISTINCT tok) AS BIGINT) AS n_types
  FROM (SELECT lang, source, unnest({toks}) AS tok FROM {table})
  GROUP BY 1, 2
)
SELECT s.lang, s.source, s.n_docs, s.n_tokens,
       coalesce(t.n_types, 0) AS n_types,
       CAST(s.n_chars AS DOUBLE) / CAST(s.n_tokens AS DOUBLE)
         AS chars_per_token,
       CAST(s.n_tokens AS DOUBLE) / CAST(s.n_docs AS DOUBLE)
         AS tokens_per_doc,
       CAST(coalesce(t.n_types, 0) AS DOUBLE) / CAST(s.n_tokens AS DOUBLE)
         AS type_token_ratio
FROM sums s LEFT JOIN types t ON s.lang = t.lang AND s.source = t.source
"""


# --- hapax legomena / vocabulary-novelty diagnostic --------------------------


def hapax_report(docs: DataFrame) -> DataFrame:
    """Per-source hapax-legomena report: how much of each source's
    token mass and type inventory is corpus-hapax (tokens occurring
    exactly once anywhere) — the Zipf-tail diagnostic that separates
    genuinely novel vocabulary (healthy long tail) from OCR garbage /
    mojibake sources (pathological hapax shares), and the empirical
    input to Good-Turing unseen-mass estimates.

    Plan: one explode pass feeds BOTH aggregates — corpus-wide token
    counts (shuffle keyed by token, map-side combinable; the Heaps-law
    state that would swap to a CMS "count = 1" filter at 100 TB) and
    per-source totals.  A corpus-hapax occurs exactly once, so joining
    occurrences against the hapax set returns |hapax| rows and each
    hapax attributes to exactly one source.  Ratios are exact integer
    divides.
    """
    from eventstreamd_spark.functions.text import tokens

    # explode_OUTER avoids InferFiltersFromGenerate inlining the token
    # fold into the scan (SCALE.md §5); the post-Generate null filter
    # restores plain-explode semantics (DuckDB's unnest drops empties)
    # and cannot be pushed below the Generate (tok is its output).
    tok = docs.select(
        "source", F.explode_outer(tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok").isNotNull())
    counts = tok.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ")
    )
    hapax = counts.filter(F.col("n_occ") == 1).select("tok")
    per_source = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.count_distinct(F.col("tok")).cast("bigint").alias("n_types"),
    )
    hapax_src = (
        tok.join(hapax, "tok")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hapax"))
    )
    return (
        per_source.join(hapax_src, "source", "left")
        .select(
            "source",
            "n_tokens",
            "n_types",
            F.coalesce(F.col("n_hapax"), F.lit(0).cast("bigint")).alias(
                "n_hapax"
            ),
            (
                F.coalesce(F.col("n_hapax"), F.lit(0)).cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("hapax_token_share"),
            (
                F.coalesce(F.col("n_hapax"), F.lit(0)).cast("double")
                / F.col("n_types").cast("double")
            ).alias("hapax_type_share"),
        )
    )


def sql_hapax_report(table: str = "documents") -> str:
    from eventstreamd_spark.functions.text import sql_tokens

    toks = sql_tokens("text")
    return f"""
WITH tok AS (
  SELECT source, unnest({toks}) AS tok FROM {table}
),
counts AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n_occ FROM tok GROUP BY 1
),
hapax AS (SELECT tok FROM counts WHERE n_occ = 1),
per_source AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT tok) AS BIGINT) AS n_types
  FROM tok GROUP BY 1
),
hapax_src AS (
  SELECT t.source, CAST(count(*) AS BIGINT) AS n_hapax
  FROM tok t JOIN hapax h ON t.tok = h.tok
  GROUP BY 1
)
SELECT p.source, p.n_tokens, p.n_types,
       coalesce(h.n_hapax, 0) AS n_hapax,
       CAST(coalesce(h.n_hapax, 0) AS DOUBLE)
         / CAST(p.n_tokens AS DOUBLE) AS hapax_token_share,
       CAST(coalesce(h.n_hapax, 0) AS DOUBLE)
         / CAST(p.n_types AS DOUBLE) AS hapax_type_share
FROM per_source p LEFT JOIN hapax_src h ON p.source = h.source
"""


# ---------------------------------------------------------------------------
# Inter-rater agreement between the two quality raters (Cohen's kappa)
# ---------------------------------------------------------------------------

_JUNK_TEXT = "!!! ??? #@$ %%% &&&"


def with_planted_junk(docs: DataFrame) -> DataFrame:
    """Deterministically replace every 9th document with punctuation
    junk so BOTH quality raters have real work on the clean synthetic
    corpus (the planted-input pattern of with_planted_mess): without
    it the heuristic gate keeps everything and kappa degenerates to
    exactly 0 (a constant rater carries no chance-corrected signal)."""
    return docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 9 == 0, F.lit(_JUNK_TEXT)).otherwise(
            F.col("text")
        ),
    )


def sql_planted_junk(table: str = "documents") -> str:
    return (
        f"(SELECT doc_id, CASE WHEN doc_id % 9 = 0 THEN '{_JUNK_TEXT}' "
        f"ELSE text END AS text, lang, source, n_chars FROM {table})"
    )


def rater_agreement_kappa(docs: DataFrame) -> DataFrame:
    """Cohen's kappa between the corpus's two independent keep/drop
    raters — the heuristic gate (``quality_ok_col``) and the frozen
    bigram classifier (``classifier_quality_scores``) — the standard
    agreement-beyond-chance diagnostic run before trusting either
    filter as ground truth for the other (Cohen 1960; raw agreement
    overstates consensus when both raters mostly say "keep").

    Exactness: the 2x2 contingency reduces to four integer sums; with
    pe_num = keep1*keep2 + drop1*drop2,
    kappa = (n*agree - pe_num) / (n*n - pe_num).  Numerator and
    denominator accumulate in DECIMAL(38,0) (n*n overflows int64 at
    corpus scale), then ONE IEEE division each for p_observed,
    p_expected, kappa — bit-equal across engines via the d2d idiom.

    Plan: ONE narrow scan computes both raters per row (the token
    array binds once and feeds both the gate ratios and the bigram
    bag — no re-tokenize, no join between two scoring passes), then a
    single global aggregate map-side combines to four integers.
    """
    from eventstreamd_spark.functions.text import HASH_MOD  # noqa: F401

    half = (CLF_W_RANGE - 1) // 2
    b1 = fan_out(docs).select(
        F.length("text").alias("__nc"),
        punct_count(F.col("text")).alias("__np"),
        tokens(F.col("text")).alias("__t"),
    )
    n_tok = F.size("__t")
    stop_ratio = F.when(
        n_tok > 0, stopword_count(F.col("__t")).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        F.col("__nc") > 0,
        F.col("__np").cast("double") / F.col("__nc"),
    ).otherwise(F.lit(0.0))
    gate = (
        (n_tok >= 5)
        & (stop_ratio <= F.lit(0.5))
        & (punct_ratio <= F.lit(0.3))
    )
    feats = F.when(
        n_tok >= 2,
        F.transform(
            F.sequence(F.lit(0), n_tok - 2),
            lambda i: F.concat_ws(" ", F.slice(F.col("__t"), i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    b2 = b1.select(gate.alias("__r1"), feats.alias("__f"))
    raw = F.aggregate(
        F.col("__f"),
        F.lit(0.0),
        lambda acc, s: acc
        + (poly_hash(s) % CLF_W_RANGE - half).cast("double") / 1000.0,
    )
    n_feats = F.size(F.col("__f"))
    logit = F.when(
        n_feats > 0, F.round(raw / n_feats.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    rated = b2.select("__r1", (logit >= 0).alias("__r2"))
    agg = rated.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.col("__r1") == F.col("__r2")).cast("long"))
        .cast("bigint")
        .alias("n_agree"),
        F.sum(F.col("__r1").cast("long")).cast("bigint").alias("n_gate_keep"),
        F.sum(F.col("__r2").cast("long")).cast("bigint").alias("n_clf_keep"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    pe_num = dec("n_gate_keep") * dec("n_clf_keep") + (
        dec("n_docs") - dec("n_gate_keep")
    ) * (dec("n_docs") - dec("n_clf_keep"))
    nn = dec("n_docs") * dec("n_docs")
    return agg.select(
        "n_docs",
        "n_agree",
        "n_gate_keep",
        "n_clf_keep",
        (
            F.col("n_agree").cast("double") / F.col("n_docs").cast("double")
        ).alias("p_observed"),
        (pe_num.cast("double") / nn.cast("double")).alias("p_expected"),
        F.when(
            nn - pe_num != 0,
            (dec("n_docs") * dec("n_agree") - pe_num).cast("double")
            / (nn - pe_num).cast("double"),
        ).alias("kappa"),
    )


def sql_rater_agreement_kappa(table: str = "documents") -> str:
    """DuckDB twin: identical gate, bigram bag, fold order, and HUGEINT
    contingency algebra; decimal->double via the VARCHAR round-trip."""
    half = (CLF_W_RANGE - 1) // 2
    t = sql_tokens("text")
    h = sql_poly_hash("s")
    n_stop = sql_stopword_count("t")
    n_punct = sql_punct_count("text")
    d2d = lambda e: f"CAST(CAST({e} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    return f"""
WITH b1 AS (
  SELECT length(text) AS nc, {n_punct} AS np, {t} AS t, text FROM {table}
),
rated AS (
  SELECT (len(t) >= 5
          AND (CASE WHEN len(t) > 0
               THEN CAST({n_stop} AS DOUBLE) / len(t) ELSE 0.0 END) <= 0.5
          AND (CASE WHEN nc > 0
               THEN CAST(np AS DOUBLE) / nc ELSE 0.0 END) <= 0.3) AS r1,
         (CASE WHEN len(t) >= 2 THEN
            round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(
                list_transform(range(0, len(t) - 1),
                  i -> array_to_string(list_slice(t, i + 1, i + 2), ' ')),
                s -> CAST(({h}) % {CLF_W_RANGE} - {half} AS DOUBLE) / 1000.0)),
              (acc, x) -> acc + x) / CAST(len(t) - 1 AS DOUBLE), 6)
          ELSE 0.0 END) >= 0 AS r2
  FROM b1
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN r1 = r2 THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
         CAST(sum(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS n_gate_keep,
         CAST(sum(CASE WHEN r2 THEN 1 ELSE 0 END) AS BIGINT) AS n_clf_keep
  FROM rated
),
alg AS (
  SELECT *,
         CAST(n_gate_keep AS HUGEINT) * CAST(n_clf_keep AS HUGEINT)
         + (CAST(n_docs AS HUGEINT) - CAST(n_gate_keep AS HUGEINT))
           * (CAST(n_docs AS HUGEINT) - CAST(n_clf_keep AS HUGEINT))
           AS pe_num,
         CAST(n_docs AS HUGEINT) * CAST(n_docs AS HUGEINT) AS nn
  FROM agg
)
SELECT n_docs, n_agree, n_gate_keep, n_clf_keep,
       CAST(n_agree AS DOUBLE) / CAST(n_docs AS DOUBLE) AS p_observed,
       {d2d('pe_num')} / {d2d('nn')} AS p_expected,
       CASE WHEN nn - pe_num != 0 THEN
         {d2d('CAST(n_docs AS HUGEINT) * CAST(n_agree AS HUGEINT) - pe_num')}
         / {d2d('nn - pe_num')}
       END AS kappa
FROM alg
"""
