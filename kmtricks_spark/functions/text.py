"""Text-analysis functions for training-data pipelines.

All pure Column expressions (JVM-side, codegen-friendly): token counting,
quality scoring, language-ID heuristic, document fingerprinting. These are
the web-text operators a 100 TB curation pipeline runs over every document
— they must never leave whole-stage codegen.
"""

from __future__ import annotations

import string as _string

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-ratio language
# heuristic. Deterministic, self-contained (no external models).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
    "es": ["el", "la", "de", "y", "que", "un", "una", "es", "en", "por"],
}


def tokens_col(text: Column | str) -> Column:
    """Whitespace tokenization; empty strings removed."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda t: t != "")


# BPE-ish pre-tokenization pattern (GPT-2 style, portable subset):
# runs of letters, runs of digits, or a single non-space symbol.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_chars, n_tokens, n_distinct_tokens, avg_token_len,
    n_subtokens). n_subtokens = BPE-ish pre-token count (regex runs),
    the cheap proxy for LLM token cost."""
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.round(
            F.length(F.replace(F.col(text_col), F.lit(" "), F.lit("")))
            / F.greatest(n_tokens, F.lit(1)),
            6,
        ).alias("avg_token_len"),
        # regexp_count == size(regexp_extract_all(.., 0)) without
        # materializing the match array
        F.regexp_count(F.col(text_col), F.lit(BPE_PATTERN))
        .cast("long")
        .alias("n_subtokens"),
    )


def quality_col(text_col: str = "text") -> Column:
    """The quality score as a single Column expression (rounded exactly
    like quality_score's output) — the fusable form curate() evaluates
    alongside the other scalar gates in ONE corpus scan."""
    toks = tokens_col(text_col)
    n_tokens = F.size(toks).cast("double")
    ttr = F.size(F.array_distinct(toks)) / F.greatest(n_tokens, F.lit(1.0))
    nolen = F.length(F.replace(F.col(text_col), F.lit(" "), F.lit("")))
    awl = nolen / F.greatest(n_tokens, F.lit(1.0))
    len_ok = (F.length(text_col) >= 20) & (F.length(text_col) <= 100000)
    awl_ok = (awl >= 2.0) & (awl <= 12.0)
    score = (
        F.when(len_ok, 0.4).otherwise(0.0)
        + F.when(awl_ok, 0.3).otherwise(0.0)
        + F.least(ttr, F.lit(1.0)) * 0.3
    )
    return F.round(score, 6)


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality heuristics: length band, type-token ratio,
    mean word length band. Score in [0,1], rounded for stability."""
    toks = tokens_col(text_col)
    n_tokens = F.size(toks).cast("double")
    ttr = F.size(F.array_distinct(toks)) / F.greatest(n_tokens, F.lit(1.0))
    nolen = F.length(F.replace(F.col(text_col), F.lit(" "), F.lit("")))
    awl = nolen / F.greatest(n_tokens, F.lit(1.0))
    return df.select(
        F.col(id_col),
        quality_col(text_col).alias("quality"),
        F.round(ttr, 6).alias("ttr"),
        F.round(awl, 6).alias("avg_word_len"),
    )


def lang_guess_col(text_col: str = "text") -> Column:
    """The language guess as a single Column expression (same argmax +
    tie-break as lang_guess) — the fusable form for curate()'s one-scan
    scalar-gate pass."""
    toks = F.array_distinct(tokens_col(text_col))
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws])))
        for lang, ws in sorted(STOPWORDS.items())
    }
    best = F.greatest(*hits.values())
    guess = F.when(best <= 0, F.lit("und"))
    for lang in sorted(STOPWORDS):
        guess = guess.when(hits[lang] == best, F.lit(lang))
    return guess


def lang_guess(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language heuristic: argmax over per-language hit counts,
    'und' (undetermined) when all zero. Ties broken by language code order."""
    toks = F.array_distinct(tokens_col(text_col))
    hits = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))).alias(lang)
        for lang, ws in sorted(STOPWORDS.items())
    ]
    scored = df.select(F.col(id_col), *hits)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(l) for l in langs])
    guess = F.when(best <= 0, F.lit("und"))
    for l in langs:
        guess = guess.when(F.col(l) == best, F.lit(l))
    return scored.select(id_col, guess.alias("lang_guess"), best.alias("stopword_hits"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-dup fingerprint: md5 hex of the text bytes (portable to any
    SQL oracle), plus xxhash64 for cheap 64-bit joins."""
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("fingerprint"),
        F.xxhash64(F.col(text_col)).alias("fp64"),
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 8,
    window: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxh64",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., MOSS):
    rolling k-gram hashes, keep the minimum of each sliding window of
    `window` consecutive hashes -> (id, fp) rows, distinct per doc.

    Two documents sharing enough selected fingerprints share content; the
    fp column joins like an inverted index (same shape as the LSH band
    join). Pure Column expressions: transform + slice + array_min.

    hash_fn='xxh64' (default): 64-bit int fps, the cheap production path.
    hash_fn='md5': lowercase-hex string fps ordered lexicographically —
    same selection algorithm, but computable verbatim in any SQL engine
    with md5(), which makes the whole winnowing pipeline (not just row
    counts) oracle-checkable against DuckDB.
    """
    from pyspark.sql import Window

    if hash_fn not in ("xxh64", "md5"):
        raise ValueError(f"hash_fn must be xxh64|md5, got {hash_fn!r}")
    c = F.col(text_col)
    n_kgrams = F.length(c) - (k - 1)
    gram_hash = (lambda g: F.xxhash64(g)) if hash_fn == "xxh64" else (lambda g: F.md5(g))
    # one row per k-gram hash (hash evaluated exactly once — an inline
    # transform+slice formulation duplicates the hash array into every
    # window lambda, an O(n*window) expression blowup; measured 20x slower).
    # Both hash functions consume the UTF-8 bytes identically for string
    # and binary inputs, so ASCII docs hash an O(1) byte slice of the
    # pre-cast binary instead of the O(pos) char-seek substring (the
    # shingling trap — functions/shingles.py); non-ASCII docs keep the
    # exact char-substring path.
    hcol = F.when(
        F.col("__ascii"), gram_hash(F.col("__tb").substr(F.col("i"), F.lit(k)))
    ).otherwise(gram_hash(F.substring(c, F.col("i"), F.lit(k))))
    sh = (
        df.where(n_kgrams >= 1)
        .select(
            F.col(id_col),
            n_kgrams.alias("_n"),
            c,
            c.cast("binary").alias("__tb"),
            (F.length(c) == F.octet_length(c)).alias("__ascii"),
            F.posexplode(F.sequence(F.lit(1), n_kgrams)).alias("pos", "i"),
        )
        .select(F.col(id_col), "_n", "pos", hcol.alias("h"))
    )
    w = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    mins = sh.select(
        F.col(id_col),
        F.col("pos"),
        F.col("_n"),
        F.min("h").over(w).alias("fp"),
    ).where(F.col("pos") <= F.greatest(F.col("_n") - window, F.lit(0)))  # pos is 0-based
    return mins.select(id_col, "fp").distinct()


def gopher_filters(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style document-quality rules (Rae et al. 2021, §A1.1 —
    public heuristics), each a pure Column expression:

    * word count in [50, 100000]
    * mean word length in [3, 10]
    * fraction of words containing an alphabetic char >= 0.80
    * symbol-to-word ratio (non-alphanumeric, non-space chars / words)
      <= 0.10
    * >= 2 distinct English stopword hits

    Returns one row per doc with each flag plus the conjunction. Flags are
    ints (0/1) so the oracle comparison is dtype-stable.
    """
    flags = _gopher_flags(text_col)
    cols = [F.when(c, 1).otherwise(0).cast("int").alias(n) for n, c in flags.items()]
    out = df.select(F.col(id_col), *cols)
    keep = None
    for n in flags:
        keep = F.col(n) if keep is None else (keep * F.col(n))
    return out.withColumn("keep", keep.cast("int"))


def _gopher_flags(text_col: str) -> dict[str, Column]:
    """The five Gopher rules as boolean Column conditions, shared by
    gopher_filters (per-flag report) and gopher_keep_col (fused gate)."""
    toks = tokens_col(text_col)
    n_words = F.size(toks)
    nw_d = F.greatest(n_words, F.lit(1)).cast("double")
    mean_wl = F.length(F.replace(F.col(text_col), F.lit(" "), F.lit(""))) / nw_d
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    # translate (char-table lookup) deletes exactly the class
    # [A-Za-z0-9 ] like the old regexp_replace but without the regex
    # engine — identical counts, measured ~1.3x faster on the corpus scan
    _keep = _string.ascii_letters + _string.digits + " "
    symbols = F.length(F.translate(F.col(text_col), _keep, ""))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(w) for w in STOPWORDS["en"]])
        )
    )
    return {
        "ok_word_count": (n_words >= 50) & (n_words <= 100000),
        "ok_mean_word_len": (mean_wl >= 3.0) & (mean_wl <= 10.0),
        "ok_alpha_ratio": (alpha_words / nw_d) >= 0.80,
        "ok_symbol_ratio": (symbols / nw_d) <= 0.10,
        "ok_stopwords": stop_hits >= 2,
    }


def gopher_keep_col(text_col: str = "text") -> Column:
    """The conjunction of all Gopher rules as one boolean Column —
    equivalent to gopher_filters(...).keep == 1, fusable into a single
    corpus scan by curate()."""
    keep = None
    for c in _gopher_flags(text_col).values():
        keep = c if keep is None else (keep & c)
    return keep


def tfidf_top_terms(
    df: DataFrame, top: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top `top` terms per document by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1), deterministic ties by term asc.

    Relational plan, not a UDF: explode -> per-(doc, term) counts -> join
    the document-frequency table on term (same shuffle key) -> row_number
    window per doc. At corpus scale the df table is the only global
    state and it shuffles once on term. Scores rounded to 6dp so the
    double ln() agrees across engines.
    """
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("term"))
    # N stays lazy (broadcast single-row cross join) — an eager df.count()
    # here would launch a full extra scan at plan-construction time
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = tf.join(dfreq, "term").crossJoin(F.broadcast(n_docs)).select(
        id_col, "term", F.round(F.col("tf") * idf, 6).alias("tfidf")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top)
        .select(id_col, "term", "tfidf", F.col("rank").cast("int").alias("rank"))
    )


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher repetition rules (Rae et al. 2021 §A1.1): fraction of all
    2-gram occurrences taken by the single most frequent 2-gram, and
    fraction of 3-gram occurrences whose gram appears more than once.
    High values mark boilerplate/spam.

    Relational shape (explode -> per-(doc, gram) counts -> per-doc
    rollup): the per-gram grouping keys on (doc_id, gram), so repetition
    of one doc never concentrates on one reducer at corpus scale. Docs
    too short for a gram get fraction 0.0 (left join + coalesce).
    """
    toks = tokens_col(text_col)

    def gram_rows(n: int):
        arr = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return df.select(F.col(id_col), F.explode(arr).alias("gram"))

    c2 = gram_rows(2).groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    top2 = c2.groupBy(id_col).agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top2gram_frac")
    )
    c3 = gram_rows(3).groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    dup3 = c3.groupBy(id_col).agg(
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)) / F.sum("c"), 6
        ).alias("dup3gram_frac")
    )
    base = df.select(F.col(id_col))
    return (
        base.join(top2, id_col, "left")
        .join(dup3, id_col, "left")
        .select(
            id_col,
            F.coalesce("top2gram_frac", F.lit(0.0)).alias("top2gram_frac"),
            F.coalesce("dup3gram_frac", F.lit(0.0)).alias("dup3gram_frac"),
        )
    )


# applied in order: emails first (their local parts contain digits a
# later pass might nibble), then dotted IPs, then phone numbers
# (the phone class has no '.', so it can never eat an IP fragment).
# The phone pattern requires STRUCTURE, not just length: either a
# leading '+' (international free-form run) or NANP-style separator
# groups ending in a 4-digit block. Adjacent years ('1998 2001') and
# space-grouped thousands ('100 000 000' — trailing groups of exactly
# 3) match neither alternative, so clean numeric prose survives.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d -]{7,}\d|\b\d{3}[- ]\d{3,4}[- ]\d{4}\b", "<PHONE>"),
)


def pii_redact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    out_col: str = "redacted",
) -> DataFrame:
    """Mask emails / IPv4s / phone numbers with placeholder tokens —
    the standard pre-training privacy scrub, as pure chained
    regexp_replace Column expressions (JVM codegen, zero shuffles, zero
    Python). Returns (id, text, redacted). The phone pattern demands
    digit-GROUP structure ('+' international runs, or 3-[3,4]-4
    separator groups), so years, adjacent years, and space-grouped
    thousands in clean text survive unredacted.

    Cheap necessary-condition guards skip the regex engine for documents
    that cannot match (r6): the email pattern requires an '@', the IP
    and phone patterns require a digit — regexp_replace is the identity
    when nothing matches, so the guarded form is byte-identical while
    clean prose skips all three regex passes (a translate/contains
    check instead of three full regex scans per doc)."""
    c = F.col(text_col)
    has_at = F.col(text_col).contains("@")
    # digit presence via translate (char-table): cheaper than a regex test
    has_digit = F.length(F.translate(F.col(text_col), "0123456789", "")) < F.length(
        F.col(text_col)
    )
    guards = {"email": has_at, "ip": has_digit, "phone": has_digit}
    for name, pat, repl in PII_PATTERNS:
        c = F.when(guards[name], F.regexp_replace(c, pat, repl)).otherwise(c)
    return df.select(F.col(id_col), F.col(text_col), c.alias(out_col))


def chunk_documents(
    df: DataFrame,
    chunk: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping fixed-window character chunking — the embedding/RAG
    prep step (split long documents into model-window-sized pieces with
    `overlap` chars of context carry-over). Returns (doc_id, chunk_id,
    start, chunk_len, chunk_text): starts at 1, 1+step, ... with
    step = chunk - overlap; trailing chunks may be shorter; empty docs
    emit nothing; chunk_id = (start-1)/step (deterministic, no window
    function needed).

    Pure explode(sequence) + substring Column expressions — stays in
    whole-stage codegen, no shuffle, no Python; the fan-out per doc is
    ceil(len/step) rows. SQL-expressible, so the whole chunk table is
    oracle-checkable.
    """
    if chunk < 1 or overlap < 0 or overlap >= chunk:
        raise ValueError(f"need chunk >= 1 and 0 <= overlap < chunk, got {chunk}/{overlap}")
    step = chunk - overlap
    c = F.col(text_col)
    # chunk_len is pure arithmetic (min(chunk, len - start + 1) for any
    # start in [1, len]) instead of length(substring(...)) — the old
    # form evaluated the substring twice per row; and the chunk text
    # slices bytes on ASCII docs (char == byte ⟺ length == octet_length,
    # same O(start) char-seek trap as shingling — functions/shingles.py)
    chunk_len = F.least(F.lit(chunk), F.col("__len") - F.col("start") + 1)
    piece = F.when(
        F.col("__ascii"),
        F.decode(F.col("__tb").substr(F.col("start"), F.lit(chunk)), "UTF-8"),
    ).otherwise(F.substring(F.col("__t"), F.col("start"), chunk))
    return (
        df.where(F.length(c) >= 1)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), F.length(c), F.lit(step))).alias("start"),
            c.alias("__t"),
            c.cast("binary").alias("__tb"),
            F.length(c).alias("__len"),
            (F.length(c) == F.octet_length(c)).alias("__ascii"),
        )
        .select(
            id_col,
            (((F.col("start") - 1) / step).cast("int")).alias("chunk_id"),
            F.col("start").cast("int").alias("start"),
            chunk_len.cast("int").alias("chunk_len"),
            piece.alias("chunk_text"),
        )
    )
