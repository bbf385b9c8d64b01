"""Text analysis for training-data pipelines — pure Spark column
expressions (JVM-side, whole-stage codegen; no UDFs), each designed so an
ANSI-SQL oracle (DuckDB) can reproduce it bit-for-bit:

  * tokenization: regex split on whitespace;
  * token / char counting;
  * quality scoring: stopword ratio, mean token length, alpha ratio —
    integer counts and ratios of exact integers only (cross-engine exact);
  * language ID: stopword-hit scoring over fixed per-language lists,
    argmax with deterministic tie-break (lexicographic language code);
  * fingerprinting: md5 content hash (exact dedup key) — identical in
    Spark and DuckDB; a rolling/winnowing fingerprint lives in dedup.py
    (numpy UDF, non-SQL-gated).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens_col", "token_count_col", "bpe_token_count_col", "quality_cols",
    "langid_col", "pii_cols", "bm25_scores", "tfidf_topk", "token_drift",
    "repetition_stats", "gopher_filter",
    "STOPWORDS",
    "BPE_SPLIT_RE",
    "PII_EMAIL_RE", "PII_PHONE_RE", "PII_IP_RE",
]

# tiny fixed stoplists — heuristic language ID, not a model
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "a", "of", "and", "is", "to", "in", "that"],
    "es": ["el", "la", "de", "que", "y", "los", "es", "una"],
    "fr": ["le", "la", "les", "de", "et", "est", "une", "dans"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不"],
}


def tokens_col(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count_col(text: str | Column) -> Column:
    return F.size(tokens_col(text))


# BPE-ish pre-tokenizer: words / numbers / single punctuation marks — the
# standard pre-merge segmentation BPE vocabularies are trained over. Counts
# (not ids) are what a pipeline needs for length filtering / cost estimates.
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count_col(text: str | Column) -> Column:
    """Count of BPE-style pre-tokens; pure JVM regexp, DuckDB-reproducible
    (regexp_extract_all with the same pattern)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_RE), F.lit(0)))


def _stop_hits(tokens: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def quality_cols(text: str | Column) -> dict[str, Column]:
    """Integer-exact quality metrics (cross-engine reproducible)."""
    toks = tokens_col(text)
    c = F.col(text) if isinstance(text, str) else text
    n_tok = F.size(toks)
    n_char = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, "[^a-z]", ""))
    n_stop = _stop_hits(toks, STOPWORDS["en"])
    return {
        "n_tokens": n_tok,
        "n_chars": n_char,
        "n_alpha": n_alpha,
        "n_stopwords": n_stop,
        # avg token length scaled to an exact integer (x1000, floor)
        "avg_token_len_x1000": F.floor(
            (n_char - (n_tok - F.lit(1))) * F.lit(1000) / n_tok
        ).cast("long"),
    }


def langid_col(text: str | Column) -> Column:
    """Predicted language = code with the most stopword hits; ties break
    lexicographically (deterministic)."""
    toks = tokens_col(text)
    scores = [(code, _stop_hits(toks, ws)) for code, ws in sorted(STOPWORDS.items())]
    # fold: keep (best_code, best_score); strict > so earlier (lexicographic
    # smaller) code wins ties
    best_code, best_score = F.lit(scores[0][0]), scores[0][1]
    for code, sc in scores[1:]:
        is_better = sc > best_score
        best_code = F.when(is_better, F.lit(code)).otherwise(best_code)
        best_score = F.when(is_better, sc).otherwise(best_score)
    return F.when(best_score > 0, best_code).otherwise(F.lit("und"))


# PII patterns — deliberately in the common regex subset Java's engine and
# RE2 (DuckDB) interpret identically: character classes, bounded repeats,
# no backrefs/lookarounds.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_IP_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def pii_cols(text: str | Column) -> list[Column]:
    """Training-data PII scrub (the filter/redact stage every LLM corpus
    pipeline runs): per-document counts of email / phone / IPv4-shaped
    matches plus the fully redacted text — pure JVM regexp (whole-stage
    codegen), DuckDB-reproducible with the identical patterns.

    Returns [n_emails, n_phones, n_ips, redacted] (unaliased). Redaction
    is a cascade (emails → phones → ips) and each count is taken on the
    text the corresponding pass actually sees — so every count equals the
    number of its placeholder occurrences in the redacted output (an IP
    or phone swallowed by an earlier email match is neither counted nor
    separately redacted). Placeholders are inert tokens the patterns
    cannot re-match."""
    c = F.col(text) if isinstance(text, str) else text
    after_email = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    after_phone = F.regexp_replace(after_email, PII_PHONE_RE, "<PHONE>")
    n_email = F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), F.lit(0)))
    n_phone = F.size(
        F.regexp_extract_all(after_email, F.lit(PII_PHONE_RE), F.lit(0))
    )
    n_ip = F.size(F.regexp_extract_all(after_phone, F.lit(PII_IP_RE), F.lit(0)))
    red = F.regexp_replace(after_phone, PII_IP_RE, "<IP>")
    return [n_email, n_phone, n_ip, red]


def tfidf_topk(
    docs: "DataFrame",
    k: int = 5,
    doc_id: str = "doc_id",
    text: str = "text",
    quantize_scale: int = 1_000_000,
) -> "DataFrame":
    """Per-document top-k TF-IDF terms — the document-vector extraction a
    corpus pipeline runs for keyword tagging / topic triage (the
    document-side complement of bm25_scores' query-side ranking).

        idf(t)   = ln((N + 1) / (df + 1)) + 1      (sklearn smoothing)
        score    = floor(tf * idf * quantize_scale)  (fixed point)

    Ranked per doc by (score desc, term asc) — the tie-break makes the
    k-boundary engine-independent, so the result hash-gates exactly.

    Plan: tokens explode once; tf = groupBy(doc, term); df = one more
    groupBy over distinct (doc, term) — both partial-aggregated; tf JOINS
    df on the term key (sort-merge at vocabulary scale — df is NOT
    broadcast here, unlike bm25's ≤|Q|-row table); one window per doc for
    the top-k. N is one scalar count (same driver-side scalar contract as
    bm25's avgdl)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    toks = docs.select(
        F.col(doc_id).alias("_d"), F.explode(tokens_col(text)).alias("_t")
    )
    tf = toks.groupBy("_d", "_t").agg(F.count(F.lit(1)).alias("_tf"))
    df_t = tf.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    n_docs = int(docs.count())
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("_df") + F.lit(1.0))) + F.lit(1.0)
    score = F.floor(F.col("_tf") * idf * F.lit(int(quantize_scale))).cast("long")
    return (
        tf.join(df_t, on="_t")
        .select(
            F.col("_d").alias(doc_id), F.col("_t").alias("term"),
            F.col("_tf").cast("long").alias("tf"),
            F.col("_df").cast("long").alias("df"),
            score.alias("score_q"),
        )
        .withColumn("rank", F.row_number().over(
            Window.partitionBy(doc_id).orderBy(
                F.col("score_q").desc(), F.col("term").asc())))
        .where(F.col("rank") <= k)
        .select(doc_id, "term", "tf", "df", "score_q",
                F.col("rank").cast("int").alias("rank"))
    )


def token_drift(
    docs: "DataFrame",
    label: str | Column,
    k: int = 100,
    text: str = "text",
    quantize_scale: int = 10**12,
) -> "DataFrame":
    """Corpus-drift detection: per-token KL-divergence contributions
    between slice A (``label`` true) and slice B (false) of a corpus —
    the "what changed in my data mix" primitive run before/after a crawl
    refresh or between train/val splits. Add-one smoothing over the
    joint vocabulary V:

        p_t = (cnt_A(t)+1) / (n_A+V)     q_t = (cnt_B(t)+1) / (n_B+V)
        c_t = p_t · ln(p_t / q_t)        (Σ c_t = KL(P ‖ Q))

    Top-k tokens by |c_t| (both enrichment and depletion drive drift),
    tie-broken by token — engine-independent, so the selection
    hash-gates. Scores quantized floor(c_t·1e12); ln/division are the
    same correctly-rounded IEEE ops in Spark and DuckDB (the tfidf/bm25
    precedent).

    Plan: tokens explode once into ONE map-side-combined groupBy(token)
    with conditional slice sums (no join between slices); the three
    totals are one scalar aggregate (the tfidf/bm25 driver-side scalar
    contract — keeps the returned plan at a single exchange); the global
    top-k is a distributed TakeOrdered, never a full sort.
    → (token, cnt_a, cnt_b, kl_q)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    lab = F.col(label) if isinstance(label, str) else label
    toks = docs.select(
        lab.alias("_a"), F.explode(tokens_col(text)).alias("token")
    )
    counts = toks.groupBy("token").agg(
        F.sum(F.when(F.col("_a"), 1).otherwise(0)).alias("_ca"),
        F.sum(F.when(F.col("_a"), 0).otherwise(1)).alias("_cb"),
    )
    # three scalar totals, collected once (the tfidf n_docs / bm25 avgdl
    # driver-side scalar contract) — keeps the RETURNED plan at exactly
    # one exchange instead of re-deriving the token groupBy for a
    # single-row aggregate. Partial-aggregated two-level countDistinct.
    na, nb, v = toks.agg(
        F.sum(F.when(F.col("_a"), 1).otherwise(0)),
        F.sum(F.when(F.col("_a"), 0).otherwise(1)),
        F.countDistinct("token"),
    ).collect()[0]
    # mirrored VERBATIM by the SQL oracle (same IEEE double op order)
    p = (F.col("_ca").cast("double") + F.lit(1.0)) / (
        F.lit(float(na)) + F.lit(float(v)))
    q = (F.col("_cb").cast("double") + F.lit(1.0)) / (
        F.lit(float(nb)) + F.lit(float(v)))
    kl_q = F.floor(p * F.log(p / q) * F.lit(float(quantize_scale)))
    return (
        counts
        .select(
            "token",
            F.col("_ca").cast("long").alias("cnt_a"),
            F.col("_cb").cast("long").alias("cnt_b"),
            kl_q.cast("long").alias("kl_q"),
        )
        .orderBy(F.abs(F.col("kl_q")).desc(), F.col("token").asc())
        .limit(k)
    )


def bm25_scores(
    docs: "DataFrame",
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    doc_id: str = "doc_id",
    text: str = "text",
) -> "DataFrame":
    """BM25 relevance ranking (Robertson/Sparck-Jones, the standard
    retrieval scorer a data pipeline runs for corpus search / dedup
    triage): score every document against a fixed bag of query terms.

        idf(t)    = ln((N - df + 0.5) / (df + 0.5) + 1)
        w(t, d)   = tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
        score(d)  = Σ_t floor(idf * w * 1e6)     (1e-6 fixed point)

    Cross-engine exactness: tf/df/dl/N are exact integers; avgdl is ONE
    double division (sum_dl / N); every remaining float op is the same
    literal IEEE sequence in Spark and DuckDB, and per-term contributions
    quantize to long BEFORE the sum so aggregation order cannot perturb
    the score (the same fixed-point discipline as the spatial operators).

    Plan: one explode+filter pass over tokens (only query terms survive —
    the token stream shrinks to |Q| terms per doc before any shuffle),
    tf via groupBy(doc, term), df broadcast-joined (≤ |Q| rows), dl from
    a size() column, N/sum_dl one scalar aggregate. Output (doc_id,
    n_hits, score_q) for documents containing ≥ 1 query term."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = F.array(*[F.lit(t) for t in query_terms])
    toks = docs.select(
        F.col(doc_id).alias("_d"), tokens_col(text).alias("_toks")
    ).select(
        "_d", F.size("_toks").alias("_dl"),
        F.explode(F.filter("_toks", lambda t: F.array_contains(terms, t)))
        .alias("_t"),
    )
    tf = toks.groupBy("_d", "_dl", "_t").agg(F.count(F.lit(1)).alias("_tf"))
    df_t = toks.select("_d", "_t").distinct().groupBy("_t").agg(
        F.count(F.lit(1)).alias("_df")
    )
    row = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(tokens_col(text))).alias("sdl"),
    ).collect()[0]
    n_docs, avgdl = int(row["n"]), float(int(row["sdl"]) / int(row["n"]))
    idf = F.log(
        (F.lit(n_docs) - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
        + F.lit(1.0)
    )
    w = (F.col("_tf") * F.lit(k1 + 1.0)) / (
        F.col("_tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("_dl") / F.lit(avgdl)))
    )
    contrib = F.floor((idf * w) * F.lit(1e6)).cast("long")
    return (
        tf.join(F.broadcast(df_t), on="_t")
        .select(F.col("_d").alias(doc_id), contrib.alias("_cq"))
        .groupBy(doc_id)
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.sum("_cq").alias("score_q"),
        )
    )


def repetition_stats(
    docs_df,
    doc_id: str = "doc_id",
    text_col: str = "text",
):
    """Gopher-rule repetition statistics (Rae et al. 2021 Table A1 —
    the "remove docs dominated by repeated n-grams" quality filters),
    as exact integer NUMERATORS so every downstream fraction threshold
    (top2 / n_2grams, etc.) is a cross-multiplied integer comparison
    and the whole table hash-gates:

      * n_words      — whitespace token count;
      * top_word     — occurrences of the most frequent token;
      * n_2grams     — sliding word-2-gram count (n_words - 1, 0 floor);
      * top2         — occurrences of the most frequent 2-gram;
      * n_3grams / top3 — same at 3.

    Docs too short for an n-gram get 0 / 0 (kept — shortness is its own
    filter, quality_cols).

    Scale shape: gram construction is JVM higher-order functions
    (split + transform/slice, no Python); each of the three levels is
    explode → ONE (doc, term) groupBy → ONE doc groupBy (both
    map-side combinable), then two broadcast-sized joins back on
    doc_id... in fact the joins are doc-keyed equi-joins that AQE
    co-partitions; nothing is collected.

    → (doc_id, n_words, top_word, n_2grams, top2, n_3grams, top3)."""
    base = docs_df.select(
        F.col(doc_id).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_ts"),
    )

    def level(n: int, total_name: str, top_name: str):
        if n == 1:
            grams = F.col("_ts")
        else:
            grams = F.when(
                F.size("_ts") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size("_ts") - n),
                    lambda i: F.array_join(F.slice(F.col("_ts"), i + 1, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        per_term = (
            base.select("doc_id", F.explode(grams).alias("_g"))
            .groupBy("doc_id", "_g").agg(F.count(F.lit(1)).alias("_c"))
        )
        return per_term.groupBy("doc_id").agg(
            F.sum("_c").cast("long").alias(total_name),
            F.max("_c").cast("long").alias(top_name),
        )

    w = level(1, "n_words", "top_word")
    g2 = level(2, "n_2grams", "top2")
    g3 = level(3, "n_3grams", "top3")
    z = F.lit(0).cast("long")
    return (
        w.join(g2, on="doc_id", how="left")
        .join(g3, on="doc_id", how="left")
        .select(
            "doc_id", "n_words", "top_word",
            F.coalesce("n_2grams", z).alias("n_2grams"),
            F.coalesce("top2", z).alias("top2"),
            F.coalesce("n_3grams", z).alias("n_3grams"),
            F.coalesce("top3", z).alias("top3"),
        )
    )


def gopher_filter(
    docs_df,
    doc_id: str = "doc_id",
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 100000,
    top_word_frac=(1, 10),
    top2_frac=(1, 20),
    top3_frac=(3, 50),
):
    """Gopher-style document quality VERDICTS (Rae et al. 2021 rule
    family, count-fraction variant) on top of repetition_stats: a doc is
    flagged when

      * flag_len      — n_words outside [min_words, max_words];
      * flag_word_rep — top_word / n_words  > top_word_frac;
      * flag_2gram    — top2 / n_2grams     > top2_frac;
      * flag_3gram    — top3 / n_3grams     > top3_frac;

    and kept iff no flag fires. Every fraction threshold is a
    CROSS-MULTIPLIED integer comparison (top * den > total * num) — no
    float division anywhere, so the verdict table hash-gates bit-for-bit
    against an ANSI-SQL twin. Docs with zero n-grams never fire the
    n-gram flags (a one-word doc is flag_len's business, not
    flag_2gram's).

    Scale shape: repetition_stats' (explode + two map-combinable
    groupBys per level); the verdicts are pure column arithmetic on its
    output. → (doc_id, n_words, flag_len, flag_word_rep, flag_2gram,
    flag_3gram, keep) with int 0/1 flags."""
    from pyspark.sql import functions as _F

    stats = repetition_stats(docs_df, doc_id=doc_id, text_col=text_col)

    def frac_flag(top, total, frac):
        num, den = int(frac[0]), int(frac[1])
        return (
            (_F.col(total) > 0)
            & (_F.col(top) * _F.lit(den) > _F.col(total) * _F.lit(num))
        ).cast("int")

    flag_len = (
        (_F.col("n_words") < int(min_words))
        | (_F.col("n_words") > int(max_words))
    ).cast("int")
    out = stats.select(
        "doc_id", "n_words",
        flag_len.alias("flag_len"),
        frac_flag("top_word", "n_words", top_word_frac).alias("flag_word_rep"),
        frac_flag("top2", "n_2grams", top2_frac).alias("flag_2gram"),
        frac_flag("top3", "n_3grams", top3_frac).alias("flag_3gram"),
    )
    keep = (
        (F.col("flag_len") + F.col("flag_word_rep")
         + F.col("flag_2gram") + F.col("flag_3gram")) == 0
    ).cast("int")
    return out.select("*", keep.alias("keep"))
