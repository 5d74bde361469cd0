"""Text-analysis operators for the training-data pipeline (driver `documents`
table): language-ID heuristic, quality scoring, token counting, document
fingerprinting. All JVM-side expressions (no Python in the hot path); each has
an exactly-matching DuckDB oracle built from the same primitive emitters.

Cross-engine 60-bit hash: int(md5(x)[:15], 16) — Spark via conv(), DuckDB via
a digit-fold (oracle.hash60_sql). Identical by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
}
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def hash60_col(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast("bigint")


def words_col(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda w: F.length(w) > 0)


# Broadcast-vocab greedy longest-match wordpiece (round-4 verdict item 6):
# a REAL-tokenizer-shaped token counter in pure JVM expressions, so
# pack_documents budgets can follow subword counts instead of the regex
# proxy. The vocab is a compile-time literal (a production run would load
# the model's vocab file the same way — a few 10^4 strings is a trivially
# broadcast literal/lookup); greedy longest-match-first is WordPiece's
# matching rule. Characters matching no piece count one token each
# (byte-fallback analog), so every step consumes >= 1 char and
# WORDPIECE_MAX_STEPS bounds the per-word fold; chars beyond the step
# budget add ceil(rest/4) tokens (the ~4-chars-per-token heuristic).
WORDPIECE_VOCAB: tuple[str, ...] = (
    "the", "tion", "ing", "ent", "ation", "ter", "and", "ous", "ish",
    "ness", "ment", "able", "er", "ed", "ly", "es", "re", "an", "on",
    "at", "en", "or", "in", "is", "it", "al", "ar", "st", "le", "de",
    "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
    "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y", "z",
    "0", "1", "2", "3", "4", "5", "6", "7", "8", "9",
)
WORDPIECE_MAX_STEPS = 16
_WP_SHIFT = 1 << 20  # fold state = consumed_chars * 2^20 + token_count


def wordpiece_count_col(word: Column) -> Column:
    """Greedy longest-match wordpiece token count of one word, as a pure
    JVM expression fold: state = pos*2^20 + n; each of the MAX_STEPS
    iterations matches the longest vocab piece at pos (array filter + max
    over the literal vocab) or consumes one unknown char for one token.
    Bit-equal DuckDB twin: oracle_training.wordpiece_sql."""
    vocab = F.array(*[F.lit(p) for p in WORDPIECE_VOCAB])
    ln = F.length(word)

    def step(s, _):
        pos = F.shiftright(s, 20)
        best = F.array_max(
            F.transform(
                F.filter(
                    vocab,
                    lambda p: word.substr(
                        (pos + 1).cast("int"), F.length(p)
                    ) == p,
                ),
                F.length,
            )
        )
        adv = F.coalesce(best, F.lit(1)).cast("bigint")
        return F.when(pos >= ln, s).otherwise(
            s + adv * F.lit(_WP_SHIFT) + 1
        )

    folded = F.aggregate(
        F.sequence(F.lit(1), F.lit(WORDPIECE_MAX_STEPS)),
        F.lit(0).cast("bigint"),
        step,
    )
    consumed = F.shiftright(folded, 20)
    n = folded - consumed * F.lit(_WP_SHIFT)
    rest = F.greatest(ln.cast("bigint") - consumed, F.lit(0).cast("bigint"))
    return n + F.floor((rest + 3) / 4).cast("bigint")


def wordpiece_token_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """docs + wp_tokens: per-document greedy-wordpiece token count (sum of
    wordpiece_count_col over the whitespace words)."""
    total = F.aggregate(
        words_col(F.col(text_col)),
        F.lit(0).cast("bigint"),
        lambda acc, w: acc + wordpiece_count_col(w),
    )
    return docs.withColumn("wp_tokens", total)


def lang_id(docs: DataFrame) -> DataFrame:
    """N-gram/stopword heuristic language ID: per language, the fraction of
    words that are stopwords; argmax with 'und' (unknown) when all zero.
    Deterministic tie-break: language name ascending."""
    w = words_col(F.col("text"))
    out = docs.select("doc_id", w.alias("_w"))
    for L, sw in STOPWORDS.items():
        hits = F.size(F.filter(F.col("_w"), lambda x: x.isin(sw)))
        out = out.withColumn(f"_hits_{L}", hits)
    n = F.greatest(F.size("_w"), F.lit(1))
    langs = sorted(STOPWORDS)
    best = F.lit("und")
    best_score = F.lit(0)
    # pick max hits; ties -> first language in sorted order wins
    for L in reversed(langs):
        cond = F.col(f"_hits_{L}") >= best_score
        best = F.when((F.col(f"_hits_{L}") > 0) & cond, F.lit(L)).otherwise(best)
        best_score = F.when(cond, F.col(f"_hits_{L}")).otherwise(best_score)
    return out.select(
        "doc_id",
        best.alias("lang_guess"),
        *[
            F.floor(F.col(f"_hits_{L}") * 1000000.0 / n + 0.5).cast("bigint").alias(f"ratio_{L}_e6")
            for L in langs
        ],
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Quality heuristics: word count, mean word length, stopword ratio,
    alpha ratio -> composite score (README-style filters for training data)."""
    w = words_col(F.col("text"))
    d = docs.select("doc_id", F.col("text"), w.alias("_w"))
    n_words = F.size("_w").cast("bigint")
    n_chars = F.length("text").cast("bigint")
    sw = STOPWORDS["en"]
    sw_hits = F.size(F.filter(F.col("_w"), lambda x: x.isin(sw))).cast("bigint")
    alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast("bigint")
    d = d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_chars.alias("n_chars"),
        sw_hits.alias("stopword_hits"),
        alpha.alias("alpha_chars"),
    )
    nz = F.greatest(F.col("n_words"), F.lit(1))
    mean_wl = (F.col("n_chars") - (F.col("n_words") - 1)) / nz
    score = (
        F.least(F.col("n_words") / 100.0, F.lit(1.0)) * 0.4
        + (F.col("stopword_hits") / nz) * 0.3
        + (F.col("alpha_chars") / F.greatest(F.col("n_chars"), F.lit(1))) * 0.3
    )
    return d.select(
        "doc_id",
        "n_words",
        "stopword_hits",
        F.floor(mean_wl * 1000000.0 + 0.5).cast("bigint").alias("mean_word_len_e6"),
        F.floor(score * 1000000.0 + 0.5).cast("bigint").alias("quality_e6"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens + distinct words."""
    w = words_col(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(w).cast("bigint").alias("n_ws_tokens"),
        F.regexp_count("text", F.lit(TOKEN_RE)).cast("bigint").alias("n_re_tokens"),
        F.size(F.array_distinct(w)).cast("bigint").alias("n_distinct_words"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Deterministic 60-bit content fingerprint of normalized text."""
    norm = F.lower(F.regexp_replace("text", "[^A-Za-z0-9 ]", " "))
    return docs.select(
        "doc_id",
        hash60_col(norm).alias("fingerprint60"),
        F.md5(F.col("text").cast("binary")).alias("content_md5"),
    )


# Declared-schema semi-structured extraction: the events table carries a JSON
# string column (props). Like every other reader in this engine the schema is
# DECLARED, never inferred (SURVEY §1.1) — from_json with a DDL schema keeps
# the parse inside whole-stage codegen (Jackson on the JVM, no Python), and a
# malformed document yields NULL fields, mirroring PERMISSIVE CSV.
PROPS_SCHEMA = "k INT"


def parse_props(events: DataFrame) -> DataFrame:
    """events + parsed props fields (props_k) via from_json(PROPS_SCHEMA)."""
    return events.withColumn(
        "props_k", F.from_json(F.col("props"), PROPS_SCHEMA)["k"]
    )


def props_stats(events: DataFrame) -> DataFrame:
    """Per-event-type aggregate over the JSON-extracted field."""
    return (
        parse_props(events)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("props_k").cast("bigint").alias("k_sum"),
            F.countDistinct("props_k").alias("k_distinct"),
        )
    )
