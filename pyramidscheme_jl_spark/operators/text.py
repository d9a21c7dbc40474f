"""Text analysis operators (language ID, quality, tokens, fingerprints).

Everything is built-in ``pyspark.sql.functions`` column expressions — the
whole module stays inside whole-stage codegen, no Python in the hot path,
and every operator has an exact DuckDB SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .parallelism import ensure_min_parallelism as _par


#: tiny deterministic stopword profiles for the n-gram/stopword language
#: heuristic (language-ID at pipeline scale is a lookup-scored UDF-free scan)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "is"],
    "data": ["table", "row", "column", "join", "query"],
    "stream": ["stream", "window", "batch", "event", "watermark"],
}


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting + quality raw features per document:
    token count (whitespace), distinct tokens, char count, max token length,
    and a BPE-ish subword count (4-char chunks of each token, rounded up —
    a deterministic stand-in for byte-pair merges)."""
    toks = F.split(F.col(text_col), " ")
    return _par(df).select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length(text_col).alias("n_chars"),
        F.aggregate(
            toks, F.lit(0), lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("int")
        ).alias("n_subwords"),
        F.aggregate(
            toks, F.lit(0), lambda acc, t: F.greatest(acc, F.length(t))
        ).alias("max_token_len"),
    )


#: BPE-ish piece pattern: letter runs / digit runs / single non-alnum.
#: The three alternatives match DISJOINT first characters, so Java-regex
#: (Spark) and RE2 (DuckDB) tokenize identically — the portability
#: requirement for the exact oracle.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def regex_tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BPE-ish regex token statistics (the second tokenizer the pipeline
    mandate names alongside whitespace counting): lowercase, split into
    letter runs / digit runs / punctuation singletons, count per class.
    All JVM column expressions; the token array materializes ONCE in a
    sub-projection (inlining the regexp_extract_all into each of the six
    output expressions re-runs the extraction per column — measured ~4x
    slower after projection collapse)."""
    base = _par(df).select(
        F.col(id_col).alias("id"),
        F.expr(f"regexp_extract_all(lower({text_col}), '{BPE_PATTERN}', 0)").alias("toks"),
    )
    toks = F.col("toks")
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("^[a-z]")))
    n_num = F.size(F.filter(toks, lambda t: t.rlike("^[0-9]")))
    return base.select(
        "id",
        F.size(toks).cast("long").alias("n_pieces"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_pieces"),
        n_alpha.cast("long").alias("n_alpha"),
        n_num.cast("long").alias("n_num"),
        (F.size(toks) - n_alpha - n_num).cast("long").alias("n_punct"),
        F.coalesce(F.array_max(F.transform(toks, lambda t: F.length(t))), F.lit(0))
        .cast("long")
        .alias("max_piece_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality scoring: integer millis-scaled composite of
    type-token ratio, mean token length band, and length band — monotone
    features a filter stage thresholds on. Integer output keeps the oracle
    hash-exact."""
    s = token_stats(df, text_col, id_col)
    # F.floor (not cast) everywhere: DuckDB's double->bigint cast *rounds*
    # while Spark's truncates — floor is the only portable integerization
    ttr_m = F.floor(F.col("n_distinct") * 1000 / F.col("n_tokens")).cast("long")
    len_ok = F.when((F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 512), 1000).otherwise(0)
    tok_len_m = F.floor(
        F.col("n_chars") * 1000 / F.greatest(F.col("n_tokens"), F.lit(1))
    ).cast("long")
    return s.select(
        "id",
        "n_tokens",
        ttr_m.alias("ttr_milli"),
        tok_len_m.alias("mean_tok_len_milli"),
        F.floor((ttr_m + len_ok) / 2).cast("long").alias("quality_milli"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language/domain ID: score each profile by counting
    profile tokens, predict the argmax (ties -> lexicographically first
    profile, deterministic)."""
    toks = F.split(F.col(text_col), " ")
    scores = {
        name: F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc + F.when(t.isin(words), 1).otherwise(0),
        )
        for name, words in STOPWORDS.items()
    }
    cols = [F.col(id_col).alias("id")] + [s.alias(f"score_{n}") for n, s in scores.items()]
    scored = _par(df).select(*cols)
    names = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{n}") for n in names])
    pred = F.coalesce(
        *[F.when(F.col(f"score_{n}") == best, F.lit(n)) for n in names]
    )
    return scored.select("id", *[f"score_{n}" for n in names], pred.alias("pred_lang"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8) -> DataFrame:
    """Document fingerprinting: 60-bit hash of the first-k-token prefix plus
    a rolling polynomial hash over all tokens — order-sensitive, exact.

    Rolling modulus is 2^31-1 with 28-bit token hashes so every intermediate
    (acc*1000003 + h < 2^52) stays exactly representable in int64 in any
    engine — the portability constraint that makes the DuckDB twin
    bit-identical.
    """
    P = (1 << 31) - 1
    toks = F.split(F.col(text_col), " ")
    prefix = F.concat_ws(" ", F.slice(toks, 1, k))
    prefix_fp = F.conv(F.substring(F.md5(prefix), 1, 15), 16, 10).cast("long")
    rolling = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * 1000003 + F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("long")
        ) % P,
    )
    return _par(df).select(
        F.col(id_col).alias("id"),
        prefix_fp.alias("prefix_fp"),
        rolling.alias("rolling_fp"),
    )


def repetition_stats(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
):
    """Within-document repetition metrics — the Gopher-rule family the
    quality scorer doesn't cover (machine-generated and boilerplate text
    repeats itself long before it fails length/punctuation filters):
    per document, the occurrence share of its MOST FREQUENT word n-gram
    (``top_ppm``) and the share of n-gram occurrences that are repeats
    of an earlier one (``dup_ppm``), both as integer parts-per-million
    (engine-portable, no float division), plus the occurrence count.

    One scan -> JVM n-gram explode KEEPING duplicates (unlike
    ``token_sets``) -> one (id, gram) hash aggregate -> one per-id
    aggregate; map-side partials, no joins. Documents shorter than
    ``n`` tokens emit no row (nothing to repeat).

    r9 plan shape, measured 17 -> 3.6 s at sf1.0 with identical rows:

    - the token array materializes ONCE in its own projection — inlining
      ``split(text)`` into the gram lambda re-split the document PER GRAM
      (the lambda body is evaluated per element with no subexpression
      reuse), which alone was ~3x;
    - grams aggregate by ``xxhash64`` of the n token columns instead of
      by the concatenated gram string: no per-gram string allocation, and
      the (id, gram) hash aggregate keys on two longs. Counts change only
      if two DIFFERENT grams of the SAME document collide in 64 bits
      (probability ~k^2/2^65 per document, k = grams per doc — below
      1e-11 for million-gram documents).
    """
    from pyspark.sql import functions as F

    base = _par(df).select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("toks")
    )
    gram_hashes = F.expr(
        f"CASE WHEN size(toks) < {n} THEN CAST(array() AS array<bigint>) "
        f"ELSE transform(sequence(1, size(toks) - {n - 1}),"
        f" i -> xxhash64({', '.join(f'element_at(toks, i + {j})' for j in range(n))})) END"
    )
    occ = (
        base.select("id", F.explode(gram_hashes).alias("gram"))
        .groupBy("id", "gram")
        .agg(F.count("*").alias("c"))
    )
    return (
        occ.groupBy("id")
        .agg(
            F.sum("c").alias("cnt"),
            F.max("c").alias("top"),
            F.count("*").alias("distinct_grams"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("cnt").cast("long").alias("n_grams"),
            F.expr("CAST(top AS BIGINT) * 1000000 div cnt").alias("top_ppm"),
            F.expr(
                "CAST(cnt - distinct_grams AS BIGINT) * 1000000 div cnt"
            ).alias("dup_ppm"),
        )
    )
