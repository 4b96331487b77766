"""Text-analysis operators for training-data pipelines over `documents`:
language-ID (stopword-hit heuristic), quality scoring, token counting,
document fingerprinting.  All pure built-ins with exact DuckDB oracles.

The facet-count style of lang_distribution/source_topk mirrors oscar's
kvstats top-k facets (reference/oscar-cmd/Workfunctions.cpp:134-168).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

def load_documents(spark, sf_dir):
    # textstats are per-row projections (no explode, no heavy agg): a
    # scan.parallelize round-robin Exchange costs more than the
    # single-task scan saves at the count/collect boundary, so these
    # read the table directly (deliberate r06 non-change; the fts/dedup
    # operators DO parallelize — their pre-shuffle compute dominates).
    return spark.read.parquet(f"{sf_dir}/documents.parquet")

# pinned per-language stopword lists (fixture-agnostic, tiny)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "est"],
}


def _hit_count(lang: str):
    """# tokens of the doc that are in lang's stopword list (Spark col)."""
    words = LANG_STOPWORDS[lang]
    arr = F.split(F.lower(F.col("text")), "[^a-z0-9]+")
    return F.size(F.filter(arr, lambda t: t.isin(words)))


def _hit_count_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return ("length(list_filter(regexp_split_to_array(lower(text), "
            f"'[^a-z0-9]+'), t -> t IN ({words})))")


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicted language = argmax stopword hits (ties: en > de > fr;
    no hits → 'und').  Deterministic n-gram-heuristic stand-in."""
    docs = load_documents(spark, sf_dir)
    en, de, fr = (_hit_count(lang) for lang in ("en", "de", "fr"))
    pred = (F.when((en >= de) & (en >= fr) & (en > 0), "en")
            .when((de >= fr) & (de > 0), "de")
            .when(fr > 0, "fr")
            .otherwise("und"))
    return (docs.select("doc_id", pred.alias("pred_lang"))
            .orderBy("doc_id"))


LANG_ID_SQL = (
    "SELECT doc_id, CASE "
    f"WHEN {_hit_count_sql('en')} >= {_hit_count_sql('de')} "
    f" AND {_hit_count_sql('en')} >= {_hit_count_sql('fr')} "
    f" AND {_hit_count_sql('en')} > 0 THEN 'en' "
    f"WHEN {_hit_count_sql('de')} >= {_hit_count_sql('fr')} "
    f" AND {_hit_count_sql('de')} > 0 THEN 'de' "
    f"WHEN {_hit_count_sql('fr')} > 0 THEN 'fr' "
    "ELSE 'und' END AS pred_lang FROM documents ORDER BY doc_id")


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned quality heuristic: token count, mean word length, stopword
    ratio, alpha ratio → composite score (round 6)."""
    docs = load_documents(spark, sf_dir)
    arr = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                   lambda t: F.length(t) >= 1)
    n_tok = F.size(arr)
    mean_len = F.when(n_tok > 0,
                      F.aggregate(arr, F.lit(0.0),
                                  lambda a, t: a + F.length(t)) / n_tok
                      ).otherwise(F.lit(0.0))
    sw = F.size(F.filter(arr, lambda t: t.isin(LANG_STOPWORDS["en"])))
    sw_ratio = F.when(n_tok > 0, sw / n_tok).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        F.length("text") > 0,
        F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""))
        / F.length("text")).otherwise(F.lit(0.0))
    score = F.round(
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(mean_len / F.lit(8.0), F.lit(1.0)) * 0.2
        + (F.lit(1.0) - sw_ratio) * 0.2 + alpha_ratio * 0.2, 6)
    return (docs.select(
        "doc_id", n_tok.cast("long").alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        score.alias("quality")).orderBy("doc_id"))


QUALITY_SQL = (
    "WITH f AS (SELECT doc_id, text, "
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
    "t -> length(t) >= 1) AS arr FROM documents), "
    "m AS (SELECT doc_id, text, CAST(length(arr) AS BIGINT) AS n_tokens, "
    "CASE WHEN length(arr) > 0 THEN "
    "CAST(list_sum(list_transform(arr, t -> length(t))) AS DOUBLE)"
    " / length(arr) ELSE 0.0 END AS mean_len, "
    "CASE WHEN length(arr) > 0 THEN CAST(length(list_filter(arr, "
    "t -> t IN ('the', 'and', 'of', 'to', 'in', 'is'))) AS DOUBLE)"
    " / length(arr) ELSE 0.0 END AS sw_ratio, "
    "CASE WHEN length(text) > 0 THEN CAST(length("
    "regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)"
    " / length(text) ELSE 0.0 END AS alpha_ratio FROM f) "
    "SELECT doc_id, n_tokens, ROUND(mean_len, 6) AS mean_word_len, "
    "ROUND(sw_ratio, 6) AS stopword_ratio, "
    "ROUND(alpha_ratio, 6) AS alpha_ratio, "
    "ROUND(LEAST(n_tokens / 100.0, 1.0) * 0.4 "
    "+ LEAST(mean_len / 8.0, 1.0) * 0.2 "
    "+ (1.0 - sw_ratio) * 0.2 + alpha_ratio * 0.2, 6) AS quality "
    "FROM m ORDER BY doc_id")


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens vs BPE-ish subword-regex token counts per doc."""
    docs = load_documents(spark, sf_dir)
    ws = F.size(F.filter(F.split(F.col("text"), "\\s+"),
                         lambda t: F.length(t) > 0))
    # BPE-ish: word pieces of ≤4 chars — ceil(len/4) summed over words
    bpe = F.aggregate(
        F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                 lambda t: F.length(t) > 0),
        F.lit(0).cast("long"),
        lambda a, t: a + F.ceil(F.length(t) / F.lit(4.0)).cast("long"))
    return (docs.select("doc_id", ws.cast("long").alias("ws_tokens"),
                        bpe.alias("bpe_tokens")).orderBy("doc_id"))


TOKEN_COUNTS_SQL = (
    "SELECT doc_id, CAST(length(list_filter(regexp_split_to_array(text, "
    "'\\s+'), t -> length(t) > 0)) AS BIGINT) AS ws_tokens, "
    "CAST(coalesce(list_sum(list_transform(list_filter("
    "regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
    "t -> length(t) > 0), t -> CAST(ceil(length(t) / 4.0) AS BIGINT))), 0)"
    " AS BIGINT) AS bpe_tokens FROM documents ORDER BY doc_id")


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic doc fingerprint: md5 of whitespace-normalized text."""
    docs = load_documents(spark, sf_dir)
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "\\s+", " "))
    return (docs.select("doc_id", F.md5(norm).alias("fingerprint"))
            .orderBy("doc_id"))


FINGERPRINTS_SQL = (
    "SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
    " AS fingerprint FROM documents ORDER BY doc_id")


def lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facet counts per lang (kvstats analog, A4)."""
    return (load_documents(spark, sf_dir)
            .groupBy("lang").agg(F.count("*").alias("n"),
                                 F.sum("n_chars").alias("chars"))
            .orderBy("lang"))


# CAST: DuckDB SUM(BIGINT) yields HUGEINT → float64 in pandas, which
# hash-mismatches Spark's int64 even when values are equal (round-1 red)
LANG_DIST_SQL = ("SELECT lang, COUNT(*) AS n, "
                 "CAST(SUM(n_chars) AS BIGINT) AS chars "
                 "FROM documents GROUP BY lang ORDER BY lang")


def source_topk(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Top-k sources per lang by doc count (kvstats topk, window O4)."""
    d = (load_documents(spark, sf_dir)
         .groupBy("lang", "source").agg(F.count("*").alias("n")))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("source"))
    return (d.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("lang", "source", "n", F.col("rk").cast("long").alias("rk"))
            .orderBy("lang", "rk"))


def source_topk_sql(k: int = 5) -> str:
    return (
        "WITH c AS (SELECT lang, source, COUNT(*) AS n FROM documents "
        "GROUP BY lang, source), r AS (SELECT lang, source, n, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, source ASC)"
        " AS BIGINT) AS rk FROM c) "
        f"SELECT lang, source, n, rk FROM r WHERE rk <= {k} "
        "ORDER BY lang, rk")
