"""End-to-end training-data curation pipeline over `documents`:
language filter + quality filter + near-dup canonicalization composed
into ONE declarative plan — the shape a 100 TB pre-training corpus
clean actually runs (filters push into the scan; the only shuffles are
the dedup graph's own).

Keep rule: a doc survives iff
  - its heuristic language is 'en' (textstats.lang_id),
  - its composite quality score ≥ min_quality (textstats.quality_score),
  - it is the canonical representative (min doc_id) of its MinHash-LSH
    near-dup component, or has no near-dups (dedup.dedup_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oscar_spark.operators.dedup import dedup_components, dedup_components_sql
from oscar_spark.operators.textstats import (LANG_ID_SQL, QUALITY_SQL,
                                             lang_id, quality_score)


def clean_corpus(spark: SparkSession, sf_dir: str,
                 min_quality: float = 0.55) -> DataFrame:
    """Surviving docs of the curation pipeline → (doc_id, pred_lang,
    quality), ordered by doc_id."""
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    lang = lang_id(spark, sf_dir)
    comps = dedup_components(spark, sf_dir)
    # non-representative members of a near-dup component are dropped;
    # left_anti keeps docs with no near-dups at all
    drop = comps.filter(F.col("comp") != F.col("doc_id")).select("doc_id")
    return (q.join(lang, "doc_id")
            .join(drop, "doc_id", "left_anti")
            .filter((F.col("quality") >= min_quality)
                    & (F.col("pred_lang") == "en"))
            .select("doc_id", "pred_lang", "quality")
            .orderBy("doc_id"))


def clean_corpus_sql(min_quality: float = 0.55) -> str:
    # hoist the component query's CTE chain to the top level and add
    # comps/q/lang as further CTEs of the same (recursive) WITH
    full = dedup_components_sql()
    final = " SELECT doc_id, MIN(lbl) AS comp FROM walk GROUP BY doc_id"
    ctes = full[:full.rindex(final)]
    q = QUALITY_SQL.replace(" ORDER BY doc_id", "")
    lang = LANG_ID_SQL.replace(" ORDER BY doc_id", "")
    return (
        ctes +
        ", comps AS (SELECT doc_id, MIN(lbl) AS comp FROM walk"
        " GROUP BY doc_id), "
        f"q AS (SELECT doc_id, quality FROM ({q}) t), "
        f"lang AS (SELECT doc_id, pred_lang FROM ({lang}) t) "
        "SELECT q.doc_id AS doc_id, pred_lang, quality "
        "FROM q JOIN lang ON lang.doc_id = q.doc_id "
        "WHERE q.doc_id NOT IN "
        "(SELECT doc_id FROM comps WHERE comp != doc_id) "
        f"AND quality >= {min_quality} AND pred_lang = 'en' "
        "ORDER BY doc_id")
