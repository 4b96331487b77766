"""Similarity search over the `embeddings` table (vec_id, embedding, label).

- Brute-force cosine top-k: exact baseline, pure built-ins
  (F.zip_with dot product + F.aggregate fold — JVM-side, no UDF).
- LSH-bucketed ANN: deterministic signed-random-projection buckets as
  the scale path — at 10^12 vectors the candidate set is one bucket
  (+ optional neighbor probes) instead of the full table; banded
  (OR-amplified) variant for near-dup pair mining with auto-sized
  plane counts.
- IVF: sampled-centroid coarse quantizer + nprobe search — the
  inverted-file scale path (candidates = probed cells only).

Scale: brute force is a broadcast of ONE query vector over a scan —
embarrassingly parallel, no shuffle; top-k is TakeOrdered.  LSH adds a
groupBy(bucket) whose fan-in is controlled by the hyperplane count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cast float32 → double BEFORE any arithmetic (exact widening) so the
    # Spark and DuckDB oracles do identical double-precision math
    from oscar_spark.operators.scan import parallelize
    return (parallelize(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
            .withColumn("embedding", F.col("embedding").cast("array<double>")))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(spark: SparkSession, sf_dir: str, query_vec_id: int = 0,
                k: int = 10) -> DataFrame:
    """Exact cosine top-k neighbors of one vector (excluding itself)."""
    emb = load_embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == query_vec_id) \
        .select(F.col("embedding").alias("qv"))
    joined = emb.filter(F.col("vec_id") != query_vec_id).crossJoin(F.broadcast(q))
    cos = _dot(F.col("embedding"), F.col("qv")) / \
        (_norm(F.col("embedding")) * _norm(F.col("qv")))
    return (joined.select("vec_id", F.round(cos, 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k))


def cosine_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    # same dot/norm formulation as the Spark plan (NOT
    # list_cosine_similarity, whose internal order could differ)
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings), q AS (SELECT embedding AS qv FROM e "
        f"WHERE vec_id = {query_vec_id}) "
        "SELECT vec_id, ROUND("
        "list_sum(list_transform(list_zip(embedding, qv), "
        "x -> x[1] * x[2])) / "
        "(sqrt(list_sum(list_transform(embedding, x -> x * x))) * "
        "sqrt(list_sum(list_transform(qv, x -> x * x)))), 6) AS cosine "
        f"FROM e, q WHERE vec_id != {query_vec_id} "
        f"ORDER BY cosine DESC, vec_id ASC LIMIT {k}")


def _lsh_bucket(vec, n_planes: int, dim: int, plane_offset: int = 0):
    """Deterministic signed-random-projection bucket id (0..2^n_planes).

    Hyperplane p has ±1 weights from a fixed pattern: sign_j = +1 iff
    ((j * 2654435761 + p * 40503) mod 97) < 48 — a pinned pseudo-random
    rule computable in both Spark and DuckDB SQL (no RNG state).
    plane_offset selects an independent plane set per LSH band.
    """
    bucket = F.lit(0)
    for p in range(n_planes):
        pg = plane_offset + p
        # array-literal signs + fold keeps the generated code tiny (an
        # unrolled 64-term sum overflows Janino's 64 KB codegen limit and
        # silently drops the plan to interpreted mode)
        signs = F.array(*[
            F.lit(1.0 if ((j * 2654435761 + pg * 40503) % 97) < 48 else -1.0)
            for j in range(dim)])
        proj = _dot(vec, signs)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def auto_planes(n_rows: int, target_bucket: int = 64) -> int:
    """Plane count so the EXPECTED bucket population ≈ target_bucket:
    2^planes ≈ n/target.  At 10^12 vectors this yields ~34 planes —
    bucket fan-in stays bounded as the table grows, which is the whole
    point of bucketed near-dup at scale (within-bucket join cost is
    Σ|bucket|², so bounded buckets ⇒ linear total work)."""
    import math
    return max(4, math.ceil(math.log2(max(n_rows, 2) / target_bucket)))


def ann_lsh_topk(spark: SparkSession, sf_dir: str, query_vec_id: int = 0,
                 k: int = 10, n_planes: int | None = 4,
                 dim: int = 64) -> DataFrame:
    """ANN: search only the query's LSH bucket, then exact cosine in it.

    n_planes=None sizes the bucket grid from the table (auto_planes) so
    the candidate set stays ~constant as the table grows; explicit
    values pin the rule for oracle comparison."""
    emb = load_embeddings(spark, sf_dir)
    if n_planes is None:
        n_planes = auto_planes(emb.count())
    emb = emb.withColumn(
        "bucket", _lsh_bucket(F.col("embedding"), n_planes, dim))
    qrow = emb.filter(F.col("vec_id") == query_vec_id) \
        .select("embedding", "bucket").collect()[0]
    qb = qrow["bucket"]
    q = spark.createDataFrame([(qrow["embedding"],)], "qv array<double>")
    cand = emb.filter((F.col("bucket") == qb)
                      & (F.col("vec_id") != query_vec_id))
    cos = _dot(F.col("embedding"), F.col("qv")) / \
        (_norm(F.col("embedding")) * _norm(F.col("qv")))
    return (cand.crossJoin(F.broadcast(q))
            .select("vec_id", F.round(cos, 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k))


def _lsh_bucket_sql(vec: str, n_planes: int, dim: int,
                    plane_offset: int = 0) -> str:
    parts = []
    for p in range(n_planes):
        pg = plane_offset + p
        signs = ", ".join(
            f"{1 if ((j * 2654435761 + pg * 40503) % 97) < 48 else -1}.0"
            for j in range(dim))
        proj = (f"list_sum(list_transform(list_zip({vec}, [{signs}]), "
                "x -> x[1] * x[2]))")
        parts.append(f"(CASE WHEN ({proj}) > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(parts)


def ann_lsh_topk_sql(query_vec_id: int = 0, k: int = 10,
                     n_planes: int = 4, dim: int = 64) -> str:
    b = _lsh_bucket_sql("embedding", n_planes, dim)
    return (
        f"WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding "
        "FROM embeddings), "
        f"be AS (SELECT vec_id, embedding, {b} AS bucket FROM e), "
        f"q AS (SELECT embedding AS qv, bucket AS qb FROM be "
        f"WHERE vec_id = {query_vec_id}) "
        "SELECT vec_id, ROUND("
        "list_sum(list_transform(list_zip(embedding, qv), x -> x[1] * x[2]))"
        " / (sqrt(list_sum(list_transform(embedding, x -> x * x))) * "
        "sqrt(list_sum(list_transform(qv, x -> x * x)))), 6) AS cosine "
        "FROM be, q WHERE be.bucket = q.qb AND "
        f"vec_id != {query_vec_id} "
        f"ORDER BY cosine DESC, vec_id ASC LIMIT {k}")


IVF_STRIDE = 32  # pinned stride for driver/oracle parity queries


def auto_stride(n_rows: int) -> int:
    """Stride so the centroid count k = n/stride ≈ √n — the standard
    IVF sizing (total distance work = coarse scan n·k + per-cell scan
    n·(n/k) per full reassignment is minimized at k = √n, and the
    broadcast centroid table grows SUBLINEARLY with the corpus).  A
    fixed stride makes k = n/stride grow linearly: at 10^12 vectors
    the 'broadcast' table would be 3×10^10 rows and assignment n²/32
    cosine evals — the round-2 scale-killer this replaces."""
    import math
    return max(1, round(math.sqrt(max(n_rows, 1))))


def ivf_assign(spark: SparkSession, sf_dir: str,
               stride: int | None = None) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest centroid
    by cosine, centroids = the deterministic sample {vec_id % stride ==
    0} (no iterative k-means — pinned, so an external oracle can
    replicate the exact partition).  → (vec_id, cid, ROUND(cos,6)).

    stride=None (the library default) sizes the sample via auto_stride
    so k ≈ √n; the driver query pins stride=IVF_STRIDE only so the
    DuckDB oracle can replicate the exact centroid set.

    Scale shape: assignment is a crossJoin against the BROADCAST
    centroid table (n·k distance rows ⇒ n^1.5 with auto sizing) with
    a per-vector argmin — embarrassingly parallel, no shuffle of the
    vector table.  At corpus sizes where even √n centroids exceed
    broadcast limits, ivf2_assign (the hierarchical two-level quantizer
    below) removes the broadcast entirely.
    """
    emb = load_embeddings(spark, sf_dir)
    if stride is None:
        stride = auto_stride(emb.count())
    cent = (emb.filter(F.col("vec_id") % stride == 0)
            .select(F.col("vec_id").alias("cid"),
                    F.col("embedding").alias("cv")))
    cos = _dot(F.col("embedding"), F.col("cv")) / \
        (_norm(F.col("embedding")) * _norm(F.col("cv")))
    scored = emb.crossJoin(F.broadcast(cent)) \
        .select("vec_id", "cid", F.round(cos, 6).alias("cos"))
    # argmin by (cos desc, cid asc): deterministic ties
    best = scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("cos"), (-F.col("cid")).alias("nc")))
        .alias("b"))
    return (best.select("vec_id", (-F.col("b.nc")).alias("cid"),
                        F.col("b.cos").alias("cos"))
            .orderBy("vec_id"))


def ivf_assign_sql(stride: int = IVF_STRIDE) -> str:
    cos = ("list_sum(list_transform(list_zip(e.embedding, c.cv), "
           "x -> x[1] * x[2])) / "
           "(sqrt(list_sum(list_transform(e.embedding, x -> x * x))) * "
           "sqrt(list_sum(list_transform(c.cv, x -> x * x))))")
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS"
        " embedding FROM embeddings), "
        f"c AS (SELECT vec_id AS cid, embedding AS cv FROM e"
        f" WHERE vec_id % {stride} = 0), "
        f"scored AS (SELECT e.vec_id, c.cid, ROUND({cos}, 6) AS cos"
        " FROM e CROSS JOIN c), "
        "r AS (SELECT vec_id, cid, cos, ROW_NUMBER() OVER ("
        "PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn"
        " FROM scored) "
        "SELECT vec_id, cid, cos FROM r WHERE rn = 1 ORDER BY vec_id")


def ivf_topk(spark: SparkSession, sf_dir: str, query_vec_id: int = 0,
             k: int = 10, nprobe: int = 4,
             stride: int | None = None) -> DataFrame:
    """IVF search: probe the query's nprobe nearest coarse cells, exact
    cosine top-k among the vectors assigned to them.  The candidate set
    is (nprobe/k_cells) of the table — the standard IVF recall/cost
    dial.  This form recomputes the assignment inline (oracle-checkable
    in one query); production uses ivf_build + ivf_topk_indexed, where
    the probe fetch is a cid-partition-pruned read."""
    emb = load_embeddings(spark, sf_dir)
    if stride is None:
        stride = auto_stride(emb.count())
    assign = ivf_assign(spark, sf_dir, stride).select("vec_id", "cid")
    qrow = emb.filter(F.col("vec_id") == query_vec_id) \
        .select("embedding").collect()[0]
    q = spark.createDataFrame([(qrow["embedding"],)], "qv array<double>")
    cent = (emb.filter(F.col("vec_id") % stride == 0)
            .select(F.col("vec_id").alias("cid"),
                    F.col("embedding").alias("cv")))
    probes = _probe_cids(cent, q, nprobe)
    cand = (emb.join(assign.filter(F.col("cid").isin(probes)), "vec_id")
            .filter(F.col("vec_id") != query_vec_id))
    cos = _dot(F.col("embedding"), F.col("qv")) / \
        (_norm(F.col("embedding")) * _norm(F.col("qv")))
    return (cand.crossJoin(F.broadcast(q))
            .select("vec_id", F.round(cos, 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k))


def _probe_cids(cent: DataFrame, q: DataFrame, nprobe: int) -> list[int]:
    """nprobe nearest centroid ids to the (1-row) query vector table."""
    qcos = _dot(F.col("cv"), F.col("qv")) / \
        (_norm(F.col("cv")) * _norm(F.col("qv")))
    return [r["cid"] for r in
            cent.crossJoin(F.broadcast(q))
            .select("cid", F.round(qcos, 6).alias("c"))
            .orderBy(F.desc("c"), F.asc("cid"))
            .limit(nprobe).collect()]


def ivf_build(spark: SparkSession, sf_dir: str, out_dir: str,
              stride: int | None = None) -> int:
    """Materialize the IVF index: `centroids` parquet (cid, cv) and the
    assignment parquet PARTITIONED BY cid — so ivf_topk_indexed's probe
    fetch reads only the nprobe probed cells' partitions (partition
    pruning), never the full assignment.  Embeddings ride along in the
    assignment so a probe needs no second join against the raw table.
    Returns the stride used (auto_stride(n) when stride=None)."""
    import os
    emb = load_embeddings(spark, sf_dir)
    if stride is None:
        stride = auto_stride(emb.count())
    cent = (emb.filter(F.col("vec_id") % stride == 0)
            .select(F.col("vec_id").alias("cid"),
                    F.col("embedding").alias("cv")))
    cent.write.mode("overwrite").parquet(os.path.join(out_dir, "centroids"))
    assign = ivf_assign(spark, sf_dir, stride).select("vec_id", "cid")
    (emb.join(assign, "vec_id")
     .select("cid", "vec_id", "embedding")
     .write.mode("overwrite").partitionBy("cid")
     .parquet(os.path.join(out_dir, "assign")))
    return stride


def ivf_topk_indexed(spark: SparkSession, out_dir: str,
                     query_vec: list[float], k: int = 10,
                     nprobe: int = 4,
                     exclude_vec_id: int | None = None) -> DataFrame:
    """Probe a materialized IVF index (ivf_build output): rank centroids
    against the query, then scan ONLY the probed cells — a
    cid-partition-pruned parquet read (asserted in plan tests), the
    10^12-vector serve path."""
    import os
    cent = spark.read.parquet(os.path.join(out_dir, "centroids"))
    q = spark.createDataFrame([(list(query_vec),)], "qv array<double>")
    probes = _probe_cids(cent, q, nprobe)
    cand = (spark.read.parquet(os.path.join(out_dir, "assign"))
            .filter(F.col("cid").isin(probes)))
    if exclude_vec_id is not None:
        cand = cand.filter(F.col("vec_id") != exclude_vec_id)
    cos = _dot(F.col("embedding"), F.col("qv")) / \
        (_norm(F.col("embedding")) * _norm(F.col("qv")))
    return (cand.crossJoin(F.broadcast(q))
            .select("vec_id", F.round(cos, 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k))


def ivf_topk_sql(query_vec_id: int = 0, k: int = 10, nprobe: int = 4,
                 stride: int = IVF_STRIDE) -> str:
    assign = ivf_assign_sql(stride).replace(" ORDER BY vec_id", "")
    cosq = ("list_sum(list_transform(list_zip(c.cv, q.qv), "
            "x -> x[1] * x[2])) / "
            "(sqrt(list_sum(list_transform(c.cv, x -> x * x))) * "
            "sqrt(list_sum(list_transform(q.qv, x -> x * x))))")
    cos = ("list_sum(list_transform(list_zip(e.embedding, q.qv), "
           "x -> x[1] * x[2])) / "
           "(sqrt(list_sum(list_transform(e.embedding, x -> x * x))) * "
           "sqrt(list_sum(list_transform(q.qv, x -> x * x))))")
    return (
        f"WITH assign AS (SELECT vec_id, cid FROM ({assign}) t), "
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding"
        " FROM embeddings), "
        f"q AS (SELECT embedding AS qv FROM e WHERE vec_id ="
        f" {query_vec_id}), "
        f"c AS (SELECT vec_id AS cid, embedding AS cv FROM e"
        f" WHERE vec_id % {stride} = 0), "
        f"probes AS (SELECT cid FROM c, q ORDER BY ROUND({cosq}, 6)"
        f" DESC, cid ASC LIMIT {nprobe}) "
        f"SELECT e.vec_id AS vec_id, ROUND({cos}, 6) AS cosine"
        " FROM e JOIN assign ON assign.vec_id = e.vec_id"
        " AND assign.cid IN (SELECT cid FROM probes), q"
        f" WHERE e.vec_id != {query_vec_id}"
        f" ORDER BY cosine DESC, vec_id ASC LIMIT {k}")


IVF2_STRIDE0 = 4  # pinned level-0 stride for driver/oracle parity


def ivf2_tables(emb: DataFrame, stride: int,
                stride0: int) -> tuple[DataFrame, DataFrame]:
    """Two-level coarse-quantizer tables from the deterministic samples:
    supers (scid, sv) = {vec_id % (stride·stride0) == 0} and centroids
    (cid, cv, scid) where each level-1 centroid {vec_id % stride == 0}
    is assigned to its nearest super-centroid (cosine, round 6, ties →
    lowest scid).  Every super-centroid is itself a centroid assigned to
    itself (cos=1), so no super cell is empty."""
    sstep = stride * stride0
    cent = (emb.filter(F.col("vec_id") % stride == 0)
            .select(F.col("vec_id").alias("cid"),
                    F.col("embedding").alias("cv")))
    sup = (emb.filter(F.col("vec_id") % sstep == 0)
           .select(F.col("vec_id").alias("scid"),
                   F.col("embedding").alias("sv")))
    ccos = _dot(F.col("cv"), F.col("sv")) / \
        (_norm(F.col("cv")) * _norm(F.col("sv")))
    cscored = (cent.crossJoin(F.broadcast(sup))
               .select("cid", "scid", F.round(ccos, 6).alias("cs")))
    cbest = (cscored.groupBy("cid")
             .agg(F.max(F.struct(F.col("cs"), (-F.col("scid")).alias("ns")))
                  .alias("b"))
             .select("cid", (-F.col("b.ns")).alias("scid")))
    return sup, cent.join(cbest, "cid")


def ivf2_assign(spark: SparkSession, sf_dir: str,
                stride: int | None = None,
                stride0: int | None = None) -> DataFrame:
    """Two-level (hierarchical) IVF coarse quantizer — the next rung
    above ivf_assign for corpora where even the √n level-1 centroid
    table is too large to broadcast (10^12 vectors → 10^6 centroids ×
    d floats ≈ hundreds of MB).  Level 0 holds k0 ≈ n^(1/4)
    super-centroids (broadcastable at ANY realistic n); each vector
    finds its nearest super cell against that broadcast, then competes
    only against the ~√k1 centroids OF THAT CELL via a shuffle join on
    scid — per-vector work k0 + k1/k0 ≈ 2·n^(1/4) instead of k1 = √n,
    and the full centroid table is never broadcast.  Deterministic
    sampling (vec_id strides) and tie rules, so DuckDB replicates the
    exact assignment.  → (vec_id, scid, cid, cos).

    Approximation note (standard for hierarchical IVF/IMI): a vector
    whose true nearest centroid lives in a different super cell gets
    its within-cell best instead — the recall/cost dial that makes
    assignment sublinear; ivf2_topk widens the search with w0."""
    emb = load_embeddings(spark, sf_dir)
    if stride is None:
        stride = auto_stride(emb.count())
    if stride0 is None:
        stride0 = auto_stride(max(emb.count() // stride, 1))
    sup, cent = ivf2_tables(emb, stride, stride0)
    vcos = _dot(F.col("embedding"), F.col("sv")) / \
        (_norm(F.col("embedding")) * _norm(F.col("sv")))
    vscored = (emb.crossJoin(F.broadcast(sup))
               .select("vec_id", "scid", F.round(vcos, 6).alias("vs")))
    vbest = (vscored.groupBy("vec_id")
             .agg(F.max(F.struct(F.col("vs"), (-F.col("scid")).alias("ns")))
                  .alias("b"))
             .select("vec_id", (-F.col("b.ns")).alias("scid")))
    ccos = _dot(F.col("embedding"), F.col("cv")) / \
        (_norm(F.col("embedding")) * _norm(F.col("cv")))
    # shuffle equi-join on scid (co-partitioned at scale), NOT a
    # broadcast of the full centroid table — the point of level 0
    cand = (emb.join(vbest, "vec_id").join(cent, "scid")
            .select("vec_id", "scid", "cid",
                    F.round(ccos, 6).alias("cos")))
    best = (cand.groupBy("vec_id")
            .agg(F.max(F.struct(F.col("cos"), (-F.col("cid")).alias("nc"),
                                F.col("scid"))).alias("b"))
            .select("vec_id", F.col("b.scid").alias("scid"),
                    (-F.col("b.nc")).alias("cid"),
                    F.col("b.cos").alias("cos")))
    return best.orderBy("vec_id")


def _duck_cos(a: str, b: str) -> str:
    return (f"list_sum(list_transform(list_zip({a}, {b}), "
            "x -> x[1] * x[2])) / "
            f"(sqrt(list_sum(list_transform({a}, x -> x * x))) * "
            f"sqrt(list_sum(list_transform({b}, x -> x * x))))")


def _ivf2_cte(stride: int, stride0: int) -> str:
    """Shared DuckDB CTE chain: e, c (centroids), s (supers), cb
    (centroid → super cell), vb (vector → super cell)."""
    sstep = stride * stride0
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS"
        " embedding FROM embeddings), "
        f"c AS (SELECT vec_id AS cid, embedding AS cv FROM e"
        f" WHERE vec_id % {stride} = 0), "
        f"s AS (SELECT vec_id AS scid, embedding AS sv FROM e"
        f" WHERE vec_id % {sstep} = 0), "
        "cb AS (SELECT cid, cv, scid FROM (SELECT c.cid, c.cv, s.scid,"
        " ROW_NUMBER() OVER (PARTITION BY c.cid ORDER BY"
        f" ROUND({_duck_cos('c.cv', 's.sv')}, 6) DESC, s.scid ASC) AS rn"
        " FROM c CROSS JOIN s) t WHERE rn = 1), "
        "vb AS (SELECT vec_id, embedding, scid FROM (SELECT e.vec_id,"
        " e.embedding, s.scid, ROW_NUMBER() OVER (PARTITION BY e.vec_id"
        f" ORDER BY ROUND({_duck_cos('e.embedding', 's.sv')}, 6) DESC,"
        " s.scid ASC) AS rn FROM e CROSS JOIN s) t WHERE rn = 1)")


def ivf2_assign_sql(stride: int = IVF_STRIDE,
                    stride0: int = IVF2_STRIDE0) -> str:
    return (
        _ivf2_cte(stride, stride0) +
        ", vc AS (SELECT vb.vec_id, vb.scid, cb.cid,"
        f" ROUND({_duck_cos('vb.embedding', 'cb.cv')}, 6) AS cos"
        " FROM vb JOIN cb USING (scid)) "
        "SELECT vec_id, scid, cid, cos FROM (SELECT *, ROW_NUMBER()"
        " OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn"
        " FROM vc) t WHERE rn = 1 ORDER BY vec_id")


def ivf2_topk(spark: SparkSession, sf_dir: str, query_vec_id: int = 0,
              k: int = 10, nprobe: int = 4, w0: int = 2,
              stride: int | None = None,
              stride0: int | None = None) -> DataFrame:
    """Two-level IVF search: rank super cells against the query (k0
    broadcast rows), take the w0 nearest, rank only THOSE cells'
    centroids, probe the nprobe nearest, exact cosine top-k among the
    vectors assigned (by ivf2_assign) to the probed centroids.  w0 > 1
    recovers recall lost at super-cell boundaries — the two-level
    recall/cost dial."""
    emb = load_embeddings(spark, sf_dir)
    if stride is None:
        stride = auto_stride(emb.count())
    if stride0 is None:
        stride0 = auto_stride(max(emb.count() // stride, 1))
    sup, cent = ivf2_tables(emb, stride, stride0)
    assign = ivf2_assign(spark, sf_dir, stride, stride0) \
        .select("vec_id", "cid")
    qrow = emb.filter(F.col("vec_id") == query_vec_id) \
        .select("embedding").collect()[0]
    q = spark.createDataFrame([(qrow["embedding"],)], "qv array<double>")
    scos = _dot(F.col("sv"), F.col("qv")) / \
        (_norm(F.col("sv")) * _norm(F.col("qv")))
    probes0 = [r["scid"] for r in
               sup.crossJoin(F.broadcast(q))
               .select("scid", F.round(scos, 6).alias("c"))
               .orderBy(F.desc("c"), F.asc("scid")).limit(w0).collect()]
    ccos = _dot(F.col("cv"), F.col("qv")) / \
        (_norm(F.col("cv")) * _norm(F.col("qv")))
    probes = [r["cid"] for r in
              cent.filter(F.col("scid").isin(probes0))
              .crossJoin(F.broadcast(q))
              .select("cid", F.round(ccos, 6).alias("c"))
              .orderBy(F.desc("c"), F.asc("cid")).limit(nprobe).collect()]
    cand = (emb.join(assign.filter(F.col("cid").isin(probes)), "vec_id")
            .filter(F.col("vec_id") != query_vec_id))
    cos = _dot(F.col("embedding"), F.col("qv")) / \
        (_norm(F.col("embedding")) * _norm(F.col("qv")))
    return (cand.crossJoin(F.broadcast(q))
            .select("vec_id", F.round(cos, 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k))


def ivf2_topk_sql(query_vec_id: int = 0, k: int = 10, nprobe: int = 4,
                  w0: int = 2, stride: int = IVF_STRIDE,
                  stride0: int = IVF2_STRIDE0) -> str:
    return (
        _ivf2_cte(stride, stride0) +
        f", q AS (SELECT embedding AS qv FROM e WHERE vec_id ="
        f" {query_vec_id}), "
        "probes0 AS (SELECT scid FROM s, q ORDER BY"
        f" ROUND({_duck_cos('s.sv', 'q.qv')}, 6) DESC, scid ASC"
        f" LIMIT {w0}), "
        "probes AS (SELECT cid FROM cb, q WHERE cb.scid IN"
        " (SELECT scid FROM probes0) ORDER BY"
        f" ROUND({_duck_cos('cb.cv', 'q.qv')}, 6) DESC, cid ASC"
        f" LIMIT {nprobe}), "
        "vc AS (SELECT vb.vec_id, cb.cid,"
        f" ROUND({_duck_cos('vb.embedding', 'cb.cv')}, 6) AS cos"
        " FROM vb JOIN cb USING (scid)), "
        "assign AS (SELECT vec_id, cid FROM (SELECT *, ROW_NUMBER()"
        " OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn"
        " FROM vc) t WHERE rn = 1) "
        "SELECT e.vec_id AS vec_id,"
        f" ROUND({_duck_cos('e.embedding', 'q.qv')}, 6) AS cosine"
        " FROM e JOIN assign ON assign.vec_id = e.vec_id"
        " AND assign.cid IN (SELECT cid FROM probes), q"
        f" WHERE e.vec_id != {query_vec_id}"
        f" ORDER BY cosine DESC, vec_id ASC LIMIT {k}")


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean embedding norm + count per label (vector agg sanity query)."""
    emb = load_embeddings(spark, sf_dir)
    return (emb.select("label", _norm(F.col("embedding")).alias("nrm"))
            .groupBy("label")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("nrm"), 6).alias("avg_norm"))
            .orderBy("label"))


LABEL_CENTROIDS_SQL = (
    "SELECT label, COUNT(*) AS n, "
    "ROUND(AVG(sqrt(list_sum(list_transform(embedding, x -> x * x)))), 6) "
    "AS avg_norm FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings) GROUP BY label ORDER BY label")


def cosine_near_dup_pairs(spark: SparkSession, sf_dir: str,
                          threshold: float = 0.9,
                          n_planes: int | None = 4, n_bands: int = 2,
                          dim: int = 64) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, banded-LSH scale path.

    n_bands independent signed-random-projection plane sets (band b uses
    planes b*n_planes..): candidate pairs agree on (band, bucket) for
    ANY band (OR-amplification — per-band recall (1-miss^bands) instead
    of one set's), then the exact cosine filter keeps pairs ≥ threshold.
    n_planes=None derives the plane count from the table size
    (auto_planes), so within-bucket populations — and hence the
    self-join's per-key fan-in — stay bounded as the table grows; pass
    an explicit value when an external oracle must agree on the rule.

    Shape at 10^12 vectors: candidate generation runs on the SLIM
    (vec_id, band, bucket) rows (no embedding payload through the
    self-join shuffle); embeddings re-attach to the deduped candidate
    pairs by two vec_id equi-joins.
    """
    emb = load_embeddings(spark, sf_dir)
    if n_planes is None:
        n_planes = auto_planes(emb.count())
    slim = emb.select("vec_id", F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"),
                 _lsh_bucket(F.col("embedding"), n_planes, dim,
                             b * n_planes).alias("bucket"))
        for b in range(n_bands)])).alias("bb")) \
        .select("vec_id", "bb.band", "bb.bucket")
    cand = (slim.alias("a").join(slim.alias("b"), ["band", "bucket"])
            .filter(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("a_id"),
                    F.col("b.vec_id").alias("b_id"))
            .distinct())
    ea = emb.select(F.col("vec_id").alias("a_id"),
                    F.col("embedding").alias("a_emb"))
    eb = emb.select(F.col("vec_id").alias("b_id"),
                    F.col("embedding").alias("b_emb"))
    cos = _dot(F.col("a_emb"), F.col("b_emb")) / \
        (_norm(F.col("a_emb")) * _norm(F.col("b_emb")))
    return (cand.join(ea, "a_id").join(eb, "b_id")
            .select("a_id", "b_id", F.round(cos, 6).alias("cosine"))
            .filter(F.col("cosine") >= threshold)
            .orderBy("a_id", "b_id"))


def cosine_near_dup_pairs_sql(threshold: float = 0.9, n_planes: int = 4,
                              n_bands: int = 2, dim: int = 64) -> str:
    buckets = ", ".join(
        f"{_lsh_bucket_sql('embedding', n_planes, dim, b * n_planes)}"
        f" AS bkt{b}" for b in range(n_bands))
    bands = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, bkt{b} AS bucket FROM be"
        for b in range(n_bands))
    cos = ("list_sum(list_transform(list_zip(ea.embedding, eb.embedding), "
           "x -> x[1] * x[2])) / "
           "(sqrt(list_sum(list_transform(ea.embedding, x -> x * x))) * "
           "sqrt(list_sum(list_transform(eb.embedding, x -> x * x))))")
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding"
        " FROM embeddings), "
        f"be AS (SELECT vec_id, embedding, {buckets} FROM e), "
        f"bb AS ({bands}), "
        "cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id"
        " FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket"
        " AND a.vec_id < b.vec_id) "
        f"SELECT a_id, b_id, ROUND({cos}, 6) AS cosine"
        " FROM cand JOIN e ea ON ea.vec_id = a_id"
        " JOIN e eb ON eb.vec_id = b_id"
        f" WHERE ROUND({cos}, 6) >= {threshold}"
        " ORDER BY a_id, b_id")
