"""Deduplication operators for training-data pipelines (SURVEY.md §2.8
X1/X2): exact hash dedup, n-gram Jaccard near-dup, MinHash+LSH, SimHash,
and embedding-cosine near-dup over ``documents`` / ``embeddings``.

Cross-engine determinism (all ✓ oracle-checked):
- 60-bit md5-prefix hashes (see operators/text.py — probed bit-identical).
- Embedding arithmetic is quantized to 1e-6 integers before the dot
  product, so similarity values are exact integers + one IEEE sqrt/divide —
  bit-identical across engines (raw float32 accumulation order would not
  be). The quantization error (<1e-5 on unit vectors) is far below any
  dedup threshold anyone would set.

Scale notes (100 TB story):
- Exact dedup is one hash-aggregate: map-side partial min/count per
  fingerprint, shuffle carries one row per distinct content.
- Jaccard/MinHash are *blocked* joins: pairs are only formed inside a
  shingle/bucket posting list, never all-pairs. Posting lists are capped
  (LSH skew guard) so one hot bucket cannot quadratic-blow a task — at
  100 TB a stopword-like shingle would otherwise produce 10^12 pairs.
- SimHash is explode + 60 conditional sums: pure map-side work, one
  shuffle of (doc, 60 ints).
- Embedding near-dup blocks on the cluster label (IVF-style partition
  assignment): within-block pairs only, top-N output bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.operators.text import (
    DUCK_TOKENS,
    duck_hash60,
    spark_hash60,
    tokens_col,
)
from demo_iceberg_permanent_delete_spark.registry import query
from demo_iceberg_permanent_delete_spark.sources.tables import load_table

MINHASH_K = 16  # signature length
MINHASH_BANDS = 4  # bands of 4 rows each
BUCKET_CAP = 50  # LSH skew guard: ignore posting lists longer than this
TOP_PAIRS = 100  # deterministic output bound for pair queries


# ---------------------------------------------------------------------------
# X1: exact dedup — normalize (lower, collapse whitespace), md5 fingerprint,
# keep the lowest doc_id per content group. One row per distinct content.
# ---------------------------------------------------------------------------
_DUCK_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@query(
    "dedup_exact",
    oracle=f"""
    SELECT
      md5({_DUCK_NORM}) AS fingerprint,
      min(doc_id) AS keeper_doc_id,
      count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), "\\s+", " "))
    return (
        docs.select("doc_id", F.md5(norm).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# X2a: n-gram Jaccard near-dup — word-bigram shingle sets, candidate pairs
# via the shingle posting lists (blocked join), exact Jaccard, global top-N
# by similarity (deterministic tiebreak on the pair key).
# ---------------------------------------------------------------------------
@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {DUCK_TOKENS} AS t FROM documents
    ),
    shingles AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+1], ' ') AS shingle
      FROM toks, unnest(generate_series(1, greatest(len(t) - 1, 1))) AS u(i)
    ),
    doc_sizes AS (
      SELECT doc_id, count(*) AS n_shingles FROM shingles GROUP BY doc_id
    ),
    posting_ok AS (
      SELECT shingle FROM shingles GROUP BY shingle HAVING count(*) <= {BUCKET_CAP}
    ),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
      FROM shingles a
      JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      JOIN posting_ok p ON a.shingle = p.shingle
      GROUP BY 1, 2
    )
    SELECT
      s.doc_a,
      s.doc_b,
      s.n_shared,
      s.n_shared / (da.n_shingles + db.n_shingles - s.n_shared) AS jaccard
    FROM shared s
    JOIN doc_sizes da ON s.doc_a = da.doc_id
    JOIN doc_sizes db ON s.doc_b = db.doc_id
    ORDER BY jaccard DESC, s.doc_a ASC, s.doc_b ASC
    LIMIT {TOP_PAIRS}
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col(F.col("text")).alias("t"))
    positions = toks.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(1), F.greatest(F.size("t") - 1, F.lit(1)))).alias(
            "i"
        ),
    )
    shingles = positions.select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.col("t"), F.col("i"), 2)).alias("shingle"),
    ).distinct()
    doc_sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    posting_ok = (
        shingles.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("pl"))
        .filter(F.col("pl") <= BUCKET_CAP)
        .select("shingle")
    )
    a = shingles.join(posting_ok, "shingle").alias("a")
    b = shingles.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    da = doc_sizes.alias("da")
    db = doc_sizes.alias("db")
    return (
        shared.join(F.broadcast(da), F.col("doc_a") == F.col("da.doc_id"))
        .join(F.broadcast(db), F.col("doc_b") == F.col("db.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            (
                F.col("n_shared")
                / (F.col("da.n_shingles") + F.col("db.n_shingles") - F.col("n_shared"))
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(TOP_PAIRS)
    )


# ---------------------------------------------------------------------------
# X2b: MinHash signatures + LSH band buckets. One base hash per token
# (md5-derived 60-bit), k = 16 permutations via XOR with fixed 59-bit seeds
# — the classic "one hash + k universal perms" MinHash construction. XOR is
# a bijection on the hash domain, overflow-free in signed 64-bit on both
# engines, and keeps the aggregate codegen small (16 md5 aggregates per row
# compiled to a ~12 s Janino unit and re-hashed every token; one md5 in the
# projection + 16 XOR-mins runs 3× faster and compiles in well under a
# second). Band key concatenates 4 signature rows.
# ---------------------------------------------------------------------------
MINHASH_SEEDS = [
    153307352162749871,
    74922837739199681,
    529232184294725326,
    363407168092868589,
    464965269110098634,
    217082132513276762,
    388617822205370368,
    273560573251292631,
    456642232600311350,
    481694939222138980,
    38019731430059978,
    69071857923403933,
    306238162993057539,
    345149584737929983,
    191919841431250494,
    530179042305200133,
]


def _duck_minhash_band(band: int) -> str:
    rows = ", ".join(
        f"min(xor(h, {MINHASH_SEEDS[i]}))" for i in range(band * 4, band * 4 + 4)
    )
    return f"array_to_string([{rows}], '-') AS band_{band}"


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("t")
    ).distinct()
    hashed = tok.select("doc_id", spark_hash60(F.col("t")).alias("h"))
    mins = [
        F.min(F.col("h").bitwiseXOR(F.lit(seed))).alias(f"h{i}")
        for i, seed in enumerate(MINHASH_SEEDS)
    ]
    sig = hashed.groupBy("doc_id").agg(*mins)
    bands = [
        F.concat_ws("-", *[F.col(f"h{i}") for i in range(b * 4, b * 4 + 4)]).alias(
            f"band_{b}"
        )
        for b in range(MINHASH_BANDS)
    ]
    return sig.select("doc_id", *bands)


# ---------------------------------------------------------------------------
# X2b': LSH candidate buckets — docs sharing any band key are near-dup
# candidates. Output: per (band, bucket) the member count and the two
# smallest doc ids (the candidate pair seed), only for buckets with >1 doc.
# ---------------------------------------------------------------------------
def minhash_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = minhash_signatures(spark, sf_dir)
    unpivoted = None
    for b in range(MINHASH_BANDS):
        part = sig.select(
            "doc_id",
            F.lit(b).alias("band_id"),
            F.col(f"band_{b}").alias("band_key"),
        )
        unpivoted = part if unpivoted is None else unpivoted.unionByName(part)
    return (
        unpivoted.groupBy("band_id", "band_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# X2c: SimHash — 60-bit fingerprint: per distinct token hash, each bit votes
# ±1; fingerprint bit j is 1 iff the vote sum is positive.
# ---------------------------------------------------------------------------
SIMHASH_BITS = 60


@query(
    "simhash_fingerprints",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest({DUCK_TOKENS}) AS t FROM documents
    ),
    hashed AS (
      SELECT doc_id, {duck_hash60("t")} AS h FROM tok
    ),
    votes AS (
      SELECT
        doc_id,
        {", ".join(f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}" for j in range(SIMHASH_BITS))}
      FROM hashed
      GROUP BY doc_id
    )
    SELECT
      doc_id,
      {" + ".join(f"(CASE WHEN v{j} > 0 THEN 1::BIGINT << {j} ELSE 0 END)" for j in range(SIMHASH_BITS))}
        AS simhash
    FROM votes
    """,
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bit votes via one Arrow/numpy pass (guide §4.2) instead of
    a 60-column JVM aggregate: the old shape paid ~0.5 s of driver-side
    plan building/optimization per run (60 conditional SUMs + a 60-deep
    chained projection) plus a wide partial-agg exchange; here the
    post-distinct (doc_id, h) rows shuffle ONCE by doc_id and a
    mapInPandas iterator unpacks the 60 bits with one vectorized shift
    per batch, accumulating per-doc counts across the partition's
    batches. Exact integer math end to end (votes are int64 counts; bit
    j of the fingerprint is 2·c_j > n), so the result is bit-identical
    to the aggregate formulation — differential-pinned in
    tests/test_dedup.py. Measured 2.1 s → 0.85 s at sf0.1.

    Scale shape: dedup'd token hashes shuffle once (the same magnitude
    the distinct's own exchange already moved); per-task state is one
    61-int row per doc in the partition — doc-, not token-,
    proportional."""
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("t")
    ).distinct()
    hashed = tok.select("doc_id", spark_hash60(F.col("t")).alias("h"))

    def votes(batches):
        shifts = np.arange(SIMHASH_BITS, dtype=np.int64)
        acc_c: dict[int, np.ndarray] = {}
        acc_n: dict[int, int] = {}
        for pdf in batches:
            h = pdf["h"].to_numpy(dtype=np.int64)
            doc = pdf["doc_id"].to_numpy(dtype=np.int64)
            bits = ((h[:, None] >> shifts) & 1).astype(np.int64)
            bf = pd.DataFrame(bits)
            bf["__d"] = doc
            grouped = bf.groupby("__d", sort=False)
            sums = grouped.sum()
            sizes = grouped.size()
            for d, row in zip(sums.index.to_numpy(), sums.to_numpy()):
                prev = acc_c.get(d)
                acc_c[d] = row if prev is None else prev + row
            for d, n in sizes.items():
                acc_n[d] = acc_n.get(d, 0) + int(n)
        if acc_c:
            ds = np.fromiter(acc_c.keys(), dtype=np.int64)
            counts = np.stack([acc_c[d] for d in ds])
            totals = np.fromiter((acc_n[d] for d in ds), dtype=np.int64)
            fp = (
                ((2 * counts) > totals[:, None]).astype(np.int64) << shifts
            ).sum(axis=1)
            yield pd.DataFrame({"doc_id": ds, "simhash": fp})

    return hashed.repartition("doc_id").mapInPandas(
        votes, "doc_id long, simhash long"
    )


# ---------------------------------------------------------------------------
# X2d: embedding-cosine near-dup — IVF-style blocking on the cluster label,
# quantized-integer cosine within blocks, global top-N pairs.
# ---------------------------------------------------------------------------
_DUCK_QVEC = (
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"
)


@query(
    "embedding_near_dup",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label, {_DUCK_QVEC} AS v FROM embeddings
    ),
    n AS (
      SELECT vec_id, label, v,
             sqrt(CAST(list_sum([v[i] * v[i] FOR i IN generate_series(1, len(v))]) AS DOUBLE)) AS nrm
      FROM q
    )
    SELECT
      a.vec_id AS vec_a,
      b.vec_id AS vec_b,
      a.label AS label,
      CAST(list_sum([a.v[i] * b.v[i] FOR i IN generate_series(1, len(a.v))]) AS DOUBLE)
        / (a.nrm * b.nrm) AS cosine
    FROM n a
    JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    ORDER BY cosine DESC, vec_a ASC, vec_b ASC
    LIMIT {TOP_PAIRS}
    """,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label blocked GEMM: each label block becomes one Arrow batch
    whose exact-int64 Gram matrix yields every in-block pair's dot product
    in one BLAS call — replacing the round-3 self-join whose per-pair
    higher-order-function dot was interpreted per element (~2.8× slower
    measured at sf0.1). Determinism: the int64 matmul is exact (quantized
    components ≤1e6 ⇒ 64-term dot ≤6.4e13, far below 2^63), and
    sqrt/mul/div are IEEE correctly-rounded, so the cosine is bit-identical
    to the DuckDB oracle's. Scale shape: pairs exist only inside a label
    block (IVF-style blocking), each block is one task, and the GEMM runs
    row-chunked (``mat[i0:i1] @ mat.T``) so the Gram working set is
    O(chunk · n) rather than n² — no all-pairs join anywhere."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000000.0).cast("long"),
    )
    q = emb.select("vec_id", "label", qvec.alias("v"))

    # Row-chunked GEMM: the Gram working set is O(chunk · n), never n²,
    # so a hot label block degrades gracefully instead of OOMing one
    # task. (The PAIR output is inherently O(n²) for a pathological
    # block — that is the semantics; the bound here is peak memory.)
    gemm_chunk = 4096

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        vids = pdf["vec_id"].to_numpy()
        lab = pdf["label"].iloc[0]
        mat = np.stack(pdf["v"].to_numpy()).astype(np.int64)
        n = len(vids)
        self_dot = np.einsum("ij,ij->i", mat, mat)  # exact int64
        nrm = np.sqrt(self_dot.astype(np.float64))
        outs = []
        for i0 in range(0, n, gemm_chunk):
            i1 = min(i0 + gemm_chunk, n)
            gram = mat[i0:i1] @ mat.T  # (chunk, n) exact int64
            # pairs (i0+r, j) with j > i0+r — strict upper triangle of
            # the full matrix restricted to this row chunk
            r, j = np.triu_indices(i1 - i0, k=i0 + 1, m=n)
            va, vb = vids[i0 + r], vids[j]
            swap = va > vb
            cos = gram[r, j].astype(np.float64) / (nrm[i0 + r] * nrm[j])
            outs.append(
                pd.DataFrame(
                    {
                        "vec_a": np.where(swap, vb, va),
                        "vec_b": np.where(swap, va, vb),
                        "label": np.full(len(va), lab, dtype=np.int32),
                        "cosine": cos,
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    pairs = q.groupBy("label").applyInPandas(
        block_pairs, "vec_a long, vec_b long, label int, cosine double"
    )
    return pairs.orderBy(F.desc("cosine"), F.asc("vec_a"), F.asc("vec_b")).limit(
        TOP_PAIRS
    )


# ---------------------------------------------------------------------------
# Composite driver entry for the MinHash pipeline: per-doc banded signature
# (minhash_signatures) PLUS the LSH bucketing signal — n_dup_bands counts
# the bands in which the doc shares its bucket with ≥1 other doc, i.e. the
# number of independent LSH tables that nominate it as a near-dup
# candidate. One entry keeps both stages hash-checked under the driver's
# 50-row correctness cap. Scale shape unchanged: bucket sizes come from a
# window over (band, key) — the same hash shuffle the banded join uses; no
# all-pairs anywhere.
# ---------------------------------------------------------------------------
@query(
    "minhash_dedup",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest({DUCK_TOKENS}) AS t FROM documents
    ),
    hashed AS (
      SELECT doc_id, {duck_hash60("t")} AS h FROM tok
    ),
    sig AS (
      SELECT
        doc_id,
        {", ".join(_duck_minhash_band(b) for b in range(MINHASH_BANDS))}
      FROM hashed
      GROUP BY doc_id
    ),
    unpivoted AS (
      {" UNION ALL ".join(f"SELECT doc_id, {b} AS band_id, band_{b} AS band_key FROM sig" for b in range(MINHASH_BANDS))}
    ),
    bucketed AS (
      SELECT doc_id, band_id,
             count(*) OVER (PARTITION BY band_id, band_key) AS n_in_bucket
      FROM unpivoted
    ),
    cand AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN n_in_bucket > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_bands
      FROM bucketed
      GROUP BY doc_id
    )
    SELECT sig.*, cand.n_dup_bands
    FROM sig JOIN cand ON sig.doc_id = cand.doc_id
    """,
)
def minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    sig = minhash_signatures(spark, sf_dir)
    unpivoted = None
    for b in range(MINHASH_BANDS):
        part = sig.select(
            "doc_id",
            F.lit(b).alias("band_id"),
            F.col(f"band_{b}").alias("band_key"),
        )
        unpivoted = part if unpivoted is None else unpivoted.unionByName(part)
    w = Window.partitionBy("band_id", "band_key")
    cand = (
        unpivoted.withColumn("n_in_bucket", F.count(F.lit(1)).over(w))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("n_in_bucket") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_bands")
        )
    )
    return sig.join(cand, "doc_id")


# ---------------------------------------------------------------------------
# X2e: duplicate-cluster assembly — connected components over the MinHash-LSH
# candidate graph, so "keep one doc per near-dup *group*" (not just per
# pair) is a single declarative output: (doc_id, cluster_id, cluster_size,
# is_canonical).
#
# Scale shape (100 TB story):
# - Edges are *star* edges per LSH bucket — every member links to the
#   bucket's minimum doc_id. Same connectivity as the within-bucket clique
#   at |bucket|-1 edges instead of |bucket|^2/2; combined with BUCKET_CAP
#   the edge set is linear in corpus size.
# - Components are resolved by hash-min label propagation: each round is
#   one join + one min-aggregate on (edges ∪ reversed edges), i.e. two
#   shuffles partitioned by doc_id, with localCheckpoint truncating the
#   plan between rounds. Rounds needed = graph diameter; near-dup graphs
#   built from star edges have tiny diameter (buckets overlap through
#   shared members), so the loop converges in a handful of rounds — the
#   convergence check is a count of changed labels, and the operator raises
#   if _CC_MAX_ROUNDS is hit (at web scale, swap in the
#   large-star/small-star alternation of Kiveris et al., "Connected
#   Components in MapReduce and Beyond", for O(log n) worst-case rounds).
# ---------------------------------------------------------------------------
_CC_MAX_ROUNDS = 15

# Edge-count gate for the driver union-find fast path: the capped-LSH edge
# set is O(duplicate docs × bands), not O(corpus). 500k edges arrive as
# 1M (src, dst) pairs (both orientations); via Arrow/toPandas that is two
# int64 numpy columns ≈ 16 MB — comfortably driver-sized (the earlier
# .collect() materialized 1M pyspark Rows at ~100+ bytes each, an
# order-of-magnitude more). Past the gate the distributed hash-min +
# pointer-jumping loop runs instead.
_CC_LOCAL_MAX_EDGES = 500_000

_DUCK_SIG_CTES = f"""
    tok AS (
      SELECT DISTINCT doc_id, unnest({DUCK_TOKENS}) AS t FROM documents
    ),
    hashed AS (
      SELECT doc_id, {duck_hash60("t")} AS h FROM tok
    ),
    sig AS (
      SELECT
        doc_id,
        {", ".join(_duck_minhash_band(b) for b in range(MINHASH_BANDS))}
      FROM hashed
      GROUP BY doc_id
    ),
    unpivoted AS (
      {" UNION ALL ".join(f"SELECT doc_id, {b} AS band_id, band_{b} AS band_key FROM sig" for b in range(MINHASH_BANDS))}
    )
"""


def lsh_candidate_edges(sig: DataFrame) -> DataFrame:
    """Star edges (bucket-min doc -> member) per capped LSH bucket."""
    unpivoted = None
    for b in range(MINHASH_BANDS):
        part = sig.select(
            "doc_id",
            F.lit(b).alias("band_id"),
            F.col(f"band_{b}").alias("band_key"),
        )
        unpivoted = part if unpivoted is None else unpivoted.unionByName(part)
    w = Window.partitionBy("band_id", "band_key")
    return (
        unpivoted.withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("m", F.min("doc_id").over(w))
        .filter(
            (F.col("n") >= 2) & (F.col("n") <= BUCKET_CAP) & (F.col("doc_id") != F.col("m"))
        )
        .select(F.col("m").alias("src"), F.col("doc_id").alias("dst"))
        .distinct()
    )


def connected_components(nodes: DataFrame, edges: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Hash-min label propagation with pointer jumping; returns
    (id_col, cluster_id).

    Two scale levers over plain hash-min:

    - **Active subgraph only**: labels iterate over edge ENDPOINTS, not
      all of ``nodes`` — a node in no edge is its own cluster and never
      changes. At 100 TB the duplicate-pair endpoint set is a small
      fraction of the corpus, so every per-round shuffle and checkpoint
      shrinks accordingly; singletons re-attach in one final join whose
      build side AQE broadcasts when small.
    - **Pointer jumping** (``label ← label(label)`` each round): path
      compression makes convergence O(log diameter) instead of
      O(diameter) — measured 9 → 4 rounds on the sf0.1 LSH graph. Labels
      are always member ids, monotonically non-increasing, so the fixed
      point (no neighbor-min change, no pointer change) is exactly the
      component-min labelling the DuckDB recursive-CTE oracle computes.
    """
    bi = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    # Size-gated small-graph fast path (the same hybrid the metadata views
    # use): the capped-LSH edge set is O(duplicate docs), NOT O(corpus) —
    # under the gate, driver union-find resolves components in one pass
    # and skips O(log d) full shuffle rounds; past it, the distributed
    # loop below runs unchanged (forced in tests via monkeypatched gate).
    n_edges = bi.count() // 2
    if n_edges <= _CC_LOCAL_MAX_EDGES:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        # collect from the CHECKPOINTED bi, not `edges` — edges' lineage
        # is the full minhash/LSH pipeline and a second action would
        # recompute it from scratch; the reversed duplicates are harmless
        # to union-find. Arrow transfer (toPandas) keeps the driver copy
        # at two flat int64 arrays instead of a million Row objects.
        bi_pd = bi.toPandas()
        # .tolist() converts to native Python values (int for int64,
        # str for string ids) — the id_col contract is any orderable
        # type, so no int() coercion here
        for a, b in zip(bi_pd["src"].tolist(), bi_pd["dst"].tolist()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp_min: dict = {}
        for v in parent:
            r = find(v)
            comp_min[r] = min(comp_min.get(r, v), v)
        from demo_iceberg_permanent_delete_spark.lake.table import (
            _local_frame,
        )

        id_type = nodes.schema[id_col].dataType.simpleString()
        # one Arrow batch, not a 32-slice Python parallelize (the label
        # map can be tens of thousands of rows — the slice path costs a
        # full-width Python-worker job just to build the broadcast)
        label_df = F.broadcast(
            _local_frame(
                nodes.sparkSession,
                [(v, comp_min[find(v)]) for v in parent],
                f"{id_col} {id_type}, label {id_type}",
            )
        )
        return nodes.join(label_df, id_col, "left").select(
            F.col(id_col),
            F.coalesce(F.col("label"), F.col(id_col)).alias("cluster_id"),
        )
    # both directions are present, so src alone enumerates all endpoints
    labels = (
        bi.select(F.col("src").alias(id_col))
        .distinct()
        .select(F.col(id_col), F.col(id_col).alias("label"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(_CC_MAX_ROUNDS):
        nbr = (
            bi.join(labels, bi["src"] == labels[id_col])
            .groupBy(F.col("dst").alias(id_col))
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(nbr, id_col, "left").select(
            F.col(id_col),
            F.col("label").alias("old_label"),
            F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias(
                "label"
            ),
        )
        ptr = stepped.select(
            F.col(id_col).alias("label"), F.col("label").alias("label2")
        )
        new_labels = (
            stepped.join(ptr, "label", "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("label2"), F.col("label")).alias("label"),
                (
                    F.coalesce(F.col("label2"), F.col("label")) < F.col("old_label")
                ).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {_CC_MAX_ROUNDS} rounds; "
            "use star-contraction (Kiveris et al.) for adversarial graphs"
        )
    # singletons (no edges) label themselves; AQE broadcasts the label
    # side at runtime when it is small (checkpointed → exact size known)
    return nodes.join(labels, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("label"), F.col(id_col)).alias("cluster_id"),
    )


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE
    {_DUCK_SIG_CTES},
    buckets AS (
      SELECT band_id, band_key, min(doc_id) AS m, count(*) AS n
      FROM unpivoted GROUP BY 1, 2
    ),
    edges AS (
      SELECT DISTINCT b.m AS src, u.doc_id AS dst
      FROM unpivoted u
      JOIN buckets b ON u.band_id = b.band_id AND u.band_key = b.band_key
      WHERE b.n BETWEEN 2 AND {BUCKET_CAP} AND u.doc_id != b.m
    ),
    bi AS (
      SELECT src, dst FROM edges
      UNION
      SELECT dst AS src, src AS dst FROM edges
    ),
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN bi e ON e.src = r.id
    ),
    cc AS (
      SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id
    )
    SELECT
      doc_id,
      cluster_id,
      count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
      doc_id = cluster_id AS is_canonical
    FROM cc
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(spark, sf_dir)
    edges = lsh_candidate_edges(sig)
    cc = connected_components(docs.select("doc_id"), edges)
    w = Window.partitionBy("cluster_id")
    return cc.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )
