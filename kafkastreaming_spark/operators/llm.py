"""LLM-training-data pipeline operators (SURVEY.md §2.11).

Dedup, similarity search, text analysis over the ``documents`` /
``embeddings`` tables — the north-star extensions a 100 TB pretraining
pipeline needs.

Scale design notes (per operator, see docstrings):

* exact dedup — hash-groupBy: one shuffle on ``md5(text)``; at 100 TB
  the hash key distributes uniformly, no skew.
* exact Jaccard — this corpus has a 31-token vocabulary, so a token set
  is one 64-bit bitmask and J(A,B) = popcount(a&b)/popcount(a|b) in pure
  integer math (cross-engine deterministic, no float summation at all).
  The candidate pair space is pruned with the exact size-ratio bound
  min(|A|,|B|)/max ≥ t, spelled in integer arithmetic (``4·n_a ≤ 5·n_b``)
  so both engines prune identically.  With a real (open) vocabulary this
  exact path is replaced by ``llm_minhash_lsh`` — O(n²) pair generation
  does not survive 100 TB; MinHash banding does.
* top-k similarity — brute-force cosine with the query side broadcast:
  scan-shaped (one pass over N vectors per query batch), the right
  baseline; the scale path adds an IVF/LSH bucket join to cut the scan.
* TF-IDF — two shuffles (term stats, doc stats) + a broadcast join of
  the tiny term-df dimension.

Determinism (SURVEY.md §5.4): every dot product is a sequential
left-to-right double fold in BOTH engines (Spark ``aggregate`` lambda ≡
DuckDB ``list_dot_product`` over pre-cast DOUBLE lists), then rounded to
6dp; rankings order by the *rounded* score with a unique-key tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreaming_spark.hashing import H2_DUCK, H2_SPARK, H_DUCK, H_SPARK
from kafkastreaming_spark.io import load_table
from kafkastreaming_spark.memo import memo, release_local_checkpoint
from kafkastreaming_spark.registry import query

# Sequential double fold for ||v||² and <a,b> — mirrors DuckDB
# list_dot_product over list_transform(..., CAST AS DOUBLE) exactly.
_SQ_NORM = (
    "aggregate(transform({v}, x -> CAST(x AS DOUBLE)), CAST(0 AS DOUBLE),"
    " (acc, x) -> acc + x * x)"
)
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
)


@query(
    "llm_exact_dedup",
    oracle="""
    SELECT md5(text) AS text_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonical doc (min doc_id) per md5(text) + copy count.

    Downstream keeps rows where doc_id == keep_doc_id.  One shuffle on
    the uniform hash key — the 100 TB spelling is identical."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


_JACCARD_ORACLE = """
    WITH dtoks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    vocab AS (
      SELECT token, row_number() OVER (ORDER BY token) - 1 AS idx
      FROM (SELECT DISTINCT token FROM dtoks)
    ),
    masks AS (
      -- bit 63 spelled as the two's-complement min-int literal: DuckDB's
      -- `1::BIGINT << 63` raises OutOfRangeException while Spark's
      -- shiftleft wraps, so a 64-token vocabulary (in-contract: the
      -- Spark-side guard admits len(vocab) <= 64) must not reach the
      -- shift operator (ADVICE r10).
      SELECT doc_id,
             COUNT(*) AS n,
             CAST(SUM(CASE WHEN idx = 63
                           THEN (-9223372036854775807::BIGINT - 1)
                           ELSE 1::BIGINT << idx END) AS BIGINT) AS mask
      FROM dtoks JOIN vocab USING (token)
      GROUP BY doc_id
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(a.mask & b.mask) AS BIGINT) AS n_inter,
             a.n + b.n - CAST(bit_count(a.mask & b.mask) AS BIGINT) AS n_union
      FROM masks a JOIN masks b
        ON a.doc_id < b.doc_id
       AND a.n * 4 <= b.n * 5 AND b.n * 4 <= a.n * 5
    )
    SELECT doc_a, doc_b, n_inter, n_union,
           CAST(ROUND(n_inter * 1000000.0 / n_union) AS BIGINT) / 1e6
             AS jaccard
    FROM pairs
    WHERE CAST(n_inter AS DOUBLE) / n_union >= 0.8
"""


def _jaccard_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc (n, 64-bit token mask, rarity-ordered prefix, prefix mask),
    cached ONCE per (session, sf_dir).

    The vocabulary collect and the groupBy materialization are paid once
    and shared by both sides of the candidate self-join and by bench
    repeats — per-invocation cache+count cost a full extra pass per run
    (2.02→3.79 s driver-visible in r2) and leaked executor storage."""

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        dtoks = docs.select(
            "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token")
        )
        # Vocabulary is bounded by the 64-bit mask width — driver-side
        # metadata by construction, like a broadcast dimension.
        tok_df = dtoks.groupBy("token").agg(F.count(F.lit(1)).alias("df")).collect()
        if len(tok_df) > 64:
            raise ValueError(
                f"vocabulary of {len(tok_df)} tokens exceeds the 64-bit mask; "
                "use llm_minhash_lsh for open vocabularies"
            )
        by_alpha = sorted(r["token"] for r in tok_df)
        alpha_idx = {t: i for i, t in enumerate(by_alpha)}
        by_rarity = sorted(tok_df, key=lambda r: (r["df"], r["token"]))
        vocab = spark.createDataFrame(
            [
                (r["token"], alpha_idx[r["token"]], rank)
                for rank, r in enumerate(by_rarity)
            ],
            "token string, idx int, rare int",
        )
        per_doc = (
            dtoks.join(F.broadcast(vocab), "token")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), idx)")).alias("mask"),
                F.sort_array(F.collect_list("rare")).alias("rares"),
            )
            # prefix length n - ceil(0.8n) + 1, in exact integer math; the
            # prefix is carried as a 64-bit mask over rarity ranks so all
            # downstream pair math is codegen'd integer ops, never array ops
            .withColumn(
                "prefix",
                F.expr("slice(rares, 1, CAST(n - ((4*n + 4) div 5) + 1 AS INT))"),
            )
            .withColumn(
                "pmask",
                F.expr(
                    "aggregate(prefix, CAST(0 AS BIGINT),"
                    " (acc, r) -> acc | shiftleft(CAST(1 AS BIGINT), r))"
                ),
            )
            .select("doc_id", "n", "mask", "prefix", "pmask")
            .cache()
        )
        per_doc.count()
        return per_doc

    return memo(spark, sf_dir, "jaccard_per_doc", build)


@query("llm_jaccard_dedup", oracle=_JACCARD_ORACLE)
def llm_jaccard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with token-set Jaccard ≥ 0.8 — exact, via prefix
    filter + bitmask verify.

    Candidate generation is the AllPairs/PPJoin prefix filter: order
    each doc's tokens rarest-first (ascending document frequency) and
    keep the first ``n - ceil(0.8*n) + 1``; any pair with J ≥ 0.8 must
    share a token inside both prefixes (the smallest common token in
    canonical order sits within the first ``n - |A∩B| + 1 ≤ prefix``
    positions of each side), so an equi-join on prefix tokens has full
    recall — no O(n²) nested-loop anywhere in the plan.  ``ceil(0.8*n)``
    is computed as integer ``(4n+4) div 5``: the float spelling is wrong
    at n=5 (0.8 is not binary-representable).  Verification packs token
    sets into a 64-bit mask (this corpus's vocabulary is ≤ 64 tokens;
    the vocabulary is bounded metadata, collected once and broadcast —
    no global sort window) so intersection/union are exact popcounts.
    The open-vocabulary scale path is ``llm_minhash_lsh``; the prefix
    join itself is the standard exact-similarity-join shape at scale."""
    per_doc = _jaccard_per_doc(spark, sf_dir)
    pref = per_doc.select("doc_id", "n", "mask", "pmask", F.explode("prefix").alias("rare"))
    a = pref.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("n_a"),
        F.col("mask").alias("mask_a"),
        F.col("pmask").alias("pmask_a"),
        "rare",
    )
    b = pref.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("n_b"),
        F.col("mask").alias("mask_b"),
        F.col("pmask").alias("pmask_b"),
        "rare",
    )
    pairs = (
        a.join(b, "rare")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            # exact size-ratio bound: J ≥ 0.8 ⇒ 4·max ≤ 5·min
            & (F.col("n_a") * 4 <= F.col("n_b") * 5)
            & (F.col("n_b") * 4 <= F.col("n_a") * 5)
        )
        # shuffle-free dedup of multi-token collisions: keep the pair only
        # at its smallest shared prefix token = lowest set bit of the
        # prefix-mask AND (pure integer math, whole-stage codegen)
        .filter(
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), rare) = "
                "((pmask_a & pmask_b) & -(pmask_a & pmask_b))"
            )
        )
        .select(
            "doc_a",
            "doc_b",
            F.expr("CAST(bit_count(mask_a & mask_b) AS BIGINT)").alias("n_inter"),
            (F.col("n_a") + F.col("n_b")).alias("n_ab"),
        )
    )
    return (
        pairs.withColumn("n_union", F.col("n_ab") - F.col("n_inter"))
        .withColumn("jaccard_raw", F.col("n_inter").cast("double") / F.col("n_union"))
        .filter(F.col("jaccard_raw") >= 0.8)
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            "n_union",
            # tie-safe 6dp ratio (win_percentiles lesson, r8 sweep)
            (
                F.round(F.col("n_inter") * 1000000.0 / F.col("n_union"))
                .cast("long")
                / 1e6
            ).alias("jaccard"),
        )
    )


_MINHASH_LSH_ORACLE = """
    WITH dtoks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    vocab AS (
      SELECT token, row_number() OVER (ORDER BY token) - 1 AS idx
      FROM (SELECT DISTINCT token FROM dtoks)
    ),
    masks AS (
      -- bit-63-safe spelling (same rationale as _JACCARD_ORACLE above):
      -- DuckDB's shift raises at idx=63 but a 64-token vocabulary is
      -- in-contract for the mask regime (vocab_n <= 64), so bit 63 is
      -- spelled as the min-int literal (ADVICE r10).
      SELECT doc_id,
             COUNT(*) AS n,
             CAST(SUM(CASE WHEN idx = 63
                           THEN (-9223372036854775807::BIGINT - 1)
                           ELSE 1::BIGINT << idx END) AS BIGINT) AS mask
      FROM dtoks JOIN vocab USING (token)
      GROUP BY doc_id
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.n + b.n - 2 * CAST(bit_count(a.mask & b.mask) AS BIGINT)
               AS num,
             a.n + b.n - CAST(bit_count(a.mask & b.mask) AS BIGINT) AS den
      FROM masks a JOIN masks b ON a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(ROUND(num * 1000000.0 / den) AS BIGINT) / 1e6
             AS jaccard_dist
    FROM pairs WHERE num * 2 <= den
"""


@query("llm_minhash_lsh", oracle=_MINHASH_LSH_ORACLE)
def llm_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate near-dup via MinHash LSH.

    Oracle note (r10, VERDICT r9 item 2): on the fixture corpora the
    bounded-vocabulary regime below is EXACT (bitmask popcount — no
    randomness reaches the output), so the mask-based DuckDB oracle
    hash-matches as-is; the distance is emitted tie-safely as
    round(num·10⁶/den)/10⁶ with the ≤0.5 cut applied in exact integer
    math (2·num ≤ den) on both engines.  The open-vocabulary ml path is
    the only randomized branch and is never taken at oracle SF (vocab
    ≤ 64 is checked first).

    This is the 100 TB dedup path: banding turns the O(n²) pair space
    into per-bucket joins — candidate volume scales with collision
    count, not n².  Here: HashingTF(binary) → MinHashLSH(seed=42) →
    approxSimilarityJoin at Jaccard distance ≤ 0.5.

    REGIME GATE (r8, probe-driven): banding's premise is SPARSE
    collisions.  On a bounded-vocabulary corpus (this fixture: ~40
    distinct tokens) every doc shares most tokens with every other, so
    every band of every table collides and the candidate graph is the
    COMPLETE graph — measured 614 s at 5 000 docs through ml's
    per-candidate distance UDF, quadratic in n with a catastrophic
    constant.  When the global vocabulary fits 64 bits (counted with
    one cheap distinct-agg), the SAME pair set is produced exactly by
    the llm_jaccard_dedup bitmask discipline — a broadcast
    whole-stage-codegen popcount pair scan, ~3 s at the same scale and
    recall 1.0 by construction (it is exact).  Open vocabulary — the
    case banding exists for — keeps the ml path."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("tokens")
    )
    vocab_n = (
        docs.select(F.explode("tokens").alias("t")).distinct().count()
    )
    if vocab_n <= _LSH_MASK_MAX_VOCAB:
        per_doc = _jaccard_per_doc(spark, sf_dir)
        a = per_doc.select(
            F.col("doc_id").alias("doc_a"),
            F.col("n").alias("n_a"),
            F.col("mask").alias("mask_a"),
        )
        b = per_doc.select(
            F.col("doc_id").alias("doc_b"),
            F.col("n").alias("n_b"),
            F.col("mask").alias("mask_b"),
        )
        inter = F.expr("CAST(bit_count(mask_a & mask_b) AS BIGINT)")
        num = F.col("n_a") + F.col("n_b") - F.lit(2) * inter  # union − inter
        den = F.col("n_a") + F.col("n_b") - inter  # union
        return (
            a.crossJoin(F.broadcast(b))
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", num.alias("num"), den.alias("den"))
            # dist ≤ 0.5 in exact integer math; 6dp tie-safe ratio
            .filter(F.col("num") * 2 <= F.col("den"))
            .select(
                "doc_a",
                "doc_b",
                (
                    F.round(F.col("num") * 1000000.0 / F.col("den"))
                    .cast("long")
                    / 1e6
                ).alias("jaccard_dist"),
            )
        )
    feats = HashingTF(
        inputCol="tokens", outputCol="features", numFeatures=256, binary=True
    ).transform(docs)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    ).fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.5, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )


@query(
    "llm_embed_quantize",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      FROM embeddings
    ),
    stats AS (
      SELECT vec_id, ve,
             list_aggregate(ve, 'min') AS mn,
             list_aggregate(ve, 'max') AS mx
      FROM e
    )
    SELECT vec_id,
           ROUND(mn, 6) AS qmin,
           ROUND(mx, 6) AS qmax,
           array_to_string(
             list_transform(ve, x -> CAST(
               CASE WHEN mx = mn THEN 0
                    ELSE floor((x - mn) * 255 / (mx - mn)) END AS INTEGER)),
             ',') AS codes_csv
    FROM stats
    """,
)
def llm_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8-range quantization (min/max affine, 256 levels) —
    the storage-compression step of a vector lake: 64 float32 → 64 bytes
    + two scalars, a 4× footprint cut before any index is built.

    Map-side only (no shuffle, no UDF): min/max + the affine transform
    are array expressions per row.  Cross-engine exactness: both engines
    evaluate the identical IEEE-754 expression tree on identical doubles,
    so the floored codes match bit for bit; the degenerate constant
    vector maps to code 0 to avoid NaN.  Codes emit as a canonical CSV
    (driver-hashable; arrays are not)."""
    emb = load_table(spark, sf_dir, "embeddings")
    stats = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("ve"),
    ).select(
        "vec_id", "ve", F.array_min("ve").alias("mn"), F.array_max("ve").alias("mx")
    )
    return stats.select(
        "vec_id",
        F.round("mn", 6).alias("qmin"),
        F.round("mx", 6).alias("qmax"),
        F.array_join(
            F.expr(
                "transform(ve, x -> CAST(CASE WHEN mx = mn THEN 0"
                " ELSE floor((x - mn) * 255 / (mx - mn)) END AS INT))"
            ),
            ",",
        ).alias("codes_csv"),
    )


@query(
    "llm_topk_similar",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, ve AS qv FROM e WHERE vec_id < 5),
    scored AS (
      SELECT query_id, vec_id,
             ROUND(list_dot_product(qv, ve)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(ve, ve))),
                   6) AS cos_sim
      FROM q CROSS JOIN e
      WHERE vec_id <> query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id) AS rnk
      FROM scored
    )
    SELECT query_id, vec_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
    """,
)
def llm_topk_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 per query vector (vec_id < 5), rounded
    6dp, ranked on the rounded score with vec_id tiebreak.

    The query side is broadcast, so this is one scan over the corpus —
    the exact-ANN baseline.  Scale path: pre-bucket vectors (IVF
    centroids or random hyperplanes), join query→bucket, scan only
    colliding buckets."""
    emb = load_table(spark, sf_dir, "embeddings")
    # norms once per side before the pair join (r7 hoist: the inline
    # spelling re-folded ||v|| per (query, vector) pair; value tree
    # dot/(√a·√b) unchanged ⇒ 6dp scores and oracle hashes identical)
    corpus = emb.select(
        "vec_id",
        F.col("embedding").alias("ve"),
        F.sqrt(F.expr(_SQ_NORM.format(v="embedding"))).alias("nv"),
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.sqrt(F.expr(_SQ_NORM.format(v="embedding"))).alias("qnv"),
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                F.expr(_DOT.format(a="qv", b="ve"))
                / (F.col("qnv") * F.col("nv")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "vec_id", "cos_sim", "rnk")
    )


@query(
    "llm_text_stats",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(ROUND(SUM(CAST(len(string_split(text, ' ')) AS DOUBLE))
                      * 1000000.0 / COUNT(*)) AS BIGINT) / 1e6
             AS avg_tokens,
           CAST(ROUND(SUM(CAST(n_chars AS DOUBLE)) * 1000000.0 / COUNT(*))
                AS BIGINT) / 1e6 AS avg_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stats per (lang, source): doc count, mean whitespace-token
    count, mean char count.  Integer sums stay exact in double (< 2^53),
    so the unordered parallel sum is deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        # tie-safe 6dp averages: SUM*1e6/COUNT snapped to an integer
        (
            F.round(
                F.sum(F.size(F.split("text", " ")).cast("double"))
                * 1000000.0
                / F.count(F.lit(1))
            ).cast("long")
            / 1e6
        ).alias("avg_tokens"),
        (
            F.round(
                F.sum(F.col("n_chars").cast("double"))
                * 1000000.0
                / F.count(F.lit(1))
            ).cast("long")
            / 1e6
        ).alias("avg_chars"),
    )


@query(
    "llm_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT doc_id, term,
             ROUND(tf * ln(CAST(n AS DOUBLE) / df), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rn
      FROM scored
    )
    SELECT doc_id, term, tfidf FROM ranked WHERE rn = 1
    """,
)
def llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TF-IDF term per document, formula pinned to ``tf · ln(N/df)``
    (raw term count, natural log), ranked on the 6dp-rounded score with
    term tiebreak.

    Plan shape: explode → two hash aggs (term-per-doc, df) + a broadcast
    join of the tiny df dimension → per-doc window.  N comes from a
    one-row count, not a driver collect of data rows."""
    # r16: df derives from the tf table instead of a second explode+
    # distinct pass over the corpus (a spread() on the scan was A/B'd
    # flat and reverted in the final consolidation — the exchange reuse
    # below is the real win here) — tf already holds one row per (doc, term), so
    # count(*) per term IS countDistinct(doc_id); Catalyst reuses tf's
    # exchange for both consumers (ReusedExchange), so the explode+partial
    # agg run once.  (A localCheckpoint pin was A/B'd and LOST to exchange
    # reuse: 0.67 vs 0.52 s — the write+read of the pin costs more.)
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar dimension; exact and tiny
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df_), "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "term", "tfidf")
    )


@query(
    "llm_multimodal",
    oracle="""
    SELECT d.doc_id, d.lang, e.label,
           ROUND(sqrt(list_dot_product(
                   list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                   list_transform(e.embedding, x -> CAST(x AS DOUBLE)))), 6) AS l2_norm,
           ROUND(CAST(d.n_chars AS DOUBLE) / len(e.embedding), 6) AS chars_per_dim
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def llm_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal row: text metadata ⨝ vector (doc_id = vec_id) with a
    per-row L2 norm and chars-per-dimension ratio — the join pattern for
    any text+embedding (or text+image-feature) table.

    Equi join on the shared key; at 100 TB both sides bucket by doc_id
    so the join is co-located (no shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id",
        "lang",
        "label",
        F.round(F.sqrt(F.expr(_SQ_NORM.format(v="embedding"))), 6).alias("l2_norm"),
        F.round(F.col("n_chars").cast("double") / F.size("embedding"), 6).alias(
            "chars_per_dim"
        ),
    )


@query(
    "llm_embed_centroid",
    oracle="""
    WITH ex AS (
      SELECT label,
             unnest(generate_series(0, len(embedding) - 1)) AS pos,
             unnest(list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS q
      FROM embeddings
    )
    SELECT label, pos,
           COUNT(*) AS n_vecs,
           ROUND((CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                 / 1000000.0, 6) AS centroid
    FROM ex GROUP BY label, pos
    """,
)
def llm_embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (class centroids), one row per
    (label, dimension) — the building block of nearest-centroid
    classification and the exact-SQL twin of the k-means assignment
    step (`llm_ivf_train` is the iterative version).

    Cross-engine determinism: per-dimension float sums are order-
    dependent, so each component is quantized to an exact micro-unit
    BIGINT first (1e-6 grid, well inside float32's ~1e-7 resolution at
    |x|<1); the integer sums are associative, and the final divide
    runs the identical IEEE double expression in both engines.

    Scale: posexplode fans 64x but every row is 3 scalars; the shuffle
    key (label, pos) has |labels|*64 values with uniform load — the
    partial aggregate collapses each map partition to that many rows
    before the exchange, so network volume is O(labels * dims *
    partitions), independent of corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        F.posexplode(
            F.expr(
                "transform(embedding,"
                " x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
            )
        ).alias("pos", "q"),
    )
    return ex.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            (F.sum("q").cast("double") / F.count(F.lit(1)).cast("double"))
            / F.lit(1000000.0),
            6,
        ).alias("centroid"),
    )


# --- Deterministic MinHash (hash-checkable twin of llm_minhash_lsh) ------
#
# 32 affine permutations pi_i(h) = (a_i*h + b_i) mod 2^31-1 over the
# portable 60-bit token hash reduced mod 2^31-1.  The (a_i, b_i) are
# derived from md5 of a fixed label at import time, so BOTH engines see
# the same literal constants and replay bit-identical signatures —
# unlike pyspark.ml's MinHashLSH (rows-only), this variant is fully
# DuckDB-oracle-checkable.  a_i*h < 2^31 * 2^31 = 2^62: no int64
# overflow in either engine.
# llm_minhash_lsh regime gate: vocab sizes that fit a 64-bit mask take
# the exact popcount pair scan; larger vocabularies take ml MinHashLSH
_LSH_MASK_MAX_VOCAB = 64

_MH_K = 32  # signature length
_MH_BANDS = 8  # 8 bands x 4 rows: P(band collision | J) = 1-(1-J^4)^8
_MH_MOD = (1 << 31) - 1


def _mh_constants() -> tuple[list[int], list[int]]:
    import hashlib

    def draw(label: str, lo: int) -> int:
        h = int(hashlib.md5(label.encode()).hexdigest()[:15], 16)
        return lo + h % (_MH_MOD - lo)

    a = [draw(f"minhash-a-{i}", 1) for i in range(_MH_K)]
    b = [draw(f"minhash-b-{i}", 0) for i in range(_MH_K)]
    return a, b


_MH_A, _MH_B = _mh_constants()

_MINHASH_DET_ORACLE = f"""
    WITH d AS (
      SELECT doc_id,
             list_distinct(list_transform(string_split(text, ' '),
               t -> {H_DUCK.format(x='t')}
                    % {_MH_MOD})) AS hs
      FROM documents
    ),
    th AS (SELECT doc_id, unnest(hs) AS h31 FROM d),
    perm(i, a, b) AS (
      VALUES {", ".join(f"({i}, {_MH_A[i]}, {_MH_B[i]})" for i in range(_MH_K))}
    ),
    sig AS (
      SELECT doc_id, perm.i, MIN((perm.a * th.h31 + perm.b) % {_MH_MOD}) AS s
      FROM th, perm
      GROUP BY doc_id, perm.i
    ),
    band AS (
      SELECT doc_id, i // 4 AS band,
             string_agg(CAST(s AS VARCHAR), ',' ORDER BY i) AS bkey
      FROM sig
      GROUP BY doc_id, i // 4
    ),
    sstr AS (
      SELECT doc_id, string_agg(CAST(s AS VARCHAR), ',' ORDER BY i) AS sigstr
      FROM sig GROUP BY doc_id
    ),
    bandx AS (
      SELECT b.doc_id, b.band, b.bkey, s.sigstr
      FROM band b JOIN sstr s USING (doc_id)
    ),
    rep AS (
      SELECT band, bkey, doc_id AS rep_id
      FROM (SELECT band, bkey, doc_id,
                   row_number() OVER (PARTITION BY band, bkey
                                      ORDER BY doc_id) AS rk
            FROM bandx)
      WHERE rk <= 2
    ),
    nb AS (
      SELECT doc_id,
             lag(doc_id) OVER (PARTITION BY band, bkey
                               ORDER BY sigstr, doc_id) AS prev_id
      FROM bandx
    ),
    cand AS (
      SELECT DISTINCT b.doc_id, r.rep_id
      FROM bandx b JOIN rep r ON b.band = r.band AND b.bkey = r.bkey
      WHERE b.doc_id > r.rep_id
      UNION
      SELECT DISTINCT greatest(doc_id, prev_id) AS doc_id,
                      least(doc_id, prev_id) AS rep_id
      FROM nb WHERE prev_id IS NOT NULL AND prev_id <> doc_id
    ),
    scored AS (
      SELECT c.doc_id, c.rep_id,
             CAST(len(list_intersect(dd.hs, dr.hs)) AS BIGINT) AS n_inter,
             CAST(len(dd.hs) + len(dr.hs)
                  - len(list_intersect(dd.hs, dr.hs)) AS BIGINT) AS n_union
      FROM cand c
      JOIN d dd ON dd.doc_id = c.doc_id
      JOIN d dr ON dr.doc_id = c.rep_id
    ),
    dup AS (
      SELECT doc_id, rep_id, n_inter, n_union,
             CAST(n_inter AS DOUBLE) / n_union AS jac_raw,
             row_number() OVER (PARTITION BY doc_id ORDER BY rep_id) AS rk
      FROM scored
      WHERE CAST(n_inter AS DOUBLE) / n_union >= 0.8
    )
    SELECT doc_id, rep_id AS keep_doc_id, n_inter, n_union,
           CAST(ROUND(n_inter * 1000000.0 / n_union) AS BIGINT) / 1e6
             AS jaccard
    FROM dup WHERE rk = 1
"""


def _minhash_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc (distinct 31-bit token-hash array, 8 band-key strings),
    cached once per (session, sf_dir) — see llm_minhash_det docstring."""

    def build() -> DataFrame:
        a_lit = f"array({', '.join(str(x) for x in _MH_A)})"
        b_lit = f"array({', '.join(str(x) for x in _MH_B)})"
        per_doc = (
            load_table(spark, sf_dir, "documents")
            .select(
                "doc_id",
                F.expr(
                    "array_distinct(transform(split(text, ' '), t -> "
                    + H_SPARK.format(x="t")
                    + f" % {_MH_MOD}))"
                ).alias("hs"),
            )
            .withColumn(
                "sig",
                F.expr(
                    f"transform(sequence(0, {_MH_K - 1}), i -> "
                    f" array_min(transform(hs, h ->"
                    f"  (element_at({a_lit}, i+1) * h"
                    f"   + element_at({b_lit}, i+1)) % {_MH_MOD})))"
                ),
            )
            .select(
                "doc_id",
                "hs",
                F.expr("concat_ws(',', sig)").alias("sigstr"),
                F.expr(
                    f"transform(sequence(0, {_MH_BANDS - 1}), b ->"
                    " concat_ws(',', slice(sig, b*4 + 1, 4)))"
                ).alias("bkeys"),
            )
            .cache()
        )
        per_doc.count()
        return per_doc

    return memo(spark, sf_dir, "minhash_per_doc", build)


@query("llm_minhash_det", oracle=_MINHASH_DET_ORACLE)
def llm_minhash_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MinHash LSH dedup (J >= 0.8 vs band representative),
    fully hash-checkable: portable md5 token hashes + literal affine
    permutations replayed identically by the DuckDB oracle.

    Output: one row per duplicate doc -> (doc_id, keep_doc_id = the
    smallest-id band representative it near-matches, exact Jaccard over
    the shared 31-bit hash universe).  Downstream keeps docs that never
    appear in the doc_id column.

    Scale shape (the 100 TB path): the k=32 signature is MAP-ONLY —
    ``transform(sequence(0,31), i -> array_min(...))`` over the per-doc
    distinct token-hash array, zero shuffles.  Banding (8 bands x 4
    rows) hashes each doc into 8 buckets; each doc is rescored only
    against (a) its bucket's two smallest-id representatives and (b) its
    predecessor in full-signature sort order within the bucket (near-
    identical docs sort adjacent, so duplicate chains are caught even
    when the bucket reps are dissimilar third docs) — <= 24 candidates
    per doc, O(n) total, vs the O(sum bucket^2) all-pairs-in-bucket
    spelling that melts on duplicate-heavy corpora (this fixture at
    sf0.1: 23.8M bucket pairs / max bucket 2582 docs; this shape
    generates ~60k).  Measured recall of the exact J>=0.8 dup set:
    0.94 at sf0.001 / 0.92 at sf0.01 (pinned >= 0.9 in
    tests/test_pipeline.py); transitive merging belongs to
    llm_dedup_clusters.  The per-doc signature table is memo-cached:
    higher-order lambdas are CodegenFallback (interpreted), and without
    the cache projection collapse inlines the 32-permutation expression
    into every downstream branch — measured 8.8 s -> 1.3 s at sf0.1.
    Both engines replay identical candidates and rescore, so the key is
    exactly hash-checked, unlike pyspark.ml's MinHashLSH (rows-only)."""
    per_doc = _minhash_per_doc(spark, sf_dir)
    bands = per_doc.select(
        "doc_id", "sigstr", F.posexplode("bkeys").alias("band", "bkey")
    )
    wr = Window.partitionBy("band", "bkey").orderBy("doc_id")
    reps = (
        bands.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 2)
        .select("band", "bkey", F.col("doc_id").alias("rep_id"))
    )
    star = (
        bands.join(reps, ["band", "bkey"])
        .filter(F.col("doc_id") > F.col("rep_id"))
        .select("doc_id", "rep_id")
    )
    # second candidate family: sort each bucket by full signature and
    # compare neighbors — near-identical docs sort adjacent, so chains of
    # duplicates are caught even when the bucket's min-id rep is a
    # dissimilar third doc.  Still O(1) extra candidates per (doc, band).
    wb = Window.partitionBy("band", "bkey").orderBy("sigstr", "doc_id")
    neigh = (
        bands.withColumn("prev_id", F.lag("doc_id").over(wb))
        .filter(F.col("prev_id").isNotNull() & (F.col("prev_id") != F.col("doc_id")))
        .select(
            F.greatest("doc_id", "prev_id").alias("doc_id"),
            F.least("doc_id", "prev_id").alias("rep_id"),
        )
    )
    cand = star.union(neigh).distinct()
    dd = per_doc.select("doc_id", F.col("hs").alias("hs_d"))
    dr = per_doc.select(F.col("doc_id").alias("rep_id"), F.col("hs").alias("hs_r"))
    scored = (
        cand.join(dd, "doc_id")
        .join(dr, "rep_id")  # rep side is corpus-scale at 100 TB: no broadcast hint
        .withColumn(
            "n_inter",
            F.expr("CAST(size(array_intersect(hs_d, hs_r)) AS BIGINT)"),
        )
        .withColumn(
            "n_union",
            F.expr("CAST(size(hs_d) + size(hs_r) AS BIGINT)") - F.col("n_inter"),
        )
        .withColumn("jac_raw", F.col("n_inter").cast("double") / F.col("n_union"))
        .filter(F.col("jac_raw") >= 0.8)
    )
    w = Window.partitionBy("doc_id").orderBy("rep_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("rep_id").alias("keep_doc_id"),
            "n_inter",
            "n_union",
            (
                F.round(F.col("n_inter") * 1000000.0 / F.col("n_union"))
                .cast("long")
                / 1e6
            ).alias("jaccard"),
        )
    )


# Bloom membership parameters (llm_bloom_membership): m bits, k probes
# via Kirsch–Mitzenmacher double hashing p_i = (H + i·H2) mod m — two
# independent 60-bit md5 halves generate all k positions from ONE md5
# call per document, the standard production construction.
_BLOOM_M = 16_384
_BLOOM_K = 3

_BLOOM_ORACLE = f"""
    WITH hashed AS (
      SELECT doc_id,
             {H_DUCK.format(x='text')} AS h,
             {H2_DUCK.format(x='text')} AS h2
      FROM documents
    ),
    a AS (SELECT * FROM hashed WHERE doc_id % 2 = 0),
    b AS (SELECT * FROM hashed WHERE doc_id % 2 = 1),
    a_pos AS (
      SELECT DISTINCT (h + t.range * h2) % {_BLOOM_M} AS pos
      FROM a, range({_BLOOM_K}) t
    ),
    b_pos AS (
      SELECT DISTINCT doc_id, (h + t.range * h2) % {_BLOOM_M} AS pos
      FROM b, range({_BLOOM_K}) t
    ),
    probe AS (
      SELECT bp.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_pos,
             CAST(SUM(CASE WHEN ap.pos IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hit
      FROM b_pos bp LEFT JOIN a_pos ap USING (pos)
      GROUP BY bp.doc_id
    ),
    exact AS (
      SELECT DISTINCT b.doc_id
      FROM b JOIN a ON a.h = b.h AND a.h2 = b.h2
    )
    SELECT p.doc_id,
           p.n_hit = p.n_pos AS bloom_member,
           e.doc_id IS NOT NULL AS exact_member,
           (p.n_hit = p.n_pos) AND e.doc_id IS NULL AS is_fp
    FROM probe p LEFT JOIN exact e USING (doc_id)
"""


@query("llm_bloom_membership", oracle=_BLOOM_ORACLE)
def llm_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership screening with EXACT false-positive
    accounting: the even-doc_id half of the corpus builds an m-bit
    filter (k positions per doc via Kirsch–Mitzenmacher double hashing
    from one md5), the odd half probes it, and each probe is verdicted
    three ways — bloom_member (all k bits set), exact_member (120-bit
    content identity present in the build side), and is_fp (the bloom
    verdict the exact check refutes).  This is the admission-control
    primitive in front of expensive dedup: a Bloom pass drops the
    certain-negatives for bits-per-key cost, and the measured FP column
    is the quantity you size m/k against.

    Exactness: every position is integer arithmetic on the two 60-bit
    md5 halves ((H + i·H2) mod m — no float anywhere), so the filter,
    the probes, and both verdicts are bit-reproducible in both engines.

    Plan + scale: the bit set is a DISTINCT of ≤ k·|A| integers and the
    probe is an equi-join on the position column — chosen over a packed
    binary blob so the oracle stays exactly expressible; Spark's native
    blob path (bloom_filter_agg / might_contain) is exercised by
    join_bloom, and at 100 TB you broadcast that blob while THIS
    spelling's position table shuffles ≤ k·|A| ints (both sides prune
    to two columns before any join; the exact-identity join is a
    broadcast of |A| keys).  The hashed (doc_id, h, h2) projection is
    checkpointed so build, probe, and exact-verdict all read ONE fact
    scan (the agg_bitmap_native discipline), then materialized and
    unpersisted before returning."""
    docs, result = _bloom_membership_parts(spark, sf_dir)
    rows = result.collect()
    schema = result.schema
    # real release: localCheckpoint storage lives in persistentRdds,
    # which Dataset.unpersist never touches (ADVICE r11)
    release_local_checkpoint(docs)
    return spark.createDataFrame(rows, schema)


def _bloom_membership_parts(spark: SparkSession, sf_dir: str):
    """(checkpointed hashed projection, lazy verdict frame) — split out
    so the plan test can assert the one-scan shape before the key
    materializes and unpersists (the scan_cache/agg_bitmap_native
    pattern)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.expr(H_SPARK.format(x="text")).alias("h"),
            F.expr(H2_SPARK.format(x="text")).alias("h2"),
        )
        .localCheckpoint(eager=False)
    )
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    probes = F.array(
        *[
            ((F.col("h") + F.lit(i) * F.col("h2")) % _BLOOM_M).alias(f"p{i}")
            for i in range(_BLOOM_K)
        ]
    )
    a_pos = a.select(F.explode(probes).alias("pos")).distinct()
    b_pos = b.select("doc_id", F.explode(probes).alias("pos")).distinct()
    probe = (
        b_pos.join(F.broadcast(a_pos.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pos"),
            F.sum(F.when(F.col("hit").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_hit"),
        )
    )
    exact = (
        b.join(F.broadcast(a.select("h", "h2").distinct()), ["h", "h2"])
        .select("doc_id")
        .distinct()
        .withColumn("ex", F.lit(1))
    )
    result = (
        probe.join(F.broadcast(exact), "doc_id", "left")
        .select(
            "doc_id",
            (F.col("n_hit") == F.col("n_pos")).alias("bloom_member"),
            F.col("ex").isNotNull().alias("exact_member"),
            ((F.col("n_hit") == F.col("n_pos")) & F.col("ex").isNull()).alias(
                "is_fp"
            ),
        )
    )
    return docs, result
