"""Product quantization for the embedding lake (SURVEY.md §2.12 family).

PQ splits each 64-d vector into 8 contiguous 8-d subvectors and replaces
every subvector with the index of its nearest codebook centroid: 64
floats (256 bytes) become 8 nibbles (one BIGINT here) — a 32× footprint
cut that still supports asymmetric-distance search (query-to-centroid
lookup tables), the standard companion to an IVF coarse quantizer
(IVF-PQ).

The codebook here is DETERMINISTIC LITERALS (6dp-rounded scaled sines,
the llm_ann_lsh hyperplane discipline) so the assignment is exactly
reproducible in DuckDB and the key stays hash-checked end to end; a
production deployment swaps in per-subspace k-means codebooks trained by
the operators/kmeans.py machinery (the same stand-in→trained split as
llm_ann_ivf → llm_ann_ivf_trained).  Every distance is the identical
expression tree in both engines: float32 elements promote exactly to
double, literals parse to bit-identical doubles, so the argmin indices
match bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreaming_spark.io import load_table
from kafkastreaming_spark.registry import query

N_SUB = 8  # subspaces
SUB_DIM = 8  # dims per subspace
N_CENT = 16  # centroids per subspace (4-bit codes)


def _codebook() -> list[list[list[float]]]:
    """codebook[s][k][d]: 6dp-rounded scaled sines in the data's ±0.5
    envelope — deterministic, parses to bit-identical doubles in both
    engines."""
    return [
        [
            [
                round(0.4 * math.sin(100 + s * 256 + k * 16 + d), 6)
                for d in range(SUB_DIM)
            ]
            for k in range(N_CENT)
        ]
        for s in range(N_SUB)
    ]


_CB = _codebook()


def _dist_sq(vcol: str, s: int, k: int, elem_fmt: str) -> str:
    """Rank-equivalent squared distance: ‖c‖² − 2·v·c (the per-row ‖v_s‖²
    term is constant within a subspace and drops from the argmin).  No
    power() — Math.pow is the scalar slow path at 16 calls/subspace/row —
    and ‖c‖² folds to one Python-computed literal that parses to the
    identical double in both engines."""
    cc = 0.0
    dots = []
    for d in range(SUB_DIM):
        idx = s * SUB_DIM + d + 1
        c = _CB[s][k][d]
        cc += c * c
        dots.append(f"{elem_fmt.format(v=vcol, i=idx)} * {c!r}")
    return f"{cc!r} - 2.0 * ({' + '.join(dots)})"


def _code_expr(vcol: str, s: int, list_fn: str, pos_fn: str, min_fn: str, elem_fmt: str) -> str:
    dists = ", ".join(_dist_sq(vcol, s, k, elem_fmt) for k in range(N_CENT))
    lst = f"{list_fn}({dists})"
    return f"CAST({pos_fn}({lst}, {min_fn}({lst})) - 1 AS INT)"


def _spark_code(s: int) -> str:
    return _code_expr(
        "embedding", s, "array", "array_position", "array_min",
        "CAST(element_at({v}, {i}) AS DOUBLE)",
    )


def _duck_code(s: int) -> str:
    return _code_expr(
        "embedding", s, "list_value", "list_position", "list_min",
        "CAST({v}[{i}] AS DOUBLE)",
    )


_PACK_SPARK = " + ".join(
    f"(CAST(c{s} AS BIGINT) * {1 << (4 * s)})" for s in range(N_SUB)
)
_PACK_DUCK = _PACK_SPARK  # identical integer arithmetic


@query(
    "llm_pq_encode",
    oracle=f"""
    WITH coded AS (
      SELECT vec_id,
             {', '.join(f'{_duck_code(s)} AS c{s}' for s in range(N_SUB))}
      FROM embeddings
    )
    SELECT vec_id,
           {', '.join(f'c{s}' for s in range(N_SUB))},
           CAST({_PACK_DUCK} AS BIGINT) AS pq_code
    FROM coded
    """,
)
def llm_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantize every embedding: per 8-d subvector, the index of
    the nearest of 16 codebook centroids; the 8 nibbles pack into one
    BIGINT ``pq_code`` (the row a PQ-compressed vector lake actually
    stores — 32× smaller than the float payload).

    Map-only: the whole encode is a per-row expression battery (8×16
    literal-centroid distances, whole-stage-codegen'd JVM arithmetic —
    no UDF, no shuffle, no state), so at 100 TB it runs at scan speed
    and parallelizes embarrassingly.  Argmin is array_position of the
    array_min — first-match semantics in BOTH engines, and the distance
    doubles are bit-identical (identical expression trees over exactly-
    promoted float32), so ties resolve identically."""
    emb = load_table(spark, sf_dir, "embeddings")
    coded = emb.select(
        "vec_id",
        *[F.expr(_spark_code(s)).alias(f"c{s}") for s in range(N_SUB)],
    )
    return coded.select(
        "vec_id",
        *[f"c{s}" for s in range(N_SUB)],
        F.expr(_PACK_SPARK).cast("long").alias("pq_code"),
    )
