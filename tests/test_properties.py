"""Property-based checks (hypothesis) for the cross-engine primitives the
oracle comparisons depend on.  These pin the *math*, independent of any
fixture: if one fails, some hash-checked key is wrong for some input the
fixtures merely failed to contain."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _h_py(s: str) -> int:
    """Python reference of the portable 60-bit hash (operators/pipeline.py)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), min_size=0, max_size=40))
def test_portable_hash_duckdb_matches_python(s):
    con = duckdb.connect()
    got = con.execute(
        "SELECT CAST('0x' || substr(md5(?), 1, 15) AS BIGINT)", [s]
    ).fetchone()[0]
    assert got == _h_py(s)
    con.close()


@settings(max_examples=200, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=30), min_size=1),
    st.sets(st.integers(min_value=0, max_value=30), min_size=1),
)
def test_bitmask_jaccard_equals_set_jaccard(a, b):
    """The 64-bit mask popcount math in llm_jaccard_dedup IS set Jaccard."""
    mask_a = sum(1 << i for i in a)
    mask_b = sum(1 << i for i in b)
    inter = bin(mask_a & mask_b).count("1")
    union = len(a) + len(b) - inter
    assert inter == len(a & b)
    assert union == len(a | b)
    assert inter / union == len(a & b) / len(a | b)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
        min_size=1,
        max_size=64,
    )
)
def test_sequential_fold_matches_duckdb_list_sum_of_squares(xs):
    """Spark `aggregate` folds left-to-right in double; DuckDB
    list_dot_product must produce the identical value for ||v||²."""
    con = duckdb.connect()
    acc = 0.0
    for x in xs:
        acc += x * x
    got = con.execute(
        "SELECT list_dot_product(?::DOUBLE[], ?::DOUBLE[])", [xs, xs]
    ).fetchone()[0]
    assert got == acc or (math.isclose(got, acc, rel_tol=0, abs_tol=0.0))
    con.close()


@settings(max_examples=500, deadline=None)
@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
def test_round6_never_hits_exact_midpoint(x):
    """6dp rounding ties are impossible in float64: a tie value is
    odd/(2·10⁶), whose denominator contains 5⁶ and so has no finite
    binary expansion.  Hence HALF_UP (Spark/DuckDB) vs banker's (NumPy)
    rounding cannot diverge — the assumption behind every rounded float
    comparison in the suite.  Decimal(x) is the EXACT value of the
    double, so this checks the real claim, not a float approximation."""
    from decimal import Decimal

    scaled = Decimal(x) * 10**7
    if scaled == scaled.to_integral_value():
        # x has a finite 7-decimal expansion ⇒ its 7th digit can't be a
        # bare 5 (that would need 5⁶ in a power-of-two denominator)
        assert int(scaled) % 10 != 5


@settings(max_examples=100, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=1,
        max_size=300,
    )
)
def test_wav_roundtrip_preserves_samples(text):
    """_make_wav → _decode_wav must be the identity on samples for ANY
    printable-ASCII text (the mm_decode_features/mm_audio_energy codec
    seam), with the canonical 44-byte header."""
    import numpy as np

    from kafkastreaming_spark.operators.multimodal import _decode_wav, _make_wav

    codes = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.int64)
    payload = _make_wav(codes)
    nch, bits, rate, n, data = _decode_wav(payload)
    assert (nch, bits, rate) == (1, 16, 8000)
    assert len(payload) == 44 + 2 * len(codes)
    assert n == len(codes)
    assert np.array_equal(data.astype(np.int64), (codes - 64) * 256)


@settings(max_examples=100, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=16,
        max_size=400,
    )
)
def test_bmp_roundtrip_preserves_pixels(text):
    """_make_bmp → _decode_bmp must reconstruct the top-down grayscale
    pixel grid exactly (bottom-up storage, 16-px rows)."""
    import numpy as np

    from kafkastreaming_spark.operators.multimodal import (
        _BMP_W,
        _decode_bmp,
        _make_bmp,
    )

    codes = np.frombuffer(text.encode(), dtype=np.uint8)
    payload = _make_bmp(codes)
    width, height, bpp, px = _decode_bmp(payload)
    assert (width, bpp) == (_BMP_W, 24)
    assert height == len(codes) // _BMP_W
    want = codes[: height * _BMP_W].reshape(height, _BMP_W)
    assert np.array_equal(px[:, :, 0], want)  # B channel
    assert np.array_equal(px[:, :, 1], want)  # G == B == R (grayscale)
    assert np.array_equal(px[:, :, 2], want)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2000),
            st.integers(min_value=0, max_value=2000),
        ),
        min_size=1,
        max_size=300,
    )
)
def test_local_union_find_labels_are_component_minima(edges):
    """_cc_local's labels must equal a reference DFS's component minima
    for arbitrary edge lists — the invariant the oracle's recursive CTE
    checks, pinned independent of any fixture."""
    import pandas as pd

    from kafkastreaming_spark.operators.pipeline import _cc_local

    pdf = pd.DataFrame(edges, columns=["doc_a", "doc_b"])
    # reference: adjacency DFS
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want: dict[int, int] = {}
    seen: set[int] = set()
    for start in adj:
        if start in seen:
            continue
        comp, stack = [], [start]
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            comp.append(x)
            stack.extend(adj[x] - seen)
        mn = min(comp)
        for x in comp:
            want[x] = mn

    class _FakeSpark:
        def createDataFrame(self, df, schema):
            return df  # capture the pandas frame pre-Spark

    out = _cc_local(_FakeSpark(), pdf)
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == want


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.01, max_value=1e5, allow_nan=False),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_weighted_median_suffix_crossing_matches_reference(rows):
    """agg_weighted_median's spelling (smallest value whose running int
    weight satisfies 2·cw ≥ total) must equal the direct lower weighted
    median for ANY weighted multiset — including duplicate values, where
    the qualifying set's suffix property is what makes the answer
    engine-order-independent."""
    srt = sorted(rows)
    total = sum(w for _, w in srt)
    cum = 0
    for price, w in srt:
        cum += w
        if 2 * cum >= total:
            expect = price
            break
    con = duckdb.connect()
    con.execute("CREATE TABLE t (price DOUBLE, w BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got = con.execute(
        """
        WITH cum AS (
          SELECT price,
                 SUM(w) OVER (ORDER BY price ROWS UNBOUNDED PRECEDING) AS cw,
                 SUM(w) OVER () AS tw
          FROM t
        )
        SELECT MIN(price) FROM cum WHERE 2 * cw >= tw
        """
    ).fetchone()[0]
    assert got == expect


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.one_of(
            # money-like doubles, including exact-cent and exact-half-cent
            # values (x*100 landing on .5 in IEEE double is the case the
            # r11 half-away fix exists for)
            st.integers(min_value=0, max_value=50_000).map(lambda c: c / 100),
            st.integers(min_value=0, max_value=100_000).map(
                lambda h: h / 200  # .005 grid -> exact .5 ties after *100
            ),
            st.floats(
                min_value=0, max_value=500, allow_nan=False, allow_infinity=False
            ),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_half_away_cents_matches_duckdb_round(values):
    """stream_stateful's cents accumulator must agree with DuckDB's
    ROUND(value*100) — half-AWAY-from-zero — for every non-negative
    double, INCLUDING values whose x*100 is an exact IEEE .5 (banker's
    rounding disagreement; ADVICE r10) AND values just below a .5
    boundary where the old floor(p+0.5) spelling itself rounded up
    across the boundary (p+0.5 == next integer in IEEE; ADVICE r11).
    The spelling under test is the fractional-part comparison used at
    streaming/runtime.py (_running_user_agg): exact on all doubles."""
    import numpy as np
    import pandas as pd

    p = (pd.Series(values, dtype="float64") * 100).to_numpy()
    f = np.floor(p)
    ours = int((f + (p - f >= 0.5)).astype("int64").sum())
    con = duckdb.connect()
    duck = con.execute(
        "SELECT CAST(SUM(CAST(ROUND(v * 100) AS BIGINT)) AS BIGINT) "
        "FROM (SELECT UNNEST(?::DOUBLE[]) AS v)",
        [values],
    ).fetchone()[0]
    con.close()
    assert ours == duck


def test_half_away_cents_boundary_pin():
    """Pin the ADVICE-r11 counterexample: p = 0.49999999999999994 is the
    largest double < 0.5, and p + 0.5 rounds to exactly 1.0 in IEEE —
    so floor(p+0.5) = 1 while true half-away rounding gives 0.  The
    fractional-part spelling must give 0, agreeing with DuckDB ROUND."""
    import numpy as np

    p = np.float64(0.49999999999999994)
    assert p < 0.5 and p + 0.5 == 1.0  # the boundary-crossing addition
    f = np.floor(p)
    ours = int(f + (p - f >= 0.5))
    assert ours == 0
    con = duckdb.connect()
    duck = con.execute("SELECT CAST(ROUND(?::DOUBLE) AS BIGINT)", [float(p)]).fetchone()[0]
    con.close()
    assert ours == duck == 0


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=63), min_size=1, max_size=64))
def test_bit63_mask_spelling_matches_spark_semantics(idxs):
    """The mask oracles' bit-63-safe spelling (CASE ... THEN min-int)
    must equal the two's-complement OR-mask of the index set for ANY
    subset of [0, 63] — i.e. exactly what Spark's wrapping shiftleft
    sum produces on distinct bits (ADVICE r10 medium)."""
    con = duckdb.connect()
    got = con.execute(
        """
        SELECT CAST(SUM(CASE WHEN idx = 63
                             THEN (-9223372036854775807::BIGINT - 1)
                             ELSE 1::BIGINT << idx END) AS BIGINT)
        FROM (SELECT UNNEST(?::INT[]) AS idx)
        """,
        [sorted(idxs)],
    ).fetchone()[0]
    con.close()
    want = 0
    for i in idxs:
        want |= 1 << i
    # interpret as signed 64-bit (Spark LongType semantics)
    if want >= 1 << 63:
        want -= 1 << 64
    assert got == want


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
)
def test_try_add_rails_match_guarded_hugeint_oracle(a, b):
    """fn_try's oracle spells try_add/try_subtract as HUGEINT arithmetic
    guarded by the exact int64 rails.  Pin that spelling against the JVM
    semantics (Math.addExact: NULL iff the true sum leaves
    [-2^63, 2^63-1]) for ARBITRARY int64 pairs — the fixture only
    exercises two strata of it."""
    con = duckdb.connect()
    add, sub = con.execute(
        """
        SELECT CAST(CASE WHEN h > 9223372036854775807
                          OR h < -9223372036854775808
                         THEN NULL ELSE h END AS BIGINT),
               CAST(CASE WHEN s > 9223372036854775807
                          OR s < -9223372036854775808
                         THEN NULL ELSE s END AS BIGINT)
        FROM (SELECT ?::HUGEINT + ?::HUGEINT AS h,
                     ?::HUGEINT - ?::HUGEINT AS s)
        """,
        [a, b, a, b],
    ).fetchone()
    con.close()
    want_add = a + b if -(2**63) <= a + b <= 2**63 - 1 else None
    want_sub = a - b if -(2**63) <= a - b <= 2**63 - 1 else None
    assert add == want_add
    assert sub == want_sub


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**62),
    st.integers(min_value=1, max_value=2**62),
)
def test_m4_bucket_int_div_exact_beyond_double_range(offset, span):
    """ts_m4's bucket = ((t - t0) * W) DIV span must stay exact where the
    rejected floor(double-division) spelling drifts: (t-t0)*W beyond
    2^53.  Pin DuckDB's `//` == Python floor-div == Spark's DIV (all
    non-negative here), and the bucket range contract [0, W-1] for any
    in-span offset."""
    w = 64
    t_off = min(offset, span - 1)  # an in-span point
    num = t_off * w
    con = duckdb.connect()
    got = con.execute(
        "SELECT (?::HUGEINT * 64) // ?::HUGEINT", [t_off, span]
    ).fetchone()[0]
    con.close()
    want = num // span
    assert got == want
    assert 0 <= want < w


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=400)
)
def test_count_min_never_undercounts(keys):
    """agg_count_min's one deterministic guarantee (overcount >= 0): for
    any multiset and the key's md5-salted buckets, min-of-depth cells
    >= the true count — the docstring's claim, pinned on arbitrary
    inputs instead of the fixture's user_id distribution."""
    d, w = 4, 1024

    def bucket(i: int, k: int) -> int:
        return _h_py(f"cms{i}:{k}") % w

    cells: dict = {}
    for k in keys:
        for i in range(d):
            cells[(i, bucket(i, k))] = cells.get((i, bucket(i, k)), 0) + 1
    from collections import Counter

    true = Counter(keys)
    for k, n in true.items():
        est = min(cells[(i, bucket(i, k))] for i in range(d))
        assert est >= n
