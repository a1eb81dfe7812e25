"""functions/detmath.py — the deterministic ``ln`` both engines share.

The contract under test: for any positive BIGINT count, the DuckDB
rendering, the Spark rendering, and the Python mirror produce the SAME
64-bit double (bit-identical — this is what makes NLL/BM25 oracle hashes
representation-independent), and that double is within 1e-12 of true ln.
DuckDB vs mirror is exhaustive-ish here; Spark vs mirror is covered by the
oracle-gated query tests (any bit flip fails their value hash).
"""

from __future__ import annotations

import math
import random
import struct

import duckdb
import pyarrow as pa

from flink_net_spark.functions import detmath as DM


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def _counts() -> list[int]:
    random.seed(41)
    return (
        list(range(1, 3000))
        + [1 << k for k in range(63)]
        + [(1 << k) - 1 for k in range(2, 63)]
        + [(1 << k) + 1 for k in range(1, 62)]
        + [random.randrange(1, 1 << 62) for _ in range(3000)]
    )


def test_duckdb_matches_python_mirror_bitwise_and_is_accurate():
    counts = _counts()
    con = duckdb.connect()
    con.register("src", pa.table({"c": pa.array(counts, type=pa.int64())}))
    rows = con.sql(
        f"SELECT c, {DM.duckdb_det_ln_select('c', 'q')} FROM src"
    ).fetchall()
    assert len(rows) == len(counts)
    for r in rows:
        c, ln_sql = r[0], r[-1]
        assert _bits(ln_sql) == _bits(DM.py_det_ln(c)), c
        assert abs(ln_sql - math.log(c)) < 1e-12, (c, ln_sql)


def test_null_propagates():
    # left-join paths feed NULL counts through the chain (unseen bigrams)
    con = duckdb.connect()
    row = con.sql(
        f"SELECT {DM.duckdb_det_ln_select('c', 'q')} "
        "FROM (SELECT CAST(NULL AS BIGINT) AS c)"
    ).fetchone()
    assert row[-1] is None


def test_spark_and_duckdb_render_identical_op_order():
    # the two dialects must differ ONLY in the power-of-two array lookup
    sp = dict(DM.spark_det_ln_cols("c", "p"))
    dk = dict(DM.duckdb_det_ln_cols("c", "p"))
    assert sp.keys() == dk.keys()
    for k in sp:
        if k == "p_m":
            continue  # array-indexing syntax differs; literals are shared
        assert sp[k] == dk[k], k
    assert sp["p_m"].startswith("(CAST(c AS DOUBLE) / ")
    assert dk["p_m"].startswith("(CAST(c AS DOUBLE) / ")


# Integer pairs (a, b) whose EXACT (ln a − ln b)·1e6 lies within 1 ulp of a
# .5 quantization boundary — found by continued-fraction convergents of
# exp((X + 0.5)/1e6) (round-8 verdict #5).  At these inputs the retired
# libm contract provably flips: the two doubles adjacent to the true value
# round to DIFFERENT integers, so any 1-ulp cross-libm disagreement changes
# the hashed result.  (No such pair exists with both members under ~1e5 —
# rational-approximation bounds put the closest achievable boundary
# proximity for a small corpus at ~1/(2·N) — which is why the corpus-level
# edge fixture carries the closest constructible docs while THIS test
# carries the exact-boundary proof.)
BOUNDARY_PAIRS = [
    (291737963, 14574647, 2996572),
    (121014538, 1210145, 4605170),
    (3520948172, 3438427, 6931471),
    (21601367, 5400341, 1386294),
    (4293318573, 450187, 9162907),
    (515776447, 171925446, 1098612),
    (145611107, 65968669, 791759),
    (263079785, 150331349, 559615),
    (400485623, 40048546, 2302585),
    (591526780, 19717557, 3401197),
]


def _unit_doubles() -> list[float]:
    # the [2^-61, 2) domain of the DOUBLE chain: exact powers of two, both
    # domain edges, neighbours of 1.0 (where z crosses 0), random exact
    # rationals, and KN-shaped sums t1 + lam*pc
    random.seed(43)
    xs = (
        [float(2.0**-k) for k in range(0, 62)]
        + [math.nextafter(2.0, 0.0), math.nextafter(1.0, 0.0),
           math.nextafter(1.0, 2.0), 1.0, float(2.0**-61)]
        + [random.randrange(1, 1 << 53) / float(1 << k) for k in range(1, 54) for _ in range(40)]
    )
    out = []
    for x in xs:
        if 2.0**-61 <= x < 2.0:
            out.append(x)
    for _ in range(2000):
        c, cc = random.randrange(1, 10**12), random.randrange(1, 10**12)
        cc = max(c, cc)
        r, lq = random.randrange(1, cc + 1), random.randrange(0, 10**9)
        b = random.randrange(max(1, lq), 10**12)
        t1 = float(4 * c - 3) / float(4 * cc)
        lam = float(3 * r) / float(4 * cc)
        pc = float(2 * lq + 1) / float(2 * b + 2)
        out.append(t1 + lam * pc)
    return out


def test_duckdb_double_chain_matches_python_mirror_bitwise_and_is_accurate():
    xs = _unit_doubles()
    con = duckdb.connect()
    con.register("src", pa.table({"x": pa.array(xs, type=pa.float64())}))
    rows = con.sql(
        f"SELECT x, {DM.duckdb_det_lnd_select('x', 'q')} FROM src"
    ).fetchall()
    assert len(rows) == len(xs)
    for r in rows:
        x, ln_sql = r[0], r[-1]
        assert _bits(ln_sql) == _bits(DM.py_det_lnd(x)), x
        assert abs(ln_sql - math.log(x)) < 1e-12, (x, ln_sql)


def test_spark_double_chain_matches_python_mirror_bitwise(spark):
    xs = _unit_doubles()[::7]  # sampled — Spark startup dominates
    sdf = spark.createDataFrame([(x,) for x in xs], "x double")
    out = DM.spark_with_det_lnd(sdf, "x", "q").select("x", "q_ln").collect()
    assert len(out) == len(xs)
    for row in out:
        assert _bits(row.q_ln) == _bits(DM.py_det_lnd(row.x)), row.x


def test_double_chain_dialects_share_op_order():
    sp = dict(DM.spark_det_lnd_cols("x", "p"))
    dk = dict(DM.duckdb_det_lnd_cols("x", "p"))
    assert sp.keys() == dk.keys()
    for k in sp:
        if k in ("p_m", "p_k"):
            continue  # array-index / trunc-cast spelling differs
        assert sp[k] == dk[k], k
    # the trunc-cast wraps the SAME exact product; only the cast spelling
    # differs (Spark CAST truncates, DuckDB needs trunc() first)
    assert f"x * {DM._P61_LIT}" in sp["p_k"] and f"x * {DM._P61_LIT}" in dk["p_k"]
    assert "trunc(" in dk["p_k"] and "trunc(" not in sp["p_k"]


def _half_away(x: float) -> int:
    # SQL ROUND semantics for positive values (Spark HALF_UP / DuckDB
    # round-half-away) — python round() is half-EVEN and must not be used
    return math.floor(x + 0.5)


def test_boundary_pairs_straddle_and_det_ln_is_immune():
    from decimal import Decimal, getcontext

    getcontext().prec = 60
    con = duckdb.connect()
    for a, b, X in BOUNDARY_PAIRS:
        # 1. the pair really is a boundary pair: exact value within 1 ulp
        v_exact = (Decimal(a).ln() - Decimal(b).ln()) * 10**6
        boundary = Decimal(X) + Decimal("0.5")
        assert abs(v_exact - boundary) <= Decimal(math.ulp(float(v_exact)))
        # 2. the OLD contract flips here: adjacent doubles round differently
        v0 = float(v_exact)
        lo, hi = math.nextafter(v0, -math.inf), math.nextafter(v0, math.inf)
        assert _half_away(lo) != _half_away(hi), (a, b)
        # 3. the NEW contract cannot: DuckDB's det-ln double equals the
        # Python mirror's BITWISE (Spark equality is enforced by the
        # oracle-hash gate over the same expressions), so both engines
        # round the same double — whichever side of the boundary it's on.
        row = con.sql(
            f"SELECT CAST(ROUND((a_ln - b_ln) * 1000000) AS BIGINT) AS nll, a_ln, b_ln "
            f"FROM (SELECT {DM.duckdb_det_ln_select('a', 'a')}, "
            f"             {DM.duckdb_det_ln_select('b', 'b')} "
            f"      FROM (SELECT CAST({a} AS BIGINT) AS a, CAST({b} AS BIGINT) AS b))"
        ).fetchone()
        nll_duck, a_ln, b_ln = row
        assert _bits(a_ln) == _bits(DM.py_det_ln(a))
        assert _bits(b_ln) == _bits(DM.py_det_ln(b))
        py_v = (DM.py_det_ln(a) - DM.py_det_ln(b)) * 1000000
        assert nll_duck == _half_away(py_v) and nll_duck in (X, X + 1)


def test_odiv_idiom_is_floor_division_on_both_engines():
    """The emb_pca_power odiv idiom: (x + B*d) div d - B must equal
    mathematical FLOOR division for any signed x with |x| <= B*d — that's
    what reconciles Spark's truncate-toward-zero `div` with DuckDB's
    floor `//` (they disagree on bare negative operands).  Property-check
    the DuckDB rendering and the Python mirror against math.floor over
    adversarial signed values (exact multiples, off-by-one, both signs);
    the Spark rendering shares the operator (`div` on a positive
    numerator) and is pinned end-to-end by the oracle-hash gate."""
    from flink_net_spark.queries.similarity import _odiv

    rng = random.Random(9)
    con = duckdb.connect()
    cases = []
    for _ in range(200):
        d = rng.choice([1, 2, 3, 1000, 10000, 999983, 10**6])
        b = rng.choice([5_000, 2_000_000, 20_000_000])
        lim = b * d
        x = rng.choice(
            [
                rng.randint(-lim, lim),
                rng.randint(-5, 5) * d,          # exact multiples
                rng.randint(-5, 5) * d + 1,      # just above
                rng.randint(-5, 5) * d - 1,      # just below
                -lim,
                lim,
            ]
        )
        if abs(x) > lim:
            continue
        cases.append((x, d, b))
    for x, d, b in cases:
        want = x // d  # Python // IS floor division
        duck = con.sql(
            f"SELECT {_odiv('x', 'd', b, '//')} FROM "
            f"(SELECT CAST({x} AS BIGINT) AS x, CAST({d} AS BIGINT) AS d)"
        ).fetchone()[0]
        assert duck == want, (x, d, b, duck, want)
        # the Python mirror of the Spark rendering: trunc-div on the
        # positive numerator (Python // on positives == trunc == floor)
        assert (x + b * d) // d - b == want, (x, d, b)
