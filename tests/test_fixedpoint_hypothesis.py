"""Property-based tests (hypothesis) for the fixed-point determinism core
(operators/_util.py) — the formulas every exact oracle rests on. Pure
Python: we verify the integer-arithmetic rounding formulas against
Python's exact Decimal, across the full value range the engine allows."""

from __future__ import annotations

import decimal

from hypothesis import given, settings
from hypothesis import strategies as st

# Mirrors of the SQL formulas (kept in lockstep with _util.py templates).


def round_cents(S: int) -> float:
    """(CASE WHEN S >= 0 THEN (S+50) div 100 ELSE -((-S+50) div 100) END) / 100.0
    over a scale-4 integer S — Spark `div` and DuckDB `//` both truncate
    toward zero, so positive-only operands make them identical."""
    cents = (S + 50) // 100 if S >= 0 else -((-S + 50) // 100)
    return cents / 100.0


def avg_cents(S: int, n: int) -> float:
    pos = (2 * S + 100 * n) // (200 * n)
    neg = -((-2 * S + 100 * n) // (200 * n))
    return (pos if S >= 0 else neg) / 100.0


@given(st.integers(min_value=-(2**52), max_value=2**52))
@settings(max_examples=2000)
def test_round_cents_is_decimal_half_up(S: int):
    """The integer formula must equal ROUND_HALF_UP (away from zero) of
    S/10000 at 2 decimal places — the semantic both engines' docs promise
    but implement divergently on doubles."""
    want = decimal.Decimal(S).scaleb(-4).quantize(
        decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP
    )
    got = decimal.Decimal(str(round_cents(S)))
    assert got == want, (S, got, want)


@given(
    st.integers(min_value=-(2**40), max_value=2**40),
    st.integers(min_value=1, max_value=10**9),
)
@settings(max_examples=2000)
def test_avg_cents_is_decimal_half_up(S: int, n: int):
    want = (decimal.Decimal(S) / (10000 * n)).quantize(
        decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP
    )
    got = decimal.Decimal(str(avg_cents(S, n)))
    assert got == want, (S, n, got, want)


@given(st.integers(min_value=-(2**46), max_value=2**46))
@settings(max_examples=500)
def test_cents_to_double_is_exact(S: int):
    """cents/100.0 must be the same double every time — i.e. the final
    division introduces no cross-run ambiguity (one IEEE op on exact
    integers)."""
    a = round_cents(S)
    b = round_cents(S)
    assert a == b
    # value error = half-up rounding (<= 0.005) + double representation
    # error of cents/100.0, which scales with magnitude (one ulp at the
    # result's scale) — hypothesis found the fixed 1e-9 slack too tight
    # for |S| near 2^46.
    ulp = decimal.Decimal(abs(a) if a else 1) * decimal.Decimal(2) ** -50
    assert abs(decimal.Decimal(a) - decimal.Decimal(S).scaleb(-4)) <= (
        decimal.Decimal("0.005") + ulp
    )


def avg_micro(S: int, n: int) -> int:
    """quality.py `_AVG_MICRO`: sign-mirrored half-up integer mean of a
    micro-unit sum (centroid operator). Positive-only division keeps
    Spark `div` (truncate) and DuckDB `//` (floor) identical."""
    return (2 * S + n) // (2 * n) if S >= 0 else -(((-2 * S) + n) // (2 * n))


@given(
    st.integers(min_value=-(2**52), max_value=2**52),
    st.integers(min_value=1, max_value=10**9),
)
@settings(max_examples=2000)
def test_avg_micro_is_decimal_half_up(S: int, n: int):
    want = (decimal.Decimal(S) / n).quantize(
        decimal.Decimal("1"), rounding=decimal.ROUND_HALF_UP
    )
    assert decimal.Decimal(avg_micro(S, n)) == want, (S, n)


def round4(x: float) -> float:
    """statistics.py `_round4`: sign-mirrored FLOOR(x*10000 + 0.5)/10000
    over a finite double (regression slope / correlation outputs)."""
    import math

    if x >= 0:
        return float(math.floor(x * 10000 + 0.5)) / 10000.0
    return -(float(math.floor(-x * 10000 + 0.5)) / 10000.0)


@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
@settings(max_examples=2000)
def test_round4_sign_symmetric_and_close(x: float):
    """_round4 must be odd (f(-x) = -f(x)) — no toward-/away-zero bias
    between engines — and within half a unit of the true value. (Exact
    half-up ties on DOUBLES are inherently representation-dependent;
    the operators only apply _round4 to ratios of exact integers, which
    both engines compute as the same double, so symmetry + closeness is
    the portable contract.)"""
    assert round4(-x) == -round4(x)
    assert abs(round4(x) - x) <= 0.00005 + abs(x) * 1e-12


# --------------------------------------------------------------------
# round-6 overflow-tier primitives
# --------------------------------------------------------------------


def pack_codes(codes: list[int]) -> int:
    """Mirror of quality._pq2_packed: sum(code_m * 4^m), little-endian."""
    return sum(c * (4**m) for m, c in enumerate(codes))


def unpack_code(packed: int, m: int) -> int:
    """Mirror of quality._pq_unpack: (packed div 4^m) % 4 (non-negative
    packed, so Spark `div` / DuckDB `//` / Python `//` all agree)."""
    return (packed // (4**m)) % 4


@given(st.lists(st.integers(min_value=0, max_value=3), min_size=16, max_size=16))
@settings(max_examples=2000)
def test_pq2_pack_unpack_roundtrip(codes: list[int]):
    """Every 16-code word must round-trip through the packed BIGINT, and
    the word must stay within 32 bits (the 4-byte/vector storage claim)."""
    packed = pack_codes(codes)
    assert 0 <= packed < 4**16
    assert [unpack_code(packed, m) for m in range(16)] == codes


def interp_half_up(prev_v: int, next_v: int, num_days: int, den_days: int) -> int:
    """Mirror of timeseries._ILIN_DIV + prev: sign-mirrored half-up of
    (next-prev)*num/den added to prev."""
    num = (next_v - prev_v) * num_days
    den = den_days
    if num >= 0:
        half = (2 * num + den) // (2 * den)
    else:
        half = -((2 * -num + den) // (2 * den))
    return prev_v + half


@given(
    st.integers(min_value=-(2**40), max_value=2**40),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.integers(min_value=1, max_value=3650),
)
@settings(max_examples=2000)
def test_interp_is_decimal_half_up_and_bounded(prev_v: int, next_v: int, den: int):
    """For every interior day the integer interpolation must equal
    ROUND_HALF_UP of the exact rational, and lie within [min, max] of the
    endpoints (no overshoot — the property a ragged rounding would break)."""
    for num in {1, den // 2, max(1, den - 1)}:
        got = interp_half_up(prev_v, next_v, num, den)
        exact = decimal.Decimal(prev_v) + (
            decimal.Decimal(next_v - prev_v) * num / den
        ).quantize(decimal.Decimal("1"), rounding=decimal.ROUND_HALF_UP)
        assert got == exact, (prev_v, next_v, num, den, got, exact)
        lo, hi = min(prev_v, next_v), max(prev_v, next_v)
        assert lo <= got <= hi


def median_rank_pick(values: list[int]) -> int:
    """Mirror of the value-table lower-median pick (stat_mad_robust):
    cumulative counts over sorted distinct values, pick the first value
    whose cumsum reaches (n+1) div 2."""
    from collections import Counter

    n = len(values)
    k = (n + 1) // 2
    cum = 0
    for v, c in sorted(Counter(values).items()):
        cum += c
        if cum >= k:
            return v
    raise AssertionError("unreachable")


@given(st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=200))
@settings(max_examples=1000)
def test_value_table_median_equals_row_rank_median(values: list[int]):
    """The value-table pick must equal the row-rank lower median
    (sorted[(n+1)//2 - 1]) — the equivalence the stat_mad_robust rewrite
    rests on (oracle keeps the row-rank form, Spark runs the value form)."""
    want = sorted(values)[(len(values) + 1) // 2 - 1]
    assert median_rank_pick(values) == want


# ---------------------------------------------------------------------------
# Round-9 IVM epoch-merge algebra (cdc_ivm_topk_tombstone /
# cdc_ivm_distinct): pure-Python mirror of the per-key state + merge,
# verified against a direct recomputation over random op sequences.
# State per key per delta: (n_live_since_last_del, has_del); merge(a, b)
# = b if b.has_del else (a.n + b.n, a.has_del).
# ---------------------------------------------------------------------------


def _epoch_state(ops: list[str]) -> tuple[int, bool]:
    """Direct per-key state from an op sequence ('e' = event, 'd' = delete)."""
    n, has_del = 0, False
    for op in ops:
        if op == "d":
            n, has_del = 0, True
        else:
            n += 1
    return n, has_del


def _epoch_merge(a: tuple[int, bool], b: tuple[int, bool]) -> tuple[int, bool]:
    if b[1]:
        return b[0], True
    return a[0] + b[0], a[1]


@given(
    st.lists(st.sampled_from(["e", "d"]), max_size=40),
    st.lists(st.sampled_from(["e", "d"]), max_size=40),
)
@settings(max_examples=2000)
def test_epoch_merge_equals_direct(ops1: list[str], ops2: list[str]):
    """merge(state(prefix), state(suffix)) == state(prefix + suffix) for
    EVERY split — the exact property the engine's split-at-cut arms rely
    on (log order, any batch boundary)."""
    got = _epoch_merge(_epoch_state(ops1), _epoch_state(ops2))
    assert got == _epoch_state(ops1 + ops2)


@given(st.lists(st.sampled_from(["e", "d"]), min_size=0, max_size=60),
       st.integers(min_value=0, max_value=60))
@settings(max_examples=2000)
def test_epoch_merge_associative_any_split(ops: list[str], k: int):
    """Any two-way split of one sequence merges to the same state —
    batch boundaries cannot change the maintained view."""
    k = min(k, len(ops))
    got = _epoch_merge(_epoch_state(ops[:k]), _epoch_state(ops[k:]))
    assert got == _epoch_state(ops)


# ---------------------------------------------------------------------------
# Round-9 pHash banding (mm_blob_dedup_phash): pigeonhole recall —
# for ANY two 16-bit signatures within Hamming tau=2, at least one of
# the four 4-bit bands is equal, so the banded equi-join always
# proposes the pair (the engine arm's recall is structural).
# ---------------------------------------------------------------------------


@given(st.integers(min_value=0, max_value=65535),
       st.sets(st.integers(min_value=0, max_value=15), max_size=2))
@settings(max_examples=2000)
def test_phash_banding_full_recall_at_tau2(sig: int, flipped: set[int]):
    other = sig
    for b in flipped:
        other ^= 1 << b
    assert bin(sig ^ other).count("1") <= 2
    bands_equal = sum(
        ((sig >> (4 * k)) & 15) == ((other >> (4 * k)) & 15)
        for k in range(4)
    )
    assert bands_equal >= 2  # tau=2 damages at most 2 of 4 bands


# ---------------------------------------------------------------------------
# Round-10 semantic-gate searchsorted kernel (sem_window_candidates):
# for ANY base/wave value lists, the kernel's candidate set must equal
# the brute-force definition — base members whose (s, vec_id)-sorted
# rank lies within W positions of the wave member's insertion rank —
# including ties in s (the vec_id tiebreak inside equal-s runs).
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),  # coarse s -> many ties
            st.integers(min_value=0, max_value=10_000),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],
    ),
    st.data(),
)
@settings(max_examples=300, deadline=None)
def test_sem_window_kernel_equals_bruteforce(rows, data):
    import pandas as pd

    from mongodb_cdc_spark.operators.curation import (
        _SEM_K,
        _SEM_WINDOW,
        sem_window_candidates,
    )

    n_wave = data.draw(
        st.integers(min_value=1, max_value=max(1, len(rows) - 1))
    )
    wave, base = rows[:n_wave], rows[n_wave:]
    if not base:
        return
    pdf = pd.DataFrame(
        {
            "vec_id": [vid for _, vid in base + wave],
            "cluster": 0,
            **{
                f"s{k}": [float(s) for s, _ in base + wave]
                for k in range(_SEM_K)
            },
            "is_wave": [False] * len(base) + [True] * len(wave),
        }
    )
    got = set(zip(*(sem_window_candidates(pdf)[c] for c in ("wid", "bid"))))
    # brute force: sorted base order by (s, vec_id); insertion rank =
    # count of base strictly before the wave key; window both sides
    bsorted = sorted(base, key=lambda t: (t[0], t[1]))
    expect = set()
    for s_w, wid in wave:
        ins = sum(1 for s_b, bid in bsorted if (s_b, bid) < (s_w, wid))
        for pos in range(max(ins - _SEM_WINDOW, 0),
                         min(ins + _SEM_WINDOW, len(bsorted))):
            expect.add((wid, bsorted[pos][1]))
    assert got == expect


# ---------------------------------------------------------------------------
# Round-10 rank-IVM merge algebra (maintenance_sem_rank_refresh): for
# ANY base2/wave split, maintained ranks — base rank + #wave-before,
# wave rank = #base2-before + #wave-before + 1 — must equal the ranks
# of a from-scratch sort of the union.
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=10_000),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],
    ),
    st.integers(min_value=0, max_value=60),
)
@settings(max_examples=500, deadline=None)
def test_rank_ivm_merge_equals_rebuild(rows, k):
    k = min(k, len(rows))
    base, wave = rows[:k], rows[k:]
    merged = {}
    for s_b, bid in base:
        old_rn = 1 + sum(1 for t in base if (t[0], t[1]) < (s_b, bid))
        shift = sum(1 for t in wave if (t[0], t[1]) < (s_b, bid))
        merged[bid] = old_rn + shift
    for s_w, wid in wave:
        nb = sum(1 for t in base if (t[0], t[1]) < (s_w, wid))
        nw = sum(1 for t in wave if (t[0], t[1]) < (s_w, wid))
        merged[wid] = nb + nw + 1
    rebuilt = {
        vid: i + 1
        for i, (s, vid) in enumerate(sorted(rows, key=lambda t: (t[0], t[1])))
    }
    assert merged == rebuilt


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=10_000),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],
    ),
    st.integers(min_value=0, max_value=60),
)
@settings(max_examples=300, deadline=None)
def test_sem_rank_merge_kernel_equals_rebuild(rows, k):
    """Drive the NUMPY KERNEL itself (not a Python re-statement of its
    algebra — the sibling test above): hypothesis base/wave rows through
    `sem_rank_merge` on a pandas frame must reproduce the from-scratch
    rebuilt ranks, exercising `_count_before`'s searchsorted tie loop
    (s drawn from 0..9 so equal-s runs are common)."""
    import pandas as pd

    from mongodb_cdc_spark.operators.curation import _SEM_K, sem_rank_merge

    k = min(k, len(rows))
    base, wave = rows[:k], rows[k:]
    bsorted = sorted(base, key=lambda t: (t[0], t[1]))
    base_rn = {vid: i + 1 for i, (_, vid) in enumerate(bsorted)}
    pdf = pd.DataFrame(
        {
            "vec_id": [vid for _, vid in base + wave],
            "cluster": 0,
            **{
                f"s{j}": [float(s) for s, _ in base + wave]
                for j in range(_SEM_K)
            },
            **{
                f"rn{j}": [base_rn[vid] for _, vid in base]
                + [0] * len(wave)
                for j in range(_SEM_K)
            },
            "is_wave": [False] * len(base) + [True] * len(wave),
        }
    )
    out = sem_rank_merge(pdf)
    rebuilt = {
        vid: i + 1
        for i, (s, vid) in enumerate(sorted(rows, key=lambda t: (t[0], t[1])))
    }
    for j in range(_SEM_K):
        got = dict(zip(out["vec_id"], out[f"rn{j}"]))
        assert got == rebuilt


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=10_000),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],
    ),
    st.integers(min_value=0, max_value=60),
)
@settings(max_examples=300, deadline=None)
def test_sem_rank_unmerge_kernel_equals_rebuild(rows, k):
    """The forget inverse, driven through the NUMPY KERNEL: delete an
    arbitrary subset from a ranked cluster via `sem_rank_unmerge` and
    the survivors' shifted ranks must equal a from-scratch re-rank of
    the survivors (s drawn from 0..9 so `_count_before`'s tie loop is
    exercised). Together with the merge test this pins
    unmerge(merge(base, wave), wave) == base for every frame."""
    import pandas as pd

    from mongodb_cdc_spark.operators.curation import (
        _SEM_K,
        sem_rank_unmerge,
    )

    k = min(k, len(rows))
    dead_ids = {vid for _, vid in rows[:k]}
    ranked = sorted(rows, key=lambda t: (t[0], t[1]))
    full_rn = {vid: i + 1 for i, (_, vid) in enumerate(ranked)}
    pdf = pd.DataFrame(
        {
            "vec_id": [vid for _, vid in rows],
            "cluster": 0,
            **{
                f"s{j}": [float(s) for s, _ in rows]
                for j in range(_SEM_K)
            },
            **{
                f"rn{j}": [full_rn[vid] for _, vid in rows]
                for j in range(_SEM_K)
            },
            "is_del": [vid in dead_ids for _, vid in rows],
        }
    )
    out = sem_rank_unmerge(pdf)
    survivors = [t for t in rows if t[1] not in dead_ids]
    rebuilt = {
        vid: i + 1
        for i, (_, vid) in enumerate(
            sorted(survivors, key=lambda t: (t[0], t[1]))
        )
    }
    assert len(out) == len(survivors)
    for j in range(_SEM_K):
        got = dict(zip(out["vec_id"], out[f"rn{j}"]))
        assert got == rebuilt
