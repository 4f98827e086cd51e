"""Unit + property tests for the round-7 operator families, against
pure-Python reference implementations (the same differential strategy
test_graph_cc.py uses for the graph loops): AUC vs brute-force pair
counting, Kendall tau-b vs O(n^2) reference, interval merging vs a
sweep-line, LZW vs random byte strings (in test_gif_codec.py), PQ
assignment vs numpy argmin, and the Poisson-bootstrap weight table vs
scipy-free CDF arithmetic."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings, strategies as st

SETTINGS = dict(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ------------------------------------------------------------- references --


def auc_brute(pairs: list[tuple[float, int]]) -> float | None:
    """P[score_pos > score_neg] + 0.5 ties, by explicit pair counting."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return None
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def auc_rank_formula(pairs: list[tuple[float, int]]) -> float | None:
    """The distributed form eval_auc_rank computes: per distinct value,
    positives beat all negatives strictly below + half the ties at it."""
    pos = sum(1 for _, y in pairs if y == 1)
    neg = sum(1 for _, y in pairs if y == 0)
    if not pos or not neg:
        return None
    by_v: dict[float, list[int]] = {}
    for s, y in pairs:
        by_v.setdefault(s, [0, 0])[y] += 1
    total = 0.0
    cna_prev = 0
    for v in sorted(by_v):
        na, nb = by_v[v][0], by_v[v][1]
        total += nb * (cna_prev + na / 2.0)
        cna_prev += na
    return total / (pos * neg)


def tau_b_brute(xs: list[float], ys: list[float]) -> tuple[int, int]:
    con = dis = 0
    n = len(xs)
    for i in range(n):
        for j in range(i + 1, n):
            p = (xs[i] - xs[j]) * (ys[i] - ys[j])
            if p > 0:
                con += 1
            elif p < 0:
                dis += 1
    return con, dis


def merge_intervals(iv: list[tuple[int, int]]) -> tuple[int, int]:
    """Sweep-line reference: (n_merged_islands, total_covered)."""
    if not iv:
        return 0, 0
    iv = sorted(iv)
    islands = []
    cur_s, cur_e = iv[0]
    for s, e in iv[1:]:
        if s > cur_e:
            islands.append((cur_s, cur_e))
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    islands.append((cur_s, cur_e))
    return len(islands), sum(e - s for s, e in islands)


def running_max_islands(iv: list[tuple[int, int]]) -> tuple[int, int]:
    """The window formulation interval_merge_overlaps uses: new island
    where s > max(e) over all PRECEDING rows (ordered by s, e)."""
    if not iv:
        return 0, 0
    iv = sorted(iv)
    island_id = 0
    run_max_e = iv[0][1]
    bounds = {0: [iv[0][0], iv[0][1]]}
    for s, e in iv[1:]:
        if s > run_max_e:
            island_id += 1
            bounds[island_id] = [s, e]
        else:
            bounds[island_id][0] = min(bounds[island_id][0], s)
            bounds[island_id][1] = max(bounds[island_id][1], e)
        run_max_e = max(run_max_e, e)
    return (
        len(bounds),
        sum(hi - lo for lo, hi in bounds.values()),
    )


# ------------------------------------------------------------------ tests --


@given(
    st.lists(
        st.tuples(st.integers(0, 8).map(float), st.integers(0, 1)),
        min_size=2,
        max_size=60,
    )
)
@settings(**SETTINGS)
def test_auc_rank_formula_equals_pair_counting(pairs):
    brute = auc_brute(pairs)
    ranked = auc_rank_formula(pairs)
    if brute is None:
        assert ranked is None
    else:
        assert abs(brute - ranked) < 1e-9


@given(
    st.lists(st.tuples(st.integers(0, 6), st.integers(0, 6)), min_size=2, max_size=40)
)
@settings(**SETTINGS)
def test_tau_b_tie_counts_partition_pairs(xy):
    """con + dis + tx + ty + both-tied == C(n,2): the four tau-b buckets
    must partition the pair set exactly as the operator's CASE exprs do."""
    xs = [float(a) for a, _ in xy]
    ys = [float(b) for _, b in xy]
    n = len(xy)
    con, dis = tau_b_brute(xs, ys)
    tx = sum(
        1
        for i in range(n)
        for j in range(i + 1, n)
        if xs[i] == xs[j] and ys[i] != ys[j]
    )
    ty = sum(
        1
        for i in range(n)
        for j in range(i + 1, n)
        if ys[i] == ys[j] and xs[i] != xs[j]
    )
    both = sum(
        1
        for i in range(n)
        for j in range(i + 1, n)
        if xs[i] == xs[j] and ys[i] == ys[j]
    )
    assert con + dis + tx + ty + both == n * (n - 1) // 2


@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(1, 90)),
        min_size=1,
        max_size=50,
    )
)
@settings(**SETTINGS)
def test_interval_window_formulation_matches_sweep_line(raw):
    iv = [(s, s + d) for s, d in raw]
    assert running_max_islands(iv) == merge_intervals(iv)


def test_poisson_cdf_table_is_the_poisson1_cdf():
    from basis_spark.operators.stats import _POIS_CDF

    cum = 0.0
    for k, (thresh, kk) in enumerate(_POIS_CDF):
        cum += math.exp(-1) / math.factorial(k)
        assert kk == k
        # table literals are the true CDF to ~1e-9 (fixed so both
        # engines bucket identically — exactness of the CONSTANT is
        # what matters, closeness to Poisson is what's asserted here)
        assert abs(thresh - cum) < 5e-10, (k, thresh, cum)


def test_pq_assignment_matches_numpy_argmin():
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 8)
    anchors = vecs[:16]
    # operator convention: distances rounded to 6dp BEFORE argmin,
    # ties broken by anchor id — np.argmin takes the first minimum,
    # which IS the smallest anchor id
    d = ((vecs[:, None, :] - anchors[None, :, :]) ** 2).sum(axis=2)
    codes = np.argmin(np.round(d, 6), axis=1)
    for i in range(len(vecs)):
        best = min(
            range(16), key=lambda c: (round(float(d[i, c]), 6), c)
        )
        assert codes[i] == best


def test_zipf_slope_reference_on_exact_zipf():
    """On an exactly Zipfian freq table (f = C/r), the OLS slope of
    ln f on ln r is exactly -1 — the operator's regression formula."""
    ranks = list(range(1, 101))
    lf = [math.log(1000.0 / r) for r in ranks]
    lr = [math.log(r) for r in ranks]
    n = len(ranks)
    mx = sum(lr) / n
    my = sum(lf) / n
    slope = sum((x - mx) * (y - my) for x, y in zip(lr, lf)) / sum(
        (x - mx) ** 2 for x in lr
    )
    assert abs(slope + 1.0) < 1e-12


def test_span_corruption_span_count_identity():
    """n_spans == number of 0->1 transitions (prepending a virtual 0):
    the list-comprehension both engines run, vs a direct scan."""
    for doc in range(25):
        mask = [
            (
                int(
                    hashlib.md5(f"{doc}-{i}".encode()).hexdigest()[:13], 16
                )
                + 0.5
            )
            / (1 << 52)
            < 0.15
            for i in range(1, 40)
        ]
        direct = sum(
            1
            for i, m in enumerate(mask)
            if m and (i == 0 or not mask[i - 1])
        )
        formula = sum(
            1
            for i in range(1, len(mask) + 1)
            if mask[i - 1] and (i == 1 or not mask[i - 2])
        )
        assert direct == formula


@given(st.integers(0, 6), st.integers(0, 120))
@settings(**SETTINGS)
def test_business_days_closed_form_vs_brute(start_offset, cal):
    """date_business_days' closed form == day-by-day weekday scan, for
    every (start weekday, span) combination — the per-branch arithmetic
    both engines evaluate."""
    import datetime

    s = datetime.date(2000, 1, 3) + datetime.timedelta(days=start_offset)
    brute = sum(
        1
        for i in range(cal)
        if (s + datetime.timedelta(days=i)).isoweekday() <= 5
    )
    isodow = s.isoweekday()
    rem = cal % 7
    over = isodow + rem - 1
    a = min(2, over - 5) if (rem > 0 and over >= 6) else 0
    b = -1 if (isodow == 7 and rem > 0) else 0
    assert (cal // 7) * 5 + rem - (a + b) == brute


@given(
    st.text(alphabet="ab", min_size=0, max_size=12),
    st.sampled_from([("a", "a"), ("a", "b"), ("b", "a")]),
)
@settings(**SETTINGS)
def test_bpe_double_separator_replace_is_greedy_merge(word, pair):
    """The double-separator replace() trick == reference greedy
    left-to-right non-overlapping BPE merge, including the self-
    overlapping pair ('a','a') on runs like 'aaaa'."""
    S = "\x1f"
    a, b = pair

    def ref_merge(symbols):
        out, i = [], 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        return out

    symbols = list(word)
    rep = S * 2 + (S * 2).join(symbols) + S * 2 if symbols else S * 2
    merged_rep = rep.replace(S + a + S + S + b + S, S + a + b + S)
    got = [s for s in merged_rep.split(S * 2) if s]
    assert got == ref_merge(symbols)
