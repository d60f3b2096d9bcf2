"""Statistical test batteries for counter-based RNGs.

Counterpart of the reference's rngtest executable (src/RNGTest/: Charm++
chares each running one TestU01 SmallCrush/Crush/BigCrush test with
p-value aggregation, testu01suite.ci:29-36).  TestU01 itself is a C
library the reference links; here the battery is a SmallCrush-inspired
suite implemented directly on vectorized draws, with each test yielding a
p-value and the suite reporting failures at the same significance
convention (p outside [1e-3, 1 - 1e-3] fails, TestU01's default).

The parallelism analog: the reference runs each test as its own chare;
here each test is one vectorized evaluation of an independent RNG
substream (jax.random fold_in), embarrassingly parallel across devices.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List

import numpy as np
from scipy import stats

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class TestResult:
    name: str
    pvalue: float

    @property
    def passed(self) -> bool:
        return 1e-3 < self.pvalue < 1.0 - 1e-3


def _chi2_p(observed, expected):
    observed = np.asarray(observed, dtype=float)
    expected = np.asarray(expected, dtype=float)
    keep = expected > 5.0
    if keep.sum() < 2:
        return 0.5
    chi2 = ((observed[keep] - expected[keep]) ** 2 / expected[keep]).sum()
    return float(stats.chi2.sf(chi2, keep.sum() - 1))


# --- individual tests (SmallCrush-inspired) --------------------------------


def birthday_spacings(key, n=2**10, d=2**28, reps=32):
    """Poisson law of repeated spacings among sorted 'birthdays'
    (lambda = n^3/(4d) = 1 per replicate; summed over replicates)."""
    coll = 0
    for r in range(reps):
        u = jax.random.randint(jax.random.fold_in(key, r), (n,), 0, d)
        s = np.sort(np.asarray(u))
        sp = np.sort(np.diff(s))
        coll += (n - 1) - len(np.unique(sp))
    lam = reps * n**3 / (4.0 * d)
    p = stats.poisson.cdf(coll, lam)
    return TestResult("BirthdaySpacings", float(min(p, 1 - p) * 2))


def collision(key, n=2**14, d=2**24, reps=16):
    """Collisions in a sparse table: exact mean n - d(1-(1-1/d)^n),
    approximately Poisson in the sparse regime."""
    ncoll = 0
    for r in range(reps):
        u = np.asarray(jax.random.randint(jax.random.fold_in(key, r),
                                          (n,), 0, d))
        ncoll += n - len(np.unique(u))
    lam = reps * (n - d * (1.0 - (1.0 - 1.0 / d) ** n))
    p = stats.poisson.cdf(ncoll, lam)
    return TestResult("Collision", float(min(p, 1 - p) * 2))


def gap(key, n=2**18, alpha=0.0, beta=0.125, tmax=24):
    u = np.asarray(jax.random.uniform(key, (n,)))
    inb = (u >= alpha) & (u < beta)
    idx = np.nonzero(inb)[0]
    if len(idx) < 10:
        return TestResult("Gap", 0.5)
    gaps = np.diff(idx) - 1
    gaps = np.clip(gaps, 0, tmax)
    p_ = beta - alpha
    probs = np.array(
        [p_ * (1 - p_) ** k for k in range(tmax)] + [(1 - p_) ** tmax]
    )
    obs = np.bincount(gaps, minlength=tmax + 1)
    return TestResult("Gap", _chi2_p(obs, probs * len(gaps)))


def simp_poker(key, n=2**16, d=8, k=8):
    u = np.asarray(jax.random.randint(key, (n, k), 0, d))
    distinct = np.array([len(set(row)) for row in u[: 2**13]])
    # Stirling-number distribution of distinct values
    from math import comb, factorial

    def stirling2(nn, kk):
        return sum(
            (-1) ** i * comb(kk, i) * (kk - i) ** nn for i in range(kk + 1)
        ) // factorial(kk)

    probs = np.array(
        [
            factorial(d) / factorial(d - r) * stirling2(k, r) / d**k
            for r in range(1, min(d, k) + 1)
        ]
    )
    obs = np.bincount(distinct - 1, minlength=len(probs))[: len(probs)]
    return TestResult("SimpPoker", _chi2_p(obs, probs * len(distinct)))


def coupon_collector(key, n=2**16, d=8, tmax=40):
    u = np.asarray(jax.random.randint(key, (n,), 0, d))
    lengths = []
    seen = set()
    start = 0
    for i, v in enumerate(u):
        seen.add(int(v))
        if len(seen) == d:
            lengths.append(i - start + 1)
            seen = set()
            start = i + 1
    if len(lengths) < 20:
        return TestResult("CouponCollector", 0.5)
    lengths = np.clip(np.asarray(lengths), d, tmax)
    # exact distribution via inclusion-exclusion
    from math import comb

    def cdf(t):
        return sum(
            (-1) ** i * comb(d, i) * (1 - i / d) ** t for i in range(d)
        )

    probs = np.array([cdf(t) - cdf(t - 1) for t in range(d, tmax)] +
                     [1 - cdf(tmax - 1)])
    obs = np.bincount(lengths - d, minlength=len(probs))[: len(probs)]
    return TestResult("CouponCollector", _chi2_p(obs, probs * len(lengths)))


def max_of_t(key, n=2**15, t=6, bins=32):
    u = np.asarray(jax.random.uniform(key, (n, t))).max(axis=1)
    # CDF of max of t uniforms is x^t; transform to uniform and chi2-bin
    v = u**t
    obs = np.bincount((v * bins).astype(int).clip(0, bins - 1),
                      minlength=bins)
    return TestResult("MaxOft", _chi2_p(obs, np.full(bins, n / bins)))


def weight_distrib(key, n=2**15, k=24, lo=0.25, hi=0.75):
    u = np.asarray(jax.random.uniform(key, (n, k)))
    w = ((u >= lo) & (u < hi)).sum(axis=1)
    probs = stats.binom.pmf(np.arange(k + 1), k, hi - lo)
    obs = np.bincount(w, minlength=k + 1)
    return TestResult("WeightDistrib", _chi2_p(obs, probs * n))


def matrix_rank(key, n=256, dim=32):
    """Rank distribution of random binary matrices over GF(2)."""
    bits = np.asarray(
        jax.random.randint(key, (n, dim, dim), 0, 2), dtype=np.uint8
    )

    def rank2(m):
        m = m.copy()
        r = 0
        for c in range(dim):
            piv = np.nonzero(m[r:, c])[0]
            if len(piv) == 0:
                continue
            i = piv[0] + r
            m[[r, i]] = m[[i, r]]
            rows = np.nonzero(m[:, c])[0]
            rows = rows[rows != r]
            m[rows] ^= m[r]
            r += 1
            if r == dim:
                break
        return r

    ranks = np.array([rank2(m) for m in bits])
    # theoretical: P(rank = dim - j)
    def prank(j):
        r = dim - j
        p = 2.0 ** (-j * j)
        for i in range(r):
            p *= (1 - 2.0 ** (i - dim)) ** 2 / (1 - 2.0 ** (i - r))
        return p

    probs = np.array([prank(2), prank(1), prank(0)])
    obs = np.array(
        [(ranks <= dim - 2).sum(), (ranks == dim - 1).sum(),
         (ranks == dim).sum()]
    )
    return TestResult("MatrixRank", _chi2_p(obs, probs * n))


def hamming_indep(key, n=2**13):
    """Serial correlation of Hamming weights of successive words: under
    independence, r*sqrt(n) is asymptotically standard normal."""
    bits = np.asarray(jax.random.randint(key, (n,), 0, 2**30), dtype=np.uint64)  # 30 bits: int32-safe without x64
    hw = np.array([bin(int(x)).count("1") for x in bits], dtype=float)
    a = hw[:-1] - hw.mean()
    b = hw[1:] - hw.mean()
    r = (a * b).mean() / hw.var()
    z = r * np.sqrt(len(a))
    return TestResult("HammingIndep", float(2.0 * stats.norm.sf(abs(z))))


def random_walk(key, n=2**12, steps=128):
    """Final positions of +-1 random walks vs binomial law."""
    u = np.asarray(jax.random.randint(key, (n, steps), 0, 2)) * 2 - 1
    pos = (u.sum(axis=1) + steps) // 2
    probs = stats.binom.pmf(np.arange(steps + 1), steps, 0.5)
    obs = np.bincount(pos, minlength=steps + 1)
    return TestResult("RandomWalk1", _chi2_p(obs, probs * n))


def ks_uniform(key, n=2**16):
    u = np.asarray(jax.random.uniform(key, (n,)))
    return TestResult("KSUniform", float(stats.kstest(u, "uniform").pvalue))


def permutation(key, n=2**15, t=5):
    """sknuth_Permutation: order patterns of non-overlapping t-tuples are
    uniform over the t! permutations (exact multinomial chi2)."""
    import math

    u = np.asarray(jax.random.uniform(key, (n, t)))
    idx = np.argsort(u, axis=1)
    # Lehmer code -> permutation index
    code = np.zeros(n, dtype=np.int64)
    for j in range(t):
        smaller = (idx[:, j + 1:] < idx[:, j:j + 1]).sum(axis=1)
        code = code * (t - j) + smaller
    nperm = math.factorial(t)
    obs = np.bincount(code, minlength=nperm)
    return TestResult("Permutation", _chi2_p(obs, np.full(nperm, n / nperm)))


def serial_pairs(key, n=2**16, d=64):
    """smultin_Serial (non-overlapping pairs): (u_{2i}, u_{2i+1}) cells in
    a d x d grid are uniform (exact chi2 with d^2-1 dof)."""
    v = np.asarray(
        jax.random.randint(key, (2 * n,), 0, d, dtype=jnp.int32)
    ).astype(np.int64)
    cells = v[0::2] * d + v[1::2]
    obs = np.bincount(cells, minlength=d * d)
    return TestResult("SerialPairs", _chi2_p(obs, np.full(d * d, n / (d * d))))


def autocorrelation(key, n=2**18, lag=1):
    """sstring_AutoCor: lag-k autocorrelation of the bit stream is
    asymptotically normal with mean n/2 and variance n/4."""
    bits = np.asarray(
        jax.random.randint(key, (n + lag,), 0, 2, dtype=jnp.int32)
    ).astype(np.int64)
    a = (bits[:-lag] ^ bits[lag:]).sum()
    z = (2.0 * a - n) / np.sqrt(n)
    return TestResult("AutoCorrelation", float(2.0 * stats.norm.sf(abs(z))))


SmallCrush: List[Callable] = [
    birthday_spacings,
    collision,
    gap,
    simp_poker,
    coupon_collector,
    max_of_t,
    weight_distrib,
    matrix_rank,
    hamming_indep,
    random_walk,
    ks_uniform,
    permutation,
    serial_pairs,
    autocorrelation,
]

#: Crush-scale battery: the same exact-law tests at ~16-64x the sample
#: sizes (the reference's Crush option scales TestU01 the same way;
#: src/RNGTest/Crush.cpp).  Runtime is minutes, not hours: generation is
#: on-device and each test reduces to counts.
Crush: List[Callable] = [
    lambda k: birthday_spacings(k, n=2**12, d=2**30, reps=64),
    lambda k: collision(k, n=2**16, d=2**26, reps=32),
    lambda k: gap(k, n=2**22),
    lambda k: simp_poker(k, n=2**20),
    lambda k: coupon_collector(k, n=2**20),
    lambda k: max_of_t(k, n=2**19, t=8, bins=64),
    lambda k: weight_distrib(k, n=2**19),
    lambda k: matrix_rank(k, n=1024, dim=64),
    lambda k: hamming_indep(k, n=2**17),
    lambda k: random_walk(k, n=2**16, steps=256),
    lambda k: ks_uniform(k, n=2**20),
    lambda k: permutation(k, n=2**19, t=6),
    lambda k: serial_pairs(k, n=2**20, d=128),
    lambda k: autocorrelation(k, n=2**22),
]


def run_battery(seed: int = 0, battery=None, impl: str = "threefry2x32"):
    """Run a battery; returns (results, failed_names)."""
    battery = battery or SmallCrush
    key = jax.random.key(seed, impl=impl)
    results = []
    for i, test in enumerate(battery):
        results.append(test(jax.random.fold_in(key, i)))
    failed = [r.name for r in results if not r.passed]
    return results, failed
