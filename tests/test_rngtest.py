"""rngtest battery: jax's counter-based RNG passes; a deliberately weak
generator fails — validating the battery has statistical power (the
reference's rngtest role, SURVEY.md §2.8)."""

import numpy as np
import pytest

import jax

from quinoa_tpu.rngtest import run_battery, SmallCrush
from quinoa_tpu.rngtest import battery as bat


def test_threefry_passes_smallcrush():
    results, failed = run_battery(seed=7)
    assert not failed, failed
    assert len(results) == len(SmallCrush)


def test_weak_generator_fails():
    """Feed the battery a low-quality LCG (RANDU-like) through a shim: the
    equidistribution tests must flag it."""

    class FakeKeyRandom:
        """Monkeypatch shim: RANDU via numpy, ignoring jax keys."""

        def __init__(self):
            self.state = 1

        def _next(self, n):
            out = np.empty(n, dtype=np.float64)
            s = self.state
            for i in range(n):
                s = (65539 * s) % 2**31  # RANDU
                out[i] = s / 2**31
            self.state = s
            return out

    shim = FakeKeyRandom()
    orig_uniform = jax.random.uniform
    orig_randint = jax.random.randint

    def fake_uniform(key, shape, dtype=None, **kw):
        import jax.numpy as jnp
        n = int(np.prod(shape))
        return jnp.asarray(shim._next(n).reshape(shape))

    def fake_randint(key, shape, lo, hi, dtype=None, **kw):
        import jax.numpy as jnp
        n = int(np.prod(shape))
        vals = (shim._next(n) * (hi - lo) + lo).astype(np.int64)
        return jnp.asarray(vals.reshape(shape))

    jax.random.uniform = fake_uniform
    jax.random.randint = fake_randint
    try:
        # matrix-rank/birthday tests are expensive through the python shim;
        # run the cheap equidistribution subset
        subset = [bat.gap, bat.max_of_t, bat.weight_distrib, bat.random_walk,
                  bat.ks_uniform, bat.hamming_indep]
        results, failed = run_battery(seed=0, battery=subset)
    finally:
        jax.random.uniform = orig_uniform
        jax.random.randint = orig_randint

    # RANDU's lattice structure must trip at least one test
    assert failed, [r.pvalue for r in results]


@pytest.mark.slow
def test_crush_battery_scales():
    """The Crush-scale battery (bigger streams + the structurally
    distinct Crush families: overlapping serial/collision, Knuth runs,
    longest-head-run, sample-prod/mean/corr, walk last-return, Hamming
    blocks) passes for threefry."""
    from quinoa_tpu.rngtest import run_battery, Crush

    results, failed = run_battery(seed=1, battery=Crush)
    # TestU01 Crush's test count: 23 distinct families widened to 96
    # parameter instances (Crush.cpp sweeps sizes/dims/windows/lags)
    assert len(results) == len(Crush) == 96
    assert not failed, failed


def test_crush_families_reject_randu():
    """The new Crush families must have power against RANDU.  RANDU's
    documented failure modes are its low-order bits (65539 is odd: bit 0
    is constant, low-k bits cycle mod 2^k) and its 3-D lattice — so the
    shim extracts ints the way a naive user would (modulo), exactly what
    the bit-level families (HammingWeight2, LongestHeadRun) and the
    overlapping tests must catch."""

    class FakeKeyRandom:
        def __init__(self):
            self.state = 1

        def _raw(self, n):
            out = np.empty(n, dtype=np.int64)
            s = self.state
            for i in range(n):
                s = (65539 * s) % 2**31  # RANDU
                out[i] = s
            self.state = s
            return out

    shim = FakeKeyRandom()
    orig_uniform = jax.random.uniform
    orig_randint = jax.random.randint

    def fake_uniform(key, shape, dtype=None, **kw):
        import jax.numpy as jnp
        n = int(np.prod(shape))
        return jnp.asarray((shim._raw(n) / 2**31).reshape(shape))

    def fake_randint(key, shape, lo, hi, dtype=None, **kw):
        import jax.numpy as jnp
        n = int(np.prod(shape))
        vals = shim._raw(n) % (hi - lo) + lo
        return jnp.asarray(vals.reshape(shape))

    jax.random.uniform = fake_uniform
    jax.random.randint = fake_randint
    try:
        subset = [bat.serial_over, bat.collision_over,
                  bat.hamming_weight_blocks, bat.longest_head_run,
                  bat.runs_up, bat.walk_last_return]
        results, failed = run_battery(seed=0, battery=subset)
    finally:
        jax.random.uniform = orig_uniform
        jax.random.randint = orig_randint
    assert failed, [(r.name, r.pvalue) for r in results]


def test_distinct_crush_statistics_pass_threefry():
    """The genuinely distinct TestU01 statistics added for ledger
    fidelity (snpair_ClosePairs' NP min-distance law, smarsa_GCD's
    6/pi^2 k^-2 law, the sspectral_Fourier3-domain periodogram test)
    pass for threefry at Crush parameters."""
    import jax.random as jr

    key = jr.PRNGKey(11)
    r1 = bat.close_pairs(jr.fold_in(key, 1), n=2**9, t=2, reps=32)
    r2 = bat.close_pairs(jr.fold_in(key, 2), n=2**9, t=3, reps=32)
    r3 = bat.gcd_test(jr.fold_in(key, 3), n=2**16)
    r4 = bat.spectral_fourier(jr.fold_in(key, 4), nblocks=2**5, L=2**13)
    for r in (r1, r2, r3, r4):
        assert r.passed, (r.name, r.pvalue)


def test_distinct_crush_statistics_reject_randu():
    """Power check: RANDU through the naive-modulo shim has constant
    bit 0 (65539 odd, odd seed), so every extracted value is odd —
    smarsa_GCD sees P(gcd even) = 0 and the spectral test sees a
    degenerate all-ones bit sequence; both must fail decisively.
    ClosePairs attacks the 3-D lattice (points on 15 planes) the way
    TestU01's snpair family does."""

    class FakeKeyRandom:
        def __init__(self):
            self.state = 1

        def _raw(self, n):
            out = np.empty(n, dtype=np.int64)
            s = self.state
            for i in range(n):
                s = (65539 * s) % 2**31  # RANDU
                out[i] = s
            self.state = s
            return out

    shim = FakeKeyRandom()
    orig_uniform = jax.random.uniform
    orig_randint = jax.random.randint

    def fake_uniform(key, shape, dtype=None, **kw):
        import jax.numpy as jnp
        n = int(np.prod(shape))
        return jnp.asarray((shim._raw(n) / 2**31).reshape(shape))

    def fake_randint(key, shape, lo, hi, dtype=None, **kw):
        import jax.numpy as jnp
        n = int(np.prod(shape))
        vals = shim._raw(n) % (hi - lo) + lo
        return jnp.asarray(vals.reshape(shape))

    jax.random.uniform = fake_uniform
    jax.random.randint = fake_randint
    try:
        k = jax.random.PRNGKey(0)  # ignored by the shim; fold_in needs it
        rg = bat.gcd_test(k, n=2**14)
        rf = bat.spectral_fourier(k, nblocks=2**4, L=2**12)
        rc = bat.close_pairs(k, n=2**9, t=3, reps=24)
    finally:
        jax.random.uniform = orig_uniform
        jax.random.randint = orig_randint
    assert not rg.passed, rg
    assert not rf.passed, rf
    # ClosePairs is the lattice test: count it if it fires, but the
    # hard assertion is on the two bit-level statistics above
    failed = [r.name for r in (rg, rf, rc) if not r.passed]
    assert len(failed) >= 2, failed


def test_bigcrush_battery_structure():
    """BigCrush = the Crush families re-parameterized and enlarged
    (src/RNGTest/BigCrush.cpp structure); every entry callable and the
    battery strictly larger than Crush."""
    from quinoa_tpu.rngtest.battery import SmallCrush, Crush, BigCrush

    assert len(BigCrush) > len(Crush) > len(SmallCrush)
    assert len(BigCrush) >= 45


@pytest.mark.slow
def test_threefry_passes_bigcrush_sample():
    """A sample of the enlarged BigCrush entries passes for threefry."""
    import jax.random as jr

    from quinoa_tpu.rngtest.battery import BigCrush

    key = jr.PRNGKey(3)
    for idx in (25, 28, 33, 38, 42, 47):
        r = BigCrush[idx](jr.fold_in(key, idx))
        assert r.passed, (idx, r.name, r.pvalue)


def test_reference_rngtest_deck_per_rng(capsys):
    """The reference's SmallCrush_mixed.q subjects EACH deck rng to the
    battery (testu01suite.ci): the CLI runs one battery per rng entry,
    honoring per-rng seeds, with library rngs mapped to jax counter
    impls (r123_philox -> rbg; MKL/RNGSSE -> default threefry)."""
    from quinoa_tpu.cli import main

    rc = main(["rngtest", "-c",
               "/root/reference/tests/regression/rngtest/"
               "SmallCrush_mixed.q"])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("14/14 tests passed") == 3
    assert "rng=r123_philox (impl=rbg), seed=21234" in out
    assert "rng=mkl_mcg31" in out and "rng=rngsse_gm55" in out
