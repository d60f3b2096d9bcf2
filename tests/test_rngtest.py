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


def test_scomp_statistics_pass_threefry():
    """The scomp compression/complexity family (Crush.cpp:747,765):
    LinearComp's Jump (renewal N(n/4, n/8)) and Size (Geometric(1/2)
    chi^2) statistics plus the calibrated LempelZiv phrase-count law
    pass for threefry at reduced-but-real sample sizes."""
    import jax.random as jr

    key = jr.PRNGKey(17)
    rj = bat.linear_comp_jump(jr.fold_in(key, 1), n=2**14, r=0)
    rs = bat.linear_comp_size(jr.fold_in(key, 2), n=2**14, r=0)
    rz = bat.lempel_ziv(jr.fold_in(key, 3), k=18, r=0, s=30, reps=8)
    for r in (rj, rs, rz):
        assert r.passed, (r.name, r.pvalue)


def test_scomp_statistics_reject_degenerate(monkeypatch):
    """Power check on the scomp family's OWN failure mode (algorithmic
    compressibility/complexity, which no other battery family
    measures): an LFSR m-sequence — which LOOKS uniform to counting
    tests — has linear complexity 20 instead of ~n/2 (LinearComp
    collapses to a handful of jumps instead of n/4), and a
    short-period bit stream is maximally LZ78-compressible (phrase
    count thousands of sigma below the calibrated null)."""
    n = 2**14

    # degree-20 LFSR (x^20 + x^3 + 1): statistically uniform bits,
    # tiny linear complexity
    s = np.zeros(1 << 18, np.uint8)
    s[:20] = np.arange(20) % 2
    s[0] = 1
    for t in range(20, len(s)):
        s[t] = s[t - 20] ^ s[t - 17]
    lfsr_packed = np.packbits(s)

    # period-128 stream: the LZ78 dictionary absorbs the period and
    # phrases stop growing
    rng = np.random.default_rng(9)
    tile = rng.integers(0, 2, 128).astype(np.uint8)
    per_packed = np.packbits(np.tile(tile, (1 << 18) // 128))

    monkeypatch.setattr(bat, "_bit_stream",
                        lambda key, nbits, r=0, s=32: lfsr_packed)
    key = jax.random.PRNGKey(0)
    rj = bat.linear_comp_jump(key, n=n, r=0)
    monkeypatch.setattr(bat, "_bit_stream",
                        lambda key, nbits, r=0, s=32: per_packed)
    rz = bat.lempel_ziv(key, k=18, r=0, s=30, reps=4)
    assert not rj.passed, rj
    assert not rz.passed, rz
    assert rj.pvalue < 1e-10 and rz.pvalue < 1e-10, (rj, rz)


def test_scomp_in_batteries():
    """The Crush/BigCrush batteries carry the scomp instances at the
    reference's parameter points while keeping TestU01's instance
    counts (96/106), and the battery-embedded entries execute."""
    from quinoa_tpu.rngtest.battery import Crush, BigCrush

    assert len(Crush) == 96 and len(BigCrush) == 106

    def scomp_entries(battery):
        return [t for t in battery
                if {"linear_comp_jump", "linear_comp_size",
                    "lempel_ziv"} & set(t.__code__.co_names)]

    assert len(scomp_entries(Crush)) == 5     # Crush.cpp:747,765
    assert len(scomp_entries(BigCrush)) == 6  # BigCrush.cpp:860-886
    # one battery-embedded entry runs end-to-end (full Crush params are
    # exercised by the slow battery tests)
    import jax.random as jr

    r = scomp_entries(Crush)[0](jr.PRNGKey(5))
    assert r.passed, (r.name, r.pvalue)
