"""walker tests: SDE stationary statistics, coupled Langevin family,
moments, PDFs, sharded ensembles.

Mirrors the reference's RNG statistical sanity tests (tests/unit/RNG/
TestRNG.hpp checks means/variances of draws) and the walker regression
suites (12 SDE systems with stationary-moment baselines).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from quinoa_tpu.diffeq import (
    DiagOrnsteinUhlenbeck,
    OrnsteinUhlenbeck,
    Beta,
    Dirichlet,
    Gamma,
    SkewNormal,
    WrightFisher,
    NumberFractionBeta,
    MixNumberFractionBeta,
    GeneralizedDirichlet,
    Position,
    Dissipation,
    Velocity,
    init_jointgaussian,
    init_jointbeta,
    init_jointdelta,
)
from quinoa_tpu.walker import Walker
from quinoa_tpu.statistics import mean, variance, estimate_pdf


def test_diag_ou_stationary():
    """OU stationary law: mean mu, variance sigma^2/(2 theta)."""
    sde = DiagOrnsteinUhlenbeck(
        depvar="y", sigmasq=(0.25,), theta=(1.0,), mu=(1.5,)
    )
    sde.init = lambda k, n: init_jointgaussian(k, n, [(1.5, 0.1)])
    w = Walker(Walker.layout([sde]), npar=20000, dt=0.05, seed=1,
               ordinary=[mean("y", 0)], central=[variance("y", 0)])
    P, hist = w.run(200, stat_every=200)
    _, mom = hist[-1]
    assert abs(mom[(("y", 0),)] - 1.5) < 0.02
    assert abs(mom[("C", ("y", 0), ("y", 0))] - 0.125) < 0.01


def test_full_ou_offdiagonal_cov():
    """Full-matrix OU produces correlated components."""
    cov = ((0.25, 0.15), (0.15, 0.25))
    sde = OrnsteinUhlenbeck(depvar="y", sigmasq=cov, theta=(1.0, 1.0),
                            mu=(0.0, 0.0))
    sde.init = lambda k, n: init_jointgaussian(k, n, [(0.0, 0.1), (0.0, 0.1)])
    w = Walker(Walker.layout([sde]), npar=20000, dt=0.05, seed=2)
    P, _ = w.run(150)
    Y = np.asarray(P[:, :2])
    c = np.cov(Y.T)
    # stationary covariance = cov/(2 theta)
    assert abs(c[0, 1] - 0.075) < 0.01
    assert abs(c[0, 0] - 0.125) < 0.015


@pytest.mark.slow
def test_beta_bounded_and_moments():
    """Beta SDE stays in [0,1]; stationary law is Beta(a,b) with
    a = b*S/k, b_ = b*(1-S)/k."""
    b, S, k = 1.0, 0.6, 0.1
    sde = Beta(depvar="y", b=(b,), S=(S,), kappa=(k,))
    sde.init = lambda kk, n: init_jointbeta(kk, n, [(2.0, 2.0, 0.0, 1.0)])
    w = Walker(Walker.layout([sde]), npar=20000, dt=0.02, seed=3)
    P, _ = w.run(600)  # t=12 >> relaxation time 2/b
    Y = np.asarray(P[:, 0])
    assert Y.min() >= -0.05 and Y.max() <= 1.05
    a_ = b * S / k
    b_ = b * (1.0 - S) / k
    exact_mean = a_ / (a_ + b_)
    exact_var = a_ * b_ / ((a_ + b_) ** 2 * (a_ + b_ + 1.0))
    assert abs(Y.mean() - exact_mean) < 0.02
    assert abs(Y.var() - exact_var) < 0.01


def test_dirichlet_simplex():
    """Dirichlet SDE: fractions stay near the simplex; stationary means
    follow the Dirichlet distribution S-parameterization."""
    sde = Dirichlet(depvar="y", b=(1.0, 1.5), S=(0.4, 0.4), kappa=(0.5, 0.7))
    sde.init = lambda k, n: init_jointdelta(
        k, n, [[(0.3, 1.0)], [(0.3, 1.0)]]
    )
    w = Walker(Walker.layout([sde]), npar=10000, dt=0.01, seed=4)
    P, _ = w.run(300)
    Y = np.asarray(P[:, :2])
    yn = 1.0 - Y.sum(axis=1)
    assert Y.min() > -0.05
    assert yn.min() > -0.05


def test_gamma_positive():
    sde = Gamma(depvar="y", b=(1.5,), S=(0.6,), kappa=(0.5,))
    sde.init = lambda k, n: init_jointgaussian(k, n, [(1.0, 0.01)])
    w = Walker(Walker.layout([sde]), npar=10000, dt=0.02, seed=5)
    P, _ = w.run(600)  # t=12 >> relaxation time 1/(b(1-S)/2) = 3.3
    Y = np.asarray(P[:, 0])
    assert Y.min() > -0.1
    # stationary gamma: mean = S/(1-S)
    assert abs(Y.mean() - 0.6 / 0.4) < 0.1


def test_skewnormal_runs():
    sde = SkewNormal(depvar="y", T=(1.0,), sigmasq=(0.04,), lam=(2.0,))
    sde.init = lambda k, n: init_jointgaussian(k, n, [(0.0, 0.04)])
    w = Walker(Walker.layout([sde]), npar=5000, dt=0.01, seed=6)
    P, _ = w.run(100)
    Y = np.asarray(P[:, 0])
    assert np.isfinite(Y).all()
    assert abs(Y.mean()) < 1.0


def test_wright_fisher_conserves_sum():
    sde = WrightFisher(depvar="y", omega=(0.25, 0.5, 0.25))
    sde.init = lambda k, n: init_jointdelta(
        k, n, [[(0.3, 1.0)], [(0.4, 1.0)], [(0.3, 1.0)]]
    )
    w = Walker(Walker.layout([sde]), npar=2000, dt=0.005, seed=7)
    P, _ = w.run(50)
    Y = np.asarray(P[:, :3])
    assert np.isfinite(Y).all()
    # the drift/diffusion preserve sum(Y)=1 in expectation
    assert abs(Y.sum(axis=1).mean() - 1.0) < 0.05


@pytest.mark.slow
def test_number_fraction_beta_derived():
    sde = NumberFractionBeta(
        depvar="x", b=(0.4,), S=(0.5,), kappa=(0.1,), rho2=(2.0,), rcomma=(0.3,)
    )
    sde.init = lambda k, n: init_jointbeta(k, n, [(2.0, 2.0, 0.0, 1.0)])
    w = Walker(Walker.layout([sde]), npar=2000, dt=0.02, seed=8)
    P, _ = w.run(50)
    X = np.asarray(P[:, 0])
    rho = np.asarray(P[:, 1])
    vol = np.asarray(P[:, 2])
    assert np.allclose(rho, 2.0 * (1.0 - 0.3 * X), atol=1e-12)
    assert np.allclose(vol, 1.0 / rho, atol=1e-12)


def test_mix_beta_decays_variance():
    """DECAY policy: variance of X must decrease (mixing)."""
    sde = MixNumberFractionBeta(
        depvar="x", bprime=(2.0,), S=(0.5,), kprime=(0.5,),
        rho2=(1.0,), rcomma=(0.5,)
    )
    sde.init = lambda k, n: init_jointdelta(
        k, n, [[(0.05, 0.5), (0.95, 0.5)]]
    )
    w = Walker(Walker.layout([sde]), npar=10000, dt=0.01, seed=9)
    P0 = w.initialize()
    v0 = float(jnp.var(P0[:, 0]))
    P, _ = w.run(1000, P=P0)
    v1 = float(jnp.var(P[:, 0]))
    assert v1 < v0 * 0.7, (v0, v1)


def test_gendir_runs():
    sde = GeneralizedDirichlet(
        depvar="y", b=(0.1, 1.5), S=(0.3, 0.45), kappa=(0.1, 0.3),
        cij=(0.1,)
    )
    sde.init = lambda k, n: init_jointdelta(k, n, [[(0.4, 1.0)], [(0.4, 1.0)]])
    w = Walker(Walker.layout([sde]), npar=2000, dt=0.005, seed=10)
    P, _ = w.run(100)
    assert np.isfinite(np.asarray(P[:, :2])).all()


def test_langevin_family_coupled():
    """Position + Velocity + Dissipation coupled system (the reference's
    CoupledEq velocity<->dissipation<->position setup) stays finite and
    develops turbulence-like statistics."""
    pos = Position(depvar="x")
    vel = Velocity(depvar="u", c0=2.1)
    dis = Dissipation(depvar="o", c3=1.0, c4=0.25)
    systems = Walker.layout([pos, vel, dis])
    # wire the couplings by offset
    pos.velocity_offset = vel.offset
    vel.dissipation_offset = dis.offset
    dis.velocity_offset = vel.offset

    pos.init = lambda k, n: init_jointgaussian(k, n, [(0.0, 1.0)] * 3)
    vel.init = lambda k, n: init_jointgaussian(k, n, [(0.0, 0.5)] * 3)
    dis.init = lambda k, n: init_jointgaussian(k, n, [(1.0, 0.01)])

    w = Walker(systems, npar=5000, dt=0.005, seed=11)
    P, _ = w.run(100)
    assert np.isfinite(np.asarray(P)).all()
    O = np.asarray(P[:, dis.offset])
    assert O.mean() > 0.0


def test_pdf_estimation():
    sde = DiagOrnsteinUhlenbeck(depvar="y", sigmasq=(0.5,), theta=(1.0,),
                                mu=(0.0,))
    sde.init = lambda k, n: init_jointgaussian(k, n, [(0.0, 0.25)])
    w = Walker(Walker.layout([sde]), npar=50000, dt=0.05, seed=12)
    P, _ = w.run(100)
    pdf = w.pdf(P, (("y", 0),), binsize=[0.1])
    assert pdf.nsamples == 50000
    # gaussian-ish: density near 0 close to 1/sqrt(2 pi 0.25)
    dens = pdf.density()
    i0 = int(round((0.0 - pdf.lo) / pdf.binsize))
    expect = 1.0 / np.sqrt(2 * np.pi * 0.25)
    assert abs(dens[i0] - expect) < 0.1


def test_walker_sharded_matches_serial():
    """Sharding the particle axis over 8 devices gives the same statistics
    (data-parallel: XLA inserts the psum for the means)."""
    def build(mesh):
        sde = DiagOrnsteinUhlenbeck(depvar="y", sigmasq=(0.25,),
                                    theta=(1.0,), mu=(1.0,))
        sde.init = lambda k, n: init_jointgaussian(k, n, [(1.0, 0.1)])
        return Walker(Walker.layout([sde]), npar=16000, dt=0.05, seed=13,
                      mesh=mesh)

    w1 = build(None)
    P1, _ = w1.run(50)

    mesh = Mesh(np.array(jax.devices()[:8]), ("par",))
    w8 = build(mesh)
    P8, _ = w8.run(50)

    # identical keys -> identical trajectories regardless of sharding
    assert np.allclose(np.asarray(P1[:, 0]), np.asarray(P8[:, 0]), atol=1e-12)


def test_deck_rng_seed_honored():
    """`<rng> seed N end` in the rngs block seeds the stream: different
    deck seeds give different trajectories, same seed reproduces."""
    from quinoa_tpu.control.config import load_walker, build_walker
    import numpy as np

    base = """
    walker
      term 0.05  dt 0.01  npar 200
      rngs  r123_philox seed %d end  end
      diag_ou
        depvar o  ncomp 2  init zero  coeff const
        sigmasq 0.25 1.0 end  theta 1.0 1.0 end  mu 0.0 1.5 end
      end
      statistics interval 1 <o1o1> end
    end
    """
    outs = {}
    for sd in (1, 2, 1):
        cfg = load_walker(base % sd)
        assert cfg.rng_seed == sd
        w = build_walker(cfg, seed=cfg.rng_seed)
        P, _ = w.run(3, P=w.initialize())
        outs.setdefault(sd, []).append(np.asarray(P))
    assert np.allclose(outs[1][0], outs[1][1])  # reproducible
    assert not np.allclose(outs[1][0], outs[2][0])  # seed matters


@pytest.mark.slow
def test_cli_walker_npes(tmp_path, monkeypatch):
    """walker --npes 4 runs the deck with the ensemble sharded over the
    virtual mesh and produces finite moments (data-parallel psums)."""
    import numpy as np

    from quinoa_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    deck = ("/root/reference/tests/regression/walker/"
            "DiagOrnsteinUhlenbeck/diagou.q")
    import re

    text = re.sub(r"npar\s+\d+", "npar 4000",
                  re.sub(r"term\s+\S+", "term 0.02",
                         open(deck).read()))
    (tmp_path / "d.q").write_text(text)
    assert main(["walker", "-c", "d.q", "--stat", "s4.txt",
                 "--npes", "4"]) == 0
    assert main(["walker", "-c", "d.q", "--stat", "s1.txt"]) == 0
    a = [l.split() for l in open("s1.txt") if not l.startswith("#")]
    b = [l.split() for l in open("s4.txt") if not l.startswith("#")]
    a = np.array(a, float)
    b = np.array(b, float)
    # identical PRNG keys -> identical trajectories regardless of
    # sharding (counter-based threefry)
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-14)


def test_pdf_output_options(tmp_path, monkeypatch):
    """TxtFloatFormat (format/precision), PDFPolicy (multiple), and
    PDFCentering (node) from the pdfs block are honored
    (PDFWriter.cpp:25-48, Distributor.cpp:405-411)."""
    from quinoa_tpu.cli import main

    deck = tmp_path / "w.q"
    deck.write_text("""
    walker
      term 0.02  dt 0.01  npar 500  ttyi 10
      rngs r123_threefry end end
      diag_ou
        depvar o  ncomp 2  init zero  coeff const
        sigmasq 0.25 1.0 end  theta 1.0 1.0 end  mu 0.0 1.5 end
        rng r123_threefry
      end
      statistics interval 1 <o1o1> end
      pdfs
        interval 2
        filetype txt
        format scientific
        precision 4
        policy multiple
        p1( o1 : 0.2 ; -2 2 )
      end
    end
    """)
    monkeypatch.chdir(tmp_path)
    assert main(["walker", "-c", str(deck), "--stat", "stat.txt"]) == 0
    outs = sorted(tmp_path.glob("p1_*.txt"))
    assert outs, "policy multiple must write time-stamped pdf files"
    body = [l for l in open(outs[-1]) if not l.startswith("#")]
    assert body
    for tok in body[0].split():
        mant, _, _ = tok.partition("e")
        assert len(mant.split(".")[1]) == 4  # %.4e formatting

    # gmsh node centering emits $NodeData instead of $ElementData
    from quinoa_tpu.io import write_pdf_gmsh
    from quinoa_tpu.control.config import load_walker, build_walker

    cfg = load_walker(deck.read_text())
    w = build_walker(cfg, seed=2)
    P = w.initialize()
    pdf = w.pdf(P, (("o", 0), ("o", 1)), [0.25, 0.25], None)
    write_pdf_gmsh(str(tmp_path / "bi.msh"), pdf, centering="node")
    txt = (tmp_path / "bi.msh").read_text()
    assert "$NodeData" in txt and "$ElementData" not in txt
