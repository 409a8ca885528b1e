"""Parallel-tempering PPDE (samplers/protein/pt.py) — beyond-reference.

The gold test here is stronger than the plain-PPDE one: with the FULL PT
machinery running (tempered PAS moves + alternating replica exchange),
EVERY temperature level must sample its own tempered Boltzmann
distribution pi_l ~ exp(beta_l * E) on an enumerable 256-state target.
A sign error in the exchange rule, a non-shared pair uniform, a wrong
parity alternation, or a beta leak into the carried grad all fail it.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppde_tpu import codec, energy as energy_mod, utils
from ppde_tpu.models import cnn, potts
from ppde_tpu.samplers import base
from ppde_tpu.samplers.protein import ppde, pt

WT = "ACDEFGHIKLMNPQRSTVWY"


def make_setup(lam=1.0, seed=0, n=16):
    pp = potts.synthetic(WT, min_pos=2, max_pos=17, seed=seed,
                         coupling_scale=0.1, field_scale=0.5)
    ens = cnn.init_ensemble(jax.random.PRNGKey(seed), 3, input_size=len(WT))
    wt_oh = jnp.asarray(codec.seqs_to_onehot([WT]))
    en = energy_mod.protein_poe(pp, ens, lam, wt_oh)
    oracle = (pp, lambda p, x: potts.score(p, x, delta=True))
    pop = jnp.repeat(wt_oh, n, axis=0)
    return en, oracle, pop, pp


def quad_energy(seed=3, L=4, V=4):
    rng = np.random.default_rng(seed)
    D = L * V
    J = rng.normal(0, 0.6, (D, D))
    J = (J + J.T) / 2
    for i in range(L):
        J[i * V:(i + 1) * V, i * V:(i + 1) * V] = 0.0
    h = rng.normal(0, 0.8, D)
    Jb = {"J": jnp.asarray(J.astype(np.float32)),
          "h": jnp.asarray(h.astype(np.float32))}

    def e_fn(p, x):
        xf = x.reshape(x.shape[0], -1)
        e = 0.5 * jnp.einsum("nd,de,ne->n", xf, p["J"], xf) + xf @ p["h"]
        return e, e

    def e_and_grad(p, x):
        e, _ = e_fn(p, x)
        xf = x.reshape(x.shape[0], -1)
        grad = (xf @ p["J"] + p["h"][None]).reshape(x.shape)
        return e, e, grad

    en = energy_mod.Energy(params=Jb, energy=e_fn,
                           energy_and_grad=e_and_grad,
                           fitness=lambda p, x: e_fn(p, x)[0])
    # enumerate all V^L states for exact moments
    toks = np.array(np.meshgrid(*([range(V)] * L),
                                indexing="ij")).reshape(L, -1).T
    states = np.eye(V, dtype=np.float32)[toks].reshape(-1, D)
    es = 0.5 * np.einsum("nd,de,ne->n", states, J, states) + states @ h
    return en, es, (L, V)


def exact_tempered_moments(es, beta):
    p = np.exp(beta * es - (beta * es).max())
    p /= p.sum()
    mean = (p * es).sum()
    std = np.sqrt((p * (es - mean) ** 2).sum())
    return mean, std


def test_ladder_shape_and_endpoints():
    cfg = pt.PTConfig(n_levels=4, beta_min=0.25)
    b = pt.ladder(32, cfg)
    assert b.shape == (32,)
    np.testing.assert_allclose(b[:8], 1.0)          # cold block
    np.testing.assert_allclose(b[-8:], 0.25)        # hot block
    assert np.all(np.diff(b) <= 0)                  # monotone ladder
    with pytest.raises(ValueError):
        pt.ladder(30, cfg)                          # 30 % 4 != 0
    with pytest.raises(ValueError):
        pt.ladder(32, pt.PTConfig(n_levels=4, beta_min=0.0))


def test_tempered_step_beta1_equals_plain_step():
    """make_step(tempered=True) with beta == 1 must be BIT-equal to the
    untempered step given the same key — tempering is a pure generalization."""
    en, oracle, pop, pp = make_setup()
    n, L, V = pop.shape
    window_ok = utils.position_window_mask(L, V, 2, 17)
    cfg = ppde.PPDEConfig(pas_length=2, nmut_threshold=5)
    e0, f0, g0 = en.energy_and_grad(en.params, pop)
    ctx = {"energy": en.params, "wt": pop[0], "init_x": pop,
           "wt_e": e0[0], "wt_fit": f0[0], "wt_grad": g0[0]}
    state = (pop, (e0, f0, g0), (e0, f0, pop))
    key = jax.random.PRNGKey(5)

    plain = ppde.make_step(en, cfg, window_ok, n, L, V)
    temp = ppde.make_step(en, cfg, window_ok, n, L, V, tempered=True)
    s1, y1 = jax.jit(plain)(ctx, state, key)
    s2, y2 = jax.jit(temp)(dict(ctx, beta=jnp.ones((n,))), state, key)
    for a, b in zip(jax.tree_util.tree_leaves((s1, y1)),
                    jax.tree_util.tree_leaves((s2, y2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pt_shapes_and_validity():
    en, oracle, pop, pp = make_setup(n=16)
    cfg = pt.PTConfig(pas_length=2, nmut_threshold=4, n_levels=4,
                      beta_min=0.3)
    res = pt.run(en, pop, num_steps=60, min_pos=2, max_pos=17,
                 oracle=oracle, cfg=cfg, key=jax.random.PRNGKey(7),
                 log_every=30, quiet=True)
    n, L, V = pop.shape
    assert res.best_x.shape == (n, L, V)
    assert res.energy_history.shape == (61, n)
    assert res.oracle_history.shape == (3, n)
    np.testing.assert_array_equal(res.final_x.sum(-1), np.ones((n, L)))
    np.testing.assert_array_equal(res.best_x.sum(-1), np.ones((n, L)))
    # window respected on every level, including hot ones
    wt = np.asarray(pop[0])
    assert (res.final_x[:, :2] == wt[None, :2]).all()
    assert (res.final_x[:, 18:] == wt[None, 18:]).all()
    # best never below a recorded (post-swap) history value
    assert np.all(res.best_energy >= res.energy_history.max(0) - 1e-4)


def test_pt_swaps_actually_happen():
    en, es, (L, V) = quad_energy()
    rng = np.random.default_rng(0)
    n = 32
    x0 = jax.nn.one_hot(jnp.asarray(rng.integers(0, V, (n, L))), V)
    cfg = pt.PTConfig(pas_length=1, n_levels=4, beta_min=0.3)
    window_ok = utils.position_window_mask(L, V, 0, L - 1)
    step = pt.make_pt_step(en, cfg, window_ok, n, L, V)
    ctx = {"energy": en.params, "wt": x0[0], "init_x": x0,
           "beta": jnp.asarray(pt.ladder(n, cfg))}
    e0, f0, g0 = en.energy_and_grad(en.params, x0)
    ctx["wt_e"], ctx["wt_fit"], ctx["wt_grad"] = e0[0], f0[0], g0[0]
    state = ((x0, (e0, f0, g0), (e0, f0, x0)), jnp.asarray(0, jnp.int32))

    def seg(state, keys):
        return jax.lax.scan(lambda s, k: step(ctx, s, k), state, keys)

    _, ys = jax.jit(seg)(state, jax.random.split(jax.random.PRNGKey(0), 200))
    assert int(np.asarray(ys["n_swapped"]).sum()) > 50


def test_pt_nmut_hard_constraint_all_levels():
    en, oracle, pop, pp = make_setup(n=16)
    cfg = pt.PTConfig(pas_length=3, nmut_threshold=3, n_levels=4,
                      beta_min=0.3)
    res = pt.run(en, pop, num_steps=60, min_pos=2, max_pos=17,
                 oracle=None, cfg=cfg, key=jax.random.PRNGKey(3),
                 log_every=30, quiet=True)
    wt = jnp.asarray(pop[0])
    d = np.asarray(utils.mut_distance(jnp.asarray(res.best_x), wt))
    assert d.max() <= 3


def test_pt_rejects_paper_mode():
    en, oracle, pop, pp = make_setup(n=16)
    with pytest.raises(ValueError):
        pt.run(en, pop, num_steps=4, min_pos=2, max_pos=17,
               cfg=pt.PTConfig(paper_results=True, n_levels=4), quiet=True)


def test_pt_deterministic_given_key():
    en, oracle, pop, pp = make_setup(n=16)
    cfg = pt.PTConfig(pas_length=2, n_levels=4, beta_min=0.3)
    r1 = pt.run(en, pop, num_steps=30, min_pos=2, max_pos=17, oracle=None,
                cfg=cfg, key=jax.random.PRNGKey(9), log_every=30, quiet=True)
    r2 = pt.run(en, pop, num_steps=30, min_pos=2, max_pos=17, oracle=None,
                cfg=cfg, key=jax.random.PRNGKey(9), log_every=30, quiet=True)
    np.testing.assert_array_equal(r1.final_x, r2.final_x)
    np.testing.assert_allclose(r1.energy_history, r2.energy_history)


def test_pt_resume_is_bit_exact(tmp_path):
    """PT carries extra scan state beyond plain PPDE (the swap-parity step
    counter); checkpoint/resume must restore it so the alternating even/odd
    exchange schedule continues exactly where it stopped."""
    en, oracle, pop, pp = make_setup(n=16)
    cfg = pt.PTConfig(pas_length=2, n_levels=4, beta_min=0.3)

    def go(n_steps, ck=None):
        return pt.run(en, pop, n_steps, min_pos=2, max_pos=17, oracle=oracle,
                      cfg=cfg, key=jax.random.PRNGKey(11), log_every=20,
                      quiet=True, checkpoint_dir=ck)

    ref = go(80)
    ck = str(tmp_path / "ck")
    go(40, ck=ck)
    resumed = go(80, ck=ck)
    np.testing.assert_array_equal(resumed.final_x, ref.final_x)
    np.testing.assert_array_equal(resumed.energy_history, ref.energy_history)
    np.testing.assert_array_equal(resumed.best_x, ref.best_x)
    np.testing.assert_array_equal(resumed.oracle_history, ref.oracle_history)


def test_pt_step_hlo_has_no_scatter_or_gather():
    en, oracle, pop, pp = make_setup(n=16)
    n, L, V = pop.shape
    cfg = pt.PTConfig(pas_length=2, nmut_threshold=5, n_levels=4)
    window_ok = utils.position_window_mask(L, V, 2, 17)
    step = pt.make_pt_step(en, cfg, window_ok, n, L, V)
    ctx = {"energy": en.params, "wt": pop[0], "init_x": pop,
           "beta": jnp.asarray(pt.ladder(n, cfg))}
    e0, f0, g0 = en.energy_and_grad(ctx["energy"], pop)
    ctx["wt_e"], ctx["wt_fit"], ctx["wt_grad"] = e0[0], f0[0], g0[0]
    state = ((pop, (e0, f0, g0), (e0, f0, pop)), jnp.asarray(0, jnp.int32))
    hlo = jax.jit(step).lower(ctx, state, jax.random.PRNGKey(0)).as_text()
    assert hlo.count("scatter(") == 0
    assert hlo.count("gather(") == 0


def two_basin_energy(L=6, V=4, a=1.0, b=1.2):
    """Deceptive two-mode landscape, quadratic in the one-hot encoding:
    E(x) = a*(#tokens==0)^2 + b*(#tokens==1)^2. Modes all-0 (E=a*L^2) and
    all-1 (E=b*L^2 — the better one); every single-site path between them
    passes an ~2aL-deep valley, so a beta=1 single-temperature chain
    started at all-0 is stuck behind an exp(-~10) acceptance wall while a
    beta=0.25 replica crosses freely."""
    D = L * V
    J = np.zeros((D, D), np.float32)
    for t, w in ((0, 2 * a), (1, 2 * b)):
        for i in range(L):
            for j in range(L):
                if i != j:
                    J[i * V + t, j * V + t] = w
    h = np.zeros(D, np.float32)
    h[0::V] = a                      # diagonal (i==i) terms of the squares
    h[1::V] = b
    Jb = {"J": jnp.asarray(J), "h": jnp.asarray(h)}

    def e_fn(p, x):
        xf = x.reshape(x.shape[0], -1)
        e = 0.5 * jnp.einsum("nd,de,ne->n", xf, p["J"], xf) + xf @ p["h"]
        return e, e

    def e_and_grad(p, x):
        e, _ = e_fn(p, x)
        xf = x.reshape(x.shape[0], -1)
        grad = (xf @ p["J"] + p["h"][None]).reshape(x.shape)
        return e, e, grad

    return energy_mod.Energy(params=Jb, energy=e_fn,
                             energy_and_grad=e_and_grad,
                             fitness=lambda p, x: e_fn(p, x)[0]), (L, V)


def test_pt_crosses_barrier_plain_ppde_cannot():
    """The PT value demonstration: on the two-basin target started in the
    WORSE mode, plain beta=1 PPDE stays trapped (acceptance wall ~exp(-10))
    while PT's hot replicas cross and exchange the better mode down to the
    cold block."""
    en, (L, V) = two_basin_energy()
    n_steps = 1500
    window_ok_args = dict(min_pos=0, max_pos=L - 1)
    x0 = jnp.tile(jax.nn.one_hot(jnp.zeros((L,), jnp.int32), V)[None],
                  (64, 1, 1))                            # all chains at all-0

    def frac_in_better_mode(final_x, sl):
        toks = np.asarray(final_x[sl]).argmax(-1)
        return float(np.mean((toks == 1).all(-1)))

    plain_cfg = ppde.PPDEConfig(pas_length=1)
    r_plain = ppde.run(en, x0, n_steps, oracle=None, cfg=plain_cfg,
                       key=jax.random.PRNGKey(2), log_every=n_steps,
                       quiet=True, **window_ok_args)
    pt_cfg = pt.PTConfig(pas_length=1, n_levels=4, beta_min=0.25)
    r_pt = pt.run(en, x0, n_steps, oracle=None, cfg=pt_cfg,
                  key=jax.random.PRNGKey(2), log_every=n_steps,
                  quiet=True, **window_ok_args)

    stuck = frac_in_better_mode(r_plain.final_x, slice(None))
    cold = frac_in_better_mode(r_pt.final_x, slice(0, 16))
    assert stuck < 0.2, f"plain PPDE unexpectedly crossed: {stuck}"
    assert cold > 0.6, f"PT cold block failed to reach the better mode: {cold}"


def test_pt_every_level_samples_its_tempered_boltzmann():
    """Gold test: run full PT on the enumerable 256-state quadratic target
    and check EACH level's empirical mean energy against the exact mean of
    pi_l ~ exp(beta_l * E), in units of that level's exact std."""
    en, es, (L, V) = quad_energy()
    K, M = 4, 16
    n = K * M
    cfg = pt.PTConfig(pas_length=1, n_levels=K, beta_min=0.25)
    rng = np.random.default_rng(5)
    x0 = jax.nn.one_hot(jnp.asarray(rng.integers(0, V, (n, L))), V)
    n_steps, burn = 3000, 600
    res = pt.run(en, x0, n_steps, min_pos=0, max_pos=L - 1, oracle=None,
                 cfg=cfg, key=jax.random.PRNGKey(11), log_every=n_steps,
                 quiet=True)
    betas = pt.ladder(n, cfg).reshape(K, M)[:, 0]
    hist = res.energy_history[burn:]                  # [steps, K*M]
    for lvl in range(K):
        mean_l, std_l = exact_tempered_moments(es, betas[lvl])
        emp = hist[:, lvl * M:(lvl + 1) * M].mean()
        gap = (emp - mean_l) / std_l
        assert abs(gap) < 0.15, (lvl, betas[lvl], gap)
