import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppde_tpu import codec, energy as energy_mod, utils
from ppde_tpu.models import cnn, potts
from ppde_tpu.samplers import base
from ppde_tpu.samplers.protein import ppde

WT = "ACDEFGHIKLMNPQRSTVWY"  # 20 residues


def make_setup(lam=1.0, seed=0):
    pp = potts.synthetic(WT, min_pos=2, max_pos=17, seed=seed,
                         coupling_scale=0.1, field_scale=0.5)
    ens = cnn.init_ensemble(jax.random.PRNGKey(seed), 3, input_size=len(WT))
    wt_oh = jnp.asarray(codec.seqs_to_onehot([WT]))
    en = energy_mod.protein_poe(pp, ens, lam, wt_oh)
    oracle = (pp, lambda p, x: potts.score(p, x, delta=True))
    pop = jnp.repeat(wt_oh, 16, axis=0)
    return en, oracle, pop, pp


def run_short(**kw):
    en, oracle, pop, pp = make_setup()
    cfg = ppde.PPDEConfig(**kw)
    return ppde.run(en, pop, num_steps=60, min_pos=2, max_pos=17,
                    oracle=oracle, cfg=cfg, key=jax.random.PRNGKey(7),
                    log_every=30, quiet=True), en, pop


def test_shapes_and_structure():
    res, en, pop = run_short(pas_length=2, nmut_threshold=4)
    n, L, V = pop.shape
    assert res.best_x.shape == (n, L, V)
    assert res.energy_history.shape == (61, n)
    assert res.fitness_history.shape == (61, n)
    assert res.final_x.shape == (n, L, V)
    assert res.oracle_history.shape == (3, n)
    assert res.random_traj.shape == (61, L, V)
    # all states remain valid one-hots
    np.testing.assert_array_equal(res.final_x.sum(-1), np.ones((n, L)))
    np.testing.assert_array_equal(res.best_x.sum(-1), np.ones((n, L)))


def test_best_tracking_consistency():
    res, _, _ = run_short(pas_length=2)
    # best energy equals the per-chain max of the recorded history
    np.testing.assert_allclose(res.best_energy,
                               res.energy_history.max(0), rtol=1e-4)
    assert np.all(res.best_energy >= res.energy_history[0] - 1e-5)


def test_window_respected():
    res, en, pop = run_short(pas_length=3)
    wt = np.asarray(pop[0])
    for x in (res.final_x, res.best_x):
        # no mutations outside [2, 17]
        assert (x[:, :2] == wt[None, :2]).all()
        assert (x[:, 18:] == wt[None, 18:]).all()


def test_nmut_hard_constraint():
    res, en, pop = run_short(pas_length=3, nmut_threshold=3)
    wt = jnp.asarray(pop[0])
    # recorded (pre-reset) states never exceed the budget
    d_best = np.asarray(utils.mut_distance(jnp.asarray(res.best_x), wt))
    assert d_best.max() <= 3
    # post-reset current states are strictly under it
    d_final = np.asarray(utils.mut_distance(jnp.asarray(res.final_x), wt))
    assert d_final.max() < 3


def test_energy_climbs_toward_shifted_optimum():
    """Fields peaked at a DIFFERENT sequence than the start state: the
    sampler must climb from the start toward the shifted optimum."""
    target = "CDEFGHIKLMNPQRSTVWYA"  # WT rotated by one letter
    pp = potts.synthetic(target, min_pos=2, max_pos=17, seed=0,
                         coupling_scale=0.05, field_scale=1.0)
    ens = cnn.init_ensemble(jax.random.PRNGKey(0), 3, input_size=len(WT))
    en = energy_mod.protein_poe(pp, ens, 0.1,
                                jnp.asarray(codec.seqs_to_onehot([WT])))
    pop = jnp.repeat(jnp.asarray(codec.seqs_to_onehot([WT])), 16, axis=0)
    res = ppde.run(en, pop, num_steps=80, min_pos=2, max_pos=17,
                   oracle=None, cfg=ppde.PPDEConfig(pas_length=2),
                   key=jax.random.PRNGKey(7), log_every=40, quiet=True)
    assert np.median(res.best_energy) > np.median(res.energy_history[0]) + 1.0


def test_acceptance_not_degenerate():
    res, _, _ = run_short(pas_length=2)
    total = res.n_accepted.sum()
    assert 0 < total < 60 * 16  # some accepts, not all


def test_paper_mode_resets_to_wt():
    res, en, pop = run_short(pas_length=2, paper_results=True)
    assert res.final_x.shape == pop.shape
    np.testing.assert_array_equal(res.final_x.sum(-1), 1.0)


def test_paper_mode_carried_state_consistent_with_heterogeneous_init():
    """In paper_results mode a rejected chain resets to its PER-CHAIN
    initial state; the carried (e, fit, grad) must track the actual chain
    state even when the initial population is heterogeneous (it used to
    fall back to the wild-type constants of chain 0)."""
    en, oracle, pop, pp = make_setup()
    n, L, V = pop.shape
    # heterogeneous init: mutate a window position of every chain but 0
    pop_np = np.asarray(pop).copy()
    rng = np.random.default_rng(0)
    for i in range(1, n):
        p = rng.integers(2, 18)
        pop_np[i, p] = 0.0
        pop_np[i, p, rng.integers(0, V)] = 1.0
    x0 = jnp.asarray(pop_np)

    cfg = ppde.PPDEConfig(pas_length=2, paper_results=True)
    window_ok = utils.position_window_mask(L, V, 2, 17)
    e0, fit0, grad0 = jax.jit(en.energy_and_grad)(en.params, x0)
    ctx = {"energy": en.params, "wt": x0[0], "init_x": x0,
           "wt_e": e0[0], "wt_fit": fit0[0], "wt_grad": grad0[0],
           "init_e": e0, "init_fit": fit0, "init_grad": grad0}
    step = jax.jit(ppde.make_step(en, cfg, window_ok, n, L, V))

    state = (x0, (e0, fit0, grad0), (e0, fit0, x0))
    saw_reject = False
    for i in range(12):
        state, ys = step(ctx, state, jax.random.PRNGKey(100 + i))
        x, (e, fit, g), _ = state
        saw_reject |= not bool(np.all(np.asarray(ys["accepted"])))
        e_chk, fit_chk, g_chk = jax.jit(en.energy_and_grad)(en.params, x)
        np.testing.assert_allclose(np.asarray(e), np.asarray(e_chk),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(fit), np.asarray(fit_chk),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_chk),
                                   rtol=1e-5, atol=1e-5)
    assert saw_reject  # the invariant was actually exercised on rejection


def test_deterministic_given_key():
    res1, _, _ = run_short(pas_length=2)
    res2, _, _ = run_short(pas_length=2)
    np.testing.assert_array_equal(res1.energy_history, res2.energy_history)
    np.testing.assert_array_equal(res1.best_x, res2.best_x)


def test_segment_lengths():
    assert base.segment_lengths(100, 30) == [30, 30, 30, 10]
    assert base.segment_lengths(60, 30) == [30, 30]
    assert base.segment_lengths(5, 50) == [5]


def _boltzmann_gap(pas_length, reference_reverse, seed=11):
    """|empirical mean energy - exact Boltzmann mean| / exact std on a tiny
    quadratic categorical energy with an enumerable (V^L = 256) state
    space, after running the full PAS machinery."""
    L, V = 4, 4
    rng = np.random.default_rng(3)
    D = L * V
    J = rng.normal(0, 0.6, (D, D))
    J = (J + J.T) / 2
    for i in range(L):  # no self-interactions within a position
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

    n_chains, n_steps, burn = 64, 2500, 500
    x0 = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, V, (n_chains, L))), V)
    res = ppde.run(en, x0, n_steps, min_pos=0, max_pos=L - 1, oracle=None,
                   cfg=ppde.PPDEConfig(pas_length=pas_length,
                                       reference_reverse=reference_reverse),
                   key=jax.random.PRNGKey(seed), log_every=n_steps,
                   quiet=True)

    toks = np.array(np.meshgrid(*([range(V)] * L),
                                indexing="ij")).reshape(L, -1).T
    states = np.eye(V, dtype=np.float32)[toks].reshape(-1, D)
    es = 0.5 * np.einsum("nd,de,ne->n", states, J, states) + states @ h
    p = np.exp(es - es.max())
    p /= p.sum()
    exact_mean = (p * es).sum()
    exact_std = np.sqrt((p * (es - exact_mean) ** 2).sum())
    emp_mean = res.energy_history[burn:].mean()
    return (emp_mean - exact_mean) / exact_std


@pytest.mark.parametrize("pas_length", [1, 2])
def test_pas_boltzmann_stationarity(pas_length):
    """Gold test: the full factored PAS machinery (forward path sampling,
    reverse-move log-ratio, MH accept, carried energy/grad) must sample
    the exact Boltzmann distribution pi(x) ~ exp(E(x))."""
    gap = _boltzmann_gap(pas_length, reference_reverse=False)
    assert abs(gap) < 0.12, gap


def test_reference_reverse_mode_is_biased():
    """The reference evaluates reverse log-probs at the FORWARD indices
    (gathered logit identically 0) — not a valid MH involution. This test
    pins the measured consequence: a systematic high-energy bias several
    times our stationarity tolerance. Documents WHY reference_reverse
    defaults to False."""
    gap = _boltzmann_gap(2, reference_reverse=True)
    assert gap > 0.3, gap  # biased hot by > 0.3 exact-std


def test_step_hlo_has_no_scatter_or_gather():
    """The step must lower without scatter/gather HLOs: XLA serializes both
    on TPU, and a take_along_axis/.at[].set formulation measured 2x slower
    than even the dense [N, L*V] path it replaced (PERF.md)."""
    en, oracle, pop, pp = make_setup()
    n, L, V = pop.shape
    window_ok = utils.position_window_mask(L, V, 2, 17)
    step = ppde.make_step(en, ppde.PPDEConfig(nmut_threshold=5), window_ok,
                          n, L, V)
    ctx = {"energy": en.params, "wt": pop[0], "init_x": pop}
    e0, f0, g0 = en.energy_and_grad(ctx["energy"], pop)
    ctx["wt_e"], ctx["wt_fit"], ctx["wt_grad"] = e0[0], f0[0], g0[0]
    state = (pop, (e0, f0, g0), (e0, f0, pop))
    hlo = jax.jit(step).lower(ctx, state, jax.random.PRNGKey(0)).as_text()
    assert hlo.count("scatter(") == 0, "scatter crept into the step HLO"
    assert hlo.count("gather(") == 0, "gather crept into the step HLO"


def test_factored_proposals_match_dense_spec():
    """The factored (position, value) proposal used by make_step must equal
    the dense masked-softmax over [L*V] Taylor logits (the reference's
    formulation, protein ppde.py:86-111) — same logZ and same per-index
    log-probs, in both the normal and the over-budget (revert-only) regime.
    """
    n, L, V, temp, nmut = 6, 9, 20, 2.0, 3
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    grad = jax.random.normal(k1, (n, L, V)) * 3.0
    wt_tok = jax.random.randint(k2, (L,), 0, V)
    wt = jax.nn.one_hot(wt_tok, V)
    window_ok = utils.position_window_mask(L, V, 1, L - 2)
    # chains 0..2 under budget (1 mutation), chains 3..5 at/over (3-4)
    tok = jnp.tile(wt_tok[None], (n, 1))
    muts = [(0, 1), (1, 2), (2, 3), (3, 1), (3, 2), (3, 3),
            (4, 1), (4, 2), (4, 4), (5, 1), (5, 2), (5, 5), (5, 6)]
    for c, p in muts:
        tok = tok.at[c, p].set((wt_tok[p] + 1 + c) % V)
    x = jax.nn.one_hot(tok, V)

    # dense spec (reference formulation)
    score = grad - jnp.sum(grad * x, axis=-1, keepdims=True)
    dense = utils.apply_proposal_masks(score.reshape(n, L * V) / temp,
                                       x, wt, window_ok, nmut)
    dense_logZ = jax.nn.logsumexp(dense, axis=-1)

    # factored quantities, exactly as make_step builds them
    gx = grad / temp
    v_logits = jnp.where(window_ok[None], gx, utils.NEG_INF)
    lA = jax.nn.logsumexp(v_logits, axis=-1)
    g_wt = jnp.take_along_axis(
        gx, jnp.broadcast_to(wt_tok[None, :, None], (n, L, 1)), 2)[..., 0]
    g_tok = jnp.take_along_axis(gx, tok[..., None], 2)[..., 0]
    wt_in_win = jnp.take_along_axis(window_ok, wt_tok[:, None], 1)[:, 0]
    dist = jnp.sum((tok != wt_tok[None]).astype(jnp.int32), -1)
    over = dist >= nmut
    mut = tok != wt_tok[None]
    lw = jnp.where(over[:, None],
                   jnp.where(mut & wt_in_win[None], g_wt - g_tok,
                             utils.NEG_INF),
                   lA - g_tok)

    # same normalizer
    np.testing.assert_allclose(np.asarray(jax.nn.logsumexp(lw, -1)),
                               np.asarray(dense_logZ), rtol=1e-5)
    # same log-prob at every allowed index
    dense_lp = jax.nn.log_softmax(dense, axis=-1).reshape(n, L, V)
    lp_pos = jax.nn.log_softmax(lw, axis=-1)
    lp_val = jax.nn.log_softmax(v_logits, axis=-1)
    for c in range(n):
        for p in range(L):
            for v in range(V):
                d = float(dense_lp[c, p, v])
                if d < -1e20:
                    continue  # masked
                if over[c]:
                    f = float(lp_pos[c, p])  # deterministic value branch
                else:
                    f = float(lp_pos[c, p]) + float(lp_val[c, p, v])
                assert abs(d - f) < 1e-4, (c, p, v, d, f)

    # reverse: -logZ identity against dense unmasked reverse logits
    grad_y = jax.random.normal(k3, (n, L, V)) * 2.0
    rev_score = grad_y - jnp.sum(grad_y * x, axis=-1, keepdims=True)
    rev_dense = rev_score.reshape(n, L * V) / 2.0
    idx_moved = tok[:, 4] + 4 * V  # index of position 4 at its CURRENT token
    picked = jax.vmap(utils.categorical_log_prob)(rev_dense[:, None],
                                                  idx_moved[:, None])[:, 0]
    gy = grad_y / 2.0
    lsY = jax.nn.logsumexp(gy, axis=-1)
    gy_tok = jnp.take_along_axis(gy, tok[..., None], 2)[..., 0]
    fact = -jax.nn.logsumexp(lsY - gy_tok, axis=-1)
    np.testing.assert_allclose(np.asarray(picked), np.asarray(fact),
                               rtol=1e-5)
