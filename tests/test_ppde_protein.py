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


def test_deterministic_given_key():
    res1, _, _ = run_short(pas_length=2)
    res2, _, _ = run_short(pas_length=2)
    np.testing.assert_array_equal(res1.energy_history, res2.energy_history)
    np.testing.assert_array_equal(res1.best_x, res2.best_x)


def test_segment_lengths():
    assert base.segment_lengths(100, 30) == [30, 30, 30, 10]
    assert base.segment_lengths(60, 30) == [30, 30]
    assert base.segment_lengths(5, 50) == [5]
