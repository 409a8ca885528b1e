import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppde_tpu import energy as energy_mod
from ppde_tpu.models import mnist_nets
from ppde_tpu.samplers.mnist import cmaes, mala_approx, ppde, sa


@pytest.fixture(scope="module")
def setup():
    ens = mnist_nets.regression_init_ensemble(jax.random.PRNGKey(0), 2, nc=4)
    ebm = mnist_nets.ebm_init(jax.random.PRNGKey(1), n_channels=4,
                              mean=0.3 * np.ones(784, np.float32))
    en = energy_mod.mnist_poe(ebm, ens, lam=1.0, unsup_kind="ebm")
    oracle_params = mnist_nets.regression_init(jax.random.PRNGKey(2), nc=4)
    oracle = (oracle_params,
              lambda p, x2, x1: mnist_nets.regression_apply(p, x1, x2))
    rng = np.random.default_rng(0)
    x1 = (rng.random((6, 784)) > 0.7).astype(np.float32)
    x2 = (rng.random((6, 784)) > 0.7).astype(np.float32)
    pop = jnp.asarray(np.concatenate([x1, x2], 1))
    return en, oracle, pop


def check_common(res, pop):
    n = pop.shape[0]
    assert res.final_x.shape == (n, 784)
    assert set(np.unique(res.final_x)).issubset({0.0, 1.0})
    assert res.best_x.shape == (n, 784)
    assert np.all(np.isfinite(res.best_energy))


def test_ppde_pas_run(setup):
    en, oracle, pop = setup
    res = ppde.run(en, pop, 20, oracle=oracle,
                   cfg=ppde.MNISTPPDEConfig(pas_length=3),
                   key=jax.random.PRNGKey(0), log_every=10, quiet=True)
    check_common(res, pop)
    assert res.energy_history.shape == (21, 6)
    assert res.random_traj.shape == (21, 784)
    np.testing.assert_allclose(res.best_energy, res.energy_history.max(0),
                               rtol=1e-4)


def test_ppde_gwg_run(setup):
    en, oracle, pop = setup
    res = ppde.run(en, pop, 20, oracle=oracle,
                   cfg=ppde.MNISTPPDEConfig(pas_length=0, gwg_samples=3),
                   key=jax.random.PRNGKey(1), log_every=10, quiet=True)
    check_common(res, pop)
    # GWG proposals flip up to 2*gwg_samples-1 pixels per step
    assert res.n_accepted.sum() > 0


def test_gwg_single_flip_changes_one_pixel(setup):
    en, oracle, pop = setup
    res = ppde.run(en, pop, 1, oracle=None,
                   cfg=ppde.MNISTPPDEConfig(pas_length=0, gwg_samples=1),
                   key=jax.random.PRNGKey(2), log_every=1, quiet=True)
    x2 = np.asarray(pop[:, 784:])
    diff = (res.final_x != x2).sum(-1)
    assert np.all(diff <= 1)  # accepted chains flip exactly 1 pixel


def test_sa_run(setup):
    en, oracle, pop = setup
    res = sa.run(en, pop, 20, oracle=oracle,
                 cfg=sa.MNISTSAConfig(temp=10.0),
                 key=jax.random.PRNGKey(3), log_every=10, quiet=True)
    check_common(res, pop)


def test_mala_run(setup):
    en, oracle, pop = setup
    res = mala_approx.run(en, pop, 20, oracle=oracle,
                          cfg=mala_approx.MNISTMALAConfig(step_size=0.1),
                          key=jax.random.PRNGKey(4), log_every=10, quiet=True)
    check_common(res, pop)


def test_cmaes_run(setup):
    en, oracle, pop = setup
    res = cmaes.run(en, pop, 12, oracle=oracle,
                    cfg=cmaes.MNISTCMAESConfig(population_size=6),
                    log_every=6, quiet=True)
    check_common(res, pop)
    # best sorted by energy descending
    assert np.all(np.diff(res.best_energy) <= 1e-6)


def test_cmaes_resume_is_bit_exact(setup, tmp_path):
    """MNIST CMA-ES honors checkpoint_dir with bit-exact host-state resume
    (framework contract parity with samplers/protein/cmaes.py)."""
    en, oracle, pop = setup
    kw = dict(oracle=oracle, cfg=cmaes.MNISTCMAESConfig(population_size=6),
              log_every=6, quiet=True, seed=7)
    ref = cmaes.run(en, pop, 18, **kw)

    ck = str(tmp_path / "ck")
    cmaes.run(en, pop, 12, checkpoint_dir=ck, **kw)
    import os
    assert os.path.exists(os.path.join(ck, "cmaes_state.npz"))
    resumed = cmaes.run(en, pop, 18, checkpoint_dir=ck, **kw)

    np.testing.assert_array_equal(resumed.final_x, ref.final_x)
    np.testing.assert_array_equal(resumed.energy_history, ref.energy_history)
    np.testing.assert_array_equal(resumed.fitness_history, ref.fitness_history)
    np.testing.assert_array_equal(resumed.oracle_history, ref.oracle_history)
    np.testing.assert_array_equal(resumed.best_x, ref.best_x)


def quad_binary_energy(D=5, seed=0):
    """Tiny quadratic binary energy with enumerable exact moments."""
    rng = np.random.default_rng(seed)
    W = rng.normal(0, 1.0, (D, D))
    W = (W + W.T) / 2
    np.fill_diagonal(W, 0)
    b = rng.normal(0, 1.0, D)

    Wb = {"W": jnp.asarray(W.astype(np.float32)),
          "b": jnp.asarray(b.astype(np.float32))}

    def e_fn(p, x2, x1):
        e = 0.5 * jnp.einsum("nd,de,ne->n", x2, p["W"], x2) + x2 @ p["b"]
        return e, e

    def e_and_grad(p, x2, x1):
        e, _ = e_fn(p, x2, x1)
        grad = x2 @ p["W"] + p["b"][None]
        return e, e, grad

    en = energy_mod.Energy(params=Wb, energy=e_fn, energy_and_grad=e_and_grad,
                           fitness=lambda p, x2, x1: e_fn(p, x2, x1)[0])
    states = np.array(np.meshgrid(*([[0, 1]] * D))).reshape(D, -1).T
    es = 0.5 * np.einsum("nd,de,ne->n", states, W, states) + states @ b
    return en, es


def test_gwg_boltzmann_stationarity():
    """Gold test: single-flip GWG must sample the exact Boltzmann
    distribution of a tiny quadratic binary energy (detailed balance of the
    full propose/accept machinery)."""
    D = 5
    en, es = quad_binary_energy(D)
    rng = np.random.default_rng(0)

    n_chains, n_steps, burn = 64, 1500, 300
    x0 = (rng.random((n_chains, D)) > 0.5).astype(np.float32)
    pop = jnp.asarray(np.concatenate([x0, x0], 1))
    res = ppde.run(en, pop, n_steps, oracle=None,
                   cfg=ppde.MNISTPPDEConfig(pas_length=0, gwg_samples=1),
                   key=jax.random.PRNGKey(9), log_every=n_steps, quiet=True)

    # empirical state distribution from the recorded energies is awkward;
    # instead re-run capturing trajectories via the single tracked chain of
    # many independent short runs is costly — use energy moments: compare
    # E[energy] under empirical samples vs exact Boltzmann.
    p = np.exp(es - es.max())
    p /= p.sum()
    exact_mean_e = (p * es).sum()
    emp_mean_e = res.energy_history[burn:].mean()
    assert abs(emp_mean_e - exact_mean_e) < 0.15, (emp_mean_e, exact_mean_e)


def test_mnist_tempered_step_beta1_equals_plain(setup):
    """_make_step_{pas,gwg}(tempered=True) with beta == 1 must be BIT-equal
    to the untempered step given the same key."""
    en, oracle, pop = setup
    n, D = pop.shape[0], pop.shape[1] // 2
    x1, x2 = pop[:, :D], pop[:, D:]
    e0, f0, g0 = en.energy_and_grad(en.params, x2, x1)
    state = (x2, (e0, f0, g0), (e0, f0, x2))
    key = jax.random.PRNGKey(4)
    for make, cfg in [
        (ppde._make_step_pas, ppde.MNISTPPDEConfig(pas_length=3)),
        (ppde._make_step_gwg, ppde.MNISTPPDEConfig(pas_length=0,
                                                   gwg_samples=2)),
    ]:
        ctx = {"energy": en.params, "x1": x1}
        plain = make(en, cfg, n, D)
        temp = make(en, cfg, n, D, tempered=True)
        s1, y1 = jax.jit(plain)(ctx, state, key)
        s2, y2 = jax.jit(temp)(dict(ctx, beta=jnp.ones((n,))), state, key)
        for a, b in zip(jax.tree_util.tree_leaves((s1, y1)),
                        jax.tree_util.tree_leaves((s2, y2))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mnist_pt_rejects_heterogeneous_x1():
    """Swaps move x2 between levels of one replica column; a batch whose x1
    differs across levels has no shared target and must be rejected."""
    from ppde_tpu.samplers.mnist import pt

    en, es = quad_binary_energy(D=5)
    rng = np.random.default_rng(1)
    x1 = (rng.random((8, 5)) > 0.5).astype(np.float32)  # distinct per chain
    x2 = (rng.random((8, 5)) > 0.5).astype(np.float32)
    pop = jnp.asarray(np.concatenate([x1, x2], 1))
    with pytest.raises(ValueError, match="replica column"):
        pt.run(en, pop, 4, cfg=pt.MNISTPTConfig(n_levels=4), quiet=True)


def test_mnist_pt_levels_sample_tempered_boltzmann():
    """Gold test (MNIST twin of the protein one): with the full PT
    machinery running — tempered GWG flips + replica exchange — every
    temperature level must sample its exact tempered Boltzmann
    pi_l ~ exp(beta_l * E) on the enumerable 32-state binary target."""
    from ppde_tpu.samplers.mnist import pt

    D = 5
    en, es = quad_binary_energy(D)
    K, M = 4, 16
    n = K * M
    rng = np.random.default_rng(5)
    x0 = (rng.random((n, D)) > 0.5).astype(np.float32)
    pop = jnp.asarray(np.concatenate([np.zeros_like(x0), x0], 1))
    cfg = pt.MNISTPTConfig(pas_length=0, gwg_samples=1, n_levels=K,
                           beta_min=0.25)
    n_steps, burn = 3000, 600
    res = pt.run(en, pop, n_steps, cfg=cfg, key=jax.random.PRNGKey(11),
                 log_every=n_steps, quiet=True)
    betas = np.asarray(
        __import__("ppde_tpu.samplers.pt_core", fromlist=["ladder"])
        .ladder(n, K, cfg.beta_min)).reshape(K, M)[:, 0]
    hist = res.energy_history[burn:]
    for lvl in range(K):
        pl = np.exp(betas[lvl] * es - (betas[lvl] * es).max())
        pl /= pl.sum()
        mean_l = (pl * es).sum()
        std_l = np.sqrt((pl * (es - mean_l) ** 2).sum())
        emp = hist[:, lvl * M:(lvl + 1) * M].mean()
        gap = (emp - mean_l) / std_l
        assert abs(gap) < 0.15, (lvl, betas[lvl], gap)
