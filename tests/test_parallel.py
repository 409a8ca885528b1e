"""Multi-device sharding on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppde_tpu import codec, energy as energy_mod, utils
from ppde_tpu.models import cnn, potts
from ppde_tpu.parallel import mesh as pmesh
from ppde_tpu.samplers.protein import ppde

WT = "ACDEFGHIKLMNPQRSTVWYACDEFGHIKLMN"  # 32 residues

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def build(n_chains):
    pp = potts.synthetic(WT, seed=0)
    ens = cnn.init_ensemble(jax.random.PRNGKey(0), 4, input_size=len(WT))
    wt_oh = jnp.asarray(codec.seqs_to_onehot([WT]))
    en = energy_mod.protein_poe(pp, ens, 1.0, wt_oh)
    pop = jnp.repeat(wt_oh, n_chains, axis=0)
    return en, pp, ens, pop


def test_dp_tp_sampler_step_matches_single_device():
    """The sharded (dp x tp) sampler step must produce the same numbers as
    the unsharded program (same key, same params)."""
    en, pp, ens, pop = build(n_chains=8)
    window_ok = utils.position_window_mask(len(WT), 20, 0, len(WT) - 1)
    cfg = ppde.PPDEConfig(pas_length=2, nmut_threshold=10)
    n, L, V = pop.shape
    step = ppde.make_step(en, cfg, window_ok, n, L, V)
    key = jax.random.PRNGKey(3)

    e0, fit0, grad0 = en.energy_and_grad(en.params, pop)
    ctx = {"energy": en.params, "wt": pop[0], "init_x": pop,
           "wt_e": e0[0], "wt_fit": fit0[0], "wt_grad": grad0[0]}
    state = (pop, (e0, fit0, grad0), (e0, fit0, pop))
    (new_state_ref, ys_ref) = jax.jit(step)(ctx, state, key)

    mesh = pmesh.make_mesh(dp=4, ep=1, tp=2)
    pp_sh = pmesh.shard_potts(pp, mesh)
    params_sh = dict(en.params)
    params_sh["potts"] = pp_sh
    pop_sh = pmesh.shard_chains(pop, mesh)
    ctx_sh = {"energy": params_sh, "wt": pop_sh[0], "init_x": pop_sh,
              "wt_e": e0[0], "wt_fit": fit0[0], "wt_grad": grad0[0]}
    state_sh = (pop_sh,
                (pmesh.shard_chains(e0, mesh),
                 pmesh.shard_chains(fit0, mesh),
                 pmesh.shard_chains(grad0, mesh)),
                (pmesh.shard_chains(e0, mesh),
                 pmesh.shard_chains(fit0, mesh), pop_sh))
    with mesh:
        (new_state_sh, ys_sh) = jax.jit(step)(ctx_sh, state_sh, key)

    np.testing.assert_allclose(np.asarray(ys_sh["energy"]),
                               np.asarray(ys_ref["energy"]), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(ys_sh["accepted"]),
                                  np.asarray(ys_ref["accepted"]))
    np.testing.assert_allclose(np.asarray(new_state_sh[0]),
                               np.asarray(new_state_ref[0]), atol=1e-5)


def test_tp_potts_matches_replicated():
    en, pp, ens, pop = build(n_chains=8)
    mesh = pmesh.make_mesh(dp=4, ep=1, tp=2)
    pp_sh = pmesh.shard_potts(pp, mesh)
    ref_e, ref_g = potts.score_and_grad(pp, pop)
    with mesh:
        e, g = jax.jit(lambda p, x: potts.score_and_grad(p, x))(pp_sh, pop)
    np.testing.assert_allclose(np.asarray(e), np.asarray(ref_e), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref_g), rtol=1e-4,
                               atol=1e-5)


def test_ep_ensemble_matches_replicated():
    en, pp, ens, pop = build(n_chains=8)
    mesh = pmesh.make_mesh(dp=4, ep=2, tp=1)
    ens_sh = pmesh.shard_ensemble(ens, mesh)  # 4 members over ep=2
    ref = cnn.ensemble_apply(ens, pop)
    with mesh:
        out = jax.jit(cnn.ensemble_apply)(ens_sh, pmesh.shard_chains(pop, mesh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_shard_placement():
    en, pp, ens, pop = build(n_chains=8)
    mesh = pmesh.make_mesh(dp=4, ep=1, tp=2)
    pop_sh = pmesh.shard_chains(pop, mesh)
    assert len(pop_sh.sharding.device_set) == 8
    pp_sh = pmesh.shard_potts(pp, mesh)
    # W is sharded column-wise over tp (2 shards x 4 replicas)
    assert len(pp_sh.W.sharding.device_set) == 8


def test_apply_mesh_full_run_matches_single_device():
    """runtime.apply_mesh + a full sampler run == the unsharded run."""
    from ppde_tpu import runtime

    en, pp, ens, pop = build(n_chains=8)
    key = jax.random.PRNGKey(7)
    cfg = ppde.PPDEConfig(pas_length=2, nmut_threshold=5)

    res0 = ppde.run(en, pop, num_steps=12, min_pos=0, max_pos=31,
                    cfg=cfg, key=key, log_every=6, quiet=True)

    mesh, en_sh, pop_sh = runtime.apply_mesh(en, pop, dp=4, tp=2)
    with mesh:
        res1 = ppde.run(en_sh, pop_sh, num_steps=12, min_pos=0, max_pos=31,
                        cfg=cfg, key=key, log_every=6, quiet=True)

    np.testing.assert_allclose(np.asarray(res1.best_energy),
                               np.asarray(res0.best_energy),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(res1.best_x),
                                  np.asarray(res0.best_x))


def test_apply_mesh_dp_ep_tp_full_run_matches_single_device():
    """All three axes in ONE program: chains over dp, the 4-member ensemble
    over ep (GSPMD's psum for the mean), Potts couplings over tp."""
    from ppde_tpu import runtime

    en, pp, ens, pop = build(n_chains=8)
    key = jax.random.PRNGKey(11)
    cfg = ppde.PPDEConfig(pas_length=2, nmut_threshold=5)

    res0 = ppde.run(en, pop, num_steps=10, min_pos=0, max_pos=31,
                    cfg=cfg, key=key, log_every=5, quiet=True)

    mesh, en_sh, pop_sh = runtime.apply_mesh(en, pop, dp=2, tp=2, ep=2)
    # the mesh may carry extra size-1 axes (pp/sp); the requested ones
    # must have the requested sizes and everything else must be trivial
    shape = dict(mesh.shape)
    assert shape["dp"] == 2 and shape["ep"] == 2 and shape["tp"] == 2
    assert all(v == 1 for k, v in shape.items() if k not in ("dp", "ep", "tp"))
    # the 4-member ensemble must actually land sharded on the ep axis
    enc_w = en_sh.params["sup"]["encoder"]["w"]
    assert "ep" in str(enc_w.sharding.spec)
    with mesh:
        res1 = ppde.run(en_sh, pop_sh, num_steps=10, min_pos=0, max_pos=31,
                        cfg=cfg, key=key, log_every=5, quiet=True)

    np.testing.assert_allclose(np.asarray(res1.best_energy),
                               np.asarray(res0.best_energy),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(res1.best_x),
                                  np.asarray(res0.best_x))


def test_apply_mesh_pt_full_run_matches_single_device():
    """The PT sampler's replica-exchange phase reshapes the chain axis to
    [levels, M*rest], which crosses dp shard boundaries — GSPMD must insert
    the collectives and the sharded full run must match unsharded."""
    from ppde_tpu import runtime
    from ppde_tpu.samplers.protein import pt

    en, pp, ens, pop = build(n_chains=8)
    key = jax.random.PRNGKey(13)
    cfg = pt.PTConfig(pas_length=2, nmut_threshold=5, n_levels=4,
                      beta_min=0.3)

    res0 = pt.run(en, pop, num_steps=12, min_pos=0, max_pos=31, cfg=cfg,
                  key=key, log_every=6, quiet=True)

    mesh, en_sh, pop_sh = runtime.apply_mesh(en, pop, dp=4, tp=2)
    with mesh:
        res1 = pt.run(en_sh, pop_sh, num_steps=12, min_pos=0, max_pos=31,
                      cfg=cfg, key=key, log_every=6, quiet=True)

    np.testing.assert_allclose(np.asarray(res1.best_energy),
                               np.asarray(res0.best_energy),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(res1.best_x),
                                  np.asarray(res0.best_x))


def test_tp_esm_matches_replicated():
    """Tensor-parallel ESM2 pseudo-log-likelihood == replicated."""
    from ppde_tpu.models import esm2

    params = esm2.init(jax.random.PRNGKey(0), "transformer-S",
                       dtype=jnp.float32)
    x = jax.nn.one_hot(
        np.random.default_rng(0).integers(0, 33, (4, 24)), 33,
        dtype=jnp.float32)
    ref = jax.jit(esm2.pseudo_log_likelihood)(params, x)

    mesh = pmesh.make_mesh(dp=2, ep=1, tp=4)
    p_sh = pmesh.shard_esm(params, mesh)
    x_sh = pmesh.shard_chains(x, mesh)
    with mesh:
        out = jax.jit(esm2.pseudo_log_likelihood)(p_sh, x_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_tp_esm_650m_shapes_matches_replicated():
    """shard_esm at the 650M configuration's per-layer SHAPES
    (D=1280, F=5120, hd=64 — transformer-L, reference nets.py:174-181),
    layer-truncated so the virtual CPU mesh can run it; validates the
    TP specs + remat path the on-chip 650M smoke uses."""
    from ppde_tpu.models import esm2

    params = esm2.init(jax.random.PRNGKey(1), "transformer-L",
                       dtype=jnp.float32)
    params["layers"] = params["layers"][:2]
    x = jax.nn.one_hot(
        np.random.default_rng(1).integers(0, 33, (4, 16)), 33,
        dtype=jnp.float32)
    ref = jax.jit(lambda p, v: esm2.pseudo_log_likelihood(
        p, v, remat=True))(params, x)

    mesh = pmesh.make_mesh(dp=2, ep=1, tp=4)
    p_sh = pmesh.shard_esm(params, mesh)
    x_sh = pmesh.shard_chains(x, mesh)
    with mesh:
        out = jax.jit(lambda p, v: esm2.pseudo_log_likelihood(
            p, v, remat=True))(p_sh, x_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
