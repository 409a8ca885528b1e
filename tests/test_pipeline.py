"""Pipeline (pp) and sequence (sp) parallelism for the ESM2 expert.

Equality targets: parallel/pipeline.py's GPipe schedule and mesh.py's
sp_constraint must reproduce esm2.forward_logits bit-for-bit (same ops,
same order) on the 8-device virtual mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppde_tpu.models import esm2
from ppde_tpu.parallel import mesh as pmesh
from ppde_tpu.parallel import pipeline

TINY = dict(layers=4, dim=64, heads=4, ffn=128)


def tiny_params(dtype=jnp.float32, layers=4):
    esm2.CONFIGS["_tiny"] = dict(TINY, layers=layers)
    try:
        return esm2.init(jax.random.PRNGKey(0), "_tiny", dtype=dtype)
    finally:
        del esm2.CONFIGS["_tiny"]


def onehot_batch(B, T, seed=0):
    toks = jax.random.randint(jax.random.PRNGKey(seed), (B, T), 4, 24)
    return jax.nn.one_hot(toks, esm2.ESM_VOCAB, dtype=jnp.float32)


def test_stack_layers_roundtrip():
    params = tiny_params()
    stacked = pipeline.stack_layers(params["layers"])
    assert jax.tree.leaves(stacked)[0].shape[0] == 4
    first = jax.tree.map(lambda s: s[2], stacked)
    for a, b in zip(jax.tree.leaves(first),
                    jax.tree.leaves(params["layers"][2])):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("pp,dp,n_mb", [(2, 1, 4), (4, 2, 4), (2, 2, 2)])
def test_pipeline_matches_single_device(pp, dp, n_mb):
    params = tiny_params()
    x = onehot_batch(8, 12)
    ref = esm2.forward_logits(params, x, heads=4)

    mesh = pmesh.make_mesh(dp=dp, pp=pp, devices=jax.devices()[:dp * pp])
    pp_params = pipeline.pipeline_params(params, pp)
    got = jax.jit(lambda p, x: pipeline.forward_logits_pp(
        p, x, mesh, heads=4, n_microbatches=n_mb))(pp_params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_pll_matches_and_is_differentiable():
    params = tiny_params()
    x = onehot_batch(4, 10, seed=3)
    mesh = pmesh.make_mesh(dp=1, pp=2, devices=jax.devices()[:2])
    pp_params = pipeline.pipeline_params(params, 2)

    ref = esm2.pseudo_log_likelihood(params, x, heads=4)
    got = jax.jit(lambda p, x: pipeline.pseudo_log_likelihood_pp(
        p, x, mesh, heads=4, n_microbatches=2))(pp_params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # dE/dx through the pipeline (the PPDE proposal signal) == single-device
    g_ref = jax.grad(lambda x: esm2.pseudo_log_likelihood(
        params, x, heads=4).sum())(x)
    g_pp = jax.jit(jax.grad(lambda x: pipeline.pseudo_log_likelihood_pp(
        pp_params, x, mesh, heads=4, n_microbatches=2).sum()))(x)
    np.testing.assert_allclose(np.asarray(g_pp), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_pipeline_remat_equal():
    params = tiny_params()
    x = onehot_batch(4, 8, seed=5)
    mesh = pmesh.make_mesh(dp=1, pp=2, devices=jax.devices()[:2])
    pp_params = pipeline.pipeline_params(params, 2)
    base = jax.jit(lambda p, x: pipeline.forward_logits_pp(
        p, x, mesh, heads=4, n_microbatches=2))(pp_params, x)
    rem = jax.jit(lambda p, x: pipeline.forward_logits_pp(
        p, x, mesh, heads=4, n_microbatches=2, remat=True))(pp_params, x)
    np.testing.assert_allclose(np.asarray(rem), np.asarray(base),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_validates_divisibility():
    params = tiny_params(layers=3)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline.pipeline_params(params, 2)
    params4 = tiny_params()
    mesh = pmesh.make_mesh(dp=1, pp=2, devices=jax.devices()[:2])
    pp_params = pipeline.pipeline_params(params4, 2)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline.forward_logits_pp(pp_params, onehot_batch(6, 8), mesh,
                                   heads=4, n_microbatches=4)


def test_sp_constraint_matches_replicated():
    params = tiny_params()
    x = onehot_batch(4, 16, seed=7)
    ref = esm2.forward_logits(params, x, heads=4)

    mesh = pmesh.make_mesh(dp=2, sp=4)
    c = pmesh.sp_constraint(mesh)
    with mesh:
        got = jax.jit(lambda p, x: esm2.forward_logits(
            p, x, heads=4, constrain=c))(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # grad path under sp (dE/dx is what PPDE consumes)
    g_ref = jax.grad(lambda x: esm2.pseudo_log_likelihood(
        params, x, heads=4).sum())(x)
    with mesh:
        g_sp = jax.jit(jax.grad(lambda x: esm2.pseudo_log_likelihood(
            params, x, heads=4, constrain=c).sum()))(x)
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_five_axis_mesh_backcompat():
    # old 3-axis call sites keep working: sp/pp default to 1
    mesh = pmesh.make_mesh(dp=4, ep=1, tp=2)
    assert mesh.shape["dp"] == 4 and mesh.shape["tp"] == 2
    assert mesh.shape["sp"] == 1 and mesh.shape["pp"] == 1


def test_apply_mesh_sp_transformer_energy_matches_replicated():
    """runtime.apply_mesh(sp=2) turns on the esm2.SP_CONSTRAIN hook: a
    transformer PoE energy built the normal way (apply_fn closures baked
    in) computes identical energies+grads sequence-parallel."""
    from ppde_tpu import codec, energy as energy_mod, runtime
    from ppde_tpu.models import cnn, potts

    WT = "ACDEFGHIKLMNPQRSTVWYACDEFGHIKLMN"  # 32 residues
    esm2.CONFIGS["_tiny_sp"] = dict(TINY)
    try:
        tr = esm2.load_expert("_tiny_sp", WT, allow_random=True,
                              dtype=jnp.float32)
    finally:
        del esm2.CONFIGS["_tiny_sp"]
    pp = potts.synthetic(WT, seed=0)
    ens = cnn.init_ensemble(jax.random.PRNGKey(0), 4, input_size=len(WT))
    wt_oh = jnp.asarray(codec.seqs_to_onehot([WT]))

    en = energy_mod.protein_poe(pp, ens, 1.0, wt_oh, transformer=tr)
    pop = jnp.repeat(wt_oh, 8, axis=0)
    e_ref, f_ref, g_ref = jax.jit(en.energy_and_grad)(en.params, pop)

    assert esm2.SP_CONSTRAIN is None
    try:
        mesh, en_sh, pop_sh = runtime.apply_mesh(en, pop, dp=4, sp=2)
        assert esm2.SP_CONSTRAIN is not None
        with mesh:
            e_sp, f_sp, g_sp = jax.jit(en_sh.energy_and_grad)(
                en_sh.params, pop_sh)
            np.testing.assert_allclose(np.asarray(e_sp), np.asarray(e_ref),
                                       rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref),
                                       rtol=2e-4, atol=2e-5)
    finally:
        esm2.SP_CONSTRAIN = None


def test_apply_mesh_without_sp_clears_stale_hook():
    """A later apply_mesh in the same process must not inherit an
    SP_CONSTRAIN closed over a previous (possibly dead) mesh — apply_mesh
    sets OR CLEARS the hook on every call."""
    from ppde_tpu import codec, energy as energy_mod, runtime
    from ppde_tpu.models import cnn, potts

    WT = "ACDEFGHIKLMNPQRSTVWYACDEFGHIKLMN"
    pp = potts.synthetic(WT, seed=0)
    ens = cnn.init_ensemble(jax.random.PRNGKey(0), 4, input_size=len(WT))
    wt_oh = jnp.asarray(codec.seqs_to_onehot([WT]))
    en = energy_mod.protein_poe(pp, ens, 1.0, wt_oh)
    pop = jnp.repeat(wt_oh, 8, axis=0)

    try:
        runtime.apply_mesh(en, pop, dp=4, sp=2)
        assert esm2.SP_CONSTRAIN is not None
        runtime.apply_mesh(en, pop, dp=8)
        assert esm2.SP_CONSTRAIN is None
    finally:
        esm2.SP_CONSTRAIN = None
