import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppde_tpu import codec, energy as energy_mod
from ppde_tpu.models import cnn, mnist_nets, potts

WT = "ACDEFGHIKLMNPQRS"  # 16 residues


@pytest.fixture(scope="module")
def poe():
    pp = potts.synthetic(WT, min_pos=1, max_pos=14, seed=3)
    ens = cnn.init_ensemble(jax.random.PRNGKey(0), 3, input_size=len(WT))
    wt_oh = jnp.asarray(codec.seqs_to_onehot([WT]))
    return energy_mod.protein_poe(pp, ens, lam=2.5, wt_onehot=wt_oh)


def test_protein_poe_grad_matches_autodiff(poe, rng):
    x = jnp.asarray(codec.ints_to_onehot(rng.integers(0, 20, (4, len(WT)))))
    e, fit, grad = poe.energy_and_grad(poe.params, x)
    e2, fit2 = poe.energy(poe.params, x)
    np.testing.assert_allclose(np.asarray(e), np.asarray(e2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fit), np.asarray(fit2), rtol=1e-5)

    g_auto = jax.grad(lambda v: poe.energy(poe.params, v)[0].sum())(x)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g_auto),
                               rtol=1e-4, atol=1e-5)


def test_protein_poe_lambda_composition(rng):
    pp = potts.synthetic(WT, seed=3)
    ens = cnn.init_ensemble(jax.random.PRNGKey(0), 3, input_size=len(WT))
    wt_oh = jnp.asarray(codec.seqs_to_onehot([WT]))
    x = jnp.asarray(codec.ints_to_onehot(rng.integers(0, 20, (4, len(WT)))))
    en0 = energy_mod.protein_poe(pp, ens, 0.0, wt_oh)
    e0, fit = en0.energy(en0.params, x)
    en5 = energy_mod.protein_poe(pp, ens, 5.0, wt_oh)
    e5, _ = en5.energy(en5.params, x)
    np.testing.assert_allclose(np.asarray(e5 - e0), 5.0 * np.asarray(fit),
                               rtol=1e-4)
    # lam=0 energy is the pure potts delta
    np.testing.assert_allclose(np.asarray(e0),
                               np.asarray(potts.score(pp, x, delta=True)),
                               rtol=1e-5)


def test_protein_supervised(rng):
    ens = cnn.init_ensemble(jax.random.PRNGKey(1), 3, input_size=len(WT))
    wt_oh = jnp.asarray(codec.seqs_to_onehot([WT]))
    en = energy_mod.protein_supervised(ens, wt_oh)
    x = jnp.asarray(codec.ints_to_onehot(rng.integers(0, 20, (4, len(WT)))))
    e, fit, grad = en.energy_and_grad(en.params, x)
    np.testing.assert_allclose(np.asarray(e), np.asarray(fit))
    g_auto = jax.grad(lambda v: en.energy(en.params, v)[0].sum())(x)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g_auto),
                               rtol=1e-4, atol=1e-6)


def test_protein_poe_chunked_transformer_path(rng):
    """The unrolled-chunk transformer path must equal the unchunked one
    (round 3: chunks are an unrolled python loop — honest 1.66x over
    monolithic on TPU via cross-chunk ILP, PERF.md — incl. ragged tails)."""
    pp = potts.synthetic(WT, seed=3)
    ens = cnn.init_ensemble(jax.random.PRNGKey(0), 3, input_size=len(WT))
    wt_oh = jnp.asarray(codec.seqs_to_onehot([WT]))

    w = jax.random.normal(jax.random.PRNGKey(2), (len(WT), 20))

    def toy_transformer(params, x):
        return jnp.tanh((x * params).sum((-1, -2)))

    e1 = energy_mod.protein_poe(pp, ens, 1.0, wt_oh, transformer=(w, toy_transformer))
    x = jnp.asarray(codec.ints_to_onehot(rng.integers(0, 20, (8, len(WT)))))
    a = e1.energy_and_grad(e1.params, x)
    for chunk in (2, 3):  # 3 exercises the ragged tail (8 = 3 + 3 + 2)
        e2 = energy_mod.protein_poe(pp, ens, 1.0, wt_oh,
                                    transformer=(w, toy_transformer),
                                    chunk_size=chunk)
        b = e2.energy_and_grad(e2.params, x)
        for u, v in zip(a, b):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       rtol=1e-5, atol=1e-6)

    # beyond MAX_UNROLLED_CHUNKS the path switches to lax.map over groups
    # of unrolled chunks (bounded HLO at large n_chains) — must still be
    # exact, including group-level padding (40 rows, chunk 2 -> 20 chunks
    # -> 3 groups of 16 with an 8-row pad)
    x_big = jnp.asarray(codec.ints_to_onehot(
        rng.integers(0, 20, (40, len(WT)))))
    a_big = e1.energy_and_grad(e1.params, x_big)
    assert 40 // 2 > energy_mod.MAX_UNROLLED_CHUNKS
    for chunk in (2, 3):
        e2 = energy_mod.protein_poe(pp, ens, 1.0, wt_oh,
                                    transformer=(w, toy_transformer),
                                    chunk_size=chunk)
        b_big = e2.energy_and_grad(e2.params, x_big)
        for u, v in zip(a_big, b_big):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       rtol=1e-5, atol=1e-6)


def test_mnist_poe_grad(rng):
    ens = mnist_nets.regression_init_ensemble(jax.random.PRNGKey(0), 2, nc=4)
    ebm = mnist_nets.ebm_init(jax.random.PRNGKey(1), n_channels=4,
                              mean=0.3 * np.ones(784))
    en = energy_mod.mnist_poe(ebm, ens, lam=10.0, unsup_kind="ebm")
    x1 = jnp.asarray((rng.random((3, 784)) > 0.5).astype(np.float32))
    x2 = jnp.asarray((rng.random((3, 784)) > 0.5).astype(np.float32))
    e, fit, grad = en.energy_and_grad(en.params, x2, x1)
    e2, fit2 = en.energy(en.params, x2, x1)
    np.testing.assert_allclose(np.asarray(e), np.asarray(e2), rtol=1e-4)
    g_auto = jax.grad(lambda v: en.energy(en.params, v, x1)[0].sum())(x2)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g_auto),
                               rtol=1e-4, atol=1e-4)


def test_mnist_dae_energy(rng):
    ens = mnist_nets.regression_init_ensemble(jax.random.PRNGKey(0), 2, nc=4)
    dae = mnist_nets.dae_init(jax.random.PRNGKey(1), latent_dim=4, n_channels=4)
    en = energy_mod.mnist_poe(dae, ens, lam=1.0, unsup_kind="dae")
    x1 = jnp.asarray((rng.random((2, 784)) > 0.5).astype(np.float32))
    x2 = jnp.asarray((rng.random((2, 784)) > 0.5).astype(np.float32))
    e, fit = en.energy(en.params, x2, x1)
    assert e.shape == fit.shape == (2,)
    logp = mnist_nets.dae_log_prob(dae, x2)
    np.testing.assert_allclose(np.asarray(e), np.asarray(logp + fit), rtol=1e-4)


def test_cnn_chunked_energy_matches_full():
    """cnn_chunk lax.map evaluation == one-program evaluation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ppde_tpu import codec, energy as energy_mod
    from ppde_tpu.models import cnn, potts

    wt = "ACDEFGHIKLMNPQRSTVWYACDEFGHIKLMN"
    pp = potts.synthetic(wt, seed=0)
    ens = cnn.init_ensemble(jax.random.PRNGKey(0), 3, input_size=len(wt))
    wt_oh = jnp.asarray(codec.seqs_to_onehot([wt]))
    x = jnp.asarray(codec.ints_to_onehot(
        np.random.default_rng(0).integers(0, 20, (16, len(wt)))))
    full = energy_mod.protein_poe(pp, ens, lam=2.0, wt_onehot=wt_oh)
    chunked = energy_mod.protein_poe(pp, ens, lam=2.0, wt_onehot=wt_oh,
                                     cnn_chunk=4)
    e0, f0, g0 = full.energy_and_grad(full.params, x)
    e1, f1, g1 = chunked.energy_and_grad(chunked.params, x)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e0),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=1e-6)
