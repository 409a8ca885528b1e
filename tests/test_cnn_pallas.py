"""Fused CNN-ensemble Pallas kernel: equivalence with the XLA VJP path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppde_tpu import codec
from ppde_tpu.models import cnn
from ppde_tpu.ops import cnn_pallas

L, V, B, M = 36, 20, 32, 3


@pytest.fixture(scope="module")
def setup(rng=np.random.default_rng(0)):
    ens = cnn.init_ensemble(jax.random.PRNGKey(0), M, input_size=L)
    x = jnp.asarray(codec.ints_to_onehot(
        np.random.default_rng(1).integers(0, V, (B, L))))
    return ens, x


def xla_fit_and_grad(ens, x):
    fit, vjp = jax.vjp(lambda v: cnn.ensemble_apply(ens, v), x)
    (gx,) = vjp(jnp.ones_like(fit))
    return fit, gx


def test_im2col_roundtrip(setup):
    ens, x = setup
    P = cnn_pallas.im2col(x)
    assert P.shape == (B, L - 4, 100)
    # transpose property: <im2col(x), Q> == <x, col2im(Q)>
    rng = np.random.default_rng(2)
    Q = jnp.asarray(rng.random(P.shape).astype(np.float32))
    lhs = float(jnp.sum(P * Q))
    rhs = float(jnp.sum(x * cnn_pallas.col2im(Q, L)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


def test_fused_matches_xla_f32(setup):
    ens, x = setup
    fit_ref, gx_ref = xla_fit_and_grad(ens, x)
    fit, gx = cnn_pallas.ensemble_apply_and_grad(
        ens, x, compute_dtype=jnp.float32, batch_tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(fit), np.asarray(fit_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-3, atol=1e-4)


def test_member_grid_kernel_matches_unrolled(setup):
    """The member-axis-grid kernel variant (1/M the scoped VMEM) must equal
    the member-unrolled kernel bit-for-bit up to accumulation order."""
    ens, x = setup
    f0, g0 = cnn_pallas.ensemble_apply_and_grad(
        ens, x, compute_dtype=jnp.float32, batch_tile=8, interpret=True)
    f1, g1 = cnn_pallas.ensemble_apply_and_grad(
        ens, x, compute_dtype=jnp.float32, batch_tile=16, interpret=True,
        member_grid=True)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-5, atol=1e-6)


def test_fused_bf16_close(setup):
    ens, x = setup
    fit_ref, gx_ref = xla_fit_and_grad(ens, x)
    fit, gx = cnn_pallas.ensemble_apply_and_grad(
        ens, x, compute_dtype=jnp.bfloat16, batch_tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(fit), np.asarray(fit_ref),
                               rtol=3e-2, atol=3e-2)
    # gradient direction must agree strongly
    a = np.asarray(gx).ravel()
    b = np.asarray(gx_ref).ravel()
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.99


def test_first_argmax_pool_backward(setup):
    """pool_bwd='first' (torch.max semantics, reference nets.py:372): the
    kernel matches the XLA custom-VJP path exactly, equals 'split' on
    tie-free inputs, and routes ALL gradient to the first max row on a
    constructed tie."""
    ens, x = setup
    # XLA path with first-argmax pooling
    fit_ref, vjp = jax.vjp(
        lambda v: cnn.ensemble_apply(ens, v, pool_bwd="first"), x)
    (gx_ref,) = vjp(jnp.ones_like(fit_ref))
    fit, gx = cnn_pallas.ensemble_apply_and_grad(
        ens, x, compute_dtype=jnp.float32, batch_tile=16, interpret=True,
        pool_bwd="first")
    np.testing.assert_allclose(np.asarray(fit), np.asarray(fit_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-3, atol=1e-4)
    # random f32 activations are tie-free: 'first' == 'split'
    _, gx_split = cnn_pallas.ensemble_apply_and_grad(
        ens, x, compute_dtype=jnp.float32, batch_tile=16, interpret=True,
        pool_bwd="split")
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_split),
                               rtol=1e-4, atol=1e-5)
    # member-grid kernel honors the mode too
    _, gx_m = cnn_pallas.ensemble_apply_and_grad(
        ens, x, compute_dtype=jnp.float32, batch_tile=16, interpret=True,
        member_grid=True, pool_bwd="first")
    np.testing.assert_allclose(np.asarray(gx_m), np.asarray(gx_ref),
                               rtol=1e-3, atol=1e-4)


def test_max_pool_first_tie_routing():
    """On an exact tie max_pool_first sends the whole gradient to the FIRST
    max row; jnp.max's VJP splits it."""
    h = jnp.asarray([[1.0, 2.0], [3.0, 2.0], [3.0, 1.0]])[None]  # [1, 3, 2]
    g_first = jax.grad(lambda v: jnp.sum(cnn.max_pool_first(v)))(h)
    np.testing.assert_array_equal(
        np.asarray(g_first[0]), [[0.0, 1.0], [1.0, 0.0], [0.0, 0.0]])
    g_split = jax.grad(lambda v: jnp.sum(jnp.max(v, axis=1)))(h)
    np.testing.assert_array_equal(
        np.asarray(g_split[0]), [[0.0, 0.5], [0.5, 0.5], [0.5, 0.0]])


def test_real_checkpoint_weights(setup):
    """Kernel works on the converted reference checkpoints too."""
    import os

    from ppde_tpu.models import torch_convert
    from tests.conftest import REFERENCE, reference_available

    if not reference_available():
        pytest.skip("no reference")
    d = os.path.join(REFERENCE, "weights/PABP_YEAST_Fields2013")
    ens = jax.tree.map(jnp.asarray, torch_convert.onehot_cnn_ensemble(
        [os.path.join(d, f"onehot_cnn_seed={i}.pt") for i in range(3)]))
    x = jnp.asarray(codec.ints_to_onehot(
        np.random.default_rng(3).integers(0, V, (16, 96))))
    fit_ref, gx_ref = xla_fit_and_grad(ens, x)
    fit, gx = cnn_pallas.ensemble_apply_and_grad(
        ens, x, compute_dtype=jnp.float32, batch_tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(fit), np.asarray(fit_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-3, atol=1e-4)


def test_energy_fused_cnn_matches_vjp(setup):
    """protein_poe(fused_cnn=True) == the XLA-VJP energy, end to end."""
    from ppde_tpu import codec as codec_mod, energy as energy_mod
    from ppde_tpu.models import potts

    ens, x = setup
    wt = np.asarray(x[0]).argmax(-1)
    seq = "".join(codec_mod.ALPHABET[i] for i in wt)
    pp = potts.synthetic(seq, seed=0)
    wt_oh = x[:1]
    base = energy_mod.protein_poe(pp, ens, lam=15.0, wt_onehot=wt_oh,
                                  compute_dtype=jnp.float32)
    fused = energy_mod.protein_poe(pp, ens, lam=15.0, wt_onehot=wt_oh,
                                   compute_dtype=jnp.float32,
                                   fused_cnn=True, interpret=True)
    e0, f0, g0 = base.energy_and_grad(base.params, x)
    e1, f1, g1 = fused.energy_and_grad(fused.params, x)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-3, atol=1e-4)


def test_fused_ragged_batch(setup):
    """B not divisible by batch_tile exercises the pad/slice path."""
    ens, x = setup
    xr = x[:10]
    fit_ref, gx_ref = xla_fit_and_grad(ens, xr)
    fit, gx = cnn_pallas.ensemble_apply_and_grad(
        ens, xr, compute_dtype=jnp.float32, batch_tile=8, interpret=True)
    assert fit.shape == (10,) and gx.shape == xr.shape
    np.testing.assert_allclose(np.asarray(fit), np.asarray(fit_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-3, atol=1e-4)
