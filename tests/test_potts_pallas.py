"""Pallas fused Potts kernel: interpreter-mode equivalence with the XLA path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppde_tpu import codec
from ppde_tpu.models import potts
from ppde_tpu.ops import potts_pallas

WT = "ACDEFGHIKLMN"  # 12 residues -> P = 256 after padding


@pytest.fixture(scope="module")
def params():
    return potts.synthetic(WT, seed=2)


def test_padding_layout(params):
    assert params.padded_dim == 256
    assert params.data_dim == 240
    # padded region is exactly zero
    W = np.asarray(params.W)
    assert (W[240:, :] == 0).all() and (W[:, 240:] == 0).all()
    assert (np.asarray(params.h)[240:] == 0).all()


def test_kernel_matches_xla(params, rng):
    x = jnp.asarray(codec.ints_to_onehot(rng.integers(0, 20, (8, 12))))
    xf = potts._pad_flat(params, x)

    Jx = np.asarray(xf) @ np.asarray(params.W)
    H_ref = 0.5 * np.sum(np.asarray(xf) * Jx, -1) + np.asarray(xf) @ np.asarray(params.h)
    grad_ref = Jx + np.asarray(params.h)[None]

    H, grad = potts_pallas.energy_and_grad(params.W, params.h, xf,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(H), H_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grad), grad_ref, rtol=1e-4,
                               atol=1e-4)


def test_hamiltonian_and_grad_pallas_path(params, rng):
    x = jnp.asarray(codec.ints_to_onehot(rng.integers(0, 20, (4, 12))))
    H_x, g_x = potts.hamiltonian_and_grad(params, x, use_pallas=False)
    # interpret-mode pallas through the public API
    import ppde_tpu.ops.potts_pallas as pk

    H_p, g_p = pk.energy_and_grad(params.W, params.h,
                                  potts._pad_flat(params, x), interpret=True)
    np.testing.assert_allclose(np.asarray(H_p), np.asarray(H_x), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_p[:, :240].reshape(x.shape)),
                               np.asarray(g_x), rtol=1e-4, atol=1e-5)


def test_padded_scores_match_reference_math(params, rng):
    """Padding must not change the Hamiltonian vs the dense einsum oracle."""
    J = potts.as_dense_J(params)
    h = np.asarray(params.h[:240], np.float64).reshape(12, 20)
    x = codec.ints_to_onehot(rng.integers(0, 20, (5, 12)))
    Jx = np.einsum("ijkl,bjl->bik", J, x)
    ref = np.einsum("aik,aik->a", Jx, x) / 2 + (h[None] * x).sum((-1, -2))
    ours = np.asarray(potts.hamiltonian(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
