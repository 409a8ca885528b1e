import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppde_tpu import codec
from ppde_tpu.models import potts


WT = "ACDEFGHIKLMN"  # 12 residues


@pytest.fixture(scope="module")
def params():
    return potts.synthetic(WT, min_pos=2, max_pos=9, seed=1)


def reference_hamiltonian(J, h, x):
    """Direct einsum-pair formulation (the reference's math, nets.py:287-290),
    reimplemented in numpy as an independent oracle for the flattened path."""
    Jx = np.einsum("ijkl,bjl->bik", J, x)
    xJx = np.einsum("aik,aik->a", Jx, x) / 2
    bias = (h[None] * x).sum(-1).sum(-1)
    return xJx + bias


def test_hamiltonian_matches_einsum_oracle(params, rng):
    L = params.seq_len
    J = potts.as_dense_J(params)
    h = np.asarray(params.h, np.float64)[: L * potts.VOCAB].reshape(L, potts.VOCAB)
    x = codec.ints_to_onehot(rng.integers(0, 20, (7, L)))
    ours = np.asarray(potts.hamiltonian(params, jnp.asarray(x)))
    ref = reference_hamiltonian(J, h, x.astype(np.float64))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_hand_computed_tiny_case():
    # L=2, V=20: H = J[0,1,a,b] (x0=a, x1=b) + h[0,a] + h[1,b]
    L = 2
    J = np.zeros((L, L, 20, 20))
    J[0, 1, 3, 5] = 2.0
    J[1, 0, 5, 3] = 2.0  # symmetry partner
    h = np.zeros((L, 20))
    h[0, 3] = 0.25
    h[1, 5] = 0.5
    p = potts._build(J, h, np.arange(L), 1.0, 0, "AA")
    x = codec.ints_to_onehot(np.array([[3, 5], [3, 4], [0, 5]]))
    H = np.asarray(potts.hamiltonian(p, jnp.asarray(x)))
    np.testing.assert_allclose(H, [2.0 + 0.25 + 0.5, 0.25, 0.5], atol=1e-6)


def test_analytic_grad_matches_autodiff(params, rng):
    L = params.seq_len
    x = jnp.asarray(codec.ints_to_onehot(rng.integers(0, 20, (5, L))))

    def f(x):
        return potts.hamiltonian(params, x).sum()

    g_auto = jax.grad(f)(x)
    H, g_analytic = potts.hamiltonian_and_grad(params, x)
    np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_analytic),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(H),
                               np.asarray(potts.hamiltonian(params, x)),
                               rtol=1e-5)


def test_wt_delta_is_zero(params):
    wt_full = jnp.asarray(codec.seqs_to_onehot([WT]))
    d = potts.score(params, wt_full, delta=True)
    np.testing.assert_allclose(np.asarray(d), [0.0], atol=1e-4)


def test_score_and_grad_window(params):
    wt_full = jnp.asarray(codec.seqs_to_onehot([WT] * 3))
    s, g = potts.score_and_grad(params, wt_full)
    assert g.shape == wt_full.shape
    # gradient is zero outside the alignment window
    np.testing.assert_array_equal(np.asarray(g[:, :2]), 0.0)
    np.testing.assert_array_equal(np.asarray(g[:, 10:]), 0.0)
    assert bool(jnp.any(g[:, 2:10] != 0))
    np.testing.assert_allclose(np.asarray(s), 0.0, atol=1e-4)


def test_flatten_roundtrip(rng):
    L = 4
    J = rng.normal(size=(L, L, 20, 20))
    J = 0.5 * (J + np.transpose(J, (1, 0, 3, 2)))
    J[np.arange(L), np.arange(L)] = 0
    W = potts._flatten_couplings(J)
    np.testing.assert_allclose(W, W.T, atol=1e-12)  # symmetric
    np.testing.assert_allclose(potts._unflatten_couplings(W, L), J, atol=1e-12)


def test_npz_roundtrip(tmp_path, params):
    J = potts.as_dense_J(params)
    h = np.asarray(params.h)[: params.seq_len * 20].reshape(params.seq_len, 20)
    path = str(tmp_path / "potts.npz")
    potts.save_npz(path, J, h, np.arange(2, 10), 1.0, 0)
    p2 = potts.load_npz(path, WT)
    np.testing.assert_allclose(np.asarray(p2.W), np.asarray(params.W), atol=1e-6)
    assert (p2.min_pos, p2.max_pos) == (params.min_pos, params.max_pos)
    np.testing.assert_allclose(float(p2.wt_H), float(params.wt_H), rtol=1e-5)
