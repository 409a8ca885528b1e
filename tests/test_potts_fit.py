import numpy as np
import pytest

from ppde_tpu import codec
from ppde_tpu.models import potts, potts_fit


def sample_potts_msa(J, h, n_samples, L, rng, gibbs_sweeps=30):
    """Gibbs-sample sequences from a small Potts model (numpy oracle)."""
    V = potts.VOCAB
    x = rng.integers(0, V, (n_samples, L))
    for _ in range(gibbs_sweeps):
        for i in range(L):
            # conditional logits at position i
            logits = np.zeros((n_samples, V))
            for j in range(L):
                if j == i:
                    continue
                logits += J[i, j][:, x[:, j]].T  # [n_samples, V]
            logits += h[i][None]
            p = np.exp(logits - logits.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            x[:, i] = (p.cumsum(-1) > rng.random((n_samples, 1))).argmax(-1)
    return x


def test_fit_recovers_field_preferences(rng):
    """With strong fields and weak couplings, the fitted model must rank the
    preferred letter highest at each position."""
    L, V = 6, potts.VOCAB
    h = np.full((L, V), -1.0)
    pref = rng.integers(0, V, L)
    h[np.arange(L), pref] = 2.0
    J = np.zeros((L, L, V, V))
    x = sample_potts_msa(J, h, 400, L, rng, gibbs_sweeps=3)
    onehot = codec.ints_to_onehot(x).astype(np.float32)

    Jf, hf, hist = potts_fit.fit(onehot, steps=250, lr=0.1, lambda_J=0.01,
                                 lambda_h=0.001)
    assert hist[-1] < hist[0]
    np.testing.assert_array_equal(hf.argmax(-1), pref)
    # J stays symmetric with zero diagonal blocks
    np.testing.assert_allclose(Jf, np.transpose(Jf, (1, 0, 3, 2)), atol=1e-6)
    assert np.abs(Jf[np.arange(L), np.arange(L)]).max() == 0.0


def test_fit_recovers_coupling_sign(rng):
    """A single strong pairwise coupling must be recovered with the right
    sign and as a dominant entry."""
    L, V = 4, potts.VOCAB
    h = np.zeros((L, V))
    J = np.zeros((L, L, V, V))
    J[0, 1, 2, 3] = 3.0
    J[1, 0, 3, 2] = 3.0
    x = sample_potts_msa(J, h, 600, L, rng, gibbs_sweeps=8)
    onehot = codec.ints_to_onehot(x).astype(np.float32)

    Jf, hf, _ = potts_fit.fit(onehot, steps=300, lr=0.1, lambda_J=0.005,
                              lambda_h=0.001)
    assert Jf[0, 1, 2, 3] > 0.2
    # the target entry dominates its row block
    block = Jf[0, 1]
    assert block[2, 3] >= block.max() - 1e-9


def test_sequence_weights():
    seqs = ["AAAA", "AAAA", "AAAC", "WYKL"]
    onehot = codec.seqs_to_onehot(seqs)
    w = potts_fit.sequence_weights(onehot, identity=0.8)
    # first three are one 80%-identity cluster (pairwise id >= 0.75... the
    # two identical ones definitely cluster; WYKL is alone)
    assert w[3] == 1.0
    assert w[0] < 1.0 and w[1] < 1.0
    assert w[0] == w[1]


def test_msa_to_onehot_gaps():
    msa = [("a", "AC-E"), ("b", "--YW")]
    oh = potts_fit.msa_to_onehot(msa)
    assert oh.shape == (2, 4, 20)
    np.testing.assert_array_equal(oh.sum(-1), [[1, 1, 0, 1], [0, 0, 1, 1]])
