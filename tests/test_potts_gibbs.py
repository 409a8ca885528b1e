"""Potts Gibbs sampler (potts.gibbs_sample): exactness vs enumeration.

The reference has no way to sample FROM its Potts model (it only scores
with it); these tests pin the native capability used for fit QC and
synthetic-family generation (scripts/sample_potts_msa.py).
"""
import jax
import jax.numpy as jnp
import numpy as np

from ppde_tpu.models import potts


def _exact_pair_logits(pp):
    """L=2 model: exact joint logits M[a,b] = h0[a] + h1[b] + J01[a,b]."""
    J = potts.as_dense_J(pp)
    h = np.asarray(pp.h[: pp.data_dim], np.float64).reshape(2, potts.VOCAB)
    return h[0][:, None] + h[1][None, :] + J[0, 1]


def test_gibbs_matches_exact_boltzmann_l2():
    pp = potts.synthetic("AC", seed=3, coupling_scale=0.3, field_scale=0.4)
    M = _exact_pair_logits(pp)
    p_exact = np.exp(M - M.max())
    p_exact /= p_exact.sum()

    N = 16384
    x = potts.gibbs_sample(pp, jax.random.PRNGKey(0), n_chains=N,
                           n_sweeps=30)
    a = np.argmax(np.asarray(x[:, 0]), -1)
    b = np.argmax(np.asarray(x[:, 1]), -1)
    emp = np.zeros((potts.VOCAB, potts.VOCAB))
    np.add.at(emp, (a, b), 1.0)
    emp /= emp.sum()

    # single-site marginals: tight TV bound at 16k samples over 20 cells
    for ax in (0, 1):
        tv = 0.5 * np.abs(emp.sum(1 - ax) - p_exact.sum(1 - ax)).sum()
        assert tv < 0.03, (ax, tv)
    # unbiasedness of the full 400-cell joint: per-cell z-scores vs the
    # binomial sampling noise should be ~N(0,1) (measured mean z² ≈ 1.05
    # at this seed; a biased sampler inflates it with N, a correlation
    # threshold would not be N-calibrated)
    z = (emp - p_exact) / np.sqrt(p_exact * (1 - p_exact) / N)
    assert (z ** 2).mean() < 1.4, (z ** 2).mean()
    assert np.abs(z).max() < 6.0, np.abs(z).max()
    # the couplings actually matter in this model (joint != outer product
    # of marginals), so the correlation above is not vacuous
    indep = np.outer(p_exact.sum(1), p_exact.sum(0))
    assert 0.5 * np.abs(p_exact - indep).sum() > 0.05


def test_gibbs_beta_concentrates():
    """Higher beta concentrates mass on the argmax state (here WT-favoring
    fields dominate) — checks beta is wired into BOTH init and conditionals."""
    pp = potts.synthetic("AC", seed=0, coupling_scale=0.05, field_scale=0.5)
    wt = np.array([[0, 1]])  # codec ints for "A","C" — checked below
    from ppde_tpu import codec

    wt = np.asarray(codec.seqs_to_ints(["AC"]))

    def wt_frac(beta):
        x = potts.gibbs_sample(pp, jax.random.PRNGKey(1), n_chains=2048,
                               n_sweeps=15, beta=beta)
        ints = np.argmax(np.asarray(x), -1)
        return float((ints == wt).all(-1).mean())

    cold, hot = wt_frac(4.0), wt_frac(0.25)
    assert cold > hot + 0.1, (cold, hot)


def test_field_consistency_after_sweeps():
    """The incrementally-maintained field equals the recomputed x @ W."""
    pp = potts.synthetic("ACDEF", seed=1, coupling_scale=0.2)
    key = jax.random.PRNGKey(2)
    x0 = jax.nn.one_hot(
        jax.random.randint(key, (8, 5), 0, potts.VOCAB), potts.VOCAB,
        dtype=jnp.float32)
    F = potts._field(pp, x0)
    x, F = potts.gibbs_sweep(pp, x0, F, key)
    x, F = potts.gibbs_sweep(pp, x, F, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(F), np.asarray(potts._field(pp, x)),
                               rtol=1e-5, atol=1e-5)
    # states stay exactly one-hot through the mask-multiply update
    np.testing.assert_allclose(np.asarray(x.sum(-1)), 1.0, rtol=0, atol=0)


def test_sample_potts_msa_cli(tmp_path, capsys):
    """scripts/sample_potts_msa.py end to end on the real UBE4B artifacts:
    QC stats print, the output parses as an all-focus a2m, and the sampled
    single-site frequencies track the training alignment."""
    import importlib
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    spm = importlib.import_module("sample_potts_msa")

    out = tmp_path / "model.a2m"
    args = spm.build_parser().parse_args([
        "--protein", "UBE4B_MOUSE_Klevit2013-nscor_log2_ratio",
        "--n_seqs", "128", "--n_sweeps", "40",
        "--qc_msa", "data/proteins/UBE4B_MOUSE.a2m", "--out", str(out)])
    seqs = spm.main(args)
    text = capsys.readouterr().out
    assert "single-site freq r=+0.9" in text  # refit Potts reproduces f_i

    from ppde_tpu import io as pio

    rows = pio.load_msa(str(out))
    assert len(rows) == 129  # WT focus row + 128 samples
    assert all(len(r) == len(rows[0][1]) for _, r in rows)
    # the emitted alignment feeds straight into the family trainers
    from ppde_tpu.models import potts_fit

    oh = potts_fit.msa_to_onehot(rows[1:])
    assert oh.shape == (128, len(rows[0][1]), 20)

def test_round_or_none_keeps_jsonl_valid():
    """NaN correlations (fully-conserved populations) must serialize as
    null, never the invalid-JSON token NaN; 0.0 must round-trip as 0.0
    (the old `r and round(r)` skipped rounding AND nulling on falsy/NaN)."""
    import importlib
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    spm = importlib.import_module("sample_potts_msa")

    assert spm._round_or_none(None) is None
    assert spm._round_or_none(float("nan")) is None
    assert spm._round_or_none(float("inf")) is None
    assert spm._round_or_none(0.0) == 0.0
    assert spm._round_or_none(0.123456) == 0.1235
    # the rec line a QC-less smoke writes must be strict JSON
    line = json.dumps({"single_site_freq_r": spm._round_or_none(
        float("nan"))})
    assert json.loads(line) == {"single_site_freq_r": None}
