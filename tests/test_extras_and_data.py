import numpy as np

from ppde_tpu.data import mnist as dmnist
from ppde_tpu.extras import lown


def test_levenshtein():
    assert lown.levenshtein("kitten", "sitting") == 3
    assert lown.levenshtein("", "abc") == 3
    assert lown.levenshtein("abc", "abc") == 0
    m = lown.levenshtein_matrix(["AA", "AB", "BB"])
    np.testing.assert_array_equal(m, [[0, 1, 2], [1, 0, 1], [2, 1, 0]])


def test_edit_string_roundtrip():
    wt = "ACDEFG"
    mut = "AYDEFW"
    es = lown.edit_string(mut, wt)
    assert es == "C2Y:G6W"
    assert lown.apply_edit_string(es, wt) == mut
    assert lown.edit_string(wt, wt) == "WT"
    assert lown.apply_edit_string("WT", wt) == wt


def test_aa_to_dna():
    dna = lown.aa_to_dna("MK")
    assert dna == "ATGAAA"
    assert len(lown.aa_to_dna(lown.AVGFP_WT)) == 3 * len(lown.AVGFP_WT)


def test_onehot_alt_alphabet():
    oh = lown.onehot_alt(["AB"], "BA")
    np.testing.assert_array_equal(oh[0], [[0, 1], [1, 0]])


def test_synthetic_mnist_pairs():
    ds = dmnist.MNISTSumPairs("synthetic", None, "train", seed=0)
    x1, x2, y = next(ds.batches(16))
    assert x1.shape == x2.shape == (16, 784)
    assert set(np.unique(x1)).issubset({0.0, 1.0})
    assert y.shape == (16,)
    # bounded-sum pairs (plus N(y, 0.1) label smoothing, reference
    # data/mnist.py:81)
    assert y.max() <= 11.0
    assert not np.all(y == np.round(y))  # label smoothing applied

    val = dmnist.MNISTSumPairs("synthetic", None, "val", seed=1,
                               train_noise=False)
    _, _, yv = next(val.batches(32))
    assert yv.max() <= 10.0
    assert np.all(yv == np.round(yv))


def test_pair_index_parser(tmp_path):
    p = tmp_path / "pairs.txt"
    p.write_text("1 2\n3,4\n\n5 6\n")
    np.testing.assert_array_equal(dmnist.load_pair_indices(str(p)),
                                  [[1, 2], [3, 4], [5, 6]])


def test_static_binary_mnist():
    imgs = dmnist.load_static_binary_mnist("synthetic", "train")
    assert imgs.shape == (4096, 784)
    assert set(np.unique(imgs)).issubset({0.0, 1.0})


def test_augmented_real_mnist():
    imgs, which = dmnist.augmented_real_mnist("data/mnist", 64, seed=3,
                                              return_sources=True)
    assert imgs.shape == (64, 784) and which.shape == (64,)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    # real-MNIST-like ink fraction, not blank / not saturated
    assert 0.05 < imgs.mean() < 0.25
    # deterministic for a fixed seed; different across seeds
    again = dmnist.augmented_real_mnist("data/mnist", 64, seed=3)
    np.testing.assert_array_equal(imgs, again)
    other = dmnist.augmented_real_mnist("data/mnist", 64, seed=4)
    assert np.abs(imgs - other).max() > 0.1
    # held-out pool comes from the two validation images only
    ho = dmnist.augmented_real_mnist("data/mnist", 8, seed=0, heldout=True)
    assert ho.shape == (8, 784)


def test_augmented_source_loader_and_pairs_refusal():
    imgs, labels = dmnist.load_raw_mnist("augmented:data/mnist", "train")
    assert imgs.shape == (8192, 784)
    assert labels.min() >= 0
    assert labels.max() < len(dmnist.SEED_IMAGE_STEMS)
    # the val split augments the HELD-OUT validation digits, never the
    # training seed digits (genuine early-stopping signal)
    val, val_src = dmnist.load_raw_mnist("augmented:data/mnist", "val")
    assert val.shape[0] == 1024
    assert val_src.max() < len(dmnist.HELDOUT_IMAGE_STEMS)
    assert np.abs(imgs[: len(val)] - val).max() > 0.1
    with np.testing.assert_raises(ValueError):
        dmnist.MNISTSumPairs("augmented:data/mnist", None, "train")
