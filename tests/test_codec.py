import numpy as np
import pytest

from ppde_tpu import codec


def test_vocab_table_golden():
    # exact parity with the reference 20-letter table is checkpoint-critical
    assert codec.ALPHABET == "ACDEFGHIKLMNPQRSTVWY"
    assert codec.VOCAB_SIZE == 20
    assert codec.AA_TO_INT["A"] == 0
    assert codec.AA_TO_INT["Y"] == 19
    assert codec.AA_TO_INT["start"] == 20
    assert codec.AA_TO_INT["stop"] == 21


def test_onehot_roundtrip():
    seqs = ["ACDY", "WYKL"]
    oh = codec.seqs_to_onehot(seqs)
    assert oh.shape == (2, 4, 20)
    assert oh.sum() == 8
    assert codec.onehot_to_seqs(oh) == seqs


def test_onehot_matches_manual():
    oh = codec.seqs_to_onehot(["AC"])
    expected = np.zeros((1, 2, 20))
    expected[0, 0, 0] = 1  # A
    expected[0, 1, 1] = 1  # C
    np.testing.assert_array_equal(oh, expected)


def test_onehot2seq_reference_semantics():
    # mirrors the reference __main__ smoke check (data_utils.py:280-285)
    onehots = np.array([
        [[0, 0, 1, 0, 0], [1, 0, 0, 0, 0]],
        [[0, 0, 0, 1, 0], [0, 1, 0, 0, 0]],
    ])
    padded = np.zeros((2, 2, 20))
    padded[:, :, :5] = onehots
    assert codec.onehot_to_seqs(padded) == ["DA", "EC"]


def test_ragged_padding_uses_zero():
    oh = codec.seqs_to_onehot(["AC", "WYKL"])
    assert oh.shape == (1 + 1, 4, 20)
    # padded tail of the short sequence decodes to 'A' (index 0)
    assert codec.onehot_to_seqs(oh)[0] == "ACAA"


def test_seq_to_mutations():
    muts = codec.seq_to_mutations("ACDE", "AADE")
    assert muts == [(1, "A", "C")]
    # lowercase (non-focus) positions skipped
    muts = codec.seq_to_mutations("ACDE", "aCDQ")
    assert muts == [(3, "Q", "E")]
    assert codec.mutation_names("ACDE", "AADE") == "A2C"
