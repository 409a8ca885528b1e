import os

import pytest

from ppde_tpu import io as pio
from tests.conftest import REFERENCE, requires_reference


def test_read_fasta(tmp_path):
    p = tmp_path / "x.fasta"
    p.write_text(">seq1/10-13 desc\nACDE\n>seq2\nWY\nKL\n")
    seqs, ids = pio.read_fasta(str(p), return_ids=True)
    assert seqs == ["ACDE", "WYKL"]
    assert ids == ["seq1/10-13", "seq2"]


def test_load_msa_focus_columns(tmp_path):
    p = tmp_path / "x.a2m"
    p.write_text(
        ">focus/5-10\nabACDEfg\n"
        ">other\n..AC-Egh\n"
        ">bad\nxxACXEyy\n"  # X in focus cols -> dropped
    )
    msa = pio.load_msa(str(p))
    names = [n for n, _ in msa]
    assert names == [">focus/5-10", ">other"]
    assert msa[0][1] == "ACDE"
    assert msa[1][1] == "AC-E"
    assert pio.focus_columns(str(p)) == [2, 3, 4, 5]
    assert pio.msa_region(str(p)) == ("focus", 5, 10)


@requires_reference
def test_load_reference_ube4b_msa():
    path = os.path.join(REFERENCE, "data/proteins/UBE4B_MOUSE.a2m")
    msa = pio.load_msa(path)
    # focus sequence first; focus columns are the uppercase window
    name, focus = msa[0]
    assert name.startswith(">UBE4B_MOUSE/1070-1173")
    assert len(focus) == 76  # 104 total - 23 left lowercase - 5 right lowercase
    assert focus == focus.upper()
    assert len(msa) > 3000
    # all rows share the focus width
    assert {len(s) for _, s in msa} == {76}


def test_sharded_txt_roundtrip(tmp_path):
    lines = [f"seq{i}" for i in range(11)]
    prefix = str(tmp_path / "pop")
    paths = pio.save_txt_sharded(lines, prefix, 3)
    assert len(paths) == 3
    assert pio.load_txt_sharded(prefix) == lines
