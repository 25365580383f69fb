"""Tests for alignment preprocessing (reference ipk/src/alignment.cpp)."""

import pytest

from ipk_tpu.alignment import (Alignment, calculate_gap_ratio, extend_alignment,
                               load_alignment, preprocess_alignment,
                               read_fasta, reduce_alignment, write_phylip)
from ipk_tpu.tree import parse_newick, extend_tree


def make_fasta(tmp_path, records):
    p = tmp_path / "a.fasta"
    p.write_text("".join(f">{h}\n{s}\n" for h, s in records))
    return str(p)


def test_read_fasta_multiline(tmp_path):
    p = tmp_path / "m.fasta"
    p.write_text(">s1\nACGT\nACGT\n>s2 extra\nTTTTTTTT\n")
    recs = list(read_fasta(str(p)))
    assert recs == [("s1", "ACGTACGT"), ("s2 extra", "TTTTTTTT")]


def test_validate_unequal_lengths(tmp_path):
    f = make_fasta(tmp_path, [("a", "ACGT"), ("b", "ACG")])
    with pytest.raises(RuntimeError, match="same number of sites"):
        load_alignment(f).validate()


def test_gap_ratio():
    align = Alignment(["a", "b", "c", "d"],
                      ["A-GT", "A-G-", "A--T", "A-GT"])
    ratios = calculate_gap_ratio(align)
    assert ratios.tolist() == [0.0, 1.0, 0.25, 0.25]


def test_reduce_alignment_threshold_is_inclusive():
    # drop iff ratio >= reduction_ratio (alignment.cpp:168)
    align = Alignment(["a", "b"], ["A-CT", "A-C-"])
    # ratios: [0, 1.0, 0, 0.5] -> at 0.5 both col 1 and col 3 are dropped
    red = reduce_alignment(align, 0.5)
    assert red.sequences == ["AC", "AC"]
    red2 = reduce_alignment(align, 0.99)
    assert red2.sequences == ["ACT", "AC-"]


def test_preprocess_saves_reduced(tmp_path):
    f = make_fasta(tmp_path, [("a", "A-CT"), ("b", "A-C-")])
    wd = tmp_path / "wd"
    align = preprocess_alignment(str(wd), f, 0.99, no_reduction=False, verbose=0)
    assert align.width == 3
    saved = dict(read_fasta(str(wd / "align.reduced.fasta")))
    assert saved == {"a": "ACT", "b": "AC-"}


def test_no_reduction(tmp_path):
    f = make_fasta(tmp_path, [("a", "A-CT"), ("b", "A-C-")])
    align = preprocess_alignment(str(tmp_path / "w2"), f, 0.99,
                                 no_reduction=True, verbose=0)
    assert align.width == 4


def test_extend_alignment_adds_ghost_leaves():
    tree = parse_newick("((c:1.0,d:2.0)a:0.5,b:3.0)root;")
    ext, _ = extend_tree(tree)
    align = Alignment(["c", "d", "b"], ["ACGT", "AGGT", "TTTT"])
    extended = extend_alignment(align, ext)
    # original rows first, then ghost X2/X3 leaves in postorder
    assert extended.headers[:3] == ["c", "d", "b"]
    ghosts = extended.headers[3:]
    assert all(h.endswith("_X2") or h.endswith("_X3") for h in ghosts)
    assert len(ghosts) == 8  # 4 edges * 2 ghost leaves
    assert all(s == "----" for s in extended.sequences[3:])


def test_phylip_format(tmp_path):
    p = tmp_path / "out.phylip"
    write_phylip([("seq1", "A" * 25)], str(p))
    text = p.read_text()
    lines = text.split("\n")
    assert lines[0] == "\t1\t25"
    # 250-char label column then 10-char chunks
    row = lines[1]
    assert row.startswith("seq1" + " " * 246)
    body = row[250:]
    assert body == "AAAAAAAAAA AAAAAAAAAA AAAAA"
