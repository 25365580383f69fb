"""CLI surface tests: build/diff/dump subcommands (cf. ipk.py + tools/)."""

import os

import numpy as np
from click.testing import CliRunner

from ipk_tpu.cli import ipk
from fixtures import make_project


def test_build_help():
    result = CliRunner().invoke(ipk, ["build", "--help"])
    assert result.exit_code == 0
    # option surface mirrors ipk.py
    for opt in ["--refalign", "--reftree", "--states", "--workdir", "--omega",
                "--filter", "--ghosts", "--use-unrooted", "--ar-dir",
                "--ar-only", "--keep-positions", "--uncompressed", "--on-disk",
                "--merge-branches", "--reduction-ratio", "--no-reduction"]:
        assert opt in result.output, opt


def test_build_diff_dump_roundtrip(tmp_path):
    tree_file, fasta_file, ar_dir = make_project(tmp_path, num_leaves=5,
                                                 width=20, seed=3)
    wd = str(tmp_path / "wd")
    out = str(tmp_path / "DB.ipk")
    runner = CliRunner()
    r = runner.invoke(ipk, ["build", "-r", fasta_file, "-t", tree_file,
                            "-w", wd, "-k", "4", "--omega", "1.5",
                            "--ar-dir", ar_dir, "-o", out, "-v", "0",
                            "-m", "GTR"])
    assert r.exit_code == 0, r.output
    assert os.path.exists(out)

    # diff with itself: OK, exit 0
    r = runner.invoke(ipk, ["diff", out, out])
    assert r.exit_code == 0
    assert "DIFF" not in r.output

    # diff against a different build: exit 1 (unlike reference ipkdiff!)
    out2 = str(tmp_path / "DB2.ipk")
    r = runner.invoke(ipk, ["build", "-r", fasta_file, "-t", tree_file,
                            "-w", str(tmp_path / "wd2"), "-k", "4",
                            "--omega", "2.0", "--ar-dir", ar_dir, "-o", out2,
                            "-v", "0", "-m", "GTR"])
    assert r.exit_code == 0, r.output
    r = runner.invoke(ipk, ["diff", out, out2])
    assert r.exit_code == 1
    assert "DIFF" in r.output

    # dump format: kmer line then tab-indented entries with 10^score
    r = runner.invoke(ipk, ["dump", out])
    assert r.exit_code == 0
    lines = r.output.splitlines()
    assert len(lines) > 2
    assert not lines[0].startswith("\t")
    assert lines[1].startswith("\t")
    assert set(lines[0]) <= set("ACGT")


def test_keep_positions_rejected_for_dna(tmp_path):
    r = CliRunner().invoke(ipk, ["build", "-r", __file__, "-t", __file__,
                                 "-w", str(tmp_path), "--keep-positions",
                                 "-m", "GTR"])
    assert r.exit_code != 0
    assert "not supported for DNA" in r.output


def test_invalid_filter_and_model(tmp_path):
    r = CliRunner().invoke(ipk, ["build", "-r", __file__, "-t", __file__,
                                 "-w", str(tmp_path), "--filter", "bogus",
                                 "-m", "GTR"])
    assert r.exit_code != 0
    r = CliRunner().invoke(ipk, ["build", "-r", __file__, "-t", __file__,
                                 "-w", str(tmp_path), "-m", "NOTAMODEL"])
    assert r.exit_code != 0
