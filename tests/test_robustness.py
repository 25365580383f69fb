"""Robustness: randomized roundtrips and corrupted-input handling.

The reference gets this implicitly from boost::serialization's exceptions;
here the loaders' truncation/corruption guards are contract
(serialize._Reader.take, the offsets/num_entries cross-check) and the
roundtrip must be exact for every layout variant the writer can emit
(compressed / uncompressed / stored-score-column / positions)."""

import os
import zlib

import numpy as np
import pytest

from ipk_tpu import serialize
from ipk_tpu.db import PhyloKmerDB


def random_db(rng, K, positions=False, sigma_k=(4, 10)):
    sigma, k = sigma_k
    keys = np.sort(rng.choice(sigma ** k, size=K, replace=False)
                   ).astype(np.uint64)
    counts = rng.integers(1, 9, size=K)
    E = int(counts.sum())
    offsets = np.zeros(K + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    db = PhyloKmerDB(k, 1.5, "nucl" if sigma == 4 else "amino",
                     "(a:0.1,b:0.2)r:0;", [(3, 2.0), (1, 0.5)])
    db.set_data(keys,
                np.sort(rng.uniform(-5, 0, K)).astype(np.float32),
                offsets,
                rng.integers(0, 1000, E).astype(np.uint32),
                rng.uniform(-6, 0, E).astype(np.float32),
                rng.integers(0, 500, E).astype(np.uint32)
                if positions else None)
    return db


def assert_roundtrip(db, path, **load_kw):
    got = serialize.load(path, **load_kw)
    np.testing.assert_array_equal(got.keys, db.keys)
    np.testing.assert_array_equal(got.filter_values, db.filter_values)
    np.testing.assert_array_equal(got.offsets, db.offsets)
    np.testing.assert_array_equal(got.branches, db.branches)
    np.testing.assert_array_equal(got.scores, db.scores)
    if db.positions is None:
        assert got.positions is None
    else:
        np.testing.assert_array_equal(got.positions, db.positions)
    assert got.tree == db.tree and got.tree_index == db.tree_index
    assert got.kmer_size == db.kmer_size
    assert np.float32(got.omega) == np.float32(db.omega)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("compressed", [True, False])
@pytest.mark.parametrize("positions", [False, True])
def test_serialize_fuzz_roundtrip(tmp_path, seed, compressed, positions):
    rng = np.random.default_rng(seed)
    K = int(rng.integers(1, 4000))
    db = random_db(rng, K, positions=positions)
    path = str(tmp_path / "db.ipk")
    serialize.save(db, path, compressed=compressed)
    assert_roundtrip(db, path)
    if not compressed:
        assert_roundtrip(db, path, mmap=True)


def test_serialize_score_level_override(tmp_path, monkeypatch):
    """IPK_TPU_SCORE_ZLIB_LEVEL changes bytes on disk, never the content,
    and the file stays one standard zlib stream either way."""
    rng = np.random.default_rng(7)
    db = random_db(rng, 2000)
    paths = []
    for lvl in ("0", "2"):
        monkeypatch.setenv("IPK_TPU_SCORE_ZLIB_LEVEL", lvl)
        p = str(tmp_path / f"db{lvl}.ipk")
        serialize.save(db, p)
        assert_roundtrip(db, p)
        zlib.decompress(open(p, "rb").read())       # standard stream
        paths.append(p)
    # decompressed payloads are byte-identical across levels
    pay = [zlib.decompress(open(p, "rb").read()) for p in paths]
    assert pay[0] == pay[1]


def test_truncated_files_raise(tmp_path):
    rng = np.random.default_rng(3)
    db = random_db(rng, 500)
    for compressed in (True, False):
        p = str(tmp_path / f"t{compressed}.ipk")
        serialize.save(db, p, compressed=compressed)
        data = open(p, "rb").read()
        for frac in (0.3, 0.9, 0.999):
            cut = str(tmp_path / "cut.ipk")
            with open(cut, "wb") as f:
                f.write(data[:int(len(data) * frac)])
            with pytest.raises((RuntimeError, zlib.error, ValueError)):
                serialize.load(cut)


def test_corrupt_counts_detected(tmp_path):
    """An entry-count column that disagrees with num_entries must raise,
    not mis-slice the entry columns."""
    rng = np.random.default_rng(4)
    db = random_db(rng, 100)
    p = str(tmp_path / "c.ipk")
    serialize.save(db, p, compressed=False)
    data = bytearray(open(p, "rb").read())
    # counts column offset: magic+header, then keys(8K)+fvs(4K)
    # easier: bump the first count by 1 via locating it from the loader
    loader = serialize.BatchLoader(p)
    off, dtype, _ = loader._col_off["counts"]
    loader.close()
    first = int.from_bytes(data[off:off + 8], "little")
    data[off:off + 8] = (first + 1).to_bytes(8, "little")
    with open(p, "wb") as f:
        f.write(bytes(data))
    with pytest.raises(RuntimeError, match="Corrupt|Truncated"):
        serialize.load(p)


def test_not_a_database(tmp_path):
    p = str(tmp_path / "junk.ipk")
    with open(p, "wb") as f:
        f.write(b"definitely not an ipk file" * 10)
    with pytest.raises(RuntimeError, match="Not an ipk_tpu database"):
        serialize.load(p)


def test_tree_roundtrip_fuzz():
    """Random trees survive to_newick -> parse with ids, topology and
    branch lengths intact (shortest-roundtrip float formatting)."""
    from ipk_tpu.tree import parse_newick, to_newick
    rng = np.random.default_rng(11)
    for trial in range(10):
        n_leaves = int(rng.integers(2, 40))
        # random binary tree via sequential leaf attachment
        parts = [f"L{i}:{rng.uniform(0.001, 3):.6g}"
                 for i in range(n_leaves)]
        while len(parts) > 1:
            i = int(rng.integers(0, len(parts) - 1))
            a = parts.pop(i)
            b = parts.pop(int(rng.integers(0, len(parts))))
            parts.append(f"({a},{b}):{rng.uniform(0.001, 3):.6g}")
        nwk = parts[0].rsplit(":", 1)[0] + "root;"
        t1 = parse_newick(nwk)
        s1 = to_newick(t1)
        t2 = parse_newick(s1)
        s2 = to_newick(t2)
        assert s1 == s2
        n1 = t1.nodes_postorder()
        n2 = t2.nodes_postorder()
        assert len(n1) == len(n2)
        for a, b in zip(n1, n2):
            assert a.label == b.label
            assert (a.branch_length is None) == (b.branch_length is None)
            if a.branch_length is not None:
                assert np.float64(a.branch_length) == \
                    np.float64(b.branch_length)
