"""Streaming / out-of-core DB consumption (VERDICT r2 item 6).

The out-of-core *write* path existed in r2; these tests pin the read side:
``serialize.load(mmap=True)`` maps columns without materializing, and
``dump_database`` streams uncompressed DBs in bounded blocks so consumers
handle DBs larger than RAM (``i2l::batch_loader`` lazy-cursor contract,
``db_builder.cpp:392-458``).
"""

import io
import os
import resource

import numpy as np

from ipk_tpu import serialize
from ipk_tpu.db import PhyloKmerDB
from ipk_tpu.tools import diff_databases, dump_database


def _synthetic_db(K, max_count, rng, k=10):
    keys = np.sort(rng.choice(4 ** k, size=K, replace=False).astype(np.uint64))
    counts = rng.integers(1, max_count + 1, size=K)
    E = int(counts.sum())
    offsets = np.zeros(K + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    # branch per entry = its index within the key: unique per key (a DB
    # never holds duplicate (key, branch) pairs) and present in the tree
    branches = (np.arange(E, dtype=np.int64)
                - np.repeat(offsets[:-1], counts)).astype(np.uint32)
    db = PhyloKmerDB(k, 1.5, "nucl", "(a:1,b:1)r:0;", [(3, 2.0)])
    db.set_data(keys, rng.random(K).astype(np.float32) - 1.0, offsets,
                branches, (-rng.random(E)).astype(np.float32))
    return db


def test_mmap_load_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    db = _synthetic_db(5_000, 3, rng)
    f = str(tmp_path / "db.ipk")
    serialize.save(db, f, compressed=False)
    m = serialize.load(f, mmap=True)
    assert isinstance(m.keys, np.memmap)
    np.testing.assert_array_equal(np.asarray(m.keys), db.keys)
    np.testing.assert_array_equal(np.asarray(m.scores), db.scores)
    assert m.tree_index == db.tree_index
    # compressed files fall back to the in-RAM loader transparently
    fc = str(tmp_path / "db_c.ipk")
    serialize.save(db, fc, compressed=True)
    c = serialize.load(fc, mmap=True)
    assert not isinstance(c.keys, np.memmap)
    np.testing.assert_array_equal(c.keys, db.keys)
    # diff accepts mmap-backed inputs
    assert diff_databases(f, fc)


def test_streaming_dump_matches_full_load(tmp_path):
    rng = np.random.default_rng(1)
    db = _synthetic_db(400, 3, rng)
    fu = str(tmp_path / "u.ipk")
    fc = str(tmp_path / "c.ipk")
    serialize.save(db, fu, compressed=False)
    serialize.save(db, fc, compressed=True)
    su, sc = io.StringIO(), io.StringIO()
    dump_database(fu, su)       # streaming (BatchLoader)
    dump_database(fc, sc)       # full load
    assert su.getvalue() == sc.getvalue()
    assert su.getvalue().count("\n") > 400


def test_streaming_dump_bounded_rss(tmp_path):
    """Dump of a DB much larger than the block size must not grow resident
    memory by anything near the file size (bounded-block contract)."""
    rng = np.random.default_rng(2)
    K, max_count = 2_500_000, 3          # ~90 MB on disk
    db = _synthetic_db(K, max_count, rng, k=13)
    f = str(tmp_path / "big.ipk")
    serialize.save(db, f, compressed=False)
    size = os.path.getsize(f)
    assert size > 60 << 20
    del db

    class _Null(io.TextIOBase):
        def __init__(self):
            self.lines = 0

        def write(self, s):
            self.lines += s.count("\n")
            return len(s)

    before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB
    sink = _Null()
    dump_database(f, sink)
    after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert sink.lines > K
    grown = (after - before) * 1024
    assert grown < size // 3, (
        f"dump grew RSS by {grown >> 20} MiB for a {size >> 20} MiB DB — "
        "not streaming")


# ---------------------------------------------------------------------------
# r5: vectorized diff_plain_text (verdict weak #3) — semantics + scale
# ---------------------------------------------------------------------------

def test_diff_plain_text_semantics(tmp_path):
    from ipk_tpu.tools import diff_plain_text
    k, omega = 4, 1.5
    threshold = (omega / 4) ** k            # linear detection threshold
    eps = 1e-3

    def mk(path, rows):
        rows = sorted(rows)
        keys = np.array([r[0] for r in rows], np.uint64)
        branches = np.array([r[1] for r in rows], np.uint32)
        scores = np.log10([r[2] for r in rows]).astype(np.float32)
        offsets = np.arange(len(rows) + 1, dtype=np.int64)
        db = PhyloKmerDB(k, omega, "nucl", "(a:1,b:1)r:0;", [(3, 2.0)])
        db.set_data(keys, np.zeros(len(rows), np.float32), offsets,
                    branches, scores)
        serialize.save(db, str(path), compressed=False)

    # rows: (key, branch, linear score)
    a = str(tmp_path / "a.ipk"); b = str(tmp_path / "b.ipk")
    mk(a, [(1, 0, 0.5),                       # equal in both -> ok
           (2, 0, 0.5),                       # differs beyond eps -> DIFF
           (3, 0, threshold + eps / 2),       # a-only near threshold -> ok
           (4, 0, 0.5),                       # a-only real -> DIFF
           (5, 0, 0.5), (5, 1, 0.30004)])     # within eps -> ok
    mk(b, [(1, 0, 0.5),
           (2, 0, 0.8),
           (5, 0, 0.5), (5, 1, 0.3),
           (6, 0, threshold - eps / 2),       # b-only near threshold -> ok
           (7, 0, 0.9)])                      # b-only real -> DIFF
    assert diff_plain_text(a, b, eps=eps, verbose=False) is False
    # drop the real diffs on both sides -> OK
    a2 = str(tmp_path / "a2.ipk"); b2 = str(tmp_path / "b2.ipk")
    mk(a2, [(1, 0, 0.5), (3, 0, threshold + eps / 2),
            (5, 0, 0.5), (5, 1, 0.30004)])
    mk(b2, [(1, 0, 0.5), (5, 0, 0.5), (5, 1, 0.3),
            (6, 0, threshold - eps / 2)])
    assert diff_plain_text(a2, b2, eps=eps, verbose=False) is True


def test_diff_plain_text_at_scale(tmp_path):
    """500k keys diff in seconds without per-entry Python objects."""
    import time
    from ipk_tpu.tools import diff_plain_text
    rng = np.random.default_rng(11)
    db = _synthetic_db(500_000, 3, rng)
    f1 = str(tmp_path / "s1.ipk"); f2 = str(tmp_path / "s2.ipk")
    serialize.save(db, f1, compressed=False)
    serialize.save(db, f2, compressed=False)
    t0 = time.perf_counter()
    assert diff_plain_text(f1, f2, verbose=False) is True
    assert time.perf_counter() - t0 < 10.0
