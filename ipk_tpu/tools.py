"""Database verification tools: diff and dump.

Counterparts of ``tools/src/diff.cpp`` and ``tools/src/dump.cpp``. The key
fix over the reference (flagged in SURVEY.md §2.1/§4): ``diff_databases``
actually reports failure — the reference's ``ipkdiff`` discards its result and
always exits 0 (``diff.cpp:115-116``), making its CI equality check log-only.
"""

from __future__ import annotations

import math
from typing import TextIO

import numpy as np

from . import serialize
from .seq import get_traits, decode_kmer
from .tree import parse_newick

__all__ = ["diff_databases", "dump_database"]


def _report(name: str, match: bool, a, b) -> bool:
    status = "OK" if match else "DIFF"
    print(f"{name}:\t{status}\t{a}\t{b}")
    return match


def diff_databases(file1: str, file2: str, verbose: bool = False,
                   eps: float = 0.0) -> bool:
    """Field checks + bidirectional per-(kmer, branch) score comparison
    (``diff.cpp:24-295``), with exact comparison by default (stricter than the
    reference's EPS=1e-2, per BASELINE.md)."""
    a = serialize.load(file1)
    b = serialize.load(file2)

    ok = True
    ok &= _report("Sequence type", a.sequence_type == b.sequence_type,
                  a.sequence_type, b.sequence_type)
    ok &= _report("Protocol version", a.version == b.version,
                  a.version, b.version)
    ok &= _report("k-mer size", a.kmer_size == b.kmer_size,
                  a.kmer_size, b.kmer_size)
    ok &= _report("Omega", np.float32(a.omega) == np.float32(b.omega),
                  a.omega, b.omega)

    def log_eps(db):
        sigma = get_traits(db.sequence_type).alphabet_size
        return math.log10((db.omega / sigma) ** db.kmer_size)
    _report("Threshold", True, f"{log_eps(a):.6f}", f"{log_eps(b):.6f}")

    ok &= _report("Reference tree", a.tree == b.tree, " ", " ")
    ok &= _report("Tree index", a.tree_index == b.tree_index,
                  len(a.tree_index), len(b.tree_index))
    ok &= _report("Number of k-mers", a.size() == b.size(), a.size(), b.size())
    ok &= _report("Number of phylo-k-mers", a.num_entries() == b.num_entries(),
                  a.num_entries(), b.num_entries())

    diffs = []
    b_map = {key: dict((e[0], e[1]) for e in entries) for key, entries in b}
    for key, entries in a:
        eb = b_map.get(key)
        ea = dict((e[0], e[1]) for e in entries)
        if eb is None:
            diffs.extend((key, br, s, float("nan")) for br, s in ea.items())
            continue
        for br, s in ea.items():
            if br not in eb:
                diffs.append((key, br, s, float("nan")))
            elif not (abs(float(s) - float(eb[br])) <= eps):
                diffs.append((key, br, s, eb[br]))
        for br, s in eb.items():
            if br not in ea:
                diffs.append((key, br, float("nan"), s))
    a_keys = set(int(k) for k in a.keys)
    for key, entries in b:
        if key not in a_keys:
            diffs.extend((key, e[0], float("nan"), e[1]) for e in entries)

    ok &= _report("Phylo-k-mer scores", not diffs, len(diffs), "")
    if verbose and diffs:
        print("\t\tcode\tk-mer\tbranch\tA score\tB score")
        traits = get_traits(a.sequence_type)
        for key, br, sa, sb in diffs:
            print(f"\t\t{key}\t{decode_kmer(key, a.kmer_size, traits)}\t{br}\t"
                  f"{10 ** sa if not math.isnan(sa) else '-'}\t"
                  f"{10 ** sb if not math.isnan(sb) else '-'}")
    return bool(ok)


def diff_plain_text(file1: str, file2: str, eps: float = 1e-3,
                    verbose: bool = True) -> bool:
    """Tolerant linear-space comparison, the ``diff-plain-text.py`` analog:
    scores are compared as 10^log_score with tolerance ``eps``, and any score
    within ``eps`` of the detection threshold ``(omega/sigma)^k`` is ignored —
    boundary k-mers legitimately differ under float noise
    (``diff-plain-text.py:36-46,83-86``; threshold derived from the DB header
    instead of hardcoded)."""
    a = serialize.load(file1)
    b = serialize.load(file2)
    sigma = get_traits(a.sequence_type).alphabet_size
    threshold = (a.omega / sigma) ** a.kmer_size

    def to_map(db):
        return {key: {e[0]: 10.0 ** float(e[1]) for e in entries}
                for key, entries in db}

    ma, mb = to_map(a), to_map(b)

    def ignore(s1, s2):
        if s1 is not None and s2 is not None:
            return (abs(s1 - threshold) < eps or abs(s2 - threshold) < eps
                    or abs(s1 - s2) < eps)
        s = s1 if s1 is not None else s2
        return s is None or abs(s - threshold) < eps

    diffs = []
    for key in set(ma) | set(mb):
        ea = ma.get(key, {})
        eb = mb.get(key, {})
        for branch in set(ea) | set(eb):
            s1, s2 = ea.get(branch), eb.get(branch)
            if not ignore(s1, s2):
                diffs.append((key, branch, s1, s2))
    if diffs:
        if verbose:
            traits = get_traits(a.sequence_type)
            for key, branch, s1, s2 in sorted(diffs):
                print(f"{decode_kmer(key, a.kmer_size, traits)}\t{branch}\t"
                      f"{s1}\t{s2}")
        return False
    if verbose:
        print("OK")
    return True


def dump_database(filename: str, out: TextIO) -> None:
    """Reference ipkdump format (``dump.cpp:18-33``): the k-mer decoded to
    text, then per entry "\\t<10^score>\\t<node preorder id>" resolved through
    the DB-embedded newick tree."""
    db = serialize.load(filename)
    tree = parse_newick(db.tree)
    traits = get_traits(db.sequence_type)
    for key, entries in db:
        out.write(decode_kmer(key, db.kmer_size, traits) + "\n")
        for entry in entries:
            branch, score = entry[0], entry[1]
            node = tree.get_by_postorder_id(branch)
            out.write(f"\t{10 ** score:g}\t{node.preorder_id}\n")
