"""Test oracle: straightforward list-based DCLA in pure Python/numpy f32.

Implements the published divide-and-conquer enumeration semantics
(reference ``ipk/src/pk_compute.cpp:42-114``; algorithm from the phylo-k-mer
computation paper, doi 10.1093/bioinformatics/btad692) independently of the
production dense path, so the two can be cross-checked. All arithmetic is
float32 to mirror the reference's ``score_type``.
"""

import numpy as np


def best_prefix(P):
    """Sequential f32 prefix sums of per-column maxima (window.cpp:16-27)."""
    P = np.asarray(P, dtype=np.float32)
    out = np.zeros(P.shape[0] + 1, dtype=np.float32)
    acc = np.float32(0.0)
    for j in range(P.shape[0]):
        acc = np.float32(acc + P[j].max())
        out[j + 1] = acc
    return out


def dcla_window(P, w, k, eps, bits):
    """Survivor {key: score} for the window starting at column w.

    P: [S, sigma] f32 log10 scores; eps: f32 log threshold.
    """
    P = np.asarray(P, dtype=np.float32)
    prefix = best_prefix(P)
    sigma = P.shape[1]

    def range_max(start, length):
        return np.float32(prefix[w + start + length] - prefix[w + start])

    def dc(j, h, eps):
        if h == 1:
            return [(i, P[w + j, i]) for i in range(sigma) if P[w + j, i] > eps]
        hl = h // 2
        hr = h - hl
        eps_l = np.float32(eps - range_max(j + hl, hr))
        eps_r = np.float32(eps - range_max(j, hl))
        left = dc(j, hl, eps_l)
        right = dc(j + hl, hr, eps_r)
        out = []
        for a, a_score in left:
            for b, b_score in right:
                score = np.float32(a_score + b_score)
                if score > eps:
                    out.append(((a << (bits * hr)) | b, score))
        return out

    return dict(dc(0, k, np.float32(eps)))


def dcla_matrix_max(P, k, eps, bits):
    """insert-or-max over all windows of one matrix (branch_group.cpp:88-102)."""
    P = np.asarray(P, dtype=np.float32)
    result = {}
    for w in range(P.shape[0] - k + 1):
        for key, score in dcla_window(P, w, k, eps, bits).items():
            if key not in result or result[key] < score:
                result[key] = score
    return result
