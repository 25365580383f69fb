"""Maximum-likelihood optimization of branch lengths and model parameters
for the native ancestral-reconstruction path.

The reference delegates this to raxml-ng: its AR invocation passes
``--blopt nr_safe --opt-model on --opt-branches on`` (``ipk/src/ar.cpp:684``),
so the posteriors it consumes are computed under *optimized* branch lengths,
GTR exchangeabilities, and the Γ shape alpha. ``ar/native.py`` computes
posteriors natively but (until this module) took all parameters as given.
Here the whole Felsenstein pruning likelihood is expressed as one
differentiable JAX computation and maximized with gradient ascent on TPU —
the idiomatic replacement for raxml-ng's Newton-Raphson loops:

* branch lengths: softplus-parameterized (strictly positive), one free scalar
  per branch;
* GTR exchangeabilities (DNA): log-parameterized, last rate (G<->T) pinned to
  1 as the usual identifiability convention; for amino acids rate optimization
  is off by default (the reference uses fixed empirical matrices there);
* Γ shape alpha: softplus-parameterized. The discrete-Γ category rates are
  made differentiable in alpha by solving the quantile equations
  ``gammainc(a, a x) = q`` with fixed-count Newton iterations (each step uses
  ``jax.scipy.special.gammainc``, which is differentiable in both arguments),
  then applying the mean-of-interval identity with ``gammainc(a+1, .)``;
* stationary frequencies: empirical counts (the reference's ``+FC``), fixed.

The likelihood itself is the standard pruned sum over per-category partials
with per-node rescaling in log space; everything per-site is batched
``[cat, S, sigma] @ [sigma, sigma]`` matmuls on the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..seq import SeqTraits, DNA
from ..tree import PhyloTree, postorder
from ..alignment import Alignment
from .native import empirical_frequencies, _encode_leaves

__all__ = ["gamma_rates_jax", "tree_loglikelihood_fn", "optimize_parameters",
           "OptResult"]


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _softplus_inv(y):
    # inverse of log(1+e^x); y > 0
    y = np.asarray(y, dtype=np.float64)
    return np.where(y > 30.0, y, np.log(np.expm1(np.maximum(y, 1e-12))))


def gamma_rates_jax(alpha, categories: int, newton_steps: int = 30):
    """Mean rates of equal-probability discrete-Γ categories, differentiable
    in ``alpha`` (matches ``native.gamma_category_rates`` / raxml-ng's
    discretization, Yang 1994).

    Solves ``P(alpha, alpha * x_q) = q`` for the interior quantiles with
    Newton iterations on y = alpha*x (``d/dy P(a, y) = y^(a-1) e^-y / Γ(a)``),
    seeded by the Wilson-Hilferty approximation, then uses the identity
    ``E[X | x_lo < X < x_hi] * (1/categories) =
    (P(a+1, a*x_hi) - P(a+1, a*x_lo)) / a * a`` to get interval means.
    """
    from jax.scipy.special import gammainc, gammaln

    if categories <= 1:
        return jnp.ones(1, dtype=jnp.float32) * (alpha / alpha)
    alpha = jnp.asarray(alpha, dtype=jnp.float64)
    q = jnp.arange(1, categories, dtype=jnp.float64) / categories

    # Wilson-Hilferty: x_q ≈ a * (1 - 1/(9a) + z_q sqrt(1/(9a)))^3 for Γ(a,1)
    # (z_q = standard normal quantile via erfinv)
    z = jnp.sqrt(2.0) * jax.scipy.special.erfinv(2.0 * q - 1.0)
    y0 = alpha * (1.0 - 1.0 / (9.0 * alpha)
                  + z * jnp.sqrt(1.0 / (9.0 * alpha))) ** 3
    y0 = jnp.maximum(y0, 1e-8)

    log_gamma_a = gammaln(alpha)

    def newton(y, _):
        f = gammainc(alpha, y) - q
        log_pdf = (alpha - 1.0) * jnp.log(y) - y - log_gamma_a
        step = f / jnp.maximum(jnp.exp(log_pdf), 1e-300)
        y = jnp.clip(y - step, y * 0.1, y * 10.0)  # damped, stays positive
        return y, None

    y, _ = jax.lax.scan(newton, y0, None, length=newton_steps)

    # interval means of Γ(alpha, scale=1/alpha), normalized to mean 1:
    # P(a+1, y) at the interior edges; outer edges contribute 0 and 1
    inner = gammainc(alpha + 1.0, y)
    upper = jnp.concatenate([inner, jnp.ones(1, dtype=jnp.float64)])
    lower = jnp.concatenate([jnp.zeros(1, dtype=jnp.float64), inner])
    rates = (upper - lower) * categories
    rates = rates / jnp.mean(rates)
    return rates


def _expm_fixed(A, scalings: int = 12, order: int = 12):
    """Matrix exponential by scaling-and-squaring with a fixed-order Taylor
    (Horner) core: fully static control flow, differentiable, batched over
    leading dims. ``jax.scipy.linalg.expm``'s data-dependent Padé scaling
    does not compile on all TPU toolchains (and eigh's gradient is NaN at
    degenerate spectra); this is the robust fixed-shape alternative.

    Accuracy: with ||A|| ≤ ~200, the scaled norm is ≤ 0.05 and the order-12
    Taylor truncation error is ~1e-30; 12 squarings amplify rounding by
    ~2^12, well inside f64 (and f32) budgets for this use.
    """
    A = A / (2.0 ** scalings)
    eye = jnp.eye(A.shape[-1], dtype=A.dtype)
    R = eye + A / order
    for n in range(order - 1, 0, -1):
        R = eye + jnp.matmul(A, R) / n
    for _ in range(scalings):
        R = jnp.matmul(R, R)
    return R


def _gtr_q_jax(freqs, rates):
    """Normalized GTR rate matrix (same construction as
    ``native.gtr_eigendecomposition``, without the eigendecomposition:
    the differentiable path exponentiates with ``expm`` because eigh's
    gradient is NaN at degenerate eigenvalues — unit exchangeabilities,
    the standard starting point, are exactly that JC-like case)."""
    sigma = freqs.shape[0]
    iu = np.triu_indices(sigma, k=1)
    R = jnp.zeros((sigma, sigma), dtype=freqs.dtype)
    R = R.at[iu].set(rates)
    R = R + R.T
    Q = R * freqs[None, :]
    Q = Q - jnp.diag(jnp.diag(Q))
    Q = Q - jnp.diag(Q.sum(axis=1))
    scale = -(freqs * jnp.diag(Q)).sum()
    return Q / scale


@dataclasses.dataclass
class _TreeData:
    """Host-side flattening of the tree + alignment for the jitted loss."""
    n_nodes: int
    children: List[List[int]]          # per node, child indices (postorder ids)
    is_leaf: List[bool]
    branch_lengths: np.ndarray         # [n_nodes] (root entry unused)
    leaf_partials: Dict[int, np.ndarray]   # node idx -> [S, sigma]
    root_index: int


def _flatten_tree(tree: PhyloTree, align: Alignment,
                  traits: SeqTraits) -> _TreeData:
    nodes = list(postorder(tree.root))
    index = {id(n): i for i, n in enumerate(nodes)}
    leaves = _encode_leaves(align, traits)
    S = align.width
    sigma = traits.alphabet_size
    leaf_partials = {}
    children: List[List[int]] = []
    is_leaf: List[bool] = []
    for n in nodes:
        children.append([index[id(c)] for c in n.children])
        is_leaf.append(n.is_leaf())
        if n.is_leaf():
            leaf_partials[index[id(n)]] = leaves.get(
                n.label, np.ones((S, sigma), dtype=np.float32))
    bl = np.array([max(n.branch_length, 1e-8) for n in nodes],
                  dtype=np.float64)
    return _TreeData(len(nodes), children, is_leaf, bl,
                     leaf_partials, index[id(tree.root)])


def tree_loglikelihood_fn(tree: PhyloTree, align: Alignment,
                          traits: SeqTraits = DNA, categories: int = 4,
                          dtype=jnp.float64):
    """Returns (loglik(branch_lengths, rates, alpha, freqs) -> scalar, data).

    The returned function is a pure jittable/differentiable map from model
    parameters (linear space) to the total log-likelihood of the alignment
    under GTR+Γ — one unrolled Felsenstein pruning pass, f64 by default
    (parameter optimization is numerically delicate; this runs once per
    build, not in the per-window hot path).
    """
    data = _flatten_tree(tree, align, traits)
    leaf_arrays = {i: jnp.asarray(p, dtype=dtype)
                   for i, p in data.leaf_partials.items()}

    def loglik(branch_lengths, rates, alpha, freqs):
        Q = _gtr_q_jax(freqs.astype(dtype), rates.astype(dtype))
        cat_rates = gamma_rates_jax(alpha, categories).astype(dtype)
        n_cat = categories if categories > 1 else 1
        # transition matrices per (node, category) via fixed-shape expm
        # (eigh's gradient is undefined at degenerate eigenvalues)
        t_scaled = branch_lengths[:, None] * cat_rates[None, :]  # [n, cat]
        t_scaled = jnp.clip(t_scaled, 0.0, 100.0)  # expm scaling headroom
        P = _expm_fixed(Q[None, None] * t_scaled[:, :, None, None])
        P = jnp.clip(P, 1e-300, None)

        partials: List[Optional[jnp.ndarray]] = [None] * data.n_nodes
        logscale: List[Optional[jnp.ndarray]] = [None] * data.n_nodes
        for i in range(data.n_nodes):
            if data.is_leaf[i]:
                leaf = leaf_arrays[i]
                partials[i] = jnp.broadcast_to(
                    leaf[None], (n_cat,) + leaf.shape)
                logscale[i] = jnp.zeros(leaf.shape[0], dtype=dtype)
            else:
                acc = None
                ls = None
                for c in data.children[i]:
                    # [cat, x, y] @ [cat, S, y] -> [cat, S, x]
                    msg = jnp.einsum("cxy,csy->csx", P[c], partials[c])
                    acc = msg if acc is None else acc * msg
                    ls = logscale[c] if ls is None else ls + logscale[c]
                m = jnp.maximum(acc.max(axis=(0, 2)), 1e-300)  # per site
                partials[i] = acc / m[None, :, None]
                logscale[i] = ls + jnp.log(m)
        root = partials[data.root_index]
        site_lik = jnp.einsum("csx,x->s", root, freqs.astype(dtype)) / n_cat
        return (jnp.log(jnp.maximum(site_lik, 1e-300))
                + logscale[data.root_index]).sum()

    return loglik, data


@dataclasses.dataclass
class OptResult:
    branch_lengths: np.ndarray     # [n_nodes] postorder (root entry unused)
    rates: np.ndarray              # GTR exchangeabilities (upper triangle)
    alpha: float
    freqs: np.ndarray
    loglik_initial: float
    loglik_final: float
    steps: int


def optimize_parameters(tree: PhyloTree, align: Alignment,
                        traits: SeqTraits = DNA, *, alpha: float = 1.0,
                        categories: int = 4,
                        rates: Optional[np.ndarray] = None,
                        freqs: Optional[np.ndarray] = None,
                        optimize_rates: Optional[bool] = None,
                        optimize_alpha: bool = True,
                        optimize_branch_lengths: bool = True,
                        steps: int = 200, learning_rate: float = 0.02,
                        verbosity: int = 1) -> OptResult:
    """Gradient-ascent ML fit of branch lengths / GTR rates / Γ alpha.

    The native analog of raxml-ng's ``--opt-model on --opt-branches on``
    (``ipk/src/ar.cpp:684``). Frequencies stay empirical (``+FC``).
    ``optimize_rates`` defaults to True for DNA and False for amino acids
    (where the reference uses fixed empirical matrices).
    """
    import optax

    sigma = traits.alphabet_size
    n_rates = sigma * (sigma - 1) // 2
    if optimize_rates is None:
        optimize_rates = sigma == 4
    if freqs is None:
        freqs = empirical_frequencies(align, traits)
    if rates is None:
        rates = np.ones(n_rates)

    # Parameter optimization is tiny f64 compute (σ x σ matrices, one pass
    # per step) — pin it to the host CPU backend: accelerators emulate f64,
    # and remote-device transports compile/dispatch this graph pathologically
    # slowly. The posterior computation that follows stays on the device.
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    with jax.enable_x64(), jax.default_device(cpu):
        loglik, data = tree_loglikelihood_fn(tree, align, traits, categories)
        freqs_j = jnp.asarray(freqs, dtype=jnp.float64)

        params = {}
        if optimize_branch_lengths:
            params["bl_raw"] = jnp.asarray(
                _softplus_inv(data.branch_lengths), dtype=jnp.float64)
        if optimize_rates:
            # pin the last exchangeability to its initial value
            # (identifiability)
            params["log_rates"] = jnp.log(
                jnp.asarray(rates[:-1], dtype=jnp.float64))
        if optimize_alpha and categories > 1:
            params["alpha_raw"] = jnp.asarray(
                _softplus_inv(np.array(alpha)), dtype=jnp.float64)

        bl0 = jnp.asarray(data.branch_lengths, dtype=jnp.float64)
        rates0 = jnp.asarray(rates, dtype=jnp.float64)
        alpha0 = jnp.asarray(alpha, dtype=jnp.float64)

        def unpack(p):
            bl = (_softplus(p["bl_raw"]) if "bl_raw" in p else bl0)
            if "log_rates" in p:
                r = jnp.concatenate([jnp.exp(p["log_rates"]), rates0[-1:]])
            else:
                r = rates0
            a = (_softplus(p["alpha_raw"]) if "alpha_raw" in p else alpha0)
            return bl, r, a

        def loss(p):
            bl, r, a = unpack(p)
            return -loglik(bl, r, a, freqs_j)

        if not params:  # nothing to optimize
            ll = float(-jax.jit(loss)({}))
            return OptResult(data.branch_lengths, np.asarray(rates),
                             float(alpha), np.asarray(freqs), ll, ll, 0)
        value_and_grad = jax.jit(jax.value_and_grad(loss))
        opt = optax.adam(optax.cosine_decay_schedule(learning_rate, steps))
        state = opt.init(params)
        # always go through the jitted function: un-jitted evaluation
        # dispatches op-by-op (pathological over remote-device transports)
        value0 = float(value_and_grad(params)[0])
        if not np.isfinite(value0):
            raise RuntimeError(
                "native AR optimization: initial log-likelihood is not "
                "finite; check branch lengths and alignment")
        ll0 = -value0
        best = (value0, params)
        for i in range(steps):
            value, grads = value_and_grad(params)
            if not np.isfinite(float(value)):
                if verbosity > 0:
                    print(f"  [ar-opt] non-finite loss at step {i}; "
                          "stopping at best-seen parameters")
                break
            if float(value) < best[0]:
                best = (float(value), params)
            updates, state = opt.update(grads, state, params)
            params = optax.apply_updates(params, updates)
            if verbosity > 1 and i % 25 == 0:
                print(f"  [ar-opt] step {i:4d}  logL = {-float(value):.4f}")
        value = float(value_and_grad(params)[0])
        if np.isfinite(value) and value < best[0]:
            best = (value, params)
        bl, r, a = unpack(best[1])
        bl_np = np.asarray(bl, dtype=np.float64)
        result = OptResult(bl_np, np.asarray(r, dtype=np.float64),
                           float(a), np.asarray(freqs),
                           float(ll0), -float(best[0]), steps)
    if verbosity > 0:
        print(f"Native AR parameter optimization: logL "
              f"{result.loglik_initial:.4f} -> {result.loglik_final:.4f} "
              f"({steps} steps, alpha = {result.alpha:.4f})")
    return result


def apply_branch_lengths(tree: PhyloTree, bl: np.ndarray) -> None:
    """Write optimized branch lengths back onto the tree (postorder order,
    matching ``_flatten_tree``). The root's entry is ignored."""
    for i, node in enumerate(postorder(tree.root)):
        if node.parent is not None:
            node.branch_length = float(bl[i])
