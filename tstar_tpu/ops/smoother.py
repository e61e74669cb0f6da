"""Residual-targeted smoothing of the per-second score distribution.

The reference refits the frame-probability distribution every iteration with
``scipy.interpolate.UnivariateSpline(visited, scores, s=0.5)`` evaluated on
all frames, then applies sigmoid, a 1/N floor, and normalization (reference
``TStar/interface_searcher.py:243-274``).

FITPACK's spline (adaptive knot insertion, host-side, variable-size) does not
map to XLA.  We solve the same variational problem on the fixed 1-fps grid
instead: a weighted discrete smoothing spline (Whittaker-Eilers smoother with
second-order differences),

    minimize   sum_i w_i (f_i - y_i)^2  +  lam * sum_i (f_{i} - 2 f_{i+1} + f_{i+2})^2

with w_i = 1 on visited seconds and 0 elsewhere, and ``lam`` selected so the
weighted residual matches FITPACK's smoothing target ``s`` (the same
residual-targeting rule UnivariateSpline uses).  The normal equations are a
symmetric positive-definite pentadiagonal system, batched across a log-space
``lam`` grid so one sweep evaluates the whole smoothing path at once.

Two solvers for that system live here:

* ``_penta_solve_batch`` — LDL^T factorization as two ``lax.scan`` passes.
  Sequential depth ~2N; kept as the semantic oracle.
* ``_penta_solve_cr`` — the production TPU solver.  The pentadiagonal matrix
  is block-tridiagonal with 2x2 blocks; block cyclic reduction eliminates
  the odd-indexed blocks level by level, so the sequential depth is
  ~2*log2(N/2) fully-vectorized levels instead of ~2N scalar scan steps.
  This matters because the solve sits inside EVERY search step of EVERY
  video: in the detection-sparse regime (no verification forwards) the scan
  solver's latency was the measured batching plateau (PERFORMANCE.md, r2:
  ~9.8k frames/s flat from B=8 to B=16).  Equality with the scan solver is
  pinned in tests/test_smoother.py.

Known deviations from FITPACK (bounded downstream by sigmoid + floor +
normalization; validated against scipy goldens in ``tests/test_smoother.py``):
  * discrete second difference instead of the exact cubic-spline curvature
    operator (they differ by a near-identity tridiagonal mass matrix);
  * linear rather than cubic extrapolation outside the visited span.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# log10(lam) sweep bounds: lam below 1e-5 is numerically an interpolant, above
# 1e5 a straight line for score-scale data.  ONE dense sweep at ~0.07 decade
# resolution (the lam axis is a cheap VPU batch dimension; the EXPENSIVE
# direction is the sequential scan over N, so one dense sweep beats two
# nested coarse/fine sweeps 2x in latency at equal resolution).
_LOG_LAM_LO = -5.0
_LOG_LAM_HI = 5.0
_SWEEP = 145  # lam values in the single dense sweep (resolution 10/144 dec)

# The scans are latency-bound (tiny elementwise bodies over the lam batch);
# unrolling trades a little code size for ~UNROLL x fewer sequential steps.
_UNROLL = 16


def _penta_diagonals(n_pad: int, n_valid: jax.Array, dtype) -> Tuple[jax.Array, ...]:
    """Diagonals of D^T D for the second-difference matrix on the valid prefix."""
    i = jnp.arange(n_pad)
    nv = n_valid
    d0 = (
        (i <= nv - 3).astype(dtype)
        + 4.0 * ((i >= 1) & (i <= nv - 2)).astype(dtype)
        + ((i >= 2) & (i <= nv - 1)).astype(dtype)
    )
    d1 = jnp.where(
        (i == 0) | (i == nv - 2), -2.0, jnp.where((i >= 1) & (i <= nv - 3), -4.0, 0.0)
    ).astype(dtype)
    d1 = jnp.where(i <= nv - 2, d1, 0.0)
    d2 = (i <= nv - 3).astype(dtype)
    return d0, d1, d2


def _penta_solve_batch(
    d0: jax.Array,  # (N, L) main diagonal
    d1: jax.Array,  # (N, L) first superdiagonal  (d1[i] = A[i, i+1])
    d2: jax.Array,  # (N, L) second superdiagonal (d2[i] = A[i, i+2])
    b: jax.Array,   # (N, L) right-hand side
) -> jax.Array:
    """Solve A x = b for a batch of symmetric pentadiagonal SPD systems.

    LDL^T recurrences (unit lower-triangular L with subdiagonals e, f):
        f_i = d2[i-2] / D[i-2]
        e_i = (d1[i-1] - f_i * D[i-2] * e_{i-1}) / D[i-1]
        D_i = d0[i] - e_i^2 D[i-1] - f_i^2 D[i-2]
    forward substitution z_i = b_i - e_i z_{i-1} - f_i z_{i-2}, then
    x_i = z_i / D_i - e_{i+1} x_{i+1} - f_{i+2} x_{i+2} on the reverse pass.
    """
    n, batch = b.shape
    zeros = jnp.zeros((batch,), b.dtype)
    d1_im1 = jnp.concatenate([zeros[None], d1[:-1]], axis=0)
    d2_im2 = jnp.concatenate([jnp.zeros((2, batch), b.dtype), d2[:-2]], axis=0)

    def fwd(carry, inp):
        D1, D2, e1, z1, z2 = carry  # values at i-1 / i-2
        d0i, d1i, d2i, bi = inp
        f = d2i / D2
        e = (d1i - f * D2 * e1) / D1
        D = d0i - e * e * D1 - f * f * D2
        z = bi - e * z1 - f * z2
        return (D, D1, e, z, z1), (D, e, f, z)

    ones = jnp.ones((batch,), b.dtype)
    init = (ones, ones, zeros, zeros, zeros)
    _, (D, e, f, z) = jax.lax.scan(
        fwd, init, (d0, d1_im1, d2_im2, b), unroll=_UNROLL
    )

    w = z / D
    e_ip1 = jnp.concatenate([e[1:], zeros[None]], axis=0)
    f_ip2 = jnp.concatenate([f[2:], jnp.zeros((2, batch), b.dtype)], axis=0)

    def bwd(carry, inp):
        x1, x2 = carry  # x at i+1 / i+2
        wi, ei, fi = inp
        x = wi - ei * x1 - fi * x2
        return (x, x1), x

    _, x_rev = jax.lax.scan(
        bwd, (zeros, zeros), (w[::-1], e_ip1[::-1], f_ip2[::-1]), unroll=_UNROLL
    )
    return x_rev[::-1]


def _inv2x2(m: jax.Array) -> jax.Array:
    """Closed-form inverse of a batch of 2x2 matrices (..., 2, 2)."""
    a = m[..., 0, 0]
    b = m[..., 0, 1]
    c = m[..., 1, 0]
    d = m[..., 1, 1]
    det = a * d - b * c
    inv = jnp.stack(
        [jnp.stack([d, -b], axis=-1), jnp.stack([-c, a], axis=-1)], axis=-2
    )
    return inv / det[..., None, None]


def _mm(x: jax.Array, y: jax.Array) -> jax.Array:
    """Batched 2x2 @ 2x2, expanded elementwise (a 2x2 einsum would become a
    tiny dot_general; explicit mul/add stays fused on the VPU)."""
    return jnp.stack(
        [
            jnp.stack(
                [
                    x[..., 0, 0] * y[..., 0, 0] + x[..., 0, 1] * y[..., 1, 0],
                    x[..., 0, 0] * y[..., 0, 1] + x[..., 0, 1] * y[..., 1, 1],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    x[..., 1, 0] * y[..., 0, 0] + x[..., 1, 1] * y[..., 1, 0],
                    x[..., 1, 0] * y[..., 0, 1] + x[..., 1, 1] * y[..., 1, 1],
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def _mv(x: jax.Array, v: jax.Array) -> jax.Array:
    """Batched 2x2 @ 2-vector."""
    return jnp.stack(
        [
            x[..., 0, 0] * v[..., 0] + x[..., 0, 1] * v[..., 1],
            x[..., 1, 0] * v[..., 0] + x[..., 1, 1] * v[..., 1],
        ],
        axis=-1,
    )


def _mt(x: jax.Array) -> jax.Array:
    return jnp.swapaxes(x, -1, -2)


def _penta_solve_cr(
    d0: jax.Array,  # (N, L) main diagonal
    d1: jax.Array,  # (N, L) first superdiagonal  (d1[i] = A[i, i+1])
    d2: jax.Array,  # (N, L) second superdiagonal (d2[i] = A[i, i+2])
    b: jax.Array,   # (N, L) right-hand side
) -> jax.Array:
    """Solve A x = b (symmetric pentadiagonal SPD, batched over L) by 2x2
    block cyclic reduction.

    Pairs ``(x_{2i}, x_{2i+1})`` form blocks; A becomes block-tridiagonal

        Bᵀ_{i-1} x_{i-1} + C_i x_i + B_i x_{i+1} = rhs_i

    with  C_i = [[d0_{2i},   d1_{2i}  ], [d1_{2i},   d0_{2i+1}]]
          B_i = [[d2_{2i},   0        ], [d1_{2i+1}, d2_{2i+1}]].

    Each reduction level solves the odd blocks symbolically and substitutes
    them into the even equations (which stay block-tridiagonal with

        C'_i = C_i − Bᵀ_{i-1} C⁻¹_{i-1} B_{i-1} − B_i C⁻¹_{i+1} Bᵀ_i
        B'_i = − B_i C⁻¹_{i+1} B_{i+1}
        r'_i = r_i − Bᵀ_{i-1} C⁻¹_{i-1} r_{i-1} − B_i C⁻¹_{i+1} r_{i+1}),

    then back-substitution walks the levels in reverse:
        x_j = C⁻¹_j (r_j − Bᵀ_{j-1} x_{j-1} − B_j x_{j+1})   for odd j.

    Every level is pure elementwise math over the remaining blocks x L, so
    the sequential depth is 2*log2(N/2) vector ops.  The block count pads to
    a power of two with identity blocks (decoupled; rows already carry
    identity equations for inactive padding).
    """
    n, batch = b.shape
    assert n % 2 == 0, "pentadiagonal CR needs an even (padded) length"
    m = n // 2
    # (m, L, 2, 2) diagonal and super-diagonal blocks, (m, L, 2) rhs.
    c_blk = jnp.stack(
        [
            jnp.stack([d0[0::2], d1[0::2]], axis=-1),
            jnp.stack([d1[0::2], d0[1::2]], axis=-1),
        ],
        axis=-2,
    )
    zeros = jnp.zeros_like(d2[0::2])
    b_blk = jnp.stack(
        [
            jnp.stack([d2[0::2], zeros], axis=-1),
            jnp.stack([d1[1::2], d2[1::2]], axis=-1),
        ],
        axis=-2,
    )
    # The last block has no successor: clear its coupling block.
    b_blk = b_blk.at[-1].set(0.0)
    rhs = jnp.stack([b[0::2], b[1::2]], axis=-1)

    m_pow = 1 << (m - 1).bit_length()
    if m_pow != m:
        eye = jnp.broadcast_to(
            jnp.eye(2, dtype=b.dtype), (m_pow - m, batch, 2, 2)
        )
        c_blk = jnp.concatenate([c_blk, eye], axis=0)
        b_blk = jnp.concatenate(
            [b_blk, jnp.zeros((m_pow - m, batch, 2, 2), b.dtype)], axis=0
        )
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((m_pow - m, batch, 2), b.dtype)], axis=0
        )

    levels = []
    while c_blk.shape[0] > 1:
        c_odd_inv = _inv2x2(c_blk[1::2])
        b_even = b_blk[0::2]          # B_i for even i (couples i -> i+1 odd)
        b_odd = b_blk[1::2]           # B_j for odd j (0 for the final block)
        rhs_odd = rhs[1::2]
        # B_{i-1} / C⁻¹_{i-1} / r_{i-1} for even i are the odd-row arrays
        # shifted down one slot (identity/zero placeholders at i=0).
        b_prev = jnp.concatenate([jnp.zeros_like(b_odd[:1]), b_odd[:-1]])
        c_prev_inv = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.eye(2, dtype=b.dtype), c_odd_inv[:1].shape),
                c_odd_inv[:-1],
            ]
        )
        rhs_prev = jnp.concatenate([jnp.zeros_like(rhs_odd[:1]), rhs_odd[:-1]])

        left = _mm(_mt(b_prev), c_prev_inv)       # Bᵀ_{i-1} C⁻¹_{i-1}
        right = _mm(b_even, c_odd_inv)            # B_i C⁻¹_{i+1}
        c_new = (
            c_blk[0::2]
            - _mm(left, b_prev)
            - _mm(right, _mt(b_even))
        )
        b_new = -_mm(right, b_odd)
        rhs_new = rhs[0::2] - _mv(left, rhs_prev) - _mv(right, rhs_odd)

        levels.append((c_odd_inv, rhs_odd, b_even, b_odd))
        c_blk, b_blk, rhs = c_new, b_new, rhs_new

    x = _mv(_inv2x2(c_blk), rhs)                  # (1, L, 2) base solve

    for c_odd_inv, rhs_odd, b_even, b_odd in reversed(levels):
        # odd j sits between even neighbours x_{j-1}=x[i] and x_{j+1}=x[i+1]
        x_next = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])])
        x_odd = _mv(
            c_odd_inv, rhs_odd - _mv(_mt(b_even), x) - _mv(b_odd, x_next)
        )
        stacked = jnp.stack([x, x_odd], axis=1)   # (m/2, 2, L, 2)
        x = stacked.reshape(-1, *x.shape[1:])

    x = x[:m]                                      # drop pow2 padding blocks
    # (m, L, 2) -> interleave the in-block pair back onto the row axis
    return x.transpose(0, 2, 1).reshape(n, batch)


def _sweep(
    y: jax.Array,
    weights: jax.Array,
    pent: Tuple[jax.Array, jax.Array, jax.Array],
    log_lams: jax.Array,  # (L,)
) -> Tuple[jax.Array, jax.Array]:
    """Solve the smoother for each lam; return (solutions (L, N), residuals (L,))."""
    p0, p1, p2 = pent
    lams = jnp.power(10.0, log_lams).astype(y.dtype)  # (L,)
    # Pad rows with zero weight AND zero curvature rows get identity equations.
    inactive = (weights == 0) & (p0 == 0)
    d0 = weights[:, None] + lams[None, :] * p0[:, None]
    d0 = jnp.where(inactive[:, None], 1.0, d0)
    d1 = lams[None, :] * p1[:, None]
    d2 = lams[None, :] * p2[:, None]
    b = (weights * y)[:, None] * jnp.ones_like(lams)[None, :]
    x = _penta_solve_cr(d0, d1, d2, b)  # (N, L)
    resid = jnp.sum(weights[:, None] * (x - y[:, None]) ** 2, axis=0)  # (L,)
    return x.T, resid


@functools.partial(jax.jit, static_argnames=("smoothing",))
def fit_smoother(
    y: jax.Array,          # (N_pad,) observed scores
    weights: jax.Array,    # (N_pad,) 1.0 on visited-and-valid seconds, else 0.0
    n_valid: jax.Array,    # scalar int: true video length
    smoothing: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Fit the residual-targeted smoother; returns (fitted (N_pad,), log10 lam)."""
    dtype = y.dtype
    pent = _penta_diagonals(y.shape[0], n_valid, dtype)

    def pick(log_lams, xs, resids):
        # Largest lam whose residual stays within the target (most smoothing
        # allowed by the residual budget), mirroring FITPACK's s-targeting.
        ok = resids <= smoothing
        idx = jnp.where(jnp.any(ok), jnp.max(jnp.where(ok, jnp.arange(len(log_lams)), -1)), 0)
        return log_lams[idx], xs[idx], idx

    grid = jnp.linspace(_LOG_LAM_LO, _LOG_LAM_HI, _SWEEP)
    xs, resids = _sweep(y, weights, pent, grid)
    best_log, x_best, _ = pick(grid, xs, resids)
    return x_best, best_log


def smoothing_spline_distribution(
    score_distribution: jax.Array,  # (N_pad,)
    visited: jax.Array,             # (N_pad,) bool
    valid: jax.Array,               # (N_pad,) bool: true-length mask
    n_valid: jax.Array,             # scalar int
    smoothing: float = 0.5,
) -> jax.Array:
    """Reference ``spline_keyframe_distribution`` on the padded grid.

    smooth(visited scores) -> max(1/N, .) -> sigmoid -> normalize
    (interface_searcher.py:265-274).  Fewer than 2 visited seconds falls back
    to uniform (the reference returns uniform at 0 and crashes at 1; we extend
    the uniform branch to both).
    """
    dtype = score_distribution.dtype
    w = (visited & valid).astype(dtype)
    fitted, _ = fit_smoother(score_distribution, w, n_valid, smoothing=smoothing)

    floor = 1.0 / n_valid.astype(dtype)
    adjusted = jnp.maximum(floor, fitted)
    p = jax.nn.sigmoid(adjusted) * valid.astype(dtype)
    p = p / jnp.sum(p)

    uniform = valid.astype(dtype) / n_valid.astype(dtype)
    return jnp.where(jnp.sum(w) < 2, uniform, p)
