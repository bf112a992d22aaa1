"""Multiresolution hash-grid encoding (Instant-NGP).

TPU-native replacement for tiny-cuda-nn's ``HashGrid`` encoding, which the
reference consumes through ``tcnn.NetworkWithInputEncoding``
(``perception/models/radiance_fields/ngp.py:123-141``: 16 levels,
4 features/level, 2^19 table, base res 16 → max res 4096, geometric
per-level scale).

Design:
  * One [L, T, F] feature table (all levels same hashmap size, like tcnn).
  * Levels whose dense grid fits in T index directly; larger levels use the
    Instant-NGP spatial hash with primes (1, 2654435761, 805459861) — same
    scheme tcnn uses, so collision statistics match.
  * ``hash_encode`` (the production path) batches ALL levels' corner
    lookups into ONE row-gather from the [L*T, F] flattened table, and
    isolates that gather (and, via the barrier transpose rule, the
    scatter-add in the backward) behind ``lax.optimization_barrier``.
    Measured on a v5e: when XLA fuses the index arithmetic / trilerp
    multiply into the gather/scatter it scalarizes them — 13.8 ms/level
    forward and 176 ms/level backward; the isolated memory ops run at
    0.08 ms / 0.07 ms. The barriers are a 170x training-step speedup,
    not a style choice (scripts/profile_gather.py).
  * ``hash_encode_ref`` keeps the naive per-level formulation as the
    numerics oracle (tests/test_encodings.py checks they agree).
  * Backward (scatter-add into the table) comes from JAX autodiff of the
    isolated gather.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


class HashGridConfig(NamedTuple):
    n_levels: int = 16
    n_features: int = 4
    log2_table_size: int = 19
    base_resolution: int = 16
    max_resolution: int = 4096

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    @property
    def per_level_scale(self) -> float:
        # ngp.py:103-105
        return float(
            np.exp(
                (np.log(self.max_resolution) - np.log(self.base_resolution))
                / max(self.n_levels - 1, 1)
            )
        )

    @property
    def resolutions(self) -> np.ndarray:
        """Per-level grid resolution, floor(base * scale^l) as in tcnn."""
        s = self.per_level_scale
        return np.array(
            [
                int(np.floor(self.base_resolution * (s**l) + 1e-6))
                for l in range(self.n_levels)
            ],
            dtype=np.int32,
        )

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features


def init_hash_table(key: jax.Array, cfg: HashGridConfig, dtype=jnp.float32):
    """tcnn initializes hash tables U(-1e-4, 1e-4)."""
    return jax.random.uniform(
        key,
        (cfg.n_levels, cfg.table_size, cfg.n_features),
        minval=-1e-4,
        maxval=1e-4,
        dtype=dtype,
    )


def _level_indices(coords: jnp.ndarray, res: int, table_size: int) -> jnp.ndarray:
    """Table index for integer grid coords [..., 3] at one level.

    Dense indexing when the (res+1)^3 grid fits the table, else the
    Instant-NGP xor-of-prime-multiples spatial hash.
    """
    n_dense = (res + 1) ** 3
    c = coords.astype(jnp.uint32)
    if n_dense <= table_size:
        stride = res + 1
        return (
            c[..., 0] + c[..., 1] * stride + c[..., 2] * (stride * stride)
        ).astype(jnp.int32)
    h = c[..., 0] * np.uint32(_PRIMES[0])
    h = h ^ (c[..., 1] * np.uint32(_PRIMES[1]))
    h = h ^ (c[..., 2] * np.uint32(_PRIMES[2]))
    return (h % np.uint32(table_size)).astype(jnp.int32)


# The 8 trilinear corner offsets, [8, 3].
_CORNERS = np.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=np.int32
)


def hash_encode_ref(
    table: jnp.ndarray,  # [L, T, F]
    x: jnp.ndarray,  # [N, 3] in [0, 1]
    cfg: HashGridConfig,
) -> jnp.ndarray:
    """Naive per-level oracle for :func:`hash_encode` (same math, simple
    formulation; slow on TPU because XLA fuses arithmetic into the
    gathers). Kept for tests.

    Matches tcnn's convention: a level of resolution R scales the position
    by R and trilinearly interpolates the 8 surrounding integer vertices.
    """
    N = x.shape[0]
    feats = []
    resolutions = cfg.resolutions
    for lvl in range(cfg.n_levels):
        res = int(resolutions[lvl])
        xs = x * res  # tcnn: pos = x * scale (+0.5 rounding variant omitted)
        x0 = jnp.floor(xs)
        w = xs - x0  # [N, 3]
        corners = x0[:, None, :].astype(jnp.int32) + _CORNERS[None, :, :]  # [N,8,3]
        idx = _level_indices(corners, res, cfg.table_size)  # [N, 8]
        vals = table[lvl][idx.reshape(-1)].reshape(N, 8, cfg.n_features)
        # trilinear weights: product over dims of (1-w) or w per corner
        cw = jnp.where(_CORNERS[None, :, :] == 1, w[:, None, :], 1.0 - w[:, None, :])
        weights = jnp.prod(cw, axis=-1)  # [N, 8]
        feats.append(jnp.einsum("nc,ncf->nf", weights, vals))
    return jnp.concatenate(feats, axis=-1)


def _corner_indices_and_weights(x: jnp.ndarray, cfg: HashGridConfig):
    """Flat-table corner indices [L, 8, N] and trilerp weights [L, 8, N]
    for unit-cube positions x [N, 3] (shared by both production gather
    shapes). Differentiable w.r.t. x through the weights."""
    L, T = cfg.n_levels, cfg.table_size
    resolutions = cfg.resolutions  # [L] static numpy

    xt = x.T  # [3, N]
    res_f = jnp.asarray(resolutions, dtype=x.dtype)[:, None, None]  # [L,1,1]
    xs = xt[None, :, :] * res_f  # [L, 3, N]
    x0f = jnp.floor(xs)
    w = xs - x0f  # [L, 3, N] fractional
    x0 = x0f.astype(jnp.int32)

    # trilinear weights [L, 8, N]: per corner, prod over dims of w / (1-w)
    csel = jnp.asarray(_CORNERS.T[:, :, None], dtype=x.dtype)  # [3, 8, 1]
    cw = csel * w[:, :, None, :] + (1.0 - csel) * (1.0 - w[:, :, None, :])
    weights = cw[:, 0] * cw[:, 1] * cw[:, 2]  # [L, 8, N]

    # table indices [L, 8, N] (with per-level offset into the flat table);
    # dense levels use stride indexing, hashed levels the tcnn prime hash —
    # the split is static per level.
    off = _CORNERS.T  # [3, 8] int
    idx_rows = []
    for lvl in range(L):
        res = int(resolutions[lvl])
        cx = x0[lvl, 0][None, :] + jnp.asarray(off[0][:, None])  # [8, N]
        cy = x0[lvl, 1][None, :] + jnp.asarray(off[1][:, None])
        cz = x0[lvl, 2][None, :] + jnp.asarray(off[2][:, None])
        n_dense = (res + 1) ** 3
        if n_dense <= T:
            stride = np.int32(res + 1)
            idx = cx + cy * stride + cz * (stride * stride)
        else:
            h = cx.astype(jnp.uint32) * np.uint32(_PRIMES[0])
            h = h ^ (cy.astype(jnp.uint32) * np.uint32(_PRIMES[1]))
            h = h ^ (cz.astype(jnp.uint32) * np.uint32(_PRIMES[2]))
            idx = (h % np.uint32(T)).astype(jnp.int32)
        idx_rows.append(idx + np.int32(lvl) * np.int32(T))
    return jnp.stack(idx_rows), weights  # [L, 8, N] each


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _rowgather_interp(flat_rows, idx_all, weights, L, T, F):
    """Gather [M, F] feature ROWS in one pass and trilerp → [F, L, N].

    The asymmetric core of the r5 hash encode (scripts/
    profile_rowgather.py, v5e): ONE row gather of the [L*T, F] table is
    3.2x cheaper than F per-feature scalar gathers (412 vs 1338 ms at the
    production 33.5M rows) because XLA gather cost is per ROW, flat in
    row width — but the transposed rule does NOT hold for the backward
    (a row SCATTER is 7x slower than F per-feature scalar scatter-adds:
    2732 vs 369 ms), so this custom VJP pairs the row-gather forward
    with the per-feature scalar-scatter backward instead of letting
    autodiff transpose the gather.
    """
    out, _ = _rowgather_interp_fwd(flat_rows, idx_all, weights, L, T, F)
    return out


def _rowgather_vals(flat_rows, idx_all, L, F):
    N = idx_all.shape[-1]
    idx_b = jax.lax.optimization_barrier(idx_all.reshape(-1))  # [M]
    vals = jax.lax.optimization_barrier(flat_rows[idx_b])  # [M, F]
    return vals.T.reshape(F, L, 8, N)  # F-major, N minor


def _rowgather_interp_fwd(flat_rows, idx_all, weights, L, T, F):
    vals = _rowgather_vals(flat_rows, idx_all, L, F)
    out = jnp.sum(weights[None] * vals, axis=2)  # [F, L, N]
    return out, (flat_rows, idx_all, weights)


def _rowgather_interp_bwd(L, T, F, res, g):  # g: [F, L, N]
    flat_rows, idx_all, weights = res
    idx_b = jax.lax.optimization_barrier(idx_all.reshape(-1))  # [M]
    # d_table: per-feature scalar scatter-adds (the measured-fast shape),
    # each fenced so XLA cannot fuse the weight multiply into the scatter
    # (fusion scalarizes it — docs/PERFORMANCE.md).
    wg = weights[None] * g[:, :, None, :]  # [F, L, 8, N]
    dcols = []
    for f in range(F):
        cot = jax.lax.optimization_barrier(wg[f].reshape(-1))
        dcols.append(
            jnp.zeros((L * T,), flat_rows.dtype).at[idx_b].add(cot)
        )
    d_flat = jnp.stack(dcols).T.reshape(L * T, F)  # [L*T, F]
    # d_weights (→ dx): needs the gathered values again; recomputed here
    # and DCE'd by XLA whenever positions are non-differentiable upstream
    # (the training path: sampled positions carry no parameter gradient).
    vals = _rowgather_vals(flat_rows, idx_all, L, F)
    d_weights = jnp.sum(vals * g[:, :, None, :], axis=0)  # [L, 8, N]
    d_idx = np.zeros(idx_all.shape, dtype=jax.dtypes.float0)
    return d_flat, d_idx, d_weights


_rowgather_interp.defvjp(_rowgather_interp_fwd, _rowgather_interp_bwd)


def hash_encode(
    table: jnp.ndarray,  # [L, T, F]
    x: jnp.ndarray,  # [N, 3] in [0, 1]
    cfg: HashGridConfig,
) -> jnp.ndarray:
    """Encode unit-cube positions → [N, L*F] features (production path).

    Same math as :func:`hash_encode_ref`, restructured for the TPU memory
    system along three measured rules (scripts/profile_gather.py,
    scripts/profile_rowgather.py; v5e):

    1. **N-minor layouts.** Every large intermediate keeps the sample axis
       N as the minor (lane) dimension — [L, 8, N] indices/weights,
       F-major gathered values. Minor dims of 4 or 8 get padded to the
       128-lane tile (a measured 16-32x HBM blowup that OOMed the
       production step); minor-N arrays tile perfectly.
    2. **Fenced memory ops.** Gathers/scatters are isolated behind
       ``optimization_barrier`` so XLA cannot fuse index arithmetic or the
       trilerp multiply into them (fused gathers/scatters scalarize:
       13.8 ms vs 0.02 ms per level).
    3. **Asymmetric gather/scatter shapes** (r5): the forward gathers all
       F features of each corner as ONE [M, F] row gather (3.2x cheaper
       than F scalar gathers — gather cost is per row, flat in width);
       the backward scatters per-feature (a row scatter is 7x SLOWER than
       F scalar scatter-adds). ``_rowgather_interp``'s custom VJP encodes
       exactly that pairing. ``APNERF_HASH_ROWGATHER=0`` restores the
       symmetric per-feature path for A/B.
    """
    import os

    N = x.shape[0]
    L, T, F = cfg.n_levels, cfg.table_size, cfg.n_features
    idx_all, weights = _corner_indices_and_weights(x, cfg)

    if os.environ.get("APNERF_HASH_ROWGATHER", "1") != "0":
        flat_rows = table.reshape(L * T, F)  # layout-free view
        feats = _rowgather_interp(flat_rows, idx_all, weights, L, T, F)
        return feats.transpose(2, 1, 0).reshape(N, L * F)  # [N, L*F]

    # symmetric per-feature path (pre-r5 production; kept for A/B)
    idx_b = jax.lax.optimization_barrier(idx_all)
    flat = table.transpose(2, 0, 1).reshape(F, L * T)
    feats = []
    for f in range(F):
        vals_f = jax.lax.optimization_barrier(flat[f][idx_b])  # [L, 8, N]
        feats.append(jnp.sum(weights * vals_f, axis=1))  # [L, N]
    out = jnp.stack(feats, axis=1)  # [L, F, N]
    return out.transpose(2, 0, 1).reshape(N, L * F)
