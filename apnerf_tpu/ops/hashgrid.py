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


def hash_encode(
    table: jnp.ndarray,  # [L, T, F]
    x: jnp.ndarray,  # [N, 3] in [0, 1]
    cfg: HashGridConfig,
) -> jnp.ndarray:
    """Encode unit-cube positions → [N, L*F] features (production path).

    Same math as :func:`hash_encode_ref`, restructured for the TPU memory
    system along two measured rules (scripts/profile_gather.py, v5e):

    1. **N-minor layouts.** Every large intermediate keeps the sample axis
       N as the minor (lane) dimension — [L, 8, N] indices/weights, [L, 8,
       N] gathered values. Minor dims of 4 or 8 get padded to the 128-lane
       tile (a measured 16-32x HBM blowup that OOMed the production step);
       minor-N arrays tile perfectly.
    2. **Fenced memory ops.** The per-feature scalar gathers are isolated
       behind ``optimization_barrier`` so XLA cannot fuse index arithmetic
       or the trilerp multiply into them (fused gathers/scatters scalarize:
       13.8 ms vs 0.02 ms per level). The barrier's transpose rule places
       the same fence before the backward scatter-add.
    """
    N = x.shape[0]
    L, T, F = cfg.n_levels, cfg.table_size, cfg.n_features
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
    idx_all = jnp.stack(idx_rows)  # [L, 8, N]
    idx_b = jax.lax.optimization_barrier(idx_all)

    # per-feature flat tables [F, L*T]; scalar gathers keep N minor
    flat = table.transpose(2, 0, 1).reshape(F, L * T)
    feats = []
    for f in range(F):
        vals_f = jax.lax.optimization_barrier(flat[f][idx_b])  # [L, 8, N]
        feats.append(jnp.sum(weights * vals_f, axis=1))  # [L, N]
    out = jnp.stack(feats, axis=1)  # [L, F, N]
    return out.transpose(2, 0, 1).reshape(N, L * F)
