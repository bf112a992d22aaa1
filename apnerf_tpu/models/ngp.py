"""Instant-NGP semantic radiance field — functional JAX.

Capability parity with ``NGPRadianceField`` / ``NGPDensityField``
(``perception/models/radiance_fields/ngp.py:69-320``), re-designed around
jnp + the hash-grid op instead of tiny-cuda-nn modules:

  * hash encoding: 16 levels × 4 features, 2^19 table, res 16→4096
    (``ngp.py:123-133``) → ``ops.hashgrid``.
  * base MLP: ReLU net, ``neurons`` wide × ``layers`` hidden, outputs
    1 + geo_feat_dim(15) (``ngp.py:134-141``).
  * density activation ``trunc_exp(x - 1)`` with the backward-clamped
    exponent (``ngp.py:23-39,79``) via a custom JVP.
  * rgb head: SH-degree-4(dir) ++ geo_feat → 3, neurons/2 wide × 2 hidden,
    sigmoid (``ngp.py:142-156, 202-213``).
  * semantic head: geo_feat → num_semantic_classes logits, neurons/2 × 2
    (``ngp.py:158-169, 215-220``).
  * aabb normalization + in-box selector zeroing density outside
    (``ngp.py:171-193``); optional unbounded contraction (``ngp.py:42-66``).

Parameters are a plain dict pytree → vmap over the ensemble axis replaces
the reference's sequential per-member loop (``scripts/pipeline.py:398-412``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import hashgrid
from ..ops.contraction import contract_to_unisphere
from ..ops.sh import sh_encode_deg4
from .nn import apply_mlp, init_mlp


@jax.custom_jvp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    """exp with gradient computed at x clamped to 15 (``ngp.py:23-39``)."""
    return jnp.exp(x)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    y = jnp.exp(x)
    return y, dx * jnp.exp(jnp.clip(x, max=15.0))


class NGPConfig(NamedTuple):
    aabb: Tuple[float, ...]  # (6,)
    neurons: int = 128
    layers: int = 2  # hidden layers of the base MLP (config main_layer)
    geo_feat_dim: int = 15
    n_levels: int = 16
    n_features: int = 4
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    max_resolution: int = 4096
    num_semantic_classes: int = 0
    use_viewdirs: bool = True
    unbounded: bool = False

    @property
    def grid(self) -> hashgrid.HashGridConfig:
        return hashgrid.HashGridConfig(
            n_levels=self.n_levels,
            n_features=self.n_features,
            log2_table_size=self.log2_hashmap_size,
            base_resolution=self.base_resolution,
            max_resolution=self.max_resolution,
        )


def init_ngp(key: jax.Array, cfg: NGPConfig) -> dict:
    k_table, k_base, k_head, k_sem = jax.random.split(key, 4)
    grid = cfg.grid
    params = {
        "table": hashgrid.init_hash_table(k_table, grid),
        "mlp_base": init_mlp(
            k_base,
            [grid.out_dim]
            + [cfg.neurons] * cfg.layers
            + [1 + cfg.geo_feat_dim],
        ),
        "mlp_head": init_mlp(
            k_head,
            [(16 if cfg.use_viewdirs else 0) + cfg.geo_feat_dim]
            + [cfg.neurons // 2] * 2
            + [3],
        ),
    }
    if cfg.num_semantic_classes > 0:
        params["mlp_sem"] = init_mlp(
            k_sem,
            [cfg.geo_feat_dim]
            + [cfg.neurons // 2] * 2
            + [cfg.num_semantic_classes],
        )
    return params


def _normalize_positions(cfg: NGPConfig, x: jnp.ndarray):
    aabb = jnp.asarray(cfg.aabb, dtype=jnp.float32)
    if cfg.unbounded:
        u = contract_to_unisphere(x, aabb)
        selector = jnp.ones(x.shape[:-1], dtype=bool)
    else:
        u = (x - aabb[:3]) / (aabb[3:] - aabb[:3])
        selector = jnp.all((u > 0.0) & (u < 1.0), axis=-1)
    return u, selector


def query_density(
    params: dict, cfg: NGPConfig, x: jnp.ndarray, return_feat: bool = False
):
    """Density (+ geo features) at world positions x [..., 3]
    (``ngp.py:171-200``)."""
    batch_shape = x.shape[:-1]
    u, selector = _normalize_positions(cfg, x)
    enc = hashgrid.hash_encode(params["table"], u.reshape(-1, 3), cfg.grid)
    h = apply_mlp(params["mlp_base"], enc)
    h = h.reshape(batch_shape + (1 + cfg.geo_feat_dim,))
    density_raw, geo_feat = h[..., :1], h[..., 1:]
    density = trunc_exp(density_raw - 1.0) * selector[..., None]
    if return_feat:
        return density, geo_feat
    return density


def query_rgb(
    params: dict, cfg: NGPConfig, direction: jnp.ndarray, geo_feat: jnp.ndarray
):
    """RGB from view direction + geo features (``ngp.py:202-213``)."""
    batch_shape = geo_feat.shape[:-1]
    if cfg.use_viewdirs:
        d = sh_encode_deg4(direction.reshape(-1, 3))
        h = jnp.concatenate([d, geo_feat.reshape(-1, cfg.geo_feat_dim)], axis=-1)
    else:
        h = geo_feat.reshape(-1, cfg.geo_feat_dim)
    rgb = apply_mlp(params["mlp_head"], h)
    return jax.nn.sigmoid(rgb).reshape(batch_shape + (3,))


def query_semantic(params: dict, cfg: NGPConfig, geo_feat: jnp.ndarray):
    """Semantic logits from geo features (``ngp.py:215-220``)."""
    batch_shape = geo_feat.shape[:-1]
    logits = apply_mlp(params["mlp_sem"], geo_feat.reshape(-1, cfg.geo_feat_dim))
    return logits.reshape(batch_shape + (cfg.num_semantic_classes,))


def forward(
    params: dict,
    cfg: NGPConfig,
    positions: jnp.ndarray,
    directions: Optional[jnp.ndarray] = None,
):
    """Full field query → (rgb, density[, sem_logits]) (``ngp.py:222-238``)."""
    density, geo_feat = query_density(params, cfg, positions, return_feat=True)
    rgb = query_rgb(params, cfg, directions, geo_feat)
    if cfg.num_semantic_classes > 0:
        sem = query_semantic(params, cfg, geo_feat)
        return rgb, density, sem
    return rgb, density


# ----------------------------------------------------------------------------
# Proposal/density-only field (``ngp.py:255-320``), used by the prop-net
# sampling path of the example trainers.
# ----------------------------------------------------------------------------


class NGPDensityConfig(NamedTuple):
    aabb: Tuple[float, ...]
    base_resolution: int = 16
    max_resolution: int = 128
    n_levels: int = 5
    log2_hashmap_size: int = 17
    unbounded: bool = False

    @property
    def grid(self) -> hashgrid.HashGridConfig:
        return hashgrid.HashGridConfig(
            n_levels=self.n_levels,
            n_features=2,
            log2_table_size=self.log2_hashmap_size,
            base_resolution=self.base_resolution,
            max_resolution=self.max_resolution,
        )


def init_ngp_density(key: jax.Array, cfg: NGPDensityConfig) -> dict:
    k_table, k_base = jax.random.split(key)
    grid = cfg.grid
    return {
        "table": hashgrid.init_hash_table(k_table, grid),
        "mlp_base": init_mlp(k_base, [grid.out_dim, 64, 1]),
    }


def query_density_field(params: dict, cfg: NGPDensityConfig, x: jnp.ndarray):
    batch_shape = x.shape[:-1]
    aabb = jnp.asarray(cfg.aabb, dtype=jnp.float32)
    if cfg.unbounded:
        u = contract_to_unisphere(x, aabb)
        selector = jnp.ones(batch_shape, dtype=bool)
    else:
        u = (x - aabb[:3]) / (aabb[3:] - aabb[:3])
        selector = jnp.all((u > 0.0) & (u < 1.0), axis=-1)
    enc = hashgrid.hash_encode(params["table"], u.reshape(-1, 3), cfg.grid)
    h = apply_mlp(params["mlp_base"], enc).reshape(batch_shape + (1,))
    return trunc_exp(h - 1.0) * selector[..., None]
