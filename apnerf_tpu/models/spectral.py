"""Spectral semantic radiance field — the TPU-native flagship field.

Same capability as the NGP semantic field (``models/ngp.py`` ⇔ reference
``perception/models/radiance_fields/ngp.py:69-253``: density + RGB +
semantic heads, trunc_exp(x-1), SH-4 view encoding, aabb selector), with
the multiresolution hash table replaced by a **learned spectral encoding**:

    enc(x) = [cos(2π x·W + φ), sin(2π x·W + φ)]      W: [3, M] learnable

with per-level frequency bands laid out on the same geometric ladder as
the hash grid (base 16 → 4096 over n_levels). Why: honest measurement on
the v5e (scripts/profile_honest2.py) puts XLA random gathers/scatters at
~7-11 ns per ROW regardless of table size — the 16-level hash encode needs
~67M row accesses per production step (≈1.3 s fwd alone), while matmuls of
the same batch are ~free. A table-free encoding moves 100% of the field
onto the MXU/VPU; the hash path (``models/ngp.py``) remains available for
exact tcnn parity.

Compute dtype is bf16 with f32 accumulation by default (the knob the MLP
layer exposes), f32 parameters.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.contraction import contract_to_unisphere
from ..ops.sh import sh_encode_deg4
from .ngp import trunc_exp
from .nn import apply_mlp, init_mlp


class SpectralConfig(NamedTuple):
    aabb: Tuple[float, ...]  # (6,)
    neurons: int = 256  # trunk width
    layers: int = 3  # trunk hidden layers
    geo_feat_dim: int = 15
    n_levels: int = 16  # frequency bands (ladder matches the hash grid)
    freqs_per_level: int = 8  # random directions per band
    base_freq: float = 16.0
    max_freq: float = 4096.0
    num_semantic_classes: int = 0
    use_viewdirs: bool = True
    unbounded: bool = False
    compute_dtype: str = "bfloat16"  # matmul dtype; f32 accumulation
    # fully-fused Pallas field (encode+trunk in one kernel): "auto" = on
    # for the TPU backend, "on"/"off" force it. APNERF_FUSED_FIELD=0/1
    # env var overrides everything (bench ablations).
    fused: str = "auto"

    @property
    def n_freqs(self) -> int:
        return self.n_levels * self.freqs_per_level

    @property
    def enc_dim(self) -> int:
        return 2 * self.n_freqs

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


def init_spectral(key: jax.Array, cfg: SpectralConfig) -> dict:
    kw, kp, k_base, k_head, k_sem = jax.random.split(key, 5)
    # per-band isotropic random directions scaled to the band frequency,
    # geometric ladder base..max like HashGridConfig.per_level_scale
    scales = np.exp(
        np.linspace(
            np.log(cfg.base_freq), np.log(cfg.max_freq), cfg.n_levels
        )
    )  # [L]
    dirs = jax.random.normal(kw, (cfg.n_levels, cfg.freqs_per_level, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    W = (dirs * jnp.asarray(scales, jnp.float32)[:, None, None]).reshape(
        cfg.n_freqs, 3
    )
    phase = jax.random.uniform(
        kp, (cfg.n_freqs,), minval=0.0, maxval=2 * np.pi
    )
    params = {
        "W": W.T,  # [3, M] learnable spectrum
        "phase": phase,
        "mlp_base": init_mlp(
            k_base,
            [cfg.enc_dim]
            + [cfg.neurons] * cfg.layers
            + [1 + cfg.geo_feat_dim],
        ),
        "mlp_head": init_mlp(
            k_head,
            [(16 if cfg.use_viewdirs else 0) + cfg.geo_feat_dim]
            + [cfg.neurons // 4] * 2
            + [3],
        ),
    }
    if cfg.num_semantic_classes > 0:
        params["mlp_sem"] = init_mlp(
            k_sem,
            [cfg.geo_feat_dim]
            + [cfg.neurons // 4] * 2
            + [cfg.num_semantic_classes],
        )
    return params


def _normalize(cfg: SpectralConfig, x: jnp.ndarray):
    aabb = jnp.asarray(cfg.aabb, dtype=jnp.float32)
    if cfg.unbounded:
        u = contract_to_unisphere(x, aabb)
        selector = jnp.ones(x.shape[:-1], dtype=bool)
    else:
        u = (x - aabb[:3]) / (aabb[3:] - aabb[:3])
        selector = jnp.all((u > 0.0) & (u < 1.0), axis=-1)
    return u, selector


def _encode_math(W, phase, u, dt):
    """proj in f32 (bf16's 8 mantissa bits cannot represent x·f for f up
    to 4096 accurately enough for cos), features cast to the compute dtype
    AT the cos/sin so XLA fuses the convert into the elementwise op."""
    proj = (
        jnp.dot(u.astype(dt), W.astype(dt), preferred_element_type=jnp.float32)
        * (2 * np.pi)
        + phase
    )
    return jnp.concatenate(
        [jnp.cos(proj).astype(dt), jnp.sin(proj).astype(dt)], axis=-1
    ), proj


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _spectral_encode_core(W, phase, u, dt_name: str):
    dt = jnp.bfloat16 if dt_name == "bfloat16" else jnp.float32
    return _encode_math(W, phase, u, dt)[0]


def _enc_fwd(W, phase, u, dt_name):
    dt = jnp.bfloat16 if dt_name == "bfloat16" else jnp.float32
    return _encode_math(W, phase, u, dt)[0], (W, phase, u)


def _enc_bwd(dt_name, res, g):
    # Production-trace rationale (scripts/profile_trace.py, v5e): the
    # autodiff backward saved cos/sin in f32 (2x268 MB materialized +
    # standalone bf16 converts) and pushed f32 cotangents through the dW /
    # dphase reductions — ~5.5 ms/step, more than the trunk matmuls.
    # Here the backward RECOMPUTES proj (one cheap [N,3]x[3,M] dot), fuses
    # sin/cos into the single dproj elementwise pass, and emits dproj in
    # the compute dtype so every downstream reduction reads half the bytes.
    dt = jnp.bfloat16 if dt_name == "bfloat16" else jnp.float32
    W, phase, u = res
    M = W.shape[-1]
    proj = (
        jnp.dot(u.astype(dt), W.astype(dt), preferred_element_type=jnp.float32)
        * (2 * np.pi)
        + phase
    )
    # Fence the recomputed proj: without it XLA CSEs this subtree with the
    # forward's, and the shared f32 cos/sin pair materializes again (the
    # exact 2x268 MB + converts this VJP exists to remove — seen in the
    # first r3 trace). Behind the barrier, the forward's cos/sin fuse into
    # its bf16 outputs and the backward's fuse into the dproj pass.
    proj = jax.lax.optimization_barrier(proj)
    gc = g[..., :M].astype(jnp.float32)
    gs = g[..., M:].astype(jnp.float32)
    dproj = (jnp.cos(proj) * gs - jnp.sin(proj) * gc).astype(dt)
    dphase = jnp.sum(
        dproj, axis=tuple(range(dproj.ndim - 1)), dtype=jnp.float32
    )
    two_pi = jnp.float32(2 * np.pi)
    dW = (
        jax.lax.dot_general(
            u.astype(dt), dproj, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * two_pi
    ).astype(W.dtype)
    du = (
        jax.lax.dot_general(
            dproj, W.astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * two_pi
    ).astype(u.dtype)
    return dW, dphase.astype(phase.dtype), du


_spectral_encode_core.defvjp(_enc_fwd, _enc_bwd)


def spectral_encode(params: dict, cfg: SpectralConfig, u: jnp.ndarray):
    """[..., 3] unit-cube coords → [..., 2M] spectral features (one
    matmul + sin/cos on the VPU), with a bandwidth-lean custom VJP
    (see ``_enc_bwd``)."""
    return _spectral_encode_core(
        params["W"], params["phase"], u, cfg.compute_dtype
    )


def _trunk_apply(params_mlp: dict, enc: jnp.ndarray, cfg: SpectralConfig):
    """Trunk MLP: the plain XLA chain, or the fully-fused Pallas kernel
    (``ops/pallas/fused_mlp.py``) behind ``APNERF_FUSED_MLP=1`` when the
    topology matches its fixed 3-hidden-layer shape — the tcnn
    FullyFusedMLP equivalent, activations never round-trip through HBM."""
    if (
        os.environ.get("APNERF_FUSED_MLP", "0") == "1"
        and len(params_mlp) in (6, 8)
        and cfg.compute_dtype == "bfloat16"
    ):
        from ..ops.pallas.fused_mlp import fused_mlp_apply

        return fused_mlp_apply(params_mlp, enc)
    return apply_mlp(params_mlp, enc, compute_dtype=cfg.dtype)


def _use_fused_field(cfg: SpectralConfig, params_mlp: dict) -> bool:
    """Route encode+trunk through the single Pallas kernel
    (``ops/pallas/fused_mlp.fused_spectral_field``)? Requires the bf16
    compute dtype and a 2- or 3-hidden-layer trunk (the kernel factory is
    depth-generic, ``_make_enc_fwd_kernel``). Default ("auto"): on for
    the TPU backend (measured 1.536x vs 1.285x for the XLA chain,
    docs/PERFORMANCE.md), off elsewhere (the interpret-mode kernel would
    crawl on CPU). GSPMD-sharded programs pass ``fused="off"`` (no
    pallas_call partitioning rule); the shard_map train phase keeps it
    on (parallel/sharding.py)."""
    env = os.environ.get("APNERF_FUSED_FIELD")
    if env == "0" or cfg.fused == "off":
        enabled = False
    elif env == "1" or cfg.fused == "on":
        enabled = True
    else:
        enabled = jax.default_backend() == "tpu"
    return (
        enabled
        and cfg.compute_dtype == "bfloat16"
        and len(params_mlp) in (6, 8)
    )


def query_density(
    params: dict, cfg: SpectralConfig, x: jnp.ndarray, return_feat: bool = False
):
    """Same contract as ``ngp.query_density`` (``ngp.py:171-200``)."""
    batch_shape = x.shape[:-1]
    u, selector = _normalize(cfg, x)
    n_rows = int(np.prod(batch_shape)) if batch_shape else 1
    # odd row counts would degrade the kernel's grid to tiny tiles —
    # fall back to the XLA chain (renderers at arbitrary resolutions)
    if _use_fused_field(cfg, params["mlp_base"]) and n_rows % 256 == 0:
        from ..ops.pallas.fused_mlp import fused_spectral_field

        h = fused_spectral_field(
            params["W"], params["phase"], params["mlp_base"],
            u.reshape(-1, 3),
        )
    else:
        enc = spectral_encode(params, cfg, u.reshape(-1, 3))
        h = _trunk_apply(params["mlp_base"], enc, cfg)
    h = h.reshape(batch_shape + (1 + cfg.geo_feat_dim,))
    density_raw, geo_feat = h[..., :1], h[..., 1:]
    density = trunc_exp(density_raw - 1.0) * selector[..., None]
    if return_feat:
        return density, geo_feat
    return density


def query_rgb(
    params: dict, cfg: SpectralConfig, direction: jnp.ndarray,
    geo_feat: jnp.ndarray,
):
    batch_shape = geo_feat.shape[:-1]
    if cfg.use_viewdirs:
        d = sh_encode_deg4(direction.reshape(-1, 3))
        h = jnp.concatenate(
            [d, geo_feat.reshape(-1, cfg.geo_feat_dim)], axis=-1
        )
    else:
        h = geo_feat.reshape(-1, cfg.geo_feat_dim)
    rgb = apply_mlp(params["mlp_head"], h, compute_dtype=cfg.dtype)
    return jax.nn.sigmoid(rgb).reshape(batch_shape + (3,))


def query_semantic(params: dict, cfg: SpectralConfig, geo_feat: jnp.ndarray):
    batch_shape = geo_feat.shape[:-1]
    logits = apply_mlp(
        params["mlp_sem"], geo_feat.reshape(-1, cfg.geo_feat_dim),
        compute_dtype=cfg.dtype,
    )
    return logits.reshape(batch_shape + (cfg.num_semantic_classes,))


def query_semantic_hidden(
    params: dict, cfg: SpectralConfig, geo_feat: jnp.ndarray
):
    """Semantic head WITHOUT its final linear layer → last hidden [.., H]
    in the compute dtype. The renderer accumulates this narrow bf16
    tensor over samples and applies ``semantic_final`` afterwards —
    mathematically identical (the final layer is linear) and the [N, C]
    f32 per-sample logits never materialize (their relayout copies cost
    ~2 ms/step in the r4 production trace, scripts/profile_trace.py)."""
    from .nn import apply_mlp_hidden

    batch_shape = geo_feat.shape[:-1]
    h = apply_mlp_hidden(
        params["mlp_sem"], geo_feat.reshape(-1, cfg.geo_feat_dim),
        compute_dtype=cfg.dtype,
    )
    return h.reshape(batch_shape + (h.shape[-1],))


def semantic_final(params: dict):
    """(W, b) closing the ``query_semantic_hidden`` head."""
    from .nn import mlp_final_layer

    return mlp_final_layer(params["mlp_sem"])


def use_packed_field(cfg: SpectralConfig, params: dict, n_rows: int) -> bool:
    """Route the train hot path through the whole-field Pallas kernel
    (``ops/pallas/fused_field_heads``: encode + trunk + density/rgb/sem
    heads in ONE kernel, packed transposed [4+C, N] output)? Follows the
    ``_use_fused_field`` gate plus: viewdirs + semantic classes present,
    both heads the standard 2-hidden topology, and a tile-friendly row
    count. ``APNERF_FUSED_HEADS=0/1`` forces it off/on (bench ablations).
    """
    env = os.environ.get("APNERF_FUSED_HEADS")
    if env == "0":
        return False
    base = _use_fused_field(cfg, params["mlp_base"]) or env == "1"
    return (
        base
        and cfg.use_viewdirs
        and cfg.num_semantic_classes > 0
        and not cfg.unbounded  # kernel hard-codes the in-cube selector
        and cfg.compute_dtype == "bfloat16"
        and len(params["mlp_base"]) in (6, 8)
        and len(params["mlp_head"]) == 6
        and len(params.get("mlp_sem", ())) == 6
        and n_rows % 256 == 0
    )


def use_packed_volrend(
    cfg: SpectralConfig, params: dict, R: int, S: int
) -> bool:
    """Route the train render through the fused field+volrend kernel
    (``ops/pallas/fused_field_volrend``: the whole-field kernel extended
    THROUGH the per-ray weight/accumulate math — per-sample field values
    never leave VMEM)? Requires the ``use_packed_field`` gate plus
    lane-aligned ray segments (S divides the column tile; 128-ray acc
    blocks). ``APNERF_FUSED_VR=0/1`` forces it off/on (bench ablations).
    """
    env = os.environ.get("APNERF_FUSED_VR")
    if env == "0":
        return False
    if not (use_packed_field(cfg, params, R * S) or env == "1"):
        return False
    from ..ops.pallas.fused_field_volrend import supports_fused_volrend

    return supports_fused_volrend(R * S, S)


def use_packed_lossgrad(
    cfg: SpectralConfig, params: dict, R: int, S: int
) -> bool:
    """Route the whole train step (render AND loss AND backward) through
    the combined loss+grad kernel (``ops/pallas/fused_field_volrend.
    fused_field_volrend_lossgrad``)? Follows the ``use_packed_volrend``
    gate — the kernel shares its layout plan — and additionally requires
    semantic classes (the in-kernel CE assumes them).
    ``APNERF_FUSED_LOSSGRAD=0/1`` forces it off/on (bench ablations)."""
    if os.environ.get("APNERF_FUSED_LOSSGRAD") == "0":
        return False
    return cfg.num_semantic_classes > 0 and use_packed_volrend(
        cfg, params, R, S
    )


def forward_packed_lossgrad(
    params: dict,
    cfg: SpectralConfig,
    positions: jnp.ndarray,  # [R, S, 3]
    rays_d: jnp.ndarray,  # [R, 3]
    t0: jnp.ndarray,  # [R, S]
    t1: jnp.ndarray,  # [R, S]
    miss: jnp.ndarray,  # [R] bool
    pixels: jnp.ndarray,  # [R, 3] rgb targets in [0, 1]
    depth_gt: jnp.ndarray,  # [R]
    sem_labels: jnp.ndarray,  # [R] int
    bkgd,  # [3] background color or None
    loss_weights=(10.0, 1.0 / 5.0, 1.0 / 2.0),
):
    """The ENTIRE train render + loss + backward in ONE kernel pass →
    (lossrows [3, R] raw per-ray sums, weights [R, S] (detached prop-loss
    input), grads dict matching ``params``). The fwd kernel disappears
    from the train step: the backward recomputes every forward value
    anyway, and because tiles hold whole rays the per-ray loss cotangents
    (huber rgb/depth, softmax CE — train/flagship.py loss_fn) are
    computable in-kernel. NOT differentiable — consume the returned
    grads directly (see make_flagship_member_core)."""
    from ..ops.pallas.fused_field_volrend import fused_field_volrend_lossgrad

    R, S = positions.shape[0], positions.shape[1]
    u, _ = _normalize(cfg, positions)
    ut = u.reshape(-1, 3).T  # [3, N]
    sht = sh_encode_deg4(rays_d).T  # [16, R]
    dt = ((t1 - t0) * (~miss)[:, None]).reshape(1, -1)
    tm = (0.5 * (t0 + t1)).reshape(1, -1)
    pix = pixels.T.astype(jnp.float32)  # [3, R]
    dgt = depth_gt.reshape(1, -1).astype(jnp.float32)
    lab = sem_labels.reshape(1, -1).astype(jnp.float32)
    bk = (
        jnp.zeros((3, 1), jnp.float32)
        if bkgd is None
        else jnp.asarray(bkgd, jnp.float32).reshape(3, 1)
    )
    lossrows, w, (dW, dphase, dbase, dhead, dsem) = (
        fused_field_volrend_lossgrad(
            params["W"], params["phase"], params["mlp_base"],
            params["mlp_head"], params["mlp_sem"], ut, sht,
            dt.astype(jnp.float32), tm.astype(jnp.float32),
            pix, dgt, lab, bk, S, loss_weights,
        )
    )
    grads = {
        "W": dW, "phase": dphase, "mlp_base": dbase,
        "mlp_head": dhead, "mlp_sem": dsem,
    }
    return lossrows, w.reshape(R, S), grads


def forward_packed_volrend(
    params: dict,
    cfg: SpectralConfig,
    positions: jnp.ndarray,  # [R, S, 3]
    rays_d: jnp.ndarray,  # [R, 3]
    t0: jnp.ndarray,  # [R, S]
    t1: jnp.ndarray,  # [R, S]
    miss: jnp.ndarray,  # [R] bool, ray missed the aabb
):
    """Whole field + volume rendering in one kernel → (acc [5+C, R] f32,
    weights [R, S] f32). acc rows: 0:3 Σw·rgb, 3 Σw (opacity), 4 Σw·t_mid
    (depth numerator), 5: Σw·sem. Ray misses fold into dt (α=0 ⇒ w=0),
    exactly the unfused ``sigmas * ~miss`` masking. Same math as the
    packed path + ``render_weight_from_density`` + the accumulation
    einsum (oracle-tested in tests/test_pallas_fused_volrend.py)."""
    from ..ops.pallas.fused_field_volrend import fused_field_volrend

    R, S = positions.shape[0], positions.shape[1]
    u, _ = _normalize(cfg, positions)
    ut = u.reshape(-1, 3).T  # [3, N]
    sht = sh_encode_deg4(rays_d).T  # [16, R]; fans out over lanes
    # in-kernel via the ray-indicator matmul (no [16, N] broadcast)
    dt = ((t1 - t0) * (~miss)[:, None]).reshape(1, -1)
    tm = (0.5 * (t0 + t1)).reshape(1, -1)
    acc, w = fused_field_volrend(
        params["W"], params["phase"], params["mlp_base"],
        params["mlp_head"], params["mlp_sem"], ut, sht,
        dt.astype(jnp.float32), tm.astype(jnp.float32), S,
    )
    return acc, w.reshape(R, S)


def forward_packed(
    params: dict,
    cfg: SpectralConfig,
    positions: jnp.ndarray,  # [R, S, 3]
    rays_d: jnp.ndarray,  # [R, 3] per-RAY directions (broadcast over S)
) -> jnp.ndarray:
    """Whole field in one kernel → packed [4+C, R, S] f32: rows 0:3 rgb
    (sigmoid), row 3 density (trunc_exp(x-1) × in-aabb selector), rows 4:
    semantic logits. Same math as ``forward`` (oracle-tested); the
    transposed channel-major layout keeps every downstream channel
    extract a contiguous row slice (see the kernel module docstring).
    SH dir features are computed per ray and broadcast — the per-sample
    [N, 16] SH tensor never materializes untransposed."""
    from ..ops.pallas.fused_field_heads import fused_field_heads

    R, S = positions.shape[0], positions.shape[1]
    u, _ = _normalize(cfg, positions)
    ut = u.reshape(-1, 3).T  # [3, N]
    sh = sh_encode_deg4(rays_d)  # [R, 16]
    sht = jnp.broadcast_to(
        sh.T[:, :, None], (16, R, S)
    ).reshape(16, R * S)
    y = fused_field_heads(
        params["W"], params["phase"], params["mlp_base"],
        params["mlp_head"], params["mlp_sem"], ut, sht,
    )
    return y.reshape(y.shape[0], R, S)


def forward(
    params: dict,
    cfg: SpectralConfig,
    positions: jnp.ndarray,
    directions: Optional[jnp.ndarray] = None,
    sem_hidden: bool = False,
):
    """→ (rgb, density[, sem_logits]); drop-in for ``ngp.forward``.

    ``sem_hidden=True``: the third output is the semantic head's last
    HIDDEN activation instead of logits — pair with the renderer's
    ``sem_final=semantic_final(params)`` (exact reassociation, see
    ``query_semantic_hidden``). Measured on the v5e (r4 bench A/B): the
    reassociation LOSES ~3.6% end-to-end (1.492x vs 1.548x), so it ships
    default-OFF (APNERF_SEM_REASSOC=1 opts in).

    Deliberately keeps the [R, S, .] batch shape through the heads: a
    flatten-first rewrite of this function measured 0.81x vs 1.55x —
    XLA's layout assignment around the fused kernel is dramatically
    better with the nested shapes (r4 bench A/B)."""
    density, geo_feat = query_density(params, cfg, positions, return_feat=True)
    rgb = query_rgb(params, cfg, directions, geo_feat)
    if cfg.num_semantic_classes > 0:
        if sem_hidden:
            sem = query_semantic_hidden(params, cfg, geo_feat)
        else:
            sem = query_semantic(params, cfg, geo_feat)
        return rgb, density, sem
    return rgb, density


# -- small proposal (density-only) spectral field ---------------------------


class SpectralDensityConfig(NamedTuple):
    aabb: Tuple[float, ...]
    neurons: int = 64
    layers: int = 2
    n_levels: int = 8
    freqs_per_level: int = 4
    base_freq: float = 4.0
    max_freq: float = 256.0
    unbounded: bool = False
    compute_dtype: str = "bfloat16"
    # fused Pallas field routing, same semantics as SpectralConfig.fused:
    # "auto" = on for the TPU backend, "on"/"off" force. GSPMD-sharded
    # programs must pass "off" (pallas_call has no partitioning rule).
    fused: str = "auto"

    @property
    def n_freqs(self) -> int:
        return self.n_levels * self.freqs_per_level

    @property
    def enc_dim(self) -> int:
        return 2 * self.n_freqs

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


def init_spectral_density(key: jax.Array, cfg: SpectralDensityConfig) -> dict:
    kw, kp, k_base = jax.random.split(key, 3)
    scales = np.exp(
        np.linspace(np.log(cfg.base_freq), np.log(cfg.max_freq), cfg.n_levels)
    )
    dirs = jax.random.normal(kw, (cfg.n_levels, cfg.freqs_per_level, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    W = (dirs * jnp.asarray(scales, jnp.float32)[:, None, None]).reshape(
        cfg.n_freqs, 3
    )
    return {
        "W": W.T,
        "phase": jax.random.uniform(
            kp, (cfg.n_freqs,), minval=0.0, maxval=2 * np.pi
        ),
        "mlp_base": init_mlp(
            k_base, [cfg.enc_dim] + [cfg.neurons] * cfg.layers + [1]
        ),
    }


def query_density_field(
    params: dict, cfg: SpectralDensityConfig, x: jnp.ndarray
):
    batch_shape = x.shape[:-1]
    aabb = jnp.asarray(cfg.aabb, dtype=jnp.float32)
    if cfg.unbounded:
        u = contract_to_unisphere(x, aabb)
        selector = jnp.ones(batch_shape, dtype=bool)
    else:
        u = (x - aabb[:3]) / (aabb[3:] - aabb[:3])
        selector = jnp.all((u > 0.0) & (u < 1.0), axis=-1)
    dt = cfg.dtype
    n_rows = int(np.prod(batch_shape)) if batch_shape else 1
    # the proposal field CAN route through the fused Pallas kernel like
    # query_density (same encode+trunk shape family) — but measured on the
    # v5e it is an ablation knob, not the default: APNERF_FUSED_PROP=1
    # opts in (small 64-wide trunks lose to XLA's fusion at this size).
    # cfg.fused="off" (GSPMD programs) still forces the XLA chain.
    env = os.environ.get("APNERF_FUSED_PROP", "0")
    if env == "0" or cfg.fused == "off":
        enabled = False
    elif env == "1" or cfg.fused == "on":
        enabled = True
    else:
        enabled = jax.default_backend() == "tpu"
    if (
        enabled
        and cfg.compute_dtype == "bfloat16"
        and len(params["mlp_base"]) in (6, 8)
        and n_rows % 256 == 0
    ):
        from ..ops.pallas.fused_mlp import fused_spectral_field

        h = fused_spectral_field(
            params["W"], params["phase"], params["mlp_base"],
            u.reshape(-1, 3),
        )
    else:
        proj = (
            jnp.dot(
                u.reshape(-1, 3).astype(dt), params["W"].astype(dt),
                preferred_element_type=jnp.float32,
            )
            * (2 * np.pi)
            + params["phase"]
        )
        enc = jnp.concatenate([jnp.cos(proj), jnp.sin(proj)], axis=-1)
        h = apply_mlp(params["mlp_base"], enc, compute_dtype=dt)
    h = h.reshape(batch_shape + (1,))
    return trunc_exp(h - 1.0) * selector[..., None]
