"""Minimal functional MLP building blocks.

Plain pytree parameters (dicts of arrays) instead of a module framework:
the ensemble is a vmapped leading axis over these pytrees, and Pallas
kernels can consume the raw weight matrices directly.

Replaces the reference's tcnn ``FullyFusedMLP`` heads
(``perception/models/radiance_fields/ngp.py:123-169``). On TPU the fusion
job belongs to XLA: these are [N, in]×[in, h] matmuls that land on the MXU.

tcnn pads hidden widths to multiples of 16 and runs fp16; here widths are
chosen MXU-friendly and the compute dtype is a knob: the flagship spectral
field passes ``compute_dtype=bfloat16`` (bf16 MXU matmuls, f32 MXU
accumulation, f32 parameters/optimizer — see ``apply_mlp`` for why the
hidden layers keep bf16 *outputs*); callers that omit it run f32.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def init_mlp(
    key: jax.Array,
    sizes: Sequence[int],
    dtype=jnp.float32,
) -> dict:
    """He-uniform init, like tcnn's default for ReLU nets."""
    params = {}
    keys = jax.random.split(key, len(sizes) - 1)
    for i, (fan_in, fan_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        bound = jnp.sqrt(6.0 / fan_in)
        params[f"w{i}"] = jax.random.uniform(
            keys[i], (fan_in, fan_out), minval=-bound, maxval=bound, dtype=dtype
        )
        params[f"b{i}"] = jnp.zeros((fan_out,), dtype=dtype)
    return params


def apply_mlp(
    params: dict,
    x: jnp.ndarray,
    activation=jax.nn.relu,
    output_activation=None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Apply an MLP; hidden activations ReLU, linear output by default
    (tcnn ``output_activation: None``).

    With ``compute_dtype=bfloat16`` the hidden dots keep bf16 outputs
    (MXU accumulates f32 internally and rounds): this matters for the
    BACKWARD pass — a dot with ``preferred_element_type=f32`` produces f32
    cotangents, silently demoting every backward matmul (2/3 of training
    FLOPs) to the 4x-slower f32 MXU path. Only the final layer emits f32.
    The same mixed-precision contract as tcnn's fully-fused fp16 MLPs
    (``reference pipeline.py:181`` trains under GradScaler fp16)."""
    n_layers = len(params) // 2
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    for i in range(n_layers):
        w, b = params[f"w{i}"], params[f"b{i}"]
        last = i == n_layers - 1
        if compute_dtype is not None:
            w, b = w.astype(compute_dtype), b.astype(compute_dtype)
            out_dtype = jnp.float32 if last else compute_dtype
        else:
            out_dtype = jnp.float32
        x = jnp.dot(x, w, preferred_element_type=out_dtype) + b.astype(
            out_dtype
        )
        if not last:
            x = activation(x)
        elif output_activation is not None:
            x = output_activation(x)
    return x


def apply_mlp_hidden(
    params: dict,
    x: jnp.ndarray,
    activation=jax.nn.relu,
    compute_dtype=None,
) -> jnp.ndarray:
    """All layers EXCEPT the final linear one — returns the last hidden
    activation (in ``compute_dtype`` when given). Because the final layer
    is linear, it commutes with any weighted sum over samples:
    Σ_s w_s·(h_s·W + b) = (Σ_s w_s·h_s)·W + b·Σ_s w_s — the volume
    renderer exploits this to accumulate the narrow bf16 hidden instead
    of materializing per-sample logits (see volrend.render_outputs
    ``sem_final``)."""
    n_layers = len(params) // 2
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    for i in range(n_layers - 1):
        w, b = params[f"w{i}"], params[f"b{i}"]
        if compute_dtype is not None:
            w, b = w.astype(compute_dtype), b.astype(compute_dtype)
        x = activation(jnp.dot(x, w, preferred_element_type=x.dtype) + b)
    return x


def mlp_final_layer(params: dict):
    """(W, b) of the final linear layer (pair with ``apply_mlp_hidden``)."""
    i = len(params) // 2 - 1
    return params[f"w{i}"], params[f"b{i}"]
