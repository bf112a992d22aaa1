"""Predictive-information scoring of candidate trajectories.

Capability parity with ``ActiveNeRFMapper.probablistic_uncertainty``
(``scripts/pipeline.py:666-798``): ensemble-rendered candidate views are
scored by four information terms —

  * RGB / depth: Gaussian predictive information,
    H(ensemble mixture variance) - mean member H(per-member variance),
    with H = log(2 pi e sigma^2 + 1e-4)/2 and the mixture variance taken as
    sum of member variances / n (``pipeline.py:727-748``).
  * semantics: categorical entropy of the mean softmax minus mean member
    entropy (``pipeline.py:750-766``).
  * occupancy: Bernoulli entropy of accumulated opacity (``:768-773``).

PI = I_rgb + I_dep + 3*I_sem + 2*I_occ (``pipeline.py:776-781``).

The reference computes this in host numpy per trajectory; here it is jnp
over stacked [E, V, H, W, C] renders so the whole candidate batch stays on
device, and it vmaps over trajectories.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PredictiveInformation(NamedTuple):
    rgb: jnp.ndarray
    depth: jnp.ndarray
    sem: jnp.ndarray  # already x3 weighted, as stored by the reference
    occ: jnp.ndarray  # already x2 weighted

    @property
    def total(self) -> jnp.ndarray:
        return self.rgb + self.depth + self.sem + self.occ


def _gaussian_pi(member_var: jnp.ndarray) -> jnp.ndarray:
    """member_var: [E, ...] per-member predictive variance."""
    n = member_var.shape[0]
    cond_H = jnp.log(2 * jnp.pi * jnp.e * member_var + 1e-4) / 2
    mean_cond_H = jnp.mean(cond_H, axis=0)
    mix_var = jnp.sum(member_var, axis=0) / n
    H = jnp.log(2 * jnp.pi * jnp.e * mix_var + 1e-4) / 2
    return jnp.mean(H - mean_cond_H)


def _categorical_pi(logits: jnp.ndarray) -> jnp.ndarray:
    """logits: [E, ..., C] per-member semantic logits."""
    p = jax.nn.softmax(logits, axis=-1)
    cond_H = -jnp.sum((p + 1e-4) * jnp.log(p + 1e-4), axis=-1)
    mean_cond_H = jnp.mean(cond_H, axis=0)
    p_mix = jnp.mean(p, axis=0)
    H = -jnp.sum((p_mix + 1e-4) * jnp.log(p_mix + 1e-4), axis=-1)
    return jnp.mean(H - mean_cond_H)


def _bernoulli_pi(acc: jnp.ndarray) -> jnp.ndarray:
    """acc: [E, ...] accumulated opacities."""

    def H(p):
        return -(p + 1e-4) * jnp.log(p + 1e-4) - (1 - p + 1e-4) * jnp.log(
            1 - p + 1e-4
        )

    mean_cond_H = jnp.mean(H(acc), axis=0)
    H_mix = H(jnp.mean(acc, axis=0))
    return jnp.mean(H_mix - mean_cond_H)


def predictive_information(
    rgb_var: jnp.ndarray,  # [E, V, P, 3]
    depth_var: jnp.ndarray,  # [E, V, P]
    sem_logits: jnp.ndarray,  # [E, V, P, C]
    acc: jnp.ndarray,  # [E, V, P]
) -> PredictiveInformation:
    return PredictiveInformation(
        rgb=_gaussian_pi(rgb_var),
        depth=_gaussian_pi(depth_var),
        sem=_categorical_pi(sem_logits) * 3.0,
        occ=_bernoulli_pi(acc) * 2.0,
    )
