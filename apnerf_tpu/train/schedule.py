"""Learning-rate schedules matching the reference's torch schedulers.

* ``cyclic_lr`` ⇔ ``torch.optim.lr_scheduler.CyclicLR(base_lr=1e-4,
  max_lr=1e-3, step_size_up=training_steps/4, mode="exp_range",
  gamma=1.0)`` (``scripts/pipeline.py:173-198``). With gamma == 1.0,
  exp_range degenerates to the triangular waveform.
* ``multistep_lr`` ⇔ ``MultiStepLR(milestones=[0.3*steps, 0.8*steps],
  gamma=0.1)`` used for the final refit (``pipeline.py:359-369``).
"""

from __future__ import annotations

import jax.numpy as jnp


def cyclic_lr(base_lr: float, max_lr: float, step_size_up: int,
              gamma: float = 1.0):
    """``gamma`` < 1 decays the triangular peak per CYCLE (CyclicLR's
    exp_range decays per step; per-cycle keeps the waveform shape while
    shrinking late-training high-LR excursions — the PSNR-vs-budget
    probe knob, scripts/psnr_probe.py)."""

    def schedule(count):
        count = jnp.asarray(count, dtype=jnp.float32)
        cycle = jnp.floor(1.0 + count / (2.0 * step_size_up))
        x = jnp.abs(count / step_size_up - 2.0 * cycle + 1.0)
        amp = (max_lr - base_lr) * jnp.power(gamma, cycle - 1.0)
        return base_lr + amp * jnp.maximum(0.0, 1.0 - x)

    return schedule


def multistep_lr(init_lr: float, milestones, gamma: float = 0.1):
    milestones = jnp.asarray(milestones, dtype=jnp.float32)

    def schedule(count):
        count = jnp.asarray(count, dtype=jnp.float32)
        n_passed = jnp.sum(count >= milestones)
        return init_lr * gamma**n_passed

    return schedule
