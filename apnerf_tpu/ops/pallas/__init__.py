"""Pallas TPU kernels for the hot volume-rendering ops."""

from .volrend_pallas import fused_render_weights  # noqa: F401
