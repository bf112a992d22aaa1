"""apnerf_tpu — TPU-native active perception with neural radiance fields.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
grasp-lyrl/Active-Perception-using-Neural-Radiance-Fields (ACC 2024):
a quadrotor explores indoor scenes, incrementally trains an ensemble of
Instant-NGP-style semantic NeRFs on collected images, renders candidate
trajectories from the NeRFs, scores them by predictive information, and
flies the most informative one.

Design notes (TPU-first, not a port):
  * All hot compute is dense ``[n_rays, n_samples]`` static-shape math so
    XLA can tile it onto the MXU; the reference's variable-length packed
    CUDA buffers (nerfacc ``grid.cu``/``scan.cu``) become occupancy-mask
    compaction + per-row cumulative scans.
  * The 2-member NeRF ensemble is a vmapped leading axis (the reference
    trains members sequentially in a Python loop).
  * Multi-chip scaling is ``jax.sharding.Mesh`` + ``shard_map`` over
    (ensemble, data) axes with psum gradient reductions over ICI.
"""

__version__ = "0.1.0"
