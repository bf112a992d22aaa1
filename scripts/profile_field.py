"""Honest scanned microbench of the spectral field fwd+bwd at production
size — where do the ~19 ms go?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from apnerf_tpu.models import spectral
from apnerf_tpu.models.nn import apply_mlp, init_mlp

REPS = 10
N = 262144


def bench(make_scan, args, label, n=2):
    fn = jax.jit(make_scan)
    v = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        v = float(fn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:54s} {dt*1e3:9.1f} ms/call ~{(dt-0.03)/REPS*1e3:8.2f} ms/iter",
          flush=True)


def scan_over(body):
    def run(*args):
        def step(c, _):
            return body(c, *args), None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
        return c
    return run


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = spectral.SpectralConfig(
        aabb=(-19.1, -0.2, -19.1, 0.5, 3.2, 0.5), neurons=256, layers=3,
        num_semantic_classes=29,
    )
    E = 2
    params = jax.vmap(
        lambda k: spectral.init_spectral(k, cfg)
    )(jax.random.split(jax.random.PRNGKey(0), E))
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (E, N, 3), minval=-5.0, maxval=0.0
    )
    d = jax.random.normal(jax.random.PRNGKey(2), (E, N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    # 1. full field fwd (vmapped E=2)
    def fwd(c, params, x, d):
        def one(p, x, d):
            rgb, sig, sem = spectral.forward(p, cfg, x * (1 - 1e-9 * c), d)
            return rgb.sum() + sig.sum() + sem.sum()
        return 1e-6 * jax.vmap(one)(params, x, d).sum()

    bench(scan_over(fwd), (params, x, d), "field fwd (E=2)")

    # 2. full field fwd+bwd
    def fwdbwd(c, params, x, d):
        def loss(params):
            def one(p, x, d):
                rgb, sig, sem = spectral.forward(p, cfg, x * (1 - 1e-9 * c), d)
                return rgb.sum() + sig.sum() + sem.sum()
            return jax.vmap(one)(params, x, d).sum()
        g = jax.grad(loss)(params)
        return 1e-6 * g["main"]["mlp_base"]["w0"][0, 0, 0] if False else (
            1e-6 * g["mlp_base"]["w0"][0, 0, 0]
        )

    bench(scan_over(fwdbwd), (params, x, d), "field fwd+bwd (E=2)")

    # 3. trunk MLP alone fwd+bwd, bf16, vmapped
    mlp = jax.vmap(
        lambda k: init_mlp(k, [256, 256, 256, 256, 16])
    )(jax.random.split(jax.random.PRNGKey(3), E))
    enc = jax.random.normal(jax.random.PRNGKey(4), (E, N, 256))

    def trunk(c, mlp, enc):
        def loss(mlp):
            return jax.vmap(
                lambda p, e: apply_mlp(
                    p, e * (1 + 1e-9 * c), compute_dtype=jnp.bfloat16
                ).sum()
            )(mlp, enc).sum()
        return 1e-6 * jax.grad(loss)(mlp)["w0"][0, 0, 0]

    bench(scan_over(trunk), (mlp, enc), "trunk MLP fwd+bwd bf16 (E=2)")

    # 4. trunk fwd only
    def trunk_fwd(c, mlp, enc):
        return 1e-6 * jax.vmap(
            lambda p, e: apply_mlp(
                p, e * (1 + 1e-9 * c), compute_dtype=jnp.bfloat16
            ).sum()
        )(mlp, enc).sum()

    bench(scan_over(trunk_fwd), (mlp, enc), "trunk MLP fwd bf16 (E=2)")

    # 5. encode alone fwd+bwd
    def encode(c, params, x):
        def loss(params):
            def one(p, x):
                u = (x * (1 - 1e-9 * c) + 19.1) / 19.6
                return spectral.spectral_encode(p, cfg, u).sum()
            return jax.vmap(one)(params, x).sum()
        return 1e-6 * jax.grad(loss)(params)["W"][0, 0, 0]

    bench(scan_over(encode), (params, x), "spectral encode fwd+bwd (E=2)")

    # 6. heads alone fwd+bwd (rgb + sem)
    geo = jax.random.normal(jax.random.PRNGKey(5), (E, N, 15))

    def heads(c, params, geo, d):
        def loss(params):
            def one(p, g, d):
                rgb = spectral.query_rgb(p, cfg, d, g * (1 + 1e-9 * c))
                sem = spectral.query_semantic(p, cfg, g)
                return rgb.sum() + sem.sum()
            return jax.vmap(one)(params, geo, d).sum()
        return 1e-6 * jax.grad(loss)(params)["mlp_head"]["w0"][0, 0, 0]

    bench(scan_over(heads), (params, geo, d), "rgb+sem heads fwd+bwd (E=2)")


if __name__ == "__main__":
    main()
