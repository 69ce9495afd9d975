"""A/B the head-packed flash-attention forward on chip (VERDICT r3 #3).

At D < 128 the QK^T/PV dots waste 1 - D/128 of the MXU lanes (D=40: 69%,
D=64: 50%) — the measured cause of SD self-attention at 19% of peak
(BENCH_NOTES "Round-3 flash-attention dot dtype"). The packed kernel
(_attn_kernel_packed) processes G = floor(128/D) heads per grid step.
This probe measures packed vs unpacked at the two worst measured shapes:

  sd_self   (12, 8, 4096, 4096, 40)  G=3 (one padded group), fwd
  adm_res32 (32, 6, 1024, 1024, 64)  G=2, fwd and fwd+bwd (the backward
                                     kernels stay unpacked; under grad the
                                     packed FORWARD still supplies out/lse)

Timing: two-point chained-fori_loop slope (cancels dispatch overhead),
same methodology as probe_flash_dtype.py. Adoption gate: the end-to-end
SD CFG step (bench_extras sd) must beat 112.4 ms / MFU 0.43.

Usage: python docs/probes/probe_pack_heads.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

N_LO, N_HI = 8, 24
PEAK = 197e12

SHAPES = {
    "sd_self": (12, 8, 4096, 4096, 40),
    "adm_res32": (32, 6, 1024, 1024, 64),
}


def time_compiled(compiled, args):
    def sync(out):
        arr = out[0] if isinstance(out, (tuple, list)) else out
        np.asarray(jax.device_get(arr.ravel()[0]))
    out = compiled(*args)
    sync(out)
    times = []
    for _ in range(3):
        t0 = time.time()
        outs = [compiled(*args) for _ in range(3)]
        for o in outs:
            sync(o)
        times.append((time.time() - t0) / 3)
    return float(np.median(times))


def chain_slope(body, x):
    t = {}
    for n in (N_LO, N_HI):
        fn = jax.jit(functools.partial(
            lambda n_, x_: jax.lax.fori_loop(0, n_, body, x_), n))
        t[n] = time_compiled(fn.lower(x).compile(), (x,))
    return max((t[N_HI] - t[N_LO]) / (N_HI - N_LO), 1e-9)


def bench(shape, pack, backward):
    from autodiffusion_tpu.ops.flash_attention import _flash

    b, h, t, s, dh = shape
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, t, dh), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, dh), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, dh), jnp.bfloat16)

    flops = 4.0 * b * h * t * s * dh
    if backward:
        flops *= 3.5

        def loss(q_, k_, v_):
            return _flash(q_, k_, v_, 1024, 2048, False, False, pack).astype(
                jnp.float32).sum()

        def body(i, y):
            g = jax.grad(loss, argnums=(0, 1, 2))(y, k, v)
            return (g[0] + g[1] + g[2]).astype(y.dtype)
    else:
        def body(i, y):
            return _flash(y, k, v, 1024, 2048, False, False, pack)

    net = chain_slope(body, q)
    return flops / net / PEAK, net


def main():
    print(f"backend: {jax.default_backend()}")
    for name, shape in SHAPES.items():
        for backward in ([False, True] if name == "adm_res32" else [False]):
            tag = "fwd+bwd" if backward else "fwd    "
            res = {}
            for pack in (False, True):
                try:
                    eff, net = bench(shape, pack, backward)
                    res[pack] = net
                    print(f"  {name:10s} {tag} pack={int(pack)}: "
                          f"{net*1e3:8.2f} ms/iter  {eff*100:5.1f}% peak",
                          flush=True)
                except Exception as exc:  # noqa: BLE001
                    print(f"  {name:10s} {tag} pack={int(pack)} FAILED: "
                          f"{type(exc).__name__}: {exc}", flush=True)
            if len(res) == 2:
                print(f"  {name:10s} {tag} packed speedup: "
                      f"{res[False] / res[True]:.2f}x", flush=True)


if __name__ == "__main__":
    main()
