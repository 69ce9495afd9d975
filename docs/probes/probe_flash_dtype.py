"""A/B the flash-attention MXU dot dtype on chip (input-dtype vs f32 dots).

The kernel originally upcast q/k/v (and the probability block) to f32
before every MXU dot. On TPU an f32xf32 matmul runs on the MXU's
multi-pass path at a fraction of the bf16 rate, so for bf16 inputs this
left most of the MXU idle — the SD 4096-token head-dim-40 self-attention
measured 19.8% of peak (probe_sd_roofline) against a ~31% lane-padding
ceiling (40/128). The kernel now does the dots on INPUT-dTYPE operands
with f32 accumulation — the einsum path's exact numerics contract
(models/attention.py) — and ADT_FLASH_F32_DOTS=1 restores the old
behavior for this A/B.

Each variant gets a fresh jax.jit object so the env flag is re-read at
trace time. Timing: two-point chained-fori_loop slope (see
probe_sd_roofline.py — cancels the ~30 ms tunnel dispatch overhead).

Shapes: the three flash sites that matter —
  sd_self   (12, 8, 4096, 4096, 40)  SD v1 512px self-attention, fwd
  adm_res32 (32, 6, 1024, 1024, 64)  ADM-64 guided sampling, fwd and
                                     fwd+bwd (classifier VJP path)
  vae_mid   (6, 1, 4096, 4096, 512)  VAE decoder mid-block, fwd

Usage: python docs/probes/probe_flash_dtype.py
"""
import functools
import os
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
    "vae_mid": (6, 1, 4096, 4096, 512),
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


def bench(shape, f32_dots, backward):
    # f32_dots is a static argument of _flash since the round-4 advisor
    # fix (it participates in the jit cache key); pass it through directly
    from autodiffusion_tpu.ops.flash_attention import _flash

    b, h, t, s, dh = shape
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, t, dh), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, dh), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, dh), jnp.bfloat16)

    flops = 4.0 * b * h * t * s * dh
    if backward:
        # bwd re-forms p and runs 5 more bq*bk-scale dots (dq: 3, dkv: 3,
        # minus the shared ones) — count fwd (2) + bwd (5) score-scale
        # dots at 2*b*h*t*s*dh each, plus the fwd AV; standard accounting
        # is 3.5x the fwd matmul flops
        flops *= 3.5

        def loss(q_, k_, v_):
            return _flash(q_, k_, v_, 1024, 2048, False, f32_dots).astype(
                jnp.float32).sum()

        def body(i, y):
            g = jax.grad(loss, argnums=(0, 1, 2))(y, k, v)
            return (g[0] + g[1] + g[2]).astype(y.dtype) if t == s \
                else g[0].astype(y.dtype)
    else:
        def body(i, y):
            return _flash(y, k, v, 1024, 2048, False, f32_dots)

    net = chain_slope(body, q)
    return flops / net / PEAK, net


def bench_einsum(shape, backward):
    """The models/attention.py einsum path at the same shape."""
    b, h, t, s, dh = shape
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, t, dh), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, dh), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, dh), jnp.bfloat16)
    scale = dh ** -0.5

    def attn(q_, k_, v_):
        logits = jnp.einsum("bhtd,bhsd->bhts", q_, k_,
                            preferred_element_type=jnp.float32) * scale
        w = jax.nn.softmax(logits, -1).astype(v_.dtype)
        return jnp.einsum("bhts,bhsd->bhtd", w, v_,
                          preferred_element_type=jnp.float32).astype(v_.dtype)

    flops = 4.0 * b * h * t * s * dh
    if backward:
        flops *= 3.5

        def body(i, y):
            g = jax.grad(lambda q_, k_, v_: attn(q_, k_, v_).astype(
                jnp.float32).sum(), argnums=(0, 1, 2))(y, k, v)
            return (g[0] + g[1] + g[2]).astype(y.dtype) if t == s \
                else g[0].astype(y.dtype)
    else:
        def body(i, y):
            return attn(y, k, v)

    net = chain_slope(body, q)
    return flops / net / PEAK, net


def crossover():
    """flash (input-dtype dots) vs einsum at sub-1024 token counts, to
    re-tune the ADT_FLASH_MIN_TOKENS auto gate (set with the f32-dot
    kernel; the crossover may have moved)."""
    os.environ["ADT_FLASH_F32_DOTS"] = "0"
    for t in (256, 512, 1024):
        shape = (32, 6, t, t, 64)        # ADM-64 attention ladder
        for backward in (False, True):
            tag = "fwd+bwd" if backward else "fwd    "
            _, net_f = bench(shape, False, backward)
            _, net_e = bench_einsum(shape, backward)
            win = "flash" if net_f < net_e else "einsum"
            print(f"  T={t:5d} {tag} flash {net_f*1e3:7.2f} ms  "
                  f"einsum {net_e*1e3:7.2f} ms  -> {win}")


def main():
    if "--crossover" in sys.argv:
        print(f"backend: {jax.default_backend()}")
        crossover()
        return
    print(f"backend: {jax.default_backend()}")
    for name, shape in SHAPES.items():
        for backward in ([False, True] if name == "adm_res32" else [False]):
            tag = "fwd+bwd" if backward else "fwd    "
            res = {}
            for f32_dots in (True, False):
                try:
                    eff, net = bench(shape, f32_dots, backward)
                    res[f32_dots] = (eff, net)
                    print(f"  {name:10s} {tag} f32_dots={int(f32_dots)}: "
                          f"{net*1e3:8.2f} ms/iter  {eff*100:5.1f}% peak")
                except Exception as exc:  # noqa: BLE001
                    print(f"  {name:10s} {tag} f32_dots={int(f32_dots)} "
                          f"FAILED: {type(exc).__name__}: {exc}")
            if len(res) == 2:
                speedup = res[True][1] / res[False][1]
                print(f"  {name:10s} {tag} input-dtype dots speedup: "
                      f"{speedup:.2f}x")


if __name__ == "__main__":
    main()
