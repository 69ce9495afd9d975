"""On-chip probe: implicit-im2col Pallas conv vs XLA conv at ADM shapes.

Methodology matches the round-3 conv roofline probes (BENCH_NOTES.md):
64 chained convs per program via fori_loop (scan-amortized; per-dispatch
tunnel overhead ~30 ms is subtracted via a trivial-add control), bf16,
median over queued calls, sync via small host readback.

Usage: python /tmp/probe_im2col.py [shape ...]
  shapes: res64 res32 res16 res8 (default: res64 res16)
"""
import functools
import os
import sys
import time

import jax

if os.environ.get("PROBE_CPU") == "1":  # smoke-test path (tunnel down)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from autodiffusion_tpu.ops.conv_im2col import conv3x3_im2col, _pick_tile_h

SHAPES = {
    "res64": (32, 64, 64, 192, 192),
    "res32": (32, 32, 32, 384, 384),
    "res16": (32, 16, 16, 576, 576),
    "res8": (32, 8, 8, 768, 768),
    # SD v1 latent levels at 512px, CFG batch 12
    "sd64": (12, 64, 64, 320, 320),
    "sd32": (12, 32, 32, 640, 640),
    "sd16": (12, 16, 16, 1280, 1280),   # co-split path
}
N_CHAIN = 64
PEAK = 197e12


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def chain(conv, x, w):
    def body(i, y):
        return conv(y, w)
    return jax.lax.fori_loop(0, N_CHAIN, body, x)


def time_compiled(compiled, args):
    def sync(out):
        np.asarray(jax.device_get(out[0, 0]) if out.ndim == 2
                   else jax.device_get(out[0, 0, 0, 0]))
    out = compiled(*args); sync(out)  # warmup
    times = []
    R = 3
    for rep in range(3):
        t0 = time.time()
        outs = [compiled(*args) for _ in range(R)]
        for o in outs:
            sync(o)
        times.append((time.time() - t0) / R)
    return float(np.median(times))


def run_shape(name):
    b, h, w_, cin, cout = SHAPES[name]
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w_, cin), jnp.bfloat16)
    wk = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                            jnp.float32) * 0.05).astype(jnp.bfloat16)
    flops = 2.0 * b * h * w_ * 9 * cin * cout * N_CHAIN

    # dispatch-bias control: chained trivial add on the same tensor size
    ctrl = jax.jit(lambda x_: jax.lax.fori_loop(
        0, N_CHAIN, lambda i, y: y + jnp.bfloat16(1.0), x_))
    t_ctrl = time_compiled(ctrl.lower(x).compile(), (x,))

    variants = {"xla_conv": lambda x_, w__: chain(xla_conv, x_, w__)}
    for th in sorted({_pick_tile_h(h, w_, cin), max(1, h // 8), h // 4 or 1}
                     - {None}):
        if (h % th == 0 and (th * w_) % 8 == 0
                and th * w_ * 9 * cin * 2 <= 3 * 1024 * 1024):
            variants[f"im2col_th{th}"] = (
                lambda x_, w__, th=th: chain(
                    functools.partial(conv3x3_im2col, tile_h=th), x_, w__))
            variants[f"im2col_th{th}_splitk"] = (
                lambda x_, w__, th=th: chain(
                    functools.partial(conv3x3_im2col, tile_h=th,
                                      split_k=True), x_, w__))

    print(f"== {name} B={b} {h}x{w_} {cin}->{cout}  "
          f"ctrl={t_ctrl*1e3/N_CHAIN:.3f} ms/iter")
    for vname, fn in variants.items():
        try:
            t0 = time.time()
            compiled = jax.jit(fn).lower(x, wk).compile()
            tc = time.time() - t0
            dt = time_compiled(compiled, (x, wk))
        except Exception as e:
            print(f"  {vname:14s} FAILED: {type(e).__name__}: {e}")
            continue
        per = dt * 1e3 / N_CHAIN
        net = max(per - t_ctrl * 1e3 / N_CHAIN, 1e-6)
        eff_raw = flops / dt / PEAK
        eff_net = (flops / N_CHAIN) / (net / 1e3) / PEAK
        print(f"  {vname:14s} {per:7.3f} ms/iter  net {net:6.3f}  "
              f"raw {eff_raw*100:5.1f}%  net {eff_net*100:5.1f}% peak  "
              f"(compile {tc:.0f}s)")


if __name__ == "__main__":
    names = sys.argv[1:] or ["res64", "res16"]
    print("backend:", jax.default_backend())
    for n in names:
        run_shape(n)
