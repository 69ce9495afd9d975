"""A/B the epilogue-ingesting fused conv on chip (VERDICT r3 #2).

Both sides run the FULL ResBlock-style chain — GroupNorm stats + normalize
+ SiLU + 3x3 conv + residual add — so the comparison includes exactly the
fusion behavior that killed the bare im2col kernel (BENCH_NOTES "Round-3
follow-up": XLA fuses the elementwise ops into its conv; nothing fuses
into a custom call):

  xla:   hand-rolled GN (f32 stats) -> silu -> lax conv -> + residual
         (the GroupNorm32 default path's exact composition)
  fused: GN stats -> per-(B,C) affine fold -> conv3x3_fused (silu + patch
         build + dot + residual in one Pallas pass)

Shapes: the two target sites named by the verdict plus the ADM headline —
  vae512  (6, 512, 512, 128)   the 512px VAE decoder level (42% useful
                               MXU measured for XLA, worst in the repo)
  sd64    (12, 64, 64, 320)    SD latent res64 (bare im2col won isolated
                               +5-8% here, lost end to end)
  adm64   (32, 64, 64, 192)    ADM-64 res64 (~50% of peak for XLA)

Timing: two-point chained-fori_loop slope (cancels dispatch overhead).

Usage: python docs/probes/probe_fused_conv.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

N_LO, N_HI = 4, 12
PEAK = 197e12

SHAPES = {
    "vae512": (6, 512, 512, 128),
    "sd64": (12, 64, 64, 320),
    "adm64": (32, 64, 64, 192),
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


def _gn_stats(x, groups=32, eps=1e-5):
    b, _, _, c = x.shape
    xg = x.astype(jnp.float32).reshape(b, -1, groups, c // groups)
    mu = jnp.mean(xg, axis=(1, 3))
    var = jnp.maximum(jnp.mean(xg * xg, axis=(1, 3)) - mu * mu, 0.0)
    return mu, jax.lax.rsqrt(var + eps)


def bench(shape, mode):
    from autodiffusion_tpu.ops.conv_im2col import conv3x3_fused

    b, h, w, c = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (b, h, w, c), jnp.bfloat16)
    gamma = jax.random.uniform(ks[1], (c,), jnp.float32, 0.7, 1.3)
    beta = jax.random.normal(ks[2], (c,), jnp.float32) * 0.1
    wk = (jax.random.normal(ks[3], (3, 3, c, c), jnp.float32) * 0.02
          ).astype(jnp.bfloat16)
    bias = jnp.zeros((c,), jnp.bfloat16)
    groups = 32
    per_c = c // groups

    if mode == "xla":
        def body(i, y):
            mu, rstd = _gn_stats(y, groups)
            bshape = (b, 1, 1, groups, per_c)
            xg = y.astype(jnp.float32).reshape(b, h, w, groups, per_c)
            hn = ((xg - mu.reshape(b, 1, 1, groups, 1))
                  * (rstd.reshape(b, 1, 1, groups, 1)
                     * gamma.reshape(1, 1, 1, groups, per_c))
                  + beta.reshape(1, 1, 1, groups, per_c))
            del bshape
            hn = hn.reshape(b, h, w, c).astype(y.dtype)
            hn = jax.nn.silu(hn)
            out = jax.lax.conv_general_dilated(
                hn, wk, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
            return (out + y).astype(y.dtype)
    else:
        def body(i, y):
            mu, rstd = _gn_stats(y, groups)
            rstd_c = jnp.repeat(rstd, per_c, axis=1)
            mu_c = jnp.repeat(mu, per_c, axis=1)
            a = rstd_c * gamma[None]
            off = beta[None] - mu_c * a
            return conv3x3_fused(y, a, off, wk, bias, y).astype(y.dtype)

    net = chain_slope(body, x)
    flops = 2.0 * b * h * w * 9 * c * c
    return flops / net / PEAK, net


def main():
    print(f"backend: {jax.default_backend()}")
    for name, shape in SHAPES.items():
        res = {}
        for mode in ("xla", "fused"):
            try:
                eff, net = bench(shape, mode)
                res[mode] = net
                print(f"  {name:8s} {mode:6s}: {net*1e3:8.2f} ms/iter  "
                      f"{eff*100:5.1f}% peak (conv flops only)", flush=True)
            except Exception as exc:  # noqa: BLE001
                print(f"  {name:8s} {mode:6s} FAILED: "
                      f"{type(exc).__name__}: {exc}", flush=True)
        if len(res) == 2:
            print(f"  {name:8s} fused speedup vs XLA chain: "
                  f"{res['xla'] / res['fused']:.3f}x", flush=True)


if __name__ == "__main__":
    main()
