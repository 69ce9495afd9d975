"""SD CFG-step roofline reconciliation (BENCH_NOTES "Round-3 SD roofline").

The ADM headline got a per-shape conv roofline that proved 0.52 MFU is the
XLA ceiling there. This probe does the same for the SD v1 CFG denoise step
(512px latents, batch 6 -> UNet batch 12, measured 111.8 ms / 0.43 MFU):

1. `sd_sites()` walks the exact SDUNetModel structure (models/sd_unet.py,
   mirroring openaimodel.py:413-744) and emits every FLOP-bearing site
   with its op class and shape.
2. On chip, each unique shape class is microbenched with a TWO-POINT
   chained-fori_loop slope: the same body compiled at chain lengths 32
   and 96, per-iter time = (t96 - t32) / 64. The first run of this
   probe used a trivial-add control subtraction instead; ~30 ms of
   tunnel dispatch jitter (BENCH_NOTES environment quirk #4) made
   several nets underflow to ~0 (billions of % peak). The slope method
   cancels any constant per-dispatch overhead exactly and is immune to
   that failure mode.
3. The per-class measured efficiencies price every site; the sum is
   reconciled against the measured step time. The residual and the
   per-class attribution say where the next lever is (or that there is
   none).

Bandwidth ops (GroupNorm+SiLU chains, residual/concat/upsample traffic)
are priced at a measured-achievable HBM rate rather than FLOPs; they are
the "overhead" the MXU classes can never explain.

Usage: python docs/probes/probe_sd_roofline.py [--quick] [--no-attn]
"""
import argparse
import functools
import os
import sys
import time
from collections import defaultdict

import jax

if os.environ.get("PROBE_CPU") == "1":  # smoke-test path (tunnel down)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

N_LO, N_HI = 32, 96     # two-point chain lengths; slope = 64 iters
PEAK = 197e12           # v5e bf16 MXU peak, matches bench.py
HBM_BW = 819e9          # v5e HBM peak bytes/s

B = 12                  # CFG batch (6 cond + 6 uncond)
LAT = 64                # 512px latents
CH = 320
MULT = (1, 2, 4, 4)
NRES = 2
ATTN_DS = (1, 2, 4)
HEADS = 8
CTX_T = 77
CTX_D = 768


def sd_sites():
    """Every FLOP/byte-bearing site of one SD v1 CFG UNet call at B=12.

    Returns a list of (kind, label, shape-tuple, flops, bytes) where
    exactly one of flops/bytes is nonzero. Kinds: conv3x3 (B,H,W,ci,co),
    conv3x3_s2 (B,Hout,Wout,ci,co), matmul (M,K,N), attn (B,h,T,S,dh),
    bw (bandwidth bytes).
    """
    sites = []
    it = 2  # bf16 bytes

    def conv(label, h, w, ci, co, stride=1):
        ho, wo = h // stride, w // stride
        kind = "conv3x3" if stride == 1 else "conv3x3_s2"
        sites.append((kind, label, (B, ho, wo, ci, co),
                      2.0 * B * ho * wo * 9 * ci * co, 0))

    def mm(label, m, k, n):
        sites.append(("matmul", label, (m, k, n), 2.0 * m * k * n, 0))

    def attn_core(label, t, s, dh):
        sites.append(("attn", label, (B, HEADS, t, s, dh),
                      4.0 * B * HEADS * t * s * dh, 0))

    def bw(label, nbytes):
        sites.append(("bw", label, (), 0, float(nbytes)))

    def resblock(label, h, w, ci, co):
        # GN+SiLU: fused stats+normalize ~= 2 reads + 1 write of the tensor
        bw(f"{label}.norms", 2 * (3 * B * h * w * ci * it))
        conv(f"{label}.in_conv", h, w, ci, co)
        mm(f"{label}.emb", B, 4 * CH, co)      # use_scale_shift_norm=False
        conv(f"{label}.out_conv", h, w, co, co)
        if ci != co:
            mm(f"{label}.skip", B * h * w, ci, co)
        # residual add: read h + read skip + write
        bw(f"{label}.resid", 3 * B * h * w * co * it)

    def transformer(label, h, w, ch):
        t = h * w
        inner = ch
        dh = ch // HEADS
        bw(f"{label}.gn", 3 * B * t * ch * it)
        mm(f"{label}.proj_in", B * t, ch, inner)
        # self-attention
        mm(f"{label}.self_qkv", B * t, inner, 3 * inner)
        attn_core(f"{label}.self", t, t, dh)
        mm(f"{label}.self_out", B * t, inner, inner)
        bw(f"{label}.resid1", 3 * B * t * inner * it)
        # cross-attention (context bank fixed at T=77, d=768)
        mm(f"{label}.cross_q", B * t, inner, inner)
        mm(f"{label}.cross_kv", B * CTX_T, CTX_D, 2 * inner)
        attn_core(f"{label}.cross", t, CTX_T, dh)
        mm(f"{label}.cross_out", B * t, inner, inner)
        bw(f"{label}.resid2", 3 * B * t * inner * it)
        # GEGLU feed-forward (mult=4 -> proj to 8*inner, gate, out 4*inner)
        mm(f"{label}.ff_proj", B * t, inner, 8 * inner)
        mm(f"{label}.ff_out", B * t, 4 * inner, inner)
        bw(f"{label}.resid3", 3 * B * t * inner * it)
        # layer norms x3
        bw(f"{label}.lns", 3 * (3 * B * t * inner * it))
        mm(f"{label}.proj_out", B * t, inner, ch)
        bw(f"{label}.resid4", 3 * B * t * ch * it)

    # ---- down path
    conv("stem", LAT, LAT, 4, CH)
    h = w = LAT
    ch = CH
    ds = 1
    skips = [ch]
    for level, mult in enumerate(MULT):
        for i in range(NRES):
            ci, ch = ch, mult * CH
            resblock(f"down_{level}_{i}", h, w, ci, ch)
            if ds in ATTN_DS:
                transformer(f"down_{level}_{i}_attn", h, w, ch)
            skips.append(ch)
        if level != len(MULT) - 1:
            conv(f"down_{level}_ds", h, w, ch, ch, stride=2)
            h //= 2
            w //= 2
            ds *= 2
            skips.append(ch)

    # ---- middle
    resblock("mid_res0", h, w, ch, ch)
    transformer("mid_attn", h, w, ch)
    resblock("mid_res1", h, w, ch, ch)

    # ---- up path
    for level, mult in list(enumerate(MULT))[::-1]:
        for i in range(NRES + 1):
            sk = skips.pop()
            bw(f"up_{level}_{i}.concat", 2 * B * h * w * (ch + sk) * it)
            ci, ch = ch + sk, mult * CH
            resblock(f"up_{level}_{i}", h, w, ci, ch)
            if ds in ATTN_DS:
                transformer(f"up_{level}_{i}_attn", h, w, ch)
            if level and i == NRES:
                # nearest 2x: read + 4x write at out res
                bw(f"up_{level}_us.nn", 5 * B * h * w * ch * it)
                h *= 2
                w *= 2
                conv(f"up_{level}_us.conv", h, w, ch, ch)
                ds //= 2
    assert not skips

    bw("out_norm", 3 * B * h * w * ch * it)
    conv("out_conv", h, w, ch, 4)
    # eps-combine (uncond + scale*(cond-uncond)): 2 reads + 1 write at B=6
    bw("cfg_combine", 3 * (B // 2) * h * w * 4 * 4)
    return sites


# ---------------- chip microbenches ----------------

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
    """Per-iteration seconds of `body` via the two-point chain slope.

    Compiles fori_loop(body) at N_LO and N_HI iterations; the slope
    (t_hi - t_lo) / (N_HI - N_LO) cancels constant dispatch/sync
    overhead exactly, unlike a control-subtraction (which underflowed
    under ~30 ms tunnel jitter in the first run of this probe).
    """
    t = {}
    for n in (N_LO, N_HI):
        fn = jax.jit(functools.partial(
            lambda n_, x_: jax.lax.fori_loop(0, n_, body, x_), n))
        t[n] = time_compiled(fn.lower(x).compile(), (x,))
    return max((t[N_HI] - t[N_LO]) / (N_HI - N_LO), 1e-9)


def bench_conv(shape, stride=1):
    b, ho, wo, ci, co = shape
    hi, wi = ho * stride, wo * stride
    x = jax.random.normal(jax.random.PRNGKey(0), (b, hi, wi, ci), jnp.bfloat16)
    wk = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, ci, co),
                            jnp.float32) * 0.05).astype(jnp.bfloat16)
    wb = (jax.random.normal(jax.random.PRNGKey(2), (3, 3, co, ci),
                            jnp.float32) * 0.05).astype(jnp.bfloat16)

    def conv(y, w, stride_):
        return jax.lax.conv_general_dilated(
            y, w, (stride_, stride_), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    if stride == 1 and ci == co:
        def body(i, y):
            return conv(y, wk, 1)
        flops_iter = 2.0 * b * ho * wo * 9 * ci * co
    else:
        # chain via a paired back-projection; count both dots' flops
        def body(i, y):
            z = conv(y, wk, stride)
            if stride > 1:
                z = jnp.broadcast_to(
                    z[:, :, None, :, None, :],
                    (b, ho, stride, wo, stride, co)).reshape(b, hi, wi, co)
            return conv(z, wb, 1)
        flops_iter = 2.0 * b * ho * wo * 9 * ci * co + 2.0 * b * hi * wi * 9 * co * ci

    net = chain_slope(body, x)
    return flops_iter / net / PEAK, net


def bench_matmul(shape):
    m, k, n = shape
    x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    w1 = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16) * 0.05
    w2 = jax.random.normal(jax.random.PRNGKey(2), (n, k), jnp.bfloat16) * 0.05

    def body(i, y):
        return jnp.dot(jnp.dot(y, w1, preferred_element_type=jnp.bfloat16),
                       w2, preferred_element_type=jnp.bfloat16)

    net = chain_slope(body, x)
    return (2.0 * m * k * n * 2) / net / PEAK, net


def bench_attn(shape, use_flash):
    b, heads, t, s, dh = shape
    q = jax.random.normal(jax.random.PRNGKey(0), (b, heads, t, dh),
                          jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, heads, s, dh),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, heads, s, dh),
                          jnp.bfloat16)
    scale = dh ** -0.5

    if use_flash:
        from autodiffusion_tpu.ops.flash_attention import flash_attention

        def core(q_, k_, v_):
            return flash_attention(q_, k_, v_)  # scales by dh**-0.5 itself
    else:
        def core(q_, k_, v_):
            s_ = jnp.einsum("bhtd,bhsd->bhts", q_, k_,
                            preferred_element_type=jnp.float32) * scale
            w_ = jax.nn.softmax(s_, axis=-1).astype(q_.dtype)
            return jnp.einsum("bhts,bhsd->bhtd", w_, v_,
                              preferred_element_type=jnp.bfloat16)

    def body(i, y):
        return core(y, k, v)

    net = chain_slope(body, q)
    return (4.0 * b * heads * t * s * dh) / net / PEAK, net


def bench_bw():
    """Achievable HBM rate on a GN+SiLU-like chain (the bw class model)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 64, 64, CH),
                          jnp.bfloat16)

    def gn(y):
        y32 = y.astype(jnp.float32).reshape(B, -1, 32, CH // 32)
        mu = jnp.mean(y32, axis=(1, 3), keepdims=True)
        var = jnp.maximum(jnp.mean(y32 * y32, axis=(1, 3), keepdims=True)
                          - mu * mu, 0.0)
        h = (y32 - mu) * jax.lax.rsqrt(var + 1e-5)
        return jax.nn.silu(h.reshape(y.shape).astype(y.dtype))

    net = chain_slope(lambda i, y: gn(y), x)
    nbytes = 3 * x.size * 2  # 2 reads + 1 write, bf16
    return nbytes / net  # bytes/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="skip duplicate-shape benches aggressively")
    ap.add_argument("--no-attn", action="store_true")
    ap.add_argument("--enumerate-only", action="store_true",
                    help="print the site walk and totals, no chip benches")
    args = ap.parse_args()

    sites = sd_sites()
    tot_flops = sum(s[3] for s in sites)
    tot_bytes = sum(s[4] for s in sites)
    print(f"backend: {jax.default_backend()}")
    print(f"UNet CFG call: {tot_flops/1e12:.2f} TFLOP MXU classes + "
          f"{tot_bytes/1e9:.1f} GB bw classes")
    print(f"ideal MXU time {tot_flops/PEAK*1e3:.1f} ms; "
          f"ideal bw time {tot_bytes/HBM_BW*1e3:.1f} ms")

    # FLOPs by class
    by_kind = defaultdict(float)
    for kind, _, _, fl, byt in sites:
        by_kind[kind] += fl or byt
    for kind, v in sorted(by_kind.items()):
        unit = "GB" if kind == "bw" else "TFLOP"
        val = v / (1e9 if kind == "bw" else 1e12)
        print(f"  {kind:10s} {val:8.2f} {unit}")

    # unique shapes per MXU class
    uniq = defaultdict(float)
    for kind, _, shape, fl, _ in sites:
        if kind != "bw":
            uniq[(kind, shape)] += fl
    print(f"{len(uniq)} unique MXU shapes")
    if args.enumerate_only:
        for (kind, shape), fl in sorted(uniq.items(), key=lambda kv: -kv[1]):
            print(f"  {kind:10s} {str(shape):30s} {fl/1e12:6.2f} TFLOP")
        return

    bw_rate = bench_bw()
    print(f"achievable bw (GN+SiLU chain): {bw_rate/1e9:.0f} GB/s "
          f"({bw_rate/HBM_BW*100:.0f}% of peak)")

    eff = {}
    for (kind, shape), fl in sorted(uniq.items(), key=lambda kv: -kv[1]):
        if args.quick and fl < 0.01e12:
            continue
        try:
            if kind == "conv3x3":
                e, net = bench_conv(shape, stride=1)
            elif kind == "conv3x3_s2":
                e, net = bench_conv(shape, stride=2)
            elif kind == "matmul":
                e, net = bench_matmul(shape)
            elif kind == "attn":
                if args.no_attn:
                    continue
                e_f, net_f = (bench_attn(shape, True)
                              if shape[2] >= 1024 else (0.0, float("inf")))
                e_x, net_x = bench_attn(shape, False)
                tag = "flash" if net_f <= net_x else "xla"
                e, net = max(e_f, e_x), min(net_f, net_x)
                print(f"  attn {shape}: flash {e_f*100:5.1f}%  "
                      f"xla {e_x*100:5.1f}%  -> {tag}")
            eff[(kind, shape)] = e
            print(f"  {kind:10s} {str(shape):28s} {fl/1e12:6.2f} TFLOP  "
                  f"net {e*100:5.1f}% peak")
        except Exception as exc:  # noqa: BLE001 - probe keeps going
            print(f"  {kind} {shape} FAILED: {type(exc).__name__}: {exc}")

    # reconcile
    pred_mxu = 0.0
    by_class_ms = defaultdict(float)
    for kind, label, shape, fl, byt in sites:
        if kind == "bw":
            t = byt / bw_rate
        else:
            e = eff.get((kind, shape))
            if e is None:   # skipped tiny shape: price at 50%
                e = 0.5
            t = fl / (e * PEAK)
        pred_mxu += t
        by_class_ms[kind] += t * 1e3
    print("\npredicted step time by class (ms):")
    for kind, ms in sorted(by_class_ms.items(), key=lambda kv: -kv[1]):
        print(f"  {kind:10s} {ms:7.2f}")
    print(f"predicted total {pred_mxu*1e3:.1f} ms  "
          f"(measured CFG step: 111.8 ms, BENCH_EXTRAS sd)")


if __name__ == "__main__":
    main()
