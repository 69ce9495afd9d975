"""Pallas kernels vs reference einsum implementations (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autodiffusion_tpu.ops import flash_attention


def reference_attention(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k).astype(jnp.float32) / np.sqrt(d)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", w, v)


class TestFlashAttention:
    @pytest.mark.parametrize("t,s,d", [(128, 128, 64), (256, 256, 32),
                                       (100, 100, 64),   # ragged T
                                       (64, 300, 64)])   # cross-attn, ragged S
    def test_matches_einsum(self, t, s, d):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(2, 2, t, d).astype(np.float32))
        k = jnp.asarray(rng.randn(2, 2, s, d).astype(np.float32))
        v = jnp.asarray(rng.randn(2, 2, s, d).astype(np.float32))
        want = reference_attention(q, k, v)
        got = flash_attention(q, k, v, block_q=64, block_kv=64, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    def test_bf16_inputs(self):
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(1, 2, 128, 64), jnp.bfloat16)
        k = jnp.asarray(rng.randn(1, 2, 128, 64), jnp.bfloat16)
        v = jnp.asarray(rng.randn(1, 2, 128, 64), jnp.bfloat16)
        want = reference_attention(q, k, v)
        got = flash_attention(q, k, v, block_q=64, block_kv=64, interpret=True)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   atol=3e-2, rtol=3e-2)

    @pytest.mark.parametrize("h,d", [
        (8, 40),    # SD self/cross: G=3, 8 heads pad to 9 (one zero head)
        (6, 64),    # ADM res32: G=2, exact split
        (4, 32),    # G=4 exact
        (3, 48),    # G=2, 3 heads pad to 4
    ])
    def test_head_packed_matches_einsum_and_unpacked(self, monkeypatch, h, d):
        """The head-packed kernel (G=floor(128/D) heads per grid step,
        block-diagonal KV expansion — VERDICT r3 #3) must match both the
        einsum reference and the unpacked kernel (ADT_FLASH_PACK_HEADS=0)
        for every G/H divisibility case, fwd and bwd."""
        rng = np.random.RandomState(11)
        q = jnp.asarray(rng.randn(2, h, 192, d).astype(np.float32))
        k = jnp.asarray(rng.randn(2, h, 256, d).astype(np.float32))
        v = jnp.asarray(rng.randn(2, h, 256, d).astype(np.float32))
        want = reference_attention(q, k, v)
        monkeypatch.setenv("ADT_FLASH_PACK_HEADS", "1")
        got = flash_attention(q, k, v, block_q=64, block_kv=128,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)
        gq = jax.grad(lambda q_: flash_attention(
            q_, k, v, block_q=64, block_kv=128, interpret=True)
            .astype(jnp.float32).sum())(q)
        monkeypatch.setenv("ADT_FLASH_PACK_HEADS", "0")
        unpacked = flash_attention(q, k, v, block_q=64, block_kv=128,
                                   interpret=True)
        gq_un = jax.grad(lambda q_: flash_attention(
            q_, k, v, block_q=64, block_kv=128, interpret=True)
            .astype(jnp.float32).sum())(q)
        np.testing.assert_allclose(np.asarray(got), np.asarray(unpacked),
                                   atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(gq_un),
                                   atol=2e-5, rtol=2e-5)

    def test_head_packed_bf16_sd_shape(self, monkeypatch):
        """bf16 at the SD head geometry (D=40, H=8): the packed MXU dots
        see structural zeros in the cross-head lanes, which are exact, so
        bf16 tolerance matches the unpacked kernel's."""
        monkeypatch.setenv("ADT_FLASH_PACK_HEADS", "1")
        rng = np.random.RandomState(12)
        q = jnp.asarray(rng.randn(1, 8, 256, 40), jnp.bfloat16)
        k = jnp.asarray(rng.randn(1, 8, 256, 40), jnp.bfloat16)
        v = jnp.asarray(rng.randn(1, 8, 256, 40), jnp.bfloat16)
        want = reference_attention(q, k, v)
        got = flash_attention(q, k, v, block_q=128, block_kv=128,
                              interpret=True)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   atol=3e-2, rtol=3e-2)

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_f32_dots_escape_hatch_matches_einsum(self, monkeypatch, dtype):
        """ADT_FLASH_F32_DOTS=1 restores the pre-round-3 f32 operand
        upcasts (the A/B variant kept for chip probes); it must stay a
        pure numerics-equivalent of the default input-dtype-dot path —
        both within the einsum reference's tolerance. The flag is a
        static jit argument since round 4 (advisor fix), so the
        monkeypatched value genuinely re-traces here even though
        test_bf16_inputs compiled the same tensor signature, and the
        f32-dots trace cannot leak into later tests."""
        monkeypatch.setenv("ADT_FLASH_F32_DOTS", "1")
        rng = np.random.RandomState(7)
        q = jnp.asarray(rng.randn(1, 2, 128, 64), dtype)
        k = jnp.asarray(rng.randn(1, 2, 128, 64), dtype)
        v = jnp.asarray(rng.randn(1, 2, 128, 64), dtype)
        want = reference_attention(q, k, v)
        got = flash_attention(q, k, v, block_q=64, block_kv=64, interpret=True)
        # backward too: the dq/dkv kernels read the same flag
        gq = jax.grad(lambda q_: flash_attention(
            q_, k, v, block_q=64, block_kv=64, interpret=True)
            .astype(jnp.float32).sum())(q)
        gq_ref = jax.grad(lambda q_: reference_attention(q_, k, v)
                          .astype(jnp.float32).sum())(q)
        tol = 3e-2 if dtype == jnp.bfloat16 else 2e-5
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   atol=tol, rtol=tol)
        np.testing.assert_allclose(np.asarray(gq, np.float32),
                                   np.asarray(gq_ref, np.float32),
                                   atol=tol, rtol=tol)

    def test_wide_head_dim_512(self):
        """The VAE mid-block shape: single head, D=512 (> one lane tile).
        Forward and backward must both match the einsum reference."""
        rng = np.random.RandomState(3)
        q = jnp.asarray(rng.randn(1, 1, 128, 512).astype(np.float32))
        k = jnp.asarray(rng.randn(1, 1, 128, 512).astype(np.float32))
        v = jnp.asarray(rng.randn(1, 1, 128, 512).astype(np.float32))
        want = reference_attention(q, k, v)
        got = flash_attention(q, k, v, block_q=64, block_kv=64, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-4, rtol=3e-4)

        def loss_flash(q, k, v):
            return flash_attention(q, k, v, block_q=64, block_kv=64,
                                   interpret=True).sum()

        def loss_ref(q, k, v):
            return reference_attention(q, k, v).sum()

        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-3, rtol=3e-3)

    def test_vae_attn_flash_form_matches_einsum_form(self):
        """The single-head [B,T,C] attention exactly as VAEAttnBlock frames
        it for the kernel (q[:, None] etc.) == its einsum form."""
        rng = np.random.RandomState(4)
        q, k, v = (jnp.asarray(rng.randn(2, 1024, 48).astype(np.float32))
                   for _ in range(3))
        ein = jnp.einsum("btc,bsc->bts", q, k).astype(jnp.float32) * (48 ** -0.5)
        ein = jnp.einsum("bts,bsc->btc", jax.nn.softmax(ein, axis=-1), v)
        fl = flash_attention(q[:, None], k[:, None], v[:, None],
                             block_q=256, block_kv=256, interpret=True)[:, 0]
        np.testing.assert_allclose(np.asarray(fl), np.asarray(ein),
                                   atol=2e-5, rtol=2e-5)

    def test_softmax_stability_large_logits(self):
        q = jnp.full((1, 1, 64, 32), 30.0)
        k = jnp.full((1, 1, 64, 32), 30.0)
        v = jnp.ones((1, 1, 64, 32))
        got = flash_attention(q, k, v, block_q=64, block_kv=64, interpret=True)
        np.testing.assert_allclose(np.asarray(got), 1.0, atol=1e-5)

    def test_grad_through_flash_matches_einsum(self):
        # classifier guidance differentiates through attention; the kernel
        # must have a working VJP
        rng = np.random.RandomState(3)
        q = jnp.asarray(rng.randn(1, 2, 64, 32).astype(np.float32))
        k = jnp.asarray(rng.randn(1, 2, 64, 32).astype(np.float32))
        v = jnp.asarray(rng.randn(1, 2, 64, 32).astype(np.float32))

        def loss_flash(q):
            return flash_attention(q, k, v, block_q=64, block_kv=64,
                                   interpret=True).sum()

        def loss_ref(q):
            return reference_attention(q, k, v).sum()

        gf = jax.grad(loss_flash)(q)
        gr = jax.grad(loss_ref)(q)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize("t,s,d", [(128, 128, 64), (100, 100, 64),
                                       (64, 300, 32),    # cross-attn ragged
                                       (200, 64, 64)])   # t > s, ragged T
    def test_pallas_backward_all_grads_match_einsum(self, t, s, d):
        """dq/dk/dv from the Pallas FA-2 backward (lse residual, blockwise
        p re-formation) vs the einsum VJP, incl. padded/ragged shapes."""
        rng = np.random.RandomState(4)
        q = jnp.asarray(rng.randn(2, 2, t, d).astype(np.float32))
        k = jnp.asarray(rng.randn(2, 2, s, d).astype(np.float32))
        v = jnp.asarray(rng.randn(2, 2, s, d).astype(np.float32))
        g = jnp.asarray(rng.randn(2, 2, t, d).astype(np.float32))

        def flash_fn(q, k, v):
            return flash_attention(q, k, v, block_q=64, block_kv=64,
                                   interpret=True)

        _, vjp_f = jax.vjp(flash_fn, q, k, v)
        _, vjp_r = jax.vjp(reference_attention, q, k, v)
        for got, want, name in zip(vjp_f(g), vjp_r(g), "q k v".split()):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=3e-5, rtol=3e-5,
                err_msg=f"d{name} mismatch at t={t} s={s} d={d}")

    def test_pallas_backward_bf16(self):
        rng = np.random.RandomState(5)
        q = jnp.asarray(rng.randn(1, 2, 128, 64), jnp.bfloat16)
        k = jnp.asarray(rng.randn(1, 2, 128, 64), jnp.bfloat16)
        v = jnp.asarray(rng.randn(1, 2, 128, 64), jnp.bfloat16)
        g = jnp.asarray(rng.randn(1, 2, 128, 64), jnp.bfloat16)

        def flash_fn(q, k, v):
            return flash_attention(q, k, v, block_q=64, block_kv=64,
                                   interpret=True)

        grads = jax.vjp(flash_fn, q, k, v)[1](g)
        refs = jax.vjp(reference_attention, q, k, v)[1](g)
        for got, want in zip(grads, refs):
            assert got.dtype == jnp.bfloat16
            np.testing.assert_allclose(np.asarray(got, np.float32),
                                       np.asarray(want, np.float32),
                                       atol=6e-2, rtol=6e-2)


class TestResolveUseFlash:
    """The unified gate (ops.resolve_use_flash) shared by every attention
    site; the env var must be honored everywhere or the benches' einsum-twin
    FLOP counting silently keeps zero-billed Pallas calls."""

    def test_non_tpu_backend_forces_einsum_even_when_explicit(self):
        from autodiffusion_tpu.ops import resolve_use_flash
        assert jax.default_backend() != "tpu"
        assert resolve_use_flash("auto", 4096, 4096, 64) is False
        assert resolve_use_flash(True, 4096, 4096, 64) is False

    def test_auto_honors_min_tokens_env(self, monkeypatch):
        from autodiffusion_tpu.ops import resolve_use_flash
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert resolve_use_flash("auto", 1024, 1024, 64) is True
        assert resolve_use_flash("auto", 1024, 512, 64) is True
        assert resolve_use_flash("auto", 512, 512, 64) is False
        monkeypatch.setenv("ADT_FLASH_MIN_TOKENS", str(1 << 30))
        # the benches' counting twin: every site must fall to einsum
        assert resolve_use_flash("auto", 4096, 4096, 64) is False
        assert resolve_use_flash("auto", 4096, 4096, 512) is False
        monkeypatch.setenv("ADT_FLASH_MIN_TOKENS", "256")
        assert resolve_use_flash("auto", 256, 256, 64) is True

    def test_head_dim_ceiling(self, monkeypatch):
        from autodiffusion_tpu.ops import resolve_use_flash
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert resolve_use_flash(True, 4096, 4096, 129) is False
        assert resolve_use_flash(True, 4096, 4096, 512,
                                 max_head_dim=512) is True
