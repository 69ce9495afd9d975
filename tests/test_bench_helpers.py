"""Unit tests for bench.py's host-side helpers.

The benches themselves are chip-only, but two pieces carry correctness
weight beyond timing: the Pallas counting-gate context manager (MFU is
silently wrong if any kernel gate is missing or the env leaks), and the
backend probe's failure classification.
"""

import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


class TestPallasKernelsDisabled:
    def test_forces_every_kernel_gate(self):
        with bench.pallas_kernels_disabled():
            # flash: min-tokens pushed above any real sequence length
            assert int(os.environ["ADT_FLASH_MIN_TOKENS"]) >= 1 << 30
            # im2col conv + fused norm + fused norm-act-conv: hard off
            assert os.environ["ADT_IM2COL_CONV"] == "0"
            assert os.environ["ADT_FUSED_NORM"] == "0"
            assert os.environ["ADT_FUSED_CONV"] == "0"
            assert os.environ["ADT_FLASH_PACK_HEADS"] == "0"
            # the resolved gates agree (CPU backend already forces False,
            # so check the env-level contract the TPU path consults)
            from autodiffusion_tpu.ops.conv_im2col import resolve_use_im2col
            assert resolve_use_im2col("auto", 64, 64, 192, 192) is False

    def test_restores_prior_env(self):
        os.environ["ADT_IM2COL_CONV"] = "1"
        os.environ.pop("ADT_FUSED_NORM", None)
        prev_flash = os.environ.get("ADT_FLASH_MIN_TOKENS")
        try:
            with bench.pallas_kernels_disabled():
                assert os.environ["ADT_IM2COL_CONV"] == "0"
            assert os.environ["ADT_IM2COL_CONV"] == "1"
            assert "ADT_FUSED_NORM" not in os.environ
            assert os.environ.get("ADT_FLASH_MIN_TOKENS") == prev_flash
        finally:
            os.environ.pop("ADT_IM2COL_CONV", None)

    def test_restores_on_exception(self):
        os.environ.pop("ADT_IM2COL_CONV", None)
        try:
            with bench.pallas_kernels_disabled():
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        assert "ADT_IM2COL_CONV" not in os.environ


class TestBackendProbe:
    def test_skip_env_bypasses(self, monkeypatch):
        monkeypatch.setenv("ADT_SKIP_BACKEND_PROBE", "1")
        bench.probe_backend_or_die(timeout_s=1)  # must not probe or raise

    def test_cpu_fallback_rejected(self, monkeypatch):
        # A probe child that "succeeds" on CPU must still be rejected:
        # rc=0 + platform 'cpu' is jax's silent fallback mode.
        monkeypatch.delenv("ADT_SKIP_BACKEND_PROBE", raising=False)

        class FakeProc:
            returncode = 0
            stdout = "cpu\n"
            stderr = "plugin init failed\n"

        monkeypatch.setattr(subprocess, "run",
                            lambda *a, **k: FakeProc())
        try:
            bench.probe_backend_or_die(timeout_s=1)
        except SystemExit as e:
            assert e.code == 2
        else:
            raise AssertionError("CPU fallback passed the probe")

    def test_tpu_platform_accepted(self, monkeypatch):
        monkeypatch.delenv("ADT_SKIP_BACKEND_PROBE", raising=False)

        class FakeProc:
            returncode = 0
            stdout = "tpu\n"
            stderr = ""

        monkeypatch.setattr(subprocess, "run",
                            lambda *a, **k: FakeProc())
        bench.probe_backend_or_die(timeout_s=1)  # no raise

    def test_timeout_classified(self, monkeypatch):
        monkeypatch.delenv("ADT_SKIP_BACKEND_PROBE", raising=False)

        def raise_timeout(*a, **k):
            raise subprocess.TimeoutExpired(cmd="x", timeout=1)

        monkeypatch.setattr(subprocess, "run", raise_timeout)
        try:
            bench.probe_backend_or_die(timeout_s=1)
        except SystemExit as e:
            assert e.code == 2
        else:
            raise AssertionError("timeout passed the probe")
