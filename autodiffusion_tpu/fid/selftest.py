"""One-command real-weights FID certification (``adt selftest``).

Every FID stage in this repo is parity-tested against independent
reference implementations with RANDOM weights, because the genuine
pt_inception-2015-12-05-6726825d.pth cannot be downloaded in the build
sandbox (evaluator_v1.py:652-679 auto-downloads it;
evaluations/README.md documents the artifact). This module makes the
remaining step a single command the day the real weights are available:

    adt selftest --inception_path pt_inception-2015-12-05-6726825d.pth \
                 [--ref_batch VIRTUAL_imagenet64_labeled.npz] \
                 [--ref_stats published_stats.npz --expected_fid F]

Checks run (each reported pass/fail in one JSON line):
  1. sha256 of the weights file — the genuine checkpoint's digest starts
     with 6726825d (the suffix torchvision's check_hash verifies);
  2. strict state-dict layout into BOTH the flax loader and the torch
     mirror of the pytorch_fid graph;
  3. feature parity: pool3/spatial/logits of the flax network vs the
     torch mirror on deterministic uint8 fixtures at 299 (native) and
     64 (resize path) — with real weights this certifies the deployed
     network IS pytorch_fid's;
  4. FID reproduction: the full repo pipeline (preprocess -> features ->
     moments -> frechet) vs an independent pytorch_fid-style computation
     (torch mirror features + float64 np.cov + scipy-sqrtm Frechet) on a
     two-batch fixture;
  5. optionally, FID of --ref_batch against --ref_stats (published
     moment files), compared to --expected_fid when given.

``passed`` = all consistency checks hold; ``certified`` additionally
requires the genuine weights digest, i.e. the offline synthesized
checkpoint keeps passed=true / certified=false.
"""

from __future__ import annotations

import hashlib
from typing import Any, Dict, Optional

import numpy as np

__all__ = ["GENUINE_SHA256_PREFIX", "run_selftest"]

# pt_inception-2015-12-05-6726825d.pth: the 8-hex-digit name suffix is the
# sha256 prefix torchvision verifies on download (pytorch_fid FID_WEIGHTS_URL)
GENUINE_SHA256_PREFIX = "6726825d"


def _rel_err(a, b) -> float:
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.abs(a - b).max() / max(1.0, np.abs(b).max()))


def run_selftest(inception_path: str, *, ref_batch: Optional[str] = None,
                 ref_stats: Optional[str] = None,
                 expected_fid: Optional[float] = None, tol: float = 0.5,
                 batch_size: int = 32, n_fixture: int = 32,
                 seed: int = 0) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp

    from .evaluator import FIDEvaluator, make_inception_feature_fn
    from .inception import FIDInceptionV3, load_fid_inception_params, preprocess
    from .stats import FIDStats, frechet_distance

    # fail fast on inconsistent arguments BEFORE any heavy work (loading
    # weights + two jitted parity passes take minutes; a bad flag pair
    # must not silently ride through them first)
    if bool(ref_batch) != bool(ref_stats):
        raise ValueError("--ref_batch and --ref_stats must be given together "
                         "(the reference-batch FID scores one against the "
                         "other)")

    out: Dict[str, Any] = {"checks": {}}
    checks = out["checks"]

    # 1. weights digest
    h = hashlib.sha256()
    with open(inception_path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    digest = h.hexdigest()
    genuine = digest.startswith(GENUINE_SHA256_PREFIX)
    checks["weights_sha256"] = {"value": digest, "genuine": genuine}

    # 2. strict layout loads (flax + torch mirror)
    fparams = load_fid_inception_params(inception_path)
    checks["flax_load"] = {"ok": True}
    try:
        import torch  # noqa: F401

        from .torch_mirror import build_torch_mirror, load_mirror_state
        mirror = load_mirror_state(build_torch_mirror(), inception_path)
        checks["torch_mirror_load"] = {"ok": True}
    except ImportError:
        mirror = None
        checks["torch_mirror_load"] = {"ok": None, "skipped": "no torch"}

    feature_fn = make_inception_feature_fn(fparams)
    model = FIDInceptionV3()
    apply = jax.jit(model.apply)

    def mirror_out(imgs_u8):
        import torch
        import torch.nn.functional as F
        tx = torch.from_numpy(
            imgs_u8.transpose(0, 3, 1, 2).astype(np.float32)) / 255.0
        if imgs_u8.shape[1] != 299:
            tx = F.interpolate(tx, size=(299, 299), mode="bilinear",
                               align_corners=False)
        tx = tx * 2.0 - 1.0
        with torch.no_grad():
            t = mirror(tx)
        return {k: v.numpy() for k, v in t.items()}

    # 3. feature parity on deterministic fixtures (native + resize path)
    if mirror is not None:
        rng = np.random.RandomState(seed)
        parity_ok = True
        for size in (299, 64):
            imgs = rng.randint(0, 256, (4, size, size, 3), dtype=np.uint8)
            ours = apply(fparams, preprocess(jnp.asarray(imgs)))
            theirs = mirror_out(imgs)
            rep = {
                "pool3_rel": _rel_err(ours["pool3"], theirs["pool3"]),
                "logits_rel": _rel_err(ours["logits"], theirs["logits"]),
                "spatial_rel": _rel_err(
                    ours["spatial"],
                    theirs["spatial"].transpose(0, 2, 3, 1)),
            }
            rep["ok"] = all(v < 1e-3 for v in rep.values())
            parity_ok &= rep["ok"]
            checks[f"feature_parity_{size}"] = rep

        # 4. FID reproduction: repo pipeline vs pytorch_fid-style
        a = rng.randint(0, 256, (n_fixture, 64, 64, 3), dtype=np.uint8)
        b = np.clip(a.astype(np.int32)
                    + rng.randint(-40, 40, a.shape), 0, 255).astype(np.uint8)
        sa = FIDStats.from_features(np.asarray(
            FIDEvaluator(feature_fn, None, batch_size=batch_size)
            .compute_activations(a)[0]))
        ev = FIDEvaluator(feature_fn, sa, batch_size=batch_size)
        ours_fid = ev.cal_metrics(b)["fid"]
        ma = mirror_out(a)["pool3"].astype(np.float64)
        mb = mirror_out(b)["pool3"].astype(np.float64)
        ref_fid = frechet_distance(
            FIDStats(mb.mean(0), np.cov(mb, rowvar=False)),
            FIDStats(ma.mean(0), np.cov(ma, rowvar=False)))
        rep = {"ours": float(ours_fid), "pytorch_fid_style": float(ref_fid)}
        # with n_fixture << 2048 both covariances are rank-deficient and
        # sqrtm amplifies the tiny (<1e-3 rel) feature differences, so
        # compare with a relative bound
        rep["ok"] = abs(rep["ours"] - rep["pytorch_fid_style"]) <= (
            0.02 * max(1.0, abs(rep["pytorch_fid_style"])))
        checks["fid_reproduction"] = rep
    else:
        parity_ok = None

    # 5. published artifacts (optional; both-or-neither was validated at
    # entry)
    if ref_batch and ref_stats:
        with np.load(ref_batch) as z:
            # OpenAI reference batches (VIRTUAL_imagenet64_labeled.npz)
            # hold images under arr_0 PLUS a label array — mirror the
            # reference evaluator's obj['arr_0'] selection and fall back
            # to the first image-shaped entry, never blindly files[0]
            if "arr_0" in z.files:
                arr = z["arr_0"]
            else:
                img_keys = [k for k in z.files
                            if z[k].ndim == 4 and z[k].shape[-1] == 3]
                if not img_keys:
                    raise ValueError(
                        f"{ref_batch} has no [N,H,W,3] image array "
                        f"(keys: {z.files})")
                arr = z[img_keys[0]]
        ref = FIDStats.load(ref_stats)
        ev = FIDEvaluator(feature_fn, ref, batch_size=batch_size)
        fid = float(ev.cal_metrics(arr)["fid"])
        rep = {"fid": fid}
        if expected_fid is not None:
            rep["expected"] = float(expected_fid)
            rep["ok"] = abs(fid - expected_fid) <= tol
        checks["ref_batch_fid"] = rep

    hard = [c["ok"] for c in checks.values()
            if isinstance(c, dict) and isinstance(c.get("ok"), bool)]
    # the parity + FID-reproduction checks ARE the selftest; without torch
    # only the trivial load check ran, and reporting passed=true would let
    # a CI gate conclude the pipeline was verified when it wasn't
    out["passed"] = bool(hard) and all(hard) and parity_ok is not None
    if parity_ok is None:
        out["note_incomplete"] = ("torch unavailable: parity and FID-"
                                  "reproduction checks skipped, so passed "
                                  "is false (nothing of substance ran)")
    out["certified"] = out["passed"] and genuine and parity_ok is True
    if not genuine:
        out["note"] = ("weights are NOT the genuine pt_inception-2015-12-05 "
                       "checkpoint (sha256 mismatch); consistency checks ran "
                       "but certification requires the real file")
    return out
