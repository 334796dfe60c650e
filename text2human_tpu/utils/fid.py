"""Frechet distance evaluation harness.

The reference reports FID only in the paper, with no in-repo evaluator
(BASELINE.md).  This module provides the statistics pipeline — batched feature
extraction, running mean/covariance, and the Frechet distance — with a
pluggable feature extractor.  With converted InceptionV3 weights this is
standard FID; the built-in fallback uses the LPIPS VGG16 tower's deepest
features, which is a consistent relative quality metric in zero-egress
environments (absolute values are not comparable to Inception-FID).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class RunningMoments:
    """Streaming mean and covariance over feature batches."""

    def __init__(self, dim: int):
        self.n = 0
        self.sum = np.zeros(dim, np.float64)
        self.outer = np.zeros((dim, dim), np.float64)

    def update(self, feats: np.ndarray):
        feats = np.asarray(feats, np.float64)
        self.n += feats.shape[0]
        self.sum += feats.sum(axis=0)
        self.outer += feats.T @ feats

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        mu = self.sum / self.n
        cov = self.outer / self.n - np.outer(mu, mu)
        cov *= self.n / max(self.n - 1, 1)
        return mu, cov


def _psd_sqrt(mat: np.ndarray) -> np.ndarray:
    """Symmetric PSD square root via eigh (eigenvalues clamped at 0)."""
    w, v = np.linalg.eigh((mat + mat.T) / 2.0)
    w = np.maximum(w, 0.0)
    return (v * np.sqrt(w)) @ v.T


def frechet_distance(
    mu1: np.ndarray, cov1: np.ndarray, mu2: np.ndarray, cov2: np.ndarray
) -> float:
    """||mu1-mu2||^2 + tr(cov1 + cov2 - 2 (cov1 cov2)^(1/2)).

    tr((C1 C2)^(1/2)) is computed as tr((C1^(1/2) C2 C1^(1/2))^(1/2)) — the
    inner matrix is symmetric PSD, so eigh is numerically robust even for the
    near-singular covariances of small eval sets (the earlier
    eigvals-of-the-nonsymmetric-product form could report distorted values
    there)."""
    diff = np.asarray(mu1) - np.asarray(mu2)
    s1 = _psd_sqrt(np.asarray(cov1, np.float64))
    inner = s1 @ np.asarray(cov2, np.float64) @ s1
    w = np.linalg.eigvalsh((inner + inner.T) / 2.0)
    covmean_trace = np.sum(np.sqrt(np.maximum(w, 0.0)))
    return float(
        diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * covmean_trace
    )


def vgg_feature_extractor(lpips_module, lpips_vars) -> Callable:
    """Deepest-VGG-feature extractor from the LPIPS tower (mean-pooled)."""
    from text2human_tpu.losses.perceptual import VGG16Features, _SCALE, _SHIFT

    # honor the configured module's compute dtype (an LPIPS(dtype=bf16)
    # caller expects the FID tower to run the same way)
    vgg = VGG16Features(dtype=getattr(lpips_module, "dtype", jnp.float32))
    vgg_params = {"params": lpips_vars["params"]["vgg"]}

    @jax.jit
    def extract(images01: jax.Array) -> jax.Array:
        x = images01 * 2.0 - 1.0  # [0,1] -> [-1,1]
        x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
        feats = vgg.apply(vgg_params, x)
        return jnp.mean(feats[-1], axis=(1, 2))  # [N, 512]

    return extract


def inception_extractor_from_torch(path: str) -> Callable:
    """Standard-FID extractor from a torchvision ``inception_v3`` (or
    pt_inception FID) checkpoint on disk."""
    import torch

    from text2human_tpu.models.inception import (
        inception_feature_extractor,
        inception_params_from_torch,
    )

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    variables = jax.tree.map(jnp.asarray, inception_params_from_torch(sd))
    return inception_feature_extractor(variables)


def compute_fid(
    real_batches: Iterable[np.ndarray],
    fake_batches: Iterable[np.ndarray],
    extract: Callable,
) -> float:
    """images in [0,1], NHWC.  Returns the Frechet distance between feature
    distributions."""
    moments = []
    for batches in (real_batches, fake_batches):
        rm: Optional[RunningMoments] = None
        first_b = None
        for batch in batches:
            batch = np.asarray(batch)
            n = batch.shape[0]
            if first_b is None:
                first_b = n
            if n < first_b:
                # pad the ragged tail to the compiled batch shape (a new
                # leading dim would recompile the whole feature tower)
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], first_b - n, axis=0)]
                )
            feats = np.asarray(extract(jnp.asarray(batch)))[:n]
            if rm is None:
                rm = RunningMoments(feats.shape[1])
            rm.update(feats)
        if rm is None or rm.n < 2:
            # explicit (not assert: python -O strips asserts, and the follow
            # -on AttributeError would mask the real problem)
            raise ValueError("need at least 2 samples per side for FID")
        moments.append(rm.finalize())
    (mu1, cov1), (mu2, cov2) = moments
    return frechet_distance(mu1, cov1, mu2, cov2)
