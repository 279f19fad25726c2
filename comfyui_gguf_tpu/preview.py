"""Latent→RGB preview projection (the host UI's step-preview capability).

ComfyUI previews in-flight latents through per-arch hardcoded
``latent_rgb_factors`` matrices. Here the projection is CALIBRATED against
the actual loaded VAE instead: decode a handful of random latents once at
setup, average-pool the pixels back to latent resolution, and ridge-fit an
affine map latent→RGB. One tiny least-squares at load time buys a preview
that is correct for ANY latent space (4-ch SD, 16-ch flux/SD3, video VAEs)
with no copied constants, and the per-step preview itself is a single
(H·W, C)×(C, 3) matmul — cheap enough to run every serving tick.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LatentPreviewer:
    """Affine latent→RGB map: rgb = z @ W + b, in [0, 1]."""

    W: np.ndarray  # (C, 3)
    b: np.ndarray  # (3,)

    def __call__(self, z) -> np.ndarray:
        """(…, H, W, C) latent → (…, H, W, 3) float RGB in [0, 1]."""
        zf = np.asarray(z, np.float32)
        rgb = zf @ self.W + self.b
        return np.clip((rgb + 1.0) / 2.0, 0.0, 1.0)


def fit_latent_preview(decode_fn, z_channels: int, key=None, n: int = 8,
                       size: int = 16, ridge: float = 1e-3,
                       latent_std: float = 1.0) -> LatentPreviewer:
    """Calibrate a :class:`LatentPreviewer` against a real decoder.

    decode_fn: (B, size, size, z_channels) latent → (B, size·f, size·f, 3)
    image in [-1, 1] (e.g. ``lambda z: vae.decode(params, cfg, z)``).
    ``latent_std`` should match the scale of the latents being previewed
    (scaled DiT latents are ≈ unit variance).
    """
    if key is None:
        key = jax.random.key(0)
    z = jax.random.normal(key, (n, size, size, z_channels),
                          jnp.float32) * latent_std
    img = np.asarray(decode_fn(z), np.float32)
    f = img.shape[1] // size
    # average-pool pixels back to latent resolution
    pooled = img.reshape(n, size, f, size, f, 3).mean(axis=(2, 4))

    zs = np.asarray(z, np.float32).reshape(-1, z_channels)
    ys = pooled.reshape(-1, 3)
    # ridge-regularized normal equations with a bias column
    A = np.concatenate([zs, np.ones((zs.shape[0], 1), np.float32)], axis=1)
    reg = ridge * np.eye(z_channels + 1, dtype=np.float32)
    reg[-1, -1] = 0.0  # don't shrink the bias
    sol = np.linalg.solve(A.T @ A + reg, A.T @ ys)
    return LatentPreviewer(W=sol[:-1].astype(np.float32),
                           b=sol[-1].astype(np.float32))


def previewer_for_vae(vae_params, vae_cfg, qcfg=None,
                      key=None) -> LatentPreviewer:
    """Convenience: calibrate against ``models.vae`` decode."""
    from .models import vae as vae_model
    from .nn.layers import DEFAULT_CONFIG

    qcfg = qcfg or DEFAULT_CONFIG

    def decode_fn(z):
        return vae_model.decode(vae_params, vae_cfg, z, qcfg=qcfg)

    return fit_latent_preview(decode_fn, vae_cfg.z_channels, key=key)
