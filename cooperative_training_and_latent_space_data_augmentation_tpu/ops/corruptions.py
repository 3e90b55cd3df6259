"""TorchIO-style MRI corruptions as pure jnp ops (ACDC-C test-set generator).

Re-design of ``medseg/dataset_loader/generate_artefacted_data.py`` (:56-62):
the reference corrupts the 20 ACDC test patients x 3 seeds with TorchIO's
{RandomBias, RandomSpike, RandomGhosting, RandomMotion(degrees=30,
translation=10)}.  Here the four corruption models are implemented directly
in jnp (k-space ops via jnp.fft), so ACDC-C generation runs on device and the
same ops can be applied online during robustness evaluation
(BASELINE configs[4]).

Implementations follow TorchIO's models:
  * bias field: exp(polynomial in normalized coords), order 3, coefficients
    U(-0.5, 0.5) — multiplicative.
  * spike: add spike(s) at random k-space positions with amplitude
    `intensity * max|spectrum|`.
  * ghosting: attenuate every num_ghosts-th k-space line along one axis
    (sparing the central low-frequency band) -> motion-ghost replicas.
  * motion: split k-space along the phase-encode axis into segments taken
    from differently translated/rotated copies (degrees<=30, translation<=10px).

All functions take/return (H, W) slices or (N, H, W) stacks in [0, 1] and
rescale the output back to [0, 1] like preprocess3D/recover_image
(generate_artefacted_data.py:17-44).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _rescale01(x, eps: float = 1e-8):
    mn = jnp.min(x)
    mx = jnp.max(x)
    return (x - mn) / (mx - mn + eps)


# ------------------------------------------------------------------ bias
def random_bias_field(key, image_hw, coefficients: float = 0.5, order: int = 3):
    """Multiplicative exp-polynomial bias field (TorchIO RandomBiasField)."""
    h, w = image_hw.shape
    ys = jnp.linspace(-1.0, 1.0, h)[:, None]
    xs = jnp.linspace(-1.0, 1.0, w)[None, :]
    n_coeff = sum(1 for i in range(order + 1) for j in range(order + 1 - i))
    coeffs = jax.random.uniform(key, (n_coeff,), minval=-coefficients,
                                maxval=coefficients)
    field = jnp.zeros((h, w))
    k = 0
    for i in range(order + 1):
        for j in range(order + 1 - i):
            field = field + coeffs[k] * (ys ** i) * (xs ** j)
            k += 1
    return _rescale01(image_hw * jnp.exp(field))


# ----------------------------------------------------------------- spike
def random_spike(key, image_hw, num_spikes: int = 1,
                 intensity_range: Tuple[float, float] = (1.0, 3.0)):
    """k-space spike artifact (TorchIO RandomSpike defaults)."""
    h, w = image_hw.shape
    k_pos, k_int = jax.random.split(key)
    spectrum = jnp.fft.fftshift(jnp.fft.fft2(image_hw))
    max_mag = jnp.max(jnp.abs(spectrum))
    intensity = jax.random.uniform(k_int, (num_spikes,),
                                   minval=intensity_range[0],
                                   maxval=intensity_range[1])
    # spike positions away from the very center (which would just rescale)
    pos = jax.random.uniform(k_pos, (num_spikes, 2), minval=0.05, maxval=0.45)
    sign = jax.random.rademacher(jax.random.fold_in(k_pos, 1), (num_spikes, 2))
    ys = (h // 2 + (sign[:, 0] * pos[:, 0] * h)).astype(jnp.int32) % h
    xs = (w // 2 + (sign[:, 1] * pos[:, 1] * w)).astype(jnp.int32) % w
    spectrum = spectrum.at[ys, xs].add(max_mag * intensity)
    out = jnp.abs(jnp.fft.ifft2(jnp.fft.ifftshift(spectrum)))
    return _rescale01(out)


# --------------------------------------------------------------- ghosting
def random_ghosting(key, image_hw, num_ghosts_range: Tuple[int, int] = (4, 10),
                    intensity_range: Tuple[float, float] = (0.5, 1.0),
                    restore: float = 0.02, axis: Optional[int] = None):
    """Motion-ghost replicas by periodic k-space attenuation
    (TorchIO RandomGhosting defaults: num_ghosts (4,10), intensity (0.5,1))."""
    h, w = image_hw.shape
    k_n, k_i, k_a = jax.random.split(key, 3)
    num_ghosts = jax.random.randint(k_n, (), num_ghosts_range[0],
                                    num_ghosts_range[1] + 1)
    intensity = jax.random.uniform(k_i, (), minval=intensity_range[0],
                                   maxval=intensity_range[1])
    ax = (jax.random.randint(k_a, (), 0, 2) if axis is None
          else jnp.asarray(axis))
    spectrum = jnp.fft.fftshift(jnp.fft.fft2(image_hw))

    def modulate(along_axis):
        n = h if along_axis == 0 else w
        idx = jnp.arange(n)
        is_ghost_line = (idx % jnp.maximum(num_ghosts, 1)) == 0
        # spare the central low-frequency band
        center = n // 2
        keep = jnp.abs(idx - center) < jnp.maximum(1, (restore * n)).astype(jnp.int32)
        scale = jnp.where(is_ghost_line & ~keep, 1.0 - intensity, 1.0)
        shape = (n, 1) if along_axis == 0 else (1, n)
        return spectrum * scale.reshape(shape)

    spectrum = jnp.where(ax == 0, modulate(0), modulate(1))
    out = jnp.abs(jnp.fft.ifft2(jnp.fft.ifftshift(spectrum)))
    return _rescale01(out)


# ------------------------------------------------------------------ motion
def _translate_rotate(image_hw, dy, dx, theta):
    """Small rigid transform via Fourier shift + bilinear rotation."""
    h, w = image_hw.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    cos, sin = jnp.cos(-theta), jnp.sin(-theta)
    yy = cos * (ys - cy) - sin * (xs - cx) + cy - dy
    xx = sin * (ys - cy) + cos * (xs - cx) + cx - dx
    from cooperative_training_and_latent_space_data_augmentation_tpu.ops.augment import (
        warp_image,
    )

    return warp_image(image_hw[:, :, None], yy, xx)[:, :, 0]


def random_motion(key, image_hw, degrees: float = 30.0, translation: float = 10.0,
                  num_transforms: int = 2):
    """Motion artifact: k-space segments from differently-moved copies
    (TorchIO RandomMotion; reference uses degrees=30, translation=10,
    generate_artefacted_data.py:58)."""
    h, w = image_hw.shape
    keys = jax.random.split(key, num_transforms)
    spectra = [jnp.fft.fft2(image_hw)]
    for i in range(num_transforms):
        k1, k2, k3 = jax.random.split(keys[i], 3)
        theta = jax.random.uniform(k1, (), minval=-degrees, maxval=degrees) \
            * jnp.pi / 180.0
        dy = jax.random.uniform(k2, (), minval=-translation, maxval=translation)
        dx = jax.random.uniform(k3, (), minval=-translation, maxval=translation)
        moved = _translate_rotate(image_hw, dy, dx, theta)
        spectra.append(jnp.fft.fft2(moved))
    # stitch along the phase-encode (row) axis in random order of segments
    bounds = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 7),
                                         (num_transforms,), minval=0.1, maxval=0.9))
    rows = jnp.arange(h)[:, None] / h
    spectrum = spectra[0]
    for i in range(num_transforms):
        lo = bounds[i]
        hi = bounds[i + 1] if i + 1 < num_transforms else 1.1
        mask = ((rows >= lo) & (rows < hi)).astype(spectrum.dtype)
        spectrum = spectrum * (1 - mask) + spectra[i + 1] * mask
    out = jnp.abs(jnp.fft.ifft2(spectrum))
    return _rescale01(out)


CORRUPTIONS = {
    "RandomBias": random_bias_field,
    "RandomSpike": random_spike,
    "RandomGhosting": random_ghosting,
    "RandomMotion": random_motion,
}


def corrupt_volume(key, volume_nhw, name: str):
    """Apply one named corruption slice-wise to an (N, H, W) volume in [0,1]
    with ONE shared parameter draw across slices — volume-coherent artifacts,
    like the reference's single TorchIO transform per patient volume
    (generate_artefacted_data.py:66-110): the same bias field / spike
    position / ghost period / motion segments on every slice."""
    fn = CORRUPTIONS[name]
    return jax.vmap(lambda s: fn(key, s))(volume_nhw)


@partial(jax.jit, static_argnames=("name",))
def corrupt_volume_jit(key, volume_nhw, name: str):
    return corrupt_volume(key, volume_nhw, name)
