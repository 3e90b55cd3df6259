"""Distributional validation of the intensity bias fields vs the reference.

The reference's field constructions (intensity_transform.py:272-546) are
lifted here in pure numpy/scipy/PIL (the reference module itself imports
skimage, absent in this image, for its unused CLAHE class) and compared to
the JAX builders on the statistics that define the augmentation's effect:

  * field mean (should be ~1: multiplicative identity on average)
  * field std (fluctuation amplitude)
  * clip fraction at 1 +/- magnitude (saturation frequency)
  * spatial autocorrelation at fixed lags (correlation length)

V1 quirk documented at ops/augment._V1_REALIZED_GAIN: the torch code's
``Image.fromarray(float32, mode='L')`` reinterprets float bytes as uint8, so
the REALIZED reference fields are byte-noise-driven; with the intended 'F'
mode the field degenerates to a constant.  Parity targets the realized
distribution (that is what trained the published models); the degenerate
intended math is asserted too, as documentation.
"""

import warnings

import numpy as np
import pytest
import jax

from scipy.ndimage import gaussian_filter
from scipy.interpolate import RectBivariateSpline

from cooperative_training_and_latent_space_data_augmentation_tpu.ops.augment import (
    POLICIES,
    bias_field_v1_field,
    bias_field_v2_field,
    replace,
)

H = W = 224
N_DRAWS = 60
LAGS = (16, 32, 64, 96)


# ---------------------------------------------------------------------------
# lifted reference constructions (cited file:line throughout)
# ---------------------------------------------------------------------------


def ref_v1_field(rng, realized: bool, magnitude=0.3, max_sigma=16.0,
                 control_points=(2, 4, 8)):
    """MyRandomPurtarbation field (intensity_transform.py:300-345)."""
    from PIL import Image

    total = np.zeros((H, W))
    for cp in sorted(control_points):
        field = np.float32(rng.uniform(0, 1, (cp, cp)))
        field = gaussian_filter(field, min(2.0 * cp, max_sigma))
        if realized:
            # Image.fromarray(float32, mode='L') byte-reinterpretation,
            # reproduced explicitly (the mode= arg is deprecated in PIL 12).
            im = Image.frombuffer("L", (cp, cp), field.tobytes()[: cp * cp],
                                  "raw", "L", 0, 1)
        else:
            im = Image.fromarray(field, mode="F")
        interp = np.array(im.resize((H, W), resample=Image.BICUBIC),
                          dtype=np.float32)
        interp = interp / (1.0 * interp.sum() * cp + 1e-12)
        total = total + interp
    total = gaussian_filter(total, max_sigma)
    total = total / (1.0 * total.sum() + 1e-12) * H * W
    return np.clip(total, 1 - magnitude, 1 + magnitude)


def ref_v2_field(rng, magnitude=0.3, spacing=64):
    """MyRandomPurtarbationV2 field (intensity_transform.py:420-520).

    The torch class hardcodes spacing=[64] (line 405); scipy smoothing
    bivariate spline s=3, kx=ky=3."""
    h = int(round(H + spacing * 1.5))
    xmax = h // 2
    x = np.arange(-xmax, xmax + 1, spacing)
    knots = 1 + np.float32(rng.uniform(-magnitude, magnitude, (len(x), len(x))))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        spl = RectBivariateSpline(x, x, knots, s=3, kx=3, ky=3)
        z = spl(np.arange(-xmax, xmax), np.arange(-xmax, xmax))
    field = z / (1.0 * z.sum() + 1e-12) * h * h
    off = (h - H) // 2
    return np.clip(field[off:h - off, off:h - off], 1 - magnitude, 1 + magnitude)


# ---------------------------------------------------------------------------
# statistics
# ---------------------------------------------------------------------------


def field_stats(fields, magnitude):
    fields = np.stack(fields).astype(np.float64)
    f = fields - fields.mean(axis=(1, 2), keepdims=True)
    var = (f * f).mean()
    ac = {lag: float((f[:, :, :-lag] * f[:, :, lag:]).mean() / (var + 1e-12))
          for lag in LAGS}
    return {
        "mean": float(fields.mean()),
        "std": float(fields.std()),
        "clip_lo": float((fields <= 1 - magnitude + 1e-6).mean()),
        "clip_hi": float((fields >= 1 + magnitude - 1e-6).mean()),
        "ac": ac,
    }


def assert_stats_match(got, want, what, std_rtol=0.2, clip_atol=0.06,
                       ac_atol=0.15):
    assert abs(got["mean"] - want["mean"]) < 0.02, (what, got, want)
    assert abs(got["std"] - want["std"]) <= std_rtol * max(want["std"], 0.02), \
        (what, "std", got["std"], want["std"])
    for k in ("clip_lo", "clip_hi"):
        assert abs(got[k] - want[k]) < clip_atol, (what, k, got[k], want[k])
    for lag in LAGS:
        assert abs(got["ac"][lag] - want["ac"][lag]) < ac_atol, \
            (what, f"autocorr@{lag}", got["ac"][lag], want["ac"][lag])


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

V1_POLICY = replace(POLICIES["ACDC_affine_perturb"],
                    multi_control_points=(2, 4, 8), max_sigma=16.0,
                    perturb_magnitude=0.3)
V2_POLICY = replace(POLICIES["ACDC_affine_perturb_v2"],
                    ms_control_point_spacing=(64, 1),
                    perturb_v2_magnitude=0.3)


def _jax_fields(builder, policy):
    fn = jax.jit(lambda k: builder(k, H, W, policy))
    keys = jax.random.split(jax.random.PRNGKey(7), N_DRAWS)
    return [np.asarray(fn(k)) for k in keys]


def test_v1_intended_math_is_degenerate():
    """With the intended PIL mode ('F'), the reference V1 field is constant:
    evidence that the byte-reinterpretation IS the augmentation."""
    rng = np.random.RandomState(0)
    s = field_stats([ref_v1_field(rng, realized=False) for _ in range(10)], 0.3)
    assert s["std"] < 1e-3 and abs(s["mean"] - 1) < 1e-3


def test_v1_field_matches_realized_reference():
    rng = np.random.RandomState(0)
    want = field_stats([ref_v1_field(rng, realized=True)
                        for _ in range(N_DRAWS)], 0.3)
    got = field_stats(_jax_fields(bias_field_v1_field, V1_POLICY), 0.3)
    assert_stats_match(got, want, "bias_field_v1")


def test_v2_field_matches_reference():
    rng = np.random.RandomState(1)
    want = field_stats([ref_v2_field(rng) for _ in range(N_DRAWS)], 0.3)
    got = field_stats(_jax_fields(bias_field_v2_field, V2_POLICY), 0.3)
    assert_stats_match(got, want, "bias_field_v2")


@pytest.mark.parametrize("builder,policy,mag", [
    (bias_field_v1_field, V1_POLICY, 0.3),
    (bias_field_v2_field, V2_POLICY, 0.3),
])
def test_fields_bounded_and_identityish(builder, policy, mag):
    """Every draw stays within [1-mag, 1+mag] and near-unit mean."""
    fields = np.stack(_jax_fields(builder, policy))
    assert fields.min() >= 1 - mag - 1e-5
    assert fields.max() <= 1 + mag + 1e-5
    assert abs(fields.mean() - 1.0) < 0.03
