"""On-device, XLA-fused, class-balanced image augmentation.

Replaces the reference's offline albumentations expansion
(``data_augmentation/src/augment_dataset.py:170-505`` driven by
``config/augmentation_config.yaml``) with a vmapped JAX pipeline that runs on
TPU. Exact bit-replication of 20+ stochastic OpenCV transforms is infeasible
(SURVEY §7.3); what is replicated is the *policy*: the transform set, their
probabilities and parameter limits, the cat-aggressive/dog-conservative
asymmetry, NEAREST mask warping with fill 0, and the composition order:

    HFlip → ShiftScaleRotate → RandomResizedCrop → CoarseDropout →
    OneOf[Elastic/Grid/Optical] → Perspective →
    OneOf[BrightnessContrast/HSV/RGBShift] → OneOf[CLAHE/Equalize/ToGray] →
    OneOf[GaussNoise/GaussianBlur/MotionBlur] → SaltPepper → ISONoise →
    OneOf[Shadow/SunFlare/Fog]

TPU-first design: all geometric transforms (flip, shift-scale-rotate, crop,
perspective) compose into ONE homography, the distortion family adds a
displacement field, and a single gather pass samples the result — bilinear
with REFLECT_101 borders for the image, nearest with fill 0 for the mask.
Pixel transforms are pure elementwise/`lax` ops that XLA fuses. Per-image
class asymmetry is handled by indexing stacked cat/dog parameter tables with
the class id — one code path, no host-side branching.

Images are float32 in [0, 1] (un-normalized); the trainer normalizes after
augmentation.
"""

from __future__ import annotations

import dataclasses
import functools
import warnings
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Policy tables (from data_augmentation/config/augmentation_config.yaml)
# Index 0 = cat (aggressive), index 1 = dog (conservative).
# ---------------------------------------------------------------------------

POLICY: Dict[str, Tuple[float, float]] = {
    "hflip_prob": (0.5, 0.5),
    "ssr_prob": (0.8, 0.5),
    "shift_limit": (0.1, 0.05),
    "scale_limit": (0.15, 0.1),
    "rotate_limit": (15.0, 10.0),
    "rrc_prob": (0.3, 0.2),
    "rrc_scale_min": (0.8, 0.9),
    "dropout_prob": (0.4, 0.3),
    "dropout_max": (45.0, 45.0),
    "distort_prob": (0.3, 0.2),           # OneOf[elastic/grid/optical]
    "elastic_alpha": (40.0, 30.0),
    "elastic_sigma": (4.0, 3.0),
    "grid_distort_limit": (0.2, 0.15),
    "optical_distort_limit": (0.2, 0.15),
    "perspective_prob": (0.3, 0.2),
    "perspective_scale": (0.1, 0.07),
    "color_prob": (0.8, 0.6),             # OneOf[bc/hsv/rgb]
    "brightness_limit": (0.176, 0.176),
    "contrast_lo": (-0.9, -0.9),
    "contrast_hi": (0.25, 0.25),
    "hue_shift": (10.0, 5.0),
    "sat_shift": (30.0, 20.0),
    "val_shift": (20.0, 15.0),
    "rgb_shift": (15.0, 10.0),
    "hist_prob": (0.3, 0.2),              # OneOf[clahe/equalize/gray]
    "noise_prob": (0.4, 0.3),             # OneOf[gauss/gblur/mblur]
    "gauss_var_max": (18.0, 18.0),
    "blur_sigma_max": (2.0, 2.0),
    "saltpepper_prob": (0.3, 0.2),
    "sp_amount_max": (0.18, 0.18),
    "iso_prob": (0.3, 0.2),
    "iso_intensity_max": (0.5, 0.3),
    "lighting_prob": (0.3, 0.2),          # OneOf[shadow/flare/fog]
    "fog_coef_max": (0.3, 0.2),
}


def policy_arrays(policy=None) -> Dict[str, jnp.ndarray]:
    """POLICY-style table → jnp arrays (a jit pytree argument: custom values
    apply without retracing; the structure is what the trace caches on)."""
    src = POLICY if policy is None else policy
    return {k: jnp.asarray(v, jnp.float32) for k, v in src.items()}


# Mapping from the reference YAML's nested keys → our flat policy table
# (data_augmentation/config/augmentation_config.yaml structure).
_YAML_KEYMAP = {
    "hflip_prob": ("horizontal_flip_prob",),
    "ssr_prob": ("shift_scale_rotate_prob",),
    "shift_limit": ("shift_limit",),
    "scale_limit": ("scale_limit",),
    "rotate_limit": ("rotate_limit",),
    "rrc_prob": ("random_resized_crop", "prob"),
    "rrc_scale_min": ("random_resized_crop", "scale", 0),
    "dropout_prob": ("coarse_dropout", "prob"),
    "dropout_max": ("coarse_dropout", "max_height"),
    "distort_prob": ("elastic_transform_prob",),
    "elastic_alpha": ("elastic", "alpha"),
    "elastic_sigma": ("elastic", "sigma"),
    "grid_distort_limit": ("grid_distortion", "distort_limit"),
    "optical_distort_limit": ("optical_distortion", "distort_limit"),
    "perspective_prob": ("perspective", "prob"),
    "perspective_scale": ("perspective", "scale", 1),
    "color_prob": ("color_transform_prob",),
    "brightness_limit": ("brightness_contrast", "brightness_limit"),
    "contrast_lo": ("brightness_contrast", "contrast_limit", 0),
    "contrast_hi": ("brightness_contrast", "contrast_limit", 1),
    "hue_shift": ("hsv", "hue_shift_limit"),
    "sat_shift": ("hsv", "sat_shift_limit"),
    "val_shift": ("hsv", "val_shift_limit"),
    "rgb_shift": ("rgb_shift", "r_shift_limit"),
    "hist_prob": ("clahe_equalize", "prob"),
    "noise_prob": ("noise_transform_prob",),
    "gauss_var_max": ("gauss_noise", "var_limit", 1),
    "saltpepper_prob": ("salt_pepper", "prob"),
    "sp_amount_max": ("salt_pepper", "salt_p", 1),
    "iso_prob": ("iso_noise", "prob"),
    "iso_intensity_max": ("iso_noise", "intensity", 1),
    "lighting_prob": ("lighting_transform_prob",),
    "fog_coef_max": ("fog", "fog_coef_upper"),
}


def load_policy_yaml(path) -> Dict[str, Tuple[float, float]]:
    """Build a policy table from a reference-format augmentation YAML.

    Keys absent from the YAML keep the built-in defaults. Mutates nothing;
    pass the result as the ``policy=`` argument of ``augment_batch`` /
    ``augment_and_normalize`` / ``augment_and_normalize_with_clip`` /
    ``augment_dataset_offline`` (it is a jit ARGUMENT, not a baked constant).
    Malformed entries (scalars where lists are expected, empty file) fall
    back to the defaults rather than raising.
    """
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f) or {}

    def lookup(tree, keypath):
        """Returns (present, value): ``present`` distinguishes a key that is
        absent (silent default) from one that is present but malformed
        (warned default) — a typo'd config must not train silently."""
        node = tree
        for i, k in enumerate(keypath):
            if isinstance(k, int):
                if not isinstance(node, (list, tuple)) or k >= len(node):
                    return (i > 0 and not isinstance(node, (list, tuple)), None)
                node = node[k]
            else:
                if not isinstance(node, dict) or k not in node:
                    return (i > 0 and not isinstance(node, dict), None)
                node = node[k]
        if isinstance(node, (int, float)) and not isinstance(node, bool):
            return True, float(node)
        return True, None

    policy = dict(POLICY)
    for our_key, keypath in _YAML_KEYMAP.items():
        default = POLICY[our_key]
        values = []
        for side, cls in ((0, "cat"), (1, "dog")):
            present, v = lookup(cfg.get(cls) or {}, keypath)
            if present and v is None:
                warnings.warn(
                    f"augmentation YAML: {cls}.{'.'.join(map(str, keypath))} "
                    f"is malformed; using default {default[side]}",
                    stacklevel=2,
                )
            values.append(v if v is not None else default[side])
        policy[our_key] = (values[0], values[1])
    return policy


# ---------------------------------------------------------------------------
# Geometry: homography composition + displacement field + one sampling pass
# ---------------------------------------------------------------------------


def _identity_h() -> jnp.ndarray:
    return jnp.eye(3, dtype=jnp.float32)


def _translate(tx, ty):
    h = jnp.eye(3, dtype=jnp.float32)
    return h.at[0, 2].set(tx).at[1, 2].set(ty)


def _scale_rotate(scale, angle_deg, cx, cy):
    """Rotation+scale about center (cx, cy); maps OUTPUT coords → SOURCE."""
    a = -angle_deg * jnp.pi / 180.0  # inverse rotation
    inv_s = 1.0 / scale
    cos, sin = jnp.cos(a) * inv_s, jnp.sin(a) * inv_s
    m = jnp.array(
        [[cos, -sin, 0.0], [sin, cos, 0.0], [0.0, 0.0, 1.0]], jnp.float32
    )
    return _translate(cx, cy) @ m @ _translate(-cx, -cy)


def _sample_homography(key, h, w, p) -> jnp.ndarray:
    """Compose flip / shift-scale-rotate / resized-crop in the reference's
    FORWARD order (flip first — augmentation_config.yaml order). Matrices
    map output→source, so the forward chain img = rrc(ssr(flip(x))) composes
    as ``H = M_flip @ M_ssr @ M_rrc`` — each later forward op RIGHT-multiplies.
    """
    k1, k2, k3, k4, k5, k6, k7, k8 = jax.random.split(key, 8)
    H = _identity_h()

    # Horizontal flip: x_src = (w-1) - x_out
    do_flip = jax.random.uniform(k1) < p["hflip_prob"]
    flip = jnp.array([[-1.0, 0.0, w - 1.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
                     jnp.float32)
    H = jnp.where(do_flip, H @ flip, H)

    # ShiftScaleRotate
    do_ssr = jax.random.uniform(k2) < p["ssr_prob"]
    shift = jax.random.uniform(k3, (2,), minval=-1.0, maxval=1.0) * p["shift_limit"]
    scale = 1.0 + jax.random.uniform(k4, minval=-1.0, maxval=1.0) * p["scale_limit"]
    angle = jax.random.uniform(k5, minval=-1.0, maxval=1.0) * p["rotate_limit"]
    ssr = (
        _scale_rotate(scale, angle, (w - 1) / 2, (h - 1) / 2)
        @ _translate(-shift[0] * w, -shift[1] * h)
    )
    H = jnp.where(do_ssr, H @ ssr, H)

    # RandomResizedCrop: crop a random sub-box, resize back to full frame.
    do_rrc = jax.random.uniform(k6) < p["rrc_prob"]
    area = jax.random.uniform(k7, minval=p["rrc_scale_min"], maxval=1.0)
    side = jnp.sqrt(area)
    max_off = 1.0 - side
    off = jax.random.uniform(k8, (2,), minval=0.0, maxval=1.0) * max_off
    # out (0..w-1) → src: src = off*w + x_out * side
    rrc = jnp.array(
        [[side, 0.0, off[0] * w], [0.0, side, off[1] * h], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    H = jnp.where(do_rrc, H @ rrc, H)
    return H


def _perspective_h(key, h, w, p) -> jnp.ndarray:
    """Small random perspective as corner jitter (albumentations-style)."""
    k1, k2 = jax.random.split(key)
    do = jax.random.uniform(k1) < p["perspective_prob"]
    jitter = jax.random.uniform(k2, (8,), minval=-1.0, maxval=1.0) * p[
        "perspective_scale"
    ]
    # Perturb the projective row + mild affine terms.
    eps_x = jitter[0] / w
    eps_y = jitter[1] / h
    P = jnp.array(
        [
            [1.0 + jitter[2] * 0.1, jitter[3] * 0.1, jitter[4] * 0.05 * w],
            [jitter[5] * 0.1, 1.0 + jitter[6] * 0.1, jitter[7] * 0.05 * h],
            [eps_x * 0.5, eps_y * 0.5, 1.0],
        ],
        jnp.float32,
    )
    return jnp.where(do, P, _identity_h())


def _displacement_field(key, h, w, p) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """OneOf[elastic / grid distortion / optical distortion] as (dy, dx)."""
    k_gate, k_pick, k1, k2, k3 = jax.random.split(key, 5)
    do = jax.random.uniform(k_gate) < p["distort_prob"]
    pick = jax.random.randint(k_pick, (), 0, 3)

    # Elastic: coarse gaussian noise field upsampled (smooth by construction),
    # scaled by alpha. Coarse grid 16x16 ≈ gaussian sigma ~ h/16 smoothing.
    g = 16
    coarse = jax.random.normal(k1, (2, g, g)) * p["elastic_alpha"] / 8.0
    elastic = jax.image.resize(coarse, (2, h, w), method="linear")

    # Grid distortion: per-cell random stretch = coarse field of offsets.
    # Per-axis scaling: dy in units of cell height, dx of cell WIDTH.
    n_steps = 5
    cell = jax.random.uniform(k2, (2, n_steps, n_steps), minval=-1.0, maxval=1.0)
    axis_scale = jnp.array([h, w], jnp.float32).reshape(2, 1, 1) / n_steps
    grid = jax.image.resize(cell * p["grid_distort_limit"] * axis_scale * 0.5,
                            (2, h, w), method="linear")

    # Optical (radial) distortion: dr = k * r^3 normalized.
    yy = (jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2) / h
    xx = (jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2) / w
    ys, xs = jnp.meshgrid(yy, xx, indexing="ij")
    r2 = ys * ys + xs * xs
    kk = jax.random.uniform(k3, minval=-1.0, maxval=1.0) * p["optical_distort_limit"]
    optical = jnp.stack([ys * r2 * kk * h, xs * r2 * kk * w])

    field = jax.lax.switch(
        pick, [lambda: elastic, lambda: grid, lambda: optical]
    )
    field = jnp.where(do, field, jnp.zeros_like(field))
    return field[0], field[1]


def _reflect101(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """OpenCV BORDER_REFLECT_101 coordinate folding."""
    period = 2.0 * (size - 1)
    c = jnp.abs(coord) % period
    return jnp.where(c > size - 1, period - c, c)


def warp_pair(
    image: jnp.ndarray, mask: jnp.ndarray, H: jnp.ndarray,
    dy: jnp.ndarray, dx: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One gather pass: image bilinear/REFLECT_101, mask nearest/fill-0."""
    h, w = image.shape[:2]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    src = jnp.einsum("ij,jhw->ihw", H, jnp.stack([gx, gy, ones]))
    sx = src[0] / src[2] + dx
    sy = src[1] / src[2] + dy

    # --- image: bilinear, reflect101 ---
    rx = _reflect101(sx, w)
    ry = _reflect101(sy, h)
    x0 = jnp.clip(jnp.floor(rx), 0, w - 1)
    y0 = jnp.clip(jnp.floor(ry), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = (rx - x0)[..., None]
    wy = (ry - y0)[..., None]
    x0i, x1i, y0i, y1i = (a.astype(jnp.int32) for a in (x0, x1, y0, y1))

    def g(yi, xi):
        return image[yi, xi]

    img = (
        g(y0i, x0i) * (1 - wy) * (1 - wx)
        + g(y0i, x1i) * (1 - wy) * wx
        + g(y1i, x0i) * wy * (1 - wx)
        + g(y1i, x1i) * wy * wx
    )

    # --- mask: nearest, out-of-bounds → 0 (albumentations fill 0) ---
    nx = jnp.round(sx).astype(jnp.int32)
    ny = jnp.round(sy).astype(jnp.int32)
    inside = (nx >= 0) & (nx < w) & (ny >= 0) & (ny < h)
    nxc = jnp.clip(nx, 0, w - 1)
    nyc = jnp.clip(ny, 0, h - 1)
    m = jnp.where(inside, mask[nyc, nxc], 0)
    return img, m


# ---------------------------------------------------------------------------
# Pixel-level transforms (image only)
# ---------------------------------------------------------------------------


def _rgb_to_hsv(img):
    return jnp.stack(_rgb_to_hsv_tuple(img), axis=-1)


def _rgb_to_hsv_tuple(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn + 1e-12
    h = jnp.where(
        mx == r, (g - b) / d % 6.0, jnp.where(mx == g, (b - r) / d + 2.0, (r - g) / d + 4.0)
    ) / 6.0
    s = d / (mx + 1e-12)
    return h % 1.0, s, mx


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    pp = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, pp, pp, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, pp, pp])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [pp, pp, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _lut_from_hist(hist: jnp.ndarray, clip_limit: float = 0.0) -> jnp.ndarray:
    """Equalization LUT from a 256-bin histogram.

    clip_limit>0 applies CLAHE-style contrast limiting (global approximation
    of the reference's 8x8-tile CLAHE — policy-level equivalence)."""
    if clip_limit > 0:
        cap = clip_limit * jnp.mean(hist)
        excess = jnp.sum(jnp.maximum(hist - cap, 0.0))
        hist = jnp.minimum(hist, cap) + excess / 256.0
    cdf = jnp.cumsum(hist)
    cdf = (cdf - cdf[0]) / jnp.maximum(cdf[-1] - cdf[0], 1.0)
    return cdf  # 256-entry LUT in [0,1]


def _equalize_lut(channel_u8: jnp.ndarray, clip_limit: float = 0.0) -> jnp.ndarray:
    """Histogram-equalization LUT for one uint8-valued channel."""
    hist = jnp.bincount(channel_u8.reshape(-1), length=256).astype(jnp.float32)
    return _lut_from_hist(hist, clip_limit)


def _gaussian_blur(img, sigma, ksize: int = 9):
    half = ksize // 2
    xs = jnp.arange(ksize, dtype=jnp.float32) - half
    sig = jnp.maximum(sigma, 1e-3)
    k = jnp.exp(-(xs**2) / (2 * sig**2))
    k = k / jnp.sum(k)
    # separable depthwise blur via conv on (1,H,W,C)
    x = img[None]
    c = img.shape[-1]
    kh = jnp.tile(k[:, None, None, None], (1, 1, 1, c))
    kw = jnp.tile(k[None, :, None, None], (1, 1, 1, c))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(half, half), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (half, half)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return x[0]


def _motion_blur(img, key):
    """3-tap directional blur in one of 4 random directions."""
    direction = jax.random.randint(key, (), 0, 4)
    kernels = jnp.zeros((4, 3, 3), jnp.float32)
    kernels = kernels.at[0, 1, :].set(1 / 3)       # horizontal
    kernels = kernels.at[1, :, 1].set(1 / 3)       # vertical
    kernels = kernels.at[2].set(jnp.eye(3) / 3)    # diagonal
    kernels = kernels.at[3].set(jnp.fliplr(jnp.eye(3)) / 3)
    k = kernels[direction]
    c = img.shape[-1]
    kk = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        img[None], kk, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return out[0]


def _smooth_field(key, h, w, grid: int = 8):
    coarse = jax.random.uniform(key, (grid, grid))
    return jax.image.resize(coarse, (h, w), method="linear")


# ---------------------------------------------------------------------------
# The per-image augmenter
# ---------------------------------------------------------------------------


def augment_one(
    key: jax.Array,
    image: jnp.ndarray,   # (H, W, 3) float32 in [0,1]
    mask: jnp.ndarray,    # (H, W) int32
    class_idx: jnp.ndarray,  # () int32: 0=cat, 1=dog
    policy: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    p = {k: v[class_idx] for k, v in policy.items()}
    h, w = image.shape[:2]
    keys = jax.random.split(key, 24)

    # ---- geometric: compose into one homography + displacement ----
    H = _sample_homography(keys[0], h, w, p)
    H = H @ _perspective_h(keys[1], h, w, p)
    dy, dx = _displacement_field(keys[2], h, w, p)
    image, mask = warp_pair(image, mask, H, dy, dx)

    # ---- coarse dropout (image only per albumentations default fill=0) ----
    do_drop = jax.random.uniform(keys[3]) < p["dropout_prob"]
    dh = jax.random.uniform(keys[4]) * p["dropout_max"]
    dw = jax.random.uniform(keys[5]) * p["dropout_max"]
    cy = jax.random.uniform(keys[6]) * h
    cx = jax.random.uniform(keys[7]) * w
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    hole = (jnp.abs(yy - cy) < dh / 2) & (jnp.abs(xx - cx) < dw / 2)
    image = jnp.where((do_drop & hole)[..., None], 0.0, image)

    # ---- OneOf color: brightness-contrast / hsv / rgb-shift ----
    do_color = jax.random.uniform(keys[8]) < p["color_prob"]
    pick_c = jax.random.randint(keys[9], (), 0, 3)
    bright = jax.random.uniform(keys[10], minval=-1.0, maxval=1.0) * p["brightness_limit"]
    contrast = 1.0 + jax.random.uniform(
        keys[11], minval=p["contrast_lo"], maxval=p["contrast_hi"]
    )
    img_bc = jnp.clip(image * contrast + bright, 0.0, 1.0)
    hsv = _rgb_to_hsv(image)
    shifts = jax.random.uniform(keys[12], (3,), minval=-1.0, maxval=1.0)
    hsv = hsv.at[..., 0].add(shifts[0] * p["hue_shift"] / 360.0)
    hsv = hsv.at[..., 1].add(shifts[1] * p["sat_shift"] / 255.0)
    hsv = hsv.at[..., 2].add(shifts[2] * p["val_shift"] / 255.0)
    hsv = hsv.at[..., 0].set(hsv[..., 0] % 1.0)
    img_hsv = jnp.clip(_hsv_to_rgb(jnp.clip(hsv, 0.0, 1.0)), 0.0, 1.0)
    rgb_off = jax.random.uniform(keys[13], (3,), minval=-1.0, maxval=1.0) * (
        p["rgb_shift"] / 255.0
    )
    img_rgb = jnp.clip(image + rgb_off, 0.0, 1.0)
    colored = jax.lax.switch(pick_c, [lambda: img_bc, lambda: img_hsv, lambda: img_rgb])
    image = jnp.where(do_color, colored, image)

    # ---- OneOf hist: CLAHE / equalize / to-gray ----
    do_hist = jax.random.uniform(keys[14]) < p["hist_prob"]
    pick_h = jax.random.randint(keys[15], (), 0, 3)
    u8 = jnp.clip(image * 255.0, 0, 255).astype(jnp.int32)

    # ONE histogram per channel (bincount scatters are expensive on TPU);
    # both the CLAHE and plain-equalize LUTs derive from it.
    def apply_luts():
        clahe_ch, eq_ch = [], []
        for c in range(3):
            hist = jnp.bincount(
                u8[..., c].reshape(-1), length=256
            ).astype(jnp.float32)
            clahe_ch.append(_lut_from_hist(hist, 4.0)[u8[..., c]])
            eq_ch.append(_lut_from_hist(hist, 0.0)[u8[..., c]])
        return jnp.stack(clahe_ch, axis=-1), jnp.stack(eq_ch, axis=-1)

    img_clahe, img_eq = apply_luts()
    gray = (0.299 * image[..., 0] + 0.587 * image[..., 1] + 0.114 * image[..., 2])
    img_gray = jnp.repeat(gray[..., None], 3, axis=-1)
    histed = jax.lax.switch(
        pick_h, [lambda: img_clahe, lambda: img_eq, lambda: img_gray]
    )
    image = jnp.where(do_hist, histed, image)

    # ---- OneOf noise: gaussian noise / gaussian blur / motion blur ----
    do_noise = jax.random.uniform(keys[16]) < p["noise_prob"]
    pick_n = jax.random.randint(keys[17], (), 0, 3)
    var = jax.random.uniform(keys[18]) * p["gauss_var_max"]
    std = jnp.sqrt(var) / 255.0
    img_gn = jnp.clip(image + std * jax.random.normal(keys[19], image.shape), 0, 1)
    sigma = jax.random.uniform(keys[20]) * p["blur_sigma_max"]
    img_gb = _gaussian_blur(image, sigma)
    img_mb = _motion_blur(image, keys[21])
    noised = jax.lax.switch(pick_n, [lambda: img_gn, lambda: img_gb, lambda: img_mb])
    image = jnp.where(do_noise, noised, image)

    # ---- salt & pepper, ISO noise, lighting (keys reused via fold_in) ----
    k_sp, k_iso, k_light = (jax.random.fold_in(keys[22], i) for i in range(3))
    sp1, sp2, sp3, sp4 = jax.random.split(k_sp, 4)
    do_sp = jax.random.uniform(sp1) < p["saltpepper_prob"]
    amount = jax.random.uniform(sp2) * p["sp_amount_max"] * 0.5
    u = jax.random.uniform(sp3, image.shape[:2])
    salt = (u < amount / 2)[..., None]
    pepper = (u > 1.0 - amount / 2)[..., None]
    image = jnp.where(do_sp & salt, 1.0, image)
    image = jnp.where(do_sp & pepper, 0.0, image)

    i1, i2, i3 = jax.random.split(k_iso, 3)
    do_iso = jax.random.uniform(i1) < p["iso_prob"]
    intensity = jax.random.uniform(i2) * p["iso_intensity_max"]
    luma = (0.299 * image[..., 0] + 0.587 * image[..., 1] + 0.114 * image[..., 2])
    iso = image + (intensity * 0.1) * jnp.sqrt(jnp.maximum(luma, 1e-4))[..., None] \
        * jax.random.normal(i3, image.shape)
    image = jnp.where(do_iso, jnp.clip(iso, 0, 1), image)

    l1, l2, l3, l4 = jax.random.split(k_light, 4)
    do_light = jax.random.uniform(l1) < p["lighting_prob"]
    pick_l = jax.random.randint(l2, (), 0, 3)
    field = _smooth_field(l3, h, w)
    shadow_mask = jnp.clip((field - 0.5) * 2.0, 0.0, 1.0)[..., None]
    img_shadow = image * (1.0 - 0.5 * shadow_mask)
    flare_mask = jnp.clip((field - 0.6) * 2.5, 0.0, 1.0)[..., None]
    img_flare = jnp.clip(image + 0.6 * flare_mask, 0, 1)
    fog_coef = jax.random.uniform(l4) * p["fog_coef_max"]
    img_fog = image * (1 - fog_coef) + fog_coef
    lit = jax.lax.switch(
        pick_l, [lambda: img_shadow, lambda: img_flare, lambda: img_fog]
    )
    image = jnp.where(do_light, lit, image)

    return image, mask


@jax.jit
def _augment_batch_jit(key, images, masks, class_indices, policy):
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda k, i, m, c: augment_one(k, i, m, c, policy))(
        keys, images, masks, class_indices
    )


def augment_batch(
    key: jax.Array,
    images: jnp.ndarray,      # (B, H, W, 3) float32 [0,1]
    masks: jnp.ndarray,       # (B, H, W) int32
    class_indices: jnp.ndarray,  # (B,) int32 0=cat 1=dog
    policy=None,              # POLICY-style table (e.g. load_policy_yaml)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vmapped batch augmentation; one fused XLA program on device.

    ``policy`` defaults to the built-in table; a custom table (same keys,
    e.g. from ``load_policy_yaml``) is a jit ARGUMENT, so its values take
    effect on every call — not a baked-in trace constant.
    """
    return _augment_batch_jit(key, images, masks, class_indices,
                              policy_arrays(policy))


# Canonical values live in data/loader.py — one source for the loader's
# host normalization, this on-device path, and visualization's denormalize.
from unet_implementations_tpu.data.loader import (  # noqa: E402
    IMAGENET_MEAN as _IMAGENET_MEAN_NP,
    IMAGENET_STD as _IMAGENET_STD_NP,
)

IMAGENET_MEAN = jnp.asarray(_IMAGENET_MEAN_NP)
IMAGENET_STD = jnp.asarray(_IMAGENET_STD_NP)


def _augment_by_mask_class(key, images01, masks, policy):
    """Shared online-path core: derive class ids from masks (1 present →
    cat), run the policy-routed batch augmentation. Returns [0,1] pixels.
    Accepts raw uint8 images (the loader's ``emit_uint8`` starvation fix,
    ``ops/normalize.py``) — converted to [0,1] in-graph."""
    from unet_implementations_tpu.ops.normalize import normalize_image

    images01 = normalize_image(images01, mode="unit")
    masks = masks.astype(jnp.int32)
    has_cat = jnp.any(masks == 1, axis=(1, 2))
    class_idx = jnp.where(has_cat, 0, 1).astype(jnp.int32)
    return _augment_batch_jit(key, images01, masks, class_idx, policy)


@jax.jit
def _augment_and_normalize_jit(key, images01, masks, policy):
    img, m = _augment_by_mask_class(key, images01, masks, policy)
    img = (img - IMAGENET_MEAN) / IMAGENET_STD
    return img, m


def augment_and_normalize(
    key: jax.Array,
    images01: jnp.ndarray,   # (B, H, W, 3) float32 in [0,1] (normalize=False loader)
    masks: jnp.ndarray,      # (B, H, W) int32
    policy=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Online training-path augmentation: augment → ImageNet-normalize.

    One fused device program per batch — the north-star "on-device XLA-fused
    input pipeline". Class ids derive from mask contents (1 present → cat),
    matching the offline router (``class_index_for``). Replaces the
    reference's offline 5×/2× expansion with per-epoch stochastic transforms
    of the same policy (class balance is instead handled by the per-class
    aggressiveness, or by keeping the offline expansion — both supported).
    ``policy`` is a jit argument (see ``augment_batch``).
    """
    return _augment_and_normalize_jit(key, images01, masks,
                                      policy_arrays(policy))


@functools.partial(jax.jit, static_argnames=("clip_size",))
def _augment_and_normalize_clip_jit(key, images01, masks, policy,
                                    clip_size=224):
    from unet_implementations_tpu.ops.resize import resize_bilinear

    img, m = _augment_by_mask_class(key, images01, masks, policy)
    clip_img = resize_bilinear(img, (clip_size, clip_size), spatial_axes=(1, 2))
    img = (img - IMAGENET_MEAN) / IMAGENET_STD
    clip_img = (clip_img - IMAGENET_MEAN) / IMAGENET_STD
    return img, m, clip_img


def augment_and_normalize_with_clip(
    key: jax.Array,
    images01: jnp.ndarray,
    masks: jnp.ndarray,
    clip_size: int = 224,
    policy=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``augment_and_normalize`` that also emits the CLIP-sized view of the
    AUGMENTED pixels (the live-extraction online path for CLIP_UNet).

    The reference extracts CLIP features per batch from pre-resized 224²
    copies of the same (offline-augmented) image (``CLIP_UNet/src/
    train.py:714-719``); with on-device augmentation the 224² view is the
    bilinear resize of the augmented 512² square — equivalent to the
    reference Dataset's on-the-fly fallback resize (``CLIP_UNet/src/
    train.py:275-282``). ImageNet normalization on the clip view preserves
    the reference quirk (ImageNet stats, not CLIP's own).
    """
    return _augment_and_normalize_clip_jit(
        key, images01, masks, policy_arrays(policy), clip_size=clip_size
    )


# ---------------------------------------------------------------------------
# Offline expansion (CLI parity with augment_dataset.py)
# ---------------------------------------------------------------------------


def class_index_for(mask: np.ndarray, filename: str) -> int:
    """0=cat, 1=dog — mask values first, filename breeds as fallback
    (``augment_dataset.py:506-557``)."""
    vals = np.unique(mask)
    if 1 in vals:
        return 0
    if 2 in vals:
        return 1
    from unet_implementations_tpu.data.pipeline import is_cat_image

    return 0 if is_cat_image(filename) else 1


def augment_dataset_offline(
    data_dir,
    cat_augmentations: int = 5,
    dog_augmentations: int = 2,
    seed: int = 42,
    batch_size: int = 8,
    policy=None,
    verbose: bool = True,
):
    """Expand Train/{resized,resized_label} into Train/augmented/{images,masks}.

    Same outputs as the reference offline pipeline (``{stem}_aug{i}.jpg/png``
    + ``augmentation_report.txt``) but the transforms run on the accelerator.
    """
    import cv2
    from pathlib import Path
    from PIL import Image

    data_dir = Path(data_dir)
    img_dir = data_dir / "Train" / "resized"
    mask_dir = data_dir / "Train" / "resized_label"
    out_img = data_dir / "Train" / "augmented" / "images"
    out_mask = data_dir / "Train" / "augmented" / "masks"
    out_img.mkdir(parents=True, exist_ok=True)
    out_mask.mkdir(parents=True, exist_ok=True)

    files = sorted(img_dir.glob("*.jpg"))
    stats = {"cat": 0, "dog": 0, "errors": 0, "outputs": 0}
    key = jax.random.key(seed)

    queue = []  # (img, mask, cls_idx, out_stem)
    def flush():
        nonlocal key
        if not queue:
            return
        imgs = jnp.asarray(np.stack([q[0] for q in queue]), jnp.float32)
        msks = jnp.asarray(np.stack([q[1] for q in queue]), jnp.int32)
        clss = jnp.asarray(np.asarray([q[2] for q in queue]), jnp.int32)
        key, sub = jax.random.split(key)
        aug_i, aug_m = augment_batch(sub, imgs, msks, clss, policy=policy)
        aug_i = np.clip(np.asarray(aug_i) * 255.0, 0, 255).astype(np.uint8)
        aug_m = np.asarray(aug_m).astype(np.uint8)
        for (_, _, _, stem), ai, am in zip(queue, aug_i, aug_m):
            cv2.imwrite(str(out_img / f"{stem}.jpg"),
                        cv2.cvtColor(ai, cv2.COLOR_RGB2BGR))
            Image.fromarray(am).save(out_mask / f"{stem}.png")
            stats["outputs"] += 1
        queue.clear()

    for f in files:
        mask_path = mask_dir / f"{f.stem}.png"
        try:
            img = cv2.cvtColor(cv2.imread(str(f)), cv2.COLOR_BGR2RGB)
            mask = np.array(Image.open(mask_path))
            if mask.ndim > 2:
                mask = mask[:, :, 0]
        except Exception as e:
            if verbose:
                print(f"skip {f.name}: {e}")
            stats["errors"] += 1
            continue
        cls_idx = class_index_for(mask, f.stem)
        n = cat_augmentations if cls_idx == 0 else dog_augmentations
        stats["cat" if cls_idx == 0 else "dog"] += 1
        img_f = img.astype(np.float32) / 255.0
        for i in range(n):
            queue.append((img_f, mask.astype(np.int32), cls_idx, f"{f.stem}_aug{i}"))
            if len(queue) >= batch_size:
                flush()
    flush()

    report = data_dir / "Train" / "augmented" / "augmentation_report.txt"
    report.write_text(
        "Augmentation report (on-device JAX pipeline)\n"
        f"source images: {len(files)}\n"
        f"cat images: {stats['cat']} x{cat_augmentations}\n"
        f"dog images: {stats['dog']} x{dog_augmentations}\n"
        f"outputs written: {stats['outputs']}\n"
        f"errors: {stats['errors']}\n"
    )
    if verbose:
        print(report.read_text())
    return stats
