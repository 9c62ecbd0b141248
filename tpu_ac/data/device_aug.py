"""Device-side DINO multi-crop augmentation — one jitted program.

TPU-native redesign of ``DataAugmentationDINO``
(dino-main/main_dino.py:419-464).  The reference runs 2+L PIL transform
chains per image on host CPU; measured at ViT-S/16 smoke scale that host
pipeline sustains ~145 ms/batch with 10 threads while the fused device
step needs ~18 ms — training is augmentation-bound by ~8x (PERF.md
round-5 decomposition).  Here the host only decodes + square-resizes each
image once to a uint8 base, and ALL crop work runs inside one jitted
program: RandomResizedCrop box sampling (the torchvision 10-try /
center-fallback protocol), bicubic resample (``jax.image
.scale_and_translate`` — per-crop boxes become per-crop scale/translate
of a STATIC-shape resample, the XLA-friendly form of a dynamic crop),
horizontal flip, ColorJitter in random op order, random grayscale,
gaussian blur as row-normalized Toeplitz matmuls (MXU work, edge taps
renormalized like PIL), solarize, and normalization.

Distribution-level parity (PARITY.md #23): each op implements the
torchvision/PIL math (ImageEnhance blend formulas, HSV hue shift,
ImageOps.solarize at threshold 128, RandomResizedCrop.get_params), but
(a) crops are sampled from the square BASE resize instead of the
original-resolution image, (b) values stay float32 end-to-end where PIL
re-quantizes to uint8 between ops, and (c) the RNG streams differ — so
individual crops are not bit-comparable to the PIL path; their
distribution is.  The PIL path (``DINOAugmentation``) remains the
default; this is the ``--device_aug`` performance mode.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ac.data.mvtec import IMAGENET_MEAN, IMAGENET_STD

_RATIO = (3.0 / 4.0, 4.0 / 3.0)  # RandomResizedCrop default aspect range


@dataclasses.dataclass(frozen=True)
class DeviceAugConfig:
    global_crops_scale: tuple[float, float] = (0.4, 1.0)
    local_crops_scale: tuple[float, float] = (0.05, 0.4)
    local_crops_number: int = 8
    global_size: int = 224
    local_size: int = 96
    base_size: int = 256  # host-side square resize the crops sample from
    blur_kernel: int = 13  # taps; covers sigma<=2 (3*sigma + center)


# -- RandomResizedCrop.get_params (torchvision) ---------------------------

def _sample_boxes(key, n: int, size: int, scale: tuple[float, float]):
    """[n] crop boxes (top, left, h, w) on a size x size square image —
    the torchvision protocol: 10 area/aspect tries, first in-bounds one
    wins; fallback is the aspect-clamped center crop, which on a square
    input is the full image."""
    k_area, k_aspect, k_top, k_left = jax.random.split(key, 4)
    area = float(size * size)
    target = area * jax.random.uniform(
        k_area, (n, 10), minval=scale[0], maxval=scale[1])
    log_r = (np.log(_RATIO[0]), np.log(_RATIO[1]))
    aspect = jnp.exp(jax.random.uniform(
        k_aspect, (n, 10), minval=log_r[0], maxval=log_r[1]))
    cw = jnp.round(jnp.sqrt(target * aspect))
    ch = jnp.round(jnp.sqrt(target / aspect))
    valid = (cw > 0) & (ch > 0) & (cw <= size) & (ch <= size)
    first = jnp.argmax(valid, axis=1)  # first True (argmax of bools)
    any_valid = valid.any(axis=1)
    rows = jnp.arange(n)
    cw = cw[rows, first]
    ch = ch[rows, first]
    # randint(0, size - c) inclusive == floor(u * (size - c + 1))
    u_t = jax.random.uniform(k_top, (n,))
    u_l = jax.random.uniform(k_left, (n,))
    top = jnp.floor(u_t * (size - ch + 1.0))
    left = jnp.floor(u_l * (size - cw + 1.0))
    # square-input fallback: aspect 1 is inside (3/4, 4/3) -> full image
    full = jnp.full((n,), float(size))
    zero = jnp.zeros((n,))
    return (jnp.where(any_valid, top, zero),
            jnp.where(any_valid, left, zero),
            jnp.where(any_valid, ch, full),
            jnp.where(any_valid, cw, full))


def _crop_resize(img, top, left, ch, cw, out_size: int):
    """Bicubic resample of box (top, left, ch, cw) to out_size^2 — the
    static-shape XLA form of crop+resize (PIL crop().resize(BICUBIC))."""
    t = float(out_size)
    scale = jnp.stack([t / ch, t / cw])
    translation = jnp.stack([-top * t / ch, -left * t / cw])
    return jax.image.scale_and_translate(
        img, (3, out_size, out_size), (1, 2), scale, translation,
        method="cubic", antialias=True)


# -- ColorJitter (torchvision blend formulas) ------------------------------

def _grayscale(x):
    # torchvision rgb_to_grayscale weights
    return (0.2989 * x[0] + 0.587 * x[1] + 0.114 * x[2])[None]


def _rgb_to_hsv(x):
    r, g, b = x[0], x[1], x[2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    safe = jnp.where(d == 0, 1.0, d)
    h = jnp.where(
        mx == r, (g - b) / safe,
        jnp.where(mx == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe))
    h = jnp.where(d == 0, 0.0, h / 6.0) % 1.0
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return jnp.stack([h, s, mx])


def _hsv_to_rgb(hsv):
    h, s, v = hsv[0], hsv[1], hsv[2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b])


def _color_jitter_one(x, perm, fb, fc, fs, fh):
    """One crop [3,T,T] in [0,1]; the four adjustments in ``perm`` order
    (ColorJitter shuffles them) with torchvision's blend semantics:
    enhanced = f*img + (1-f)*degenerate, clamped."""

    def brightness(im):
        return jnp.clip(im * fb, 0.0, 1.0)

    def contrast(im):
        mean = jnp.mean(_grayscale(im))
        return jnp.clip(fc * im + (1.0 - fc) * mean, 0.0, 1.0)

    def saturation(im):
        return jnp.clip(fs * im + (1.0 - fs) * _grayscale(im), 0.0, 1.0)

    def hue(im):
        hsv = _rgb_to_hsv(jnp.clip(im, 0.0, 1.0))
        hsv = hsv.at[0].set((hsv[0] + fh) % 1.0)
        return _hsv_to_rgb(hsv)

    for step in range(4):
        x = jax.lax.switch(perm[step], [brightness, contrast,
                                        saturation, hue], x)
    return x


# -- Gaussian blur as Toeplitz matmuls -------------------------------------

def _blur_matrix(sigma, size: int, ktaps: int):
    """[size, size] row-normalized banded matrix of gaussian taps — edge
    rows renormalize over in-bounds taps (PIL's clamped-kernel edges)."""
    r = ktaps // 2
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    taps = jnp.exp(-0.5 * (offs / sigma) ** 2)
    idx = jnp.arange(size)
    d = idx[None, :] - idx[:, None]  # [out, in]
    w = jnp.where(jnp.abs(d) <= r,
                  taps[jnp.clip(d + r, 0, ktaps - 1)], 0.0)
    return w / jnp.sum(w, axis=1, keepdims=True)


def _blur_one(x, sigma, ktaps: int):
    m = _blur_matrix(sigma, x.shape[-1], ktaps)
    # separable: rows then cols, both MXU matmuls (square crops share m)
    return jnp.einsum("ab,cbd->cad", m, jnp.einsum("cab,db->cad", x, m))


# -- full per-slot crop pipeline -------------------------------------------

_MEAN = np.asarray(IMAGENET_MEAN, np.float32).reshape(3, 1, 1)
_STD = np.asarray(IMAGENET_STD, np.float32).reshape(3, 1, 1)


def _crop_slot(images, key, out_size: int, scale: tuple[float, float],
               blur_p: float, solarize_p: float, ktaps: int):
    """One crop per image for one slot: [B,3,S,S] f32 in [0,1] ->
    normalized [B,3,out,out]."""
    b = images.shape[0]
    (k_box, k_flip, k_japply, k_perm, k_fb, k_fc, k_fs, k_fh, k_gray,
     k_blurp, k_sigma, k_sol) = jax.random.split(key, 12)
    top, left, ch, cw = _sample_boxes(k_box, b, images.shape[-1], scale)
    crops = jax.vmap(_crop_resize, in_axes=(0, 0, 0, 0, 0, None))(
        images, top, left, ch, cw, out_size)
    crops = jnp.clip(crops, 0.0, 1.0)  # bicubic over/undershoot
    # flip p=0.5
    flip = jax.random.uniform(k_flip, (b,)) < 0.5
    crops = jnp.where(flip[:, None, None, None], crops[..., ::-1], crops)
    # color jitter p=0.8, random op order, torchvision factor ranges
    perm = jax.vmap(lambda k: jax.random.permutation(k, 4))(
        jax.random.split(k_perm, b))
    fb = jax.random.uniform(k_fb, (b,), minval=0.6, maxval=1.4)
    fc = jax.random.uniform(k_fc, (b,), minval=0.6, maxval=1.4)
    fs = jax.random.uniform(k_fs, (b,), minval=0.8, maxval=1.2)
    fh = jax.random.uniform(k_fh, (b,), minval=-0.1, maxval=0.1)
    jittered = jax.vmap(_color_jitter_one)(crops, perm, fb, fc, fs, fh)
    apply_j = jax.random.uniform(k_japply, (b,)) < 0.8
    crops = jnp.where(apply_j[:, None, None, None], jittered, crops)
    # grayscale p=0.2
    gray = jax.random.uniform(k_gray, (b,)) < 0.2
    crops = jnp.where(gray[:, None, None, None],
                      jnp.broadcast_to(jax.vmap(_grayscale)(crops),
                                       crops.shape), crops)
    # gaussian blur, sigma ~ U(0.1, 2) (utils.GaussianBlur radii)
    if blur_p > 0.0:
        sigma = jax.random.uniform(k_sigma, (b,), minval=0.1, maxval=2.0)
        blurred = jax.vmap(_blur_one, in_axes=(0, 0, None))(crops, sigma,
                                                            ktaps)
        if blur_p >= 1.0:
            crops = blurred
        else:
            do = jax.random.uniform(k_blurp, (b,)) < blur_p
            crops = jnp.where(do[:, None, None, None], blurred, crops)
    # solarize (ImageOps.solarize threshold 128)
    if solarize_p > 0.0:
        sol = jax.random.uniform(k_sol, (b,)) < solarize_p
        inverted = jnp.where(crops >= 128.0 / 255.0, 1.0 - crops, crops)
        crops = jnp.where(sol[:, None, None, None], inverted, crops)
    return (crops - _MEAN) / _STD


def device_multicrop(images_u8, key, cfg: DeviceAugConfig):
    """[B,3,S,S] uint8 base images + PRNG key -> (global_crops
    [2B,3,Tg,Tg], local_crops [L*B,3,Tl,Tl] or None), crop-major order
    like ``CropBatchPrefetcher._assemble`` (all first-globals, then all
    second-globals; locals slot-major)."""
    x = images_u8.astype(jnp.float32) / 255.0
    keys = jax.random.split(key, 2 + cfg.local_crops_number)
    g1 = _crop_slot(x, keys[0], cfg.global_size, cfg.global_crops_scale,
                    blur_p=1.0, solarize_p=0.0, ktaps=cfg.blur_kernel)
    g2 = _crop_slot(x, keys[1], cfg.global_size, cfg.global_crops_scale,
                    blur_p=0.1, solarize_p=0.2, ktaps=cfg.blur_kernel)
    g = jnp.concatenate([g1, g2])
    if cfg.local_crops_number == 0:
        return g, None
    locals_ = [
        _crop_slot(x, keys[2 + i], cfg.local_size, cfg.local_crops_scale,
                   blur_p=0.5, solarize_p=0.0, ktaps=cfg.blur_kernel)
        for i in range(cfg.local_crops_number)
    ]
    return g, jnp.concatenate(locals_)


def load_base_image(img, base_size: int) -> np.ndarray:
    """Host side: PIL image -> square uint8 base [3, base, base]
    (shorter-edge bilinear resize + center crop — one cheap resize per
    image; every crop after this happens on device).  A pre-decoded
    uint8 array of the right shape (a ``build_base_cache`` row) passes
    through untouched."""
    from PIL import Image

    if isinstance(img, np.ndarray):
        if (img.dtype != np.uint8
                or img.shape != (3, base_size, base_size)):
            raise ValueError(
                f"pre-decoded base image must be uint8 [3, {base_size}, "
                f"{base_size}], got {img.dtype} {img.shape}")
        return img
    w, h = img.size
    s = base_size / min(w, h)
    img = img.resize((max(base_size, int(round(w * s))),
                      max(base_size, int(round(h * s)))), Image.BILINEAR)
    w, h = img.size
    left = (w - base_size) // 2
    top = (h - base_size) // 2
    img = img.crop((left, top, left + base_size, top + base_size))
    return np.asarray(img.convert("RGB"), np.uint8).transpose(2, 0, 1)


def make_device_multicrop(cfg: DeviceAugConfig):
    """Jitted (images_u8 [B,3,S,S], key) -> (g, l) program."""
    return jax.jit(partial(device_multicrop, cfg=cfg))


def build_base_cache(dataset, base_size: int, cache_dir: str) -> np.ndarray:
    """Decode-once, memory-mapped uint8 base-image cache for the
    ``--device_aug`` training path.

    The reference re-decodes and re-augments every image every epoch in
    its DataLoader workers (dino-main/main_dino.py:145-154); with the aug
    on device, the only per-epoch host work left is the JPEG/PNG decode —
    at ImageNet scale that is the data-path bottleneck on decode-poor
    hosts (measured: the ViT-B/16 paper-recipe step is 103 ms on chip
    while 16 PNG decodes serialize ~10x that on a 1-vCPU host, PERF.md
    round 5).  This materializes ``load_base_image`` for the whole
    dataset ONCE into an ``open_memmap`` .npy ([N, 3, base, base] uint8,
    ~250 GB for full ImageNet at base 256 — page-cached, reused across
    runs) keyed by a digest of the exact ordered file list + base size,
    like ``load_imagenet``'s mmap cache (classification.py).
    """
    import hashlib
    import os

    paths = [p for p, _ in dataset.samples]
    digest = hashlib.sha1("\n".join(paths).encode()).hexdigest()[:12]
    os.makedirs(cache_dir, exist_ok=True)
    cache_path = os.path.join(
        cache_dir, f"dino_base_{len(paths)}_{base_size}_{digest}.npy")
    if not os.path.exists(cache_path):
        # per-process temp name: concurrent builders (multi-host runs on a
        # shared filesystem, or two jobs sharing one cache dir) must not
        # truncate each other's live memmap; every builder produces
        # identical bytes (keyed by the same ordered file list), so the
        # atomic os.replace is last-writer-wins and always consistent.
        # At ImageNet scale pre-build once (one process) to avoid every
        # host redundantly decoding the whole dataset.
        tmp_path = f"{cache_path}.tmp.{os.getpid()}"
        arr = np.lib.format.open_memmap(
            tmp_path, mode="w+", dtype=np.uint8,
            shape=(len(paths), 3, base_size, base_size))
        try:
            for i in range(len(paths)):
                img, _ = dataset[i]
                arr[i] = load_base_image(img, base_size)
            arr.flush()
        except BaseException:
            del arr
            os.unlink(tmp_path)
            raise
        del arr
        os.replace(tmp_path, cache_path)
    return np.load(cache_path, mmap_mode="r")
