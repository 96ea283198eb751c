"""CTAugment: control-theory augmentation policy (FixMatch).

Capability-parity rebuild of the reference's vendored CTAugment
(`code/augmentations/ctaugment.py:26-245`), which the reference wires
into its dataset (`dataset.py:67-68,135-140`) but never activates from
an entry script — provided here so the weak/strong augmentation path is
available. Differences from the reference are deliberate: randomness
comes from an explicit numpy Generator, and ops take/return float32
numpy images in [0, 1] (converted to PIL 'L' internally).

Semantics kept:
  * per-op binned rate vectors, init 1.0; update
    rate = rate·decay + proximity·(1−decay) at the chosen bin;
    sampling prob p = rate + (1−decay), normalized, thresholded at 0.85.
  * policy(depth=2): strong ops = first 11 registered, weak = the rest.
  * the same 20 ops with the same level→parameter mappings.
"""
from __future__ import annotations

from collections import namedtuple
from typing import Dict, List, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter, ImageOps

OP = namedtuple("OP", ("f", "bins"))
OPS: Dict[str, OP] = {}


def _register(*bins):
    def wrap(f):
        OPS[f.__name__] = OP(f, bins)
        return f

    return wrap


def to_pil(img: np.ndarray) -> Image.Image:
    arr = np.clip(img, 0.0, 1.0)
    return Image.fromarray((arr * 255).astype(np.uint8), mode="L")


def from_pil(img: Image.Image) -> np.ndarray:
    return np.asarray(img, np.float32) / 255.0


def _enhance(x, enhancer, level):
    return enhancer(x).enhance(0.1 + 1.9 * level)


def _blend_op(x, op, level):
    return Image.blend(x, op(x), level)


def _blend_filter(x, flt, level):
    return Image.blend(x, x.filter(flt), level)


# ---- strong ops (first 11) -------------------------------------------------
@_register(17)
def autocontrast(x, level):
    return _blend_op(x, ImageOps.autocontrast, level)


@_register(17)
def brightness(x, level):
    return _enhance(x, ImageEnhance.Brightness, level)


@_register(17)
def color(x, level):
    return _enhance(x, ImageEnhance.Color, level)


@_register(17)
def contrast(x, level):
    return _enhance(x, ImageEnhance.Contrast, level)


@_register(17)
def equalize(x, level):
    return _blend_op(x, ImageOps.equalize, level)


@_register(17)
def invert(x, level):
    return _blend_op(x, ImageOps.invert, level)


@_register(8)
def posterize(x, level):
    return ImageOps.posterize(x, 1 + int(level * 7.999))


@_register(17)
def solarize(x, level):
    return ImageOps.solarize(x, int(level * 255.999))


@_register(17)
def smooth(x, level):
    return _blend_filter(x, ImageFilter.SMOOTH, level)


@_register(17)
def blur(x, level):
    return _blend_filter(x, ImageFilter.BLUR, level)


@_register(17)
def sharpness(x, level):
    return _enhance(x, ImageEnhance.Sharpness, level)


# ---- weak ops --------------------------------------------------------------
@_register(17)
def cutout(x, level, rng=None):
    rng = rng or np.random.default_rng()
    size = 1 + int(level * min(x.size) * 0.499)
    w, h = x.size
    cy = int(rng.integers(w // 2, w))
    cx = int(rng.integers(w // 2, h))
    arr = np.array(x)
    y0, x0 = max(0, cy - size // 2), max(0, cx - size // 2)
    y1, x1 = min(w, cy + size // 2), min(h, cx + size // 2)
    arr[x0:x1, y0:y1] = 0
    return Image.fromarray(arr, mode=x.mode)


@_register()
def identity(x):
    return x


@_register(17, 6)
def rescale(x, scale, method):
    s = x.size
    scale *= 0.25
    crop = (scale * s[0], scale * s[1], s[0] * (1 - scale), s[1] * (1 - scale))
    methods = (
        Image.LANCZOS, Image.BICUBIC, Image.BILINEAR, Image.BOX,
        Image.HAMMING, Image.NEAREST,
    )
    return x.crop(crop).resize(x.size, methods[int(method * 5.99)])


@_register(17)
def rotate(x, level):
    return x.rotate(int(np.round((2 * level - 1) * 45)))


@_register(17)
def shear_x(x, level):
    return x.transform(x.size, Image.AFFINE, (1, (2 * level - 1) * 0.3, 0, 0, 1, 0))


@_register(17)
def shear_y(x, level):
    return x.transform(x.size, Image.AFFINE, (1, 0, 0, (2 * level - 1) * 0.3, 1, 0))


@_register(17)
def translate_x(x, level):
    return x.transform(x.size, Image.AFFINE, (1, 0, (2 * level - 1) * 0.3, 0, 1, 0))


@_register(17)
def translate_y(x, level):
    return x.transform(x.size, Image.AFFINE, (1, 0, 0, 0, 1, (2 * level - 1) * 0.3))


NUM_STRONG_OPS = 11


class CTAugment:
    """Policy learner (reference :39-103)."""

    def __init__(self, depth: int = 2, th: float = 0.85, decay: float = 0.99,
                 seed: int | None = None):
        self.depth = depth
        self.th = th
        self.decay = decay
        self.rng = np.random.default_rng(seed)
        self.rates = {
            k: tuple(np.ones(b, np.float32) for b in op.bins) for k, op in OPS.items()
        }

    def _rate_to_p(self, rate: np.ndarray) -> np.ndarray:
        p = rate + (1 - self.decay)
        p = p / p.max()
        p[p < self.th] = 0
        return p

    def policy(self, probe: bool, weak: bool) -> List[Tuple[str, List[float]]]:
        keys = list(OPS.keys())
        kl = keys[NUM_STRONG_OPS:] if weak else keys[:NUM_STRONG_OPS]
        out = []
        for _ in range(self.depth):
            k = kl[int(self.rng.integers(len(kl)))]
            bins = self.rates[k]
            rnd = self.rng.uniform(0, 1, len(bins))
            if probe:
                out.append((k, rnd.tolist()))
                continue
            vt = []
            for r, rate in zip(rnd, bins):
                p = self._rate_to_p(rate)
                value = int(self.rng.choice(p.shape[0], p=p / p.sum()))
                vt.append((value + r) / p.shape[0])
            out.append((k, vt))
        return out

    def update_rates(self, policy, proximity: float) -> None:
        for k, bins in policy:
            for b, rate in zip(bins, self.rates[k]):
                idx = int(b * len(rate) * 0.999)
                rate[idx] = rate[idx] * self.decay + proximity * (1 - self.decay)

    # -- persistence (reference StorableCTAugment.state_dict /
    # load_state_dict, augmentations/__init__.py:7-17): the learned
    # per-op rate vectors survive a training resume. --
    def state_dict(self) -> dict:
        from collections import OrderedDict

        return OrderedDict(
            (k, getattr(self, k)) for k in ("decay", "depth", "th", "rates")
        )

    def load_state_dict(self, state: dict) -> None:
        for k in ("decay", "depth", "th", "rates"):
            assert k in state, f"{k} not in {list(state.keys())}"
            setattr(self, k, state[k])

    def save(self, path: str) -> None:
        """JSON-serialize the learner state (rates as nested lists)."""
        import json
        import os

        sd = self.state_dict()
        sd["rates"] = {
            k: [np.asarray(r).tolist() for r in bins]
            for k, bins in sd["rates"].items()
        }
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sd, f)
        os.replace(tmp, path)

    def restore(self, path: str) -> None:
        import json

        with open(path) as f:
            sd = json.load(f)
        sd["rates"] = {
            k: tuple(np.asarray(r, np.float32) for r in bins)
            for k, bins in sd["rates"].items()
        }
        self.load_state_dict(sd)

    def stats(self) -> str:
        return "\n".join(
            "%-16s    %s" % (
                k,
                " / ".join(
                    " ".join("%.2f" % x for x in self._rate_to_p(rate))
                    for rate in self.rates[k]
                ),
            )
            for k in sorted(OPS.keys())
        )


def cta_apply(img: np.ndarray, ops: List[Tuple[str, List[float]]]) -> np.ndarray:
    """Apply a sampled policy to a float [0,1] grayscale image
    (augmentations/__init__.py cta_apply equivalent)."""
    if ops is None:
        return img
    pil = to_pil(img)
    for name, args in ops:
        pil = OPS[name].f(pil, *args)
    return from_pil(pil)
