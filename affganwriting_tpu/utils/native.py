"""ctypes bindings for the native preprocessing library (native/preprocess.cpp).

Build once with ``python -m affganwriting_tpu.utils.native build`` (one g++
invocation, OpenMP); the data pipeline picks it up automatically and falls
back to the pure-numpy implementations when the .so is absent.  Numerics
match data/words.py's ``preprocess_word_image`` and data/augment.py's
``elastic``/``rotate``/``shear`` (bilinear clamp-to-edge resampling).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_ROOT, "native", "preprocess.cpp")
_SO = os.path.join(_ROOT, "native", "libpreprocess.so")

_lib = None


def build(verbose: bool = True) -> str:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           _SRC, "-o", _SO]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return _SO


def load():
    """Returns the ctypes lib or None (absent / unloadable)."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.preprocess_words.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, ctypes.c_int, ctypes.c_int]
    lib.elastic_warp.argtypes = [
        f32p, f32p, ctypes.c_int, ctypes.c_int,
        f32p, f32p, ctypes.c_float, ctypes.c_float, ctypes.c_float]
    lib.affine_warp.argtypes = [
        f32p, f32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def preprocess_words_native(images: np.ndarray, out_h: int = 64,
                            out_w: int = 216) -> np.ndarray:
    """(N, H, W) uint8 -> (N, out_h, out_w) float32 in [-1, 1]."""
    lib = load()
    assert lib is not None, "native lib not built"
    images = np.ascontiguousarray(images, np.uint8)
    n, h, w = images.shape
    out = np.empty((n, out_h, out_w), np.float32)
    lib.preprocess_words(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, _f32p(out), out_h, out_w)
    return out


def elastic_native(img: np.ndarray, rng: np.random.Generator,
                   alpha: float = 1750.0, sigma: float = 45.0) -> np.ndarray:
    lib = load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float32)
    h, w = img.shape
    dx = np.ascontiguousarray(
        rng.uniform(-1, 1, size=(h, w)).astype(np.float32))
    dy = np.ascontiguousarray(
        rng.uniform(-1, 1, size=(h, w)).astype(np.float32))
    out = np.empty_like(img)
    lib.elastic_warp(_f32p(img), _f32p(out), h, w, _f32p(dx), _f32p(dy),
                     ctypes.c_float(alpha), ctypes.c_float(sigma),
                     ctypes.c_float(float(img.min())))
    return out


def affine_native(img: np.ndarray, degrees: float = 0.0,
                  shear: float = 0.0) -> np.ndarray:
    lib = load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float32)
    h, w = img.shape
    out = np.empty_like(img)
    lib.affine_warp(_f32p(img), _f32p(out), h, w,
                    ctypes.c_float(degrees), ctypes.c_float(shear),
                    ctypes.c_float(float(img.min())))
    return out


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "build":
        print("built:", build())
    else:
        print("available:", available())


def otsu_fg_mask_native(imgs: np.ndarray) -> "np.ndarray | None":
    """Batched Otsu fg masks ((B, H, W) [0,1] page, ink dark) -> {0,1}.
    None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    imgs = np.ascontiguousarray(imgs, np.float32)
    b, h, w = imgs.shape
    out = np.empty_like(imgs)
    lib.otsu_fg_mask_batch(_f32p(imgs), ctypes.c_int(b), ctypes.c_int(h),
                           ctypes.c_int(w), _f32p(out))
    return out


def grid_warp_native(imgs: np.ndarray, dy_nodes: np.ndarray,
                     dx_nodes: np.ndarray, cval: float = 1.0,
                     ) -> "np.ndarray | None":
    """Batched mesh warp: imgs (B, H, W), per-image node offsets
    (B, GH, GW).  None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    imgs = np.ascontiguousarray(imgs, np.float32)
    dy_nodes = np.ascontiguousarray(dy_nodes, np.float32)
    dx_nodes = np.ascontiguousarray(dx_nodes, np.float32)
    b, h, w = imgs.shape
    gh, gw = dy_nodes.shape[1:]
    out = np.empty_like(imgs)
    lib.grid_warp_batch(_f32p(imgs), ctypes.c_int(b), ctypes.c_int(h),
                        ctypes.c_int(w), _f32p(dy_nodes), _f32p(dx_nodes),
                        ctypes.c_int(gh), ctypes.c_int(gw),
                        ctypes.c_float(cval), _f32p(out))
    return out
