"""Generate the committed image-dedup PNG fixtures under
tests/fixtures/png_dedup/ and print the aHash/banding ground truth.

Four images, seed-free (closed-form pixel functions): a gradient, a
NEAR-DUPLICATE of it (one brightened 6x6 patch), and two unrelated
patterns. The perceptual-hash pipeline (m08) must place exactly the
gradient pair within the near-dup Hamming radius. Every arithmetic
step here is integer-only so the printed hashes are bit-exact
reproducible — they are hard-coded into M08_SQL's VALUES oracle.

Run from the repo root: python tools/make_phash_fixtures.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from nlp_data_pipeline_spark.functions.png import encode_png
from nlp_data_pipeline_spark.operators.multimodal import (
    M08_BANDS,
    ahash64,
    hash_bands,
)


def gradient(w: int = 32, h: int = 32) -> np.ndarray:
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    r = (x * 255) // (w - 1)
    g = (y * 255) // (h - 1)
    b = ((x + y) * 255) // (w + h - 2)
    return np.concatenate(
        [np.broadcast_to(r, (h, w, 1)), np.broadcast_to(g, (h, w, 1)), b], axis=2
    ).astype(np.uint8)


def gradient_noisy() -> np.ndarray:
    """The near-duplicate: same gradient with one 6x6 patch brightened."""
    px = gradient().astype(np.int32)
    px[4:10, 20:26] = np.minimum(px[4:10, 20:26] + 90, 255)
    return px.astype(np.uint8)


def checker(w: int = 32, h: int = 32, sq: int = 4) -> np.ndarray:
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    return ((((x // sq) + (y // sq)) % 2) * 255).astype(np.uint8).reshape(h, w, 1)


def stripes(w: int = 24, h: int = 16) -> np.ndarray:
    y = np.arange(h)[:, None]
    v = ((y // 2) % 2) * 200 + 20
    return np.broadcast_to(v, (h, w)).astype(np.uint8).reshape(h, w, 1)


FIXTURES = {
    "grad_a.png": gradient(),
    "grad_a_noisy.png": gradient_noisy(),
    "checker.png": checker(),
    "stripes.png": stripes(),
}


def main() -> None:
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "tests", "fixtures", "png_dedup"
    )
    out_dir = os.path.normpath(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    hashes = {}
    for name, px in FIXTURES.items():
        filters = [y % 5 for y in range(px.shape[0])]
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(encode_png(px, filters))
        h = ahash64(px)
        hashes[name] = h
        signed = h - (1 << 64) if h >= (1 << 63) else h
        print(f"{name}: ahash={h:#018x} signed={signed} bands={hash_bands(h)}")

    names = sorted(hashes)
    print("\ncandidate pairs (sharing >=1 of the", M08_BANDS, "bands):")
    for i, f1 in enumerate(names):
        for f2 in names[i + 1 :]:
            shared = set(enumerate(hash_bands(hashes[f1]))) & set(
                enumerate(hash_bands(hashes[f2]))
            )
            ham = bin(hashes[f1] ^ hashes[f2]).count("1")
            if shared:
                print(f"  {f1} ~ {f2}: hamming={ham} shared_bands={sorted(shared)}")
            else:
                print(f"  ({f1} / {f2}: no shared band, hamming={ham})")


if __name__ == "__main__":
    main()
