"""Generate the committed deterministic PNG fixtures under
tests/fixtures/png/.

Three images, seed-free (closed-form pixel functions), each encoded
with a ROTATING per-row filter (y % 5) so every PNG unfilter path
(None/Sub/Up/Average/Paeth) is exercised by decode
(functions/png.py). Prints the integer channel sums that
m07_png_pixel_stats' VALUES oracle pins.
"""

from __future__ import annotations

import os

import numpy as np

import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from nlp_data_pipeline_spark.functions.png import decode_png, encode_png


def gradient_rgb(w: int = 16, h: int = 9) -> np.ndarray:
    """RGB: red ramps with x, green with y, blue diagonal."""
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    r = (x * 255) // max(w - 1, 1)
    g = (y * 255) // max(h - 1, 1)
    b = ((x + y) * 255) // max(w + h - 2, 1)
    return np.concatenate(
        [np.broadcast_to(r, (h, w, 1)), np.broadcast_to(g, (h, w, 1)), b], axis=2
    ).astype(np.uint8)


def checker_gray(w: int = 8, h: int = 8) -> np.ndarray:
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    return (((x + y) % 2) * 255).astype(np.uint8).reshape(h, w, 1)


def rings_rgba(w: int = 12, h: int = 5) -> np.ndarray:
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    d2 = (x - w // 2) ** 2 + (y - h // 2) ** 2
    r = (d2 * 7) % 256
    g = (d2 * 13) % 256
    b = (d2 * 29) % 256
    a = np.full_like(d2, 255) - (d2 % 32)
    return np.stack([r, g, b, a], axis=2).astype(np.uint8)


FIXTURES = {
    "gradient_rgb.png": gradient_rgb(),
    "checker_gray.png": checker_gray(),
    "rings_rgba.png": rings_rgba(),
}


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    outdir = os.path.join(here, "..", "tests", "fixtures", "png")
    os.makedirs(outdir, exist_ok=True)
    for name, pixels in FIXTURES.items():
        h = pixels.shape[0]
        filters = [y % 5 for y in range(h)]  # rotate through all 5 filters
        payload = encode_png(pixels, filters)
        w2, h2, c2, back = decode_png(payload)
        assert back.shape == pixels.shape and (back == pixels).all(), name
        with open(os.path.join(outdir, name), "wb") as fh:
            fh.write(payload)
        sums = pixels.reshape(-1, pixels.shape[2]).astype(np.int64).sum(axis=0)
        print(
            f"{name}: {w2}x{h2}x{c2}, {len(payload)} bytes, "
            f"pixel_sum={int(sums.sum())}, ch0_sum={int(sums[0])}, "
            f"ch_last_sum={int(sums[-1])}"
        )


if __name__ == "__main__":
    main()
