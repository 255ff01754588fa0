"""Round-15 OPTIMIZATION codec probes — reproduces the numbers behind the
SCALE.md "VP8L codec constants re-measured" table and the scalar/vector
crossover that sets ``operators/webp.py:_VEC_MIN_PIXELS``.

Three measurements, all single-core warm loops (first pass discarded):

  * full-stack encode/decode per image on bench-corpus thumbnail shapes
    (the `_textured_pixels` family the catalog queries synthesize);
  * full-stack encode at 128² / 256² random-texture images (above the
    vectorized token pipeline's threshold);
  * the crossover scan: the SAME image encoded with the scalar path
    forced (threshold raised) vs the vectorized path forced (threshold
    zeroed), at sizes straddling the production threshold — also
    asserts byte identity between the two paths at every size, the
    invariant `tests/test_webp.py::
    test_scalar_and_vectorized_emit_paths_byte_identical` pins in CI.

Usage:
    python tools/probe_r15_codec.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lake_medallion_architecture_project_spark.operators import webp
from data_lake_medallion_architecture_project_spark.operators.multimodal import (
    _textured_pixels,
)

FULL = dict(predictor=True, cross_color=True, meta_prefix_bits=2)


def _loop(fn, k: int) -> float:
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(k):
        fn()
    return (time.perf_counter() - t0) / k


def main() -> None:
    thumbs = [_textured_pixels(i, 1) for i in range(200)]
    enc = _loop(lambda: [webp.encode_webp(p, **FULL) for p in thumbs], 2)
    outs = [webp.encode_webp(p, **FULL) for p in thumbs]
    dec = _loop(lambda: [webp.decode_webp(o) for o in outs], 2)
    print(f"thumbnails: encode {enc / len(thumbs) * 1e3:.2f} ms/img, "
          f"decode {dec / len(thumbs) * 1e3:.2f} ms/img")

    rng = np.random.default_rng(3)
    for side, k in ((128, 8), (256, 4)):
        img = rng.integers(0, 256, (side, side, 3)).astype(np.uint8)
        t = _loop(lambda: webp.encode_webp(img, **FULL), k)
        print(f"{side}x{side}: encode {t * 1e3:.1f} ms")

    print("crossover scan (scalar-forced vs vectorized-forced, same image):")
    saved = webp._VEC_MIN_PIXELS
    try:
        for side in (16, 32, 48, 64, 128):
            img = rng.integers(0, 256, (side, side, 3)).astype(np.uint8)
            k = max(2, 8192 // (side * side) * 4)
            webp._VEC_MIN_PIXELS = 1 << 30
            ts = _loop(lambda: webp.encode_webp(img, **FULL), k)
            scalar_bytes = webp.encode_webp(img, **FULL)
            webp._VEC_MIN_PIXELS = 0
            tv = _loop(lambda: webp.encode_webp(img, **FULL), k)
            assert webp.encode_webp(img, **FULL) == scalar_bytes, side
            print(f"  {side}x{side}: scalar {ts * 1e3:7.2f} ms  "
                  f"vector {tv * 1e3:7.2f} ms")
    finally:
        webp._VEC_MIN_PIXELS = saved
    print("byte identity across paths: OK at every probed size")


if __name__ == "__main__":
    main()
