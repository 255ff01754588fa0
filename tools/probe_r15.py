"""Round-15 scale probes — driver-free single-core loops over the new
surface, following the "probe at 10× before claiming a scale shape"
rule.

Measures, warm (3 passes, first discarded in the writeup):
  * VP8L predictor-transform encode and decode per-image cost at
    1× / 10× catalog-image counts — the decoder's inverse is a
    scan-order Python recurrence, so its per-pixel constant is the
    number to publish honestly;
  * MP4 triage on the new worst-case layout (audio track first + edit
    list) at 1× / 10× blob counts — the hdlr gate and elst walk must
    stay header-hop-priced;
  * MP3 triage across MPEG-1 / 2 / 2.5 headers at 1× / 10×.

Usage:
    python tools/probe_r15.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lake_medallion_architecture_project_spark.operators.mp3 import (
    _SAMPLE_RATE_TABLES,
    build_mp3,
    parse_mp3_metadata,
)
from data_lake_medallion_architecture_project_spark.operators.mp4 import (
    build_mp4,
    parse_mp4_metadata,
)
from data_lake_medallion_architecture_project_spark.operators.multimodal import (
    _textured_pixels,
)
from data_lake_medallion_architecture_project_spark.operators.webp import (
    decode_webp,
    encode_webp,
)


def _timeit(label: str, fn, passes: int = 3) -> None:
    for p in range(passes):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        print(f"{label} pass{p}: {dt:.3f}s")


def probe_webp_predictor() -> None:
    for scale, n in (("1x", 100), ("10x", 1000)):
        imgs = [_textured_pixels(d, 1) for d in range(n)]
        blobs = [encode_webp(px, predictor=True) for px in imgs]
        _timeit(
            f"vp8l predictor encode {scale} ({n} imgs)",
            lambda imgs=imgs: [encode_webp(px, predictor=True) for px in imgs],
        )
        _timeit(
            f"vp8l predictor decode {scale} ({n} imgs)",
            lambda blobs=blobs: [decode_webp(b) for b in blobs],
        )


def probe_webp_full_stack() -> None:
    """The complete real-cwebp layout: subtract-green + predictor +
    cross-color + color cache + two-group meta-prefix."""
    kw = dict(predictor=True, cross_color=True, meta_prefix_bits=2,
              cache_bits=6)
    for scale, n in (("1x", 100), ("10x", 1000)):
        imgs = [_textured_pixels(d, 1) for d in range(n)]
        blobs = [encode_webp(px, **kw) for px in imgs]
        _timeit(
            f"vp8l full-stack encode {scale} ({n} imgs)",
            lambda imgs=imgs: [encode_webp(px, **kw) for px in imgs],
        )
        _timeit(
            f"vp8l full-stack decode {scale} ({n} imgs)",
            lambda blobs=blobs: [decode_webp(b) for b in blobs],
        )


def probe_mp4() -> None:
    for scale, n in (("1x", 500), ("10x", 5000)):
        blobs = []
        for d in range(n):
            ts = 600 + 300 * (d % 5)
            dur = (2 + d % 7) * ts
            blobs.append(
                build_mp4(
                    dur, ts, 320, 240, 24 + d % 40,
                    audio_first=True,
                    edit_entries=[(10 + d % 50, -1), (dur, 0)],
                )
            )
        _timeit(
            f"mp4 triage audio-first+elst {scale} ({n} blobs)",
            lambda blobs=blobs: [parse_mp4_metadata(b) for b in blobs],
        )


def probe_mp3() -> None:
    for scale, n in (("1x", 500), ("10x", 5000)):
        blobs = []
        for d in range(n):
            vsel = d % 3
            version = ("1", "2", "2.5")[vsel]
            br = 128 if vsel == 0 else 64
            blobs.append(
                build_mp3(
                    40 + d % 80, br, _SAMPLE_RATE_TABLES[version][d % 3],
                    version=version,
                )
            )
        _timeit(
            f"mp3 triage mpeg-1/2/2.5 {scale} ({n} blobs)",
            lambda blobs=blobs: [parse_mp3_metadata(b) for b in blobs],
        )


if __name__ == "__main__":
    probe_webp_predictor()
    probe_webp_full_stack()
    probe_mp4()
    probe_mp3()
