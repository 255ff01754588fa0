"""Round-14 scale probes — driver-free single-core loops over the new
surface, following the "probe at 10× before claiming a scale shape" rule
(the discipline that caught both WARC quadratics in r13).

Measures, warm (3 passes, first discarded in the writeup):
  * AVI mux/demux per-video cost (DIB and MJPG codecs) at 1× / 10×
    video counts — the container walk must be linear in chunks;
  * WARC LF-only bulk parse at 5k / 50k records — regression guard for
    the round-14 CRLF-probe bound (the unbounded ``find(b"\\r\\n\\r\\n")``
    was quadratic on LF-only archives, the mirror image of the r13 LF
    bug on CRLF archives);
  * G.711 companding throughput (vectorized table path) at 1× / 10×
    clip counts;
  * median-cut quantizer per-image cost at catalog dims and at 256×256
    truecolor (the realistic photo-thumbnail case).

Usage:
    python tools/probe_r14.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lake_medallion_architecture_project_spark.operators.avi import decode_avi, encode_avi
from data_lake_medallion_architecture_project_spark.operators.gif import quantize_median_cut
from data_lake_medallion_architecture_project_spark.operators.multimodal import (
    _textured_frame_pixels,
    decode_wav,
    encode_wav_g711,
)
from data_lake_medallion_architecture_project_spark.sources.warc import (
    build_warc_record,
    parse_warc,
)


def _timeit(label: str, fn, passes: int = 3) -> None:
    for p in range(passes):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        print(f"{label} pass{p}: {dt:.3f}s")


def probe_avi() -> None:
    for scale, n_videos in (("1x", 50), ("10x", 500)):
        for codec in ("DIB ", "MJPG"):
            blobs = [
                encode_avi(
                    [_textured_frame_pixels(d, f) for f in range(4 + d % 5)],
                    codec=codec,
                )
                for d in range(n_videos)
            ]

            def run(blobs=blobs):
                for b in blobs:
                    decode_avi(b)

            _timeit(f"avi-demux[{codec.strip()}] {scale} ({n_videos} videos)", run)


def probe_warc_lf_only() -> None:
    for scale, n in (("1x", 5000), ("10x", 50000)):
        raw = b"".join(
            build_warc_record(i, f"body {i}").replace(b"\r\n", b"\n")
            for i in range(n)
        )

        def run(raw=raw, n=n):
            assert len(parse_warc(raw)) == n

        _timeit(f"warc-lf-only {scale} ({n} records)", run)


def probe_g711() -> None:
    i = np.arange(8000, dtype=np.int64)  # 1-second clips at 8 kHz
    for scale, n_clips in (("1x", 200), ("10x", 2000)):
        blobs = [
            encode_wav_g711(
                (((d * 31 + 7 * i * i + 13 * i) % 4001) - 2000).astype(np.int16)
            )
            for d in range(n_clips)
        ]

        def run(blobs=blobs):
            for b in blobs:
                decode_wav(b)

        _timeit(f"g711-decode {scale} ({n_clips} 1s clips)", run)


def probe_webp() -> None:
    from data_lake_medallion_architecture_project_spark.operators.webp import decode_webp, encode_webp

    for scale, n_imgs in (("1x", 100), ("10x", 1000)):
        imgs = [_textured_frame_pixels(d, 0) for d in range(n_imgs)]

        def enc(imgs=imgs):
            return [encode_webp(p, cache_bits=6) for p in imgs]

        _timeit(f"webp-encode {scale} ({n_imgs} catalog imgs)", enc)
        blobs = enc()

        def dec(blobs=blobs):
            for b in blobs:
                decode_webp(b)

        _timeit(f"webp-decode {scale} ({n_imgs} catalog imgs)", dec)


def probe_quantizer() -> None:
    rng = np.random.default_rng(0)
    small = [
        rng.integers(0, 256, (28, 20, 3), dtype=np.uint8) for _ in range(100)
    ]
    big = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)

    _timeit("quantize catalog-dims (100 imgs)", lambda: [quantize_median_cut(p) for p in small])
    _timeit("quantize 256x256 truecolor (1 img)", lambda: quantize_median_cut(big))


def probe_media_meta() -> None:
    from data_lake_medallion_architecture_project_spark.operators.mp3 import build_mp3, parse_mp3_metadata
    from data_lake_medallion_architecture_project_spark.operators.mp4 import build_mp4, parse_mp4_metadata

    for scale, n in (("1x", 500), ("10x", 5000)):
        mp4s = [
            build_mp4((2 + d % 7) * 600, 600, 320, 240, 24 + d % 40)
            for d in range(n)
        ]
        _timeit(f"mp4-meta {scale} ({n} blobs)", lambda b=mp4s: [parse_mp4_metadata(x) for x in b])
        mp3s = [build_mp3(40 + d % 80, 128, 44100, d % 50) for d in range(n)]
        _timeit(f"mp3-meta {scale} ({n} blobs)", lambda b=mp3s: [parse_mp3_metadata(x) for x in b])


if __name__ == "__main__":
    probe_warc_lf_only()
    probe_avi()
    probe_g711()
    probe_webp()
    probe_quantizer()
    probe_media_meta()
