"""The _HAS_PIL=True dispatch branches in operators/multimodal.py.

pillow is not installable in this sandbox, so the pillow-present paths
(PNG chunk-validate-then-dispatch, GIF/JPEG routing past the stdlib
codecs, the final Image.open leg) would otherwise never execute. This
suite runs them in a SUBPROCESS with a minimal fake ``PIL`` module
injected into sys.modules BEFORE multimodal's import-time
``find_spec("PIL")`` probe — find_spec consults sys.modules first, so
the fake flips ``_HAS_PIL`` to True and every dispatch line runs for
real. The fake's ``Image.open`` decodes via the repo's own pure codecs,
which pillow matches bit-exactly on the lossless formats, so pixel
equality assertions stay meaningful. A subprocess keeps the fake out of
this session's interpreter (multimodal is already imported elsewhere
with the probe resolved False)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]

_SCRIPT = r"""
import importlib.machinery
import io
import sys
import types

import numpy as np

# ---- minimal fake PIL, installed BEFORE multimodal's import probe ----
pil = types.ModuleType("PIL")
pil.__spec__ = importlib.machinery.ModuleSpec("PIL", loader=None, is_package=True)
pil.__path__ = []
image_mod = types.ModuleType("PIL.Image")
image_mod.__spec__ = importlib.machinery.ModuleSpec("PIL.Image", loader=None)


class _Img:
    def __init__(self, arr):
        self._arr = arr

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def convert(self, mode):
        assert mode == "RGB", mode
        return self._arr


def _open(fp):
    payload = fp.read()
    # The repo's own codecs stand in for libpng/libjpeg — bit-exact for
    # the lossless formats, so equality checks below are real.
    from data_lake_medallion_architecture_project_spark.operators.gif import decode_gif
    from data_lake_medallion_architecture_project_spark.operators.jpeg import decode_jpeg
    from data_lake_medallion_architecture_project_spark.operators.multimodal import decode_png

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _Img(decode_png(payload))
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _Img(decode_gif(payload))
    if payload[:2] == b"\xff\xd8":
        return _Img(decode_jpeg(payload))
    raise ValueError("fake PIL: unsupported format")


image_mod.open = _open
pil.Image = image_mod
sys.modules["PIL"] = pil
sys.modules["PIL.Image"] = image_mod

from data_lake_medallion_architecture_project_spark.operators import multimodal as mm
from data_lake_medallion_architecture_project_spark.operators.gif import encode_gif
from data_lake_medallion_architecture_project_spark.operators.jpeg import encode_jpeg

assert mm._HAS_PIL is True, "fake PIL did not flip the import-time probe"

rng = np.random.default_rng(0)
px = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)

# PNG: pillow-present path validates the chunk stream FIRST, then routes
# through Image.open — and must return the same pixels as the stdlib leg.
assert np.array_equal(mm.decode_image(mm.encode_png(px)), px)

# Malformed PNG must be rejected by _walk_png_chunks BEFORE pillow sees
# it (acceptance must not be environment-dependent).
bad = bytearray(mm.encode_png(px))
bad[-5] ^= 0xFF  # corrupt the IEND CRC
try:
    mm.decode_image(bytes(bad))
    raise SystemExit("corrupt PNG accepted on the pillow path")
except ValueError:
    pass

# GIF and JPEG skip their stdlib branches when _HAS_PIL and land in
# Image.open.
gray = np.repeat(
    rng.integers(0, 250, (13, 19), dtype=np.uint8)[:, :, None], 3, axis=2
)
assert np.array_equal(mm.decode_image(encode_gif(gray)), gray)
out = mm.decode_image(encode_jpeg(px, quality=90))
assert out.shape == px.shape and out.dtype == np.uint8

# Unknown format reaches the Image.open leg (no stdlib NotImplementedError
# short-circuit when pillow is present).
try:
    mm.decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    raise SystemExit("unknown format did not reach the pillow leg")
except ValueError as exc:
    assert "fake PIL" in str(exc)

# BMP never dispatches to pillow (decoded before the probe is consulted).
assert np.array_equal(mm.decode_image(mm.encode_bmp(px)), px)

print("PIL-DISPATCH-OK")
"""


def test_pil_present_dispatch_branches_execute():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        cwd=_REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    assert "PIL-DISPATCH-OK" in proc.stdout
