"""Round-13 scale probes.

Measures, warm (3 passes, first discarded in the writeup):
  * the PII-scrub door END-TO-END (corpus-as-one-batch into a fresh
    TxnTable via ``scrub_batch_against_table`` — the same door-e2e form as
    the round-11 quality/excise door table, including the atomic merge
    commit) at 1x / 10x — VERDICT r12 item 8: the scrub door was the only
    door without an e2e throughput row;
  * the PNG decode hot path (``decode_image`` over the sf0.1 PNG payload
    catalog) — evidence for the r13 fix hoisting the per-payload failed
    ``from PIL import Image`` probe to a module-level find_spec flag
    (VERDICT r12 finding 1: +63% on image_dhash_catalog_png).

Build the scaled dir first (reuses the r12 one if present):
    python tools/make_scale10.py /root/testdata/sf0.1 /tmp/sfscale10_r12 10
Usage:
    python tools/probe_r13.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lake_medallion_architecture_project_spark.session import get_spark
from data_lake_medallion_architecture_project_spark.sources.readers import load_table
from data_lake_medallion_architecture_project_spark.storage import TxnTable
from data_lake_medallion_architecture_project_spark.streaming.scrub_ingest import (
    scrub_batch_against_table,
)

DECADES = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", "/tmp/sfscale10_r12"),
]

PROBE_ROOT = "/tmp/probe_r13"


def timeit(fn, passes: int = 3) -> list[float]:
    out = []
    for _ in range(passes):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 2))
    return out


def main() -> None:
    spark = get_spark("probe_r13")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(PROBE_ROOT, ignore_errors=True)

    # --- scrub door e2e (fresh TxnTable per pass, one-batch worst case) ---
    for tag, sf_dir in DECADES:
        if not os.path.isdir(sf_dir):
            print(f"{tag}: {sf_dir} missing — run tools/make_scale10.py first")
            continue
        docs = load_table(spark, sf_dir, "documents")
        n = docs.count()

        i = [0]

        def door_pass():
            i[0] += 1
            table = TxnTable(f"{PROBE_ROOT}/scrub_{tag}_{i[0]}")
            scrub_batch_against_table(
                spark, table, docs, "doc_id", "text", "probe", 0
            )

        ts = timeit(door_pass)
        warm = min(ts[1:])
        print(
            f"{tag} scrub door e2e ({n} docs): passes={ts} "
            f"warm={warm}s ({n / warm:.0f} docs/s)"
        )

    # --- PNG decode hot path (driver-side loop isolates the codec cost) ---
    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        decode_image,
        encode_png,
    )
    import numpy as np

    rng = np.random.default_rng(13)
    payloads = [
        encode_png(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))
        for _ in range(200)
    ]

    def decode_all():
        for p in payloads:
            decode_image(p)

    ts = timeit(decode_all)
    warm = min(ts[1:])
    print(
        f"decode_image over {len(payloads)} 64x64 PNGs: passes={ts} "
        f"warm={warm}s ({1000.0 * warm / len(payloads):.2f} ms/img)"
    )

    # --- per-codec encode/decode cost at CATALOG image sizes (16-28 px) ---
    from data_lake_medallion_architecture_project_spark.operators.gif import (
        decode_gif,
        encode_gif,
    )
    from data_lake_medallion_architecture_project_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from data_lake_medallion_architecture_project_spark.operators.multimodal import (
        _textured_pixels,
        decode_png,
    )

    imgs = [_textured_pixels(i, 1) for i in range(500)]
    codecs = {
        "png": (encode_png, decode_png),
        "gif(interlaced)": (lambda px: encode_gif(px, True), decode_gif),
        "jpeg(q90)": (lambda px: encode_jpeg(px, 90), decode_jpeg),
    }
    for name, (enc, dec) in codecs.items():
        t0 = time.perf_counter()
        payloads = [enc(px) for px in imgs]
        t_enc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for p in payloads:
            dec(p)
        t_dec = time.perf_counter() - t0
        print(
            f"{name}: encode {1000 * t_enc / len(imgs):.2f} ms/img, "
            f"decode {1000 * t_dec / len(imgs):.2f} ms/img "
            f"(catalog-size textured, single-core driver loop)"
        )
    # --- WARC pack+parse at 1x/10x (driver-side; the Spark stages add
    # only Arrow framing on top of exactly this work) ---
    from data_lake_medallion_architecture_project_spark.sources.warc import (
        build_warc_blob,
        parse_warc,
    )

    for tag, sf_dir in DECADES:
        if not os.path.isdir(sf_dir):
            continue
        rows = [
            (r["doc_id"], r["text"])
            for r in load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .collect()
        ]
        t0 = time.perf_counter()
        blob = build_warc_blob(rows)
        t_enc = time.perf_counter() - t0
        t0 = time.perf_counter()
        recs = parse_warc(blob)
        t_dec = time.perf_counter() - t0
        assert len(recs) == len(rows)
        print(
            f"{tag} warc ({len(rows)} docs): pack {t_enc:.2f}s, "
            f"parse {t_dec:.2f}s, blob {len(blob) >> 20} MiB"
        )
    shutil.rmtree(PROBE_ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
