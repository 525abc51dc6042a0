#!/usr/bin/env python
"""r15 verdict item 2: kernel-level decomposition of the progressive JPEG
entry — NO Spark, pure kernel timing over the actual sf corpus texts, so the
"codec-bound" claim is proven or broken with numbers instead of plan shape.

Phases timed separately per image batch:
  encode            pack text bytes -> SOF2 multi-scan file (what
                    documents_as_jpeg pays)
  decode.total      decode_jpeg wall
  decode.parse      marker walk up to first SOS (tables, alloc)
  decode.scan[k]    each _decode_sos call, keyed by (ss, se, ah, al)
  decode.recon      dequant + IDCT + reconstruct
  stats             px sum + md5 (what decode_image_stats adds)

Usage: python tools/r15_jpeg_profile.py [--sf /root/testdata/sf0.1]
       [--n 400] [--seq] [--cprofile]
"""

from __future__ import annotations

import argparse
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from fsql_spark.operators import jpeg  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--seq", action="store_true", help="sequential instead of progressive")
    ap.add_argument("--cprofile", action="store_true")
    args = ap.parse_args()

    tbl = pq.read_table(f"{args.sf}/documents.parquet", columns=["doc_id", "text"])
    texts = tbl.column("text").to_pylist()[: args.n]
    print(f"{len(texts)} docs, total chars {sum(len(t or '') for t in texts)}")

    import math

    blobs = []
    t0 = time.perf_counter()
    for text in texts:
        b = (text or "").encode("utf-8")
        n = max(1, math.ceil(len(b) / 16))
        padded = b.ljust(n * 16, b".")
        mat = np.frombuffer(padded, dtype=np.uint8).reshape(n, 16)
        arr = np.repeat(np.repeat(mat, 8, axis=0), 8, axis=1)
        blobs.append(jpeg.encode_jpeg(arr, quality=50, progressive=not args.seq))
    t_enc = time.perf_counter() - t0
    print(f"encode: {t_enc:.3f}s  ({sum(map(len, blobs))} bytes)")

    # --- instrument the decode internals ---
    scan_times: dict = defaultdict(float)
    scan_counts: dict = defaultdict(int)
    acc = {"parse": 0.0, "recon": 0.0, "destuff": 0.0}

    orig_sos = jpeg._decode_sos
    orig_recon = jpeg._reconstruct
    orig_destuff = jpeg._destuff_scan

    def sos(data, pos, frame, state, scan_sel, dc, ac, ri, ss, se, ah, al):
        t = time.perf_counter()
        out = orig_sos(data, pos, frame, state, scan_sel, dc, ac, ri, ss, se, ah, al)
        scan_times[(ss, se, ah, al)] += time.perf_counter() - t
        scan_counts[(ss, se, ah, al)] += 1
        return out

    def recon(frame, state, qtables):
        t = time.perf_counter()
        out = orig_recon(frame, state, qtables)
        acc["recon"] += time.perf_counter() - t
        return out

    def destuff(data, pos):
        t = time.perf_counter()
        out = orig_destuff(data, pos)
        acc["destuff"] += time.perf_counter() - t
        return out

    jpeg._decode_sos = sos
    jpeg._reconstruct = recon
    jpeg._destuff_scan = destuff
    try:
        t0 = time.perf_counter()
        for blob in blobs:
            jpeg.decode_jpeg(blob)
        t_dec = time.perf_counter() - t0
    finally:
        jpeg._decode_sos = orig_sos
        jpeg._reconstruct = orig_recon
        jpeg._destuff_scan = orig_destuff

    t_scans = sum(scan_times.values())
    print(f"decode: {t_dec:.3f}s  (scans {t_scans:.3f}s, recon {acc['recon']:.3f}s, "
          f"destuff-in-scans {acc['destuff']:.3f}s, "
          f"other/parse {t_dec - t_scans - acc['recon']:.3f}s)")
    for k in sorted(scan_times, key=lambda k: -scan_times[k]):
        ss, se, ah, al = k
        kind = ("DC first" if (ss, ah) == (0, 0) and se != 63 else
                "SEQ full" if (ss, se, ah) == (0, 63, 0) else
                "DC refine" if ss == 0 else
                "AC first" if ah == 0 else "AC refine")
        print(f"  scan ss={ss:2d} se={se:2d} ah={ah} al={al} [{kind:9s}] "
              f"{scan_times[k]:7.3f}s  x{scan_counts[k]}")

    # un-instrumented wall for the paired baseline number
    t0 = time.perf_counter()
    for blob in blobs:
        jpeg.decode_jpeg(blob)
    print(f"decode clean: {time.perf_counter() - t0:.3f}s")

    if args.cprofile:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        for blob in blobs[: max(len(blobs) // 4, 1)]:
            jpeg.decode_jpeg(blob)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
