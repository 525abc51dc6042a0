"""Pure stdlib+numpy YUV4MPEG2 (Y4M) video codec.

Y4M is the real, public, uncompressed video interchange format used by
ffmpeg / mjpegtools / VP9+AV1 test corpora: an ASCII stream header
(``YUV4MPEG2 W<w> H<h> F<num>:<den> ...``) followed by ``FRAME`` records
of raw planar YUV. That makes it the one genuine video container this
environment can decode with zero external codecs — closing the video leg
of the multimodal surface with a REAL format rather than only the
engine's synthetic FVID container. No counterpart in the reference (fsql
has no multimodal surface); the driver brief mandates the video plumbing.

Scope (loud refusal outside it):

- Colorspaces ``Cmono`` (luma only), ``C420``/``C420jpeg``/``C420mpeg2``
  /``C420paldv`` (chroma quartered; the siting tag variants share a
  layout), and ``C444``. Other tags (C422, 10-bit ``p10`` variants)
  raise NotImplementedError naming the tag.
- Interlacing tags other than progressive (``Ip``) are refused.

Frames decode to uint8 luma arrays (n_frames, H, W) plus optional
chroma; compressed containers (MP4/WebM/...) still raise
NotImplementedError from :func:`fsql_spark.operators.multimodal.
sample_video_frames` naming the format.
"""

from __future__ import annotations

import numpy as np

from .codecs import CodecError

Y4M_MAGIC = b"YUV4MPEG2"

#: colorspace tag -> (chroma divisor x, chroma divisor y) or None for mono
_COLORSPACES = {
    "mono": None,
    "420": (2, 2),
    "420jpeg": (2, 2),
    "420mpeg2": (2, 2),
    "420paldv": (2, 2),
    "444": (1, 1),
}


def decode_y4m(data: bytes):
    """Decode a Y4M byte string -> dict with ``width``, ``height``,
    ``fps_num``, ``fps_den``, ``colorspace``, ``y`` ((n, H, W) uint8) and
    ``u``/``v`` ((n, Hc, Wc) uint8, absent for mono). Refuses corrupt
    structure with :class:`CodecError` and out-of-scope tags with
    NotImplementedError."""
    if not data.startswith(Y4M_MAGIC + b" "):
        raise CodecError("not a YUV4MPEG2 stream (bad magic)")
    nl = data.find(b"\n")
    if nl < 0:
        raise CodecError("Y4M: unterminated stream header")
    width = height = None
    fps_num, fps_den = 0, 1
    colorspace = "420jpeg"  # the format's documented default
    try:
        for tok in data[len(Y4M_MAGIC) + 1 : nl].decode("ascii", "replace").split():
            tag, val = tok[0], tok[1:]
            if tag == "W":
                width = int(val)
            elif tag == "H":
                height = int(val)
            elif tag == "F":
                num, den = val.split(":")
                fps_num, fps_den = int(num), int(den)
            elif tag == "C":
                colorspace = val
            elif tag == "I" and val not in ("p", ""):
                raise NotImplementedError(f"Y4M: interlacing 'I{val}' not supported")
            # A (aspect) and X (extensions) are informational — ignored
    except (ValueError, IndexError) as exc:  # non-numeric W/H/F, bare F
        raise CodecError(f"Y4M: malformed stream-header token: {exc}") from exc
    if width is None or height is None or width <= 0 or height <= 0:
        raise CodecError("Y4M: missing or non-positive W/H in stream header")
    if colorspace not in _COLORSPACES:
        raise NotImplementedError(f"Y4M: colorspace C{colorspace} not supported")
    chroma = _COLORSPACES[colorspace]
    y_size = width * height
    if chroma:
        cw, ch = -(-width // chroma[0]), -(-height // chroma[1])
        c_size = cw * ch
    else:
        cw = ch = c_size = 0
    frame_size = y_size + 2 * c_size

    body = data[nl + 1 :]
    record = 6 + frame_size  # b"FRAME\n" + planes
    # fast path: bare FRAME headers make every record fixed-width, so the
    # whole stream parses as ONE reshape + slice — no per-frame Python.
    # A video is one frame per moment; a loop per frame is a loop per
    # pixel-row-of-time and dominated the profile (~30x on long clips).
    if len(body) % record == 0 and (
        np.frombuffer(body, dtype=np.uint8).reshape(-1, record)[:, :6]
        == np.frombuffer(b"FRAME\n", dtype=np.uint8)
    ).all():
        mat = np.frombuffer(body, dtype=np.uint8).reshape(-1, record)[:, 6:]
        n = mat.shape[0]
        ymat = mat[:, :y_size].reshape(n, height, width)
        umat = mat[:, y_size : y_size + c_size].reshape(n, ch, cw) if chroma else None
        vmat = mat[:, y_size + c_size :].reshape(n, ch, cw) if chroma else None
    else:  # general path: FRAME headers may carry parameters
        ys, us, vs = [], [], []
        pos = nl + 1
        while pos < len(data):
            fnl = data.find(b"\n", pos)
            if fnl < 0 or data[pos : pos + 5] != b"FRAME":
                raise CodecError(f"Y4M: expected FRAME header at byte {pos}")
            pos = fnl + 1
            raw = data[pos : pos + frame_size]
            if len(raw) != frame_size:
                raise CodecError("Y4M: truncated frame payload")
            ys.append(np.frombuffer(raw[:y_size], dtype=np.uint8).reshape(height, width))
            if chroma:
                us.append(
                    np.frombuffer(raw[y_size : y_size + c_size], dtype=np.uint8).reshape(ch, cw)
                )
                vs.append(np.frombuffer(raw[y_size + c_size :], dtype=np.uint8).reshape(ch, cw))
            pos += frame_size
        ymat = np.stack(ys) if ys else np.zeros((0, height, width), dtype=np.uint8)
        umat = (np.stack(us) if us else np.zeros((0, ch, cw), dtype=np.uint8)) if chroma else None
        vmat = (np.stack(vs) if vs else np.zeros((0, ch, cw), dtype=np.uint8)) if chroma else None
    out = {
        "width": width,
        "height": height,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "colorspace": colorspace,
        "y": ymat,
    }
    if chroma:
        out["u"] = umat
        out["v"] = vmat
    return out


def encode_y4m(
    y: np.ndarray,
    fps: tuple = (25, 1),
    u: np.ndarray | None = None,
    v: np.ndarray | None = None,
) -> bytes:
    """Encode luma frames ((n, H, W) uint8) — optionally with (n, H/2, W/2)
    chroma planes for C420jpeg — as a canonical Y4M byte string (Cmono
    when no chroma is given)."""
    if y.dtype != np.uint8 or y.ndim != 3:
        raise ValueError("encode_y4m needs (n, H, W) uint8 luma")
    n, height, width = y.shape
    if height == 0 or width == 0:
        raise ValueError("cannot encode zero-sized frames")
    if (u is None) != (v is None):
        raise ValueError("provide both u and v chroma planes or neither")
    if u is not None and (u.dtype != np.uint8 or v.dtype != np.uint8):
        # luma dtype is validated above; silent astype truncation of float
        # or wide-int chroma would corrupt the stream without an error
        raise ValueError("encode_y4m needs uint8 chroma planes")
    cspace = "mono" if u is None else "420jpeg"
    header = f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 C{cspace}\n"
    if u is None:
        # vectorized mono writer: one (n, 6 + frame) byte matrix, no
        # per-frame Python (mirrors the decode fast path)
        frame = height * width
        mat = np.empty((n, 6 + frame), dtype=np.uint8)
        mat[:, :6] = np.frombuffer(b"FRAME\n", dtype=np.uint8)
        mat[:, 6:] = y.reshape(n, frame)
        return header.encode("ascii") + mat.tobytes()
    out = bytearray(header.encode("ascii"))
    expect = (-(-height // 2), -(-width // 2))
    if u.shape != (n, *expect) or v.shape != (n, *expect):
        raise ValueError(f"chroma planes must be (n, {expect[0]}, {expect[1]})")
    for i in range(n):
        out += b"FRAME\n"
        out += y[i].tobytes()
        out += u[i].astype(np.uint8).tobytes()
        out += v[i].astype(np.uint8).tobytes()
    return bytes(out)
