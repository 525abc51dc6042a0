"""javax.imageio arbitration shim — an independent JDK-bundled image
codec suite reachable through the Spark session's own JVM (py4j).

Why this matters: the engine's JPEG/GIF/BMP/TIFF/PNG codecs are pure
stdlib+numpy transcriptions of the specs; until round 10 only WebP had
third-party arbitration (libwebp.so). The JDK's ImageIO readers/writers
(com.sun.imageio, an independent lineage from this repo's code) are
ALWAYS present wherever this engine runs — every test session already
holds a JVM — so cross-codec checks through this shim run
unconditionally, no optional native library needed.

Pixel access uses the RASTER (band samples), not BufferedImage.getRGB:
getRGB routes grayscale through a gray->sRGB color transform (gamma),
which would masquerade as decoder error. Band order is calibrated
empirically per image type at first use (see _band_order).
"""

from __future__ import annotations

import numpy as np


class ImageIORef:
    def __init__(self, spark):
        self._jvm = spark._jvm
        self._gw = spark.sparkContext._gateway

    # -- decode ---------------------------------------------------------

    def decode(self, data: bytes) -> np.ndarray:
        """Decode any ImageIO-supported stream -> (H, W) gray or
        (H, W, bands) uint8 from the raster (no colorspace transform)."""
        img = self._read(data)
        return self._pixels(img)

    def _read(self, data: bytes):
        bais = self._jvm.java.io.ByteArrayInputStream(bytearray(data))
        img = self._jvm.javax.imageio.ImageIO.read(bais)
        if img is None:
            raise ValueError("ImageIO could not decode the stream")
        return img

    def _pixels(self, img) -> np.ndarray:
        w, h = img.getWidth(), img.getHeight()
        raster = img.getRaster()
        nb = raster.getNumBands()
        arr = self._gw.new_array(self._gw.jvm.int, w * h * nb)
        raster.getPixels(0, 0, w, h, arr)
        out = np.frombuffer(
            bytes(bytearray(x & 0xFF for x in arr)), dtype=np.uint8
        ).reshape(h, w, nb)
        # indexed color (palette GIF/PNG): resolve through the color model
        # so callers compare actual colors, not palette indices. Detected
        # by the model CLASS, not BufferedImage type — GIF readers return
        # TYPE_CUSTOM indexed images
        cm = img.getColorModel()
        is_indexed = "IndexColorModel" in cm.getClass().getName()
        if nb == 1 and is_indexed:
            size = cm.getMapSize()
            lut = np.zeros((size, 4), dtype=np.uint8)
            for i in range(size):
                lut[i] = [cm.getRed(i), cm.getGreen(i), cm.getBlue(i), cm.getAlpha(i)]
            rgba = lut[out[:, :, 0]]
            if (rgba[..., 3] == 255).all():
                return rgba[..., :3]
            return rgba
        if nb == 1:
            return out[:, :, 0]
        return out

    def decode_raw_samples(self, data: bytes) -> np.ndarray:
        """Raw raster samples as int64 (H, W, bands): no 8-bit
        truncation, no palette/LUT resolution — the right view for
        16-bit and sub-byte-depth streams, where `decode` would clip or
        gamma-map."""
        img = self._read(data)
        w, h = img.getWidth(), img.getHeight()
        raster = img.getRaster()
        nb = raster.getNumBands()
        arr = self._gw.new_array(self._gw.jvm.int, w * h * nb)
        raster.getPixels(0, 0, w, h, arr)
        return np.array(list(arr), dtype=np.int64).reshape(h, w, nb)

    # -- encode ---------------------------------------------------------

    def encode(self, arr: np.ndarray, fmt: str, quality: float | None = None,
               compression: str | None = None) -> bytes:
        """Encode (H,W) gray / (H,W,3) RGB / (H,W,4) RGBA uint8 with the
        JDK writer for ``fmt``. ``quality`` (0..1) applies to jpeg;
        ``compression`` names a TIFF compression type (e.g. 'LZW',
        'PackBits', 'Deflate')."""
        jvm, gw = self._jvm, self._gw
        a = np.asarray(arr, dtype=np.uint8)
        h, w = a.shape[:2]
        if a.ndim == 2:
            itype = 10  # TYPE_BYTE_GRAY
            flat = a.reshape(h, w, 1)
        elif a.shape[2] == 3:
            itype = 5  # TYPE_3BYTE_BGR (raster bands are R,G,B order)
            flat = a
        elif a.shape[2] == 4:
            itype = 6  # TYPE_4BYTE_ABGR (raster bands are R,G,B,A order)
            flat = a
        else:
            raise ValueError(a.shape)
        img = jvm.java.awt.image.BufferedImage(w, h, itype)
        vals = flat.astype(np.int64).ravel()
        jarr = gw.new_array(gw.jvm.int, vals.size)
        for i, v in enumerate(vals.tolist()):
            jarr[i] = v
        img.getRaster().setPixels(0, 0, w, h, jarr)
        # sanity: raster band order really is R,G,B(,A) for these types
        # (calibrated once; a JDK where it isn't would fail loudly here)
        back = self._pixels(img)
        if not (back.reshape(flat.shape) == flat).all():
            raise RuntimeError("ImageIO raster band order calibration failed")

        writers = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(fmt)
        if not writers.hasNext():
            raise ValueError(f"no ImageIO writer for {fmt}")
        writer = writers.next()
        baos = jvm.java.io.ByteArrayOutputStream()
        ios = jvm.javax.imageio.stream.MemoryCacheImageOutputStream(baos)
        writer.setOutput(ios)
        param = writer.getDefaultWriteParam()
        if quality is not None:
            param.setCompressionMode(2)  # MODE_EXPLICIT
            param.setCompressionQuality(float(quality))
        if compression is not None:
            param.setCompressionMode(2)
            param.setCompressionType(compression)
        iio = jvm.javax.imageio.IIOImage(img, None, None)
        writer.write(None, iio, param)
        ios.flush()
        writer.dispose()
        return bytes(baos.toByteArray())
