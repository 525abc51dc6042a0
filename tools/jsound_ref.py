"""javax.sound.sampled arbitration shim — the JDK's independent audio
container codecs (WAV / AIFF / AU, PCM + G.711 u-law/A-law), reachable
through the Spark session's JVM like tools/imageio_ref.py.

NOTE: read bytes via InputStream.readNBytes (returns a fresh byte[]
marshalled by value) — reading into a py4j-created byte[] proxy does NOT
reflect Java-side writes back to Python reliably.
"""

from __future__ import annotations

import numpy as np


class JSoundRef:
    def __init__(self, spark):
        self._jvm = spark._jvm

    def decode(self, data: bytes):
        """-> (rate, np.int16 samples, encoding name). PCM_SIGNED streams
        return their samples; ULAW/ALAW streams are converted to 16-bit
        PCM by the JDK (its G.711 tables — the arbitration target)."""
        jvm = self._jvm
        bais = jvm.java.io.ByteArrayInputStream(bytearray(data))
        ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(bais)
        fmt = ais.getFormat()
        enc = fmt.getEncoding().toString()
        if enc in ("ULAW", "ALAW"):
            AF = jvm.javax.sound.sampled.AudioFormat
            pcm = AF(
                float(fmt.getSampleRate()), 16, fmt.getChannels(), True, True
            )
            ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(pcm, ais)
            fmt = ais.getFormat()
        n = int(ais.getFrameLength()) * fmt.getFrameSize()
        raw = bytes(ais.readNBytes(n))
        dt = ">i2" if fmt.isBigEndian() else "<i2"
        if fmt.getSampleSizeInBits() == 16:
            samples = np.frombuffer(raw, dtype=dt).astype(np.int16)
        elif fmt.getSampleSizeInBits() == 8:
            off = 128 if enc == "PCM_UNSIGNED" else 0
            samples = (
                np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - off
            )
        else:
            raise ValueError(f"unhandled sample size {fmt.getSampleSizeInBits()}")
        return int(fmt.getSampleRate()), samples, enc

    def encode(self, samples: np.ndarray, rate: int, filetype: str,
               encoding: str = "pcm") -> bytes:
        """Encode mono int16 samples as 'wave'/'aiff'/'au'; encoding
        'ulaw'/'alaw' (AU) routes through the JDK's G.711 converter."""
        jvm = self._jvm
        s = np.asarray(samples, dtype=np.int16)
        raw = s.astype(">i2").tobytes()
        bais = jvm.java.io.ByteArrayInputStream(bytearray(raw))
        AF = jvm.javax.sound.sampled.AudioFormat
        fmt = AF(float(rate), 16, 1, True, True)
        ais = jvm.javax.sound.sampled.AudioInputStream(bais, fmt, len(s))
        if encoding in ("ulaw", "alaw"):
            enc_obj = getattr(
                jvm.javax.sound.sampled.AudioFormat.Encoding, encoding.upper()
            )
            ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
                enc_obj, ais
            )
        Type = jvm.javax.sound.sampled.AudioFileFormat.Type
        t = {"wave": Type.WAVE, "aiff": Type.AIFF, "au": Type.AU}[filetype]
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.javax.sound.sampled.AudioSystem.write(ais, t, baos)
        return bytes(baos.toByteArray())
