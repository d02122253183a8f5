"""Error-path tests for the documented decode seam (VERDICT r5 #7).

The container has no PIL/libvips, so `decode_image` natively decodes
only PNG (functions/png.py) and baseline JPEG (functions/jpeg.py); any
other format must fail LOUDLY with a precise error, never decode
garbage or silently pass through. One test per unsupported format
family: WebP, GIF, progressive JPEG (SOF2).
"""

import pytest

from uts_spark.functions.multimodal import decode_image


def _webp_blob() -> bytes:
    # RIFF container with WEBP fourcc + a fake VP8 chunk header.
    return b"RIFF" + (40).to_bytes(4, "little") + b"WEBPVP8 " + b"\x00" * 32


def _gif_blob() -> bytes:
    # GIF89a header + minimal logical screen descriptor + trailer.
    return b"GIF89a" + b"\x01\x00\x01\x00\x80\x00\x00" + b"\x3b"


def _progressive_jpeg_blob() -> bytes:
    # SOI, APP0/JFIF, then SOF2 (progressive DCT) — enough structure for
    # the parser to reach and reject the SOF2 marker specifically.
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof2_payload = b"\x08" + (1).to_bytes(2, "big") + (1).to_bytes(2, "big") + b"\x01" + b"\x01\x11\x00"
    sof2 = b"\xff\xc2" + (2 + len(sof2_payload)).to_bytes(2, "big") + sof2_payload
    return b"\xff\xd8" + app0 + sof2


def test_webp_raises_not_implemented():
    with pytest.raises(NotImplementedError, match="non-PNG/JPEG"):
        decode_image(_webp_blob())


def test_gif_raises_not_implemented():
    with pytest.raises(NotImplementedError, match="non-PNG/JPEG"):
        decode_image(_gif_blob())


def test_progressive_jpeg_raises_out_of_scope():
    # Progressive JPEGs share the \xff\xd8 SOI magic, so they route into
    # the native decoder — which must reject SOF2 by name, not
    # misdecode it as baseline.
    with pytest.raises(ValueError, match=r"SOF2 \(progressive/extended\) out of scope"):
        decode_image(_progressive_jpeg_blob())
