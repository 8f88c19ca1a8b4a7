"""Held-out foreign-renderer scale-bar corpus (VERDICT r3 next #8).

The main corpus (tests/test_scalebar_corpus.py) renders labels with cv2
Hershey and DejaVu Sans/Serif — faces the matcher's own template atlas
contains (deepemia_tpu/inference/scalebar.py:31-40). That proves nothing
about fonts the atlas has never seen. This corpus therefore renders with
sources deliberately FOREIGN to the atlas:

- a hand-defined 5x7 bitmap pixel font (the blocky instrument-annotation
  style SEM vendors burn into micrographs), nearest-neighbor upscaled;
- DejaVu *Bold* faces (weight-foreign: the atlas holds only the regular
  cuts);
- JPEG re-encode + sensor-noise degradations of both, including
  JPEG-heavy (quality 25) and high-noise (sigma 20) variants;
- geometric variants: tilted bars+labels (±2-6°, the collinear-merge +
  tilted-atlas path), a VERTICAL bar beside horizontal text, and
  dark-on-light (inverted polarity) renderings.

Pass criteria: value+unit accuracy >= 0.97 over the corpus (VERDICT r4
weak #7: a 1-in-10 miss budget was too loose for the value that
multiplies every measurement in the CSV), and ZERO silent power-of-1000
unit confusions among successful reads (the reference's EasyOCR is
font-agnostic — scalebar_ocr.py:149-195 — so font generalization is part
of the parity bar).
"""

import zlib

import cv2
import numpy as np
import pytest

from deepemia_tpu.inference.scalebar import detect_scale_bar

# ---------------------------------------------------------------------------
# 5x7 bitmap font — defined HERE, not derived from any atlas face.
# ---------------------------------------------------------------------------

_FONT_5X7 = {
    "0": ["01110", "10001", "10011", "10101", "11001", "10001", "01110"],
    "1": ["00100", "01100", "00100", "00100", "00100", "00100", "01110"],
    "2": ["01110", "10001", "00001", "00010", "00100", "01000", "11111"],
    "3": ["11111", "00010", "00100", "00010", "00001", "10001", "01110"],
    "4": ["00010", "00110", "01010", "10010", "11111", "00010", "00010"],
    "5": ["11111", "10000", "11110", "00001", "00001", "10001", "01110"],
    "6": ["00110", "01000", "10000", "11110", "10001", "10001", "01110"],
    "7": ["11111", "00001", "00010", "00100", "01000", "01000", "01000"],
    "8": ["01110", "10001", "10001", "01110", "10001", "10001", "01110"],
    "9": ["01110", "10001", "10001", "01111", "00001", "00010", "01100"],
    ".": ["00000", "00000", "00000", "00000", "00000", "01100", "01100"],
    "u": ["00000", "00000", "10001", "10001", "10001", "10011", "01101"],
    "m": ["00000", "00000", "11010", "10101", "10101", "10101", "10101"],
    "n": ["00000", "00000", "10110", "11001", "10001", "10001", "10001"],
}


def _render_bitmap_text(canvas, text, x, y, scale, fg):
    """Blit 5x7 glyphs at integer ``scale`` (nearest-neighbor blocks)."""
    cx = x
    for ch in text:
        if ch == " ":
            cx += 3 * scale
            continue
        rows = _FONT_5X7[ch]
        for r, row in enumerate(rows):
            for c, bit in enumerate(row):
                if bit == "1":
                    canvas[
                        y + r * scale : y + (r + 1) * scale,
                        cx + c * scale : cx + (c + 1) * scale,
                    ] = fg
        cx += 6 * scale
    return cx


BAR_LEN = 200
LABELS = [
    ("500 um", 500.0),
    ("200 nm", 0.2),
    ("2 um", 2.0),
    ("100 nm", 0.1),
    ("1.5 um", 1.5),
]
CFG = {
    "scale_bar_rois": {
        "default": {
            "x_start_factor": 0.0,
            "y_start_factor": 0.0,
            "width_factor": 1.0,
            "height_factor": 1.0,
        }
    },
    "scalebar_thresholds": {
        "intensity": 100,
        "merge_gap": 15,
        "min_line_length": 30,
        "edge_margin_factor": 0.0,
    },
}

_BOLD_FONTS = {
    "dejavu_sans_bold": "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
    "dejavu_serif_bold": "/usr/share/fonts/truetype/dejavu/DejaVuSerif-Bold.ttf",
}


def _degrade(img, label, source, noise=0.0, jpeg=None):
    if noise:
        rng = np.random.default_rng(zlib.crc32(f"{label}/{source}".encode()))
        img = np.clip(
            img.astype(np.float32) + rng.normal(0, noise, img.shape), 0, 255
        ).astype(np.uint8)
    if jpeg is not None:
        ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, jpeg])
        assert ok
        img = cv2.imdecode(enc, cv2.IMREAD_GRAYSCALE)
    return img


def _render_bitmap(label, scale=3, **deg):
    img = np.full((110, 460), 20, np.uint8)
    _render_bitmap_text(img, label, 140, 12, scale, 230)
    cv2.rectangle(img, (110, 80), (110 + BAR_LEN - 1, 83), 230, -1)
    img = _degrade(img, label, f"bitmap{scale}", **deg)
    return cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)


def _render_bold(label, font_path, px=20, **deg):
    from PIL import Image, ImageDraw, ImageFont

    img = np.full((90, 420), 20, np.uint8)
    pil = Image.fromarray(img)
    ImageDraw.Draw(pil).text(
        (140, 10), label, fill=230, font=ImageFont.truetype(font_path, px)
    )
    img = np.array(pil)
    cv2.rectangle(img, (110, 60), (110 + BAR_LEN - 1, 63), 230, -1)
    img = _degrade(img, label, font_path, **deg)
    return cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)


def _render_rotated(label, deg):
    """Bar AND label tilted together (a crooked annotation overlay)."""
    img = np.full((150, 460), 20, np.uint8)
    _render_bitmap_text(img, label, 140, 12, 3, 230)
    cv2.rectangle(img, (110, 90), (110 + BAR_LEN - 1, 93), 230, -1)
    M = cv2.getRotationMatrix2D((230, 75), deg, 1.0)
    img = cv2.warpAffine(img, M, (460, 150), borderValue=20)
    return cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)


def _render_vertical(label):
    """Vertical bar beside horizontal text (the reference's ±10°-horizontal
    Hough filter could not see these at all)."""
    img = np.full((300, 460), 20, np.uint8)
    _render_bitmap_text(img, label, 160, 120, 3, 230)
    cv2.rectangle(img, (120, 40), (123, 40 + BAR_LEN - 1), 230, -1)
    return cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)


def _render_inverted(label, **deg):
    """Dark bar/label on a bright background (optical-microscopy style)."""
    img = np.full((110, 460), 235, np.uint8)
    _render_bitmap_text(img, label, 140, 12, 3, 25)
    cv2.rectangle(img, (110, 80), (110 + BAR_LEN - 1, 83), 25, -1)
    img = _degrade(img, label, "inverted", **deg)
    return cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)


def _corpus():
    for label, value_um in LABELS:
        for scale in (2, 3, 4):
            yield f"bitmap_x{scale}", label, value_um, _render_bitmap(
                label, scale
            )
        yield "bitmap_x3_jpeg40", label, value_um, _render_bitmap(
            label, 3, jpeg=40
        )
        yield "bitmap_x3_jpeg25", label, value_um, _render_bitmap(
            label, 3, jpeg=25
        )
        yield "bitmap_x3_noise", label, value_um, _render_bitmap(
            label, 3, noise=10.0
        )
        yield "bitmap_x3_noise20", label, value_um, _render_bitmap(
            label, 3, noise=20.0
        )
        for deg in (2.0, -3.0, 4.0, 6.0):
            yield f"rotated_{deg}", label, value_um, _render_rotated(
                label, deg
            )
        yield "vertical_bar", label, value_um, _render_vertical(label)
        yield "inverted", label, value_um, _render_inverted(label)
        yield "inverted_jpeg40", label, value_um, _render_inverted(
            label, jpeg=40
        )
        for name, path in _BOLD_FONTS.items():
            yield name, label, value_um, _render_bold(label, path)
            yield f"{name}_jpeg40", label, value_um, _render_bold(
                label, path, jpeg=40
            )


def test_scalebar_foreign_renderer_corpus():
    """Value+unit accuracy >= 97% across renderers the atlas has never
    seen, with ZERO power-of-1000 unit confusions among successful reads."""
    total = correct = 0
    unit_confusions = []
    failures = []
    for source, label, value_um, img in _corpus():
        psum, um_pix = detect_scale_bar(img, CFG)
        total += 1
        expected_um_pix = value_um / BAR_LEN
        if psum != "0" and abs(um_pix - expected_um_pix) <= 0.02 * expected_um_pix:
            correct += 1
            continue
        failures.append((source, label, psum, um_pix))
        if psum != "0" and um_pix > 0:
            ratio = (um_pix * BAR_LEN) / value_um
            for p1000 in (1e-6, 1e-3, 1e3, 1e6):
                if 0.5 * p1000 < ratio < 2 * p1000:
                    unit_confusions.append((source, label, psum))
    acc = correct / total
    assert not unit_confusions, f"unit confusions: {unit_confusions}"
    assert acc >= 0.97, (
        f"foreign-renderer accuracy {acc:.1%} ({correct}/{total}); "
        f"failures: {failures[:20]}"
    )
