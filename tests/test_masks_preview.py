"""Mask-authoring workflow + preview compositor parity tests
(interface_aux.c / layers_combo.c / preview.c laws)."""

import numpy as np
import pytest

from lqr_tpu.config import AuxLayerType, LqrConfig
from lqr_tpu.image_model import Image, Layer
from lqr_tpu.masks import (colour_from_type, new_mask_layer, edit_mask,
                           PRES_COLOR, DISC_COLOR, RIGMASK_COLOR,
                           GRAY_COLOR)
from lqr_tpu.preview import preview, PREVIEW_MAX_WIDTH, PREVIEW_MAX_HEIGHT


def _rgb_image(make_image, h=20, w=30):
    img = Image.from_array(make_image(h=h, w=w))
    img.active_layer.translate(3, 5)
    return img


def test_colour_from_type_rgb(make_image):
    img = _rgb_image(make_image)
    assert colour_from_type(img, AuxLayerType.PRES) == PRES_COLOR
    assert colour_from_type(img, AuxLayerType.DISC) == DISC_COLOR
    assert colour_from_type(img, AuxLayerType.RIGMASK) == RIGMASK_COLOR


def test_colour_from_type_gray(make_image):
    img = Image.from_array(make_image(c=1))
    for t in AuxLayerType:
        assert colour_from_type(img, t) == GRAY_COLOR


def test_new_mask_layer_law(make_image):
    """layers_combo.c:186-203: transparent, typed+alpha, active layer's
    geometry, 50% opacity, inserted on top."""
    img = _rgb_image(make_image)
    m = new_mask_layer(img, AuxLayerType.DISC)
    assert img.layers[0] is m
    assert m.bpp == 4                       # RGBA for an RGB image
    assert (m.height, m.width) == (20, 30)
    assert (m.x_off, m.y_off) == (3, 5)
    assert m.opacity == 50.0
    assert not m.pixels.any()               # GIMP_TRANSPARENT_FILL

    gray = Image.from_array(make_image(c=1))
    mg = new_mask_layer(gray, AuxLayerType.PRES)
    assert mg.bpp == 2                      # GRAYA for a GRAY image


def test_edit_session_paint_and_ok(make_image):
    img = _rgb_image(make_image)
    prev_active = img.active
    with edit_mask(img, AuxLayerType.DISC, name="__disc") as s:
        region = np.zeros((20, 30), bool)
        region[4:10, 6:12] = True
        s.paint(region)
    m = img.layer_by_name("__disc")
    assert m is not None
    assert img.active == prev_active        # restored
    # painted area is pure red at full alpha; elsewhere transparent
    assert (m.pixels[5, 7] == [255, 0, 0, 255]).all()
    assert (m.pixels[0, 0] == 0).all()


def test_edit_session_cancel_removes_new_layer(make_image):
    """cancel_work_on_aux_layer (main.c:600-613)."""
    img = _rgb_image(make_image)
    s = edit_mask(img, AuxLayerType.PRES, name="__p")
    s.paint(np.ones((20, 30)))
    s.cancel()
    assert img.layer_by_name("__p") is None
    assert img.active == "Background"


def test_edit_session_exception_cancels(make_image):
    img = _rgb_image(make_image)
    with pytest.raises(RuntimeError):
        with edit_mask(img, AuxLayerType.PRES, name="__p"):
            raise RuntimeError("boom")
    assert img.layer_by_name("__p") is None


def test_edit_existing_layer_kept_on_cancel(make_image):
    img = _rgb_image(make_image)
    m = new_mask_layer(img, AuxLayerType.RIGMASK, name="__r")
    s = edit_mask(img, AuxLayerType.RIGMASK, layer=m)
    s.cancel()                              # not new -> kept
    assert img.layer_by_name("__r") is m


def test_painted_mask_drives_the_carver(make_image):
    """End-to-end: an authored discard mask biases seams into its area."""
    from lqr_tpu.render import init_carver, render_noninteractive
    from lqr_tpu.config import SeamColors
    img = Image.from_array(make_image(h=24, w=32))
    with edit_mask(img, AuxLayerType.DISC, name="__d") as s:
        region = np.zeros((24, 32), bool)
        region[:, 10:14] = True
        s.paint(region)
    cfg = LqrConfig(new_width=28, new_height=24, disc_layer="__d",
                    resize_aux_layers=False)
    cd = init_carver(img, cfg)
    assert render_noninteractive(cfg, SeamColors(), cd)
    out = cd.image.layer_by_name(cd.layer_name)
    assert out.width == 28


def test_preview_factor_law(make_image):
    """interface.c:297-310: factor = max(w/300, h/200, 1)."""
    img = Image.from_array(make_image(h=20, w=30))
    out = preview(img, LqrConfig())
    assert out.shape == (20, 30, 4)         # factor clamps at 1
    big = Image.from_array(
        np.zeros((400, 900, 3), np.uint8))
    out = preview(big, LqrConfig())
    assert out.shape == (int(400 / 3.0), PREVIEW_MAX_WIDTH, 4)


def test_preview_composites_masks_at_50pct(make_image):
    """preview.c:133-185: golden composite of one overlay."""
    base_px = np.full((20, 30, 3), 100, np.uint8)
    img = Image.from_array(base_px)
    mask = np.zeros((20, 30, 4), np.uint8)
    mask[5:10, 5:10] = [255, 0, 0, 255]
    img.add_layer(Layer("__disc", mask, visible=False), 0)
    img.active = "Background"
    cfg = LqrConfig(disc_layer="__disc")
    out = preview(img, cfg)
    # inside the mask: alpha-over with src alpha 127/255
    sa = 127.0 / 255.0
    want_r = round(255 * sa + 100 * (1 - sa))
    assert out[7, 7, 0] == want_r
    assert out[7, 7, 1] == round(0 * sa + 100 * (1 - sa))
    assert (out[0, 0, :3] == 100).all()     # outside: base untouched
    # deactivated overlay leaves the base alone (ui_vals->disc_status)
    out2 = preview(img, cfg, disc_on=False)
    assert (out2[7, 7, :3] == 100).all()


def test_preview_offset_overlay(make_image):
    base_px = np.full((20, 30, 3), 10, np.uint8)
    img = Image.from_array(base_px)
    m = np.zeros((4, 4, 4), np.uint8)
    m[:, :] = [0, 255, 0, 255]
    img.add_layer(Layer("__pres", m, x_off=28, y_off=18, visible=False), 0)
    img.active = "Background"
    out = preview(img, LqrConfig(pres_layer="__pres"))
    assert out[19, 29, 1] > 100             # overlay clipped into corner
    assert (out[0, 0, :3] == 10).all()
