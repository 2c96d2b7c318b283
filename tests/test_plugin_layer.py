"""Plugin-layer tests: Carver API semantics, render orchestration, GAP
interpolation, auto-size guess, seam-map colorization (SURVEY.md §2)."""

import numpy as np
import pytest

from lqr_tpu import Carver, oracle
from lqr_tpu.config import (LqrConfig, SeamColors, OutputTarget,
                            ScalebackMode, ResizeOrder, EnergyFunc)
from lqr_tpu.image_model import Image, Layer
from lqr_tpu.render import (init_carver, render_noninteractive,
                            render_interactive, render_flatten,
                            render_dump_vmap, compute_ignore_disc_mask)
from lqr_tpu.gap import interpolate, schedule
from lqr_tpu.guess import guess_new_size, HOR, VERT
from lqr_tpu.vmap_render import render_vmap


# ---------------------------------------------------------------------------
# Carver API
# ---------------------------------------------------------------------------

def test_carver_shrink_matches_oracle(make_image):
    img = make_image(h=20, w=30)
    c = Carver(img)
    c.resize(22, 20)
    expect = oracle.carve_width(img, 22)
    assert np.array_equal(c.get_image(), expect)


def test_carver_two_axis_matches_oracle(make_image):
    img = make_image(h=20, w=30)
    c = Carver(img)
    c.resize(26, 16)
    # res_order HOR: width first, flatten, then height on transposed
    mid = oracle.carve_width(img, 26)
    midT = np.swapaxes(mid, 0, 1)
    outT = oracle.carve_width(midT, 16)
    expect = np.swapaxes(outT, 0, 1)
    assert np.array_equal(c.get_image(), expect)


def test_carver_res_order_vert(make_image):
    img = make_image(h=20, w=30)
    c = Carver(img)
    c.set_resize_order(ResizeOrder.VERT)
    c.resize(26, 16)
    midT = oracle.carve_width(np.swapaxes(img, 0, 1), 16)
    mid = np.swapaxes(midT, 0, 1)
    expect = oracle.carve_width(mid, 26)
    assert np.array_equal(c.get_image(), expect)


def test_carver_interactive_retarget(make_image):
    """Re-targeting within [ref-depth, ref+depth] must reuse the map
    (liblqr real-time property) and reproduce the original at ref."""
    img = make_image(h=18, w=28)
    c = Carver(img)
    c.resize(20, 18)
    d = c.depth
    c.resize(24, 18)           # back up within the map
    assert c.depth == d        # no recompute/extension
    c.resize(28, 18)
    assert np.array_equal(c.get_image(), img)


def test_carver_enlarge_matches_oracle(make_image):
    img = make_image(h=18, w=28)
    c = Carver(img)
    c.resize(36, 18)   # within one enl_step (1.5 -> max 42)
    vs = oracle.compute_vs_map(img, 8)
    expect = oracle.materialize(img, vs, 36)
    assert np.array_equal(c.get_image(), expect)


def test_carver_flatten_resets_reference(make_image):
    img = make_image(h=16, w=24)
    c = Carver(img)
    c.resize(20, 16)
    c.flatten()
    assert c.depth == 0 and c.ref_width == 20
    # after flatten, going back to 24 re-inserts (not identity)
    c.resize(24, 16)
    assert c.get_image().shape == (16, 24, 3)
    assert not np.array_equal(c.get_image(), img)


def test_carver_aux_attach(make_image, rng):
    img = make_image(h=16, w=24)
    aux = rng.integers(0, 256, (16, 24, 4)).astype(np.uint8)
    c = Carver(img)
    c.attach(aux)
    c.resize(18, 16)
    vs = oracle.compute_vs_map(img, 6)
    assert np.array_equal(c.get_aux(0), oracle.materialize(aux, vs, 18))


def test_carver_bias_changes_seams(make_image):
    img = make_image(h=16, w=24)
    c0 = Carver(img)
    c0.resize(20, 16)
    mask = np.zeros((16, 24), np.uint8)
    mask[:, 5:15] = 255
    c1 = Carver(img)
    c1.bias_add(mask, 1000)
    c1.resize(20, 16)
    bias = oracle.strength(mask) * np.float32(1.0)
    vs = oracle.compute_vs_map(img, 4, bias=bias)
    assert np.array_equal(c1.get_image(), oracle.materialize(img, vs, 20))
    assert not np.array_equal(c0.get_image(), c1.get_image())


def test_carver_vmap_dump_and_colors(make_image):
    img = make_image(h=14, w=20)
    c = Carver(img)
    c.resize(15, 14)
    vm = c.vmap_dump()
    assert vm.depth == 5 and vm.data.shape == (14, 20)
    rgba = render_vmap(vm.data, vm.depth, SeamColors())
    # color law spot check: seam 1 (first carved) has value depth/(depth+1)
    y, x = np.argwhere(vm.data == 1)[0]
    value = (5 + 1 - 1) / (5 + 1)
    assert rgba[y, x, 0] == int(255 * (value * 1.0 + (1 - value) * 0.2))
    assert rgba[y, x, 3] == int(255 * 0.5 * (1 + value))
    assert np.all(rgba[vm.data == 0] == 0)


# ---------------------------------------------------------------------------
# render orchestration
# ---------------------------------------------------------------------------

def _image_with_masks(make_image):
    base = make_image(h=24, w=36)
    img = Image.from_array(base, "Background")
    pres = np.zeros((24, 36, 4), np.uint8)
    pres[4:10, 4:12] = [0, 255, 0, 255]
    disc = np.zeros((24, 36, 4), np.uint8)
    disc[12:20, 20:30] = [255, 0, 0, 255]
    img.add_layer(Layer("pres", pres, visible=False))
    img.add_layer(Layer("disc", disc, visible=False))
    return img


def test_render_noninteractive_same_layer(make_image):
    img = _image_with_masks(make_image)
    cfg = LqrConfig(new_width=30, new_height=24, pres_layer="pres",
                    disc_layer="disc")
    cd = init_carver(img, cfg)
    assert render_noninteractive(cfg, SeamColors(), cd)
    lay = cd.image.layer_by_name("Background")
    assert lay.pixels.shape == (24, 30, 3)
    assert cd.image.width == 30 and cd.image.height == 24
    # aux layers carved along
    assert cd.image.layer_by_name("pres").pixels.shape == (24, 30, 4)


def test_render_new_layer_and_seams(make_image):
    img = _image_with_masks(make_image)
    cfg = LqrConfig(new_width=30, new_height=24,
                    output_target=OutputTarget.NEW_LAYER, output_seams=True)
    cd = init_carver(img, cfg)
    assert render_noninteractive(cfg, SeamColors(), cd)
    assert cd.image.layer_by_name("Background LqR") is not None
    assert cd.image.layer_by_name("Background LqR seam map") is not None
    assert cd.image.layer_by_name("Background LqR").visible


def test_render_new_image(make_image):
    img = _image_with_masks(make_image)
    cfg = LqrConfig(new_width=30, new_height=24,
                    output_target=OutputTarget.NEW_IMAGE,
                    pres_layer="pres")
    cd = init_carver(img, cfg)
    assert cd.image is not img
    assert render_noninteractive(cfg, SeamColors(), cd)
    assert img.layer_by_name("Background").pixels.shape == (24, 36, 3)
    assert cd.image.layer_by_name("Background").pixels.shape == (24, 30, 3)


def test_render_scaleback_lqr(make_image):
    img = _image_with_masks(make_image)
    cfg = LqrConfig(new_width=30, new_height=24, scaleback=True,
                    scaleback_mode=ScalebackMode.LQRBACK)
    cd = init_carver(img, cfg)
    assert render_noninteractive(cfg, SeamColors(), cd)
    assert cd.image.layer_by_name("Background").pixels.shape == (24, 36, 3)


def test_render_scaleback_std_modes(make_image):
    for mode, shape in [(ScalebackMode.STD, (24, 36)),
                        (ScalebackMode.STDW, (24, 36)),
                        (ScalebackMode.STDH, (24, 36))]:
        img = _image_with_masks(make_image)
        cfg = LqrConfig(new_width=30, new_height=24, scaleback=True,
                        scaleback_mode=mode)
        cd = init_carver(img, cfg)
        assert render_noninteractive(cfg, SeamColors(), cd)
        lay = cd.image.layer_by_name("Background")
        # 30x24 scaled back: STD -> 36x24; STDW -> w=36, h=24*36/30=28;
        # STDH -> h=24, w=30*24/24=30... recompute per the law:
        if mode == ScalebackMode.STD:
            assert lay.pixels.shape[:2] == (24, 36)
        elif mode == ScalebackMode.STDW:
            assert lay.pixels.shape[:2] == (int(24 * 36 / 30), 36)
        else:
            assert lay.pixels.shape[:2] == (24, int(30 * 24 / 24))


def test_ignore_disc_predicate():
    cfg = LqrConfig(no_disc_on_enlarge=True, res_order=ResizeOrder.HOR)
    assert compute_ignore_disc_mask(cfg, 100, 100, 120, 90)      # w grows
    assert compute_ignore_disc_mask(cfg, 100, 100, 100, 120)     # w ==, h >
    assert not compute_ignore_disc_mask(cfg, 100, 100, 90, 120)  # w shrinks
    cfg2 = cfg.replace(res_order=ResizeOrder.VERT)
    assert compute_ignore_disc_mask(cfg2, 100, 100, 90, 120)
    cfg3 = cfg.replace(no_disc_on_enlarge=False)
    assert not compute_ignore_disc_mask(cfg3, 100, 100, 120, 120)


def test_render_interactive_cycle(make_image):
    img = Image.from_array(make_image(h=20, w=30))
    cfg = LqrConfig(new_width=30, new_height=20)
    cd = init_carver(img, cfg, interactive=True)
    assert render_interactive(cfg, cd, 24, 20)
    assert cd.image.layer_by_name("Background").pixels.shape == (20, 24, 3)
    assert cd.depth == 6 and cd.orientation == 0
    assert render_dump_vmap(cd, SeamColors())
    assert cd.image.layer_by_name("Background seam map") is not None
    assert render_flatten(cd)
    assert cd.depth == 0 and cd.ref_w == 24


# ---------------------------------------------------------------------------
# GAP / guess
# ---------------------------------------------------------------------------

def test_gap_interpolation_law():
    a = LqrConfig(new_width=100, new_height=200, rigidity=0.0, delta_x=1)
    b = LqrConfig(new_width=110, new_height=100, rigidity=10.0, delta_x=3,
                  nrg_func=EnergyFunc.LUMA_GRAD_NORM)
    mid = interpolate(a, b, 10, 5.0)
    assert mid.new_width == 105
    assert mid.new_height == 150
    assert abs(mid.rigidity - 5.0) < 1e-9
    assert mid.delta_x == 2
    assert mid.nrg_func == EnergyFunc.LUMA_GRAD_NORM  # discrete from TO
    frames = list(schedule(a, b, 11))
    assert frames[0].new_width == 100 and frames[-1].new_width == 110
    assert [f.new_width for f in frames] == list(range(100, 111))


def test_guess_new_size_offsets():
    mask = np.zeros((10, 12, 4), np.uint8)
    mask[2:6, 3:9] = [255, 0, 0, 255]     # 6 wide, 4 tall; mean/255*a = 1/3
    # threshold 0.5/3 -> counted
    assert guess_new_size(mask, 40, 30, HOR, 0, 0) == 40 - 6
    assert guess_new_size(mask, 40, 30, VERT, 0, 0) == 30 - 4
    # off-canvas placement clips the overlap: mask cols 3..9 at x_off 36
    # -> layer cols 39..45, clipped to one column
    assert guess_new_size(mask, 40, 30, HOR, 36, 0) == 40 - 1
    # below threshold: dim red
    weak = np.zeros((10, 12, 4), np.uint8)
    weak[2:6, 3:9] = [60, 0, 0, 255]      # 60/765 < 1/6
    assert guess_new_size(weak, 40, 30, HOR) == 40
