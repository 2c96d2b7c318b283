"""Headless main dialog + run-mode dispatch (interface.c / main.c laws)."""

import numpy as np
import pytest

from lqr_tpu.config import LqrConfig, SeamColors, AuxLayerType, ResizeOrder
from lqr_tpu.dialog import MainDialog, Response, RunMode, run_plugin
from lqr_tpu.errors import LqrError
from lqr_tpu.image_model import Image, Layer
from lqr_tpu.settings import SettingsStore, save_vals
from lqr_tpu.sizeentry import Unit


def _img(make_image, h=20, w=32):
    return Image.from_array(make_image(h=h, w=w))


def test_size_section_chain(make_image):
    d = MainDialog(_img(make_image))
    d.size.chain_active = True
    d.set_new_size(width=16)
    assert (d.cfg.new_width, d.cfg.new_height) == (16, 10)
    d.reset_size_to_image()
    assert (d.cfg.new_width, d.cfg.new_height) == (32, 20)
    d.set_new_size(width=50, unit=Unit.PERCENT)
    assert (d.cfg.new_width, d.cfg.new_height) == (16, 10)


def test_disc_warning_tracks_size(make_image):
    """interface.c:857-902: warn iff the first scaling direction
    enlarges while a discard mask is selected."""
    img = _img(make_image)
    img.add_layer(Layer("d", np.zeros((20, 32, 4), np.uint8)), 0)
    img.active = "Background"
    d = MainDialog(img, LqrConfig(selected_layer_name="Background"))
    d.select_mask(AuxLayerType.DISC, "d")
    d.set_new_size(width=40, height=20)
    assert d.disc_warning()
    d.set_new_size(width=20, height=20)
    assert not d.disc_warning()
    d.set_new_size(width=32, height=30)       # width equal, height grows
    assert d.disc_warning()
    d.cfg = d.cfg.replace(res_order=ResizeOrder.VERT,
                          new_width=40, new_height=10)
    assert not d.disc_warning()               # first direction now shrinks


def test_mask_eligibility_and_refresh(make_image):
    img = _img(make_image)
    img.add_layer(Layer("m1", np.zeros((20, 32, 4), np.uint8)), 0)
    img.active = "Background"
    d = MainDialog(img)
    assert d.feature_masks_available()
    assert d.eligible_mask_layers() == ["m1"]
    d.select_mask(AuxLayerType.PRES, "m1")
    with pytest.raises(LqrError, match="not selectable"):
        d.select_mask(AuxLayerType.DISC, "Background")
    # the layer disappears under the live dialog -> refresh drops it
    img.remove_layer("m1")
    d.refresh()
    assert d.cfg.pres_layer == ""
    assert not d.feature_masks_available()


def test_new_mask_round_trip_and_reset(make_image):
    img = _img(make_image)
    d = MainDialog(img)
    with d.new_mask(AuxLayerType.DISC, name="dm") as s:
        s.paint(np.ones((20, 32)))
    assert d.cfg.disc_layer == "dm"
    d.set_new_size(width=10)
    d.reset()                                 # RESPONSE_RESET
    assert d.cfg == LqrConfig(selected_layer_name="Background",
                              new_width=32, new_height=20)
    assert d.colors == SeamColors()


def test_run_plugin_noninteractive(make_image):
    img = _img(make_image)
    out, cfg = run_plugin(img, RunMode.NONINTERACTIVE,
                          cfg=LqrConfig(new_width=28, new_height=20))
    assert out.layer_by_name("Background").width == 28
    with pytest.raises(LqrError, match="full config"):
        run_plugin(_img(make_image), RunMode.NONINTERACTIVE)


def test_run_plugin_with_last_vals(tmp_path, make_image):
    store = SettingsStore(tmp_path / "s.json")
    save_vals(store, LqrConfig(new_width=30, new_height=20,
                               pres_layer="pm"))
    img = _img(make_image)
    img.add_layer(Layer("pm", np.full((20, 32, 4), 255, np.uint8),
                        visible=False), 0)
    img.active = "Background"
    out, cfg = run_plugin(img, RunMode.WITH_LAST_VALS, store=store)
    assert cfg.pres_layer == "pm"             # resolved by name
    assert out.layer_by_name("Background").width == 30


def test_run_plugin_interactive_state_machine(tmp_path, make_image):
    """RESET loops back with defaults; OK renders and persists
    (main.c:327-385, 438-441)."""
    store = SettingsStore(tmp_path / "s.json")
    responses = []

    def driver(dialog):
        if not responses:
            responses.append("reset")
            dialog.set_new_size(width=5, height=5)
            return Response.RESET
        dialog.set_new_size(width=24, height=20)
        return Response.OK

    img = _img(make_image)
    out, cfg = run_plugin(img, RunMode.INTERACTIVE, store=store,
                          dialog_driver=driver)
    assert cfg.new_width == 24                # RESET dropped the 5x5 edit
    assert out.layer_by_name("Background").width == 24
    got, _ = __import__("lqr_tpu.settings", fromlist=["retrieve_vals"]) \
        .retrieve_vals(store)
    assert got.new_width == 24                # saved on success


def test_run_plugin_interactive_cancel(tmp_path, make_image):
    store = SettingsStore(tmp_path / "s.json")
    out, cfg = run_plugin(_img(make_image), RunMode.INTERACTIVE,
                          store=store,
                          dialog_driver=lambda d: Response.CANCEL)
    assert cfg is None
    assert store.get_data("plug_in_lqr") is None   # nothing persisted


def test_ui_vals_roundtrip(tmp_path, make_image):
    """PlugInUIVals persistence (main.h:54-71; save main.c:495, restore
    main.c:504): a successful interactive run stores chain state,
    mask statuses, last-used size and expander flags; the next dialog
    session restores them and the last-values button replays the size."""
    from lqr_tpu.settings import retrieve_ui_vals
    store = SettingsStore(tmp_path / "s.json")

    def driver(dialog):
        assert not dialog.last_values_available()   # default -1/-1
        dialog.size.chain_active = True
        dialog.seams_control_expanded = True
        dialog.set_new_size(width=24)               # chain: height follows
        return Response.OK

    img = _img(make_image)
    run_plugin(img, RunMode.INTERACTIVE, store=store, dialog_driver=driver)

    ui = retrieve_ui_vals(store)
    assert ui.chain_active and ui.seams_control_expanded
    assert not ui.operations_expanded
    assert (ui.last_used_width, ui.last_used_height) == (24, 15)
    assert ui.last_layer_name == "Background"
    assert not ui.pres_status and not ui.disc_status

    # a fresh dialog session restores the persisted UI state
    d2 = MainDialog(_img(make_image), ui=ui)
    assert d2.size.chain_active                    # interface.c:387
    assert d2.seams_control_expanded
    assert d2.last_values_available()              # interface.c:462-465
    d2.size.chain_active = False
    d2.set_new_size(width=30, height=18)
    d2.use_last_values()                           # interface.c:963-975
    assert (d2.cfg.new_width, d2.cfg.new_height) == (24, 15)


def test_ui_vals_statuses_follow_masks(tmp_path, make_image):
    """AUX_LAYER_STATUS bookkeeping (main.c:406-409): statuses reflect
    the masks actually in use at render time."""
    from lqr_tpu.settings import retrieve_ui_vals
    store = SettingsStore(tmp_path / "s.json")
    img = _img(make_image)
    m = np.zeros((20, 32, 3), np.uint8)
    m[:, 8:12] = 255
    img.add_layer(Layer("disc mask", m))

    def driver(dialog):
        dialog.select_mask(AuxLayerType.DISC, "disc mask")
        dialog.set_new_size(width=26, height=20)
        return Response.OK

    run_plugin(img, RunMode.INTERACTIVE, store=store, dialog_driver=driver)
    ui = retrieve_ui_vals(store)
    assert ui.disc_status and not ui.pres_status and not ui.rigmask_status


def test_use_last_values_unavailable_raises(make_image):
    d = MainDialog(_img(make_image))
    with pytest.raises(LqrError):
        d.use_last_values()
