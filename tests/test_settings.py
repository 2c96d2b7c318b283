"""Settings persistence (last-vals) — main.c:487-517 parity."""

import numpy as np

from lqr_tpu.config import LqrConfig, SeamColors, EnergyFunc, OutputTarget
from lqr_tpu.image_model import Image, Layer
from lqr_tpu.settings import (SettingsStore, save_vals, retrieve_vals,
                              retrieve_vals_use_aux_layers_names,
                              store_iterated_vals, DATA_KEY_VALS)


def _store(tmp_path):
    return SettingsStore(tmp_path / "settings.json")


def test_round_trip(tmp_path):
    store = _store(tmp_path)
    cfg = LqrConfig(new_width=321, new_height=123, rigidity=17.5,
                    delta_x=3, nrg_func=EnergyFunc.LUMA_GRAD_NORM,
                    output_target=OutputTarget.NEW_IMAGE,
                    pres_layer="mymask", enl_step=1.25)
    colors = SeamColors(r1=0.5, g2=0.9)
    save_vals(store, cfg, colors)
    got, gcol = retrieve_vals(store)
    assert got.new_width == 321 and got.new_height == 123
    assert got.rigidity == 17.5 and got.delta_x == 3
    assert got.nrg_func == EnergyFunc.LUMA_GRAD_NORM
    assert got.output_target == OutputTarget.NEW_IMAGE
    assert got.enl_step == 1.25
    assert gcol.r1 == 0.5 and gcol.g2 == 0.9


def test_missing_store_yields_defaults(tmp_path):
    got, gcol = retrieve_vals(_store(tmp_path))
    assert got == LqrConfig()
    assert gcol == SeamColors()


def test_set_aux_layer_name_rule(tmp_path):
    """main.c:474-486: names persist only while the mask is in use."""
    store = _store(tmp_path)
    cfg = LqrConfig(pres_layer="p", disc_layer="d", rigmask_layer="r")
    stored = save_vals(store, cfg, disc_status=False)
    assert stored.pres_layer_name == "p"
    assert stored.disc_layer_name == ""        # disabled -> cleared
    assert stored.rigmask_layer_name == "r"
    got, _ = retrieve_vals(store)
    assert got.disc_layer_name == ""


def test_with_last_vals_name_resolution(tmp_path, make_image):
    """main.c:508-517: stored names re-resolve against the new image."""
    store = _store(tmp_path)
    save_vals(store, LqrConfig(pres_layer="mask-a", disc_layer="gone"))
    img = Image.from_array(make_image())
    img.add_layer(Layer("mask-a", np.zeros((8, 8, 4), np.uint8)), 0)
    img.active = "Background"
    cfg, _ = retrieve_vals_use_aux_layers_names(store, img)
    assert cfg.pres_layer == "mask-a"          # found by name
    assert cfg.disc_layer == ""                # no such layer -> unset


def test_gap_iterator_interop(tmp_path):
    """plug_in_lqr_iter.c:114: the iterator's write lands under the same
    key the next WITH_LAST_VALS run reads."""
    store = _store(tmp_path)
    from lqr_tpu.gap import interpolate
    blended = interpolate(LqrConfig(new_width=100),
                          LqrConfig(new_width=200), 10, 5.0)
    store_iterated_vals(store, blended)
    assert store.get_data(DATA_KEY_VALS)["new_width"] == blended.new_width
    got, _ = retrieve_vals(store)
    assert got.new_width == blended.new_width


def test_cli_save_and_replay(tmp_path, make_image):
    """--save-vals then --last replays size and mask-by-name."""
    from lqr_tpu.cli import main as cli_main
    from lqr_tpu.utils.image_io import save_image
    inp = tmp_path / "in.png"
    msk = tmp_path / "m.png"
    out1 = tmp_path / "o1.png"
    out2 = tmp_path / "o2.png"
    st = tmp_path / "s.json"
    save_image(str(inp), make_image(h=20, w=32))
    m = np.zeros((20, 32, 3), np.uint8)
    m[:, 10:14] = 255
    save_image(str(msk), m)
    rc = cli_main([str(inp), "28", "20", "--disc", str(msk),
                   "--save-vals", "--settings", str(st), "-o", str(out1)])
    assert rc == 0 and st.exists()
    rc = cli_main([str(inp), "--last", "--disc", str(msk),
                   "--settings", str(st), "-o", str(out2)])
    assert rc == 0
    from lqr_tpu.utils.image_io import load_image
    a, b = load_image(str(out1)), load_image(str(out2))
    assert a.shape == (20, 28, 3)
    assert np.array_equal(a, b)                # identical replay


def test_cli_last_without_store_uses_defaults_requires_nothing(tmp_path,
                                                               make_image,
                                                               capsys):
    from lqr_tpu.cli import main as cli_main
    from lqr_tpu.utils.image_io import save_image
    inp = tmp_path / "in.png"
    save_image(str(inp), make_image(h=20, w=32))
    # no store: defaults are 100x100 -> enlarging run still succeeds
    rc = cli_main([str(inp), "--last", "--settings",
                   str(tmp_path / "none.json"),
                   "-o", str(tmp_path / "o.png")])
    assert rc == 0
