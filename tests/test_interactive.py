"""Interactive session (dialog_I equivalent) and progress protocol tests."""

import numpy as np

from lqr_tpu.config import LqrConfig
from lqr_tpu.image_model import Image
from lqr_tpu.interactive import InteractiveSession
from lqr_tpu.progress import CollectingProgress
from lqr_tpu import Carver


def test_interactive_session_flow(make_image):
    base = make_image(h=20, w=30)
    sess = InteractiveSession(Image.from_array(base))
    sess.set_size(24, 20)
    layer = sess.image.layer_by_name("Background")
    assert layer.pixels.shape == (20, 24, 3)

    info = sess.map_info()
    assert info.orientation == 0 and info.depth == 6
    assert (info.range_min, info.range_max) == (24, 36)
    assert "reference 30" in info.describe()

    # back to reference size reproduces the original (map never reset)
    sess.reset_size()
    assert np.array_equal(sess.image.layer_by_name("Background").pixels,
                          base)

    # map reset = flatten; size-reset afterwards no longer reproduces
    sess.set_size(24, 20)
    sess.reset_map()
    assert sess.map_info().depth == 0
    sess.reset_size()
    assert sess.image.layer_by_name("Background").pixels.shape == (20, 30, 3)
    assert not np.array_equal(
        sess.image.layer_by_name("Background").pixels, base)


def test_interactive_dump_and_back(make_image):
    sess = InteractiveSession(Image.from_array(make_image(h=16, w=24)))
    sess.set_size(20, 16)
    assert sess.dump_seam_map()
    assert sess.image.layer_by_name("Background seam map") is not None
    # dumping again reuses the same layer (interface_I.c behavior)
    n_layers = len(sess.image.layers)
    sess.set_size(18, 16)
    assert sess.dump_seam_map()
    assert len(sess.image.layers) == n_layers

    img, cfg = sess.back()
    assert cfg.output_target == 0


def test_interactive_debounce(make_image):
    sess = InteractiveSession(Image.from_array(make_image(h=12, w=20)),
                              debounce_s=10.0)
    sess.set_size(16, 12)
    assert sess.tick() is None          # not settled yet
    layer = sess.image.layer_by_name("Background")
    assert layer.pixels.shape == (12, 20, 3)
    sess.flush()                        # force apply
    assert sess.image.layer_by_name("Background").pixels.shape == (12, 16, 3)


def test_progress_callbacks(make_image):
    img = make_image(h=16, w=40)
    prog = CollectingProgress()
    c = Carver(img)
    c.set_progress(prog)
    c.resize(20, 16)
    kinds = [e[0] for e in prog.events]
    assert kinds[0] == "init" and kinds[-1] == "end"
    assert prog.events[0][1] == "Resizing width..."
    fracs = [e[1] for e in prog.events if e[0] == "update"]
    assert fracs == sorted(fracs) and abs(fracs[-1] - 1.0) < 1e-9
