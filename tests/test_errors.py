"""Typed error discipline at the API + CLI boundaries (render.c:42-62,
main.h:131-153 analog)."""

import numpy as np
import pytest

from lqr_tpu import Carver, LqrConfigError, LqrImageError
from lqr_tpu.cli import main as cli_main


def test_bad_channels_raises(make_image):
    img = np.zeros((16, 16, 5), np.uint8)
    with pytest.raises(LqrImageError, match="5 channels"):
        Carver(img)


def test_bad_delta_x_raises(make_image):
    with pytest.raises(LqrConfigError, match="delta_x"):
        Carver(make_image(), delta_x=11)


def test_negative_rigidity_raises(make_image):
    with pytest.raises(LqrConfigError, match="rigidity"):
        Carver(make_image(), rigidity=-1.0)


def test_bad_enl_step_raises(make_image):
    c = Carver(make_image())
    with pytest.raises(LqrConfigError, match="enl_step"):
        c.set_enl_step(2.5)


def test_attach_size_mismatch_raises(make_image):
    c = Carver(make_image(h=24, w=32))
    with pytest.raises(LqrImageError, match="must match the main size"):
        c.attach(np.zeros((10, 10, 1), np.uint8))


def test_resize_to_zero_raises(make_image):
    c = Carver(make_image())
    with pytest.raises(LqrConfigError, match="target width"):
        c.resize(0, 10)


def test_cli_bad_size_exits_cleanly(tmp_path, make_image, capsys):
    from lqr_tpu.utils.image_io import save_image
    p = tmp_path / "in.png"
    save_image(str(p), make_image())
    rc = cli_main([str(p), "0", "10"])
    assert rc == 1
    assert "error" in capsys.readouterr().err


def test_cli_missing_mask_file_exits_cleanly(tmp_path, make_image, capsys):
    from lqr_tpu.utils.image_io import save_image
    p = tmp_path / "in.png"
    save_image(str(p), make_image())
    rc = cli_main([str(p), "10", "10", "--disc", "/nonexistent.png"])
    assert rc == 1
    assert "no such file" in capsys.readouterr().err


def test_cli_bad_offset_exits_cleanly(tmp_path, make_image, capsys):
    from lqr_tpu.utils.image_io import save_image
    p = tmp_path / "in.png"
    m = tmp_path / "m.png"
    save_image(str(p), make_image())
    save_image(str(m), make_image())
    rc = cli_main([str(p), "10", "10", "--disc", str(m),
                   "--disc-offset", "zap"])
    assert rc == 1
    assert "X,Y" in capsys.readouterr().err


def test_cli_bad_seam_colors_exits_cleanly(tmp_path, make_image, capsys):
    from lqr_tpu.utils.image_io import save_image
    p = tmp_path / "in.png"
    save_image(str(p), make_image())
    rc = cli_main([str(p), "10", "10", "--seams", "--seam-colors", "1,0"])
    assert rc == 1
    assert "6 comma-separated" in capsys.readouterr().err
