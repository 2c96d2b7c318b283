"""Size-entry / coordinates model (altsizeentry/altcoordinates laws)."""

import numpy as np
import pytest

from lqr_tpu.errors import LqrConfigError
from lqr_tpu.sizeentry import SizeEntry, Coordinates, Unit, parse_size


def test_unit_conversions():
    e = SizeEntry(144, base=144, resolution=72.0)
    assert e.value == 144                      # pixels
    e.set_unit(Unit.INCH)
    assert e.value == 2.0                      # 144 px @ 72 dpi
    e.set_unit(Unit.MM)
    assert abs(e.value - 50.8) < 1e-9
    e.set_unit(Unit.PERCENT)
    assert e.value == 100.0
    e.set_value(50)
    assert e.refval == 72.0


def test_refval_clamped():
    e = SizeEntry(10, lower=1, upper=100)
    e.set_refval(0)
    assert e.refval == 1
    e.set_refval(500)
    assert e.refval == 100


def test_chain_ratio_law():
    """alt_coordinates_callback (altcoordinates.c:54-80): editing one
    field scales the other by the ORIGINAL ratio."""
    c = Coordinates(400, 300, chain_active=True)
    c.set_width(200)
    assert (c.width, c.height) == (200, 150)
    c.set_height(60)
    assert (c.width, c.height) == (80, 60)
    # ROUND-based change detection: sub-half-pixel edits don't propagate
    c.set_width(80.2)
    assert c.height == 60


def test_chain_equality_mode():
    c = Coordinates(400, 300, chain_active=True,
                    chain_constrains_ratio=False)
    c.set_width(123)
    assert (c.width, c.height) == (123, 123)
    c.set_height(77)
    assert (c.width, c.height) == (77, 77)


def test_chain_inactive_is_free():
    c = Coordinates(400, 300, chain_active=False)
    c.set_width(100)
    assert (c.width, c.height) == (100, 300)


def test_reset():
    c = Coordinates(400, 300, chain_active=True)
    c.set_width(100)
    c.reset()
    assert (c.width, c.height) == (400, 300)
    c.set_width(200)                          # chain still live after reset
    assert c.height == 150


def test_percent_unit_via_chain():
    c = Coordinates(400, 300, chain_active=True)
    c.set_width(75, unit=Unit.PERCENT)
    assert (c.width, c.height) == (300, 225)


def test_parse_size():
    assert parse_size("400", 1000) == 400
    assert parse_size("75%", 400) == 300
    assert parse_size("150%", 10) == 15
    with pytest.raises(LqrConfigError):
        parse_size("abc", 100)


def test_cli_percent_sizes(tmp_path, make_image):
    from lqr_tpu.cli import main as cli_main
    from lqr_tpu.utils.image_io import save_image, load_image
    inp = tmp_path / "in.png"
    save_image(str(inp), make_image(h=20, w=40))
    rc = cli_main([str(inp), "75%", "100%", "-o", str(tmp_path / "o.png")])
    assert rc == 0
    assert load_image(str(tmp_path / "o.png")).shape == (20, 30, 3)
