"""Message catalog (the gettext-layer analog)."""

import json

import pytest

from lqr_tpu import i18n


@pytest.fixture(autouse=True)
def _clean(monkeypatch):
    i18n.reset()
    yield
    i18n.reset()


def test_untranslated_passthrough(monkeypatch):
    monkeypatch.delenv("LQR_TPU_LOCALE_FILE", raising=False)
    monkeypatch.delenv("LQR_TPU_LOCALE_DIR", raising=False)
    assert i18n._("Resizing width...") == "Resizing width..."


def test_catalog_file(tmp_path, monkeypatch):
    cat = tmp_path / "it.json"
    cat.write_text(json.dumps({"Resizing width...":
                               "Ridimensionamento larghezza..."}))
    monkeypatch.setenv("LQR_TPU_LOCALE_FILE", str(cat))
    i18n.reset()
    assert i18n._("Resizing width...") == "Ridimensionamento larghezza..."
    assert i18n._("unknown") == "unknown"


def test_locale_dir_language_lookup(tmp_path, monkeypatch):
    (tmp_path / "de.json").write_text(json.dumps({"error": "Fehler"}))
    monkeypatch.delenv("LQR_TPU_LOCALE_FILE", raising=False)
    monkeypatch.setenv("LQR_TPU_LOCALE_DIR", str(tmp_path))
    monkeypatch.setenv("LANGUAGE", "de_DE.UTF-8")
    i18n.reset()
    assert i18n._("error") == "Fehler"


def test_progress_message_is_translated(tmp_path, monkeypatch, make_image):
    cat = tmp_path / "xx.json"
    cat.write_text(json.dumps({"Resizing width...": "XX-WIDTH"}))
    monkeypatch.setenv("LQR_TPU_LOCALE_FILE", str(cat))
    i18n.reset()
    from lqr_tpu import Carver
    from lqr_tpu.progress import CollectingProgress
    c = Carver(make_image())
    p = CollectingProgress()
    c.set_progress(p)
    c.resize(c.width - 2, c.height)
    assert ("init", "XX-WIDTH") in p.events
