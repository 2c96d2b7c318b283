"""Message catalog — the gettext layer (i18n).

The reference localizes its user-facing strings through gettext under the
domain ``gimp20-lqr-plugin`` with 15 shipped languages
(/root/reference/configure.ac:85-91, po/). This framework keeps the same
contract with a dependency-free catalog: every user-facing string goes
through ``_()``, and a JSON catalog ({msgid: msgstr}) supplies
translations. The catalog is looked up from:

1. ``LQR_TPU_LOCALE_FILE`` — an explicit catalog path;
2. ``$LQR_TPU_LOCALE_DIR/<lang>.json`` with <lang> from ``LANGUAGE`` /
   ``LC_ALL`` / ``LANG`` (the gettext search order).

No catalogs ship by default (translations are contributions, exactly as
the reference's po/ files were); an untranslated msgid passes through.
"""

from __future__ import annotations

import json
import os

DOMAIN = "lqr-tpu"   # the gimp20-lqr-plugin analog

_catalog: dict | None = None


def _lang() -> str:
    for var in ("LANGUAGE", "LC_ALL", "LC_MESSAGES", "LANG"):
        v = os.environ.get(var)
        if v and v != "C":
            return v.split(":")[0].split(".")[0]
    return ""


def _load() -> dict:
    global _catalog
    if _catalog is not None:
        return _catalog
    path = os.environ.get("LQR_TPU_LOCALE_FILE")
    if not path:
        d = os.environ.get("LQR_TPU_LOCALE_DIR")
        lang = _lang()
        if d and lang:
            for cand in (lang, lang.split("_")[0]):
                p = os.path.join(d, f"{cand}.json")
                if os.path.exists(p):
                    path = p
                    break
    cat = {}
    if path:
        try:
            with open(path) as f:
                cat = {str(k): str(v) for k, v in json.load(f).items()}
        except (OSError, ValueError):
            cat = {}
    _catalog = cat
    return cat


def reset():
    """Drop the cached catalog (tests / locale switches)."""
    global _catalog
    _catalog = None


def _(msgid: str) -> str:
    """gettext(): translate a user-facing string."""
    return _load().get(msgid, msgid)
