"""Extract the msgid set — the xgettext analog for the JSON catalogs.

Scans every lqr_tpu module for literal ``_("...")`` calls (the gettext
convention, /root/reference/configure.ac:85-88) and writes/updates the
catalog template ``lqr_tpu/locale/TEMPLATE.json`` mapping each msgid to "".
Existing language catalogs are checked for missing / stale entries.

Usage: python scripts/extract_messages.py [--check]
"""

from __future__ import annotations

import ast
import json
import os
import sys

PKG = os.path.join(os.path.dirname(__file__), "..", "lqr_tpu")
LOCALE = os.path.join(PKG, "locale")


def extract(path: str) -> set:
    with open(path, encoding="utf-8") as f:
        tree = ast.parse(f.read(), filename=path)
    ids = set()
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Name)
                and node.func.id in ("_", "N_")
                and len(node.args) == 1):
            a = node.args[0]
            if isinstance(a, ast.Constant) and isinstance(a.value, str):
                ids.add(a.value)
            elif isinstance(a, ast.JoinedStr):
                print(f"warning: f-string inside _() at {path}:{a.lineno} "
                      f"cannot be extracted; use .format()",
                      file=sys.stderr)
    return ids


def main(argv=None) -> int:
    check = "--check" in (argv or sys.argv[1:])
    msgids = set()
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                msgids |= extract(os.path.join(root, f))
    template = {m: "" for m in sorted(msgids)}
    tpath = os.path.join(LOCALE, "TEMPLATE.json")
    os.makedirs(LOCALE, exist_ok=True)

    rc = 0
    if check:
        with open(tpath, encoding="utf-8") as f:
            cur = json.load(f)
        if set(cur) != msgids:
            print(f"TEMPLATE.json is stale: missing={sorted(msgids - set(cur))} "
                  f"extra={sorted(set(cur) - msgids)}")
            rc = 1
    else:
        with open(tpath, "w", encoding="utf-8") as f:
            json.dump(template, f, indent=2, ensure_ascii=False)
            f.write("\n")
        print(f"wrote {tpath} ({len(msgids)} msgids)")

    for fn in sorted(os.listdir(LOCALE)):
        if not fn.endswith(".json") or fn == "TEMPLATE.json":
            continue
        with open(os.path.join(LOCALE, fn), encoding="utf-8") as f:
            cat = json.load(f)
        missing = msgids - set(cat)
        stale = set(cat) - msgids
        if missing or stale:
            print(f"{fn}: missing={sorted(missing)} stale={sorted(stale)}")
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
