"""Minimal JSONPath resolution for ON JSON indexes.

Reference: ReJSON API consumption (src/json.c, rejson_api.h) — schema
fields of JSON indexes are JSONPaths like `$.title` or `$.tags[*]`,
usually aliased with AS.  Supported subset: `$`, `.name`, `[N]`, `[*]`
(fans out to a list), and `..name` is not supported.
"""

from __future__ import annotations

import re
from typing import Any

_TOKEN = re.compile(r"\.([A-Za-z_][\w-]*)|\[(\d+)\]|\[(\*)\]")


def is_json_path(name: str) -> bool:
    return name.startswith("$")


def resolve(doc: Any, path: str):
    """Resolve a JSONPath against a dict/list document.  Returns the value,
    a list of values (for [*]), or None."""
    if not is_json_path(path):
        return doc.get(path) if isinstance(doc, dict) else None
    cur = [doc]
    pos = 1  # skip '$'
    while pos < len(path):
        m = _TOKEN.match(path, pos)
        if m is None:
            return None
        name, idx, star = m.groups()
        nxt = []
        for c in cur:
            if name is not None and isinstance(c, dict) and name in c:
                nxt.append(c[name])
            elif idx is not None and isinstance(c, list):
                i = int(idx)
                if i < len(c):
                    nxt.append(c[i])
            elif star is not None and isinstance(c, list):
                nxt.extend(c)
        cur = nxt
        pos = m.end()
    if not cur:
        return None
    if len(cur) == 1 and "[*]" not in path:
        return cur[0]
    return cur


def get_field_value(fields: dict, name: str):
    """Field lookup that understands both flat hash names and JSONPaths."""
    if name in fields:
        return fields[name]
    if is_json_path(name):
        return resolve(fields, name)
    return None
