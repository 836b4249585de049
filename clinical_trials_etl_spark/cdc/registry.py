"""Avro-style schema registry for the change stream (SURVEY.md §2.9 /
§7 stage 5 — the F14 ``standardize_keys`` rename analog, upgraded with
explicit field-ids so rename vs drop+add is never ambiguous, the
'hard part' flagged in SURVEY.md §7).

Each ``schema_ver`` carried by a change event maps to a field list.
Field identity is the ``id``; a changed ``name`` for the same id is a
RENAME, a changed ``type`` (within the widening lattice) is a WIDEN,
a new id is an ADD. Removals are not supported (append-only registry,
like Avro compatibility=BACKWARD).

Registry for the synthetic web-page stream (FIXTURES.md §2):
  v1: url, warc_ts, html, text, lang
  v2: + fetch_status int
  v3: lang -> language (rename, same id)
  v4: fetch_status int -> long (widen)
"""

from __future__ import annotations

_WIDENS = {("int", "long"), ("int", "double"), ("long", "double"), ("float", "double")}


def _v1():
    return [
        {"id": 1, "name": "url", "type": "string"},
        {"id": 2, "name": "warc_ts", "type": "timestamp"},
        {"id": 3, "name": "html", "type": "binary"},
        {"id": 4, "name": "text", "type": "string"},
        {"id": 5, "name": "lang", "type": "string"},
    ]


def _v2():
    return _v1() + [{"id": 6, "name": "fetch_status", "type": "int"}]


def _v3():
    out = []
    for f in _v2():
        f = dict(f)
        if f["id"] == 5:
            f["name"] = "language"
        out.append(f)
    return out


def _v4():
    out = []
    for f in _v3():
        f = dict(f)
        if f["id"] == 6:
            f["type"] = "long"
        out.append(f)
    return out


PAGES_REGISTRY: dict[int, list[dict]] = {1: _v1(), 2: _v2(), 3: _v3(), 4: _v4()}


def schema_for_version(ver: int, registry: dict[int, list[dict]] | None = None):
    registry = registry or PAGES_REGISTRY
    if ver not in registry:
        raise KeyError(f"unknown schema_ver {ver}")
    return registry[ver]


def diff(current: list[dict], target: list[dict]) -> list[dict]:
    """Evolution ops to take a table on ``current`` to ``target``.
    Ops: {op: add|rename|widen, ...}. Raises on narrowing or id removal
    (incompatible evolution must fail loudly, not corrupt)."""
    cur_by_id = {f["id"]: f for f in current}
    ops: list[dict] = []
    for f in target:
        old = cur_by_id.get(f["id"])
        if old is None:
            ops.append({"op": "add", "field": dict(f)})
            continue
        if old["name"] != f["name"]:
            ops.append(
                {"op": "rename", "id": f["id"], "from": old["name"], "to": f["name"]}
            )
        if old["type"] != f["type"]:
            if (old["type"], f["type"]) not in _WIDENS:
                raise ValueError(
                    f"incompatible type change for field id {f['id']}: "
                    f"{old['type']} -> {f['type']}"
                )
            ops.append(
                {
                    "op": "widen",
                    "id": f["id"],
                    "name": f["name"],
                    "from": old["type"],
                    "to": f["type"],
                }
            )
    target_ids = {f["id"] for f in target}
    dropped = set(cur_by_id) - target_ids
    if dropped:
        raise ValueError(f"field removal not supported: ids {sorted(dropped)}")
    return ops


def apply_ops(current: list[dict], ops: list[dict]) -> list[dict]:
    out = [dict(f) for f in current]
    by_id = {f["id"]: f for f in out}
    for op in ops:
        if op["op"] == "add":
            out.append(dict(op["field"]))
            by_id[op["field"]["id"]] = out[-1]
        elif op["op"] == "rename":
            by_id[op["id"]]["name"] = op["to"]
        elif op["op"] == "widen":
            by_id[op["id"]]["type"] = op["to"]
        else:
            raise ValueError(f"unknown op {op}")
    return out
