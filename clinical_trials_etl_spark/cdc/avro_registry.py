"""Parse real Avro record schemas into the engine's registry model.

The north rule mandates "Avro-schema-registry-driven column evolution":
the change stream's producer publishes Avro record schemas to a
registry (Confluent-style: subject -> ordered versions), and the
ingest job resolves each version into Iceberg-style add/rename/widen
DDL. ``cdc/registry.py`` holds the resolution algebra over field-id
lists; THIS module is the front end that turns actual Avro schema JSON
into those lists, so a deployment can point the job at a registry dump
instead of hand-writing field lists.

Field identity: Avro has no native rename marker — writers that need
evolution-safe identity annotate each field with a ``field-id``
integer attribute, the convention Apache Iceberg uses when it embeds
its schemas in Avro manifest files (Iceberg spec, "Avro: field ids are
stored as the ``field-id`` prop"). We require it: without ids, a
rename is indistinguishable from drop+add, which is exactly the
ambiguity the registry exists to remove (reference analog: the
``standardize_keys`` rename map, utils/cleaner.py — key renames there
are hand-listed; field-ids are the schema-registry-native spelling).

Type mapping (Avro -> lake physical types, lake/table.py::_TYPES):

  ``string``->string   ``int``->int      ``long``->long
  ``double``->double   ``bytes``->binary ``boolean``->boolean
  ``float``->double    (Avro schema-resolution promotion float->double;
                        the lake has no float32 physical type)
  ``{"type":"long","logicalType":"timestamp-micros"|"timestamp-millis"}``
                       ->timestamp
  ``["null", X]``      ->X (all lake columns are nullable)

Anything else (records, arrays, maps, enums, fixed, multi-branch
unions) raises — the change-event transport is flat by design
(TRANSPORT_SCHEMA, cdc/stream.py); nested payloads belong inside the
``html`` binary column, not the envelope.

Registry file format accepted by ``load_avro_registry`` (both):

  {"1": <avro schema or json-string>, "2": ...}          # plain map
  {"subject": "pages-value",
   "versions": [{"version": 1, "schema": "<json str>"}]}  # Confluent
                                                          # subject dump
"""

from __future__ import annotations

import json

_PRIMITIVES = {
    "string": "string",
    "int": "int",
    "long": "long",
    "double": "double",
    "float": "double",  # Avro resolution promotes float -> double
    "bytes": "binary",
    "boolean": "boolean",
}

_TIMESTAMP_LOGICAL = {"timestamp-micros", "timestamp-millis"}


def _resolve_type(t, field_name: str) -> str:
    """One Avro field type -> lake physical type name."""
    # nullable union: ["null", X] in either order
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        if len(t) > 2 or len(branches) != 1:
            raise ValueError(
                f"field {field_name!r}: only nullable unions "
                f'["null", X] are supported, got {t!r}')
        return _resolve_type(branches[0], field_name)
    if isinstance(t, dict):
        logical = t.get("logicalType")
        base = t.get("type")
        if logical in _TIMESTAMP_LOGICAL and base == "long":
            return "timestamp"
        if logical is None and isinstance(base, (str, list, dict)):
            # Avro allows wrapping a type in {"type": X}
            return _resolve_type(base, field_name)
        raise ValueError(
            f"field {field_name!r}: unsupported Avro type {t!r} "
            f"(flat transport only — nest payloads in the binary "
            f"column, not the envelope)")
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return _PRIMITIVES[t]
        raise ValueError(
            f"field {field_name!r}: unsupported Avro type {t!r}")
    raise ValueError(f"field {field_name!r}: malformed type {t!r}")


def parse_avro_schema(schema) -> list[dict]:
    """Avro record schema (dict or JSON string) -> the registry's
    field list ``[{"id", "name", "type"}, ...]`` in declaration order.

    Requires a ``field-id`` int on every field (see module docstring);
    duplicate ids and non-record schemas raise."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise ValueError(
            f"expected an Avro record schema, got "
            f"{schema.get('type') if isinstance(schema, dict) else schema!r}")
    fields = schema.get("fields")
    if not isinstance(fields, list) or not fields:
        raise ValueError("record schema has no fields")
    out: list[dict] = []
    seen_ids: set[int] = set()
    for f in fields:
        name = f.get("name")
        if not name:
            raise ValueError(f"field without a name: {f!r}")
        fid = f.get("field-id")
        if not isinstance(fid, int) or isinstance(fid, bool):
            raise ValueError(
                f"field {name!r} has no integer 'field-id' attribute — "
                f"rename-safe evolution needs stable ids (Iceberg Avro "
                f"convention); refusing to guess identity by position")
        if fid in seen_ids:
            raise ValueError(f"duplicate field-id {fid} (field {name!r})")
        seen_ids.add(fid)
        out.append({"id": fid, "name": name,
                    "type": _resolve_type(f["type"], name)})
    return out


def to_avro_schema(fields: list[dict], name: str = "pages",
                   namespace: str = "cdc") -> dict:
    """Inverse of ``parse_avro_schema`` for publishing the table's
    current shape back to a registry: every field nullable
    (``["null", X]`` with null default), ``field-id`` attached,
    timestamp as ``timestamp-micros``. ``parse_avro_schema(
    to_avro_schema(fields)) == fields`` (pinned in tests)."""
    inv = {"string": "string", "int": "int", "long": "long",
           "double": "double", "binary": "bytes", "boolean": "boolean"}
    av_fields = []
    for f in fields:
        if f["type"] == "timestamp":
            t = {"type": "long", "logicalType": "timestamp-micros"}
        else:
            t = inv[f["type"]]
        av_fields.append({
            "name": f["name"],
            "type": ["null", t],
            "default": None,
            "field-id": f["id"],
        })
    return {"type": "record", "name": name, "namespace": namespace,
            "fields": av_fields}


def registry_from_avro(versions: dict) -> dict[int, list[dict]]:
    """{version -> avro schema (dict|json-string)} -> the registry
    shape ``cdc/registry.py`` consumes. Keys may be ints or numeric
    strings (JSON object keys). Every consecutive version pair is
    validated through ``registry.diff`` at load time, so an
    incompatible registry (narrowing, field removal, id reuse as a
    different concept) fails at startup — before any stream starts —
    not mid-ingest."""
    from clinical_trials_etl_spark.cdc import registry as reg

    out: dict[int, list[dict]] = {}
    for k, schema in versions.items():
        ver = int(k)
        if ver in out:
            raise ValueError(f"duplicate registry version {ver}")
        out[ver] = parse_avro_schema(schema)
    order = sorted(out)
    for lo, hi in zip(order, order[1:]):
        reg.diff(out[lo], out[hi])  # raises on incompatible evolution
    return out


def load_avro_registry(path: str) -> dict[int, list[dict]]:
    """Read a registry dump file (plain map or Confluent subject dump —
    see module docstring) and return the resolved registry."""
    with open(path) as f:
        doc = json.load(f)
    if isinstance(doc, dict) and "versions" in doc:
        versions = {v["version"]: v["schema"] for v in doc["versions"]}
    elif isinstance(doc, dict):
        versions = doc
    else:
        raise ValueError(
            f"unrecognized registry file shape in {path}: "
            f"expected an object")
    return registry_from_avro(versions)
