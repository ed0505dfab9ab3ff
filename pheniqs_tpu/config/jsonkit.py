"""JSON ontology primitives: merge, project, clean, sort, overlay — plus a
writer that reproduces the reference's serialization (RapidJSON PrettyWriter
with Grisu-shortest doubles clipped at a maximum number of decimal places).

Semantics mirror the reference JSON engine (reference json.cpp:780-935):

  merge(base, ontology)     recursively fill keys missing in `ontology` from
                            `base`; on conflict `ontology` wins; objects
                            recurse, scalars/arrays do not.
  project(template, onto)   build a new value with exactly the template's
                            keys; template nulls pull the ontology value,
                            template defaults fill gaps; arrays broadcast.
  clean(value)              drop nulls, empty strings, empty containers and
                            `false` booleans, recursively.
  sort(value)               recursive lexicographic key sort.
  overlay(base, overlay)    overlay wins, base fills gaps.
  remove_disabled(value)    drop any object with "disabled": true.

All functions are pure (return new values) since Python dicts are cheap to
rebuild and the compiler pipeline is explicitly staged.
"""

from __future__ import annotations

from decimal import Decimal

from ..errors import ConfigurationError


def merge_json(base, ontology):
    """Fill keys missing in `ontology` from `base`. `ontology` wins."""
    if base is None:
        return ontology
    if ontology is None:
        return _copy(base)
    if isinstance(base, dict):
        if not isinstance(ontology, dict):
            raise ConfigurationError("element is not a dictionary")
        result = {}
        for key, value in ontology.items():
            if key in base:
                try:
                    result[key] = merge_json(base[key], value)
                except ConfigurationError as error:
                    raise ConfigurationError(f"{key} {error.message}")
            else:
                result[key] = value
        for key, value in base.items():
            if key not in ontology:
                result[key] = _copy(value)
        # preserve ontology order first, then appended base keys - the
        # reference appends missing members in base order
        ordered = {k: result[k] for k in ontology}
        for k in base:
            if k not in ordered:
                ordered[k] = result[k]
        return ordered
    return ontology


def project_json(template, ontology):
    """Project `ontology` onto `template` (reference json.cpp:804-833)."""
    container = None
    if template is not None and ontology is not None:
        if isinstance(template, dict):
            if isinstance(ontology, dict):
                container = {}
                for key, value in template.items():
                    if key in ontology:
                        container[key] = project_json(value, ontology[key])
                    else:
                        container[key] = _copy(value)
            elif isinstance(ontology, list):
                container = [project_json(template, element) for element in ontology]
    if ontology is not None and container is None:
        container = _copy(ontology)
    return container


def clean_json(value):
    """Reference clean_json_value: nulls, false, empty strings/containers
    are removed; returns None when the value itself collapses."""
    if value is None:
        return None
    if value is False:
        return None
    if value is True or isinstance(value, (int, float)):
        return value
    if isinstance(value, str):
        return value if value else None
    if isinstance(value, dict):
        cleaned = {}
        for key, child in value.items():
            child = clean_json(child)
            if child is not None:
                cleaned[key] = child
        return cleaned if cleaned else None
    if isinstance(value, list):
        cleaned = [clean_json(element) for element in value]
        cleaned = [element for element in cleaned if element is not None]
        return cleaned if cleaned else None
    return value


def clean_json_object(value):
    cleaned = clean_json(value)
    return cleaned if cleaned is not None else {}


def sort_json(value):
    if isinstance(value, dict):
        return {key: sort_json(value[key]) for key in sorted(value)}
    if isinstance(value, list):
        return [sort_json(element) for element in value]
    return value


def overlay_json(ontology, overlay):
    """overlay wins; ontology fills gaps (reference overlay_json_object)."""
    if overlay is None:
        return ontology
    if not isinstance(overlay, dict):
        raise ConfigurationError("Overlay ontology root must be a dictionary")
    if not overlay:
        return ontology
    return merge_json(ontology, _copy(overlay))


_REMOVED = object()


def remove_disabled(value):
    """Public wrapper matching the reference: empty results stay as empty
    containers at the root."""

    def recurse(node):
        if isinstance(node, dict):
            if node.get("disabled") is True:
                return _REMOVED
            result = {}
            for key, child in node.items():
                kept = recurse(child)
                if kept is not _REMOVED:
                    result[key] = kept
            # reference: an object that became empty is removed
            return result if result else _REMOVED
        if isinstance(node, list):
            result = []
            for element in node:
                kept = recurse(element)
                if kept is not _REMOVED:
                    result.append(kept)
            return result if result else _REMOVED
        return node

    result = recurse(value)
    return {} if result is _REMOVED else result


def _copy(value):
    if isinstance(value, dict):
        return {k: _copy(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_copy(v) for v in value]
    return value


# ---------------------------------------------------------------------------
# Serialization: RapidJSON PrettyWriter compatible
# ---------------------------------------------------------------------------

_ESCAPES = {
    '"': '\\"',
    "\\": "\\\\",
    "\b": "\\b",
    "\f": "\\f",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}


def _escape_string(value: str) -> str:
    out = []
    for ch in value:
        if ch in _ESCAPES:
            out.append(_ESCAPES[ch])
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    return "".join(out)


def dtoa(value: float, max_decimal_places: int = 324) -> str:
    """Format a double the way RapidJSON's dtoa does: shortest round-trip
    digits, prettified, clipped at max_decimal_places decimal places
    (rapidjson internal/dtoa.h Prettify)."""
    if value != value or value in (float("inf"), float("-inf")):
        return "null"
    if value == 0.0:
        return "-0.0" if str(value)[0] == "-" else "0.0"
    sign = ""
    if value < 0:
        sign = "-"
        value = -value

    # shortest digits + exponent: value = 0.<digits> * 10^kk
    tup = Decimal(repr(value)).as_tuple()
    digits = "".join(map(str, tup.digits)).rstrip("0") or "0"
    stripped = len(tup.digits) - len(digits)
    k = tup.exponent + stripped  # value = digits * 10^k
    length = len(digits)
    kk = length + k

    if 0 <= k and kk <= 21:
        # 1234e7 -> 12340000000.0
        body = digits + "0" * (kk - length) + ".0"
    elif 0 < kk <= 21:
        # 1234e-2 -> 12.34
        if k + max_decimal_places < 0:
            keep = digits[: kk + max_decimal_places].rstrip("0")
            if len(keep) <= kk:
                body = digits[:kk] + ".0"
            else:
                body = keep[:kk] + "." + keep[kk:]
        else:
            body = digits[:kk] + "." + digits[kk:]
    elif -6 < kk <= 0:
        # 1234e-6 -> 0.001234
        if length - kk > max_decimal_places:
            keep = ("0" * -kk + digits)[:max_decimal_places].rstrip("0")
            body = "0." + (keep if keep else "0")
        else:
            body = "0." + "0" * -kk + digits
    elif kk < -max_decimal_places:
        body = "0.0"
    elif length == 1:
        body = digits + "e" + _write_exponent(kk - 1)
    else:
        body = digits[0] + "." + digits[1:] + "e" + _write_exponent(kk - 1)
    return sign + body


def _write_exponent(k: int) -> str:
    return str(k)


def write_json(value, precision: int = 324, indent: int = 4) -> str:
    """Serialize like the reference's print_json: PrettyWriter with 4-space
    indent and SetMaxDecimalPlaces(precision). No trailing newline."""
    out: list[str] = []

    def emit(node, level):
        pad = " " * (indent * level)
        if node is None:
            out.append("null")
        elif node is True:
            out.append("true")
        elif node is False:
            out.append("false")
        elif isinstance(node, str):
            out.append('"' + _escape_string(node) + '"')
        elif isinstance(node, bool):  # pragma: no cover - handled above
            out.append("true" if node else "false")
        elif isinstance(node, int):
            out.append(str(node))
        elif isinstance(node, float):
            out.append(dtoa(node, precision))
        elif isinstance(node, dict):
            if not node:
                out.append("{}")
                return
            out.append("{\n")
            inner = " " * (indent * (level + 1))
            first = True
            for key, child in node.items():
                if not first:
                    out.append(",\n")
                first = False
                out.append(inner + '"' + _escape_string(key) + '": ')
                emit(child, level + 1)
            out.append("\n" + pad + "}")
        elif isinstance(node, list):
            if not node:
                out.append("[]")
                return
            out.append("[\n")
            inner = " " * (indent * (level + 1))
            first = True
            for child in node:
                if not first:
                    out.append(",\n")
                first = False
                out.append(inner)
                emit(child, level + 1)
            out.append("\n" + pad + "]")
        else:
            raise ConfigurationError(f"cannot serialize {type(node)}")

    emit(value, 0)
    return "".join(out)
