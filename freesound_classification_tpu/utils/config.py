"""Nested attribute-access config tree (the reference's mag config).

The reference passes a nested dict {network, data, train, label} into
``mag.Experiment`` and accesses it as ``config.network.num_conv_blocks``
(train_2d_cnn.py:194-232). This module provides the same dict <-> namespace
round trip plus the flattening used for experiment naming and dotted result
keys.
"""

from __future__ import annotations

import json
from typing import Any, Mapping


class Config:
    """Read-only nested attribute access over a dict."""

    def __init__(self, data: Mapping[str, Any]):
        object.__setattr__(self, "_data", dict(data))

    def __getattr__(self, name: str):
        try:
            value = self._data[name]
        except KeyError:
            raise AttributeError(name)
        if isinstance(value, Mapping):
            return Config(value)
        return value

    def __getitem__(self, name: str):
        return getattr(self, name)

    def __contains__(self, name: str) -> bool:
        return name in self._data

    def __setattr__(self, name, value):
        raise AttributeError("Config is read-only")

    def as_dict(self) -> dict:
        return json.loads(json.dumps(self._data))

    def __repr__(self) -> str:
        return "Config(" + json.dumps(self._data, indent=2, sort_keys=True) + ")"


def flatten(data: Mapping[str, Any], prefix: str = "") -> dict:
    """{"a": {"b": 1}} -> {"a.b": 1}."""
    out = {}
    for key in sorted(data):
        value = data[key]
        full = f"{prefix}{key}"
        if isinstance(value, Mapping):
            out.update(flatten(value, full + "."))
        else:
            out[full] = value
    return out


def unflatten(data: Mapping[str, Any]) -> dict:
    out: dict = {}
    for key, value in data.items():
        parts = key.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def _format_value(value: Any) -> str:
    if isinstance(value, bool):
        return str(value)
    if isinstance(value, float):
        s = f"{value:g}"
        return s
    return str(value)


def config_name(data: Mapping[str, Any], separator: str = "-") -> str:
    """Deterministic experiment directory name from config values.

    mag semantics (reference README.md:129-146 + mag.use_custom_separator("-"),
    train_2d_cnn.py:30): the name is built from config *values* whose key path
    contains no underscore-prefixed component (those are config-only), joined
    by the separator, in sorted flattened-key order.
    """
    flat = flatten(data)
    parts = []
    for key in sorted(flat):
        if any(p.startswith("_") for p in key.split(".")):
            continue
        parts.append(_format_value(flat[key]))
    name = separator.join(parts)
    # keep it filesystem-safe
    return name.replace("/", "_").replace(" ", "_") or "experiment"
