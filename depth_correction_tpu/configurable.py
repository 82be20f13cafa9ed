"""Layered configuration base class.

Round-trips between attribute dicts, YAML files/strings, and CLI arguments,
mirroring the behavior of the reference config system
(reference: src/depth_correction/configurable.py:30-179) without the ROS
(rosparam / roslaunch) transports.

Precedence when composing (left overridden by right):
defaults <- YAML file <- CLI ``--kebab-case`` args (values parsed as YAML).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Iterable, List, Optional

import yaml

__all__ = ["Configurable", "ValueEnum"]


class ValueEnum(type):
    """Metaclass turning a class of string constants into an iterable enum.

    Members are the class attributes not starting with an underscore; their
    values are plain strings so they serialize trivially to YAML
    (reference: configurable.py:16-22).
    """

    def __iter__(cls):
        for name in vars(cls):
            if not name.startswith("_"):
                yield getattr(cls, name)

    def __contains__(cls, item):
        return item in iter(cls)


def _parse_value(value: str) -> Any:
    """Parse a CLI string as a YAML value (handles .inf/.nan/null/lists)."""
    try:
        return yaml.safe_load(value)
    except yaml.YAMLError:
        return value


class Configurable:
    """Base class for attribute-bag configs with layered loading."""

    def keys(self) -> List[str]:
        return [k for k in vars(self) if not k.startswith("_")]

    # --- dict -----------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return {k: getattr(self, k) for k in self.keys()}

    def from_dict(self, d: Dict[str, Any], strict: bool = False) -> "Configurable":
        for k, v in d.items():
            if strict and not hasattr(self, k):
                raise KeyError("Unknown config key: %s" % k)
            setattr(self, k, v)
        return self

    # --- YAML -----------------------------------------------------------
    def to_yaml(self, path: Optional[str] = None) -> str:
        text = yaml.safe_dump(self.to_dict(), default_flow_style=None)
        if path is not None:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            with open(path, "w") as f:
                f.write(text)
        return text

    def from_yaml(self, path_or_str: str) -> "Configurable":
        if isinstance(path_or_str, str) and os.path.exists(path_or_str):
            with open(path_or_str) as f:
                d = yaml.safe_load(f)
        else:
            d = yaml.safe_load(path_or_str)
        if d:
            self.from_dict(d)
        return self

    # --- CLI ------------------------------------------------------------
    def from_args(self, argv: Iterable[str]) -> List[str]:
        """Consume ``--kebab-case value`` pairs; returns unused args.

        Values are parsed as YAML, so ``--nn-r .inf`` or
        ``--eigenvalue-bounds "[[0, null, 1.0]]"`` work.
        """
        argv = list(argv)
        rest: List[str] = []
        i = 0
        while i < len(argv):
            arg = argv[i]
            if arg.startswith("--"):
                key = arg[2:].replace("-", "_")
                if hasattr(self, key) and i + 1 < len(argv):
                    setattr(self, key, _parse_value(argv[i + 1]))
                    i += 2
                    continue
            rest.append(arg)
            i += 1
        return rest

    # --- utilities ------------------------------------------------------
    def copy(self) -> "Configurable":
        # Deep, like the reference (configurable.py:178-179): a shallow
        # copy would alias dict/list-valued fields (loss_kwargs, *_names)
        # across grid experiments, so an in-place tweak on one would
        # silently corrupt the whole sweep.
        import copy as _copy

        return _copy.deepcopy(self)

    def diff(self, other: "Configurable") -> Dict[str, Any]:
        """Keys whose values differ from ``other`` (values from self)."""
        return {
            k: getattr(self, k)
            for k in self.keys()
            if getattr(self, k) != getattr(other, k, None)
        }

    def non_default(self) -> Dict[str, Any]:
        return self.diff(type(self)())

    def __eq__(self, other):
        return isinstance(other, Configurable) and self.to_dict() == other.to_dict()

    def __str__(self):
        return "%s(%s)" % (
            type(self).__name__,
            ", ".join("%s=%r" % kv for kv in sorted(self.non_default().items())),
        )
