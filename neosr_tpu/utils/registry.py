"""String -> object registries.

Plays the same role as the reference's registry (see
/root/reference/neosr/utils/registry.py:8-107): TOML `type = "..."` strings
are resolved to architecture / dataset / model / loss / metric factories at
build time.  Registration happens via decorator at import time; duplicate
names raise.  A `name_tpu` suffix fallback mirrors the reference's
`name_neosr` fallback so configs written against either spelling resolve.
"""

from __future__ import annotations

from typing import Any, Callable


class Registry:
    """A name -> callable mapping with decorator-based registration."""

    def __init__(self, name: str) -> None:
        self._name = name
        self._obj_map: dict[str, Any] = {}

    def _do_register(self, name: str, obj: Any, suffix: str | None = None) -> None:
        if isinstance(suffix, str):
            name = name + "_" + suffix
        if name in self._obj_map:
            msg = f"An object named '{name}' was already registered in '{self._name}' registry!"
            raise KeyError(msg)
        self._obj_map[name] = obj

    def register(self, obj: Any = None, suffix: str | None = None) -> Callable:
        """Use as a decorator (`@REG.register()`) or a function call."""
        if obj is None:
            def deco(func_or_class: Any) -> Any:
                self._do_register(func_or_class.__name__, func_or_class, suffix)
                return func_or_class
            return deco
        self._do_register(obj.__name__, obj, suffix)
        return obj

    def get(self, name: str, suffix: str = "tpu") -> Any:
        ret = self._obj_map.get(name)
        if ret is None:
            ret = self._obj_map.get(name + "_" + suffix)
        if ret is None:
            msg = f"No object named '{name}' found in '{self._name}' registry!"
            raise KeyError(msg)
        return ret

    def __contains__(self, name: str) -> bool:
        return name in self._obj_map

    def __iter__(self):
        return iter(self._obj_map.items())

    def keys(self):
        return self._obj_map.keys()

    def __len__(self) -> int:
        return len(self._obj_map)


ARCH_REGISTRY = Registry("arch")
DATASET_REGISTRY = Registry("dataset")
LOSS_REGISTRY = Registry("loss")
METRIC_REGISTRY = Registry("metric")
MODEL_REGISTRY = Registry("model")
OPTIMIZER_REGISTRY = Registry("optimizer")
