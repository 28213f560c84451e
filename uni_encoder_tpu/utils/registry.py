"""Minimal name->object registry.

Plays the role of detectron2's Registry (reference uses BACKBONE_REGISTRY,
SEM_SEG_HEADS_REGISTRY, TRANSFORMER_DECODER_REGISTRY, META_ARCH_REGISTRY;
see e.g. /root/reference/model/modeling/transformer_decoder/
oneformer_transformer_decoder.py:22-33) without the detectron2 dependency.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Optional, Tuple


class Registry:
    def __init__(self, name: str):
        self._name = name
        self._objects: Dict[str, Any] = {}

    def register(self, obj: Optional[Any] = None, *, name: Optional[str] = None) -> Callable:
        if obj is None:
            # used as decorator with kwargs: @REG.register(name="Foo")
            def deco(fn_or_cls):
                self._do_register(name or fn_or_cls.__name__, fn_or_cls)
                return fn_or_cls

            return deco
        self._do_register(name or obj.__name__, obj)
        return obj

    def _do_register(self, name: str, obj: Any) -> None:
        if name in self._objects:
            raise KeyError(f"{name!r} already registered in registry {self._name!r}")
        self._objects[name] = obj

    def get(self, name: str) -> Any:
        if name not in self._objects:
            raise KeyError(
                f"{name!r} not found in registry {self._name!r}. "
                f"Available: {sorted(self._objects)}"
            )
        return self._objects[name]

    def __contains__(self, name: str) -> bool:
        return name in self._objects

    def __iter__(self) -> Iterator[Tuple[str, Any]]:
        return iter(self._objects.items())

    def keys(self):
        return self._objects.keys()
