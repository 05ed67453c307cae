"""Decorator-based component registries.

Same extension-point pattern as the reference
(/root/reference/src/drift_autopsy/registry/detector_registry.py:18-97 and
the twin localizer/rca registries): ``@Registry.register(name)`` +
``Registry.create(name, **kwargs)``.  One generic implementation instead of
three copies.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Type

logger = logging.getLogger(__name__)


class _Registry:
    def __init__(self, kind: str):
        self._kind = kind
        self._classes: Dict[str, Type] = {}

    def register(self, name: str):
        def decorator(cls: Type) -> Type:
            if name in self._classes:
                logger.warning(
                    "%s '%s' is already registered. Overwriting.", self._kind, name
                )
            self._classes[name] = cls
            return cls

        return decorator

    def create(self, name: str, **kwargs: Any):
        if name not in self._classes:
            available = ", ".join(self.list())
            raise ValueError(
                f"Unknown {self._kind}: '{name}'. Available: {available}"
            )
        return self._classes[name](**kwargs)

    def list(self) -> list:
        return list(self._classes.keys())

    def get(self, name: str) -> Optional[Type]:
        return self._classes.get(name)

    def clear(self) -> None:
        self._classes.clear()


DetectorRegistry = _Registry("detector")
LocalizerRegistry = _Registry("localizer")
RCARegistry = _Registry("rca")
