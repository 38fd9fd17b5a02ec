"""Registered query + oracle pairs, grouped by SURVEY.md §2 tier."""

from __future__ import annotations

from importlib import import_module

_MODULES = (
    "relational",
    "windowed",
    "cdx_surface",
    "llm",
    "scale",
)


def load_all() -> None:
    for mod in _MODULES:
        import_module(f"{__name__}.{mod}")
