"""Typed config + registry — the `target:`-style plugin system, preserved.

The reference's de-facto plugin registry is ``instantiate_from_config``
(`/root/reference/REFace/ldm/util.py:78-93`): YAML nodes carry a dotted
``target`` string plus ``params``, and components are built reflectively;
feature flags are ``hasattr``-guarded optional keys (ddpm.py:610-737).
Here the same ergonomics with a typed spine:

* :func:`instantiate_from_config` — identical semantics (dotted import +
  ``params`` kwargs), so reference-style YAML/dict configs keep working;
* :func:`register` / :func:`build` — a short-name registry for the
  framework's own components;
* :func:`load_yaml` — OmegaConf when available, minimal YAML fallback not
  needed (pyyaml ships with omegaconf in this image).
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register(name: str) -> Callable:
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def build(name: str, **kwargs):
    if name not in _REGISTRY:
        raise KeyError(f"unknown component {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def get_obj_from_str(string: str, reload: bool = False):
    """Dotted path → object (ldm/util.py:85-93 semantics)."""
    module, cls = string.rsplit(".", 1)
    mod = importlib.import_module(module)
    if reload:
        importlib.reload(mod)
    return getattr(mod, cls)


def instantiate_from_config(config: Dict[str, Any]):
    """{'target': 'pkg.mod.Class', 'params': {...}} → instance
    (ldm/util.py:78-83 semantics, including the __is_first_stage__ sentinels
    being the caller's concern)."""
    if "target" not in config:
        raise KeyError("Expected key `target` to instantiate.")
    return get_obj_from_str(config["target"])(**config.get("params", {}))


def load_yaml(path: str):
    try:
        from omegaconf import OmegaConf

        return OmegaConf.to_container(OmegaConf.load(path), resolve=True)
    except ImportError:
        import yaml

        with open(path) as f:
            return yaml.safe_load(f)
