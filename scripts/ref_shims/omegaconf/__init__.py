"""Minimal stand-in for `omegaconf`, used ONLY by the acceptance-gate harness
(`scripts/ref_gate/`) to import and run the reference's unmodified torch code
from /root/reference (which does `from omegaconf import DictConfig, OmegaConf`)
without installing Hydra. Implements exactly the surface the reference
touches: attribute/`in`/item access with recursive wrapping, and
`OmegaConf.to_container`.
"""

from __future__ import annotations


def _wrap(v):
    if isinstance(v, dict):
        return DictConfig(v)
    return v


def _unwrap(v):
    if isinstance(v, DictConfig):
        return {k: _unwrap(x) for k, x in v._content.items()}
    if isinstance(v, (list, tuple)):
        return [_unwrap(x) for x in v]
    return v


class DictConfig:
    def __init__(self, content=None):
        if isinstance(content, DictConfig):
            content = dict(content._content)
        object.__setattr__(self, "_content", dict(content or {}))

    def __getattr__(self, key):
        if key.startswith("_"):
            raise AttributeError(key)
        try:
            return _wrap(self._content[key])
        except KeyError:
            raise AttributeError(key)

    def __setattr__(self, key, value):
        self._content[key] = value

    def __getitem__(self, key):
        return _wrap(self._content[key])

    def __setitem__(self, key, value):
        self._content[key] = value

    def __contains__(self, key):
        return key in self._content

    def __iter__(self):
        return iter(self._content)

    def __len__(self):
        return len(self._content)

    def get(self, key, default=None):
        return _wrap(self._content.get(key, default))

    def keys(self):
        return self._content.keys()

    def values(self):
        return [_wrap(v) for v in self._content.values()]

    def items(self):
        return [(k, _wrap(v)) for k, v in self._content.items()]

    def __repr__(self):
        return f"DictConfig({self._content!r})"


class OmegaConf:
    @staticmethod
    def to_container(cfg, resolve=False):
        del resolve
        return _unwrap(cfg) if isinstance(cfg, DictConfig) else dict(cfg)

    @staticmethod
    def create(content=None):
        return DictConfig(content)
