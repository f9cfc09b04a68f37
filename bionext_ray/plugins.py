"""User-extension surface: duck-typed LLM/API plugin (reference
GenericAPICall, /root/reference/src/utils.py:45-57, loaded by module name via
__import__ at /root/reference/src/linker/__init__.py:19-23).

A plugin is any class exposing ``run(prompt) -> str``. It is instantiated
INSIDE each linker actor (once per actor), so network clients / rate limiters
are per-actor state, never serialized through the object store.
"""

from __future__ import annotations

import re


class GenericAPICall:
    """Base class users subclass; mirror of the reference's plugin shape."""

    def __init__(self, address=None, **kwargs) -> None:
        self.address = address

    def run(self, prompt: str):
        """Forward the prompt to an LLM and return the raw response text."""
        raise NotImplementedError


def load_plugin(module: str, **kwargs) -> GenericAPICall:
    """Reference-style dynamic load: module name doubles as class name
    (/root/reference/src/linker/__init__.py:19-23). Also accepts the
    explicit ``pkg.mod:ClassName`` form."""
    import importlib
    if ":" in module:
        mod_name, cls_name = module.split(":", 1)
        mod = importlib.import_module(mod_name)
        cls = getattr(mod, cls_name)
    else:
        mod = __import__(module)
        cls = getattr(mod, module)
    return cls(**kwargs)


_PIPE_TOKEN = re.compile(r"[^\s,;]*\|[^\s,;]*")


def parse_llm_variant_output(text: str) -> list[str]:
    """Extract tmVar-style '|'-joined candidates from free-form LLM output
    (reference parser, /root/reference/src/linker/seq_variant.py:272-293:
    keep '|'-containing tokens, strip punctuation, prefer well-formed
    arity-3 candidates)."""
    cands = [t.strip("()[]{}.\"'`") for t in _PIPE_TOKEN.findall(text or "")]
    cands = [c for c in cands if c]
    well_formed = [c for c in cands if c.count("|") >= 2]
    return well_formed or cands


class EchoLLM(GenericAPICall):
    """Hermetic test plugin: deterministic 'LLM' answering with a canned
    tmVar-style normalization derived from the prompt."""

    def run(self, prompt: str):
        m = re.search(r"variant\s+(\S+)", prompt or "")
        token = m.group(1) if m else "c.0X>Y"
        return f"answer: c|SUB|{token}|0"
