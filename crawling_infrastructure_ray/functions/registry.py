"""Crawl-function registry — the no-eval replacement for the
reference's user-supplied ``function_code`` strings (S4/§2.10).

The reference eval()s a JS class source that must extend HttpWorker or
BrowserWorker (crawler/src/handler.ts:59-64, validation
master/src/services/crawltask.service.ts:1013-1018). Here crawl
behaviors are Python callables/classes registered BY NAME; a JobConfig
carries ``function_name`` and the engine resolves it at stage-build
time. The contract (CrawlFn protocol, SURVEY.md §2.10 RD mapping):

  - callable class: ``__init__(**kwargs)`` = per-actor setup (the
    reference setup()/cleanup() lifecycle), ``__call__(batch: pa.Table)
    -> pa.Table`` = crawl_batch
  - plain function: ``fn(batch, **kwargs) -> pa.Table``
  - discovered URLs are returned as a ``discovered`` list column
    (replaces worker-side enqueue()); storage happens in the sink
    stage (replaces getKey/setKey).
"""

from __future__ import annotations

from collections.abc import Callable

_REGISTRY: dict[str, Callable] = {}


def register_crawl_fn(name: str, fn: Callable | None = None):
    """Register a crawl function/class under ``name``. Usable as a
    decorator (``@register_crawl_fn("my_fn")``) or a direct call."""
    if fn is None:
        def deco(f):
            _REGISTRY[name] = f
            return f
        return deco
    _REGISTRY[name] = fn
    return fn


def get_crawl_fn(name: str) -> Callable:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"no crawl function registered under {name!r}; "
            f"known: {sorted(_REGISTRY)}") from None


def list_crawl_fns() -> list[str]:
    return sorted(_REGISTRY)


def _register_builtins() -> None:
    from ..stages.fetch import FetchSim, fetch_sim_batch, fetch_store_batch
    _REGISTRY.setdefault("fetch_sim", fetch_sim_batch)
    _REGISTRY.setdefault("fetch_sim_actor", FetchSim)
    _REGISTRY.setdefault("fetch_store", fetch_store_batch)


_register_builtins()
