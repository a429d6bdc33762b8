"""Session-scoped cache registry (cache hygiene, VERDICT r3 #6).

``persist()`` without a matching ``unpersist()`` accumulates entries in
the session's cache manager for the life of the process. The engine's
shared intermediates (the document token table, the shingle table, LSH
signature tables) are deliberately cached ACROSS queries — q31/q32/q35
share one shingle build, q20-q26 one tokenization — so unpersisting
inside each query would defeat the reuse. Instead every engine cache is
registered here and :func:`clear_caches` releases them all at a pipeline
boundary: ``bench.py`` clears per run; a long-lived session clears
whenever the underlying corpus changes.

Spark's CacheManager dedupes by canonicalized plan, so re-running the
same query re-registers a handle but does NOT grow executor storage; the
registry still tracks every handle so one clear call frees everything.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

_REGISTRY: list[DataFrame] = []
_CLEANUPS: dict[object, Callable[[], None]] = {}


def register_cleanup(fn: Callable[[], None], key: object = None) -> None:
    """Enroll a callback run by full ``clear_caches()`` calls — for
    driver-side memos that must share the cache registry's lifetime
    (e.g. the recall dials' probe modulus: valid exactly as long as the
    cached intermediates over the same corpus are).

    Dedupe is by ``key`` (default: the function object itself) — call
    sites that pass a fresh lambda/closure per call MUST pass a stable
    ``key`` (e.g. a module-level string) or each call registers another
    copy that retains its captured state for the session's lifetime.
    Re-registering a key replaces its callback; :func:`unregister_cleanup`
    removes one."""
    _CLEANUPS[fn if key is None else key] = fn


def unregister_cleanup(key: object) -> bool:
    """Drop a cleanup registered under ``key`` (the function object if
    no explicit key was passed). Returns whether anything was removed."""
    return _CLEANUPS.pop(key, None) is not None


def register_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` + enrollment in the session registry."""
    df = df.persist() if storage_level is None else df.persist(storage_level)
    _REGISTRY.append(df)
    return df


def registry_mark() -> int:
    """Current registry position — pass to ``clear_caches(since=...)`` so
    a library pipeline releases only the caches IT registered, leaving
    co-resident work's caches (shared token tables, signature tables)
    alone. Boundary-clearing everything remains the job owner's call."""
    return len(_REGISTRY)


def clear_caches(since: int | None = None) -> int:
    """Unpersist registered caches from position ``since`` on (default:
    all); returns how many were released. Safe to call with a stopped
    session (errors are swallowed — the JVM cache died with the session
    anyway). A FULL clear (no ``since`` — the pipeline boundary) also
    runs the registered cleanup callbacks; a SCOPED clear (any explicit
    ``since``, even 0) leaves co-resident memos alone, matching the
    library-pipeline semantics of :func:`registry_mark`."""
    full = since is None
    floor = 0 if full else since
    n = 0
    while len(_REGISTRY) > floor:
        df = _REGISTRY.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped
            pass
    if full:
        for fn in list(_CLEANUPS.values()):
            try:
                fn()
            except Exception:
                pass
    return n
