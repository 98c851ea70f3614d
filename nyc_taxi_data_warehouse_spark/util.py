"""Small shared runtime utilities."""

from __future__ import annotations

_SESSION_TMPDIRS: dict[str, str] = {}


def session_tmpdir(name: str) -> str:
    """Fixed per-process scratch dir `<tmp>/spark_graft_<name>_<pid>`,
    created on first use and removed at interpreter exit. Callers that
    write with mode=overwrite (or clear it themselves) can reuse it across
    invocations instead of leaking a fresh mkdtemp per run — the pattern
    behind the dedup-cluster benchmark spill and the streaming-query feed
    staging."""
    if name not in _SESSION_TMPDIRS:
        import atexit
        import os
        import shutil
        import tempfile

        d = os.path.join(tempfile.gettempdir(), f"spark_graft_{name}_{os.getpid()}")
        os.makedirs(d, exist_ok=True)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _SESSION_TMPDIRS[name] = d
    return _SESSION_TMPDIRS[name]
