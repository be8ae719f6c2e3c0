"""Tunnel-stall watchdog for TPU measurement scripts.

The axon-tunneled backend intermittently wedges: a fresh client blocks
forever in ``jax.devices()`` / the first remote compile (0% CPU, no
output).  Scripts import this module and call :func:`progress` at every
milestone; if no progress lands for ``QQQ_TPU_WATCHDOG_SECS`` (default
300 s) the process prints ``TUNNEL-STALL`` and hard-exits with code 42 so
an outer retry loop can cycle cheaply instead of burning a full timeout.

Usage:
    from _tpu_watchdog import progress   # starts the watchdog on import
    ...
    progress("compiled L=2")             # call at every milestone
"""

from __future__ import annotations

import os
import sys
import threading
import time

_TIMEOUT = float(os.environ.get("QQQ_TPU_WATCHDOG_SECS", "300"))
_last = [time.monotonic(), "import"]


def progress(tag: str = "") -> None:
    _last[0] = time.monotonic()
    _last[1] = tag


def _watch() -> None:
    while True:
        time.sleep(10)
        idle = time.monotonic() - _last[0]
        if idle > _TIMEOUT:
            print(
                f"TUNNEL-STALL: no progress for {idle:.0f}s "
                f"(last: {_last[1]!r}) — exiting 42 for retry",
                flush=True,
            )
            sys.stdout.flush()
            os._exit(42)


threading.Thread(target=_watch, daemon=True).start()
