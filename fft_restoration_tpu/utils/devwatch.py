"""Device-hang watchdog for pool-shared TPU entry points.

When the axon pool tunnel is down, the FIRST device touch (backend init
inside jax.device_put / jax.devices) can block indefinitely inside
native plugin code. SIGALRM cannot interrupt that: Python runs signal
handlers only when the main thread re-enters the interpreter, which it
never does (verified live 2026-08-17 — an alarm-guarded init never
printed its artifact). The hang DOES release the GIL, so a watchdog
thread can still run: it emits a caller-provided failure record and
hard-exits, so drivers and cron probes get an interpretable line
instead of a wedged process.

The reference has no analog (single-shot local binaries,
/root/reference/serial.cpp:9); this is tunnel-deployment armor.
"""

from __future__ import annotations

import os
import sys
import threading


def arm(timeout_s: float, on_timeout) -> threading.Event:
    """Start a daemon watchdog: unless the returned Event is set within
    `timeout_s`, call `on_timeout()` (typically: print a JSON failure
    record), flush stdout, and `os._exit(2)`.

    Call `.set()` on the returned Event as soon as the guarded device
    touch completes; later hangs (dispatch on an already-initialized
    backend) are the caller's own timing logic's problem.
    """
    done = threading.Event()

    def _watch():
        if not done.wait(timeout=timeout_s):
            try:
                on_timeout()
                sys.stdout.flush()
            finally:
                os._exit(2)

    threading.Thread(target=_watch, daemon=True).start()
    return done
