"""Health monitoring, keep-alive heartbeat, and signal handling.

Equivalent of the reference's ProcessStats atomics + async monitors +
signal/terminate plumbing (PredictionGen.cpp:50-83, 128-136, 370-394,
506-536):
  * 5 s health check: RSS > 8 GiB or error count > 1e8 => terminate;
  * 30 s keep-alive heartbeat with last-row/memory to the error log;
  * SIGINT/SIGTERM/SIGUSR1 -> log + abort flag;
  * catastrophic-failure flag short-circuits remaining work.
"""

from __future__ import annotations

import logging
import resource
import signal
import threading
from typing import Callable, Optional

from ..config import PipelineConfig

log = logging.getLogger(__name__)


def current_memory_bytes() -> int:
    """Peak RSS in bytes (getrusage path of PredictionGen.cpp:66-83)."""
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024


class ProcessStats:
    """Cross-thread counters (PredictionGen.cpp:50-62)."""

    def __init__(self, config: Optional[PipelineConfig] = None):
        self.config = config or PipelineConfig()
        self._lock = threading.Lock()
        self.total_memory_usage = 0
        self.active_threads = 0
        self.error_count = 0
        self.should_terminate = threading.Event()
        self.catastrophic_failure = False
        self.failure_reason = ""

    def add_error(self) -> None:
        with self._lock:
            self.error_count += 1

    def fail(self, reason: str) -> None:
        with self._lock:
            self.catastrophic_failure = True
            self.failure_reason = reason
        self.should_terminate.set()

    def is_healthy(self) -> bool:
        return (not self.should_terminate.is_set()
                and self.error_count < self.config.max_errors
                and self.total_memory_usage < self.config.max_memory_bytes)


class Watchdog:
    """Health-check + keep-alive daemon threads
    (PredictionGen.cpp:506-528)."""

    def __init__(self, stats: ProcessStats, error_log_write: Callable[[str], None],
                 progress: Callable[[], int]):
        self.stats = stats
        self._write = error_log_write
        self._progress = progress
        self._threads = []

    def _health_loop(self) -> None:
        cfg = self.stats.config
        while not self.stats.should_terminate.wait(cfg.health_check_interval_s):
            self.stats.total_memory_usage = current_memory_bytes()
            if not self.stats.is_healthy():
                self._write("Process health check failed! Initiating shutdown...\n")
                # Mark catastrophic so the run exits non-zero and leaves a
                # resume marker: a health kill (reference semantics: RSS >
                # 8 GiB or error flood, PredictionGen.cpp:506-516) must not
                # masquerade as a clean completion.
                self.stats.fail("health check failed (memory/error limit)")
                return

    def _keepalive_loop(self) -> None:
        cfg = self.stats.config
        while not self.stats.should_terminate.wait(cfg.keep_alive_interval_s):
            self._write(
                f"Still alive, last row processed = {self._progress()}, "
                f"memory usage ~{self.stats.total_memory_usage} bytes.\n")

    def start(self) -> None:
        for target in (self._health_loop, self._keepalive_loop):
            t = threading.Thread(target=target, daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self) -> None:
        self.stats.should_terminate.set()
        for t in self._threads:
            t.join(timeout=2.0)


def install_signal_handlers(stats: ProcessStats,
                            error_log_write: Callable[[str], None]) -> None:
    """SIGINT/SIGTERM/SIGUSR1 -> log + terminate (PredictionGen.cpp:128-136,
    370-376).  Unlike the reference's abort(), sets the flag so in-flight
    rows flush sentinel results first.

    The handler itself must be lock-free: it runs on the main thread, which
    may be inside the error log's (non-reentrant) mutex when the signal
    lands — calling the locked writer from the handler would self-deadlock.
    So the handler only sets flags and stashes the message; a detached
    thread performs the locked write.
    """

    def handler(signum, frame):
        # Flag first (should_terminate is an Event — set() is lock-free and
        # signal-safe enough); failure_reason assignment races benignly.
        stats.should_terminate.set()
        stats.catastrophic_failure = True
        stats.failure_reason = f"signal {signum}"
        threading.Thread(
            target=error_log_write,
            args=(f"Caught signal {signum}. Terminating process.\n",),
            daemon=True).start()

    for sig in (signal.SIGINT, signal.SIGTERM, signal.SIGUSR1):
        try:
            signal.signal(sig, handler)
        except (ValueError, OSError):  # non-main thread
            return
