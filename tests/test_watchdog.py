"""Health-monitor / failure-containment unit tests (SURVEY.md C12/C13,
section 5.3): the watchdog must trip on memory and error-count thresholds,
the heartbeat must tick, and signals must set the abort flags."""

import os
import signal
import threading
import time

from montecarlooptionspricer_tpu.config import PipelineConfig
from montecarlooptionspricer_tpu.pipeline.watchdog import (
    ProcessStats, Watchdog, current_memory_bytes, install_signal_handlers)


def _collecting_writer(sink):
    def write(msg):
        sink.append(msg)
    return write


def test_health_check_trips_on_memory_limit():
    # A 1-byte limit is below any real RSS -> first health tick must kill.
    cfg = PipelineConfig(max_memory_bytes=1, health_check_interval_s=0.01,
                         keep_alive_interval_s=60.0)
    stats = ProcessStats(cfg)
    lines = []
    wd = Watchdog(stats, _collecting_writer(lines), progress=lambda: 0)
    wd.start()
    assert stats.should_terminate.wait(timeout=5.0)
    wd.stop()
    assert any("health check failed" in ln for ln in lines)
    assert current_memory_bytes() > 1


def test_health_check_trips_on_error_count():
    cfg = PipelineConfig(max_errors=3, health_check_interval_s=0.01,
                         keep_alive_interval_s=60.0)
    stats = ProcessStats(cfg)
    for _ in range(3):
        stats.add_error()
    wd = Watchdog(stats, _collecting_writer([]), progress=lambda: 0)
    wd.start()
    assert stats.should_terminate.wait(timeout=5.0)
    wd.stop()


def test_keepalive_heartbeat_ticks():
    cfg = PipelineConfig(health_check_interval_s=60.0,
                         keep_alive_interval_s=0.01)
    stats = ProcessStats(cfg)
    lines = []
    wd = Watchdog(stats, _collecting_writer(lines), progress=lambda: 42)
    wd.start()
    time.sleep(0.2)
    wd.stop()
    beats = [ln for ln in lines if "Still alive" in ln]
    assert beats and "last row processed = 42" in beats[0]


def test_fail_sets_flags():
    stats = ProcessStats(PipelineConfig())
    assert stats.is_healthy()
    stats.fail("boom")
    assert stats.catastrophic_failure
    assert stats.failure_reason == "boom"
    assert stats.should_terminate.is_set()
    assert not stats.is_healthy()


def test_signal_handler_sets_abort(monkeypatch):
    # only run when on the main thread (signal.signal requirement)
    if threading.current_thread() is not threading.main_thread():
        return
    stats = ProcessStats(PipelineConfig())
    lines = []
    old = signal.getsignal(signal.SIGUSR1)
    try:
        install_signal_handlers(stats, _collecting_writer(lines))
        os.kill(os.getpid(), signal.SIGUSR1)
        deadline = time.time() + 5.0
        while not stats.should_terminate.is_set() and time.time() < deadline:
            time.sleep(0.01)
        assert stats.should_terminate.is_set()
        assert stats.catastrophic_failure
        # the log write happens on a detached thread (the handler itself
        # must stay lock-free) — wait for it
        while not lines and time.time() < deadline:
            time.sleep(0.01)
        assert any("Caught signal" in ln for ln in lines)
    finally:
        signal.signal(signal.SIGUSR1, old)
        signal.signal(signal.SIGINT, signal.default_int_handler)
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
