"""Drills for bench.py's failure-mode contract (VERDICT r3 item 1).

BENCH_r03 lost the whole round's number to a recoverable OOM: the old
bench printed its one JSON line only after EVERY stage succeeded, and an
exec retry restarted everything against a driver timeout. These drills
run bench.py as a subprocess in DRILL mode (tiny synthetic stages, same
harness: stage cache, exec retry, deadline watchdog, incremental emit)
and assert a parseable result line survives:
- an injected RESOURCE_EXHAUSTED (fresh-process retry + half-batch flag),
- a kill -9 mid-run,
- a hang that runs into the total deadline (watchdog emits + exits 0).
"""
import json
import os
import signal
import subprocess
import sys
import time

import pytest

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


def _env(tmp_path, **extra):
    env = dict(os.environ)
    env.pop("VIQUAE_BENCH_DEADLINE", None)
    env.pop("VIQUAE_BENCH_RETRY", None)
    env.pop("VIQUAE_BENCH_HALF", None)
    env.pop("VIQUAE_BENCH_CHUNKED", None)
    env.pop("VIQUAE_BENCH_RECOVER", None)
    env.pop("VIQUAE_BENCH_FAKE_OOM_RECOVER", None)
    env.pop("VIQUAE_BENCH_SLEEP", None)
    env.pop("VIQUAE_BENCH_FAKE_PROBE", None)
    env.pop("VIQUAE_BENCH_DEFER_WAIT", None)
    env.pop("VIQUAE_BENCH_PROBE_GUARD", None)
    env.pop("VIQUAE_BENCH_SHA", None)
    env.update(
        BENCH_PLATFORM="cpu",
        BENCH_SMALL="1",
        VIQUAE_BENCH_DRILL="1",
        VIQUAE_BENCH_CACHE_DIR=str(tmp_path / "cache"),
        **{k: str(v) for k, v in extra.items()},
    )
    return env


def _last_json(stdout: str):
    lines = [l for l in stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON line in output:\n{stdout[-2000:]}"
    return json.loads(lines[-1])


def test_fake_oom_degrades_then_recovers_full_batch(tmp_path):
    """Injected RESOURCE_EXHAUSTED on the headline stage: the harness must
    exec-retry once at half batch, land the degraded number, then SPEND
    the remaining deadline re-running the stage at full batch — the final
    line must be the recovered (undegraded) result (VERDICT r4 item 1b)."""
    proc = subprocess.run(
        [sys.executable, BENCH],
        env=_env(tmp_path, VIQUAE_BENCH_STAGES="exact",
                 VIQUAE_BENCH_FAKE_OOM="exact", VIQUAE_BENCH_BUDGET="300"),
        capture_output=True, text=True, timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = _last_json(proc.stdout)
    assert result["value"] == 123.0
    assert "injected fake OOM" in proc.stderr
    assert "recovery stage exact" in proc.stderr
    # the recovered result is full-batch: no degraded stages remain,
    # and the stage is labeled recovered in stage_health
    assert "degraded_half_batch" not in result["details"]
    assert result["details"]["stage_health"]["exact"]["recovered"] is True
    assert result["details"]["stage_health"]["exact"]["degraded"] is False


def test_failed_recovery_keeps_the_degraded_result(tmp_path):
    """A recovery attempt that OOMs again must keep the degraded number
    (one attempt, never re-entering the degrade ladder) and label the
    stage degraded in stage_health."""
    proc = subprocess.run(
        [sys.executable, BENCH],
        env=_env(tmp_path, VIQUAE_BENCH_STAGES="exact",
                 VIQUAE_BENCH_FAKE_OOM="exact",
                 VIQUAE_BENCH_FAKE_OOM_RECOVER="exact",
                 VIQUAE_BENCH_BUDGET="300"),
        capture_output=True, text=True, timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = _last_json(proc.stdout)
    assert result["value"] == 123.0
    assert "degraded_half_batch" in result["details"]
    assert "keeping the degraded/errored record" in proc.stderr
    assert result["details"]["stage_health"]["exact"]["degraded"] is True
    # exactly ONE recovery attempt — no ladder re-entry
    assert proc.stderr.count("recovery stage exact") == 1


def test_wedged_window_waits_without_burning_attempts(tmp_path):
    """An OOM whose pre-probe read a WEDGED window (<1GB free: even tiny
    programs fail) must NOT consume an attempt or escalate the degrade
    ladder — the run sleeps in a fresh process and retries once the
    window clears (observed live 2026-08-20: a ~12-minute total wedge).

    Drill: the fake probe reads 0GB for the first 45s of the run, then
    8GB. Deferrals re-probe and exhaust within the wedge (8 x 1s), the
    stage proceeds-despite-dirty, and the injected OOM (attempts==0)
    fires with a wedged pre-probe -> wedge-wait cycles (attempt NOT
    consumed). Once the window clears the OOM fires one final time with
    a clean pre-probe — that one burns the attempt and degrades, and the
    recovery pass restores the full-batch number."""
    proc = subprocess.run(
        [sys.executable, BENCH],
        env=_env(tmp_path, VIQUAE_BENCH_STAGES="exact",
                 VIQUAE_BENCH_FAKE_OOM="exact",
                 VIQUAE_BENCH_FAKE_PROBE="0:45,8",
                 VIQUAE_BENCH_DEFER_WAIT="1",
                 VIQUAE_BENCH_BUDGET="240"),
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = _last_json(proc.stdout)
    assert result["value"] == 123.0
    assert "wedge wait" in proc.stderr
    assert "wedged window — sleeping" in proc.stderr
    assert result["details"].get("wedge_waits", 0) >= 1
    # the wedge-phase OOM escalated nothing; the clean-window OOM
    # degraded once and the recovery pass restored full batch
    assert "degraded_half_batch" not in result["details"]
    assert result["details"]["stage_health"]["exact"]["recovered"] is True


def test_probe_hang_guard_execs_and_finally_emits(tmp_path):
    """The worst wedge mode HANGS the alloc inside native PJRT (no
    exception ever surfaces). The probe's daemon-timer guard must count a
    wedge wait and exec a fresh sleeping process; once the wedge cap or
    deadline nears, it must emit the best-available JSON and exit 0
    rather than burn the rest of the budget silently."""
    proc = subprocess.run(
        [sys.executable, BENCH],
        env=_env(tmp_path, VIQUAE_BENCH_STAGES="exact",
                 VIQUAE_BENCH_FAKE_PROBE="hang",
                 VIQUAE_BENCH_PROBE_GUARD="2",
                 VIQUAE_BENCH_DEFER_WAIT="1",
                 VIQUAE_BENCH_BUDGET="330"),
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "HBM probe stuck" in proc.stderr
    assert "wedged window — sleeping" in proc.stderr  # the exec'd child
    result = _last_json(proc.stdout)
    # the probe never yields, so no stage can land — but the tail is a
    # parseable labeled result, not silence
    assert result["details"].get("wedge_waits", 0) >= 1
    assert "probe hang" in result["details"].get("note", "")


def test_kill_9_mid_run_leaves_parseable_tail(tmp_path):
    """SIGKILL while a later stage is in flight: the already-printed
    incremental JSON line is the driver's result."""
    proc = subprocess.Popen(
        [sys.executable, BENCH],
        env=_env(tmp_path, VIQUAE_BENCH_STAGES="exact,hang",
                 VIQUAE_BENCH_DRILL_HANG="120",
                 VIQUAE_BENCH_BUDGET="600"),
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    # wait for the first emitted result line (after the exact stage)
    line = None
    deadline = time.time() + 120
    while time.time() < deadline:
        line = proc.stdout.readline()
        if line.startswith("{"):
            break
    assert line and line.startswith("{"), "no JSON before the hang stage"
    proc.send_signal(signal.SIGKILL)
    proc.wait(timeout=30)
    result = json.loads(line)
    assert result["value"] == 123.0
    assert "hang" in result["details"].get("stages_pending", [])


def test_deadline_watchdog_emits_before_external_timeout(tmp_path):
    """A stage that hangs past the total deadline: the watchdog thread
    emits the completed-stage subset and exits 0 — the driver's external
    timeout never gets to kill a silent process."""
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, BENCH],
        env=_env(tmp_path, VIQUAE_BENCH_STAGES="exact,hang",
                 VIQUAE_BENCH_DRILL_HANG="300",
                 VIQUAE_BENCH_BUDGET="90"),
        capture_output=True, text=True, timeout=180,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert time.time() - t0 < 120  # exited well before the hang finished
    result = _last_json(proc.stdout)
    assert result["value"] == 123.0
    assert "watchdog" in result["details"].get("note", "")


def test_failed_stage_is_isolated_and_run_completes(tmp_path):
    """A non-OOM stage failure: one exec retry, then the stage is marked
    failed and the run still finishes with a final (non-partial) line."""
    proc = subprocess.run(
        [sys.executable, BENCH],
        env=_env(tmp_path, VIQUAE_BENCH_STAGES="exact,fail",
                 VIQUAE_BENCH_BUDGET="300"),
        capture_output=True, text=True, timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = _last_json(proc.stdout)
    assert result["value"] == 123.0
    assert "fail" in result["details"]["stage_errors"]
    assert "partial" not in result["details"]
    # non-OOM failures must NOT degrade the protocol
    assert "degraded_half_batch" not in result["details"]


@pytest.mark.slow
def test_stage_cache_skips_completed_stages(tmp_path):
    """A second invocation with the same cache dir re-emits the cached
    result without re-running stages (the exec-retry fast path)."""
    env = _env(tmp_path, VIQUAE_BENCH_STAGES="exact",
               VIQUAE_BENCH_BUDGET="300")
    p1 = subprocess.run([sys.executable, BENCH], env=env,
                        capture_output=True, text=True, timeout=240)
    assert p1.returncode == 0
    assert "bench: stage exact" in p1.stderr
    p2 = subprocess.run([sys.executable, BENCH], env=env,
                        capture_output=True, text=True, timeout=240)
    assert p2.returncode == 0
    assert "bench: stage exact" not in p2.stderr  # skipped via cache
    assert _last_json(p2.stdout)["value"] == 123.0
