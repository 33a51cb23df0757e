"""bench.py output contract: the driver parses the LAST stdout line as JSON.

Round-2 failure mode: a scheduler kill before the first trial left zero
output (parsed: null). bench.py now prints a complete placeholder line
BEFORE importing jax, so any kill — even during a hung TPU-relay device
probe — leaves a parseable artifact. These tests pin that contract without
running a benchmark trial.
"""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REQUIRED_KEYS = {"metric", "value", "unit", "vs_baseline"}


def _spawn_bench():
    env = dict(os.environ)
    env["GENCONVIT_PLATFORM"] = "cpu"
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py")], cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env)


def _read_line(proc, timeout=120.0):
    """First stdout line (the placeholder prints before jax imports).

    readline() runs on a helper thread so the timeout is real: if the
    placeholder contract regresses (e.g. the print moves after a hung jax
    import) the test FAILS in `timeout` seconds instead of hanging CI."""
    import threading

    box = []
    t = threading.Thread(target=lambda: box.append(proc.stdout.readline()),
                         daemon=True)
    start = time.time()
    t.start()
    t.join(timeout)
    assert box and box[0], \
        f"no stdout line within {time.time() - start:.0f}s"
    return box[0]


def test_placeholder_line_parses_and_supersedes_nothing():
    proc = _spawn_bench()
    try:
        out = json.loads(_read_line(proc))
    finally:
        proc.kill()
        proc.wait()
    assert REQUIRED_KEYS <= out.keys(), out
    assert out["metric"] == "videos_per_sec_per_chip_dfdc15_ensemble"
    assert out["value"] == 0.0 and "error" in out


def test_sigterm_after_placeholder_leaves_valid_last_line():
    proc = _spawn_bench()
    try:
        _read_line(proc)  # placeholder is out -> any kill is now safe
        proc.send_signal(signal.SIGTERM)
        rest, _ = proc.communicate(timeout=60)
    finally:
        proc.kill()
        proc.wait()
    # whatever was printed, every line must be complete JSON with the keys
    lines = [ln for ln in rest.decode().splitlines() if ln.strip()]
    for ln in lines:
        parsed = json.loads(ln)
        assert REQUIRED_KEYS <= parsed.keys()


def _bench_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# Worst-case line with EVERY side field a full run can accumulate, at
# realistic (wide) value widths. BENCH_r04 went parsed=null because the
# final line outgrew the driver's tail-capture window — this dict is the
# regression fixture for that failure mode.
_FULL_RUN_FIELDS = {
    "metric": "videos_per_sec_per_chip_dfdc15_ensemble",
    "value": 145.53, "unit": "videos/s", "vs_baseline": 2.646,
    "baseline": "analytic", "platform": "tpu",
    "plan": "autotune.TPU_v5_lite.full-grid.2026-08-14",
    "v_batch": 24, "ms_per_launch": 164.9,
    "median_by_batch": {"8": 123.45, "16": 139.02, "24": 145.53,
                        "32": 144.98},
    "relay_degraded": False,
    "host_canary_start_ms": 1234.5, "host_canary_ms": 2345.6,
    "notes": "docs/performance.md",
    "latency_v1_ms": 11.5,
    "dw_rank1_videos_per_sec": 165.08, "dw_rank1_energy_mean": 0.415,
    "tunnel_streamed_videos_per_sec": 34.57, "tunnel_streamed_best": 36.91,
    "e2e_sample_videos_per_sec": 0.54, "e2e_trials": [0.54, 0.53, 0.55],
    "e2e_decode_s": 17.73, "e2e_device_wait_s": 1.21,
    "e2e_detect_videos_per_sec": 0.15,
    "e2e_detect_trials": [0.15, 0.14, 0.15],
    "e2e_detect_backend": "hybrid",
    "e2e_detect_stage_s": {"decode": 11.89, "detect": 41.81, "crop": 0.09,
                           "device_forward": 0.5},
    "e2e_detect_jax_videos_per_sec": 0.25,
    "e2e_detect_jax_trials": [0.25, 0.24, 0.26],
    "e2e_detect_hybrid_videos_per_sec": 0.15,
    "e2e_detect_hybrid_trials": [0.15, 0.14, 0.15],
}


def test_full_run_line_fits_driver_tail_capture():
    bench = _bench_module()
    line = bench.compact_line(dict(_FULL_RUN_FIELDS))
    assert len(line.encode()) <= bench.MAX_LINE_BYTES, \
        f"{len(line.encode())}B > {bench.MAX_LINE_BYTES}B"
    parsed = json.loads(line)
    assert REQUIRED_KEYS <= parsed.keys()
    # no key was dropped: the full-run line must fit WITHOUT shedding —
    # dropping is the emergency valve, not the design point
    assert parsed.keys() == _FULL_RUN_FIELDS.keys()
    assert bench.MAX_LINE_BYTES <= 1024  # the documented "~1 KB" contract


def test_oversize_line_sheds_optional_keys_first():
    bench = _bench_module()
    out = dict(_FULL_RUN_FIELDS)
    out["notes"] = "x" * 4 * bench.MAX_LINE_BYTES  # force an oversize line
    out["adhoc_field_no_drop_entry"] = "y" * 64  # not in _DROP_ORDER
    line = bench.compact_line(out)
    assert len(line.encode()) <= bench.MAX_LINE_BYTES
    parsed = json.loads(line)
    assert REQUIRED_KEYS <= parsed.keys()
    assert parsed["value"] == 145.53  # headline survives shedding
