#!/usr/bin/env python
"""Throughput benchmark — DFDC-style 15-frame ensemble video prediction.

Un-killable by design: the headline JSON line is printed to stdout as soon
as the FIRST device-resident trial completes, and re-printed (superseding
lines; each line is complete, valid JSON) whenever a later phase improves
or extends it. SIGTERM/SIGINT and normal exit all flush the best-so-far
line, so a scheduler timeout still leaves a parseable result. A wall-clock
deadline (GENCONVIT_BENCH_DEADLINE seconds, default 1200) skips the
optional later phases when the run is behind.

Output contract (the driver parses the LAST stdout line): every emitted
line is compact JSON bounded to MAX_LINE_BYTES — BENCH_r04 went
unparseable because the final line outgrew the driver's tail-capture
window, so prose now goes to stderr and docs/performance.md ("Bench field
notes" section defines every field), never the JSON. If a line would still
exceed the bound, optional keys are dropped in _DROP_ORDER; the headline
metric/value/unit/vs_baseline quad is never dropped
(tests/test_bench_contract.py pins both properties).

Headline: videos/sec/chip through the jitted compute path with
device-resident input batches — on-device uint8 normalize -> full
genconvit ensemble (ED+VAE) -> sigmoid-mean aggregation on
[V,15,224,224,3], the shape the engine feeds the MXU in production
(reference workload: 15-frame DFDC prediction, ref model/pred_func.py:
111-131). Baseline denominator ("baseline": "analytic"): ~55 videos/s, an
analytic estimate of the reference's model-forward-only throughput on
A100-fp16 (~270 GFLOP/video at ~50% conv utilization, serial per-video
batching; the reference publishes no number — SURVEY.md §6). Side fields
cover tunnel-streamed H2D, e2e decode(+detect) on the bundled samples with
min/median over repeated trials, V=1 latency, and the opt-in dw_rank1
approximate mode.

Measurement hygiene (this sandbox reaches the chip through a caching
relay): every launch gets a DISTINCT pre-uploaded rng key (the VAE samples
from it, so executions are never identical and can't be served from the
relay's execution cache), input buffers rotate, and each trial is synced
by fetching a value (block_until_ready does not reliably block through the
relay). Trials report median AND best; a >2x spread flags relay_degraded.
host_canary_ms (a fixed pure-Python busy loop timed at bench start and
again right before the e2e phases) calibrates sandbox-host load so an e2e
regression is attributable: if the canary moved, blame the host, not the
code (VERDICT r4 weak #3).
"""

import atexit
import json
import os
import signal
import sys
import time

import numpy as np

A100_FP16_BASELINE_VIDEOS_PER_SEC = 55.0
FRAMES = 15
IMG = 224

# ---- output contract: compact, bounded, last-line-wins ----
MAX_LINE_BYTES = 1024
# dropped first when a line would exceed MAX_LINE_BYTES (never the
# REQUIRED metric/value/unit/vs_baseline headline)
_REQUIRED = ("metric", "value", "unit", "vs_baseline")
_DROP_ORDER = (
    "notes", "e2e_detect_jax_trials", "e2e_detect_hybrid_trials",
    "e2e_detect_trials", "e2e_trials", "median_by_batch",
    "e2e_detect_stage_s", "tunnel_streamed_best", "host_canary_start_ms",
    "dw_rank1_energy_mean", "plan", "baseline", "platform",
    "e2e_detect_backend", "e2e_decode_s", "e2e_device_wait_s",
    "ms_per_launch", "v_batch", "relay_degraded", "host_canary_ms",
    "latency_longvideo_ms",
    "e2e_detect_jax_videos_per_sec", "e2e_detect_hybrid_videos_per_sec",
    "latency_v1_ms", "dw_rank1_videos_per_sec",
    "tunnel_streamed_videos_per_sec", "e2e_detect_videos_per_sec",
    "e2e_sample_videos_per_sec", "error",
)

_T0 = time.perf_counter()
_state = {"out": None, "printed": None}
_side = {}  # persistent side fields (phases update; refresh() merges)


def log(msg):
    print(f"[{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def compact_line(out):
    """Serialize `out` compactly, dropping optional keys until the line
    fits MAX_LINE_BYTES (the driver's tail capture is finite; an oversize
    final line is the BENCH_r04 parsed=null failure mode)."""
    out = dict(out)
    # listed order first, then any stragglers a phase added ad hoc
    order = list(_DROP_ORDER) + [k for k in out
                                 if k not in _DROP_ORDER and k not in _REQUIRED]
    s = json.dumps(out, separators=(",", ":"))
    for k in order:
        if len(s.encode()) <= MAX_LINE_BYTES:
            break
        if k in out:
            del out[k]
            s = json.dumps(out, separators=(",", ":"))
    return s


def emit():
    """Print the current result line if it changed since the last print."""
    out = _state["out"]
    if out is not None and out != _state["printed"]:
        print(compact_line(out), flush=True)
        _state["printed"] = dict(out)


def _on_signal(signum, frame):
    log(f"signal {signum}: flushing best-so-far result")
    emit()
    # exit 0 only if a MEASURED line is out (the startup placeholder keeps
    # stdout parseable but carries an "error" field — a kill before any
    # trial is still a failed run and the exit status must say so)
    printed = _state["printed"]
    os._exit(0 if printed is not None and "error" not in printed else 1)


def deadline_left():
    return float(os.environ.get("GENCONVIT_BENCH_DEADLINE", "1200")) \
        - (time.perf_counter() - _T0)


def host_canary_ms(n=2_000_000):
    """Fixed pure-Python busy loop, timed: a load calibration for the
    shared sandbox host. Compare across runs/phases — if the canary moved,
    an e2e delta is host noise, not a code regression."""
    t0 = time.perf_counter()
    x = 0
    for i in range(n):
        x += i
    return round((time.perf_counter() - t0) * 1e3, 1)


def main():
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    atexit.register(emit)

    # Guaranteed-parse floor: print a complete placeholder line BEFORE any
    # jax/TPU work. If the relay is unreachable, jax.devices() hangs until
    # the scheduler kills the process — SIGKILL skips atexit and the SIGTERM
    # handler has nothing measured to flush, so without this line the round
    # artifact would be unparseable (round-2 failure mode). Every measured
    # phase supersedes it; the LAST line wins per the documented contract.
    _state["out"] = {
        "metric": "videos_per_sec_per_chip_dfdc15_ensemble",
        "value": 0.0,
        "unit": "videos/s",
        "vs_baseline": 0.0,
        "baseline": "analytic",
        "error": "startup placeholder: no measured trial completed yet",
    }
    emit()

    # make the engine's per-phase init logs (logging.INFO on the
    # "genconvit_tpu" logger) visible on stderr: a cold-start stall must be
    # diagnosable from the log tail alone (they were invisible at the default
    # WARNING level — exactly how a 30-minute silent init went unexplained)
    import logging

    logging.basicConfig(stream=sys.stderr,
                        format="%(asctime)s %(name)s: %(message)s")
    logging.getLogger("genconvit_tpu").setLevel(logging.INFO)

    canary0 = host_canary_ms()
    log(f"host canary (start): {canary0} ms")
    log("headline method: device-resident batches (chip compute path); "
        "baseline denominator is an analytic A100-fp16 model-forward "
        "estimate, like-for-like. Field definitions + the speed-of-light "
        "analysis (why the 5x north star sits below this model's measured "
        "VPU-bound structural floor on v5e): docs/performance.md")

    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache: first-call compiles are 30-80s
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from genconvit_tpu.config import Config
    from genconvit_tpu.infer.engine import Predictor, _host_staging_context

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    # build the native FFmpeg decoder if missing: the .so is gitignored, so
    # a fresh workspace checkout doesn't carry it and the e2e phase would
    # silently degrade to "phase failed" (observed: RuntimeError 'native
    # decoder not built'). The build is a single ~5s g++ invocation.
    from genconvit_tpu.data import native as _native

    if not _native.native_available():
        import subprocess

        try:
            ndir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "native")
            r = subprocess.run(["make", "-C", ndir], timeout=240,
                               capture_output=True, text=True)
            _native._load_failed = False  # retry the (cached-failed) probe
            log(f"native decoder build: rc={r.returncode}, now "
                f"available={_native.native_available()}")
        except Exception as e:
            log(f"native decoder build failed ({type(e).__name__}: {e}); "
                "e2e phase will be skipped")

    config = Config()
    config.weight_dir = os.environ.get("GENCONVIT_WEIGHT_DIR", "weight")
    # random-weight fallback only exercises the compute path — use the
    # seconds-fast numpy init, not 90s of single-core threefry (ops/init.py)
    os.environ.setdefault("GENCONVIT_FAST_INIT", "1")
    # The headline is exact-semantics by contract: force dw_rank=0 even if
    # GENCONVIT_DW_RANK is exported (the dw_rank phase below measures the
    # approximate mode explicitly, against this exact baseline).
    import dataclasses as _dc

    from genconvit_tpu.ops.kernel_plan import KernelPlan

    plan = _dc.replace(KernelPlan.from_env(), dw_rank=0)
    from genconvit_tpu.ops.kernel_plan import default_plan_asset

    plan_src = (os.environ.get("GENCONVIT_KERNEL_PLAN")
                or default_plan_asset() or "defaults")
    if plan_src != "defaults":
        try:
            with open(plan_src) as _f:
                plan_src = json.load(_f).get("_meta", {}).get(
                    "name", os.path.basename(plan_src))
        except Exception:
            plan_src = os.path.basename(plan_src)
    log(f"kernel plan source: {plan_src}")
    predictor = Predictor(config, net="genconvit", face_backend="fullframe",
                          kernel_plan=plan,
                          dtype=jnp.bfloat16 if backend == "tpu" else jnp.float32)
    log("predictor ready (host-staged init + single upload)")

    rng = np.random.default_rng(0)
    trials = int(os.environ.get("GENCONVIT_BENCH_TRIALS", "4"))
    device = jax.devices()[0]

    def make_keys(n, salt):
        # distinct per-launch rng keys, built host-side and pre-uploaded:
        # zero extra dispatches inside the timed loop
        with _host_staging_context():
            ks = [jax.random.fold_in(jax.random.PRNGKey(salt), i)
                  for i in range(n)]
        return jax.device_put(ks, device)

    # ---- headline: device-resident launch throughput (chip capability) ----
    best = 0.0
    best_detail = {}
    medians = {}
    degraded = False
    batch_sizes = [int(v) for v in os.environ.get(
        "GENCONVIT_BENCH_BATCHES", "8,16,24,32").split(",")]

    def refresh(extra=None):
        if extra:
            _side.update(extra)
        out = {
            "metric": "videos_per_sec_per_chip_dfdc15_ensemble",
            "value": round(best, 2),
            "unit": "videos/s",
            "vs_baseline": round(best / A100_FP16_BASELINE_VIDEOS_PER_SEC, 3),
            "baseline": "analytic",
            "platform": backend,
            "plan": plan_src,
            **best_detail,
            "median_by_batch": {str(k): round(v, 2) for k, v in medians.items()},
            "relay_degraded": degraded,
            "host_canary_start_ms": canary0,
            "notes": "docs/performance.md",
        }
        out.update(_side)
        _state["out"] = out

    for v_batch in batch_sizes:
        if best and deadline_left() < 240:
            log(f"V={v_batch}: skipped (deadline; {deadline_left():.0f}s left)")
            break
        n_bufs = 4
        dev = [jax.device_put(rng.integers(
            0, 255, (v_batch, FRAMES, IMG, IMG, 3), np.uint8), device)
            for _ in range(n_bufs)]
        dmask = jax.device_put(np.ones((v_batch, FRAMES), np.float32), device)
        fn = predictor._forward_fn(FRAMES, batched=True, stacked=True)
        iters = int(os.environ.get("GENCONVIT_BENCH_ITERS", "0")) \
            or max(6, int(np.ceil(48 / v_batch)))
        keys = make_keys(trials * iters + 3, v_batch)
        t0 = time.perf_counter()
        np.asarray(fn(predictor.params, dev[0], dmask, keys[-1]))
        log(f"V={v_batch}: first call (compile) {time.perf_counter() - t0:.1f}s")
        # two distinct-key warmup launches: the first post-compile executions
        # through the relay carry setup overhead that would contaminate
        # trial 0 — and trial 0's rate is the first line the driver can see
        np.asarray(fn(predictor.params, dev[1], dmask, keys[-2]))
        np.asarray(fn(predictor.params, dev[2], dmask, keys[-3]))
        dts = []
        for trial in range(trials):
            t0 = time.perf_counter()
            outs = [fn(predictor.params, dev[i % n_bufs], dmask,
                       keys[trial * iters + i]) for i in range(iters)]
            np.asarray(jnp.stack(outs))  # one real fetch = honest sync
            dt = time.perf_counter() - t0
            dts.append(dt)
            vps = v_batch * iters / dt
            log(f"V={v_batch} resident trial {trial}: {vps:.1f} videos/s "
                f"({dt / iters * 1e3:.1f} ms/launch)")
            if vps > best:
                best, best_detail = vps, {"v_batch": v_batch,
                                          "ms_per_launch": round(dt / iters * 1e3, 1)}
            if trial == 0:
                # first full trial done -> a parseable line exists from here on
                refresh()
                emit()
        medians[v_batch] = v_batch * iters / float(np.median(dts))
        if max(dts) > 2.0 * min(dts):
            degraded = True
            log(f"V={v_batch}: trial spread {min(dts):.2f}-{max(dts):.2f}s "
                "-> relay_degraded")
        refresh()
        emit()
        del dev, dmask, keys

    # ---- single-video latency: V=1 launch time (serving SLA number) ----
    # Device-side per-launch time at V=1 via the same async-dispatch/
    # single-fetch loop (pipelined, so the relay's per-RPC 150-300ms rides
    # outside the measured steady state). This is the latency a resident
    # server pays per lone video, vs the throughput-optimal V>=8 batches.
    if os.environ.get("GENCONVIT_BENCH_LATENCY", "1") == "1" \
            and deadline_left() > 300:
        try:
            dev1 = [jax.device_put(rng.integers(
                0, 255, (1, FRAMES, IMG, IMG, 3), np.uint8), device)
                for _ in range(4)]
            m1 = jax.device_put(np.ones((1, FRAMES), np.float32), device)
            fn1 = predictor._forward_fn(FRAMES, batched=True, stacked=True)
            l_iters = int(os.environ.get("GENCONVIT_BENCH_LATENCY_ITERS", "24"))
            lkeys = make_keys(trials * l_iters + 3, salt=777)
            t0 = time.perf_counter()
            np.asarray(fn1(predictor.params, dev1[0], m1, lkeys[-1]))
            log(f"V=1: first call (compile) {time.perf_counter() - t0:.1f}s")
            np.asarray(fn1(predictor.params, dev1[1], m1, lkeys[-2]))
            np.asarray(fn1(predictor.params, dev1[2], m1, lkeys[-3]))
            lat = []
            for trial in range(trials):
                t0 = time.perf_counter()
                outs = [fn1(predictor.params, dev1[i % 4], m1,
                            lkeys[trial * l_iters + i]) for i in range(l_iters)]
                np.asarray(jnp.stack(outs))
                lat.append((time.perf_counter() - t0) / l_iters * 1e3)
                log(f"V=1 latency trial {trial}: {lat[-1]:.1f} ms/video")
            refresh(extra={"latency_v1_ms": round(float(np.median(lat)), 1)})
            emit()
            del dev1, m1, lkeys
        except Exception as e:
            log(f"latency phase failed ({type(e).__name__}: {e}); "
                "keeping earlier phases")

    # ---- long-video latency: ONE video at F=120 (the sequence-axis
    # workload, VERDICT r4 #8) ---- full-coverage scoring of a long clip is
    # a single [1,120,...] launch on one chip; on a pod the same video's
    # frame axis shards over 'data' (parallel/eval_shard.predict_long_video,
    # masked psum-mean == max_prediction_value — parity proven on the CPU
    # mesh). The single-chip latency here is that path's per-chip unit.
    if os.environ.get("GENCONVIT_BENCH_LONGVIDEO", "1") == "1" \
            and deadline_left() > 360:
        try:
            f_long = int(os.environ.get("GENCONVIT_BENCH_LONGVIDEO_F", "120"))
            devL = [jax.device_put(rng.integers(
                0, 255, (1, f_long, IMG, IMG, 3), np.uint8), device)
                for _ in range(2)]
            mL = jax.device_put(np.ones((1, f_long), np.float32), device)
            fnL = predictor._forward_fn(f_long, batched=True, stacked=True)
            lkeys = make_keys(2 * 6 + 3, salt=1201)
            t0 = time.perf_counter()
            np.asarray(fnL(predictor.params, devL[0], mL, lkeys[-1]))
            log(f"long-video F={f_long}: first call (compile) "
                f"{time.perf_counter() - t0:.1f}s")
            np.asarray(fnL(predictor.params, devL[1], mL, lkeys[-2]))
            lat = []
            for trial in range(2):
                t0 = time.perf_counter()
                outs = [fnL(predictor.params, devL[i % 2], mL,
                            lkeys[trial * 6 + i]) for i in range(6)]
                np.asarray(jnp.stack(outs))
                lat.append((time.perf_counter() - t0) / 6 * 1e3)
                log(f"long-video trial {trial}: {lat[-1]:.1f} ms/video "
                    f"({f_long * 1e3 / lat[-1]:.0f} frames/s)")
            refresh(extra={
                "latency_longvideo_ms": round(float(np.median(lat)), 1)})
            emit()
            del devL, mL, lkeys
        except Exception as e:
            log(f"long-video phase failed ({type(e).__name__}: {e}); "
                "keeping earlier phases")

    # ---- dw_rank=1 approximate-mode throughput (side number, NOT headline) -
    # Rank-1 separable depthwise (ops/dwsep.py): the only measured lever below
    # the VPU tap floor — at the cost of an SVD approximation of the trained
    # 7x7 filters. Reported as a SIDE field so the headline `value` stays
    # exact-semantics; the retained-energy stat quantifies the approximation
    # for the weights actually benched. Reuses the resident predictor's device
    # params (only the tiny dw kernels round-trip for the host-side SVD).
    if (os.environ.get("GENCONVIT_BENCH_DWRANK", "1") == "1"
            and backend == "tpu" and best and deadline_left() > 420):
        try:
            from genconvit_tpu.ops.dwsep import add_dw_sep

            t0 = time.perf_counter()
            params_sep, sst = add_dw_sep(predictor.params, 1)
            log(f"dw_rank=1 fold {time.perf_counter() - t0:.1f}s "
                f"(energy mean {sst['energy_mean']:.3f})")
            vb = int(best_detail.get("v_batch", 16))
            devs = [jax.device_put(rng.integers(
                0, 255, (vb, FRAMES, IMG, IMG, 3), np.uint8), device)
                for _ in range(4)]
            dm = jax.device_put(np.ones((vb, FRAMES), np.float32), device)
            fns = predictor._forward_fn(FRAMES, batched=True, stacked=True)
            d_iters = max(6, int(np.ceil(48 / vb)))
            dkeys = make_keys(2 * d_iters + 3, salt=4242)
            t0 = time.perf_counter()
            np.asarray(fns(params_sep, devs[0], dm, dkeys[-1]))
            log(f"dw_rank=1 V={vb}: first call (compile) "
                f"{time.perf_counter() - t0:.1f}s")
            np.asarray(fns(params_sep, devs[1], dm, dkeys[-2]))
            rates = []
            for trial in range(2):
                t0 = time.perf_counter()
                outs = [fns(params_sep, devs[i % 4], dm,
                            dkeys[trial * d_iters + i]) for i in range(d_iters)]
                np.asarray(jnp.stack(outs))
                dt = time.perf_counter() - t0
                rates.append(vb * d_iters / dt)
                log(f"dw_rank=1 trial {trial}: {rates[-1]:.1f} videos/s "
                    f"({dt / d_iters * 1e3:.1f} ms/launch)")
            # dw_rank1 is the OPT-IN approximate mode (GENCONVIT_DW_RANK=1,
            # rank-1 SVD of the 7x7 depthwise filters) — side number, the
            # headline stays exact-semantics
            refresh(extra={
                "dw_rank1_videos_per_sec": round(float(np.median(rates)), 2),
                "dw_rank1_energy_mean": round(sst["energy_mean"], 3),
            })
            emit()
            del params_sep, devs, dm, dkeys
        except Exception as e:
            log(f"dw_rank phase failed ({type(e).__name__}: {e}); "
                "keeping earlier phases")

    # ---- tunnel-streamed: host->device transfer in the measured loop ----
    # YUV420 transfer path: half the H2D bytes of RGB, colorspace conversion
    # fused into the on-device normalize (the production fullframe pipeline
    # ships planar YUV straight from the FFmpeg decoder). Purely link-bound
    # through this sandbox's relay tunnel (~25-100MB/s day-to-day).
    from genconvit_tpu.data.preprocess import yuv_affine

    v_batch = int(os.environ.get("GENCONVIT_BENCH_YUV_BATCH", "16"))
    if v_batch <= 0:
        log("yuv stream phase skipped (GENCONVIT_BENCH_YUV_BATCH <= 0)")
    elif deadline_left() < 180:
        log(f"yuv stream phase skipped (deadline; {deadline_left():.0f}s left)")
    else:
        try:
            yb = [(
                (rng.integers(0, 255, (v_batch, FRAMES, IMG, IMG), np.uint8),
                 rng.integers(0, 255, (v_batch, FRAMES, IMG // 2, IMG // 2), np.uint8),
                 rng.integers(0, 255, (v_batch, FRAMES, IMG // 2, IMG // 2), np.uint8)),
                yuv_affine("bt709", False),
                np.ones((v_batch, FRAMES), np.float32),
            ) for _ in range(2)]
            t0 = time.perf_counter()
            predictor.predict_videos_stream_yuv(iter(yb))
            log(f"yuv: first call (compile) {time.perf_counter() - t0:.1f}s")
            s_iters = int(os.environ.get("GENCONVIT_BENCH_YUV_ITERS", "8"))
            rates = []
            for trial in range(trials):
                if rates and deadline_left() < 120:
                    break
                t0 = time.perf_counter()
                predictor.predict_videos_stream_yuv(yb[i % 2] for i in range(s_iters))
                dt = time.perf_counter() - t0
                rates.append(v_batch * s_iters / dt)
                log(f"yuv stream trial {trial}: {rates[-1]:.1f} videos/s")
            if max(rates) > 2.0 * min(rates):
                degraded = True
            refresh(extra={
                "tunnel_streamed_videos_per_sec": round(float(np.median(rates)), 2),
                "tunnel_streamed_best": round(max(rates), 2),
            })
            emit()
        except Exception as e:  # keep the headline + later phases alive
            log(f"yuv stream phase failed ({type(e).__name__}: {e}); "
                "keeping earlier phases")

    # ---- e2e: batched C++ decode + device on the reference's samples ----
    # reuses the RESIDENT predictor; video_batch=8 hits the jit entry the
    # headline already compiled, so this phase adds no compile stack.
    # Repeat discipline (VERDICT r4 #4): >=3 trials per phase (deadline
    # permitting), median + per-trial list emitted, plus the host canary
    # re-measured here so a cross-round e2e delta is attributable to host
    # load vs code. The single-CPU-core sandbox host makes every e2e number
    # decode/detect-bound — production hosts decode ~50x faster.
    sample_dir = os.environ.get(
        "GENCONVIT_BENCH_SAMPLES", "/root/reference/sample_prediction_data")
    e2e_trials_n = int(os.environ.get("GENCONVIT_BENCH_E2E_TRIALS", "3"))
    if (os.path.isdir(sample_dir)
            and os.environ.get("GENCONVIT_BENCH_E2E", "1") == "1"
            and deadline_left() > 90):
        vids = sorted(
            os.path.join(sample_dir, f) for f in os.listdir(sample_dir)
            if f.lower().endswith((".mp4", ".avi", ".mov")))
        canary1 = host_canary_ms()
        log(f"host canary (e2e phases): {canary1} ms (start was {canary0})")
        refresh(extra={"host_canary_ms": canary1})
        if vids:
            try:
                predictor.timers.reset()
                rates = []
                for trial in range(e2e_trials_n):
                    if rates and deadline_left() < 120:
                        break
                    t0 = time.perf_counter()
                    res = predictor.predict_files_native_rgb(vids, FRAMES,
                                                             video_batch=8)
                    dt = time.perf_counter() - t0
                    ok = sum(1 for _, v in res if v is not None)
                    rates.append(ok / dt)
                    log(f"e2e trial {trial}: {ok / dt:.2f} videos/s "
                        f"({ok}/{len(vids)} videos, {dt:.1f}s)")
                summ = predictor.timers.summary()
                log(f"e2e stage timers (all trials): {summ}")
                decode_s = summ.get("decode", {}).get("total_seconds", 0.0)
                device_s = summ.get("device_forward", {}).get("total_seconds", 0.0)
                n = max(1, len(rates))
                refresh(extra={
                    "e2e_sample_videos_per_sec": round(float(np.median(rates)), 2),
                    "e2e_trials": [round(r, 2) for r in rates],
                    "e2e_decode_s": round(decode_s / n, 2),
                    "e2e_device_wait_s": round(device_s / n, 2),
                })
                emit()
            except Exception as e:
                log(f"e2e phase failed ({type(e).__name__}: {e}); keeping "
                    "earlier phases")

            # ---- e2e with the DEFAULT detector in the loop (VERDICT r3 #2):
            # the production detect path through the grouped driver — decode
            # thread-pooled, ONE batched jax-detector call per group, async
            # model launches. This is the production path's number.
            if (os.environ.get("GENCONVIT_BENCH_E2E_DETECT", "1") == "1"
                    and deadline_left() > 240):
                saved_det = predictor.detector
                try:
                    from genconvit_tpu.data.faces import make_detector

                    det_backend = Config().face_backend
                    try:
                        predictor.detector = make_detector(det_backend)
                    except Exception as e:
                        log(f"{det_backend} unavailable ({e}); "
                            "measuring jax backend")
                        det_backend = "jax"
                        predictor.detector = make_detector("jax")
                    predictor.timers.reset()
                    t0 = time.perf_counter()  # trial 0 pays detector compile
                    res = predictor.predict_files(vids, FRAMES, video_batch=8)
                    log(f"e2e-detect warmup: {time.perf_counter() - t0:.1f}s "
                        f"(incl. detector compile)")
                    drates = []
                    for trial in range(e2e_trials_n):
                        if drates and deadline_left() < 150:
                            break
                        predictor.timers.reset()
                        t0 = time.perf_counter()
                        res = predictor.predict_files(vids, FRAMES,
                                                      video_batch=8)
                        dt = time.perf_counter() - t0
                        ok = sum(1 for _, v in res if v is not None)
                        drates.append(ok / dt)
                        log(f"e2e-detect trial {trial}: {ok / dt:.2f} "
                            f"videos/s ({ok}/{len(vids)} videos, {dt:.1f}s)")
                    summ = predictor.timers.summary()
                    log(f"e2e-detect stage timers (last trial): {summ}")
                    refresh(extra={
                        "e2e_detect_videos_per_sec": round(
                            float(np.median(drates)), 2),
                        "e2e_detect_trials": [round(r, 2) for r in drates],
                        "e2e_detect_backend": det_backend,
                        "e2e_detect_stage_s": {
                            k: round(summ.get(k, {}).get("total_seconds", 0.0), 2)
                            for k in ("decode", "detect", "crop",
                                      "device_forward")},
                    })
                    emit()  # flush the default-path numbers BEFORE the long
                    # side phase below (a hang+SIGKILL there must not lose
                    # the just-measured result — ADVICE r4)
                    # side number: the other detect backend (hybrid vs jax)
                    # so both the quality mode and the throughput mode carry
                    # measured e2e numbers each round.
                    alt = "jax" if det_backend != "jax" else "hybrid"
                    if deadline_left() > 240:
                        predictor.detector = make_detector(alt)
                        predictor.predict_files(vids, FRAMES, video_batch=8)
                        jrates = []
                        for trial in range(e2e_trials_n):
                            if jrates and deadline_left() < 120:
                                break
                            t0 = time.perf_counter()
                            res = predictor.predict_files(vids, FRAMES,
                                                          video_batch=8)
                            dt = time.perf_counter() - t0
                            ok = sum(1 for _, v in res if v is not None)
                            jrates.append(ok / dt)
                            log(f"e2e-detect-{alt} trial {trial}: "
                                f"{ok / dt:.2f} videos/s ({dt:.1f}s)")
                        refresh(extra={
                            f"e2e_detect_{alt}_videos_per_sec": round(
                                float(np.median(jrates)), 2),
                            f"e2e_detect_{alt}_trials":
                                [round(r, 2) for r in jrates],
                        })
                        emit()
                except Exception as e:
                    log(f"e2e-detect phase failed ({type(e).__name__}: {e}); "
                        "keeping earlier phases")
                finally:
                    # an exception mid-phase must not leave the predictor
                    # with the phase's detector (ADVICE r4)
                    predictor.detector = saved_det

    refresh()
    emit()
    log(f"done in {time.perf_counter() - _T0:.1f}s")


if __name__ == "__main__":
    main()
