"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (from BASELINE.json): end-to-end generation throughput in 1s-clips
per second per chip — the full ancestral chain (top prior sample -> upsampler
sample -> VQ-VAE decode) at the flagship FULL_PIPELINE geometry (28672-sample
clips @ 3 kHz, code contexts 896/112, priors width 128 / depth 6).

``vs_baseline`` compares against the TF/CPU reference measured by
scripts/measure_tf_baseline.py (baselines/tf_cpu.json) — the same geometry run
through the reference's own Sampler.py/vqvae.py code.

Also measures codebook-encode throughput (tokens/sec) as a secondary metric
(reported inside the JSON's "extra" field).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import jax

# Persistent compilation cache: repeated bench runs (e.g. the driver's) skip
# the ~3 min flagship-chain compiles.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/vmt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
SAMPLE_RATE = 3000

# Timeout insurance: a full solo run compiles for many minutes (the tunneled
# backend's persistent cache does not cover the big chain programs), so a
# driver-side kill mid-run would otherwise lose the whole artifact.  Every
# completed measurement lands in _PARTIAL; SIGTERM/SIGINT prints the best
# JSON line so far (headline included once generation has been timed) and
# exits.  Measurements are ordered headline-first for exactly this reason.
_PARTIAL: dict = {}


def _emit_partial(signum, frame):  # pragma: no cover - signal path
    if _PARTIAL.get("value") is not None:
        # Exit 0 WITH the partial artifact (marked as such inside the JSON)
        # so a capture harness that gates on the return code still records
        # the headline; with nothing measured yet, exit with the
        # conventional 128+signum so the kill is not mistaken for success.
        _PARTIAL.setdefault("extra", {})["partial"] = (
            f"killed by signal {signum} before all measurements finished")
        print(json.dumps(_PARTIAL), flush=True)
        sys.exit(0)
    sys.exit(128 + signum)


def _install_signal_insurance():
    # Called from main() only — importing bench.py must not hijack Ctrl-C.
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, _emit_partial)


def _load_baseline():
    path = os.path.join(REPO, "baselines", "tf_cpu.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


# TPU v5e (v5 lite) single-chip peaks, for MFU/roofline accounting.
V5E_PEAK_BF16_FLOPS = 197e12   # MXU peak, bf16
V5E_HBM_BW = 819e9             # bytes/sec

# Serving KV-cache dtype (decode_lab-measured winner; int8 carries bf16
# per-(position, lane) scale side caches — see ops/decode_pallas.py).
CACHE_DTYPE = os.environ.get("VMT_CACHE_DTYPE", "bfloat16")


def _cost_analysis(compiled):
    """XLA's own FLOP/byte estimate for a compiled program (None if the
    backend doesn't expose it)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        in_bytes = sum(v for k, v in ca.items()
                       if isinstance(v, (int, float)) and "bytes accessed" in k)
        return flops, float(in_bytes)
    except Exception:
        return None, None


def _measure_rtt():
    """One host fetch on the tunneled backend costs a full round trip
    (~28 ms measured) regardless of device work, so every timing below
    queues many executions, fetches ONCE, and subtracts this RTT.  (r3: the
    r1/r2 5-iteration loops under-reported throughput by the RTT share —
    ~12% on the generation chain, ~2x on sub-millisecond encode timings.)"""
    null = jax.jit(lambda v: v + 1.0)
    x = jnp.float32(0)
    x = null(x)
    _ = float(x)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _ = float(null(x))
        best = min(best, time.time() - t0)
    return best


# Wall-clock budget for the optional (non-headline) measurements.  On a
# healthy chip the whole run finishes in ~10 min so this never triggers; on a
# contended/slow tunnel day (observed: a trivial first jit taking ~5 min to
# clear the remote queue) it keeps the run from dying mid-way with nothing —
# once the headline is secured, any section that would start past the budget
# is skipped and recorded in extra["budget_skipped"].
BENCH_BUDGET_S = float(os.environ.get("VMT_BENCH_BUDGET_S", 2700))


def main():
    from vae_music_tpu.configs import get_config
    from vae_music_tpu.models.vqvae import vqvae_encode
    from vae_music_tpu.sample.sampler import AncestralSampler

    _install_signal_insurance()
    t_start = time.time()

    def budget_ok(section: str) -> bool:
        if time.time() - t_start < BENCH_BUDGET_S:
            return True
        _PARTIAL.setdefault("extra", {}).setdefault(
            "budget_skipped", []).append(section)
        return False

    rtt = _measure_rtt()

    scfg = get_config("FULL_PIPELINE")
    vcfg = scfg.vqvae
    # Generation throughput peaks at batch 256 (r3, tile-major caches +
    # 3-slot history pipeline + RTT-corrected timing: 256 -> 48.0k, 512
    # single-scan slower, 512 auto-chunked 47.8k).  bf16 KV caches halve
    # the per-step DMA;
    # serve_dtype bf16 runs the conditioner/VQ-decoder conv stacks in bf16
    # (serving config — loss-parity numbers in PARITY.md are measured in
    # f32); sampling happens inside the fused decode kernel (auto-enabled).
    # Fidelity guards: tests/test_decode_pallas.py (greedy token-exact vs the
    # XLA path) and the decode==full-forward invariant.
    n_samples = 256

    rng = jax.random.PRNGKey(0)
    sampler = AncestralSampler.from_config(scfg, rng, cache_dtype=CACHE_DTYPE,
                                           serve_dtype="bfloat16")

    # Trained weights (r4): when the soak artifact exists (scripts/soak.py
    # 'generate' phase writes it), every benchmark below runs on the TRAINED
    # pipeline instead of near-init weights — the reference's actual serving
    # scenario.  Timing is weight-value-independent; the field records which
    # weights produced the artifact.
    artifact = os.path.join(REPO, "artifacts", "soak")
    weights_src = "random-init"
    if os.path.isdir(artifact):
        try:
            from vae_music_tpu.train.checkpoint import load_pipeline_artifact

            vqp, cbs, pps = load_pipeline_artifact(artifact)
            sampler.vqvae_params = vqp
            sampler.codebooks = cbs
            sampler.prior_params = list(pps)
            weights_src = "trained:artifacts/soak"
        except Exception as e:  # pragma: no cover - artifact version drift
            weights_src = f"random-init (artifact load failed: {e})"[:120]

    # ---- generation: full ancestral chain (ONE jitted XLA program) --------
    # NOTE: on the tunneled TPU backend block_until_ready() does not reliably
    # wait for remote execution; a scalar host fetch does.  All timings below
    # force completion by fetching a reduction of the result.
    y = jnp.zeros((n_samples,), jnp.int32)
    chain = sampler.compile_chain(n_samples)
    wav = chain(jax.random.PRNGKey(1), y)
    _ = float(jnp.sum(wav))  # compile + warm-up + forced completion

    iters = 25
    t0 = time.time()
    for i in range(iters):
        wav = chain(jax.random.PRNGKey(2 + i), y)
    # Device executions are in-order: fetching the last result's sum waits
    # for every queued iteration; the one RTT paid is subtracted.
    _ = float(jnp.sum(wav))
    gen_dt = (time.time() - t0 - rtt) / iters
    audio_seconds = n_samples * vcfg.sample_length / SAMPLE_RATE
    clips_per_sec = audio_seconds / gen_dt

    # Headline secured: from here on a driver kill still yields an artifact.
    baseline = _load_baseline()
    n_decode_steps = sum(s.ctx_len for s in sampler.specs)  # sequential tokens
    _PARTIAL.update({
        "metric": "e2e_generation_throughput",
        "value": round(clips_per_sec, 3),
        "unit": "1s-clips/sec/chip",
        "vs_baseline": (round(clips_per_sec / baseline["clips_per_sec"], 2)
                        if baseline else 0.0),
        "extra": {
            "timing_rtt_ms": round(rtt * 1e3, 1),
            "generate_wall_sec_per_batch": round(gen_dt, 3),
            "batch": n_samples,
            "audio_seconds_per_batch": audio_seconds,
            "decode_step_us": round(gen_dt / n_decode_steps * 1e6, 1),
            "serve_dtype": "bfloat16",
            "cache_dtype": CACHE_DTYPE,
            "sample_in_kernel": True,
            "weights": weights_src,
            "device": str(jax.devices()[0]),
        },
    })

    def _timed_chain(ch, yy, iters):
        """One timing run: queue ``iters`` executions, fetch once, minus RTT."""
        w = None
        t0 = time.time()
        for i in range(iters):
            w = ch(jax.random.PRNGKey(100 + i), yy)
        _ = float(jnp.sum(w))
        return (time.time() - t0 - rtt) / iters

    # Batch 512 (auto-chunked into sweet-spot chains by compile_chain, r3):
    # throughput must be monotone in batch size — the r2 single-scan 512
    # program regressed to 32.6k clips/s.  r4 (VERDICT r3 weak #6): the ratio
    # is reported as mean +- spread over 3 PAIRED runs so the >=1.0 bar is
    # interpretable against run-to-run noise.
    if budget_ok("b512"):
        y512 = jnp.zeros((512,), jnp.int32)
        chain512 = sampler.compile_chain(512)
        wav512 = chain512(jax.random.PRNGKey(1), y512)
        _ = float(jnp.sum(wav512))  # compile + warm-up
        ratios, clips512_runs = [], []
        for _rep in range(3):
            dt256 = _timed_chain(chain, y, 8)
            dt512 = _timed_chain(chain512, y512, 8)
            c256 = n_samples * vcfg.sample_length / SAMPLE_RATE / dt256
            c512 = 512 * vcfg.sample_length / SAMPLE_RATE / dt512
            clips512_runs.append(round(c512, 1))
            ratios.append(c512 / c256)
        _PARTIAL["extra"].update({
            "clips_per_sec_b512_chunked": round(
                sum(clips512_runs) / len(clips512_runs), 1),
            "clips_per_sec_b512_runs": clips512_runs,
            "b512_over_b256": round(sum(ratios) / len(ratios), 3),
            "b512_over_b256_spread": [round(min(ratios), 3),
                                      round(max(ratios), 3)],
        })
    else:
        chain512 = wav512 = None  # train-section cleanup rebinds regardless

    # Interactive latency (r4, VERDICT r3 weak #2): driver-captured ms per
    # request at batch 1 / 16, pad_to_fused on (pad to the fused kernel's
    # 128-lane minimum and slice) and off (exact-size XLA path).  Device-side
    # latency: executions are serialized on-device, so the amortized time per
    # execution IS the per-request device latency (the ~28 ms tunnel RTT is a
    # test-harness artifact, excluded).
    if budget_ok("latency"):
        lat = {}
        for nb in (1, 16):
            yb = jnp.zeros((nb,), jnp.int32)
            for pad in (True, False):
                ch = sampler.compile_chain(nb, pad_to_fused=pad)
                w = ch(jax.random.PRNGKey(1), yb)
                _ = float(jnp.sum(w))
                key = f"latency_ms_b{nb}" + ("" if pad else "_nopad")
                lat[key] = round(_timed_chain(ch, yb, 16) * 1e3, 1)
                del ch, w
        _PARTIAL["extra"].update(lat)

    # MFU / roofline for the whole chain (XLA's own cost model).  Reuses the
    # already-compiled headline executable (advisor r3: lowering again here
    # could recompile past the budget before any later gate is consulted).
    if budget_ok("mfu"):
        flops, hbm_bytes = _cost_analysis(
            chain.lower(jax.random.PRNGKey(1), y).compile())
        mfu = (flops / gen_dt / V5E_PEAK_BF16_FLOPS) if flops else None
        hbm_util = (hbm_bytes / gen_dt / V5E_HBM_BW) if hbm_bytes else None
        _PARTIAL["extra"].update({
            "chain_flops_per_batch": flops,
            "chain_hbm_bytes_per_batch": hbm_bytes,
            "mfu_vs_bf16_peak": round(mfu, 4) if mfu is not None else None,
            "hbm_bw_utilization": (round(hbm_util, 4)
                                   if hbm_util is not None else None),
        })

    # ---- encode: waveform -> codebook tokens ------------------------------
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (32, vcfg.sample_length, 1)), jnp.float32)
    import dataclasses

    def measure_encode(cfg, use_pallas=None):
        enc = jax.jit(
            lambda p, c, xx: [z.sum() for z in vqvae_encode(
                p, c, cfg, xx, use_pallas=use_pallas)])
        zs = enc(sampler.vqvae_params, sampler.codebooks, x)
        _ = [float(z) for z in zs]
        reps = 400   # sub-ms per call: RTT must be amortized AND subtracted
        t0 = time.time()
        for _ in range(reps):
            zs = enc(sampler.vqvae_params, sampler.codebooks, x)
        _ = float(zs[0])
        enc_dt = (time.time() - t0 - rtt) / reps
        return sum(x.shape[0] * zl for zl in cfg.z_lengths) / enc_dt

    if budget_ok("encode"):
        tokens_per_sec = measure_encode(vcfg)       # auto: dispatch winner
        tokens_per_sec_xla = measure_encode(vcfg, use_pallas=False)
        tokens_per_sec_bf16 = measure_encode(
            dataclasses.replace(vcfg, dtype="bfloat16"))
        _PARTIAL["extra"].update({
            "encode_tokens_per_sec": round(tokens_per_sec),
            "encode_tokens_per_sec_xla": round(tokens_per_sec_xla),
            "encode_tokens_per_sec_bf16": round(tokens_per_sec_bf16),
            "encode_vs_baseline": (
                round(tokens_per_sec / baseline["encode_tokens_per_sec"], 2)
                if baseline else 0.0),
        })

    # Isolated VQ assignment+EMA: fused Pallas kernel vs the XLA path, at the
    # flagship encode row count.  Timed with an on-device fori_loop (REPS
    # kernel invocations inside ONE jitted call, inputs perturbed per
    # iteration to defeat CSE) so the tunnel's per-call dispatch overhead
    # cannot swamp sub-millisecond kernels.  ``vq_kernel_speedup`` is the
    # speedup of the path production dispatch actually uses
    # (quantize(use_pallas=None), single chip -> jnp/XLA) over the
    # alternative — VERDICT r2 item 1: no production path may route through
    # a measured-slower kernel.
    from vae_music_tpu.nn.quantizer import codebook_lookup, init_codebook, nearest_code
    from vae_music_tpu.ops.vq_pallas import fused_vq_assign, vq_pallas_available

    def _time_assign(fn, flat, emb, reps=1000):
        # reps=1000 inside ONE jitted call: the r2 reps=50 left an RTT share
        # of ~rtt/50 = ~570us PER REP in both numbers, swamping the
        # sub-millisecond kernels being compared.
        def loop(f, e):
            def body(i, carry):
                acc, f = carry
                out = fn(f, e)
                s = jnp.sum(out[3]) * 1e-20
                return acc + s, f.at[0, 0].add(s)
            acc, _ = jax.lax.fori_loop(0, reps, body, (0.0, f))
            return acc
        jl = jax.jit(loop)
        _ = float(jl(flat, emb))
        best = float("inf")
        for _rep in range(3):
            t0 = time.time()
            _ = float(jl(flat, emb))
            best = min(best, (time.time() - t0 - rtt) / reps)
        return best

    vq_us = {}
    if vq_pallas_available() and budget_ok("vq_kernel"):
        st = init_codebook(jax.random.PRNGKey(1), vcfg.latent_dim,
                           vcfg.codebook_size)
        flat = jax.random.normal(jax.random.PRNGKey(2),
                                 (32 * vcfg.z_lengths[0], vcfg.latent_dim))

        def xla_assign(f, e):
            codes = nearest_code(f, e)
            q = codebook_lookup(codes, e)
            onehot = jax.nn.one_hot(codes, e.shape[1], dtype=jnp.float32)
            m = jnp.dot(f.T, onehot, preferred_element_type=jnp.float32)
            return codes, q, m, jnp.sum(onehot, axis=0)

        vq_us = {
            "vq_assign_us_xla": round(_time_assign(
                xla_assign, flat, st.embeddings) * 1e6, 1),
            "vq_assign_us_pallas": round(_time_assign(
                lambda f, e: fused_vq_assign(f, e), flat,
                st.embeddings) * 1e6, 1),
        }
        # Production dispatch (use_pallas=None, single chip) routes via the
        # jnp/XLA path.  Directed ratio keys only (r4, VERDICT r3 weak #1):
        # BENCH_r02's "vq_kernel_speedup" was pallas-over-xla (0.88 = kernel
        # loses) while BENCH_r03's same key was dispatch-over-alternative
        # (1.61 = XLA wins) — the key flipped orientation across rounds, so
        # it is retired.  "vq_xla_over_pallas" > 1 always means XLA faster.
        vq_us["vq_dispatch"] = "xla"
        vq_us["vq_xla_over_pallas"] = round(
            vq_us["vq_assign_us_pallas"] / vq_us["vq_assign_us_xla"], 2)
    _PARTIAL["extra"].update(vq_us)

    # ---- training throughput at the Jukebox-scale geometries --------------
    # VERDICT r2 item 7: the bench_train numbers must be driver-captured.
    # Runs in-process (a subprocess could not acquire the already-held TPU);
    # serving buffers are released first so the 202M/282M train states fit.
    # Non-fatal: serving stays the headline even if the train bench trips.
    train_rows = []
    if os.environ.get("VMT_SKIP_TRAIN_BENCH") != "1" and budget_ok("train"):
        # Tolerant cleanup (advisor r3): rebinding to None frees the serving
        # buffers and cannot NameError however the gated sections above are
        # reordered (unlike the previous `del` of maybe-unbound names).
        chain = wav = chain512 = wav512 = sampler = None
        try:
            import gc
            import importlib.util as _ilu

            gc.collect()
            spec = _ilu.spec_from_file_location(
                "bench_train", os.path.join(REPO, "scripts", "bench_train.py"))
            bt = _ilu.module_from_spec(spec)
            spec.loader.exec_module(bt)
            for nm in ("JUKEBOX_SMALL_PRIOR", "JUKEBOX_SMALL_UPSAMPLER"):
                train_rows.append(bt.bench_one(nm, iters=5))
                gc.collect()
                _PARTIAL["extra"]["train"] = train_rows
        except Exception as e:  # pragma: no cover - OOM/compile-env specific
            train_rows = [{"error": f"{type(e).__name__}: {e}"[:200]}]
    _PARTIAL["extra"]["train"] = train_rows

    # ---- Jukebox-scale SERVING (VERDICT r3 weak #8) ------------------------
    # Fused decode at the JUKEBOX_SMALL_PRIOR geometry (width 1024, depth 48,
    # hd 128, ctx 8192 — /root/reference/SMALL_PRIOR_model_structuree:2).
    # Runs after the train section so the serving buffers are already freed;
    # mirrors scripts/wide_lab.py (same shapes -> shared persistent-cache hit).
    # The UNROLLED fused kernel is a Mosaic compile wall at this geometry
    # (>40 min without finishing — it emits all 48 layers into one program);
    # the r4 layer-grid kernel (ops/decode_grid_pallas.py) compiles the same
    # step in ~71 s with depth as a sequential grid dimension and serves
    # batch 64 with int8 caches (the only batch-64 config that fits 15.75 GB
    # of HBM) at 21.6k tok/s — 3.7x the XLA scan path's best.  Fallback
    # chain: grid/int8/b64 -> XLA/bf16/b32 -> XLA/bf16/b16.
    if (budget_ok("wide")
            and time.time() - t_start < BENCH_BUDGET_S - 600):
        try:
            import gc

            chain = wav = chain512 = wav512 = sampler = None
            gc.collect()
            from vae_music_tpu.sample.decode import SampleMode, make_decode_fn
            from vae_music_tpu.train.prior_step import init_prior

            wcfg = get_config("JUKEBOX_SMALL_PRIOR")
            wvcfg = get_config("JUKEBOX_VQVAE")
            wctx = wvcfg.z_lengths[0]            # 8192
            # fused-kernel lane minimum: batch*heads(2) % 128 == 0 -> 64.
            # The XLA scan path has no lane minimum but carries 96 full-ctx
            # KV caches: bf16 batch 32 = 12 GB (fits, measured 5840 tok/s),
            # batch 64 = 24 GB (OOM on 15.75 GB HBM).  Batch 16 is the
            # fallback if this bench process's earlier allocations fragment
            # HBM enough that 32 no longer fits.
            _, wparams = init_prior(jax.random.PRNGKey(1), wvcfg, wcfg)
            wrow = None
            # r5: int8 streamed weights are the measured dispatch winner
            # (2804 -> 2628 us/step, scripts/grid_lab.py + /tmp A/Bs,
            # fidelity-gated in tests/test_decode_grid.py); bf16 weights are
            # the first fallback, then the XLA scan path.
            for wb, wkind in ((64, "grid_w8"), (64, "grid"), (32, "xla"),
                              (16, "xla")):
                try:
                    wfn = make_decode_fn(
                        wcfg, wctx, wb, mode=SampleMode.GUMBEL,
                        cache_dtype=("int8" if wkind.startswith("grid")
                                     else "bfloat16"),
                        weight_dtype=("int8" if wkind == "grid_w8" else
                                      "bfloat16" if wkind == "grid"
                                      else "float32"),
                        fused=("grid" if wkind.startswith("grid")
                               else False))
                    wout = wfn(wparams, jax.random.PRNGKey(7), None, None)
                    _ = float(jnp.sum(wout.astype(jnp.float32)))
                    # r5 (VERDICT r4 weak #6): >=3 independent runs, report
                    # best + the full list so the 3.7x claim carries a spread
                    # like every other headline.
                    wruns = []
                    for _rep in range(3):
                        t0 = time.time()
                        for _ in range(3):
                            wout = wfn(wparams, jax.random.PRNGKey(7),
                                       None, None)
                        _ = float(jnp.sum(wout.astype(jnp.float32)))
                        wruns.append((time.time() - t0 - rtt) / 3)
                    best = min(wruns)
                    wrow = {
                        "wide1024_us_per_step": round(best / wctx * 1e6, 1),
                        "wide1024_tokens_per_sec": round(wb / best * wctx),
                        "wide1024_runs_tokens_per_sec": [
                            round(wb / r * wctx) for r in wruns],
                        "wide1024_batch": wb,
                        "wide1024_path": wkind,
                    }
                    break
                except Exception as e:
                    _PARTIAL["extra"]["wide1024"] = (
                        f"{wkind} b{wb}: {type(e).__name__}: {e}"[:200])
            if wrow:
                _PARTIAL["extra"].update(wrow)
        except Exception as e:  # pragma: no cover - VMEM/HBM wall
            _PARTIAL["extra"]["wide1024"] = f"{type(e).__name__}: {e}"[:200]

    # ---- FULL wide ancestral chain from the trained artifact (r5) ----------
    # The measured replacement for r4's implied 230.6 clips/s: top prior
    # (grid kernel, ctx 1024) -> ConditionerNet upsample -> upsampler prior
    # (grid kernel, conditioned, ctx 8192) -> VQ decode, on the weights
    # scripts/soak_wide.py trained (artifacts/soak_wide).  Levels run as
    # separate jitted calls — at a ~25 s/batch chain wall, inter-stage
    # dispatch (~2 ms) is noise, and level-by-level keeps peak HBM at the
    # level-0 working set (12 GB int8 caches) instead of the sum.
    wide_art = os.path.join(REPO, "artifacts", "soak_wide")
    if (os.path.isdir(wide_art)
            and os.environ.get("VMT_SKIP_WIDE_CHAIN") != "1"
            and budget_ok("wide_chain")
            and time.time() - t_start < BENCH_BUDGET_S - 300):
        try:
            import gc

            # Free the wide1024 section's 12 GB of caches/params before the
            # chain allocates its own.
            wfn = wout = wparams = None
            gc.collect()
            from vae_music_tpu.sample.sampler import AncestralSampler
            from vae_music_tpu.train.checkpoint import load_pipeline_artifact

            wvq, wcbs, wpps = load_pipeline_artifact(wide_art)
            wvcfg = get_config("JUKEBOX_VQVAE")
            wcfgs = [get_config("JUKEBOX_SMALL_UPSAMPLER"),
                     get_config("JUKEBOX_CHAIN_TOP")]
            # bf16 prior masters: halves the resident params so the 12 GB
            # level-0 cache + bf16 cond stream fit beside them.
            wpps = [jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, p)
                for p in wpps]
            wsampler = AncestralSampler(
                wvcfg, wcfgs, wpps, wvq, wcbs,
                cache_dtype="int8", serve_dtype="bfloat16", fused="grid",
                weight_dtype="bfloat16", cond_stream_dtype="bfloat16")
            wn = 64
            # Staged (sync+free between stages) — the all-async sample_audio
            # holds every stage's working set live at once and OOMs at this
            # geometry (r5 wide soak); staged is token-identical per rng
            # (test_sample_audio_staged_equals_async).
            wav_w = wsampler.sample_audio_staged(wn, jax.random.PRNGKey(11))
            _ = float(jnp.sum(wav_w))          # compile + warm
            wclip_s = wvcfg.sample_length / SAMPLE_RATE
            wc_runs = []
            for rep in range(3):
                wav_w = None
                t0 = time.time()
                wav_w = wsampler.sample_audio_staged(
                    wn, jax.random.PRNGKey(12 + rep))
                _ = float(jnp.sum(wav_w))
                wc_runs.append(round(wn * wclip_s / (time.time() - t0 - rtt),
                                     1))
            _PARTIAL["extra"].update({
                "wide_chain_clips_per_sec": max(wc_runs),
                "wide_chain_runs": wc_runs,
                "wide_chain_batch": wn,
                "wide_chain_clip_seconds": round(wclip_s, 2),
                "wide_chain_weights": "trained:artifacts/soak_wide",
            })
        except Exception as e:  # pragma: no cover - capacity/env specific
            _PARTIAL["extra"]["wide_chain"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps(_PARTIAL))


if __name__ == "__main__":
    main()
