"""Benchmark: purified utterances/sec/chip on the flagship defense stack.

Workload = BASELINE.json's headline metric: RevDiffWave VP-SDE purification
(full 36x256 DiffWave eps-net, T=200, t=3 reverse-SDE steps) -> mel
front-end -> WideResNet-28-10 classification, batched, end-to-end jitted on
one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "utterances/sec/chip", "vs_baseline": N}

vs_baseline is measured against an analytic estimate of the PyTorch
reference on one A100: the purification forward is ~0.6 TFLOP per reverse
step per utterance (36 layers x 16000 samples x (3x256x512 + 2x256x256)
MACs), so t=3 costs ~1.81 TFLOP/utterance + classifier (~0.02 TFLOP).
Granting the torch eager pipeline 46% TF32 MFU on A100 (generous for an
eager per-step loop through torchsde) gives ~40 utt/s. BASELINE.md records
that the reference repo itself publishes no number for this workload.

Robustness contract (round-5): the script must ALWAYS emit its JSON line
inside the driver budget. Three mechanisms:
  1. BENCH_BUDGET_S (default 900 s) — before each probe section the
     elapsed time is checked against the section's estimated warm cost;
     sections that don't fit are skipped and listed in record["skipped"].
  2. SIGTERM/SIGALRM handlers — if the driver's own timeout fires first
     (or the self-alarm at BENCH_BUDGET_S+60), whatever has been measured
     so far is printed and the process exits 0. A partial record beats
     rc=124 with nothing parsed (that was round 4's failure).
  3. Probe priority order: headline -> paired-EOT marginal (the honest
     north-star number) -> shared-EOT -> EOT-1, so low budgets keep the
     most important keys. Deep/secondary programs (the shared-EOT second
     scan length) only run under BENCH_DEEP=1, which the chained probe
     scripts set once the compile cache is warm.
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_REFERENCE_UPS = 40.0  # estimated torch/A100 throughput (see docstring)

DTYPE = os.environ.get("BENCH_DTYPE", "bf16")
# bf16: 512 OOMs, 384 fits. f32 doubles every temp — batch 384 OOMs
# HBM on the XLA path and overwhelms the remote compiler on the pallas
# path; 96 measured fitting (see docs/BENCH.md round 3g)
BATCH = int(os.environ.get("BENCH_BATCH",
                           "384" if DTYPE == "bf16" else "96"))
REVERSE_T = int(os.environ.get("BENCH_T", "3"))
ITERS = int(os.environ.get("BENCH_ITERS", "6"))
CONV = os.environ.get("BENCH_CONV", "pallas")  # {'xla', 'pallas'}
DP = int(os.environ.get("BENCH_DP", "1"))      # data-parallel chips
# total wall budget for the whole script; sections that don't fit are
# skipped so the JSON line always lands (VERDICT r4 item 1)
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "900"))
# BENCH_DEEP=1 re-enables the secondary programs (shared-EOT marginal's
# second scan length) — set it only when .jax_tpu_cache is warm
DEEP = os.environ.get("BENCH_DEEP", "0") == "1"
# EOT-PGD side probe (the north-star attack workload, BASELINE.json
# configs[2]); set BENCH_EOT=0 to skip
EOT_PROBE = os.environ.get("BENCH_EOT", "1") == "1"
EOT_BATCH = int(os.environ.get("BENCH_EOT_BATCH", "16"))
EOT_ITERS = int(os.environ.get("BENCH_EOT_ITERS", "10"))

# Estimated torch/A100 ms per utterance-EOT-PGD-iteration: one PGD iter =
# 1 grad step through purify+classify (~2x forward FLOPs with the ref's
# stop-grad eps-net) = ~3.6 TFLOP/utt; at the same granted 46% TF32 MFU
# => ~25 ms/utt-iter on A100 (see docs/BENCH.md baseline section).
A100_REFERENCE_EOT_MS = 25.0

# Full reference EOT config probe (the flagship attack workload:
# eot_attack = eot_defense = 15, adaptive_attack_eval.py:142-149).
# Per-REPLICA baseline is the same 25 ms (each replica costs one
# defense-fwd + one attack fwd/bwd pair on A100). share_eot reuses the
# gradient pass's forward scores for the prediction bookkeeping (same
# estimator/replica count, docs/PARITY.md) — ~2x fewer purifications.
FULL_EOT_PROBE = os.environ.get("BENCH_FULL_EOT", "1") == "1"
FULL_EOT_SIZE = int(os.environ.get("BENCH_FULL_EOT_SIZE", "15"))
FULL_EOT_CHUNK = int(os.environ.get("BENCH_FULL_EOT_CHUNK", "15"))
FULL_EOT_SHARE = os.environ.get("BENCH_FULL_EOT_SHARE", "1") == "1"
FULL_EOT_BATCH = int(os.environ.get("BENCH_FULL_EOT_BATCH", "8"))
# 5 iters: the trailing prediction pass (one defense EOT after the
# loop, ref :426) is ~half an iteration of work — at 3 iters it
# inflates ms/utt-iter by ~17% vs the 70-iter production amortization
FULL_EOT_ITERS = int(os.environ.get("BENCH_FULL_EOT_ITERS", "5"))
# Second scan length for the MARGINAL per-iteration cost: slope
# (T_iters2 - T_iters) / (iters2 - iters) cancels the trailing
# prediction pass and any per-dispatch constant — the number that
# corresponds to the reference's 70-iteration operating point (the
# round-4a decomposition shows the raw 5-iter figure carries the
# trailing pass at 14x its production weight). 0 disables.
# 15, not 25: the remote TPU runtime kills single dispatches over
# ~60 s ("TPU worker crashed", observed twice at paired-25-iter =
# ~65 s); paired two_pass at 15 iters is ~39 s — safe margin.
FULL_EOT_ITERS2 = int(os.environ.get("BENCH_FULL_EOT_ITERS2", "15"))

T_START = time.time()
_PRINTED = False
# Estimated WARM wall cost per section (seconds), used by the budget
# guard. Cold compiles blow through any estimate — that's what the
# signal handlers are for.
SECTION_COST_S = {"paired": 300.0, "eot15": 150.0, "eot1": 60.0,
                  "train": 120.0}


def _emit(record):
    """Print the JSON line exactly once (normal path or signal path)."""
    global _PRINTED
    if _PRINTED:
        return
    _PRINTED = True
    print(json.dumps(record), flush=True)


def _time_left():
    return BUDGET_S - (time.time() - T_START)


def _fits(section, record):
    """Budget guard: True if the section's estimated warm cost fits in
    the remaining budget; otherwise record it as skipped."""
    if _time_left() >= SECTION_COST_S.get(section, 120.0):
        return True
    record.setdefault("skipped", []).append(section)
    print(f"budget guard: skipping {section} "
          f"({_time_left():.0f}s left)", file=sys.stderr)
    return False


def main():
    import jax
    import jax.numpy as jnp

    record = {
        "metric": "purified utterances/sec/chip (VP-SDE t=3 + WRN-28-10)",
        "value": None,
        "unit": "utterances/sec/chip",
        "vs_baseline": None,
    }

    # If the driver's timeout (SIGTERM) or our self-alarm fires before the
    # normal print, emit whatever has been measured and exit 0 — a partial
    # record always beats rc=124/parsed:null (round-4 failure mode).
    def _bail(signum, frame):  # pragma: no cover - signal path
        record.setdefault("skipped", []).append(f"signal:{signum}")
        _emit(record)
        os._exit(0)

    signal.signal(signal.SIGTERM, _bail)
    signal.signal(signal.SIGALRM, _bail)
    # hard self-kill: independent knob so a tiny probe budget (skip all
    # probes, keep the headline) doesn't also alarm out the headline
    signal.alarm(int(float(os.environ.get("BENCH_HARD_KILL_S",
                                          str(BUDGET_S + 60)))))

    try:  # persistent compile cache: repeat runs skip the 5-15 min
        # remote compiles (harmless if the backend ignores it)
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)),
                              ".jax_tpu_cache"))
    except Exception:
        pass

    from audiopure_tpu import AcousticSystem
    from audiopure_tpu.diffusion.vpsde import RevDiffWave
    from audiopure_tpu.models import create_classifier
    from audiopure_tpu.models.wavenet import WaveNet
    from audiopure_tpu.ops import MelFrontEnd

    compute_dtype = jnp.bfloat16 if DTYPE == "bf16" else jnp.float32

    L = 16000
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (BATCH, 1, L), dtype=jnp.float32) * 0.05

    net = WaveNet(dtype=compute_dtype)  # full DiffWave config (36 x 256)
    wparams = net.init(jax.random.PRNGKey(1), x[:1], jnp.zeros((1, 1)))
    if CONV == "pallas":
        from audiopure_tpu.kernels.wavenet_block import \
            wavenet_forward_pallas
        eps_fn = lambda xx, tt: wavenet_forward_pallas(
            wparams, xx, tt, dtype=compute_dtype).astype(jnp.float32)
    else:
        eps_fn = lambda xx, tt: net.apply(wparams, xx, tt).astype(
            jnp.float32)
    defender = RevDiffWave(eps_fn, T=200, t=REVERSE_T, sample_step=1,
                           remat=False)

    fe = MelFrontEnd()
    clf = create_classifier("wideresnet28_10", num_classes=10,
                            dtype=compute_dtype)
    cvars = clf.init(jax.random.PRNGKey(2), fe(x[:1]))
    classifier = lambda s: clf.apply(cvars, s).astype(jnp.float32)

    system = AcousticSystem(classifier, fe, defender, "wave")

    # --- optional dp sharding: batch split over BENCH_DP chips ----------
    # (the v4-8 path; on a 1-chip host BENCH_DP=1 is a no-op)
    if DP > 1:
        from audiopure_tpu.parallel import batch_sharding, make_mesh
        assert BATCH % DP == 0, (BATCH, DP)
        mesh = make_mesh(jax.devices()[:DP], dp=DP, tp=1)
        x = jax.device_put(x, batch_sharding(mesh, ndim=3))

    # hoisted_jit: weights become XLA parameters instead of hundreds of
    # MB of program literals -> much faster remote compiles (jit_utils)
    from audiopure_tpu.utils.jit_utils import hoisted_jit

    purify_and_classify = hoisted_jit(lambda x, key: system(x, key=key))

    # warm-up / compile; if the pallas path hits a flaky remote-compile
    # failure, fall back to the XLA conv path rather than record nothing
    k = jax.random.PRNGKey(3)
    try:
        # materialise on host: block_until_ready returns early
        # through the remote tunnel, which would push the whole
        # first compile into the timed region
        float(jnp.abs(purify_and_classify(x, k)[0]).sum())
    except Exception as e:  # pragma: no cover - infra flakiness
        if CONV != "pallas":
            raise
        print(f"pallas path failed to compile ({type(e).__name__}); "
              f"falling back to xla", file=sys.stderr)
        eps_fn = lambda xx, tt: net.apply(wparams, xx, tt).astype(
            jnp.float32)
        defender = RevDiffWave(eps_fn, T=200, t=REVERSE_T, sample_step=1,
                               remat=False)
        system = AcousticSystem(classifier, fe, defender, "wave")
        purify_and_classify = hoisted_jit(  # noqa: F811
            lambda x, key: system(x, key=key))
        float(jnp.abs(purify_and_classify(x, k)[0]).sum())

    # best-of-R sustained loops: each rep is still a mean over ITERS
    # consecutive dispatches (sustained throughput), but taking the best
    # rep guards the headline against a transiently degraded worker —
    # the remote runtime serves ~30% slow for minutes after a worker
    # restart (observed round 4: 68.99 vs the reproducible 99.11 utt/s
    # four minutes after a kill). Both conventions are emitted (value =
    # best rep; headline_mean_utt_s = mean of reps) so cross-round
    # tables stay comparable (VERDICT r4 item 8).
    REPS = int(os.environ.get("BENCH_HEADLINE_REPS", "3"))
    rep_times = []
    for _ in range(max(REPS, 1)):
        t0 = time.perf_counter()
        for i in range(ITERS):
            k, sub = jax.random.split(k)
            out = purify_and_classify(x, sub)
        # device->host materialisation, not just block_until_ready (see
        # the EOT probe below for why); logits are tiny so transfer is
        # free
        float(jnp.abs(out).sum())
        rep_times.append(time.perf_counter() - t0)
    dt = min(rep_times)

    ups = BATCH * ITERS / dt / max(DP, 1)
    ups_mean = (BATCH * ITERS * len(rep_times)
                / sum(rep_times) / max(DP, 1))

    record["value"] = round(ups, 2)
    record["vs_baseline"] = round(ups / A100_REFERENCE_UPS, 3)
    record["headline_mean_utt_s"] = round(ups_mean, 2)
    if DP > 1:
        record["dp"] = DP
        record["total_utt_per_sec"] = round(ups * DP, 2)

    def _time_eot_attack(make_atk, n_iters, seed0):
        """Min wall-clock of 2 timed runs of a freshly built attack at
        ``n_iters`` scan length (1 warmup; device->host barrier)."""
        atk = make_atk(n_iters)
        xa = x[:FULL_EOT_BATCH]
        ya = jnp.zeros((FULL_EOT_BATCH,), dtype=jnp.int32)
        out = atk.generate(xa, ya, jax.random.PRNGKey(seed0))
        float(jnp.abs(out[0] - xa).max())    # airtight barrier
        times = []
        for rep in range(2):
            t0 = time.perf_counter()
            out = atk.generate(xa, ya,
                               jax.random.PRNGKey(seed0 + 1 + rep))
            dmax = float(jnp.abs(out[0] - xa).max())
            times.append(time.perf_counter() - t0)
            if not (dmax > 0 or bool(out[1][0].all())):
                raise RuntimeError("EOT probe did not move input")
        return min(times)

    def _emit_eot_keys(prefix, make_atk, seed0, cfg, marginal=True):
        t1 = _time_eot_attack(make_atk, FULL_EOT_ITERS, seed0)
        ms_utt_iter = t1 * 1e3 / (FULL_EOT_BATCH * FULL_EOT_ITERS)
        E = FULL_EOT_SIZE
        record[f"{prefix}_ms_per_utt_iter"] = round(ms_utt_iter, 1)
        record[f"{prefix}_ms_per_utt_iter_replica"] = round(
            ms_utt_iter / E, 2)
        record[f"{prefix}_vs_baseline"] = round(
            A100_REFERENCE_EOT_MS / (ms_utt_iter / E), 3)
        record[f"{prefix}_config"] = cfg
        if marginal and FULL_EOT_ITERS2 > FULL_EOT_ITERS:
            # marginal per-iteration cost: the slope between two scan
            # lengths cancels the trailing prediction pass (ref :426)
            # and per-dispatch constants — the 70-iter operating point
            t2 = _time_eot_attack(make_atk, FULL_EOT_ITERS2, seed0 + 40)
            dmarg = ((t2 - t1) * 1e3
                     / (FULL_EOT_BATCH * (FULL_EOT_ITERS2
                                          - FULL_EOT_ITERS)))
            record[f"{prefix}_marginal_ms_per_utt_iter_replica"] = round(
                dmarg / E, 2)
            record[f"{prefix}_marginal_vs_baseline"] = round(
                A100_REFERENCE_EOT_MS / (dmarg / E), 3)

    # --- exact reference pairing (two independent EOT stacks/iter) -----
    # the honest-headline configuration (white_box_attack.py:386-435):
    # no share_eot deviation. Runs FIRST among the attack probes: its
    # marginal is the north-star per-chip number, so low budgets keep it.
    # BENCH_EOT_PAIRED_MODE picks the schedule (two_pass | fused, see
    # EOT.paired); default set by the round-4a A/B.
    if (FULL_EOT_PROBE
            and os.environ.get("BENCH_EOT_PAIRED", "1") == "1"
            and _fits("paired", record)):
        try:
            from audiopure_tpu.attacks import AudioAttack

            mode = os.environ.get("BENCH_EOT_PAIRED_MODE", "two_pass")
            model_fn = lambda xx, kk: system(xx, key=kk)
            E = FULL_EOT_SIZE
            _emit_eot_keys(
                "eot15_paired",
                lambda n: AudioAttack(
                    model_fn, eps=0.002, norm="linf", max_iter_1=n,
                    learning_rate_1=0.002 / 5,
                    eot_attack_size=E, eot_defense_size=E,
                    eot_chunk=FULL_EOT_CHUNK,
                    pair_fused=(mode == "fused")),
                seed0=29,
                cfg={"eot": E, "chunk": FULL_EOT_CHUNK, "mode": mode,
                     "batch": FULL_EOT_BATCH})
        except Exception as e:  # pragma: no cover - keep the headline
            print(f"paired-EOT probe failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # --- FULL EOT 15x15 probe (share_eot schedule) ----------------------
    # Second scan length (marginal keys) only under BENCH_DEEP=1: it is a
    # separate multi-minute cold compile and the paired marginal above is
    # the number that matters (VERDICT r4 item 1b).
    if FULL_EOT_PROBE and _fits("eot15", record):
        try:
            from audiopure_tpu.attacks import AudioAttack

            model_fn = lambda xx, kk: system(xx, key=kk)
            E = FULL_EOT_SIZE
            _emit_eot_keys(
                "eot15",
                lambda n: AudioAttack(
                    model_fn, eps=0.002, norm="linf", max_iter_1=n,
                    learning_rate_1=0.002 / 5,
                    eot_attack_size=E, eot_defense_size=E,
                    eot_chunk=FULL_EOT_CHUNK, share_eot=FULL_EOT_SHARE),
                seed0=19,
                cfg={"eot": E, "chunk": FULL_EOT_CHUNK,
                     "share_eot": FULL_EOT_SHARE,
                     "batch": FULL_EOT_BATCH},
                marginal=DEEP)
        except Exception as e:  # pragma: no cover - keep the headline
            print(f"full-EOT probe failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # --- EOT-1 PGD probe: the plain adaptive-attack workload -------------
    if EOT_PROBE and _fits("eot1", record):
        try:
            from audiopure_tpu.attacks import AudioAttack

            model_fn = lambda xx, kk: system(xx, key=kk)
            atk = AudioAttack(model_fn, eps=0.002, norm="linf",
                              max_iter_1=EOT_ITERS,
                              learning_rate_1=0.002 / 5)
            xa = x[:EOT_BATCH]
            ya = jnp.zeros((EOT_BATCH,), dtype=jnp.int32)
            ka = jax.random.PRNGKey(9)
            out = atk.generate(xa, ya, ka)  # compile + warm run
            # force a device->host round trip, not just block_until_ready:
            # through the remote-execution tunnel block_until_ready has
            # been observed returning before the program finishes (bogus
            # 0.01ms readings); materialising the adv waveform on host is
            # the only airtight completion barrier (transfer cost ~1MB,
            # negligible vs the multi-second attack program)
            float(jnp.abs(out[0] - xa).max())
            times = []
            for rep in range(2):
                t0 = time.perf_counter()
                out = atk.generate(xa, ya, jax.random.PRNGKey(10 + rep))
                dmax = float(jnp.abs(out[0] - xa).max())
                times.append(time.perf_counter() - t0)
                # dmax==0 is legitimate when every example already
                # misclassifies at iteration 0 (ref contract returns the
                # clean waveform then) — require success in that case
                if not (dmax > 0 or bool(out[1][0].all())):
                    raise RuntimeError(f"EOT probe produced dmax={dmax} "
                                       f"with unsuccessful attacks")
            dt_atk = min(times)
            ms_per_utt_iter = dt_atk * 1e3 / (EOT_BATCH * EOT_ITERS)
            record["eot_pgd_ms_per_utt_iter"] = round(ms_per_utt_iter, 2)
            record["eot_pgd_vs_baseline"] = round(
                A100_REFERENCE_EOT_MS / ms_per_utt_iter, 3)
        except Exception as e:  # pragma: no cover - keep the headline
            print(f"EOT probe failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # --- optional: DiffWave training throughput (BENCH_TRAIN=1) --------
    # off by default: the step is a separate multi-minute remote compile
    # and the headline metric must never hinge on it
    if os.environ.get("BENCH_TRAIN", "0") == "1" and _fits("train", record):
        try:
            import optax

            from audiopure_tpu.diffusion.schedule import make_schedule
            from audiopure_tpu.kernels.wavenet_stack_train import \
                wavenet_forward_pallas_train
            from audiopure_tpu.training.diffwave import (init_train_state,
                                                         make_train_step)

            TB = int(os.environ.get("BENCH_TRAIN_BATCH", "8"))
            sched = make_schedule(200, 1e-4, 0.02)
            opt = optax.adam(2e-4)
            tfn = (lambda p, xx, tt: wavenet_forward_pallas_train(
                p, xx, tt, dtype=compute_dtype).astype(jnp.float32)) \
                if CONV == "pallas" else \
                (lambda p, xx, tt: net.apply(p, xx, tt).astype(
                    jnp.float32))
            step_fn = jax.jit(make_train_step(tfn, sched, opt),
                              donate_argnums=0)
            tstate = init_train_state(
                jax.tree_util.tree_map(jnp.copy, wparams), opt,
                jax.random.PRNGKey(31))
            x_tr = x[:TB].astype(jnp.float32)
            tstate, l0 = step_fn(tstate, x_tr)
            float(l0)
            steps = 20
            t0 = time.perf_counter()
            for _ in range(steps):
                tstate, l0 = step_fn(tstate, x_tr)
            float(l0)
            sps = steps / (time.perf_counter() - t0)
            step_tflop = 3 * 0.604 * TB * x_tr.shape[-1] / 16000
            record["train_steps_per_sec"] = round(sps, 2)
            if DTYPE == "bf16":
                # the MFU denominator is the bf16 MXU peak; f32 runs
                # report raw steps/s only
                record["train_mfu_pct"] = round(
                    100 * step_tflop * sps / 197.0, 1)
            record["train_batch"] = TB
        except Exception as e:  # pragma: no cover - keep the headline
            print(f"train probe failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    signal.alarm(0)
    _emit(record)


if __name__ == "__main__":
    main()
