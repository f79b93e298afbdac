"""Round-4c: the flagship eval ONCE at full config, end-to-end wall-clock.

VERDICT r3 #5: replace the ~21 min projection with a measured
uninterrupted run of the reference harness shape
(``adaptive_attack_eval.py:167-291``): 100 SC09-shaped examples x 70 PGD
iterations x EOT 15x15 exact pairing, one chip, through
``cli.adaptive_attack_eval`` itself (loader -> pad -> clean/purified
predictions -> attack -> accuracy table).

The released SC09 wavs/checkpoints do not exist in this container
(docs/PARITY.md), so: full-architecture models (36x256 DiffWave,
WRN-28-10) at random init are saved as real orbax checkpoints; 100 tone
waveforms are labeled by the DEFENDED system's majority prediction and
written as a real SC09-layout wav tree — so clean/purified accuracy are
high by construction and the attack must genuinely flip the defended
model. Accuracy numbers characterize the harness at the paper's compute
scale, not the paper's checkpoints (flagged in BENCH.md).

FLAGSHIP_SMOKE=1: tiny models + CPU + 2 iters, validates the plumbing.
Env knobs: FLAGSHIP_N (100), FLAGSHIP_ITERS (70), FLAGSHIP_BATCH (8),
FLAGSHIP_PAIR_MODE (two_pass|fused).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

SMOKE = os.environ.get("FLAGSHIP_SMOKE", "0") == "1"
N_TOTAL = int(os.environ.get("FLAGSHIP_N", "16" if SMOKE else "100"))
ITERS = int(os.environ.get("FLAGSHIP_ITERS", "2" if SMOKE else "70"))
BATCH = int(os.environ.get("FLAGSHIP_BATCH", "8"))
EOT = int(os.environ.get("FLAGSHIP_EOT", "2" if SMOKE else "15"))
# two_pass: the measured-better schedule for the waveform path (round
# 4a: fused is a null there — the forward is batch-saturated); matches
# the eval CLI's --pair_mode auto resolution for --defense Diffusion
PAIR_MODE = os.environ.get("FLAGSHIP_PAIR_MODE", "two_pass")
WORK = "/tmp/flagship_smoke" if SMOKE else "/tmp/flagship"


def main():
    if SMOKE:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device"
                                     "_count=1").strip()
    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    else:
        try:
            jax.config.update("jax_compilation_cache_dir",
                              "/root/repo/.jax_tpu_cache")
        except Exception:
            pass
    import jax.numpy as jnp
    import numpy as np

    from audiopure_tpu import AcousticSystem, utils as ap_utils
    from audiopure_tpu.data.datasets import SC09_CLASSES
    from audiopure_tpu.diffusion.vpsde import RevDiffWave
    from audiopure_tpu.models import create_classifier
    from audiopure_tpu.models.wavenet import WaveNet
    from audiopure_tpu.ops import MelFrontEnd
    from audiopure_tpu.utils import checkpoint as ckpt_lib
    from audiopure_tpu.utils.jit_utils import hoisted_jit

    print(f"devices: {jax.devices()} smoke={SMOKE}", flush=True)
    os.makedirs(WORK, exist_ok=True)
    L = 16000
    dtype = jnp.float32 if SMOKE else jnp.bfloat16

    # ---- full-architecture models, random init, saved as checkpoints --
    if SMOKE:
        net = WaveNet(res_channels=16, skip_channels=16, num_res_layers=4,
                      dilation_cycle=2, diffusion_step_embed_dim_in=16,
                      diffusion_step_embed_dim_mid=32,
                      diffusion_step_embed_dim_out=32)
    else:
        net = WaveNet(dtype=dtype)          # 36 x 256 DiffWave config
    x0 = jnp.zeros((1, 1, L))
    wparams = net.init(jax.random.PRNGKey(0), x0, jnp.zeros((1, 1)))
    ddpm_dir = os.path.join(WORK, "ddpm_ckpt")
    ckpt_lib.save_model(ddpm_dir, wparams, {"model_name": "diffwave"})
    ddpm_cfg = None
    if SMOKE:  # the CLI must build the same tiny net shape
        ddpm_cfg = os.path.join(WORK, "ddpm_config.json")
        with open(ddpm_cfg, "w") as f:
            json.dump({"wavenet_config": {
                "res_channels": 16, "skip_channels": 16,
                "num_res_layers": 4, "dilation_cycle": 2,
                "diffusion_step_embed_dim_in": 16,
                "diffusion_step_embed_dim_mid": 32,
                "diffusion_step_embed_dim_out": 32}}, f)

    clf_name = "m5" if SMOKE else "wideresnet28_10"
    clf = create_classifier(clf_name, num_classes=10,
                            dtype=jnp.float32 if SMOKE else dtype)
    fe = MelFrontEnd()
    dummy = x0 if clf_name == "m5" else fe(x0)
    cvars = clf.init(jax.random.PRNGKey(1), dummy)
    clf_dir = os.path.join(WORK, "clf_ckpt")
    ckpt_lib.save_model(clf_dir, cvars,
                        {"model_name": clf_name, "num_classes": 10})

    # ---- 100 tones labeled by the defended system's majority vote -----
    rng = np.random.RandomState(7)
    t_ax = np.arange(L) / 16000.0
    freqs = rng.uniform(200, 3500, size=(N_TOTAL, 1))
    phases = rng.uniform(0, 2 * np.pi, size=(N_TOTAL, 1))
    amps = rng.uniform(0.2, 0.6, size=(N_TOTAL, 1))
    waves = (amps * np.sin(2 * np.pi * freqs * t_ax[None, :] + phases)
             ).astype(np.float32)[:, None, :]

    eps_fn = lambda xx, tt: net.apply(wparams, xx, tt).astype(jnp.float32)
    defender = RevDiffWave(eps_fn, T=200, t=3)
    front = (lambda w: w) if clf_name == "m5" else fe
    system = AcousticSystem(
        lambda s: clf.apply(cvars, s).astype(jnp.float32),
        front, defender, "wave")

    def majority(x, key):
        keys = jax.random.split(key, 5)
        scores = jax.vmap(lambda k: system(x, key=k))(keys)
        votes = jnp.argmax(scores, axis=-1)            # (5, B)
        onehot = jax.nn.one_hot(votes, 10).sum(axis=0)
        return jnp.argmax(onehot, axis=-1)

    label_fn = hoisted_jit(majority)
    labels = []
    for i in range(0, N_TOTAL, BATCH):
        xb = jnp.asarray(waves[i: i + BATCH])
        if xb.shape[0] < BATCH:
            xb = jnp.concatenate(
                [xb, jnp.repeat(xb[-1:], BATCH - xb.shape[0], 0)], 0)
        pred = label_fn(xb, jax.random.PRNGKey(100 + i))
        labels.extend(np.asarray(pred)[: min(BATCH, N_TOTAL - i)].tolist())
    print(f"label histogram: {np.bincount(labels, minlength=10).tolist()}",
          flush=True)

    data_dir = os.path.join(WORK, "sc09_synth")
    for i, (w, lab) in enumerate(zip(waves, labels)):
        ap_utils.audio_save(
            w, os.path.join(data_dir, SC09_CLASSES[int(lab)]),
            f"{i:03d}.wav")

    # ---- the reference harness, one uninterrupted run ------------------
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [sys.executable, "-m", "cli.adaptive_attack_eval",
           "--data_path", data_dir,
           "--classifier_path", clf_dir,
           "--classifier_input", "mel32",   # ignored for m5 (wave input)
           "--defense", "Diffusion", "--diffusion_type", "sde",
           "--t", "3", "--ddpm_path", ddpm_dir,
           *(["--ddpm_config", ddpm_cfg] if ddpm_cfg else []),
           "--attack", "PGD", "--eps", "0.002",
           "--max_iter_1", str(ITERS),
           "--eot_attack_size", str(EOT),
           "--eot_defense_size", str(EOT),
           "--batch_size", str(BATCH),
           "--num_per_class", "-1",
           "--conv_impl", "xla" if SMOKE else "pallas",
           "--compute_dtype", "f32" if SMOKE else "bf16"]
    if PAIR_MODE == "fused":
        cmd.append("--pair_fused")
    env = dict(os.environ)
    if SMOKE:
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)
    print("RUN:", " ".join(cmd), flush=True)
    t0 = time.perf_counter()
    proc = subprocess.Popen(cmd, cwd=here, env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    lines = []
    first_batch_t = None
    for line in proc.stdout:
        print(line, end="", flush=True)
        lines.append(line)
        if first_batch_t is None and line.startswith("batch 0:"):
            first_batch_t = time.perf_counter() - t0
    proc.wait()
    wall = time.perf_counter() - t0

    result = {
        "n_examples": N_TOTAL, "iters": ITERS, "eot": EOT,
        "batch": BATCH, "pair_mode": PAIR_MODE,
        "wall_s_total": round(wall, 1),
        "wall_s_to_first_batch (compile+batch0)":
            round(first_batch_t or -1, 1),
        "returncode": proc.returncode,
        "final_acc_line": next(
            (ln.strip() for ln in reversed(lines) if "robust acc" in ln),
            None),
    }
    if first_batch_t is not None:
        n_batches = -(-N_TOTAL // BATCH)
        if n_batches > 1:
            steady = (wall - first_batch_t) / (n_batches - 1)
            result["steady_s_per_batch"] = round(steady, 1)
            result["steady_s_per_utt"] = round(steady / BATCH, 2)
    print(json.dumps(result), flush=True)
    with open("/tmp/round4c_results.json", "w") as f:
        json.dump(result, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
