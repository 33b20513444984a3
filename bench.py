"""Headline benchmark: 5-fold mel-CNN full-test inference, clips/sec/chip.

The reference's published number (README.md:37 / BASELINE.md): full stage-1
test inference, 1 model x 5 folds, ~1 minute on a single GPU with on-device
STFT/mel and similar-length batching. Stage-1 test is ~1120 clips, so the
baseline is ~18.7 clips/sec through the whole 5-fold ensemble.

This benchmark reproduces that workload shape on synthetic audio with the
FSDKaggle2019 test length distribution (~1-15 s at 44.1 kHz): a
reference-scale 2d mel CNN (6 blocks, base depth 64, growth 1.5, ~10M params)
over length-bucketed batches, 5 sequential fold passes per clip, fused
STFT->mel->log featurization on device. Prints ONE json line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: warm runs skip the ~1-3 min/program XLA compiles
# that otherwise dominate the wall time over the axon tunnel
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from freesound_classification_tpu.data.bucketing import (
    bucket_of,
    make_bucket_ladder,
)
from freesound_classification_tpu.models.classifiers import TwoDimensionalCNN
from freesound_classification_tpu.models.frontend import Frontend

SR = 44100
N_CLASSES = 80
N_FOLDS = 5
N_CLIPS = 1120  # stage-1 test scale
BASELINE_CLIPS_PER_SEC = 1120.0 / 60.0  # reference: ~1 min for the full job

FEATURES = "mel_2048_1024_128"


def build_model_and_params(key):
    model = TwoDimensionalCNN(
        num_conv_blocks=6,
        start_deep_supervision_on=2,
        conv_base_depth=64,
        growth_rate=1.5,
        aggregation_type="max",
        n_classes=N_CLASSES,
        dtype=jnp.bfloat16,
        # fused_infer=False: the BN-folded einsum/conv twin measured ~7%
        # faster at ISOLATED block level but 2.35x SLOWER at model level
        # (8.47 vs 19.86 ms fwd, 45.6 vs 112.4 ms 5-fold, v5e-1 — it
        # regressed this bench 1847 -> 665 clips/s); the plain flax block
        # is the production inference path (scripts/probe_fused_infer.py)
        fused_infer=False,
        # block0-only phase-decomposed conv+pool (4 stride-2 phase convs +
        # one elementwise max instead of conv + reduce-window): model-level
        # 5-fold A/B 49.9 -> 47.3 ms, reproduced on cached binaries
        # (scripts/probe_phase_pool.py, v5e-1). Deeper blocks LOSE (the 4x
        # input re-reads outgrow the pool savings: blocks 0-1 0.95x).
        phase_pool=(True,),
    )
    # bf16 model: single-bf16-pass block-DFT (the model quantizes its
    # input to bf16 regardless; logit corr vs the 3-pass oracle gated in
    # tpu_smoke / scripts/probe_dft_precision.py)
    frontend = Frontend(FEATURES, "2d", sr=SR, use_pallas=True,
                        dft_precision="default")
    wave = jnp.zeros((4, 65536), jnp.float32)
    lengths = jnp.full((4,), 65536, jnp.int32)
    inputs, fl = frontend(wave, lengths)
    variables = model.init({"params": jax.random.PRNGKey(0)}, inputs, fl,
                           train=False)
    # 5 "fold" weight sets: one init, per-fold host-side perturbations
    # (init on this tunnel costs ~160 s/program — no reason to pay it 5x
    # for a benchmark; host noise avoids per-leaf device round trips)
    host_vars = jax.device_get(variables)
    rng = np.random.RandomState(1)

    def perturb():
        return jax.tree.map(
            lambda leaf: (
                leaf + (0.01 * rng.randn(*leaf.shape)).astype(leaf.dtype)
                if np.issubdtype(leaf.dtype, np.floating) else leaf
            ),
            host_vars,
        )

    folds = [perturb() for _ in range(N_FOLDS)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *folds)
    return model, frontend, stacked


def synthetic_clip_lengths(n, seed=0):
    """FSDKaggle2019-ish test length distribution: 1-15 s, median ~5 s."""
    rng = np.random.RandomState(seed)
    secs = np.clip(rng.lognormal(mean=1.45, sigma=0.6, size=n), 1.0, 15.0)
    return (secs * SR).astype(np.int64)


def _wait_for_tpu(retries: int = 6, delay: float = 20.0) -> None:
    """The axon TPU tunnel is single-client and occasionally needs a moment
    after another process releases it; retry backend init."""
    for attempt in range(retries):
        try:
            jax.devices()
            return
        except RuntimeError:
            if attempt == retries - 1:
                raise
            time.sleep(delay)


def _force(out) -> float:
    """Force completion by reading one scalar (block_until_ready returns
    WITHOUT waiting over the axon tunnel; programs execute serially, so
    forcing the last output forces everything before it)."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf) if leaf.ndim else leaf)


def bench_train_steps(n: int = 20) -> dict:
    """Train-step benchmark at the canonical training shape (B=64 x 10 s,
    mel_2048_1024_128, reference-scale 2d CNN): full-augmentation and
    no-augmentation step times, MFU and post-fusion HBM traffic.

    The reference's dominant workload is this hot loop
    (/root/reference/networks/classifiers.py:633-707); documented honest
    numbers (profile_train_step.py sessions): 90.7 ms full aug / 45.9 ms
    no-aug, no-aug at 81.5% of measured sustainable HBM bw (its memory
    floor). Same methodology: dispatch n steps, read ONE scalar,
    subtract the measured scalar-readback RTT, divide by n.
    """
    from freesound_classification_tpu.ops import augment
    from freesound_classification_tpu.ops.losses import make_loss
    from freesound_classification_tpu.training.optimizers import (
        make_optimizer,
    )
    from freesound_classification_tpu.training.state import (
        create_train_state,
    )
    from freesound_classification_tpu.utils.hlo_traffic import (
        compiled_traffic_bytes,
    )

    b, l = 64, SR * 10
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(b, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b,), l, jnp.int32)
    labels = jnp.asarray((rng.rand(b, N_CLASSES) < 0.05).astype(np.float32))

    frontend = Frontend(FEATURES, "2d", sr=SR, use_pallas=True,
                        dft_precision="default")
    model = TwoDimensionalCNN(
        num_conv_blocks=6, start_deep_supervision_on=2, conv_base_depth=64,
        growth_rate=1.5, aggregation_type="max", n_classes=N_CLASSES,
        dtype=jnp.bfloat16)
    augmenter = augment.make_augmenter(augment.AugmentConfig(
        p_mixup=0.5, p_aug=0.75, p_shuffle=0.5))
    tx = make_optimizer("adam", lambda s: 1e-3, 0.0)
    inputs, fl = frontend(wave, lengths)
    state = create_train_state(model, inputs, fl, tx, seed=0)
    loss_fn = make_loss("lsep")

    def make_train_step(use_augment):
        def train_step(state, w, ln, y):
            rng_, step_rng, drop = jax.random.split(state.rng, 3)
            if use_augment:
                w, ln, y = augmenter(w, ln, y, step_rng, 1.0)
            x, f = frontend(w, ln)

            def loss_of(params):
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    x, f, mutable=["batch_stats"], rngs={"dropout": drop},
                    train=True)
                return (jnp.mean(loss_fn(out["class_logits"], y,
                                         average=False)),
                        mut["batch_stats"])

            (loss, new_stats), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads, batch_stats=new_stats,
                                          rng=rng_)
            return state, loss

        return train_step

    # scalar-readback RTT (median of 5)
    rtts = []
    for _ in range(5):
        t0 = time.time()
        float(jnp.sum(lengths))
        rtts.append(time.time() - t0)
    rtt = float(np.median(rtts))

    out = {}
    for key, use_aug in (("noaug", False), ("aug", True)):
        step = jax.jit(make_train_step(use_aug))
        flops = traffic = 0.0
        try:
            compiled = step.lower(state, wave, lengths, labels).compile()
            flops = float(compiled.cost_analysis().get("flops", 0.0))
            traffic = float(compiled_traffic_bytes(compiled))
        except Exception:
            pass
        state2, loss = step(state, wave, lengths, labels)
        _force(loss)  # compile+first run
        t0 = time.time()
        for _ in range(n):
            state2, loss = step(state, wave, lengths, labels)
        _force(loss)
        ms = (time.time() - t0 - rtt) / n * 1e3
        out[f"train_step_ms_{key}"] = round(ms, 1)
        if flops > 0 and ms > 0:
            out[f"train_mfu_{key}"] = round(flops / (ms * 1e-3) / 197e12, 4)
            out[f"train_hbm_gbps_{key}"] = round(
                traffic / (ms * 1e-3) / 1e9, 1)
    # headline alias (VERDICT r4 next #1 naming)
    if "train_mfu_noaug" in out:
        out["train_mfu"] = out["train_mfu_noaug"]
    return out


def main():
    _wait_for_tpu()
    model, frontend, stacked = build_model_and_params(0)

    @jax.jit
    def infer_5fold(wave, lengths):
        # one program for all folds: shared featurization, folds vmapped
        # (training/ensemble.py design; 4x the sequential-fold throughput)
        inputs, fl = frontend(wave, lengths)

        def one_fold(variables):
            return model.apply(variables, inputs, fl,
                               train=False)["class_logits"]

        logits = jax.vmap(one_fold)(stacked)
        return jnp.mean(jax.nn.sigmoid(logits), axis=0)

    lengths = synthetic_clip_lengths(N_CLIPS)
    ladder = make_bucket_ladder(int(lengths.max()), min_length=SR)
    buckets = bucket_of(lengths, ladder)

    # per-bucket batches sized to ~constant total samples (similar-length
    # batching, the reference's winning inference trick, README.md:37).
    # Chunks within a bucket are equalized (last one padded with repeated
    # clips, not counted) so each bucket compiles exactly ONE program —
    # XLA compiles at ~1-3 min/shape over the tunnel dominate otherwise.
    max_batch_elems = 128 * SR * 10
    batches = []
    rng = np.random.RandomState(1)
    for b in range(len(ladder)):
        ids = np.flatnonzero(buckets == b)
        if ids.size == 0:
            continue
        bl = ladder[b]
        bs_cap = max(min(int(max_batch_elems // bl), 512), 8)
        nb = -(-len(ids) // bs_cap)
        bs = -(-len(ids) // nb)  # equal chunk size
        padded = np.concatenate(
            [ids, ids[: nb * bs - len(ids)]])  # repeat head clips as filler
        for k in range(0, len(padded), bs):
            chunk = padded[k : k + bs]
            wave = rng.randn(len(chunk), bl).astype(np.float32) * 0.1
            for row, i in enumerate(chunk):
                wave[row, lengths[i]:] = 0.0
            batches.append(
                (jnp.asarray(wave),
                 jnp.asarray(lengths[chunk].astype(np.int32))))

    if not batches:
        raise RuntimeError("bench produced no batches — bucket/config bug")
    # padded filler rows execute in the timed loop but aren't counted in
    # N_CLIPS; surface the deflation instead of hiding it (no-silent-caps)
    n_rows = sum(int(w.shape[0]) for w, _ in batches)
    pad_fraction = (n_rows - N_CLIPS) / n_rows

    # warmup: compile every bucket shape. NOTE: over the axon tunnel,
    # block_until_ready returns WITHOUT waiting for execution — only a
    # value readback forces completion (device programs still run serially,
    # so forcing the last output forces everything before it).
    for wave, ln in batches:
        out = infer_5fold(wave, ln)
    float(jnp.sum(out))

    # FLOP / HBM-byte totals per executed program (compiles are cached —
    # the jit above already built each shape). "flops" counts each MAC as
    # 2; with a bf16 model the convs/matmuls dominate, so MFU is vs the
    # v5e bf16 MXU peak. Traffic uses the repo's single utilization
    # semantics (utils/hlo_traffic.py): post-fusion top-level HLO traffic,
    # the same measure as scripts/probe_traffic_floor.py — XLA's "bytes
    # accessed" is kept only as an explicitly-labeled upper bound.
    from freesound_classification_tpu.utils.hlo_traffic import (
        compiled_traffic_bytes,
    )

    total_flops = 0.0
    total_bytes = 0.0
    total_bytes_ub = 0.0
    cost_by_shape: dict = {}
    try:
        for wave, ln in batches:
            shape = wave.shape
            if shape not in cost_by_shape:
                compiled = infer_5fold.lower(wave, ln).compile()
                cost_by_shape[shape] = (
                    compiled.cost_analysis(),
                    compiled_traffic_bytes(compiled),
                )
            ca, traffic = cost_by_shape[shape]
            total_flops += float(ca.get("flops", 0.0))
            total_bytes += float(traffic)
            total_bytes_ub += float(ca.get("bytes accessed", 0.0))
    except Exception:
        total_flops = total_bytes = total_bytes_ub = 0.0  # backend-dependent

    # timed: the full 5-fold ensemble over the whole test set
    t0 = time.time()
    for wave, ln in batches:
        out = infer_5fold(wave, ln)
    float(jnp.sum(out))
    dt = time.time() - t0

    clips_per_sec = N_CLIPS / dt
    print(f"# pad_fraction={pad_fraction:.4f} "
          f"({n_rows - N_CLIPS} filler rows of {n_rows}; reported "
          "clips/s undercounts by this fraction)", flush=True)
    record = {
        "metric": "5fold_melcnn_inference_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 2),
    }
    if total_flops > 0:
        # v5e-1 peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM (708 GB/s
        # measured sustainable, scripts/probe_stream_bw.py). mfu =
        # achieved FLOP/s vs MXU peak; hbm_gbps = post-fusion top-level
        # HLO traffic per second (the floor-probe semantics);
        # hbm_gbps_xla_ub = XLA "bytes accessed" per second, an upper
        # bound counting fusion-internal reads, kept for continuity with
        # BENCH_r03 and earlier.
        record["mfu"] = round(total_flops / dt / 197e12, 4)
        record["hbm_gbps"] = round(total_bytes / dt / 1e9, 1)
        record["hbm_gbps_xla_ub"] = round(total_bytes_ub / dt / 1e9, 1)
    # driver-visible TRAIN benchmark (VERDICT r4 next #1): extra keys only,
    # the primary metric/value contract above stays intact
    try:
        record.update(bench_train_steps())
    except Exception as e:  # never let the train probe kill the headline
        print(f"# train-step bench failed: {e!r}", flush=True)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
