"""tpuseg benchmark — prints ONE JSON line for the driver.

Primary metric (BASELINE.json): VNet3d sliding-window 3D inference,
volumes/sec/chip.  Secondary: UNet3d train steps/sec at the reference's
KiPA2022 config (112x112x128, 5 classes, batch 1 — `train.py:34`).

vs_baseline is measured throughput / a *modeled* A100-PyTorch baseline
(the reference publishes no numbers, SURVEY.md §6).  Model, stated so it
can be audited and refined:

 * VNet3d forward FLOPs per 96^3 patch computed analytically (~84 GFLOP).
 * A100 torch effective conv3d throughput for this small-channel
   (16..256) 3D net: 6 TFLOP/s with AMP — small output-channel counts
   underutilize tensor cores exactly as they underutilize the MXU;
   published 3D-UNet numbers sit at 5-15% MFU.  (An earlier revision
   assumed 25 TFLOP/s, ~4x too generous.)
 * "batched" baseline: an optimally-batched A100 pipeline over the 27
   patches — FLOPs/6e12 per patch.
 * "reference pipeline" baseline: the reference's actual inference_patch
   loop (`modelUnet.py:707-763`, one patch per forward with full
   H2D/D2H per patch) adds ~10 ms/patch overhead.

vs_baseline is reported against the *batched* (stronger) baseline.

Secondary (train) baseline model, same audit trail: UNet3d fwd FLOPs at
the reference KiPA config computed analytically (~0.18 TFLOP), training
step = fwd + bwd ≈ 3x fwd FLOPs at the same 6 TFLOP/s effective conv
throughput (the reference trains plain f32 — no autocast/GradScaler
anywhere in `model/` — so A100 TF32 convs; small-C 3D convs sit at the
same few-percent utilization as inference), plus 10 ms/step host
overhead (python dataloader item assembly, the per-batch `.cpu()` metric
pulls at `modelUnet.py:881`, optimizer launch latency).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

# Remote TPU compiles cost minutes per program shape on this stack; the
# persistent cache makes warm runs start in seconds.  Set before jax
# imports so it also applies when the driver invokes bench.py directly.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")


def vnet3d_fwd_flops(patch=96, features=16, num_classes=2, in_ch=1):
    """Analytic conv FLOPs (2*K^3*Cin*Cout*Vout) of our VNet3d forward."""
    f = features
    total = 0.0

    def conv(k, cin, cout, res):
        return 2.0 * (k ** 3) * cin * cout * (res ** 3)

    r = patch
    # InputTransition: conv3 in->f, conv1 in->f
    total += conv(3, in_ch, f, r) + conv(1, in_ch, f, r)
    # DownTransitions: (f*2,2),(f*4,3),(f*8,3),(f*16,3)
    cin = f
    for mult, n in ((2, 2), (4, 3), (8, 3), (16, 3)):
        cout = f * mult
        r //= 2
        total += conv(2, cin, cout, r)  # stride-2 down conv
        total += n * conv(3, cout, cout, r)
        cin = cout
    # UpTransitions: (f*8,3),(f*4,3),(f*2,2),(f,1)
    for mult, n in ((8, 3), (4, 3), (2, 2), (1, 1)):
        cout = f * mult
        r *= 2
        total += conv(2, cin, cout, r)  # transpose conv
        total += conv(1, cout * 2, cout, r)  # squeeze after concat
        total += n * conv(3, cout, cout, r)
        cin = cout
    total += conv(1, f, num_classes, r)
    return total


def unet3d_fwd_flops(shape=(128, 112, 112), features=16, num_classes=5,
                     in_ch=1, levels=4):
    """Analytic conv FLOPs of our UNet3d forward (models/unet.py: ConvBlock
    = two 3^3 convs per level, 2^3/s2 transpose-conv decoder, 1x1 head)."""
    f = features
    vox = lambda s: float(np.prod(s))
    total = 0.0
    s = tuple(shape)
    cin = in_ch
    for lvl in range(levels):
        ch = f * 2 ** lvl
        total += 2 * 27 * cin * ch * vox(s) + 2 * 27 * ch * ch * vox(s)
        cin = ch
        s = tuple(d // 2 for d in s)
    ch = f * 2 ** levels
    total += 2 * 27 * cin * ch * vox(s) + 2 * 27 * ch * ch * vox(s)
    cin = ch
    for lvl in reversed(range(levels)):
        ch = f * 2 ** lvl
        s = tuple(d * 2 for d in s)
        total += 2 * cin * ch * vox(s)  # 2^3-kernel stride-2 transpose: 1 tap/out
        total += 2 * 27 * (2 * ch) * ch * vox(s) + 2 * 27 * ch * ch * vox(s)
        cin = ch
    total += 2 * cin * num_classes * vox(s)
    return total


# r2 relay transfer model (benchmarks/pipeline_probe.py, BASELINE.md):
# ~28 ms fixed per RPC + ~13-21 ms/MB each way.  A window is DEGRADED if
# the measured per-MB rate sits >30% above the historical fit's top —
# r4's headline regressed purely on such windows while device-resident
# exec improved, so the scoreboard must carry window quality (VERDICT r4
# #3).
LINK_FIT_MS_PER_MB = 21.0
LINK_DEGRADED_FACTOR = 1.30
LINK_FIXED_FIT_MS = 33.0


def measure_link():
    """One calibrated H2D/D2H transfer pair against the recorded relay
    transfer model.  Returns the stats dict recorded in bench extra."""
    import jax
    import jax.numpy as jnp

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32).ravel()[:8]))

    small = np.zeros((1024,), np.uint8)
    big = np.zeros((16 * 1024 * 1024,), np.uint8)  # 16 MB calibration
    dev_big = jax.device_put(jnp.asarray(big))
    sync(jnp.asarray(small))  # warm the tiny-sum programs (compile cache)
    sync(dev_big)
    np.asarray(dev_big)

    def best(fn, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts)) * 1e3  # one-sided interference -> min

    fixed_ms = best(lambda: sync(jnp.asarray(small)))
    h2d_ms = best(lambda: sync(jnp.asarray(big)))
    d2h_ms = best(lambda: np.asarray(dev_big))
    mb = big.nbytes / 1e6
    h2d_per_mb = max(h2d_ms - fixed_ms, 0.0) / mb
    d2h_per_mb = max(d2h_ms - fixed_ms, 0.0) / mb
    bar = LINK_FIT_MS_PER_MB * LINK_DEGRADED_FACTOR
    healthy = (
        h2d_per_mb <= bar
        and d2h_per_mb <= bar
        and fixed_ms <= 2.0 * LINK_FIXED_FIT_MS
    )
    return {
        "link_fixed_ms": round(fixed_ms, 1),
        "link_h2d_ms_per_mb": round(h2d_per_mb, 1),
        "link_d2h_ms_per_mb": round(d2h_per_mb, 1),
        "window_quality": "healthy" if healthy else "degraded",
    }


def qualify_window(max_wait_s: float = 1500.0):
    """Measure the relay link; if the window is degraded vs the recorded
    transfer model, wait (bounded) for a healthy one.  Always returns the
    last measurement so the emitted line carries the window fields either
    way."""
    import sys

    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        stats = measure_link()
        stats["link_probe_attempts"] = attempt
        if stats["window_quality"] == "healthy" or time.time() >= deadline:
            return stats
        print(
            f"[bench] window degraded (h2d {stats['link_h2d_ms_per_mb']} / "
            f"d2h {stats['link_d2h_ms_per_mb']} ms/MB vs fit "
            f"{LINK_FIT_MS_PER_MB}); waiting for a healthy window "
            f"({int(deadline - time.time())}s left)",
            file=sys.stderr, flush=True,
        )
        time.sleep(120)


def main():
    import jax
    import jax.numpy as jnp

    from tpuseg.models.unet import UNet
    from tpuseg.models.vnet import VNet
    from tpuseg.infer.sliding_window import sliding_window_inference, grid_positions
    from tpuseg.tasks.segmentation import make_segmentation_trainer
    from tpuseg.tasks.trainer import TrainerConfig

    dev = jax.devices()[0]
    platform = dev.platform

    # Self-qualify the measurement window against the recorded relay
    # transfer model BEFORE the timed phase (waits out a degraded window,
    # bounded); re-measured after the run so a mid-run degradation is
    # machine-attributable too.
    link = qualify_window() if platform != "cpu" else measure_link()

    # ---------------- primary: VNet3d sliding-window volumes/sec/chip ----
    PATCH = (96, 96, 96)
    VOL = (160, 160, 192)  # KiPA-like CT after spacing resample
    NUM_CLASSES = 2
    BATCH = 27  # the full 50%-overlap grid in one forward (sweep: 4->0.86,
    #             9->1.09, 27->1.42 vols/s; bigger batch amortizes small-C convs)
    model = VNet(ndim=3, num_classes=NUM_CLASSES, features=16)
    x0 = jnp.zeros((1, *PATCH, 1), jnp.bfloat16)
    params = model.init(jax.random.key(0), x0)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

    def apply_fn(patches):
        logits, probs = model.apply(params, patches.astype(jnp.bfloat16))
        return probs.astype(jnp.float32)

    # Round-3 compute lever (models/vnet_packed.py): the two finest
    # levels (96^3 C16, 48^3 C32; packed_levels=2) execute in the
    # space-to-depth domain — k4s2/1x1/packed-k2s2 convs and GN/apply
    # fusions at >=128-lane width instead of XLA's (C,B)-minor layout.
    # Measured fwd27 216 -> 138 (lv1) -> 126 ms (lv2); exact vs the plain
    # model (CPU tests); sliding-window merge + argmax stay packed.
    from tpuseg.models.vnet_packed import (
        depth_to_space3d, packed_argmax, packed_vnet3d_probs,
    )

    # class-major packed probs: the per-delta softmax runs as contiguous
    # channel-slice arithmetic instead of a (...,8,2) reshape (r4 head fix)
    def apply_fn_packed(patches):
        return packed_vnet3d_probs(
            params, patches.astype(jnp.bfloat16), return_packed=True,
            packed_layout="class",
        ).astype(jnp.float32)

    # NOTE timing methodology: on this stack jax.block_until_ready is
    # unreliable (axon relay), so every measured loop ends with a host
    # fetch of a scalar reduced from the result, which drains the queue.
    #
    # The benchmark volume is an integer-HU synthetic CT (every real CT is
    # integer Hounsfield units), and the measured pipeline is the
    # reference's own VNet3d inference normalization: truncate to the
    # [-100, 100] HU window then meanstd z-score
    # (`/root/reference/model/modelVNet.py:681`
    # ConvertitkTrunctedValue(.., 100, -100, 'meanstd')).
    rng0 = np.random.default_rng(0)
    hu = rng0.normal(0.0, 120.0, size=VOL)  # soft-tissue-ish spread
    hu[40:120, 40:120, 48:144] += rng0.normal(60.0, 30.0, size=(80, 80, 96))
    vol_hu = np.round(hu).astype(np.float32)  # integer HU, as acquired
    HU_LO, HU_HI = -100.0, 100.0
    from tpuseg.data.normalize import truncate_and_normalize

    # host-normalized f32: the exact library transform the compat API runs
    vol = truncate_and_normalize(vol_hu, HU_HI, HU_LO, "meanstd")
    # LOSSLESS uint8 coding: the 200-HU window spans <= 255 integer levels,
    # so 1 byte/voxel carries this (integer-HU, unresampled) volume EXACTLY;
    # the meanstd normalization folds into a device-side affine (the same
    # hu_code_volume fold serves the compat inference_patch API, where a
    # preceding linear resample bounds the coding error at <=0.5 HU).
    from tpuseg.infer.volume import hu_code_volume

    codes, dq_host = hu_code_volume(vol_hu, HU_HI, HU_LO, "meanstd")
    # pre-uploaded once: tiny transfers cost ~28 ms each through the relay
    dequant = jnp.asarray(np.asarray(dq_host, np.float32))

    # pipeline options (measured round 2, BASELINE.md): uint8 HU-coded
    # upload quarters H2D on the ~60 MB/s relay link (lossless, see above);
    # bit-packed binary-mask fetch cuts D2H 8x; skipping the
    # (argmax-invariant) weight accumulator on the mask-only path trims
    # the scatter.
    opts = dict(return_mask=True, pack_mask=True)
    # Primary: the nnU-Net-default 50%-overlap grid (27 patches) so
    # vs_baseline compares EQUAL WORK against the modeled 27-patch A100
    # pipeline (which is charged NO transfer cost at all, only compute).
    # The 25%-overlap variant (12 patches; trained-model dice 0.9754 vs
    # 0.9613 @50%, benchmarks/bench_configs.py config 3) and the
    # TPU-native whole-volume mode are reported alongside with their own
    # matched-work baseline ratios.
    def interleaved_times(fns, reps):
        """Round-robin the variants so slow pool-contention drift hits all
        of them equally (sequential per-variant windows measured u8 SLOWER
        than bf16 once — pure drift).  Returns per-variant MIN times: the
        pool's interference is strictly one-sided (it only ever adds
        time — whole runs measured uniformly ~25-30% slower during a
        contention epoch), so the best rep estimates true chip capability;
        medians are reported alongside for transparency."""
        ts = {k: [] for k in fns}
        for _ in range(reps):
            for k, fn in fns.items():
                t0 = time.perf_counter()
                fn()
                ts[k].append(time.perf_counter() - t0)
        return (
            {k: float(np.min(v)) for k, v in ts.items()},
            {k: float(np.median(v)) for k, v in ts.items()},
        )

    def run_primary():
        return sliding_window_inference(
            codes, PATCH, apply_fn_packed, NUM_CLASSES, BATCH,
            dequant=dequant, packed_apply=True, packed_layout="class", **opts
        )

    opts_bf16 = dict(opts, transfer_dtype="bfloat16")

    def run_bf16():
        return sliding_window_inference(
            vol, PATCH, apply_fn_packed, NUM_CLASSES, BATCH,
            packed_apply=True, packed_layout="class", **opts_bf16
        )

    # 25%-overlap variant (12 patches), same lossless upload
    def run_25():
        return sliding_window_inference(
            codes, PATCH, apply_fn_packed, NUM_CLASSES, 12, overlap=0.25,
            dequant=dequant, packed_apply=True, packed_layout="class", **opts
        )

    mask = run_primary()  # compile + agreement artifacts
    mask_bf16 = run_bf16()
    mask25 = run_25()
    mask_f32 = sliding_window_inference(vol, PATCH, apply_fn, NUM_CLASSES, BATCH, **opts)
    agreement_u8_vs_f32 = float((mask == mask_f32).mean())
    agreement_bf16_vs_f32 = float((mask_bf16 == mask_f32).mean())
    agreement_25_vs_50 = float((mask25 == mask).mean())

    reps = 7
    med, med_typical = interleaved_times(
        {"u8": run_primary, "bf16": run_bf16, "o25": run_25}, reps
    )
    vols_per_sec = 1.0 / med["u8"]
    vols_per_sec_median = 1.0 / med_typical["u8"]
    vols_per_sec_bf16 = 1.0 / med["bf16"]
    vols_per_sec_25 = 1.0 / med["o25"]

    # ---------------- whole-volume mode (TPU-native: 16 GB HBM fits the
    # full volume, skipping the patch grid's ~4.9x compute redundancy; the
    # reference is locked to patches by GPU memory).  Timed HONESTLY
    # including the host->device upload and mask fetch each rep. ----------
    import ml_dtypes

    @jax.jit
    def whole_volume_mask(params, v):
        # packed forward + packed argmax; only the uint8 mask unpacks.
        # No overlap merge here, so argmax(softmax(l)) == argmax(l): run
        # the argmax on the class-major LOGITS — no softmax in the
        # program at all, and the argmax is contiguous slice compares.
        from tpuseg.models.vnet_packed import packed_vnet3d_apply

        logitsp, _ = packed_vnet3d_apply(
            params, v, num_classes=NUM_CLASSES, return_packed=True,
            packed_layout="class",
        )
        mp = packed_argmax(logitsp, NUM_CLASSES, layout="class")
        m = depth_to_space3d(mp)[..., 0]
        flat = m.reshape(-1, 8)
        w8 = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
        return jnp.sum(flat * w8, axis=-1, dtype=jnp.uint8)

    # main whole-volume path: the same lossless uint8 HU-coded upload
    host_u8 = codes[None, ..., None]
    dq = jnp.asarray(dequant, jnp.float32)

    @jax.jit
    def whole_volume_mask_u8(params, q, dq):
        # keep the network input bf16: the f32 dequant constants would
        # otherwise promote the whole forward to f32
        v = (q.astype(jnp.bfloat16) * dq[0] + dq[1]).astype(jnp.bfloat16)
        return whole_volume_mask(params, v)

    def whole_run_u8():
        return np.asarray(whole_volume_mask_u8(params, jnp.asarray(host_u8), dq))

    wv_u8 = whole_run_u8()

    # comparator: bf16 upload of the host-normalized volume
    host_bf16 = vol[None, ..., None].astype(ml_dtypes.bfloat16)

    def whole_run_bf16():
        return np.asarray(whole_volume_mask(params, jnp.asarray(host_bf16)))

    wv_bf16 = whole_run_bf16()
    # unpack the bit-packed masks so agreement is PER-VOXEL (a packed-byte
    # comparison would mis-scale any disagreement by up to 8x)
    whole_agree_u8_vs_bf16 = float(
        (np.unpackbits(wv_u8, bitorder="little")
         == np.unpackbits(wv_bf16, bitorder="little")).mean()
    )

    # throughput mode: batch 4 volumes per upload/program/fetch — the
    # ~28 ms fixed cost of each RPC (upload, execute, fetch) amortizes
    # across the batch even though the serial relay cannot PIPELINE
    # volumes (measured round 2)
    WB = 4
    host_u8_b = np.broadcast_to(host_u8, (WB, *VOL, 1)).copy()

    def whole_run_u8_b4():
        return np.asarray(whole_volume_mask_u8(params, jnp.asarray(host_u8_b), dq))

    whole_run_u8_b4()

    # device-resident exec (no host transfers; sync via tiny scalar fetch):
    # isolates what a production TPU host would see, where H2D runs at
    # ~10 GB/s (~0.6 ms for this volume) instead of this relay's ~120 ms.
    # Reuses the already-compiled programs.
    from tpuseg.infer.sliding_window import _sliding_window_jit

    dev_codes = jax.device_put(jnp.asarray(codes[..., None]))
    positions_t = tuple(map(tuple, grid_positions(VOL, PATCH, 0.5).tolist()))
    float(jnp.sum(dev_codes.astype(jnp.float32).ravel()[:8]))
    dev_u8_b1 = jax.device_put(jnp.asarray(host_u8))

    def dev_exec_sliding():
        _, m = _sliding_window_jit(
            dev_codes, positions_t, apply_fn_packed, PATCH, BATCH, NUM_CLASSES,
            False, True, True, dq, True,
        )
        return float(jnp.sum(m.astype(jnp.float32).ravel()[:8]))

    def dev_exec_whole():
        m = whole_volume_mask_u8(params, dev_u8_b1, dq)
        return float(jnp.sum(m.astype(jnp.float32).ravel()[:8]))

    dev_exec_sliding()
    dev_exec_whole()
    wmed, _wmed_typical = interleaved_times(
        {"u8": whole_run_u8, "bf16": whole_run_bf16, "u8b4": whole_run_u8_b4,
         "dev_sl": dev_exec_sliding, "dev_wh": dev_exec_whole},
        reps,
    )
    whole_vols_per_sec = 1.0 / wmed["u8"]
    whole_bf16_vols_per_sec = 1.0 / wmed["bf16"]
    whole_b4_vols_per_sec = WB / wmed["u8b4"]
    RPC_FLOOR_S = 0.028  # measured per-program RPC latency of this relay
    prod_sliding = 1.0 / max(wmed["dev_sl"] - RPC_FLOOR_S + 0.0006, 1e-6)
    prod_whole = 1.0 / max(wmed["dev_wh"] - RPC_FLOOR_S + 0.0006, 1e-6)

    n_patches = len(grid_positions(VOL, PATCH, 0.5))
    flops_per_patch = vnet3d_fwd_flops(96, 16, NUM_CLASSES)
    a100_effective_flops = 6e12  # modeled: A100 torch AMP, small-C conv3d
    baseline_vols_per_sec = 1.0 / (n_patches * flops_per_patch / a100_effective_flops)
    ref_pipeline_vols_per_sec = 1.0 / (
        n_patches * (flops_per_patch / a100_effective_flops + 0.010)
    )
    # matched-work baselines for the variants (same grid / same voxels)
    redundancy = n_patches * (PATCH[0] * PATCH[1] * PATCH[2]) / float(
        VOL[0] * VOL[1] * VOL[2]
    )
    base25 = 1.0 / (12 * flops_per_patch / a100_effective_flops)
    base_whole = 1.0 / (
        n_patches * flops_per_patch / redundancy / a100_effective_flops
    )

    # ---------------- secondary: UNet3d train steps/sec ------------------
    # packed_stem=True (models/unet_packed.py): the finest level runs
    # space-to-depth packed — same param pytree, exact grads (f64-parity
    # tested), measured 169 -> 66 ms/step.  The plain step is reported
    # alongside.
    TRAIN_SHAPE = (128, 112, 112)  # (D,H,W) = reference KiPA 112x112x128
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(1, *TRAIN_SHAPE, 1)).astype(np.float32),
        "label": rng.integers(0, 5, size=(1, *TRAIN_SHAPE)).astype(np.int32),
    }
    steps = 10
    train_passes = {}
    # headline = packed + bf16 mixed precision (f32 master params/opt/loss,
    # bf16 fwd+bwd): measured 57.2 vs 65.7 ms/step and trained-net quality
    # gated — 25-epoch blobs run, best-checkpoint dice f32 0.79189 vs bf16
    # 0.79780, trajectories track <=4e-3 pre-noise (BASELINE.md r4 ledger,
    # benchmarks/bf16_train_quality_probe.py).  f32 variants reported
    # alongside; the reference itself trains plain f32 (no autocast).
    import jax.numpy as _jnp

    for variant, packed, cdt in (
        ("packed_bf16", True, _jnp.bfloat16),
        ("packed", True, _jnp.float32),
        ("plain", False, _jnp.float32),
    ):
        unet = UNet(ndim=3, num_classes=5, features=16, dropout=0.2)
        trainer = make_segmentation_trainer(
            unet,
            example_image=np.zeros((1, *TRAIN_SHAPE, 1), np.float32),
            num_classes=5,
            loss_name="MutilDiceLoss",
            alpha=[1.0] * 5,
            config=TrainerConfig(epochs=1, lr=1e-3, optimizer="adam",
                                 compute_dtype=cdt),
            packed_stem=packed,
        )
        trainer._build_steps()
        dev_batch = trainer._put(batch)
        state, m = trainer._train_step(trainer.state, dev_batch)  # compile
        _ = float(m["loss"])  # real sync (block_until_ready is a relay no-op)
        holder = {"state": state}  # chain passes: the step DONATES state

        def train_pass(trainer=trainer, dev_batch=dev_batch, holder=holder):
            s = holder["state"]
            for _ in range(steps):
                s, mm = trainer._train_step(s, dev_batch)
            _ = float(mm["loss"])  # drain the queue before stopping the clock
            holder["state"] = s

        train_passes[variant] = train_pass

    train_min, _train_med = interleaved_times(train_passes, 3)
    train_steps_per_sec = steps / train_min["packed_bf16"]
    train_steps_per_sec_f32 = steps / train_min["packed"]
    train_steps_per_sec_plain = steps / train_min["plain"]
    # modeled A100 train step (assumptions in the module docstring):
    # fwd+bwd = 3x fwd FLOPs at 6 TF/s effective + 10 ms host overhead
    train_fwd_flops = unet3d_fwd_flops(TRAIN_SHAPE, 16, 5)
    a100_train_steps_per_sec = 1.0 / (
        3.0 * train_fwd_flops / a100_effective_flops + 0.010
    )

    link_end = measure_link()

    _emit(
            {
                "metric": "VNet3d sliding-window inference (160x160x192 integer-HU vol, 96^3 patches, 50% overlap, bf16 compute, lossless uint8 HU-coded upload)",
                "value": round(vols_per_sec, 4),
                "unit": "volumes/sec/chip",
                "vs_baseline": round(vols_per_sec / baseline_vols_per_sec, 3),
                "extra": {
                    "platform": platform,
                    **link,
                    "link_end_h2d_ms_per_mb": link_end["link_h2d_ms_per_mb"],
                    "link_end_d2h_ms_per_mb": link_end["link_d2h_ms_per_mb"],
                    "window_quality_end": link_end["window_quality"],
                    "timing": "min over 7 interleaved reps (pool interference is one-sided); median of this run in median_vols_per_sec",
                    "median_vols_per_sec": round(vols_per_sec_median, 4),
                    "uint8_coded_voxel_agreement_vs_f32_upload": round(
                        agreement_u8_vs_f32, 5
                    ),
                    "bf16_upload_vols_per_sec": round(vols_per_sec_bf16, 4),
                    "bf16_upload_voxel_agreement_vs_f32": round(
                        agreement_bf16_vs_f32, 5
                    ),
                    "whole_volume_vols_per_sec": round(whole_vols_per_sec, 4),
                    "whole_volume_vs_matched_baseline": round(
                        whole_vols_per_sec / base_whole, 3
                    ),
                    "whole_volume_bf16_upload_vols_per_sec": round(
                        whole_bf16_vols_per_sec, 4
                    ),
                    "whole_volume_batch4_vols_per_sec": round(
                        whole_b4_vols_per_sec, 4
                    ),
                    "whole_volume_batch4_vs_baseline": round(
                        whole_b4_vols_per_sec / baseline_vols_per_sec, 3
                    ),
                    "device_exec_sliding_ms": round(wmed["dev_sl"] * 1e3, 1),
                    "device_exec_whole_ms": round(wmed["dev_wh"] * 1e3, 1),
                    "production_host_projection_sliding_vols_per_sec": round(
                        prod_sliding, 2
                    ),
                    "production_host_projection_whole_vols_per_sec": round(
                        prod_whole, 2
                    ),
                    "production_host_projection_whole_vs_baseline": round(
                        prod_whole / baseline_vols_per_sec, 2
                    ),
                    "whole_volume_u8_vs_bf16_agreement": round(
                        whole_agree_u8_vs_bf16, 5
                    ),
                    "overlap25_vols_per_sec": round(vols_per_sec_25, 4),
                    "overlap25_vs_matched_baseline": round(
                        vols_per_sec_25 / base25, 3
                    ),
                    "overlap25_voxel_agreement_vs_50": round(agreement_25_vs_50, 5),
                    "trained_dice_evidence": (
                        "config3 TRAINED-net via compat packed dispatch "
                        "(r5, BASELINE.md round-5 ledger): packed f32 "
                        "0.9613 = plain f32 0.9613 (delta 0.0, voxel "
                        "agreement 1.0); packed bf16-compute 0.9613 "
                        "(delta 0.0, agreement 1.0)"
                    ),
                    "patches_per_volume": int(n_patches),
                    "unet3d_train_steps_per_sec_112x112x128_bs1": round(
                        train_steps_per_sec, 4
                    ),
                    "train_compute_dtype": "bfloat16 mixed (f32 master; "
                    "quality-gated, BASELINE.md r4)",
                    "unet3d_train_steps_per_sec_f32": round(
                        train_steps_per_sec_f32, 4
                    ),
                    "unet3d_train_steps_per_sec_plain_stem": round(
                        train_steps_per_sec_plain, 4
                    ),
                    "train_vs_baseline": round(
                        train_steps_per_sec / a100_train_steps_per_sec, 3
                    ),
                    "train_vs_baseline_f32": round(
                        train_steps_per_sec_f32 / a100_train_steps_per_sec, 3
                    ),
                    "modeled_a100_train_steps_per_sec": round(
                        a100_train_steps_per_sec, 4
                    ),
                    "modeled_a100_batched_vols_per_sec": round(
                        baseline_vols_per_sec, 4
                    ),
                    "modeled_a100_reference_pipeline_vols_per_sec": round(
                        ref_pipeline_vols_per_sec, 4
                    ),
                    "whole_volume_vs_baseline": round(
                        whole_vols_per_sec / baseline_vols_per_sec, 3
                    ),
                },
            }
    )


BENCH_LAST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_LAST.json")


def _emit(result: dict) -> None:
    """Print the driver's JSON line and persist it to BENCH_LAST.json so a
    later relay outage can report the last real measurement (clearly
    labeled stale) instead of nothing."""
    import datetime

    print(json.dumps(result))
    try:
        on_disk = dict(result)
        on_disk["extra"] = dict(result.get("extra", {}))
        on_disk["extra"]["measured_at"] = datetime.datetime.now(
            datetime.timezone.utc
        ).isoformat(timespec="seconds")
        with open(BENCH_LAST, "w") as f:
            json.dump(on_disk, f, indent=1)
            f.write("\n")
    except OSError:
        pass  # persisting the cache must never fail the measurement


def emit_stale_fallback() -> bool:
    """Relay never became responsive: report the last successful
    measurement, unmistakably labeled as such.  Returns False if there is
    no cached result to fall back to."""
    try:
        with open(BENCH_LAST) as f:
            result = json.load(f)
    except (OSError, ValueError):
        return False
    extra = dict(result.get("extra", {}))
    extra["STALE"] = (
        "TPU relay unresponsive at bench time after the full wait window; "
        "this is the LAST SUCCESSFUL measurement (see measured_at), "
        "re-reported unchanged — NOT a fresh run"
    )
    # Make the staleness unmistakable at the TOP level, not just in extra:
    # a scoreboard that parses metric/value/vs_baseline must not be able to
    # read a replayed line as a fresh measurement.
    extra["stale_value"] = result.get("value")
    extra["stale_vs_baseline"] = result.get("vs_baseline")
    result["metric"] = "STALE: " + str(result.get("metric", ""))
    result["value"] = None
    result["vs_baseline"] = None
    result["extra"] = extra
    print(json.dumps(result))
    return True


def wait_for_device(max_wait_s: float = 7200.0) -> bool:
    """The axon relay occasionally goes fully unresponsive for tens of
    minutes (CLAUDE.md): even a tiny matmul hangs, which would hang this
    whole bench at its first compile.  Probe with a FRESH interpreter
    (a hung in-process RPC would poison the jax client for retries) and
    wait out a transient outage before starting the real run."""
    import subprocess
    import sys

    probe = (
        "import os;"
        "os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',"
        "'/tmp/jax_cache_tpuseg');"
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((128, 128), jnp.bfloat16);"
        "print(float(jnp.sum(jax.jit(lambda a: a @ a)(x)[:8])))"
    )
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], timeout=150,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        print(
            f"[bench] device probe {attempt} unresponsive; relay outage? "
            f"retrying ({int(deadline - time.time())}s left)",
            file=sys.stderr, flush=True,
        )
        time.sleep(60)


if __name__ == "__main__":
    import sys

    if not wait_for_device():
        print(
            "[bench] device never became responsive (relay outage); "
            "falling back to the last successful measurement",
            file=sys.stderr, flush=True,
        )
        if emit_stale_fallback():
            sys.exit(0)
        print("[bench] no cached measurement either; nothing to report",
              file=sys.stderr, flush=True)
        sys.exit(1)
    main()
