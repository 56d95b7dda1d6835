"""Per-fusion device-time attribution of the packed bf16 train step.

VERDICT r4 #4: the fwd27 program got two rounds of xplane profiling;
the train step — now the axis with headroom (1.78x vs the ~2x modeled
A100 reachable) — never had a breakdown at its current shape.  This
profiles the bench secondary config (UNet3d 112x112x128, 5 classes,
b1, packed stem, MutilDiceLoss, Adam) under compute_dtype=bfloat16
(the headline variant) and f32 (the default) and attributes each hot
fusion to the convolution shapes in its HLO body, separating
fwd conv / bwd conv / GN / optimizer / layout-copy time.

Run on TPU with an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/train_step_profile.py [dtypes]
"""
import glob
import os
import re
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")
DUMP = "/tmp/trainstep_hlo"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + f" --xla_dump_to={DUMP}"
).strip()

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

TRAIN_SHAPE = (128, 112, 112)


def build(dtype):
    import jax.numpy as jnp
    from tpuseg.models.unet import UNet
    from tpuseg.tasks.segmentation import make_segmentation_trainer
    from tpuseg.tasks.trainer import TrainerConfig

    unet = UNet(ndim=3, num_classes=5, features=16, dropout=0.2)
    tr = make_segmentation_trainer(
        unet,
        example_image=np.zeros((1, *TRAIN_SHAPE, 1), np.float32),
        num_classes=5,
        loss_name="MutilDiceLoss",
        alpha=[1.0] * 5,
        config=TrainerConfig(epochs=1, lr=1e-3, optimizer="adam",
                             compute_dtype=jnp.dtype(dtype)),
        packed_stem=True,
    )
    tr._build_steps()
    return tr


def conv_map():
    """fusion name -> conv shapes from the freshest after-optimizations HLO."""
    hlos = sorted(glob.glob(DUMP + "/*after_optimizations.txt"),
                  key=os.path.getmtime)
    if not hlos:
        return {}, ""
    text = open(hlos[-1]).read()
    comp_bodies = {}
    for m in re.finditer(r"^%?([\w.\-]+)\s+\([^)]*\)\s*->\s*[^{]+\{(.*?)^\}",
                         text, re.S | re.M):
        comp_bodies[m.group(1)] = m.group(2)
    fusion_call = re.compile(
        r"%?([\w.\-]+)\s*=\s*\S+\s+fusion\(.*?calls=%?([\w.\-]+)")
    shape_re = re.compile(r"(bf16|f32|s8|s32)\[([\d,]+)\]")
    out = {}
    for m in fusion_call.finditer(text):
        fname, comp = m.group(1), m.group(2)
        convs = []
        for line in comp_bodies.get(comp, "").splitlines():
            if "convolution" in line and "=" in line:
                shapes = shape_re.findall(line)
                if shapes:
                    convs.append(shapes[0][0] + "[" + shapes[0][1] + "]")
        if convs:
            out[fname] = convs
    return out, hlos[-1]


def profile(dtype):
    import jax
    from xplane_ops import parse

    tr = build(dtype)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(1, *TRAIN_SHAPE, 1)).astype(np.float32),
        "label": rng.integers(0, 5, size=(1, *TRAIN_SHAPE)).astype(np.int32),
    }
    dev_batch = tr._put(batch)
    state, m = tr._train_step(tr.state, dev_batch)  # compile (dumps HLO)
    print(f"[{dtype}] first-step loss {float(m['loss']):.5f}", flush=True)

    def run(state, steps=10):
        for _ in range(steps):
            state, mm = tr._train_step(state, dev_batch)
        float(mm["loss"])  # host fetch drains the relay queue
        return state

    state = run(state)  # warm
    t0 = time.perf_counter()
    state = run(state, 20)
    wall = (time.perf_counter() - t0) / 20 * 1e3
    print(f"[{dtype}] {wall:.1f} ms/step wall", flush=True)

    trace_dir = f"/tmp/trainstep_trace_{dtype}"
    with jax.profiler.trace(trace_dir):
        state = run(state, 10)

    pbs = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True),
                 key=os.path.getmtime)
    assert pbs, "no xplane produced"
    fusion_convs, hlo_path = conv_map()
    print(f"[{dtype}] hlo: {len(fusion_convs)} conv fusions ({hlo_path})")

    for plane, (durs, counts) in parse(pbs[-1]).items():
        if not durs or ("TPU" not in plane and "/device" not in plane.lower()):
            continue
        total = sum(durs.values())
        print(f"\n=== [{dtype}] plane: {plane} (total {total/1e9:.1f} ms "
              f"over 10 steps => {total/1e10:.2f} ms/step)")
        for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:45]:
            tag = ",".join(fusion_convs.get(name, []))[:70]
            print(f"  {d/1e10:7.3f} ms/step x{counts[name]:<4d} "
                  f"{name[:46]:48s} {tag}")
    return wall


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    dtypes = (sys.argv[1].split(",") if len(sys.argv) > 1
              else ["bfloat16", "float32"])
    for dt in dtypes:
        # fresh dump dir per dtype so conv_map sees the right program
        for f in glob.glob(DUMP + "/*"):
            os.remove(f)
        profile(dt)


if __name__ == "__main__":
    main()
