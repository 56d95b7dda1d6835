"""Per-shape attribution of VNet3d fwd27 device time.

jax.profiler trace of the bench's hot program (VNet3d 96^3 batch-27 bf16
forward) + the HLO dump of the same program; each hot fusion's time is
attributed to the convolution shapes inside its HLO definition, giving the
per-stage (C16@96^3 / C32@48^3 / C64@24^3 / ...) conv-time breakdown that
decides where the packed k4s2 reformulation pays.

Run on TPU with an idle host.
"""
import glob
import gzip
import os
import re
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpuseg")
DUMP = "/tmp/fwd27_hlo"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + f" --xla_dump_to={DUMP}"
).strip()

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(jnp.ravel(x).astype(jnp.float32)[:8]))


def main():
    import jax
    import jax.numpy as jnp
    from tpuseg.models.vnet import VNet

    print("platform:", jax.devices()[0].platform)
    model = VNet(ndim=3, num_classes=2, features=16)
    x0 = jnp.zeros((1, 96, 96, 96, 1), jnp.bfloat16)
    params = model.init(jax.random.key(0), x0)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    xb = jax.device_put(
        (np.random.default_rng(0).normal(size=(27, 96, 96, 96, 1)) * 0.3)
        .astype(np.float32).astype(jnp.bfloat16)
    )

    @jax.jit
    def fwd(x):
        _, probs = model.apply(params, x)
        return probs

    sync(fwd(xb))  # compile (dumps HLO)
    t0 = time.perf_counter()
    for _ in range(3):
        sync(fwd(xb))
    print(f"fwd27 wall {(time.perf_counter() - t0) / 3 * 1e3:.1f} ms/rep")

    trace_dir = "/tmp/fwd27_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            sync(fwd(xb))

    # ---- find the xplane file ----
    pbs = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True),
                 key=os.path.getmtime)
    assert pbs, "no xplane produced"
    from xplane_ops import parse

    results = parse(pbs[-1])

    # ---- parse the HLO dump: map fusion name -> conv shapes inside ----
    hlos = sorted(glob.glob(DUMP + "/*after_optimizations.txt"),
                  key=os.path.getmtime)
    fusion_convs = {}
    if hlos:
        text = open(hlos[-1]).read()
        # fusion computation bodies: %fused_computation.N { ... } and the
        # fusion instruction that calls it; simpler: scan each fusion
        # instruction line for calls=..., then find convolution lines in
        # that computation body
        comp_bodies = {}
        for m in re.finditer(r"^%?([\w.\-]+)\s+\([^)]*\)\s*->\s*[^{]+\{(.*?)^\}",
                             text, re.S | re.M):
            comp_bodies[m.group(1)] = m.group(2)
        fusion_call = re.compile(
            r"%?([\w.\-]+)\s*=\s*\S+\s+fusion\(.*?calls=%?([\w.\-]+)")
        conv_line = re.compile(r"convolution\(|convolution\.\d+\s*=")
        shape_re = re.compile(r"(bf16|f32|s8|s32)\[([\d,]+)\]")
        for m in fusion_call.finditer(text):
            fname, comp = m.group(1), m.group(2)
            body = comp_bodies.get(comp, "")
            convs = []
            for line in body.splitlines():
                if "convolution" in line and "=" in line:
                    shapes = shape_re.findall(line)
                    if shapes:
                        convs.append(shapes[0][0] + "[" + shapes[0][1] + "]")
            if convs:
                fusion_convs[fname] = convs
        print(f"hlo: {len(fusion_convs)} fusions contain convolutions")
    else:
        print("no HLO dump found; attribution by op name only")

    for plane, (durs, counts) in results.items():
        if not durs or "TPU" not in plane and "/device" not in plane.lower():
            continue
        total = sum(durs.values())
        print(f"\n=== plane: {plane} (total {total/1e9:.1f} ms)")
        bucket = {}
        for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:40]:
            base = name.split(".")[0] if name not in fusion_convs else name
            tag = ",".join(fusion_convs.get(name, [])) or base
            bucket[tag] = bucket.get(tag, 0) + d
            print(f"  {d/1e9:8.2f} ms x{counts[name]:<4d} {name[:40]:42s} "
                  f"{','.join(fusion_convs.get(name, []))[:70]}")


if __name__ == "__main__":
    main()
