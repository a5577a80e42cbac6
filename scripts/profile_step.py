"""Per-op device-time breakdown of one sampler denoise step on TPU.

Traces the jitted main img-cycle forward (batch 3, 3-ref context) and the
batched reference-cycle forward (batch 6) with jax.profiler, then parses
the xplane with tensorboard_plugin_profile (framework_op_stats) and prints
the top ops by self time.

Run with PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (the sandbox's
protobuf wheel predates the plugin's generated code).
"""
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from storygen_tpu.configs import UNetConfig
from storygen_tpu.models.unet import UNet2DConditionModel, context_shapes


def parse_opstats(logdir):
    # the tbp wheel's raw_to_tool_data targets a newer tf binding name;
    # call the pybind entry point directly
    from tensorflow.python.profiler.internal import (
        _pywrap_profiler_plugin as pp)
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    data, _ = pp.xspace_to_tools_data(paths, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    return data


def main():
    rng = jax.random.PRNGKey(0)
    cfg = UNetConfig()
    model = UNet2DConditionModel(config=cfg, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(rng, jnp.zeros((1, 16, 16, 4)),
                                 jnp.asarray([0]), jnp.zeros((1, 77, 768)))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    hw = 64

    b_main = 3
    sample = jnp.zeros((b_main, hw, hw, 4), jnp.bfloat16)
    t = jnp.zeros((b_main,), jnp.int32)
    text = jnp.zeros((b_main, 77, 768), jnp.bfloat16)
    ctx = {k: jnp.zeros((b_main,) + s[1:], jnp.bfloat16)
           for k, s in context_shapes(1, hw, num_refs=3).items()}

    b_ref = 6
    rsample = jnp.zeros((b_ref, hw, hw, 4), jnp.bfloat16)
    rt = jnp.zeros((b_ref,), jnp.int32)
    rtext = jnp.zeros((b_ref, 77, 768), jnp.bfloat16)

    @jax.jit
    def main_pass(p, sample, t, text, ctx):
        eps, _ = model.apply(p, sample, t, text, ctx)
        return eps.astype(jnp.float32).mean()

    @jax.jit
    def ref_pass(p, sample, t, text):
        eps, feats = model.apply(p, sample, t, text)
        return eps.astype(jnp.float32).mean()

    # warm
    jax.device_get(main_pass(params, sample, t, text, ctx))
    jax.device_get(ref_pass(params, rsample, rt, rtext))

    logdir = "/tmp/storygen_profile"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            r1 = main_pass(params, sample, t, text, ctx)
            r2 = ref_pass(params, rsample, rt, rtext)
        jax.device_get((r1, r2))

    import json
    raw = parse_opstats(logdir)
    # gviz datatable json: [{"cols": [...], "rows": [{"c": [{"v": ...}]}]}]
    table = json.loads(raw)
    if isinstance(table, list):
        table = table[0]
    cols = [c.get("id") or c.get("label") for c in table["cols"]]
    rows = [[ (cell or {}).get("v") for cell in r["c"]]
            for r in table["rows"]]
    i_dev = cols.index("host_or_device")
    i_op = cols.index("operation")
    i_n = cols.index("occurrences")
    i_self = cols.index("total_self_time")
    dev = [r for r in rows if r[i_dev] == "Device"]
    total = sum(float(r[i_self]) for r in dev)
    print(f"total device self time: {total:.0f} us (3x main b3 + 3x ref b6)")

    import re

    def category(op):
        pass_name = "main" if "main_pass" in op else (
            "ref" if "ref_pass" in op else "other")
        m = re.search(r"attn(\d)", op)
        if "flash" in op or "online_t" in op or "bnd_" in op:
            a = m.group(1) if m else "?"
            return f"{pass_name}:attn{a}:flash_kernel"
        if m:
            a = m.group(1)
            if "to_q" in op or "to_k" in op or "to_v" in op:
                return f"{pass_name}:attn{a}:qkv_proj"
            if "to_out" in op:
                return f"{pass_name}:attn{a}:out_proj"
            return f"{pass_name}:attn{a}:other"
        if "transformer_blocks" in op:
            if "net_0" in op or "net_2" in op or "ff" in op:
                return f"{pass_name}:ff"
            return f"{pass_name}:transformer_misc"
        if "conv" in op or "resnet" in op or "samplers" in op:
            return f"{pass_name}:conv_resnet"
        if "transpose" in op or "copy" in op:
            return f"{pass_name}:layout"
        if "fusion" in op:
            return f"{pass_name}:fusion_misc"
        return f"{pass_name}:misc"

    agg = {}
    for r in dev:
        c = category(str(r[i_op]))
        agg[c] = agg.get(c, 0.0) + float(r[i_self])
    for c, us in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{c:36s} {us/3:>9.0f} us/call {100*us/total:>5.1f}%")

    with open("/tmp/opstats_full.tsv", "w") as f:
        for r in dev:
            f.write(f"{r[i_op]}\t{r[i_n]}\t{r[i_self]}\n")
    print("full dump: /tmp/opstats_full.tsv")


if __name__ == "__main__":
    main()
