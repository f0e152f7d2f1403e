#!/usr/bin/env python
"""Profile the int8 serving step on the real TPU → op-level time table.

Captures a jax.profiler trace of the production eval step (the bench
configuration) and prints the top ops by self time from the xplane proto,
so optimization targets are measured, not guessed. Run SOLO on the TPU.
"""

from __future__ import annotations

import dataclasses
import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ct_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    print("devices", jax.devices(), flush=True)

    from ct_tpu.config import VOC_300, resolve_task
    from ct_tpu.models import build_net
    from ct_tpu.models.fold_bn import fold_variables
    from ct_tpu.models.quantize import calibrate, quantize_variables
    from ct_tpu.ops.priors import prior_boxes
    from ct_tpu.train.step import init_train_state, make_eval_step

    batch = 128
    task = resolve_task(2, "transfer", "ours", "VOC")
    net = build_net(task, 300, dtype=jnp.bfloat16)
    net = dataclasses.replace(net, use_pallas_ct=True)
    priors = prior_boxes(VOC_300)
    state = init_train_state(net, None, jax.random.PRNGKey(0), 300)
    print("init done", flush=True)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, 300, 300, 3).astype(np.float32)
                         * 50)
    sizes = jnp.asarray(np.full((batch, 2), 500, np.int32))

    fnet = dataclasses.replace(net, fold_bn=True)
    folded = fold_variables(
        {"params": state.params, "batch_stats": state.batch_stats})
    print("folded", flush=True)
    calib = calibrate(fnet, folded, [images[:8]])
    quant = jax.device_put(quantize_variables(folded["params"], calib))
    eval_step = make_eval_step(fnet, priors, approx_top_k=True, top_k=128,
                               pool_size=512, quant=quant)
    params, batch_stats = folded["params"], folded["batch_stats"]

    d = eval_step(params, batch_stats, images, sizes)
    jax.block_until_ready(d)
    print("compiled", flush=True)

    trace_dir = "/tmp/serving_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            d = eval_step(params, batch_stats, images, sizes)
        jax.block_until_ready(d)
    print("trace written", flush=True)

    # summarize: top ops by self-time from the xplane proto
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xplanes = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    print("xplane:", xplanes, flush=True)
    data, _ = rtd.xspace_to_tool_data(xplanes, "op_profile", {})
    import json as _json

    prof = _json.loads(data)

    def walk(node, depth=0, rows=None):
        rows = rows if rows is not None else []
        m = node.get("metrics", {})
        name = node.get("name", "")
        if depth >= 2 and m.get("rawTime", 0):
            rows.append((m.get("rawTime", 0) / 1e9, name,
                         m.get("flops", 0)))
        for ch in node.get("children", []):
            walk(ch, depth + 1, rows)
        return rows

    root = prof.get("byProgram") or prof.get("byCategory")
    rows = sorted(walk(root), reverse=True)[:30]
    total = sum(r[0] for r in rows)
    print(f"top ops (sum {total*1e3:.1f} ms):")
    for t, name, fl in rows:
        print(f"  {t*1e3:8.3f} ms  {name[:90]}")


if __name__ == "__main__":
    main()
