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

from ct_tpu.utils.timing import fetch_sync
from ct_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    print("devices", jax.devices(), flush=True)

    from ct_tpu.config import VOC_300, resolve_task
    from ct_tpu.models import build_net
    from ct_tpu.models.fold_bn import fold_variables
    from ct_tpu.models.quantize import (
        SKIP_CT_ONLY, calibrate, quantize_variables,
    )
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
    from ct_tpu.models.rfbnet import vgg_pool_chains

    calib = calibrate(fnet, folded, [images[:8]])
    quant = jax.device_put(quantize_variables(
        folded["params"], calib, skip=SKIP_CT_ONLY,
        chains=vgg_pool_chains(300)))
    eval_step = make_eval_step(fnet, priors, approx_top_k=True, top_k=128,
                               pool_size=512, quant=quant)
    params, batch_stats = folded["params"], folded["batch_stats"]

    d = eval_step(params, batch_stats, images, sizes)
    fetch_sync(d)
    print("compiled", flush=True)

    trace_dir = "/tmp/serving_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            d = eval_step(params, batch_stats, images, sizes)
        fetch_sync(d)
    print("trace written", flush=True)

    summarize_trace(trace_dir)


def summarize_trace(trace_dir: str, top: int = 40):
    """Top device ops by summed duration, parsed straight from the xplane
    proto (tensorboard_plugin_profile's converter is broken against the
    installed protobuf — TypeError at import — so read XSpace directly)."""
    import collections

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    print("xplane:", xplanes, flush=True)
    xs = xplane_pb2.XSpace()
    with open(xplanes[0], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        emeta = plane.event_metadata
        agg, cnt = collections.Counter(), collections.Counter()
        line_ms = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                name = emeta[ev.metadata_id].name
                agg[(line.name, name)] += ev.duration_ps / 1e9  # ms
                cnt[(line.name, name)] += 1
                line_ms[line.name] += ev.duration_ps / 1e9
        print(f"PLANE {plane.name}: " + "  ".join(
            f"{ln}={ms:.1f}ms" for ln, ms in line_ms.items()))
        shown = 0
        for (ln, name), ms in agg.most_common():
            if ln != "XLA Ops" or name.startswith("%copy"):
                continue
            print(f"  {ms:9.3f} ms x{cnt[(ln, name)]:3d}  {name[:95]}")
            shown += 1
            if shown >= top:
                break


if __name__ == "__main__":
    main()
