"""Capture a jax.profiler trace of encode fwd+bwd (the ~5.5 s program)
and dump the top self-time ops via tensorboard_plugin_profile.

Usage: python scripts/profile_bwd.py [logdir]
"""

import glob
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vstnet_tpu.config import PHOTO_CONFIG
from vstnet_tpu.models.revresnet import encode, init_revresnet


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_bwd"
    cfg = PHOTO_CONFIG.with_remat()
    params = init_revresnet(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(2, 256, 256, 3)), jnp.float32)

    f = jax.jit(jax.grad(
        lambda p, x: jnp.sum(jnp.square(encode(p, x, cfg)))))
    out = f(params, a)  # compile + warm
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]

    with jax.profiler.trace(logdir):
        for _ in range(2):
            out = f(params, a)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]

    print("trace done", flush=True)
    # summarize: find xplane file and run the op-profile converter
    xplanes = glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    print("xplanes:", xplanes, flush=True)
    if not xplanes:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t

    for tool in ("framework_op_stats", "hlo_stats"):
        try:
            data, _ = r2t.xspace_to_tool_data(xplanes, tool, {})
            path = os.path.join(logdir, tool + ".out")
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(path, mode) as fh:
                fh.write(data)
            print("wrote", path, len(data), flush=True)
        except Exception as e:
            print(tool, "failed:", type(e).__name__, str(e)[:200],
                  flush=True)


if __name__ == "__main__":
    main()
