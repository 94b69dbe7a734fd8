"""Wide-geometry AOT export (VERDICT r4 task 8): serialize the layer-grid
decode step chain at the JUKEBOX_SMALL_PRIOR geometry via ``jax.export``.

The flagship export (sample/export.py, test_export.py) embeds the weights as
constants — right for a 6.5 MB artifact, wrong at 202M params (the folded
bf16 weights alone are ~380 MB of constants).  The wide serving artifact
therefore exports the decode with PARAMS AS RUNTIME INPUTS: the artifact
stays small (StableHLO + the Mosaic kernel payload) and the serving host
feeds it the checkpoint it already has.

Verifies: export -> serialize -> deserialize -> call on the live TPU, tokens
equal the in-process decode.

Usage: python scripts/wide_export.py [out_path]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/vmt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def main():
    from vae_music_tpu.configs import get_config
    from vae_music_tpu.sample.decode import SampleMode, make_decode_fn
    from vae_music_tpu.train.prior_step import init_prior

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wide_decode.jaxexp"
    pcfg = get_config("JUKEBOX_SMALL_PRIOR")
    vcfg = get_config("JUKEBOX_VQVAE")
    ctx, batch = vcfg.z_lengths[0], 64
    _, params = init_prior(jax.random.PRNGKey(1), vcfg, pcfg)

    fn = make_decode_fn(pcfg, ctx, batch, mode=SampleMode.GREEDY,
                        fused="grid", cache_dtype="int8",
                        weight_dtype="int8")

    def wrapped(params, key_data):
        return fn(params, jax.random.wrap_key_data(key_data))

    t0 = time.time()
    exp = jax_export.export(
        jax.jit(wrapped),
        disabled_checks=[jax_export.DisabledSafetyCheck.custom_call(
            "tpu_custom_call")],
    )(params, jnp.zeros((2,), jnp.uint32))
    blob = exp.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    export_s = time.time() - t0
    print(json.dumps({"artifact": out_path,
                      "size_mb": round(len(blob) / 2**20, 2),
                      "export_s": round(export_s, 1)}), flush=True)

    # Roundtrip: deserialize and run on the live chip.
    t0 = time.time()
    reloaded = jax_export.deserialize(open(out_path, "rb").read())
    key = jax.random.key_data(jax.random.PRNGKey(7))
    toks_art = reloaded.call(params, key)
    toks_ref = wrapped(params, key)
    equal = bool(np.array_equal(np.asarray(toks_art), np.asarray(toks_ref)))
    print(json.dumps({"roundtrip_equal": equal,
                      "roundtrip_s": round(time.time() - t0, 1)}), flush=True)
    assert equal


if __name__ == "__main__":
    main()
